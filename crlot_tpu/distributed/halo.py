"""Halo exchange primitives for time-block sharding (inside shard_map).

SURVEY.md §5 'Long-context / sequence parallelism': each time block needs the
first `N - H` samples of its RIGHT neighbor to frame its trailing hops
(overlap-save), and contributes an `N - H`-sample OLA tail to its right
neighbor's head (overlap-add) — one `ppermute` each direction per block.
Non-circular permutes: edge devices receive zeros, which is exactly the
"no neighbor" semantics (jax.lax.ppermute fills missing sources with 0).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pull_right_halo(x_local: jnp.ndarray, axis_name: str, halo: int) -> jnp.ndarray:
    """Receive the first `halo` samples of the right neighbor's block.

    x_local: [..., T_block]. Returns [..., halo]; zeros on the last device.
    """
    if halo == 0:
        return x_local[..., :0]
    n = jax.lax.axis_size(axis_name)
    head = x_local[..., :halo]
    # send device d's head to device d-1  (perm pairs are (src, dst))
    return jax.lax.ppermute(
        head, axis_name, perm=[(d, d - 1) for d in range(1, n)]
    )


def push_right_tail(tail: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Send this block's OLA tail to the right neighbor; receive the left
    neighbor's tail (zeros on device 0). tail: [..., halo]."""
    n = jax.lax.axis_size(axis_name)
    return jax.lax.ppermute(
        tail, axis_name, perm=[(d, d + 1) for d in range(n - 1)]
    )


def pull_left_halo(x_local: jnp.ndarray, axis_name: str, halo: int) -> jnp.ndarray:
    """Receive the LAST `halo` samples of the left neighbor's block (the
    look-back context of the blocked hop-block Toeplitz formulation).

    x_local: [..., T_block]. Returns [..., halo]; zeros on device 0 —
    exactly the zero left-padding the single-device blocked kernel sees.
    """
    if halo == 0:
        return x_local[..., :0]
    # Same rightward shift as the OLA tail push — one perm to keep in sync.
    return push_right_tail(x_local[..., -halo:], axis_name)
