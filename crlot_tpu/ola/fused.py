"""Fused Pallas OLA + normalize kernel: one pass over HBM.

The jnp overlap-add (ola/reference.py) issues R dynamic-update-slice adds,
each reading and writing the whole output buffer — ~2R x output traffic. This
kernel computes each output hop-block tile directly:

    out[b] = (sum_{r=R-1..0} hops_padded[b + (R-1-r), r]) / max(norm[b], eps)

with the input staged from HBM by R explicit DMAs per tile (every input
element is read exactly once across the grid), so total traffic is
read(frames) + read(norm) + write(out) — the speed-of-light minimum. The
summation runs r descending = ascending frame index, matching the canonical
left-to-right frame order of the jnp path bit-for-bit.

Constraints: hop % 128 == 0 and frames f32 (VPU lane alignment); other
configs fall back to the jnp path (ola_normalized_auto).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .reference import normalize, overlap_add

_LANES = 128
_DEF_TILE = 8  # hop-blocks per grid step (sublane-aligned)


def _fused_kernel(r_count: int, eps: float, hops_ref, norm_ref, out_ref,
                  scratch, sems):
    b = pl.program_id(0)
    tb = out_ref.shape[0]
    # Stage all R strided slices (independent DMAs overlap each other).
    for r in range(r_count):
        pltpu.make_async_copy(
            hops_ref.at[pl.ds(b * tb + (r_count - 1 - r), tb), r],
            scratch.at[r],
            sems.at[r],
        ).start()
    # Accumulate earliest frame first (r descending == frame ascending).
    r = r_count - 1
    pltpu.make_async_copy(
        hops_ref.at[pl.ds(b * tb + (r_count - 1 - r), tb), r],
        scratch.at[r], sems.at[r],
    ).wait()
    acc = scratch[r]
    for r in range(r_count - 2, -1, -1):
        pltpu.make_async_copy(
            hops_ref.at[pl.ds(b * tb + (r_count - 1 - r), tb), r],
            scratch.at[r], sems.at[r],
        ).wait()
        acc = acc + scratch[r]
    out_ref[:] = acc / jnp.maximum(norm_ref[:], eps)


@partial(jax.jit, static_argnames=("hop", "out_len", "eps", "interpret"))
def ola_normalized_fused(
    frames: jnp.ndarray,  # [F, N] f32 (windowed output frames)
    norm: jnp.ndarray,  # [out_len] f32
    hop: int,
    out_len: int,
    eps: float = 1e-8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused OLA + divide for 2-D frames; see module docstring."""
    f, n = frames.shape
    r_count = -(-n // hop)
    n_pad = r_count * hop
    if n_pad != n:
        frames = jnp.pad(frames, ((0, 0), (0, n_pad - n)))
    hops = frames.reshape(f, r_count, hop)
    blocks = -(-out_len // hop)
    tile = _DEF_TILE
    grid = -(-blocks // tile)
    # Pad the frame axis: front R-1 zero-frames (shift), back enough that the
    # last tile's DMAs stay in range.
    back = grid * tile + r_count - 1 - f
    hops_p = jnp.pad(hops, ((r_count - 1, max(back, 0)), (0, 0), (0, 0)))
    norm_p = jnp.pad(
        jnp.maximum(norm, 0.0), (0, grid * tile * hop - out_len)
    ).reshape(grid * tile, hop)

    out = pl.pallas_call(
        partial(_fused_kernel, r_count, eps),
        out_shape=jax.ShapeDtypeStruct((grid * tile, hop), jnp.float32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # hops stay in HBM
            pl.BlockSpec((tile, hop), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, hop), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((r_count, tile, hop), jnp.float32),
            pltpu.SemaphoreType.DMA((r_count,)),
        ],
        interpret=interpret,
    )(hops_p, norm_p)
    return out.reshape(-1)[:out_len]


def fused_supported(frames_shape, hop: int) -> bool:
    return (
        len(frames_shape) == 2
        and hop % _LANES == 0
        and frames_shape[-1] % 2 == 0
    )


def ola_normalized_auto(
    frames: jnp.ndarray,
    norm: jnp.ndarray,
    hop: int,
    out_len: int,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """Pick the fused Pallas kernel when the config allows, else jnp.

    Batched ([..., F, N]) inputs vmap the fused kernel over leading axes.
    """
    on_tpu = jax.default_backend() == "tpu"
    if frames.ndim > 2 and fused_supported(frames.shape[-2:], hop) and on_tpu:
        fn = lambda fr: ola_normalized_fused(  # noqa: E731
            fr, norm, hop, out_len, eps
        )
        for _ in range(frames.ndim - 2):
            fn = jax.vmap(fn)
        return fn(frames)
    if frames.ndim == 2 and fused_supported(frames.shape, hop) and on_tpu:
        return ola_normalized_fused(frames, norm, hop, out_len, eps)
    acc = overlap_add(frames, hop, out_len)
    return normalize(acc, norm[:out_len], eps)
