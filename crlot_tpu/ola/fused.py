"""Fused Pallas OLA + normalize kernel: one pass over HBM.

The jnp overlap-add (ola/reference.py) issues R dynamic-update-slice adds,
each reading and writing the whole output buffer — ~2R x output traffic. This
kernel computes each output hop-block tile directly:

    out[b] = (sum_{r=R-1..0} hops_padded[b + (R-1-r), r]) / max(norm[b], eps)

Mosaic requires DMA slice shapes aligned to the memref tiling, so the frame
matrix stays in its natural 2-D [F, R*H] layout and each grid step issues ONE
sublane-aligned DMA of (tile + pad) rows; the R diagonal (frame-shifted)
views are taken by sub-slicing VMEM, where misaligned sublane offsets are
legal. Read amplification is (tile+pad)/tile (~1.25x at tile=32); everything
else moves once, so traffic ~= read(frames) + read(norm) + write(out) — vs
~2R passes for the jnp path. The summation runs r descending = ascending
frame index, matching the canonical left-to-right frame order of the jnp
path bit-for-bit.

Constraints: hop % 128 == 0 and f32 (VPU lane alignment); other configs fall
back to the jnp path (ola_normalized_auto).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .reference import normalize, overlap_add

_LANES = 128
_SUBLANES = 8
_DEF_TILE = 32  # output hop-blocks per grid step


def _fused_kernel(r_count: int, hop: int, extra: int, eps: float,
                  hops_ref, norm_ref, out_ref, scratch, sem):
    b = pl.program_id(0)
    tb = out_ref.shape[0]
    dma = pltpu.make_async_copy(
        hops_ref.at[pl.ds(b * tb, tb + extra), :], scratch, sem
    )
    dma.start()
    dma.wait()
    # Row j of this tile needs hops rows j + (R-1-r) for each r; take the R
    # shifted views from VMEM. r descending == ascending frame index
    # (canonical summation order).
    r = r_count - 1
    acc = scratch[0:tb, r * hop : (r + 1) * hop]
    for r in range(r_count - 2, -1, -1):
        shift = r_count - 1 - r
        acc = acc + scratch[shift : shift + tb, r * hop : (r + 1) * hop]
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
    blocks = -(-out_len // hop)
    tile = _DEF_TILE
    grid = -(-blocks // tile)
    extra = -(-(r_count - 1) // _SUBLANES) * _SUBLANES if r_count > 1 else 0
    # Row b of the padded matrix holds frame b - (R-1) (front pad realizes
    # the +(R-1-r) shift); back pad keeps every tile's DMA in range.
    rows_needed = grid * tile + extra
    back = max(0, rows_needed - f - (r_count - 1))
    hops_p = jnp.pad(frames, ((r_count - 1, back), (0, 0)))
    norm_p = jnp.pad(norm, (0, grid * tile * hop - out_len)).reshape(
        grid * tile, hop
    )

    out = pl.pallas_call(
        partial(_fused_kernel, r_count, hop, extra, eps),
        out_shape=jax.ShapeDtypeStruct((grid * tile, hop), jnp.float32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # frame matrix stays in HBM
            pl.BlockSpec((tile, hop), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, hop), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tile + extra, n_pad), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
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

    Batched ([..., F, N]) inputs unroll the fused kernel over leading axes.
    """
    on_tpu = jax.default_backend() == "tpu"
    if frames.ndim > 2 and fused_supported(frames.shape[-2:], hop) and on_tpu:
        # vmap of a pallas_call with HBM-resident inputs does not lower on
        # Mosaic (the batched index_map on a memory_space=ANY block is
        # rejected); unroll the (small, static) batch axes instead — each
        # iteration is an independent 2-D kernel launch.
        lead = frames.shape[:-2]
        flat = frames.reshape((-1,) + frames.shape[-2:])
        outs = [
            ola_normalized_fused(flat[i], norm, hop, out_len, eps)
            for i in range(flat.shape[0])
        ]
        return jnp.stack(outs).reshape(lead + (out_len,))
    if frames.ndim == 2 and fused_supported(frames.shape, hop) and on_tpu:
        return ola_normalized_fused(frames, norm, hop, out_len, eps)
    acc = overlap_add(frames, hop, out_len)
    return normalize(acc, norm[:out_len], eps)
