"""Pallas polyphase resampler kernel (alternative to the XLA conv lowering).

BASELINE.json: "the r8brain resampler is replaced by a polyphase FIR
resampler as a Pallas kernel". The default path (polyphase.py) lowers the
kernel bank to one strided XLA convolution — already an im2col MXU matmul.
This module is the explicit Pallas formulation of the same math:

  grid step b: DMA the input segment covering TB output blocks
               (TB*M + W samples), build the [TB, W] window matrix by
               static strided sub-slicing in VMEM, and hit the MXU once:
               out[TB, L] = windows @ bank.T.

Bit-compatibility with the conv path is tested (same bank, same windows;
matmul association may differ from conv by float rounding, so the gate is
elementwise closeness, not bit equality).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .polyphase import _kernel_bank

_TB = 8  # output blocks (of L samples each) per grid step


def _resample_kernel(tb: int, m: int, w: int, x_ref, bank_ref, out_ref,
                     scratch, sem):
    b = pl.program_id(0)
    seg_len = scratch.shape[1]
    dma = pltpu.make_async_copy(
        x_ref.at[0, pl.ds(b * tb * m, seg_len)], scratch.at[0], sem
    )
    dma.start()
    dma.wait()
    seg = scratch[0]
    rows = [
        jax.lax.dynamic_slice_in_dim(seg, j * m, w, axis=0)
        for j in range(tb)
    ]
    windows = jnp.stack(rows, axis=0)  # [TB, W]
    out_ref[:] = jax.lax.dot_general(
        windows,
        bank_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6))
def resample_pallas(
    x: jnp.ndarray,  # [T] f32
    l: int,
    m: int,
    n_out: int,
    taps_per_phase=None,
    atten_db: float = 120.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Mono L/M resample via the Pallas kernel; same bank as polyphase.py."""
    bank_np, tau_min, w = _kernel_bank(l, m, taps_per_phase, atten_db)
    bank = jnp.asarray(bank_np)  # [L, W]
    blocks = -(-n_out // l)
    grid = -(-blocks // _TB)
    pad_left = -tau_min
    seg_len = _TB * m + w
    # lane-align the segment length for the DMA
    seg_len = -(-seg_len // 128) * 128
    need = grid * _TB * m + seg_len
    xp = jnp.pad(x, (pad_left, max(0, need - (x.shape[-1] + pad_left))))
    out = pl.pallas_call(
        partial(_resample_kernel, _TB, m, w),
        out_shape=jax.ShapeDtypeStruct((grid * _TB, l), jnp.float32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TB, l), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((1, seg_len), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xp[None, :], bank)
    return out.reshape(-1)[:n_out]
