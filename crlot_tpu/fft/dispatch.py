"""FFT backend dispatch: pick the fastest lowering for the current device.

Reference analog: the `FFT_BACKEND=kissfft` build-time config_setting
(dsp/fft/BUILD.bazel:4-7) becomes a runtime enum (SURVEY.md §5 'Config'):

  - XLA:    jnp.fft (always correct, any N; slow on TPU)
  - MATMUL: DFT-as-matmul on the MXU (TPU-fast; N <= MAX_MATMUL_NFFT)
  - AUTO:   MATMUL on TPU when N qualifies, XLA otherwise
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.types import FftBackend
from . import matmul_backend as _mm


def _pick(backend: FftBackend, nfft: int) -> FftBackend:
    if backend != FftBackend.AUTO:
        return backend
    if (
        jax.default_backend() == "tpu"
        and nfft <= _mm.MAX_MATMUL_NFFT
        and nfft % 2 == 0
    ):
        return FftBackend.MATMUL
    return FftBackend.XLA


def rfft(
    x: jnp.ndarray, nfft: int, backend: FftBackend = FftBackend.AUTO
) -> jnp.ndarray:
    if _pick(backend, nfft) == FftBackend.MATMUL:
        return _mm.rfft_matmul(x, nfft)
    return jnp.fft.rfft(x, n=nfft, axis=-1)


def irfft(
    x: jnp.ndarray, nfft: int, backend: FftBackend = FftBackend.AUTO
) -> jnp.ndarray:
    if _pick(backend, nfft) == FftBackend.MATMUL:
        return _mm.irfft_matmul(x, nfft)
    return jnp.fft.irfft(x, n=nfft, axis=-1)


__all__ = ["FftBackend", "rfft", "irfft"]
