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

import jax as _jax

from ..core.types import FftBackend, FftPrecision
from . import ct_backend as _ct
from . import matmul_backend as _mm


def to_lax_precision(p):
    """Map FftPrecision (or None) to jax.lax.Precision (None = backend
    default). INT8X2 maps to HIGH for lowerings that don't have an int8
    formulation (the tiled round-trip dispatches to fft.int8_backend
    before this fallback applies)."""
    if p is None:
        return None
    if p in (FftPrecision.HIGH, FftPrecision.INT8X2):
        return _jax.lax.Precision.HIGH
    return _jax.lax.Precision.HIGHEST


def _is_pow2(n: int) -> bool:
    return n > 0 and not (n & (n - 1))


def _pick(backend: FftBackend, nfft: int) -> FftBackend:
    if backend == FftBackend.XLA:
        return FftBackend.XLA
    if backend == FftBackend.MATMUL:
        return FftBackend.MATMUL
    # AUTO: MXU paths on TPU when the size qualifies.
    if jax.default_backend() == "tpu" and nfft % 2 == 0:
        if nfft <= _mm.MAX_MATMUL_NFFT or _is_pow2(nfft):
            return FftBackend.MATMUL
    return FftBackend.XLA


def _mm_rfft(x: jnp.ndarray, nfft: int, precision=None) -> jnp.ndarray:
    # Direct DFT matmul up to the basis-size cap; two-stage Cooley-Tukey
    # matmuls beyond (power-of-two sizes).
    if nfft <= _mm.MAX_MATMUL_NFFT:
        if nfft % 2 == 0:
            return _mm.rfft_folded(x, nfft, precision)
        return _mm.rfft_matmul(x, nfft, precision)
    if _is_pow2(nfft):
        return _ct.rfft_ct(x, nfft, precision)
    return jnp.fft.rfft(x, n=nfft, axis=-1)


def _mm_irfft(x: jnp.ndarray, nfft: int, precision=None) -> jnp.ndarray:
    if nfft <= _mm.MAX_MATMUL_NFFT:
        if nfft % 2 == 0:
            return _mm.irfft_folded(x, nfft, precision)
        return _mm.irfft_matmul(x, nfft, precision)
    if _is_pow2(nfft):
        return _ct.irfft_ct(x, nfft, precision)
    return jnp.fft.irfft(x, n=nfft, axis=-1)


def rfft(
    x: jnp.ndarray, nfft: int, backend: FftBackend = FftBackend.AUTO,
    precision=None,
) -> jnp.ndarray:
    if _pick(backend, nfft) == FftBackend.MATMUL:
        return _mm_rfft(x, nfft, precision)
    return jnp.fft.rfft(x, n=nfft, axis=-1)


def irfft(
    x: jnp.ndarray, nfft: int, backend: FftBackend = FftBackend.AUTO,
    precision=None,
) -> jnp.ndarray:
    if _pick(backend, nfft) == FftBackend.MATMUL:
        return _mm_irfft(x, nfft, precision)
    return jnp.fft.irfft(x, n=nfft, axis=-1)


__all__ = ["FftBackend", "rfft", "irfft"]


def rfft_windowed(
    x: jnp.ndarray,
    nfft: int,
    window_f64,
    backend: FftBackend = FftBackend.AUTO,
    precision=None,
) -> jnp.ndarray:
    """rfft(x * window): on the direct-matmul path the window folds into the
    DFT basis (zero-cost); other paths multiply then transform.

    `window_f64` is the float64 host design of the window (the f32 working
    window is its cast), so folding loses no precision vs multiply-then-DFT.
    """
    import numpy as np

    from . import matmul_backend as _mmb

    if _pick(backend, nfft) == FftBackend.MATMUL and nfft <= _mm.MAX_MATMUL_NFFT:
        if nfft % 2 == 0:
            return _mmb.rfft_windowed_folded(x, nfft, window_f64, precision)
        return _mmb.rfft_windowed_matmul(x, nfft, window_f64, precision)
    w = jnp.asarray(np.asarray(window_f64, dtype=np.float32))
    return rfft(x * w, nfft, backend, precision)


def fft_complex(
    x: jnp.ndarray, nfft: int, backend: FftBackend = FftBackend.AUTO,
    precision=None,
) -> jnp.ndarray:
    """Complex forward FFT with backend dispatch (CT matmuls for power-of-2
    sizes on the MATMUL path, jnp.fft otherwise)."""
    if _pick(backend, nfft) == FftBackend.MATMUL and _is_pow2(nfft):
        return _ct.fft_ct(x, nfft, precision)
    return jnp.fft.fft(x, n=nfft, axis=-1)


def ifft_complex(
    x: jnp.ndarray, nfft: int, backend: FftBackend = FftBackend.AUTO,
    precision=None,
) -> jnp.ndarray:
    if _pick(backend, nfft) == FftBackend.MATMUL and _is_pow2(nfft):
        return _ct.ifft_ct(x, nfft, precision)
    return jnp.fft.ifft(x, n=nfft, axis=-1)
