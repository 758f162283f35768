"""DFT-as-matmul backend: rFFT/irFFT as MXU matrix products.

TPUs have no FFT hardware; XLA lowers fft ops to generic loops that leave the
MXU idle. For the frame sizes this pipeline sweeps (256..16384, typically
1024), the O(N^2) real DFT as a single [batch, N] x [N, 2K] matmul runs at
MXU speed and beats the O(N log N) lowering by a wide margin — the classic
TPU formulation ("use the matrix unit for everything that can be a matmul").

Numerics: basis matrices are built in float64 and cast to float32; matmuls
run at Precision.HIGHEST (bf16x6 passes ~ f32 accuracy). Round-trip RMSE is
checked by tests against the XLA backend within the reference's 1e-5 hard
gate (tests/fft_test.cc:76-82 tiering).

Memory: the basis is [N, N+2] f32 per direction (~4 MB at N=1024, ~1 GB at
N=16384) — this backend is used for N <= MAX_MATMUL_NFFT, XLA FFT otherwise
(see fft.dispatch).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

MAX_MATMUL_NFFT = 4096

# Default matmul accumulation tier when callers pass precision=None:
# HIGHEST ~= f32 (six bf16 passes, ~141 dB SNR), HIGH = three passes
# (~8x faster, ~95 dB SNR). Pipelines pass their config's tier explicitly.
PRECISION = jax.lax.Precision.HIGHEST


def set_precision(p) -> None:
    """Module-wide default matmul precision for the DFT bases."""
    global PRECISION
    PRECISION = p


def _prec(precision):
    return PRECISION if precision is None else precision


@lru_cache(maxsize=None)
def _forward_basis(nfft: int) -> np.ndarray:
    """[N, 2K] with columns [cos | -sin]: x @ B -> [Re(X) | Im(X)]."""
    k = np.arange(nfft // 2 + 1, dtype=np.float64)
    n = np.arange(nfft, dtype=np.float64)
    ang = 2.0 * np.pi * np.outer(n, k) / nfft
    return np.concatenate([np.cos(ang), -np.sin(ang)], axis=1).astype(np.float32)


@lru_cache(maxsize=None)
def _inverse_basis(nfft: int) -> np.ndarray:
    """[2K, N]: [Re(X) | Im(X)] @ B -> x, with hermitian weights and 1/N."""
    kk = nfft // 2 + 1
    k = np.arange(kk, dtype=np.float64)
    n = np.arange(nfft, dtype=np.float64)
    ang = 2.0 * np.pi * np.outer(k, n) / nfft
    w = np.full(kk, 2.0)
    w[0] = 1.0
    if nfft % 2 == 0:
        w[-1] = 1.0
    cos_part = (w[:, None] * np.cos(ang)) / nfft
    sin_part = -(w[:, None] * np.sin(ang)) / nfft
    return np.concatenate([cos_part, sin_part], axis=0).astype(np.float32)


def rfft_matmul(x: jnp.ndarray, nfft: int, precision=None) -> jnp.ndarray:
    """Real [..., nfft] -> complex64 [..., nfft//2+1] via one MXU matmul."""
    basis = jnp.asarray(_forward_basis(nfft))
    flat = jnp.dot(
        x.astype(jnp.float32), basis, precision=_prec(precision)
    )
    kk = nfft // 2 + 1
    return jax.lax.complex(flat[..., :kk], flat[..., kk:])


def irfft_matmul(spec: jnp.ndarray, nfft: int, precision=None) -> jnp.ndarray:
    """Complex [..., nfft//2+1] -> real [..., nfft] (includes 1/N)."""
    basis = jnp.asarray(_inverse_basis(nfft))
    ri = jnp.concatenate([spec.real, spec.imag], axis=-1).astype(jnp.float32)
    return jnp.dot(ri, basis, precision=_prec(precision))


@lru_cache(maxsize=None)
def _windowed_forward_basis(nfft: int, window_bytes: bytes) -> np.ndarray:
    """Forward basis with the analysis window folded in:
    (x * w) @ B == x @ (diag(w) @ B). Saves a full elementwise pass over the
    frame matrix — the window costs zero on the matmul path."""
    w = np.frombuffer(window_bytes, dtype=np.float64)
    assert len(w) == nfft
    return (w[:, None] * _forward_basis(nfft).astype(np.float64)).astype(
        np.float32
    )


def rfft_windowed_matmul(
    x: jnp.ndarray, nfft: int, window_f64: np.ndarray, precision=None
) -> jnp.ndarray:
    """rfft(x * window) as ONE matmul on unwindowed frames."""
    basis = jnp.asarray(
        _windowed_forward_basis(nfft, np.asarray(window_f64, np.float64).tobytes())
    )
    flat = jnp.dot(
        x.astype(jnp.float32), basis, precision=_prec(precision)
    )
    kk = nfft // 2 + 1
    return jax.lax.complex(flat[..., :kk], flat[..., kk:])


@lru_cache(maxsize=None)
def _windowed_inverse_basis(nfft: int, window_bytes: bytes) -> np.ndarray:
    """Inverse basis with a synthesis window folded in (columns scaled)."""
    w = np.frombuffer(window_bytes, dtype=np.float64)
    assert len(w) == nfft
    base = _inverse_basis(nfft).astype(np.float64)
    return (base * w[None, :]).astype(np.float32)


def roundtrip_packed_matmul(
    frames: jnp.ndarray,
    nfft: int,
    analysis_window_f64: np.ndarray,
    synthesis_window_f64=None,
    precision=None,
) -> jnp.ndarray:
    """irfft(rfft(frames * w)) as two matmuls with NO complex dtype.

    The forward basis emits [Re | Im] packed reals — exactly the layout the
    inverse basis consumes — so the identity-processing round-trip never
    interleaves into complex64 (complex conversion costs two full passes over
    the spectrum on TPU). Used by pipeline.round_trip when spectral_fn is
    None; any real processing goes through the complex view instead.
    """
    wb = np.asarray(analysis_window_f64, np.float64).tobytes()
    fwd = jnp.asarray(_windowed_forward_basis(nfft, wb))
    if synthesis_window_f64 is not None:
        sb = np.asarray(synthesis_window_f64, np.float64).tobytes()
        inv = jnp.asarray(_windowed_inverse_basis(nfft, sb))
    else:
        inv = jnp.asarray(_inverse_basis(nfft))
    packed = jnp.dot(
        frames.astype(jnp.float32), fwd, precision=_prec(precision)
    )
    return jnp.dot(packed, inv, precision=_prec(precision))
