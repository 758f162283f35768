"""Welch power-spectral-density estimation on the STFT pipeline.

A toolkit staple built directly on the framed MXU DFT: average the
per-frame periodograms |X_f[k]|^2 with the standard window-power and
sampling normalization (matches scipy.signal.welch with the same window,
nperseg = frame_size, noverlap = frame_size - hop_size, detrend=False).

Everything runs in one jit: framing, the matmul DFT, the magnitude
square, and the frame average — complex64 never escapes jit (axon
backend constraint).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .core.types import StftConfig


@partial(jax.jit, static_argnames=("cfg", "fs", "scaling"))
def welch_psd(
    signal: jnp.ndarray,
    cfg: StftConfig,
    fs: float = 1.0,
    scaling: str = "density",
) -> jnp.ndarray:
    """Welch PSD of `[..., T]` -> `[..., nfft//2+1]`.

    `scaling="density"` gives V^2/Hz (divide by fs * sum(w^2));
    `scaling="spectrum"` gives V^2 (divide by sum(w)^2). One-sided:
    interior bins are doubled. `cfg.center` is ignored (Welch segments
    never extend past the data). Use `welch_freqs(cfg, fs)` for the bin
    frequencies.
    """
    if scaling not in ("density", "spectrum"):
        raise ValueError(f"unknown scaling: {scaling}")
    import dataclasses

    from .pipeline import _window_f64, stft

    cfg_u = dataclasses.replace(cfg, center=False)
    spec = stft(jnp.asarray(signal), cfg_u)  # [..., F, K]
    p = jnp.mean(
        jnp.square(spec.real) + jnp.square(spec.imag), axis=-2
    )
    w = _window_f64(cfg_u)
    if scaling == "density":
        norm = 1.0 / (fs * float(np.sum(w * w)))
    else:
        norm = 1.0 / float(np.sum(w)) ** 2
    p = p * norm
    # One-sided doubling (DC and Nyquist appear once).
    kk = cfg.frame_size // 2 + 1
    scale = jnp.ones(kk, jnp.float32).at[1:-1].set(2.0)
    return p * scale


def welch_freqs(cfg: StftConfig, fs: float = 1.0) -> np.ndarray:
    """Bin center frequencies for `welch_psd` (host numpy)."""
    return np.fft.rfftfreq(cfg.frame_size, d=1.0 / fs)
