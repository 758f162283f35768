"""Fundamental-frequency estimation (YIN) and onset detection, vectorized
over frames.

YIN (de Cheveigne & Kawahara 2002) per frame: the windowed difference
function d[tau] = sum_n (x[n] - x[n+tau])^2 expands into two energy terms
(running cumsums) and a cross-correlation — the correlation is computed for
ALL frames at once via rFFT products, so the whole estimator is a handful
of batched FFTs/elementwise passes in one jit, with no per-frame or
per-lag Python looping. The cumulative-mean-normalized difference (CMND)
and the absolute-threshold pick with parabolic refinement follow the paper.

No data-dependent control flow: the "first lag under threshold" pick is an
argmax over a boolean mask with an argmin fallback blended by jnp.where
(static shapes, XLA-friendly).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .core.types import StftConfig

__all__ = ["yin_f0", "onset_strength", "detect_onsets"]


@partial(jax.jit, static_argnames=("cfg", "sr", "fmin", "fmax", "threshold"))
def yin_f0(
    signal: jnp.ndarray,
    cfg: StftConfig,
    sr: float,
    fmin: float = 60.0,
    fmax: float = 2000.0,
    threshold: float = 0.1,
) -> tuple:
    """YIN pitch track of `[..., T]` -> `(f0, aperiodicity)`, each
    `[..., F]`.

    `f0` is in Hz (0 for frames judged unvoiced: no CMND dip under
    `threshold` anywhere in the lag band); `aperiodicity` is the frame's
    minimum CMND value in the band — near 0 for strongly periodic frames,
    near 1 for noise — usable as an unvoiced/voiced confidence.
    The search window is `frame_size // 2` samples, so `fmin` must satisfy
    sr / fmin < frame_size // 2.
    """
    from .frame.framing import frame_signal

    n = cfg.frame_size
    w = n // 2  # YIN integration window; lags up to w fit in the frame
    tau_min = max(1, int(sr / fmax))
    tau_max = min(w - 1, int(np.ceil(sr / fmin)))
    if tau_min >= tau_max:
        raise ValueError(
            f"empty lag band for fmin={fmin}, fmax={fmax} at sr={sr} with "
            f"frame_size={n} (need sr/fmin < frame_size//2 and fmax < sr)"
        )

    x = jnp.asarray(signal, jnp.float32)
    frames = frame_signal(x, cfg.frame_spec)  # [..., F, n]

    # d[tau] = E0 + E[tau] - 2 * cross[tau], tau in [0, w):
    #   E0      = sum_{i<w} x_i^2                  (per frame, constant)
    #   E[tau]  = sum_{i<w} x_{i+tau}^2            (cumsum difference)
    #   cross   = sum_{i<w} x_i * x_{i+tau}        (linear correlation)
    sq = jnp.square(frames)
    csum = jnp.concatenate(
        [jnp.zeros_like(sq[..., :1]), jnp.cumsum(sq, axis=-1)], axis=-1
    )  # [..., F, n+1]
    e0 = csum[..., w] - csum[..., 0]
    taus = jnp.arange(w)
    e_tau = csum[..., taus + w] - csum[..., taus]  # [..., F, w]

    # Linear correlation of x[:w] against x via rFFT (zero-pad to 2n).
    pad = 2 * n
    head = jnp.where(jnp.arange(n) < w, 1.0, 0.0) * frames  # x[:w] view
    fa = jnp.fft.rfft(head, n=pad, axis=-1)
    fb = jnp.fft.rfft(frames, n=pad, axis=-1)
    cross_full = jnp.fft.irfft(jnp.conj(fa) * fb, n=pad, axis=-1)
    cross = cross_full[..., :w]  # lag 0..w-1

    d = e0[..., None] + e_tau - 2.0 * cross
    d = jnp.maximum(d, 0.0)

    # CMND: d'[tau] = d[tau] * tau / sum_{j<=tau} d[j]; d'[0] = 1.
    run = jnp.cumsum(d, axis=-1)
    cmnd = d * taus / jnp.maximum(run, 1e-12)
    cmnd = cmnd.at[..., 0].set(1.0)

    # Restrict to the lag band; outside the band force CMND to +inf-ish.
    band = (taus >= tau_min) & (taus <= tau_max)
    cmnd_b = jnp.where(band, cmnd, 2.0)

    # First LOCAL MINIMUM of the CMND under the threshold (taking the
    # first raw threshold crossing instead lands on the dip's falling
    # edge and biases the period sharp); if none, fall back to the global
    # minimum in the band.
    left = jnp.roll(cmnd_b, 1, axis=-1)
    right = jnp.roll(cmnd_b, -1, axis=-1)
    is_min = (cmnd_b < left) & (cmnd_b <= right)
    under = is_min & (cmnd_b < threshold)
    any_under = jnp.any(under, axis=-1)
    first = jnp.argmax(under, axis=-1)
    best = jnp.argmin(cmnd_b, axis=-1)
    tau_hat = jnp.where(any_under, first, best)

    # Parabolic refinement around tau_hat on the raw d' curve.
    t0 = jnp.clip(tau_hat, tau_min, tau_max)
    ym = jnp.take_along_axis(cmnd, (t0 - 1)[..., None], axis=-1)[..., 0]
    y0 = jnp.take_along_axis(cmnd, t0[..., None], axis=-1)[..., 0]
    yp = jnp.take_along_axis(
        cmnd, jnp.minimum(t0 + 1, w - 1)[..., None], axis=-1
    )[..., 0]
    denom = ym - 2.0 * y0 + yp
    shift = jnp.where(
        jnp.abs(denom) > 1e-12, 0.5 * (ym - yp) / denom, 0.0
    )
    shift = jnp.clip(shift, -0.5, 0.5)
    tau_ref = t0.astype(jnp.float32) + shift

    aperiodicity = jnp.min(cmnd_b, axis=-1)
    f0 = jnp.where(any_under, sr / jnp.maximum(tau_ref, 1.0), 0.0)
    return f0, aperiodicity


@partial(jax.jit, static_argnames=("cfg", "sr", "n_mels", "floor_db"))
def onset_strength(
    signal: jnp.ndarray,
    cfg: StftConfig,
    sr: float,
    n_mels: int = 64,
    floor_db: float = -80.0,
) -> jnp.ndarray:
    """Spectral-flux onset novelty `[..., T] -> [..., F]`: the positive
    first difference of the dB log-mel spectrogram, averaged over bands
    (the standard onset-strength envelope; frame 0 is 0)."""
    from .features import mel_spectrogram, power_to_db

    logmel = power_to_db(
        mel_spectrogram(signal, cfg, sr, n_mels=n_mels), floor_db=floor_db
    )  # [..., F, M]
    flux = jnp.maximum(logmel[..., 1:, :] - logmel[..., :-1, :], 0.0)
    env = jnp.mean(flux, axis=-1)
    return jnp.concatenate(
        [jnp.zeros_like(env[..., :1]), env], axis=-1
    )


@partial(jax.jit, static_argnames=(
    "cfg", "sr", "n_mels", "pre_frames", "post_frames", "delta"))
def detect_onsets(
    signal: jnp.ndarray,
    cfg: StftConfig,
    sr: float,
    n_mels: int = 64,
    pre_frames: int = 3,
    post_frames: int = 3,
    delta: float = 1.0,
) -> tuple:
    """Onset picking on the spectral-flux envelope. Returns
    `(onset_mask, envelope)`, both `[..., F]` — `onset_mask` is boolean
    (static shape: convert to frame indices with `np.nonzero` on the
    host; a data-dependent index list cannot live inside jit).

    A frame is an onset when its novelty is (a) the maximum over a
    `[-pre_frames, +post_frames]` window and (b) at least `delta` dB above
    the window mean (adaptive threshold).

    Timing convention: the flux rises as soon as the event ENTERS the
    analysis window, so an event at sample p is flagged around frame
    p/hop - (frame_size/hop - 1) with uncentered framing (earlier than
    p/hop; use small frames or `cfg.center=True` for tighter alignment).
    """
    env = onset_strength(signal, cfg, sr, n_mels=n_mels)
    w = pre_frames + post_frames + 1
    # Sliding window via stacked shifts (w is small and static).
    pad = jnp.pad(
        env,
        [(0, 0)] * (env.ndim - 1) + [(pre_frames, post_frames)],
        mode="edge",
    )
    f = env.shape[-1]
    windows = jnp.stack(
        [pad[..., k : k + f] for k in range(w)], axis=-1
    )  # [..., F, w]
    is_max = env >= jnp.max(windows, axis=-1) - 1e-9
    above = env >= jnp.mean(windows, axis=-1) + delta
    return is_max & above & (env > 0), env
