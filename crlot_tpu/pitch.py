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

__all__ = ["yin_f0", "onset_strength", "detect_onsets", "tempogram", "tempo"]


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


@partial(jax.jit, static_argnames=("cfg", "sr", "win_frames", "n_mels"))
def tempogram(
    signal: jnp.ndarray,
    cfg: StftConfig,
    sr: float,
    win_frames: int = 384,
    n_mels: int = 64,
) -> jnp.ndarray:
    """Local autocorrelation tempogram `[..., T] -> [..., F, win_frames]`
    (Grosche & Mueller 2010): the onset-strength envelope is framed into
    Hann-windowed `win_frames`-long windows at every frame (hop 1,
    zero-padded so window f is centered on frame f), each autocorrelated
    via rFFT products, and normalized by its own lag-0 energy — so column
    values are in [-1, 1] and the lag axis reads as periodicity strength.
    Lag l corresponds to 60 * (sr/hop) / l BPM.

    One jit: the hop-1 framing is the framework's gather-free slicing
    (frame/framing.py) and the per-window autocorrelation is one batched
    rFFT/irFFT pair — no per-window looping.
    """
    from .frame.framing import frame_signal
    from .core.types import FrameSpec

    env = onset_strength(signal, cfg, sr, n_mels=n_mels)  # [..., F]
    f = env.shape[-1]
    left = win_frames // 2
    right = win_frames - 1 - left
    pad = jnp.pad(env, [(0, 0)] * (env.ndim - 1) + [(left, right)])
    wins = frame_signal(pad, FrameSpec(win_frames, 1))  # [..., F, win]
    w = jnp.asarray(np.hanning(win_frames + 1)[:-1], jnp.float32)
    wx = wins * w
    spec = jnp.fft.rfft(wx, n=2 * win_frames, axis=-1)
    ac = jnp.fft.irfft(
        jnp.square(spec.real) + jnp.square(spec.imag),
        n=2 * win_frames, axis=-1,
    )[..., :win_frames]
    return ac / jnp.maximum(ac[..., :1], 1e-12)


@partial(jax.jit, static_argnames=(
    "cfg", "sr", "start_bpm", "std_bpm", "min_bpm", "max_bpm", "n_mels"))
def tempo(
    signal: jnp.ndarray,
    cfg: StftConfig,
    sr: float,
    start_bpm: float = 120.0,
    std_bpm: float = 1.0,
    min_bpm: float = 30.0,
    max_bpm: float = 300.0,
    n_mels: int = 64,
) -> jnp.ndarray:
    """Global tempo estimate in BPM, `[..., T] -> [...]` (scalar per
    batch element). The mean-removed onset envelope is autocorrelated
    once (rFFT), scored against a log-normal tempo prior centered at
    `start_bpm` (std `std_bpm` octaves), and the best lag inside the
    `[min_bpm, max_bpm]` band is refined parabolically for sub-lag
    precision. Returns 0 where the envelope is silent.
    """
    env = onset_strength(signal, cfg, sr, n_mels=n_mels)
    env = env - jnp.mean(env, axis=-1, keepdims=True)
    f = env.shape[-1]
    spec = jnp.fft.rfft(env, n=2 * f, axis=-1)
    ac = jnp.fft.irfft(
        jnp.square(spec.real) + jnp.square(spec.imag), n=2 * f, axis=-1
    )[..., :f]

    frame_rate = sr / cfg.hop_size
    # Lag-band feasibility is static (f, frame_rate, bpm bounds are all
    # trace-time constants): an envelope shorter than one max-tempo period
    # has NO valid lag, and argmax over an all -inf score would silently
    # return lag 0 (garbage BPM, observed 5.17e9). Mirror the traced
    # `valid` mask in numpy and fail loudly at trace time instead.
    lags_np = np.arange(f, dtype=np.float32)
    bpm_np = 60.0 * frame_rate / np.maximum(lags_np, 1e-6)
    if not ((bpm_np >= min_bpm) & (bpm_np <= max_bpm) & (lags_np >= 1)).any():
        raise ValueError(
            f"signal too short for tempo(): onset envelope has {f} frames "
            f"but no autocorrelation lag falls inside [{min_bpm}, {max_bpm}] "
            f"BPM at frame rate {frame_rate:.1f}/s (the fastest allowed "
            f"tempo needs {60.0 * frame_rate / max_bpm:.1f} frames)"
        )
    lags = jnp.arange(f, dtype=jnp.float32)
    bpm = 60.0 * frame_rate / jnp.maximum(lags, 1e-6)  # lag 0 -> huge
    prior = jnp.exp(
        -0.5 * jnp.square(
            (jnp.log2(bpm) - np.log2(start_bpm)) / std_bpm
        )
    )
    valid = (bpm >= min_bpm) & (bpm <= max_bpm) & (lags >= 1)
    score = jnp.where(valid, ac * prior, -jnp.inf)
    l0 = jnp.argmax(score, axis=-1)

    # Parabolic refinement on the raw autocorrelation around the peak.
    lm = jnp.clip(l0 - 1, 0, f - 1)
    lp = jnp.clip(l0 + 1, 0, f - 1)
    take = lambda idx: jnp.take_along_axis(
        ac, idx[..., None], axis=-1)[..., 0]
    ym, y0, yp = take(lm), take(l0), take(lp)
    denom = ym - 2.0 * y0 + yp
    shift = jnp.where(jnp.abs(denom) > 1e-12, 0.5 * (ym - yp) / denom, 0.0)
    lag_ref = l0.astype(jnp.float32) + jnp.clip(shift, -0.5, 0.5)

    # True silence leaves a ~1e-6 residue in the dB-flux envelope (f32
    # rounding in the STFT of zeros); anything musical is O(1).
    silent = jnp.max(jnp.abs(env), axis=-1) <= 1e-4
    return jnp.where(
        silent, 0.0, 60.0 * frame_rate / jnp.maximum(lag_ref, 1e-6)
    )
