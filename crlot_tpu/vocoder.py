"""Phase vocoder: time-stretch and pitch-shift on the STFT pipeline.

A TPU-native application layer over `stft`/`istft` (the reference toolkit
stops at the round-trip; this exercises the same machinery with mismatched
analysis/synthesis hops). Everything is vectorized over frames — the
synthesis phase recursion Ps[t] = Ps[t-1] + Hs*(w_k + princarg(dP)/Ha)
is a plain cumulative sum along the frame axis, so the whole stretch is
one jittable array program (no lax.scan, no per-frame dispatch).

Algorithm: standard phase-locking-free PV (Dolson; Laroche & Dolson '99
timescale form): analysis at hop Ha, per-bin instantaneous frequency from
the wrapped phase increment, phase re-integration at synthesis hop Hs,
resynthesis with a synthesis window and sum-w^2 COLA normalization.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from .core.types import StftConfig


def _princarg(p: jnp.ndarray) -> jnp.ndarray:
    """Wrap phase to (-pi, pi]."""
    return p - 2.0 * jnp.pi * jnp.round(p / (2.0 * jnp.pi))


def time_stretch(
    signal: jnp.ndarray, cfg: StftConfig, rate: float
) -> jnp.ndarray:
    """Stretch duration by `rate` (>1 = longer/slower) at constant pitch.

    `cfg.hop_size` is the ANALYSIS hop; the synthesis hop is
    round(rate * hop). The config's synthesis-window flag is forced on
    (modified spectra need the tapered resynthesis + sum-w^2 norm).
    Accepts [..., T]; returns [..., T_out] with
    T_out = (F-1)*Hs + N - 2*pad for F analysis frames.
    """
    if rate <= 0:
        raise ValueError(f"rate must be positive, got {rate}")
    from .pipeline import istft, stft

    # Uncentered analysis: reflect padding (center=True) puts a TIME-REVERSED
    # copy of the signal in the first frames; their bogus instantaneous
    # frequencies enter the phase cumsum once and permanently de-cohere the
    # bins (measured: a pure tone loses half its amplitude at rate 2).
    cfg_a = dataclasses.replace(cfg, synthesis_window=True, center=False)
    ha = cfg_a.hop_size
    hs = max(1, int(round(rate * ha)))
    cfg_s = dataclasses.replace(cfg_a, hop_size=hs)

    spec = stft(jnp.asarray(signal), cfg_a)  # [..., F, K]
    mag = jnp.abs(spec)
    phase = jnp.angle(spec)

    kk = cfg.frame_size // 2 + 1
    omega = (
        2.0 * jnp.pi * jnp.arange(kk, dtype=jnp.float32) / cfg.frame_size
    )
    # Heterodyned phase increment -> per-bin instantaneous frequency.
    dp = phase[..., 1:, :] - phase[..., :-1, :] - omega * ha
    inst = omega + _princarg(dp) / ha  # rad/sample, [..., F-1, K]
    # Re-integrate at the synthesis hop; first frame keeps its phase.
    ps = phase[..., :1, :] + jnp.cumsum(hs * inst, axis=-2)
    phase_s = jnp.concatenate([phase[..., :1, :], ps], axis=-2)

    spec_s = (mag * jnp.cos(phase_s)).astype(jnp.float32) + 1j * (
        mag * jnp.sin(phase_s)
    ).astype(jnp.float32)
    return istft(spec_s, cfg_s)


def pitch_shift(
    signal: jnp.ndarray,
    cfg: StftConfig,
    semitones: float,
) -> jnp.ndarray:
    """Shift pitch by `semitones` at (approximately) constant duration:
    phase-vocoder stretch by s = 2^(semitones/12), then polyphase-resample
    the stretched audio back (playing it s times faster restores duration
    and scales pitch by s). The irrational factor is approximated by a
    rational with denominator <= 64 (pitch error < ~2 cents) — resampling
    between near-coprime rates like 48000:35961 would need a polyphase
    bank with tens of thousands of branches."""
    from fractions import Fraction

    from .resample.polyphase import resample

    s = float(2.0 ** (semitones / 12.0))
    frac = Fraction(s).limit_denominator(64)
    stretched = time_stretch(signal, cfg, frac.numerator / frac.denominator)
    out = resample(stretched, frac.numerator, frac.denominator)
    t = signal.shape[-1]
    out = out[..., :t]
    pad = t - out.shape[-1]
    if pad > 0:
        out = jnp.pad(out, ((0, 0),) * (out.ndim - 1) + ((0, pad),))
    return out
