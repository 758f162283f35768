"""PCEN: sequential-loop oracle + invariance gates."""

import numpy as np
import pytest

import jax.numpy as jnp

from crlot_tpu.core.types import StftConfig
from crlot_tpu.features import mel_spectrogram, pcen

SR = 16000
CFG = StftConfig(frame_size=512, hop_size=128, center=True)
FRAME_RATE = SR / CFG.hop_size


def _pcen_loop(s_mat, s, gain, bias, power, eps):
    """Direct sequential reference implementation."""
    m = np.empty_like(s_mat)
    prev = s_mat[0]
    for t in range(s_mat.shape[0]):
        prev = (1 - s) * prev + s * s_mat[t]
        m[t] = prev
    return (s_mat / (eps + m) ** gain + bias) ** power - bias ** power


def test_pcen_matches_sequential_loop():
    rng = np.random.default_rng(0)
    spec = rng.uniform(0.0, 4.0, (50, 16)).astype(np.float32)
    tc, fr = 0.4, FRAME_RATE
    t = tc * fr
    s = (np.sqrt(1 + 4 * t * t) - 1) / (2 * t * t)
    got = np.asarray(pcen(jnp.asarray(spec), fr, time_constant=tc))
    want = _pcen_loop(spec.astype(np.float64), s, 0.98, 2.0, 0.5, 1e-6)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_pcen_gain_invariance():
    """PCEN of k*S approaches PCEN of S for steady inputs (AGC property)."""
    rng = np.random.default_rng(1)
    base = rng.uniform(0.5, 1.5, (1, 24)).astype(np.float32)
    spec = np.repeat(base, 200, axis=0)  # steady spectrum
    # gain=1.0: the AGC ratio S/M is exactly scale-free (the default 0.98
    # retains a deliberate k^0.02 loudness residue).
    a = np.asarray(pcen(jnp.asarray(spec), FRAME_RATE, gain=1.0))
    b = np.asarray(pcen(jnp.asarray(100.0 * spec), FRAME_RATE, gain=1.0))
    # Steady state: S/M -> 1 regardless of scale -> outputs converge.
    np.testing.assert_allclose(a[-1], b[-1], rtol=0.02, atol=0.02)


def test_pcen_onset_emphasis():
    """A step onset pops above its own steady-state tail."""
    spec = np.zeros((100, 4), np.float32)
    spec[50:] = 1.0
    out = np.asarray(pcen(jnp.asarray(spec), FRAME_RATE))
    assert out[50, 0] > 1.5 * out[99, 0]


def test_pcen_on_mel_pipeline():
    t = np.arange(SR // 2) / SR
    x = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    mel = mel_spectrogram(x, CFG, SR, n_mels=32)
    out = np.asarray(pcen(mel, FRAME_RATE))
    assert out.shape == mel.shape
    assert np.all(np.isfinite(out)) and out.min() >= -1e-5


def test_pcen_validates_args():
    with pytest.raises(ValueError):
        pcen(jnp.ones((4, 4)), FRAME_RATE, time_constant=0.0)


def test_pcen_streaming_zi_matches_oneshot():
    rng = np.random.default_rng(7)
    spec = rng.uniform(0.0, 3.0, (120, 12)).astype(np.float32)
    one = np.asarray(pcen(jnp.asarray(spec), FRAME_RATE))
    a, zf = pcen(jnp.asarray(spec[:70]), FRAME_RATE,
                 zi=jnp.asarray(spec[0]))  # zi = S[0] == the default init
    b, _ = pcen(jnp.asarray(spec[70:]), FRAME_RATE, zi=zf)
    got = np.concatenate([np.asarray(a), np.asarray(b)])
    np.testing.assert_allclose(got, one, rtol=1e-5, atol=1e-6)
