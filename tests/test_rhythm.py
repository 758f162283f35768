"""Spectral contrast + tempogram/tempo: analytic gates.

Oracle strategy: signals whose answer is known by construction — pure
tones (peaked spectra, known band), white noise (flat spectra), and click
trains at exact BPMs.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from crlot_tpu.core.types import StftConfig
from crlot_tpu.features import _contrast_band_slices, spectral_contrast
from crlot_tpu.pitch import tempo, tempogram

SR = 48000
CFG = StftConfig(frame_size=1024, hop_size=256, center=True)


def _tone(freq, seconds=0.5, sr=SR):
    t = np.arange(int(seconds * sr)) / sr
    return np.sin(2 * np.pi * freq * t).astype(np.float32)


def _click_train(bpm, seconds=6.0, sr=SR, width=32):
    x = np.zeros(int(seconds * sr), dtype=np.float32)
    period = int(round(60.0 / bpm * sr))
    for p in range(0, len(x) - width, period):
        x[p : p + width] = 1.0
    return x


# ---------------------------------------------------------------------------
# spectral contrast
# ---------------------------------------------------------------------------

def test_contrast_bands_cover_spectrum():
    bands = _contrast_band_slices(SR, 1024, 6, 200.0)
    assert len(bands) == 7
    assert bands[0][0] == 0
    assert all(hi > lo + 1 for lo, hi in bands)
    # Octave doubling: each interior band spans ~2x the previous in Hz.
    assert bands[-1][1] <= 1024 // 2 + 1


def test_contrast_rejects_too_many_bands():
    with pytest.raises(ValueError):
        _contrast_band_slices(SR, 1024, 12, 200.0)


def test_contrast_shape():
    c = spectral_contrast(_tone(1000.0), CFG, SR)
    assert c.shape[-1] == 7
    assert c.ndim == 2


def test_tone_has_high_contrast_in_its_band():
    c = np.asarray(spectral_contrast(_tone(1000.0), CFG, SR))
    bands = _contrast_band_slices(SR, 1024, 6, 200.0)
    freqs = np.fft.rfftfreq(1024, 1.0 / SR)
    band_idx = next(
        i for i, (lo, hi) in enumerate(bands)
        if freqs[lo] <= 1000.0 < freqs[hi - 1] + (freqs[1] - freqs[0])
    )
    mid = c[c.shape[0] // 2]
    assert mid[band_idx] > 30.0  # tone: peak towers over the noise floor


def test_noise_has_low_contrast():
    rng = np.random.default_rng(5)
    x = rng.standard_normal(SR // 2).astype(np.float32)
    c = np.asarray(spectral_contrast(x, CFG, SR))
    # White noise: peak/valley gap stays modest in every band.
    assert float(np.median(c)) < 25.0


def test_tone_beats_noise_contrast():
    rng = np.random.default_rng(6)
    noise = rng.standard_normal(SR // 2).astype(np.float32)
    ct = np.asarray(spectral_contrast(_tone(1000.0), CFG, SR))
    cn = np.asarray(spectral_contrast(noise, CFG, SR))
    assert np.max(np.median(ct, axis=0)) > np.max(np.median(cn, axis=0))


def test_contrast_linear_matches_db():
    x = _tone(500.0, seconds=0.25)
    db = np.asarray(spectral_contrast(x, CFG, SR))
    lin = np.asarray(spectral_contrast(x, CFG, SR, linear=True))
    np.testing.assert_allclose(
        10.0 * np.log10(np.maximum(lin, 1e-12)), db, atol=0.5
    )


def test_contrast_rejects_bad_quantile():
    with pytest.raises(ValueError):
        spectral_contrast(_tone(500.0, seconds=0.1), CFG, SR, quantile=0.9)


# ---------------------------------------------------------------------------
# tempo
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("bpm", [90.0, 120.0, 150.0])
def test_click_train_tempo(bpm):
    got = float(tempo(_click_train(bpm), CFG, SR))
    assert abs(got - bpm) / bpm < 0.05, got


def test_silence_tempo_is_zero():
    assert float(tempo(np.zeros(SR, np.float32), CFG, SR)) == 0.0


def test_tempo_batched():
    x = np.stack([_click_train(90.0), _click_train(150.0)])
    got = np.asarray(tempo(x, CFG, SR))
    assert abs(got[0] - 90.0) < 5.0 and abs(got[1] - 150.0) < 8.0


def test_tempogram_peak_at_period():
    bpm = 120.0
    x = _click_train(bpm)
    tg = np.asarray(tempogram(x, CFG, SR, win_frames=256))
    assert tg.shape[-1] == 256
    # Normalized: lag 0 column is exactly 1.
    np.testing.assert_allclose(tg[..., 0], 1.0, atol=1e-5)
    period_lag = 60.0 / bpm * SR / CFG.hop_size  # 93.75 frames
    mid = tg[tg.shape[0] // 2]
    # Peak among lags >= 20 sits at the click period (+-2 lags).
    peak = 20 + int(np.argmax(mid[20:]))
    assert abs(peak - period_lag) <= 2.0, (peak, period_lag)


def test_tempo_too_short_raises():
    """Advice r2: sub-lag-band audio used to return garbage (observed
    5.17e9 BPM from an argmax over all -inf scores); now a trace-time
    ValueError names the infeasible lag band."""
    with pytest.raises(ValueError, match="too short for tempo"):
        tempo(np.zeros(2048, np.float32), CFG, SR)
