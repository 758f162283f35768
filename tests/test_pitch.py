"""YIN pitch estimation: analytic tone/harmonic/noise gates."""

import numpy as np
import pytest

from crlot_tpu.core.types import StftConfig
from crlot_tpu.pitch import yin_f0

SR = 48000
CFG = StftConfig(frame_size=2048, hop_size=512, center=False)


def _tone(freq, seconds=0.4, sr=SR, amp=0.8):
    t = np.arange(int(seconds * sr)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


@pytest.mark.parametrize("freq", [110.0, 220.0, 440.0, 1000.0])
def test_yin_pure_tone(freq):
    f0, ap = (np.asarray(v) for v in yin_f0(_tone(freq), CFG, float(SR)))
    interior = f0[2:-2]
    assert np.all(np.abs(interior - freq) / freq < 0.01), interior
    assert np.all(np.asarray(ap)[2:-2] < 0.05)


def test_yin_harmonic_series_no_octave_error():
    # Saw-like stack: fundamental + 5 harmonics with decaying amplitude.
    f0_true = 150.0
    t = np.arange(SR // 2) / SR
    x = sum(
        (0.6 / k) * np.sin(2 * np.pi * f0_true * k * t) for k in range(1, 7)
    ).astype(np.float32)
    f0, _ = yin_f0(x, CFG, float(SR))
    interior = np.asarray(f0)[2:-2]
    assert np.all(np.abs(interior - f0_true) / f0_true < 0.01), interior


def test_yin_noise_is_unvoiced():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(SR // 2).astype(np.float32)
    f0, ap = (np.asarray(v) for v in yin_f0(x, CFG, float(SR)))
    # White noise: high aperiodicity, mostly unvoiced frames.
    assert np.median(ap) > 0.3
    assert np.mean(f0 == 0.0) > 0.5


def test_yin_silence():
    f0, ap = (np.asarray(v) for v in
              yin_f0(np.zeros(SR // 2, np.float32), CFG, float(SR)))
    assert np.all(np.isfinite(f0)) and np.all(np.isfinite(ap))


def test_yin_batched():
    x = np.stack([_tone(220.0, 0.25), _tone(440.0, 0.25)])
    f0, _ = yin_f0(x, CFG, float(SR))
    f0 = np.asarray(f0)
    assert abs(np.median(f0[0]) - 220.0) < 3.0
    assert abs(np.median(f0[1]) - 440.0) < 5.0


def test_yin_validation():
    # Inverted/empty lag band must raise at trace time.
    with pytest.raises(ValueError):
        yin_f0(_tone(440.0), CFG, float(SR), fmin=1000.0, fmax=900.0)


# ---------------------------------------------------------------------------
# onset detection
# ---------------------------------------------------------------------------

def _click_train(positions, total, sr=SR, width=64):
    x = np.zeros(total, np.float32)
    rng = np.random.default_rng(1)
    for p in positions:
        x[p : p + width] += rng.standard_normal(width).astype(np.float32)
    return x


def test_onset_strength_peaks_at_clicks():
    from crlot_tpu.pitch import onset_strength

    hop = CFG.hop_size
    entry = CFG.frame_size // hop - 1  # frames before p/hop where the
    clicks = [hop * 20, hop * 50, hop * 80]  # event enters the window
    x = _click_train(clicks, hop * 110)
    env = np.asarray(onset_strength(x, CFG, float(SR)))
    for p in clicks:
        frame = p // hop - entry
        window = env[max(frame - 1, 0) : frame + 2]
        assert window.max() > 3 * np.median(env), (frame, window.max())


def test_detect_onsets_finds_clicks_and_not_steady_tone():
    from crlot_tpu.pitch import detect_onsets

    hop = CFG.hop_size
    clicks = [hop * 20, hop * 50, hop * 80]
    x = _click_train(clicks, hop * 110)
    mask, env = detect_onsets(x, CFG, float(SR))
    idx = np.nonzero(np.asarray(mask))[0]
    entry = CFG.frame_size // hop - 1
    for p in clicks:
        want = p // hop - entry  # frame where the click enters the window
        assert np.any(np.abs(idx - want) <= 1), (want, idx)
    assert len(idx) == len(clicks)  # no spurious extra onsets

    tone = _tone(440.0, seconds=hop * 110 / SR)
    mask_t, _ = detect_onsets(tone, CFG, float(SR))
    # A steady tone has at most the initial attack as an onset.
    assert np.asarray(mask_t)[5:].sum() == 0


def test_detect_onsets_silence():
    from crlot_tpu.pitch import detect_onsets

    mask, env = detect_onsets(np.zeros(SR // 2, np.float32), CFG, float(SR))
    assert np.asarray(mask).sum() == 0
    assert np.all(np.asarray(env) < 1e-4)  # floored dB: fp noise only
