"""Phase vocoder quality gates: duration law, pitch preservation/shift."""

import numpy as np
import pytest

from crlot_tpu.core.types import StftConfig
from crlot_tpu.vocoder import pitch_shift, time_stretch

SR = 48000


def _tone(freq, seconds=1.0, amp=0.5):
    t = np.arange(int(SR * seconds)) / SR
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def _dominant_hz(x, sr=SR):
    x = np.asarray(x, np.float64)
    spec = np.abs(np.fft.rfft(x * np.hanning(len(x))))
    return np.argmax(spec) * sr / len(x)


def _cfg(hop=256):
    return StftConfig(frame_size=1024, hop_size=hop, center=True)


@pytest.mark.parametrize("rate", [0.75, 1.5, 2.0])
def test_stretch_duration(rate):
    x = _tone(440.0)
    y = np.asarray(time_stretch(x, _cfg(), rate))
    assert y.shape[-1] == pytest.approx(len(x) * rate, rel=0.02)


@pytest.mark.parametrize("rate", [0.75, 1.5])
def test_stretch_preserves_pitch(rate):
    x = _tone(440.0)
    y = np.asarray(time_stretch(x, _cfg(), rate))
    assert _dominant_hz(y) == pytest.approx(440.0, abs=3.0)
    # Steady-state amplitude preserved (no COLA gain error).
    mid = y[len(y) // 4 : -len(y) // 4]
    assert np.max(np.abs(mid)) == pytest.approx(0.5, rel=0.1)


def test_stretch_rate_one_near_identity():
    """rate=1 is a (phase-rebuilt) identity in the interior; the uncentered
    boundary frames taper, so the gate applies away from the edges."""
    x = _tone(440.0)
    y = np.asarray(time_stretch(x, _cfg(), 1.0))
    n = min(len(x), len(y))
    a, b = x[2048 : n - 2048], y[2048 : n - 2048]
    snr = 10 * np.log10(np.sum(a**2) / np.sum((a - b) ** 2))
    assert snr > 60.0, snr


@pytest.mark.slow
def test_stretch_long_signal_phase_precision():
    """The synthesis-phase carrier ramp is exact mod 2*pi (integer
    arithmetic), so reconstruction must NOT degrade with signal length —
    an f32 cumsum of the full unwrapped phase collapses to ~23 dB at 30 s
    (the regression this guards). 440 Hz sits OFF the bin grid, so the
    wrapped-deviation cumsum (the only f32 accumulation left) is actually
    exercised; an on-bin tone would leave it ~zero."""
    x = _tone(440.0, seconds=30.0)
    y = np.asarray(time_stretch(x, _cfg(), 1.0))
    n = min(len(x), len(y))
    a, b = x[2048 : n - 2048], y[2048 : n - 2048]
    snr = 10 * np.log10(np.sum(a**2) / np.sum((a - b) ** 2))
    assert snr > 60.0, snr


def test_stretch_frame_size_limit():
    with pytest.raises(ValueError):
        time_stretch(np.zeros(65536 * 2, np.float32),
                     StftConfig(frame_size=65536, hop_size=16384), 1.5)


def test_stretch_multichannel():
    x = np.stack([_tone(440.0), _tone(880.0)])
    y = np.asarray(time_stretch(x, _cfg(), 1.5))
    assert y.shape[0] == 2
    assert _dominant_hz(y[0]) == pytest.approx(440.0, abs=3.0)
    assert _dominant_hz(y[1]) == pytest.approx(880.0, abs=3.0)


@pytest.mark.parametrize("semi,expected", [(12.0, 880.0), (-12.0, 220.0)])
def test_pitch_shift_octaves(semi, expected):
    x = _tone(440.0)
    y = np.asarray(pitch_shift(x, _cfg(), semi))
    assert y.shape[-1] == len(x)  # duration preserved
    assert _dominant_hz(y) == pytest.approx(expected, abs=5.0)


def test_bad_rate_raises():
    with pytest.raises(ValueError):
        time_stretch(_tone(440.0), _cfg(), 0.0)
