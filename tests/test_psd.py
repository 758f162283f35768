"""Welch PSD vs the scipy oracle (density + spectrum scalings)."""

import numpy as np
import pytest
import scipy.signal

from crlot_tpu.core.types import StftConfig, WindowType
from crlot_tpu.psd import welch_freqs, welch_psd

SR = 48000


def _cfg(n=1024, hop=512, window=WindowType.HANN):
    return StftConfig(frame_size=n, hop_size=hop, window=window)


@pytest.mark.parametrize("scaling", ["density", "spectrum"])
@pytest.mark.parametrize("n,hop", [(1024, 512), (1024, 256), (512, 128)])
def test_welch_matches_scipy(scaling, n, hop):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(SR).astype(np.float32)
    cfg = _cfg(n, hop)
    got = np.asarray(welch_psd(x, cfg, fs=SR, scaling=scaling))
    f_ref, want = scipy.signal.welch(
        x, fs=SR, window="hann", nperseg=n, noverlap=n - hop,
        detrend=False, scaling=scaling,
    )
    np.testing.assert_allclose(welch_freqs(cfg, SR), f_ref)
    rel = np.sqrt(np.mean((got - want) ** 2)) / np.sqrt(np.mean(want**2))
    assert rel < 1e-4, f"{scaling} N={n} H={hop}: rel rmse {rel}"


def test_welch_tone_peak_and_parseval():
    freq = 32 * SR / 1024  # exactly on bin 32 (off-bin leaks to neighbors)
    t = np.arange(SR) / SR
    x = (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
    cfg = _cfg()
    p = np.asarray(welch_psd(x, cfg, fs=SR, scaling="spectrum"))
    f = welch_freqs(cfg, SR)
    assert f[np.argmax(p)] == pytest.approx(freq, abs=SR / 1024)
    # Spectrum scaling: an on-bin tone's peak carries its power A^2/2.
    assert p.max() == pytest.approx(0.125, rel=0.05)


def test_welch_batched():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((3, 24000)).astype(np.float32)
    p = np.asarray(welch_psd(x, _cfg(), fs=SR))
    assert p.shape == (3, 513)
    assert np.isfinite(p).all() and (p >= 0).all()


def test_coherence_matches_scipy():
    from crlot_tpu.psd import coherence

    rng = np.random.default_rng(2)
    n = 24000
    x = rng.standard_normal(n).astype(np.float32)
    # y = filtered x + independent noise: coherent at low freq only.
    y = (np.convolve(x, np.ones(8) / 8.0, mode="same")
         + 0.5 * rng.standard_normal(n)).astype(np.float32)
    cfg = _cfg(1024, 512)
    got = np.asarray(coherence(x, y, cfg))
    _, want = scipy.signal.coherence(
        x, y, window="hann", nperseg=1024, noverlap=512, detrend=False
    )
    rel = np.sqrt(np.mean((got - want) ** 2))
    assert rel < 1e-4, f"coherence rmse {rel}"
    assert (got >= 0).all() and (got <= 1.0 + 1e-5).all()


def test_coherence_identical_signals_is_one():
    from crlot_tpu.psd import coherence

    rng = np.random.default_rng(3)
    x = rng.standard_normal(24000).astype(np.float32)
    c = np.asarray(coherence(x, x, _cfg(1024, 256)))
    np.testing.assert_allclose(c, 1.0, atol=1e-4)


def test_welch_validation():
    with pytest.raises(ValueError):
        welch_psd(np.zeros(4096, np.float32), _cfg(), scaling="db")


def test_welch_too_short_signal_raises():
    """< one segment: loud ValueError, not a silent NaN PSD (ADVICE r1)."""
    with pytest.raises(ValueError, match="zero Welch segments"):
        welch_psd(np.zeros(512, np.float32), _cfg(1024, 256))


def test_coherence_too_short_signal_raises():
    from crlot_tpu.psd import coherence

    with pytest.raises(ValueError, match="zero Welch segments"):
        coherence(np.zeros(100, np.float32), np.zeros(100, np.float32),
                  _cfg(1024, 256))
