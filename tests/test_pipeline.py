"""End-to-end pipeline tests.

The reference never asserted its >= 60 dB round-trip SNR as a test (the gate
lived only in the benchmark reporter and was FAILING, docs/PHASE0_AUDIT.md
BLK-01); per SURVEY.md §4 "make round-trip SNR a hard test" — done here, on
both hop ratios and on the real oboe asset.
"""

import numpy as np
import pytest

from crlot_tpu.core.types import PadMode, StftConfig, WindowType
from crlot_tpu.metrics import snr_db, xcorr_delay_samples
from crlot_tpu.pipeline import istft, round_trip, stft


def _sig(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(-0.9, 0.9, n).astype(np.float32)


@pytest.mark.parametrize("hop_ratio", [2, 4])
@pytest.mark.parametrize("window", [WindowType.HANN, WindowType.HAMMING])
def test_round_trip_snr_gate(hop_ratio, window):
    n = 1024
    cfg = StftConfig(
        frame_size=n, hop_size=n // hop_ratio, window=window, center=True
    )
    x = _sig(48000)
    y = np.asarray(round_trip(x, cfg))
    assert y.shape == x.shape
    snr = snr_db(x, y)
    assert snr > 60.0, f"round-trip SNR {snr:.1f} dB below 60 dB gate"
    assert snr > 100.0  # we should be far above the reference's gate


def test_round_trip_oboe(oboe):
    x, sr = oboe
    cfg = StftConfig(frame_size=1024, hop_size=256, center=True)
    y = np.asarray(round_trip(x, cfg))
    snr = snr_db(x, y)
    assert snr > 60.0, f"oboe round-trip SNR {snr:.1f} dB"
    assert xcorr_delay_samples(x, y) == 0  # centered stft has no latency


def test_round_trip_uncentered_interior():
    # Without centering, only the fully-covered interior reconstructs.
    n, hop = 512, 128
    cfg = StftConfig(frame_size=n, hop_size=hop, center=False)
    x = _sig(8192)
    y = np.asarray(round_trip(x, cfg))
    covered = (cfg.frame_spec.num_frames(8192) - 1) * hop + n
    assert snr_db(x[n:covered - n], y[n:covered - n]) > 80.0


def test_stft_shape_and_content():
    n, hop = 256, 64
    cfg = StftConfig(frame_size=n, hop_size=hop, center=False)
    x = _sig(2048)
    spec = np.asarray(stft(x, cfg))
    f = cfg.frame_spec.num_frames(2048)
    assert spec.shape == (f, n // 2 + 1)
    assert spec.dtype == np.complex64
    # Tone concentrates in its bin
    k = 16
    tone = np.cos(2 * np.pi * k * np.arange(2048) / n).astype(np.float32)
    ts = np.abs(np.asarray(stft(tone, cfg)))
    assert np.all(np.argmax(ts, axis=-1) == k)


def test_spectral_processing_hook():
    cfg = StftConfig(frame_size=512, hop_size=128, center=True)
    x = _sig(16384)
    y = np.asarray(round_trip(x, cfg, spectral_fn=lambda s: s * 0.5))
    assert snr_db(x * 0.5, y) > 60.0


def test_multichannel_round_trip():
    cfg = StftConfig(frame_size=512, hop_size=128, center=True)
    x = np.stack([_sig(16384, 1), _sig(16384, 2)])
    y = np.asarray(round_trip(x, cfg))
    assert y.shape == x.shape
    assert snr_db(x, y) > 60.0


def test_istft_explicit_length():
    cfg = StftConfig(frame_size=256, hop_size=64, center=True)
    x = _sig(5000)
    spec = stft(x, cfg)
    y = np.asarray(istft(spec, cfg, length=5000))
    assert y.shape == (5000,)
    assert snr_db(x, y) > 60.0


def test_synthesis_window_mode():
    # analysis+synthesis windows with sum-w^2 norm also reconstructs
    cfg = StftConfig(
        frame_size=1024, hop_size=256, center=True, synthesis_window=True
    )
    x = _sig(48000)
    y = np.asarray(round_trip(x, cfg))
    assert snr_db(x, y) > 60.0


def test_large_frame_sweep():
    # BASELINE.json config: FFT sizes 256..16384, hop ratios 1/2 and 1/4
    x = _sig(65536)
    for n in [256, 2048, 16384]:
        for ratio in [2, 4]:
            cfg = StftConfig(frame_size=n, hop_size=n // ratio, center=True)
            y = np.asarray(round_trip(x, cfg))
            assert snr_db(x, y) > 60.0, f"N={n} ratio={ratio}"


def test_stft_config_validation():
    with pytest.raises(ValueError):
        StftConfig(frame_size=1023, hop_size=256)  # odd
    with pytest.raises(ValueError):
        StftConfig(frame_size=1024, hop_size=2048)
    with pytest.raises(ValueError):
        StftConfig(frame_size=1024, hop_size=0)
