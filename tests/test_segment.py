"""Silence trim/split + tonnetz: constructed-signal gates.

Oracle strategy: signals with silence gaps placed by construction; music
theory for tonnetz (a fifth sits closer on the tonal centroid manifold
than a tritone).
"""

import numpy as np
import pytest

from crlot_tpu.core.types import StftConfig
from crlot_tpu.features import _tonnetz_basis, tonnetz
from crlot_tpu.segment import activity_mask, split_silence, trim_silence

SR = 16000
CFG = StftConfig(frame_size=512, hop_size=128, center=True)


def _tone(freq, n, sr=SR, amp=0.5):
    t = np.arange(n) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def _with_silence():
    """0.2 s silence | 0.3 s tone | 0.25 s silence | 0.3 s tone | 0.2 s silence."""
    gap = lambda s: np.zeros(int(s * SR), np.float32)
    a, b = _tone(440.0, int(0.3 * SR)), _tone(880.0, int(0.3 * SR))
    x = np.concatenate([gap(0.2), a, gap(0.25), b, gap(0.2)])
    spans = [
        (int(0.2 * SR), int(0.5 * SR)),
        (int(0.75 * SR), int(1.05 * SR)),
    ]
    return x, spans


def test_trim_covers_active_region():
    x, spans = _with_silence()
    trimmed, (start, end) = trim_silence(x, CFG, top_db=40.0)
    assert start <= spans[0][0] and end >= spans[1][1]
    # But it must actually trim most of the outer silence.
    assert start > spans[0][0] - CFG.frame_size
    assert end < spans[1][1] + CFG.frame_size
    np.testing.assert_array_equal(trimmed, x[start:end])


def test_trim_all_silence():
    trimmed, (s, e) = trim_silence(np.zeros(SR, np.float32), CFG)
    assert trimmed.size == 0 and (s, e) == (0, 0)


def test_split_finds_both_regions():
    x, spans = _with_silence()
    iv = split_silence(x, CFG, top_db=40.0)
    assert len(iv) == 2
    for (s, e), (ts, te) in zip(iv, spans):
        assert s <= ts and e >= te  # covers the tone
        assert s > ts - CFG.frame_size and e < te + CFG.frame_size
    assert iv[0][1] <= iv[1][0]  # non-overlapping ascending


def test_split_all_silence_empty():
    assert split_silence(np.zeros(SR, np.float32), CFG) == []


def test_activity_mask_batched():
    x, _ = _with_silence()
    m = np.asarray(activity_mask(np.stack([x, x]), CFG, top_db=40.0))
    assert m.shape[0] == 2
    np.testing.assert_array_equal(m[0], m[1])


def test_trim_rejects_2d():
    with pytest.raises(ValueError):
        trim_silence(np.zeros((2, SR), np.float32), CFG)


# ---------------------------------------------------------------------------
# tonnetz
# ---------------------------------------------------------------------------

def test_tonnetz_basis_geometry():
    b = _tonnetz_basis(12)
    assert b.shape == (6, 12)
    # Circle radii: fifths/minor-thirds rows have unit norm per class,
    # major-thirds rows 0.5.
    np.testing.assert_allclose(
        np.hypot(b[0], b[1]), 1.0, atol=1e-6)
    np.testing.assert_allclose(
        np.hypot(b[4], b[5]), 0.5, atol=1e-6)


def test_fifth_closer_than_tritone():
    sr, cfg = 48000, StftConfig(frame_size=4096, hop_size=1024, center=True)
    n = sr // 2
    c4, g4, fs4 = 261.63, 392.00, 369.99
    tc = np.asarray(tonnetz(_tone(c4, n, sr), cfg, sr)).mean(axis=0)
    tg = np.asarray(tonnetz(_tone(g4, n, sr), cfg, sr)).mean(axis=0)
    tf = np.asarray(tonnetz(_tone(fs4, n, sr), cfg, sr)).mean(axis=0)
    d = lambda a, b: float(np.linalg.norm(a - b))
    assert d(tc, tg) < d(tc, tf)  # perfect fifth < tritone


def test_tonnetz_shape_and_bounds():
    x = _tone(440.0, SR // 2)
    t = np.asarray(tonnetz(x, CFG, SR))
    assert t.shape[-1] == 6
    # L1-normalized chroma through radius-<=1 circles stays in [-1, 1].
    assert np.all(np.abs(t) <= 1.0 + 1e-6)


# ---------------------------------------------------------------------------
# frame/time conversion
# ---------------------------------------------------------------------------

def test_frames_to_time_roundtrip():
    from crlot_tpu.segment import frames_to_time, time_to_frames

    f = np.arange(0, 200, 7)
    t = frames_to_time(f, CFG, SR)
    np.testing.assert_array_equal(time_to_frames(t, CFG, SR), f)


def test_frames_to_time_center_convention():
    from crlot_tpu.segment import frames_to_time

    c = StftConfig(frame_size=512, hop_size=128, center=True)
    u = StftConfig(frame_size=512, hop_size=128, center=False)
    # centered: frame 0 at t=0; uncentered: frame 0 centered mid-frame.
    assert frames_to_time(0, c, SR) == 0.0
    assert abs(frames_to_time(0, u, SR) - 256 / SR) < 1e-12


def test_time_to_frames_clips_at_zero():
    from crlot_tpu.segment import time_to_frames

    u = StftConfig(frame_size=512, hop_size=128, center=False)
    assert time_to_frames(0.0, u, SR) == 0
