"""Framing tests (reference: tests/frame_queue_test.cc, tests/framer_test.cc).

Patterns: frame-count law exactness; reflect101 content checks; extreme cases
(len < N, hop > N gaps, frame_size 1); AoS contiguity analog (row i ==
signal[i*hop : i*hop+N]); streaming zero-pad vs drop boundary behavior.
"""

import numpy as np
import pytest

from crlot_tpu.core.padding import pad_signal, reflect101_index
from crlot_tpu.core.types import BoundaryMode, FrameSpec, PadMode  # noqa: F401
from crlot_tpu.frame.framing import frame_signal, frame_windowed, num_frames
from crlot_tpu.frame.streaming import Framer


# --- frame-count law (reference: frame_queue_test.cc:210-224) ---


@pytest.mark.parametrize(
    "length,frame,hop,center,expected",
    [
        (16384, 1024, 256, False, 61),  # (16384-768)//256 = 61
        (16384, 1024, 512, False, 31),
        (1024, 1024, 256, False, 1),
        (1023, 1024, 256, False, 0),
        (1000, 100, 100, False, 10),  # no overlap
        (1000, 100, 25, False, 37),  # (1000-75)//25
        (10, 2, 4, False, 2),  # frame < hop: n*hop <= len -> 2
        (1, 1, 1, False, 1),
    ],
)
def test_num_frames_law(length, frame, hop, center, expected):
    spec = FrameSpec(frame, hop, center=center)
    assert spec.num_frames(length) == expected
    if expected > 0:
        frames = frame_signal(np.arange(length, dtype=np.float32), spec)
        assert frames.shape == (expected, frame)


def test_num_frames_centered():
    # center adds frame//2 each side (reference: FrameQueue.cc:68-97)
    spec = FrameSpec(1024, 256, center=True)
    assert spec.num_frames(16384) == (16384 + 1024 - 768) // 256


# --- content checks ---


def test_frame_content_matches_slices():
    x = np.arange(100, dtype=np.float32)
    spec = FrameSpec(16, 4)
    frames = np.asarray(frame_signal(x, spec))
    for i in range(frames.shape[0]):
        np.testing.assert_array_equal(frames[i], x[i * 4 : i * 4 + 16])


def test_frame_batched_channels():
    x = np.stack([np.arange(64.0), np.arange(64.0) * -1]).astype(np.float32)
    spec = FrameSpec(16, 8)
    frames = np.asarray(frame_signal(x, spec))
    assert frames.shape == (2, 7, 16)
    np.testing.assert_array_equal(frames[1, 2], x[1, 16:32])


def test_reflect101_pattern():
    # [1,2,3,4] -> ...3,2,[1,2,3,4],3,2,... (reference: Indexing.h:18-33)
    x = np.array([1.0, 2.0, 3.0, 4.0], dtype=np.float32)
    padded = np.asarray(pad_signal(x, 3, 3, PadMode.REFLECT))
    np.testing.assert_array_equal(
        padded, [4, 3, 2, 1, 2, 3, 4, 3, 2, 1]
    )


def test_reflect101_large_pad():
    # Pad > len must still work (modular fold), unlike jnp.pad reflect
    x = np.array([1.0, 2.0, 3.0], dtype=np.float32)
    padded = np.asarray(pad_signal(x, 7, 0, PadMode.REFLECT))
    idx = reflect101_index(np.arange(-7, 3), 3)
    np.testing.assert_array_equal(padded, x[np.asarray(idx)])
    assert padded[-3] == 1.0  # original start preserved


def test_edge_and_constant_pad():
    x = np.array([5.0, 6.0, 7.0], dtype=np.float32)
    np.testing.assert_array_equal(
        np.asarray(pad_signal(x, 2, 2, PadMode.EDGE)), [5, 5, 5, 6, 7, 7, 7]
    )
    np.testing.assert_array_equal(
        np.asarray(pad_signal(x, 1, 2, PadMode.CONSTANT, value=9.0)),
        [9, 5, 6, 7, 9, 9],
    )


def test_centered_framing_reflect():
    x = np.arange(1, 9, dtype=np.float32)  # [1..8]
    spec = FrameSpec(4, 2, center=True, pad_mode=PadMode.REFLECT)
    frames = np.asarray(frame_signal(x, spec))
    # padded: [3,2,|1..8|,7,6]; frame 0 = [3,2,1,2]
    np.testing.assert_array_equal(frames[0], [3, 2, 1, 2])


def test_extreme_cases():
    with pytest.raises(ValueError):
        frame_signal(np.zeros(0, dtype=np.float32), FrameSpec(4, 2))
    with pytest.raises(ValueError):
        frame_signal(np.zeros(3, dtype=np.float32), FrameSpec(4, 2))
    # frame_size=1
    frames = np.asarray(frame_signal(np.arange(5.0), FrameSpec(1, 1)))
    assert frames.shape == (5, 1)
    # hop > frame: gaps
    frames = np.asarray(frame_signal(np.arange(10.0), FrameSpec(2, 4)))
    np.testing.assert_array_equal(frames, [[0, 1], [4, 5]])


def test_frame_windowed():
    x = np.ones(32, dtype=np.float32)
    w = np.linspace(0, 1, 8, dtype=np.float32)
    spec = FrameSpec(8, 4)
    fw = np.asarray(frame_windowed(x, spec, w))
    np.testing.assert_allclose(fw[3], w, rtol=1e-7)
    with pytest.raises(ValueError):
        frame_windowed(x, spec, np.ones(7, dtype=np.float32))


def test_invalid_spec():
    with pytest.raises(ValueError):
        FrameSpec(0, 1)
    with pytest.raises(ValueError):
        FrameSpec(4, 0)


# --- streaming framer (reference: framer_test.cc) ---


def test_framer_push_pop_matches_batch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(1000).astype(np.float32)
    fr = Framer(64, 16, channels=1, boundary=BoundaryMode.DROP)
    popped = []
    for chunk in np.array_split(x, 13):
        fr.push(chunk)
        while (f := fr.pop()) is not None:
            popped.append(f[0])
    batch = np.asarray(frame_signal(x, FrameSpec(64, 16)))
    got = np.stack(popped)
    assert got.shape == batch.shape
    np.testing.assert_array_equal(got, batch)


def test_framer_available_law():
    fr = Framer(1024, 256)
    fr.push(np.zeros(1024, dtype=np.float32))
    assert fr.available() == 1
    fr.push(np.zeros(255, dtype=np.float32))
    assert fr.available() == 1
    fr.push(np.zeros(1, dtype=np.float32))
    assert fr.available() == 2  # (1280-1024)//256+1


def test_framer_zero_pad_flush():
    fr = Framer(8, 4, boundary=BoundaryMode.ZERO_PAD)
    fr.push(np.ones(10, dtype=np.float32))
    assert fr.available() == 1
    a = fr.pop()
    np.testing.assert_array_equal(a[0], np.ones(8))
    assert fr.pop() is None  # only 6 left, no full frame
    fr.flush()
    b = fr.pop()
    np.testing.assert_array_equal(b[0], [1, 1, 1, 1, 1, 1, 0, 0])
    assert fr.pop() is None


def test_framer_drop_refuses_partial():
    fr = Framer(8, 4, boundary=BoundaryMode.DROP)
    fr.push(np.ones(10, dtype=np.float32))
    fr.pop()
    fr.flush()
    assert fr.pop() is None


def test_framer_stereo_deinterleave():
    # push interleaved LRLR..., pop [channels, frame]
    fr = Framer(4, 2, channels=2)
    inter = np.array([1, -1, 2, -2, 3, -3, 4, -4], dtype=np.float32)
    fr.push(inter)
    f = fr.pop()
    np.testing.assert_array_equal(f, [[1, 2, 3, 4], [-1, -2, -3, -4]])


def test_framer_pop_batch():
    fr = Framer(16, 8)
    fr.push(np.arange(100, dtype=np.float32))
    batch = fr.pop_batch()
    assert batch.shape == (11, 1, 16)
    np.testing.assert_array_equal(batch[10, 0], np.arange(80, 96))


def test_framer_compaction_long_stream():
    # Sustained push/pop must not grow the buffer unboundedly
    fr = Framer(64, 32)
    for _ in range(200):
        fr.push(np.zeros(64, dtype=np.float32))
        while fr.pop() is not None:
            pass
    assert fr._buf.size <= 64 * 4 * 4


def test_framer_invalid():
    with pytest.raises(ValueError):
        Framer(0, 1)
    fr = Framer(4, 2, channels=2)
    with pytest.raises(ValueError):
        fr.push(np.zeros(3, dtype=np.float32))  # not multiple of channels


def test_frame_queue_accessors():
    from crlot_tpu.frame.framing import FrameQueue

    x = np.arange(64, dtype=np.float32)
    q = FrameQueue(x, FrameSpec(16, 8))
    assert len(q) == q.num_frames == 7
    np.testing.assert_array_equal(q.get_frame(2), x[16:32])
    c = q.copy_frame(0)
    c[0] = 99.0
    assert q.get_frame(0)[0] == 0.0  # copy is independent
    allf = q.get_all_frames()
    assert allf.shape == (7, 16)
    # AoS contiguity: frame i+1 immediately follows frame i in memory
    assert allf.flags["C_CONTIGUOUS"]
    with pytest.raises(IndexError):
        q.get_frame(7)
    with pytest.raises(ValueError):
        FrameQueue(np.zeros((2, 64), dtype=np.float32), FrameSpec(16, 8))


def test_aos_soa_round_trip():
    from crlot_tpu.frame.framing import aos_to_soa, soa_to_aos

    inter = np.array([1, -1, 2, -2, 3, -3], dtype=np.float32)
    soa = aos_to_soa(inter, 2)
    np.testing.assert_array_equal(soa, [[1, 2, 3], [-1, -2, -3]])
    np.testing.assert_array_equal(soa_to_aos(soa), inter)
    with pytest.raises(ValueError):
        aos_to_soa(np.zeros(5, dtype=np.float32), 2)
