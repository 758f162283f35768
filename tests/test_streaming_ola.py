"""Streaming OLA accumulator tests (reference: tests/ola_accumulator_test.cc).

Patterns: AoS-vs-SoA path equivalence; streaming-vs-offline equivalence over
a stream much longer than the ring (ring reuse); hop-paced produce; partial
frames (start_off/size clamp); gain; flush/tail drain; peak meter; reset.
"""

import numpy as np
import pytest

from crlot_tpu.core.types import OLAConfig, WindowType
from crlot_tpu.metrics import snr_db
from crlot_tpu.ola.norm import edge_norm
from crlot_tpu.ola.reference import overlap_add
from crlot_tpu.ola.streaming import OLAAccumulator
from crlot_tpu.window.windows import get_window


def _cfg(**kw):
    base = dict(sample_rate=48000, frame_size=64, hop_size=16, channels=1)
    base.update(kw)
    return OLAConfig(**base)


def _run_stream(cfg, frames, window=None, drain_every=1, gain=1.0):
    """Push frames at k*hop, draining hop samples per frame; returns output."""
    ola = OLAAccumulator(cfg)
    if window is not None:
        ola.set_window(window)
    chunks = []
    for k in range(frames.shape[0]):
        ola.add_frame_soa(frames[k], k * cfg.hop_size, gain=gain)
        if (k + 1) % drain_every == 0:
            chunks.append(ola.produce(cfg.hop_size * drain_every))
    ola.flush()
    while True:
        out = ola.produce(cfg.ring_len)
        if out.shape[1] == 0:
            break
        chunks.append(out)
    return np.concatenate(chunks, axis=1)


@pytest.mark.parametrize("n,hop", [(64, 16), (64, 32), (64, 64), (48, 12)])
def test_streaming_matches_offline_unwindowed(n, hop):
    rng = np.random.default_rng(0)
    f = 40
    cfg = _cfg(frame_size=n, hop_size=hop, apply_window_inside=False)
    frames = rng.standard_normal((f, 1, n)).astype(np.float32)
    got = _run_stream(cfg, frames)
    want = np.asarray(overlap_add(frames[:, 0, :], hop))
    assert got.shape[1] == want.shape[0]
    np.testing.assert_allclose(got[0], want, atol=1e-5)


def test_streaming_ring_reuse_long_stream():
    # Stream >> ring_len: the ring must wrap and be reused indefinitely.
    cfg = _cfg(frame_size=64, hop_size=16, ring_margin_hops=4)
    f = 200  # 200*16 = 3200 samples through a (4+4)*16=128-sample ring
    rng = np.random.default_rng(1)
    frames = rng.standard_normal((f, 1, 64)).astype(np.float32)
    w = get_window(WindowType.HANN, 64, periodic=True)
    got = _run_stream(cfg, frames, window=w)
    # Offline oracle: windowed frames, steady-state norm
    wf = frames[:, 0, :] * w
    acc = np.asarray(overlap_add(wf, 16))
    steady = np.array([w.astype(np.float64)[p::16].sum() for p in range(16)])
    norm = np.tile(steady, acc.shape[0] // 16 + 1)[: acc.shape[0]]
    want = acc / np.maximum(norm, 1e-8)
    # Compare interior (streaming norm assumes full coverage; edges differ)
    n = 64
    assert snr_db(want[n:-n], got[0][n : want.shape[0] - n]) > 100


def test_aos_matches_soa():
    cfg = _cfg(frame_size=32, hop_size=8, channels=2)
    rng = np.random.default_rng(2)
    frame = rng.standard_normal((2, 32)).astype(np.float32)
    a = OLAAccumulator(cfg)
    b = OLAAccumulator(cfg)
    a.add_frame_soa(frame, 0)
    b.push_frame_aos(frame.T.reshape(-1), 0)  # interleave then push
    a.flush()
    b.flush()
    np.testing.assert_array_equal(a.produce(64), b.produce(64))


def test_partial_frame_clamp():
    # start_off/size clamped like the reference (OLAAccumulator.cc:81-83)
    cfg = _cfg(frame_size=16, hop_size=4, apply_window_inside=False)
    ola = OLAAccumulator(cfg)
    frame = np.arange(16, dtype=np.float32)[None, :]
    ola.add_frame_soa(frame, 0, start_off=4, size=100)  # size clamps to 12
    ola.flush()
    out = ola.produce(32)[0]
    np.testing.assert_array_equal(out[:12], np.arange(4, 16))
    assert np.all(out[12:] == 0)


def test_gain():
    cfg = _cfg(frame_size=16, hop_size=16, apply_window_inside=False)
    ola = OLAAccumulator(cfg)
    ola.add_frame_soa(np.ones((1, 16), dtype=np.float32), 0, gain=2.5)
    ola.flush()
    np.testing.assert_allclose(ola.produce(16)[0], 2.5, rtol=1e-6)


def test_available_respects_overlap_tail():
    cfg = _cfg(frame_size=64, hop_size=16)
    ola = OLAAccumulator(cfg)
    ola.add_frame_soa(np.ones((1, 64), dtype=np.float32), 0)
    # 64 written, but last 48 still await overlapping frames
    assert ola.available() == 16
    ola.flush()
    assert ola.available() == 64


def test_produce_clamps_to_available():
    cfg = _cfg(frame_size=32, hop_size=8, apply_window_inside=False)
    ola = OLAAccumulator(cfg)
    ola.add_frame_soa(np.ones((1, 32), dtype=np.float32), 0)
    out = ola.produce(1000)
    assert out.shape == (1, 8)  # only one hop is safe pre-flush


def test_ring_overrun_raises():
    cfg = _cfg(frame_size=64, hop_size=16, ring_margin_hops=2)
    ola = OLAAccumulator(cfg)
    with pytest.raises(ValueError):
        ola.add_frame_soa(
            np.ones((1, 64), dtype=np.float32), cfg.ring_len  # a full lap ahead
        )


def test_peak_meter_and_reset():
    cfg = _cfg(frame_size=16, hop_size=16, apply_window_inside=False)
    ola = OLAAccumulator(cfg)
    frame = np.zeros((1, 16), dtype=np.float32)
    frame[0, 3] = -0.75
    ola.add_frame_soa(frame, 0)
    ola.flush()
    ola.produce(16)
    assert ola.meter_peak == pytest.approx(0.75)
    ola.reset()
    assert ola.meter_peak == 0.0
    assert ola.available() == 0
    assert ola.window is None


def test_window_inside_normalization_reconstructs():
    # apply_window_inside + COLA norm reconstructs the input (H|N, Hann)
    n, hop = 64, 16
    cfg = _cfg(frame_size=n, hop_size=hop, apply_window_inside=True)
    w = get_window(WindowType.HANN, n, periodic=True)
    rng = np.random.default_rng(3)
    f = 50
    sig = rng.uniform(-1, 1, (f - 1) * hop + n).astype(np.float32)
    idx = np.arange(f)[:, None] * hop + np.arange(n)[None, :]
    frames = sig[idx][:, None, :]  # [F, 1, N] unwindowed; OLA windows inside
    got = _run_stream(cfg, frames, window=w)[0]
    # Interior must match the input (steady-state coverage)
    assert snr_db(sig[n:-n], got[n : len(sig) - n]) > 100


def test_set_window_validation():
    cfg = _cfg(frame_size=32, hop_size=8)
    ola = OLAAccumulator(cfg)
    with pytest.raises(ValueError):
        ola.set_window(np.ones(31, dtype=np.float32))
    with pytest.raises(ValueError):
        ola.add_frame_soa(np.ones((2, 32), dtype=np.float32), 0)  # wrong channels


def test_cursor_renormalization_long_stream():
    # Force the overflow guard by shrinking the threshold via monkeypatching
    # is invasive; instead simulate directly: shift cursors as produce() would
    # and verify continued correctness across the renormalization boundary.
    cfg = _cfg(frame_size=64, hop_size=16, apply_window_inside=False)
    ola = OLAAccumulator(cfg)
    # Pretend a very long stream already ran: mimic the internal shift.
    big = (1 << 30) + cfg.ring_len * 3
    shift = (big // cfg.ring_len) * cfg.ring_len
    ola._state = ola._state._replace(
        read_pos=ola._state.read_pos + (big - shift),
        produced=ola._state.produced + (big - shift),
    )
    ola._cursor_shift = shift
    base = shift + (big - shift)  # caller-absolute continuation point
    rng = np.random.default_rng(7)
    frames = rng.standard_normal((20, 1, 64)).astype(np.float32)
    chunks = []
    for k in range(20):
        ola.add_frame_soa(frames[k], base + k * 16)
        avail = ola.available()
        if avail:
            chunks.append(ola.produce(avail))
    ola.flush()
    chunks.append(ola.produce(cfg.ring_len))
    got = np.concatenate(chunks, axis=1)
    want = np.asarray(overlap_add(frames[:, 0, :], 16))
    np.testing.assert_allclose(got[0], want, atol=1e-5)
