"""Checkpoint/resume: a resumed stream must produce identical output."""

import numpy as np

from crlot_tpu.checkpoint import load_stream_state, save_stream_state
from crlot_tpu.core.types import OLAConfig, WindowType
from crlot_tpu.ola.streaming import OLAAccumulator, ola_init
from crlot_tpu.window.windows import get_window


def _run(frames, cfg, w, resume_at=None, ckpt_path=None):
    ola = OLAAccumulator(cfg)
    ola.set_window(w)
    out = []
    for k in range(frames.shape[0]):
        if resume_at is not None and k == resume_at:
            # Simulate crash + resume: reload state from the checkpoint.
            state, cfg2, fi, extra = load_stream_state(ckpt_path)
            assert cfg2 == cfg
            assert fi == k
            assert extra["note"] == "mid-stream"
            ola._state = state
        ola.add_frame_soa(frames[k], k * cfg.hop_size)
        avail = ola.available()
        if avail:
            out.append(ola.produce(avail))
        if ckpt_path is not None and resume_at is None and k == 9:
            save_stream_state(
                ckpt_path, ola._state, cfg, k + 1, extra={"note": "mid-stream"}
            )
    ola.flush()
    out.append(ola.produce(cfg.ring_len))
    return np.concatenate(out, axis=1)


def test_resume_produces_identical_output(tmp_path):
    cfg = OLAConfig(sample_rate=48000, frame_size=64, hop_size=16, channels=1)
    w = get_window(WindowType.HANN, 64, periodic=True)
    rng = np.random.default_rng(0)
    frames = rng.standard_normal((30, 1, 64)).astype(np.float32)
    ckpt = str(tmp_path / "stream.ckpt")

    # Full run, checkpointing after frame 9.
    want = _run(frames, cfg, w, ckpt_path=ckpt)

    # "Crashed" run: replay frames 10.. on top of the restored state.
    ola = OLAAccumulator(cfg)
    ola.set_window(w)
    state, cfg2, frame_index, _ = load_stream_state(ckpt)
    ola._state = state
    out = []
    # Re-drain what the first run drained before frame 10: the checkpoint
    # stores read_pos, so produce() continues exactly where it left off.
    for k in range(frame_index, frames.shape[0]):
        ola.add_frame_soa(frames[k], k * cfg.hop_size)
        avail = ola.available()
        if avail:
            out.append(ola.produce(avail))
    ola.flush()
    out.append(ola.produce(cfg.ring_len))
    got = np.concatenate(out, axis=1)
    # Resumed output continues the stream: it must equal the tail of `want`.
    np.testing.assert_array_equal(got, want[:, want.shape[1] - got.shape[1]:])


def test_checkpoint_roundtrip_fields(tmp_path):
    cfg = OLAConfig(sample_rate=44100, frame_size=32, hop_size=8, channels=2)
    state = ola_init(cfg)
    p = str(tmp_path / "s.ckpt")
    save_stream_state(p, state, cfg, 0)
    s2, cfg2, fi, extra = load_stream_state(p)
    assert cfg2 == cfg and fi == 0 and extra == {}
    np.testing.assert_array_equal(np.asarray(state.ring), np.asarray(s2.ring))
    assert int(s2.read_pos) == 0 and not bool(s2.flushed)
