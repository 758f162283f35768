"""Chunked sharded streaming: bit-identical to one-shot, bounded memory.

BASELINE configs 4 and 5: 64-channel batch sharded by channel with FIR
filtering, and long streams with time-blocks sharded + halo exchange.
"""

import numpy as np
import pytest

from crlot_tpu import spectral as S
from crlot_tpu.core.types import StftConfig
from crlot_tpu.distributed.mesh import make_mesh
from crlot_tpu.distributed.sharded_pipeline import sharded_round_trip
from crlot_tpu.distributed.stream import sharded_stream, sharded_stream_iter
from crlot_tpu.metrics import snr_db


def _sig(c, t, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(-0.9, 0.9, (c, t)).astype(np.float32)


CFG = StftConfig(frame_size=256, hop_size=64, center=False)


@pytest.mark.slow
def test_chunked_stream_matches_oneshot_bitexact():
    mesh = make_mesh(channel=2, time=4)
    x = _sig(2, 4 * 64 * 96)  # long enough for several chunks
    want = np.asarray(sharded_round_trip(x, CFG, mesh))
    got = sharded_stream(x, CFG, mesh, chunk_samples=4 * 64 * 16)
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_chunked_stream_odd_total_length():
    mesh = make_mesh(channel=1, time=4)
    # total not a multiple of the chunk: trailing partial chunk path
    x = _sig(2, 4 * 64 * 37 + 4 * 64 * 7, seed=1)
    want = np.asarray(sharded_round_trip(x, CFG, mesh))
    got = sharded_stream(x, CFG, mesh, chunk_samples=4 * 64 * 16)
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_stream_iter_matches_array_driver():
    mesh = make_mesh(channel=1, time=4)
    s = 4 * 64 * 16
    x = _sig(2, s * 5, seed=2)
    want = sharded_stream(x, CFG, mesh, chunk_samples=s)
    chunks = [x[:, i * s : (i + 1) * s] for i in range(5)]
    got = np.concatenate(
        list(sharded_stream_iter(iter(chunks), CFG, mesh)), axis=1
    )
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)


def test_64_channel_fir_sharded():
    # BASELINE config 4: 64-channel synthetic audio, channels sharded,
    # per-channel STFT/OLA + FIR filtering.
    from scipy import signal as sps

    mesh = make_mesh(channel=8, time=1)
    cfg = StftConfig(frame_size=1024, hop_size=256, center=False)
    x = _sig(64, 16384, seed=3)
    taps = sps.firwin(63, 0.3)
    h = S.fir_frequency_response(taps, 1024)
    y = np.asarray(
        sharded_round_trip(x, cfg, mesh, spectral_fn=S.per_bin_filter(h))
    )
    assert y.shape == x.shape
    want = sps.lfilter(taps, [1.0], x.astype(np.float64), axis=-1)
    covered = (cfg.frame_spec.num_frames(16384) - 1) * 256 + 1024
    lo, hi = 2048, covered - 2048
    assert snr_db(want[:, lo:hi], y[:, lo:hi]) > 40


def test_stream_validation():
    mesh = make_mesh(channel=2, time=4)
    with pytest.raises(ValueError):
        sharded_stream(_sig(3, 4 * 64 * 32), CFG, mesh)  # channels % 2 != 0
    with pytest.raises(ValueError):
        next(
            sharded_stream_iter(
                iter([_sig(2, 100)]), CFG, mesh  # misaligned chunk
            )
        )
