"""Channel-sharded feature extraction / IIR: N-device == 1-device.

The feature stack and the scan IIR are embarrassingly parallel over
channels, so placing the channel axis on the mesh must change nothing —
asserted bit-identical, the same gate as the sharded round-trip
(test_distributed.py pattern, SURVEY.md §4 multi-node strategy).
"""

import numpy as np
import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from crlot_tpu.core.types import StftConfig
from crlot_tpu.distributed.mesh import make_mesh
from crlot_tpu.features import mel_spectrogram, mfcc, spectral_centroid
from crlot_tpu.iir import butter_sos, sosfilt

SR = 48000
CFG = StftConfig(frame_size=512, hop_size=128, center=True)


def _sig(c, t, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(-0.9, 0.9, (c, t)).astype(np.float32)


def _shard_channels(x):
    mesh = make_mesh(channel=8, time=1)
    return jax.device_put(
        x, NamedSharding(mesh, P("channel", None))
    )


def test_sharded_mel_bit_identical():
    x = _sig(8, SR // 2)
    want = np.asarray(mel_spectrogram(x, CFG, float(SR), n_mels=32))
    got = np.asarray(
        mel_spectrogram(_shard_channels(x), CFG, float(SR), n_mels=32)
    )
    np.testing.assert_array_equal(got, want)


def test_sharded_mfcc_bit_identical():
    x = _sig(8, SR // 2, seed=1)
    want = np.asarray(mfcc(x, CFG, float(SR), n_mfcc=13, n_mels=32))
    got = np.asarray(
        mfcc(_shard_channels(x), CFG, float(SR), n_mfcc=13, n_mels=32)
    )
    np.testing.assert_array_equal(got, want)


def test_sharded_centroid_bit_identical():
    x = _sig(8, SR // 2, seed=2)
    want = np.asarray(spectral_centroid(x, CFG, float(SR)))
    got = np.asarray(spectral_centroid(_shard_channels(x), CFG, float(SR)))
    np.testing.assert_array_equal(got, want)


def test_sharded_sosfilt_bit_identical():
    sos = butter_sos(4, 0.2)
    x = _sig(8, SR // 2, seed=3)
    want = np.asarray(sosfilt(sos, x))
    got = np.asarray(sosfilt(sos, _shard_channels(x)))
    np.testing.assert_array_equal(got, want)


def test_sharded_hpss_bit_identical():
    from crlot_tpu.hpss import hpss

    x = _sig(8, SR // 4, seed=4)
    wh, wp = hpss(x, CFG, kernel_harm=9, kernel_perc=9)
    gh, gp = hpss(_shard_channels(x), CFG, kernel_harm=9, kernel_perc=9)
    np.testing.assert_array_equal(np.asarray(gh), np.asarray(wh))
    np.testing.assert_array_equal(np.asarray(gp), np.asarray(wp))


def test_sharded_pseudo_cqt_bit_identical():
    from crlot_tpu.features import pseudo_cqt

    x = _sig(8, SR // 4, seed=5)
    want = np.asarray(pseudo_cqt(x, CFG, float(SR), n_bins=36, fmin=110.0))
    got = np.asarray(
        pseudo_cqt(_shard_channels(x), CFG, float(SR), n_bins=36, fmin=110.0)
    )
    np.testing.assert_array_equal(got, want)


def test_sharded_pcen_bit_identical():
    from crlot_tpu.features import pcen

    x = _sig(8, SR // 4, seed=6)
    mel = mel_spectrogram(x, CFG, float(SR), n_mels=32)
    want = np.asarray(pcen(mel, float(SR) / CFG.hop_size))
    mesh = make_mesh(channel=8, time=1)
    mel_sharded = jax.device_put(
        np.asarray(mel), NamedSharding(mesh, P("channel", None, None))
    )
    got = np.asarray(pcen(mel_sharded, float(SR) / CFG.hop_size))
    # Not bit-exact: the per-device shapes let XLA fuse the pow/scan chain
    # differently (observed max 6e-6 relative). Gate at ULP-scale anyway.
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)
