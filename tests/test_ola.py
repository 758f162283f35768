"""OLA tests (reference: tests/ola_accumulator_test.cc, norm_builder_test.cc).

Patterns: overlap-add vs brute-force oracle; norm builder vs O(K*N) oracle;
impulse/COLA SNR gates; H==N no-overlap exact reconstruction; gain linearity.
"""

import numpy as np
import pytest

from crlot_tpu.core.types import OLAConfig
from crlot_tpu.metrics import snr_db
from crlot_tpu.ola.norm import brute_force_norm, build_norm_linear, edge_norm
from crlot_tpu.ola.reference import normalize, overlap_add, overlap_add_normalized
from crlot_tpu.window.windows import get_window
from crlot_tpu.core.types import WindowType


def _oracle_ola(frames, hop, out_len):
    frames = np.asarray(frames, dtype=np.float64)
    f, n = frames.shape[-2:]
    out = np.zeros(frames.shape[:-2] + (out_len,))
    for k in range(f):
        start = k * hop
        stop = min(start + n, out_len)
        if stop > start:
            out[..., start:stop] += frames[..., k, : stop - start]
    return out


@pytest.mark.parametrize("n,hop", [(8, 2), (8, 4), (8, 8), (16, 6), (12, 5), (1024, 256)])
def test_overlap_add_matches_oracle(n, hop):
    rng = np.random.default_rng(0)
    f = 9
    frames = rng.standard_normal((f, n)).astype(np.float32)
    out_len = (f - 1) * hop + n
    got = np.asarray(overlap_add(frames, hop))
    assert got.shape == (out_len,)
    np.testing.assert_allclose(got, _oracle_ola(frames, hop, out_len), atol=1e-5)


def test_overlap_add_batched():
    rng = np.random.default_rng(1)
    frames = rng.standard_normal((3, 5, 16)).astype(np.float32)
    got = np.asarray(overlap_add(frames, 4))
    for c in range(3):
        np.testing.assert_allclose(
            got[c], _oracle_ola(frames[c], 4, got.shape[-1]), atol=1e-5
        )


def test_overlap_add_out_len_clip_and_pad():
    frames = np.ones((4, 8), dtype=np.float32)
    short = np.asarray(overlap_add(frames, 4, out_len=10))
    assert short.shape == (10,)
    long = np.asarray(overlap_add(frames, 4, out_len=30))
    assert long.shape == (30,)
    assert np.all(long[20:] == 0)


def test_overlap_add_invalid():
    with pytest.raises(ValueError):
        overlap_add(np.ones(8, dtype=np.float32), 2)  # 1-D
    with pytest.raises(ValueError):
        overlap_add(np.ones((2, 8), dtype=np.float32), 0)


# --- norm builder (reference: tests/norm_builder_test.cc:13-108) ---


@pytest.mark.parametrize(
    "n,hop,margin",
    [(8, 2, 3), (8, 4, 2), (16, 4, 20), (1024, 256, 20), (1024, 512, 20), (100, 25, 5)],
)
def test_build_norm_linear_vs_oracle(n, hop, margin):
    w = get_window(WindowType.HANN, n, periodic=True)
    ring_len = (-(-n // hop) + margin) * hop
    got = build_norm_linear(w, ring_len, n, hop)
    oracle = brute_force_norm(w, ring_len, n, hop)
    np.testing.assert_allclose(got, oracle, atol=1e-5)


def test_build_norm_linear_validation():
    w = get_window(WindowType.HANN, 8)
    with pytest.raises(ValueError):
        build_norm_linear(w, 10, 8, 4)  # ring not hop-aligned
    with pytest.raises(ValueError):
        build_norm_linear(w, 16, 7, 4)  # window/frame mismatch


def test_edge_norm_interior_equals_steady_state():
    n, hop, f = 1024, 256, 20
    w = get_window(WindowType.HANN, n, periodic=True).astype(np.float64)
    out_len = (f - 1) * hop + n
    en = edge_norm(w, hop, f, out_len)
    steady = np.array([w[p::hop].sum() for p in range(hop)])
    # Interior (fully covered) positions match the periodic steady-state sum
    interior = en[n : out_len - n]
    tiled = np.tile(steady, out_len // hop + 2)[n : out_len - n]
    np.testing.assert_allclose(interior, tiled, atol=1e-5)


# --- COLA reconstruction (reference: ola_accumulator_test.cc:69-116, 729-735) ---


def test_h_equals_n_rect_exact():
    # No overlap + rect window reconstructs exactly (ref gate 1e-6)
    n = 64
    rng = np.random.default_rng(2)
    x = rng.uniform(-1, 1, 8 * n).astype(np.float32)
    frames = x.reshape(8, n)
    norm = edge_norm(np.ones(n), n, 8, 8 * n)
    y = np.asarray(overlap_add_normalized(frames, n, norm))
    np.testing.assert_allclose(y, x, atol=1e-6)


@pytest.mark.parametrize("n,hop", [(1024, 256), (1024, 512), (256, 64)])
def test_windowed_cola_reconstruction_snr(n, hop):
    # window once + divide by sum-w norm reconstructs > 100 dB
    rng = np.random.default_rng(3)
    f = 32
    sig_len = (f - 1) * hop + n
    x = rng.uniform(-1, 1, sig_len).astype(np.float32)
    w = get_window(WindowType.HANN, n, periodic=True)
    idx = np.arange(f)[:, None] * hop + np.arange(n)[None, :]
    frames = x[idx] * w[None, :]
    norm = edge_norm(w, hop, f, sig_len)
    y = np.asarray(overlap_add_normalized(frames, hop, norm))
    # Sample 0 is unrecoverable without centering: periodic Hann has w[0]=0,
    # so its norm is 0 (this is why the pipeline defaults to center=True).
    assert snr_db(x[1:], y[1:]) > 100.0


def test_impulse_through_ola():
    # Impulse train reconstruction (ref: impulse SNR gate)
    n, hop, f = 256, 64, 16
    sig_len = (f - 1) * hop + n
    x = np.zeros(sig_len, dtype=np.float32)
    x[50::100] = 1.0  # avoid sample 0 (w[0]=0 => zero norm, see above)
    w = get_window(WindowType.HANN, n, periodic=True)
    idx = np.arange(f)[:, None] * hop + np.arange(n)[None, :]
    frames = x[idx] * w[None, :]
    norm = edge_norm(w, hop, f, sig_len)
    y = np.asarray(overlap_add_normalized(frames, hop, norm))
    assert snr_db(x, y) > 100.0


def test_gain_linearity():
    # out = in * w * gain / norm scales linearly (ref: :1053-1075)
    n, hop = 64, 16
    frames = np.ones((4, n), dtype=np.float32)
    a = np.asarray(overlap_add(frames * 2.5, hop))
    b = np.asarray(overlap_add(frames, hop)) * 2.5
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_normalize_eps_guard():
    acc = np.ones(8, dtype=np.float32)
    norm = np.zeros(8, dtype=np.float32)
    y = np.asarray(normalize(acc, norm, eps=1e-8))
    assert np.isfinite(y).all()
    np.testing.assert_allclose(y, 1e8, rtol=1e-4)


def test_ola_config_validation():
    with pytest.raises(ValueError):
        OLAConfig(sample_rate=48000, frame_size=1024, hop_size=0)
    with pytest.raises(ValueError):
        OLAConfig(sample_rate=48000, frame_size=1024, hop_size=2048)
    with pytest.raises(ValueError):
        OLAConfig(sample_rate=0, frame_size=1024, hop_size=256)
    cfg = OLAConfig(sample_rate=48000, frame_size=1024, hop_size=256)
    assert cfg.overlap_count == 4
    assert cfg.ring_len == (4 + 20) * 256  # OLAAccumulator.cc:249-258
