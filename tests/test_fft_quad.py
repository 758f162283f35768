"""Quarter-size (parity-split) DFT bases vs numpy oracle and tiled path.

The quad path is one more exact symmetry fold than the tiled half-bases
(half the MXU FLOPs); its contract is identical: f64-designed constants,
inverse includes 1/N (kissfft_adapter.cc:138-167 semantics), analysis
window folded in. Gates follow the reference FFT tiering
(tests/fft_test.cc:76-82: target 1e-6, hard 1e-5).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from crlot_tpu.core.types import WindowType
from crlot_tpu.fft.matmul_backend import (
    irfft_folded_quad_parts,
    quad_supported,
    rfft_folded_quad_parts,
    roundtrip_folded_quad,
    roundtrip_folded_tiled,
)


pytestmark = pytest.mark.slow  # opt-in quad variant: run with -m slow / full suite

SIZES = [4, 8, 12, 64, 100, 256, 512, 1024, 2048]


def _parity_split(spec):
    """numpy rfft -> the quad layout (re_e, re_o, re_nyq, im_e, im_o)."""
    h = spec.shape[-1] - 1
    q = h // 2
    re, im = spec.real, spec.imag
    return (
        re[..., 0:h:2],
        re[..., 1:h:2],
        re[..., h : h + 1],
        im[..., 2:h:2],
        im[..., 1:h:2],
    )


@pytest.mark.parametrize("nfft", SIZES)
def test_quad_forward_matches_numpy(nfft):
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (3, nfft)).astype(np.float32)
    got = rfft_folded_quad_parts(jnp.asarray(x), nfft)
    want = _parity_split(np.fft.rfft(x.astype(np.float64), axis=-1))
    scale = np.sqrt(nfft)
    for g, w, name in zip(got, want, ["re_e", "re_o", "re_nyq", "im_e", "im_o"]):
        assert g.shape == w.shape, f"{name}: {g.shape} vs {w.shape}"
        if g.size == 0:  # im_e is empty at N=4 (no interior even bins)
            continue
        err = np.sqrt(np.mean((np.asarray(g) - w) ** 2)) / scale
        assert err < 1e-6, f"N={nfft} {name}: err {err}"


@pytest.mark.parametrize("nfft", SIZES)
def test_quad_inverse_matches_numpy(nfft):
    rng = np.random.default_rng(1)
    kk = nfft // 2 + 1
    spec = rng.normal(size=(3, kk)) + 1j * rng.normal(size=(3, kk))
    spec[..., 0] = spec[..., 0].real  # hermitian projection (like irfft)
    spec[..., -1] = spec[..., -1].real
    want = np.fft.irfft(spec, n=nfft, axis=-1)
    parts = [jnp.asarray(np.ascontiguousarray(p, np.float32))
             for p in _parity_split(spec)]
    got = np.asarray(irfft_folded_quad_parts(*parts, nfft))
    err = np.sqrt(np.mean((got - want) ** 2))
    assert err < 1e-6, f"N={nfft}: inverse err {err}"


@pytest.mark.parametrize("nfft", SIZES)
def test_quad_round_trip_rmse(nfft):
    rng = np.random.default_rng(2)
    x = rng.uniform(-1, 1, (4, nfft)).astype(np.float32)
    w = np.ones(nfft, np.float64)
    y = np.asarray(roundtrip_folded_quad(jnp.asarray(x), nfft, w))
    rmse = np.sqrt(np.mean((x - y) ** 2))
    assert rmse < 1e-5, f"N={nfft}: rmse {rmse}"


@pytest.mark.parametrize("nfft", [512, 1024])
def test_quad_matches_tiled_windowed(nfft):
    from crlot_tpu.window.windows import get_window

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(-1, 1, (6, nfft)).astype(np.float32))
    w = get_window(WindowType.HANN, nfft, True, dtype=np.float64)
    a = np.asarray(roundtrip_folded_tiled(x, nfft, w, w))
    b = np.asarray(roundtrip_folded_quad(x, nfft, w, w))
    err = np.sqrt(np.mean((a - b) ** 2))
    assert err < 1e-6, f"N={nfft}: quad vs tiled err {err}"


@pytest.mark.parametrize("nfft", [512, 1024])
def test_quad_per_bin_gains_match_tiled(nfft):
    from crlot_tpu.window.windows import get_window

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.uniform(-1, 1, (5, nfft)).astype(np.float32))
    w = get_window(WindowType.HANN, nfft, True, dtype=np.float64)
    gains = 10 ** np.linspace(-0.5, 0.5, nfft // 2 + 1)
    a = np.asarray(
        roundtrip_folded_tiled(x, nfft, w, per_bin_gains_f64=gains)
    )
    b = np.asarray(
        roundtrip_folded_quad(x, nfft, w, per_bin_gains_f64=gains)
    )
    err = np.sqrt(np.mean((a - b) ** 2))
    assert err < 1e-6, f"N={nfft}: gained quad vs tiled err {err}"


def test_quad_gains_oracle():
    """Gained quad round-trip vs the straight numpy spectral pipeline."""
    nfft = 1024
    rng = np.random.default_rng(5)
    x = rng.uniform(-1, 1, (2, nfft)).astype(np.float32)
    w = np.hanning(nfft).astype(np.float64)
    gains = np.linspace(0.25, 2.0, nfft // 2 + 1)
    want = np.fft.irfft(
        np.fft.rfft(x * w.astype(np.float32), axis=-1) * gains, n=nfft
    )
    got = np.asarray(
        roundtrip_folded_quad(jnp.asarray(x), nfft, w, per_bin_gains_f64=gains)
    )
    err = np.sqrt(np.mean((got - want) ** 2))
    assert err < 1e-5, f"gained rt err {err}"


def test_quad_supported_gate():
    assert quad_supported(512) and quad_supported(1024)
    assert quad_supported(4096)
    assert not quad_supported(256)  # q = 64 < one lane tile
    assert not quad_supported(768)
    assert not quad_supported(8192)  # beyond MAX_MATMUL_NFFT


def test_quad_tone_round_trip_snr():
    """A pure tone through the windowed quad round-trip + OLA epilogue
    reconstructs above the reference 60 dB gate (e2e_benchmark.cc:336)."""
    from crlot_tpu.metrics import snr_db
    from crlot_tpu.ola.fused import ola_normalized_auto
    from crlot_tpu.ola.norm import edge_norm
    from crlot_tpu.window.windows import get_window

    n, hop, total = 1024, 256, 48000
    t = np.arange(total)
    x = (0.5 * np.sin(2 * np.pi * 440 * t / 48000)).astype(np.float32)
    w = get_window(WindowType.HANN, n, True, dtype=np.float64)
    pad = n // 2
    xp = np.pad(x, pad, mode="reflect")
    num = (len(xp) - n) // hop + 1
    frames = np.stack([xp[i * hop : i * hop + n] for i in range(num)])
    out_frames = roundtrip_folded_quad(jnp.asarray(frames), n, w)
    full = (num - 1) * hop + n
    norm = jnp.asarray(edge_norm(w, hop, num, full))
    y = np.asarray(
        ola_normalized_auto(out_frames, norm, hop, full, 1e-8)
    )[pad : pad + total]
    assert snr_db(x, y) > 90.0
