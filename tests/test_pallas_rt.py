"""Fused round-trip Pallas kernel vs jnp/numpy oracles (interpret mode).

Mirrors the reference's SIMD-vs-scalar dual-implementation gate
(tests/kernels_test.cc:214-317): the fused kernel must match the plain
matmul-backend formulation within its precision tier across configs.
"""

import numpy as np
import pytest

from crlot_tpu.core.types import WindowType
from crlot_tpu.fft.pallas_rt import (
    MAX_FUSED_NFFT,
    fused_rt_supported,
    roundtrip_frames_fused,
)
from crlot_tpu.window.windows import get_window



pytestmark = pytest.mark.slow  # interpreted Pallas off-TPU: run with -m slow / full suite

def _oracle(x, n, hop, f, w64):
    frames = np.stack([x[i * hop : i * hop + n] for i in range(f)])
    return np.fft.irfft(
        np.fft.rfft(frames.astype(np.float64) * w64, axis=-1), axis=-1
    )


@pytest.mark.parametrize(
    "nfft,hop", [(256, 128), (512, 128), (1024, 256), (1024, 512)]
)
def test_fused_rt_matches_oracle(nfft, hop):
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    f = 21
    x = rng.uniform(-1, 1, (f - 1) * hop + nfft).astype(np.float32)
    w64 = get_window(WindowType.HANN, nfft, True, dtype=np.float64)
    got = np.asarray(
        roundtrip_frames_fused(jnp.asarray(x), nfft, hop, f, w64, interpret=True)
    )
    want = _oracle(x, nfft, hop, f, w64)
    # HIGH-tier numerics: 3-pass bf16 split, ~1e-5 absolute on +/-1 data.
    assert np.max(np.abs(got - want)) < 2e-4


def test_fused_rt_batched_channels():
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    nfft, hop, f = 256, 128, 9
    x = rng.uniform(-1, 1, (2, (f - 1) * hop + nfft)).astype(np.float32)
    w64 = get_window(WindowType.HAMMING, nfft, True, dtype=np.float64)
    got = np.asarray(
        roundtrip_frames_fused(jnp.asarray(x), nfft, hop, f, w64, interpret=True)
    )
    assert got.shape == (2, f, nfft)
    for c in range(2):
        want = _oracle(x[c], nfft, hop, f, w64)
        assert np.max(np.abs(got[c] - want)) < 2e-4


def test_fused_rt_support_predicate():
    assert fused_rt_supported(1024, 256)
    assert fused_rt_supported(1024, 512)
    assert not fused_rt_supported(1024, 341)  # hop does not divide N
    assert not fused_rt_supported(1024, 128 + 64)  # hop % 128 != 0
    assert not fused_rt_supported(768, 256)  # odd R = 3
    assert not fused_rt_supported(2 * MAX_FUSED_NFFT, 512)  # VMEM cap
    assert not fused_rt_supported(1023, 256)


def test_fused_rt_unsupported_raises():
    import jax.numpy as jnp

    w64 = get_window(WindowType.HANN, 768, True, dtype=np.float64)
    with pytest.raises(ValueError):
        roundtrip_frames_fused(jnp.zeros(4096), 768, 256, 5, w64)


@pytest.mark.parametrize(
    "nfft,hop", [(256, 128), (512, 128), (1024, 256), (1024, 512)]
)
def test_fullfused_rt_ola_matches_pipeline(nfft, hop):
    """roundtrip_signal_fused == the jnp round_trip path (framing + folded
    matmul rt + OLA + edge norm), within the HIGH precision tier."""
    import jax.numpy as jnp

    from crlot_tpu.core.padding import pad_signal
    from crlot_tpu.core.types import StftConfig
    from crlot_tpu.fft.pallas_rt import roundtrip_signal_fused
    from crlot_tpu.metrics import snr_db
    from crlot_tpu.pipeline import _norm_np, _window_f64, round_trip

    cfg = StftConfig(frame_size=nfft, hop_size=hop, center=True)
    total = 12000
    rng = np.random.default_rng(2)
    x = rng.uniform(-0.9, 0.9, total).astype(np.float32)
    spec = cfg.frame_spec
    f = spec.num_frames(total)
    padded = pad_signal(
        jnp.asarray(x), spec.pad_amount, spec.pad_amount, spec.pad_mode,
        spec.pad_value,
    )
    w64 = _window_f64(cfg)
    full = (f - 1) * hop + nfft
    norm = jnp.asarray(_norm_np(cfg, f, full))
    out = roundtrip_signal_fused(
        padded, nfft, hop, f, w64, norm, cfg.eps, interpret=True
    )
    pad = spec.pad_amount
    y = np.asarray(out[pad : pad + total])
    assert snr_db(x, y) > 90.0
    ref = np.asarray(round_trip(jnp.asarray(x), cfg))
    assert np.max(np.abs(y - ref)) < 2e-4


def test_fullfused_rt_ola_batched():
    import jax.numpy as jnp

    from crlot_tpu.core.padding import pad_signal
    from crlot_tpu.core.types import StftConfig
    from crlot_tpu.fft.pallas_rt import roundtrip_signal_fused
    from crlot_tpu.metrics import snr_db
    from crlot_tpu.pipeline import _norm_np, _window_f64

    nfft, hop = 256, 128
    cfg = StftConfig(frame_size=nfft, hop_size=hop, center=True)
    total = 4000
    rng = np.random.default_rng(3)
    x = rng.uniform(-0.9, 0.9, (2, total)).astype(np.float32)
    spec = cfg.frame_spec
    f = spec.num_frames(total)
    padded = pad_signal(
        jnp.asarray(x), spec.pad_amount, spec.pad_amount, spec.pad_mode,
        spec.pad_value,
    )
    w64 = _window_f64(cfg)
    full = (f - 1) * hop + nfft
    norm = jnp.asarray(_norm_np(cfg, f, full))
    out = roundtrip_signal_fused(
        padded, nfft, hop, f, w64, norm, cfg.eps, interpret=True
    )
    pad = spec.pad_amount
    y = np.asarray(out[..., pad : pad + total])
    assert y.shape == x.shape
    for c in range(2):
        assert snr_db(x[c], y[c]) > 90.0


def test_fullfused_spectral_matches_xla_packed_path():
    """The in-VMEM nonlinear per-bin fn (spectral_packed) must match the
    XLA packed-plane nonlinear route (pipeline's .packed path semantics)
    within the HIGH tier — the fused answer to the reference's arbitrary
    spectral-processing slot (e2e_benchmark.cc:161-163)."""
    import jax.numpy as jnp

    from crlot_tpu.core.padding import pad_signal
    from crlot_tpu.core.types import StftConfig
    from crlot_tpu.fft.matmul_backend import (
        irfft_folded_parts,
        rfft_folded_packed,
    )
    from crlot_tpu.fft.pallas_rt import roundtrip_signal_fused
    from crlot_tpu.ola.reference import normalize, overlap_add
    from crlot_tpu.pipeline import _norm_np, _window_f64
    from crlot_tpu.spectral import noise_gate

    nfft, hop = 512, 128
    cfg = StftConfig(frame_size=nfft, hop_size=hop, center=True)
    total = 12000
    rng = np.random.default_rng(4)
    x = rng.uniform(-0.9, 0.9, total).astype(np.float32)
    spec = cfg.frame_spec
    f = spec.num_frames(total)
    padded = pad_signal(
        jnp.asarray(x), spec.pad_amount, spec.pad_amount, spec.pad_mode,
        spec.pad_value,
    )
    w64 = _window_f64(cfg)
    full = (f - 1) * hop + nfft
    norm = jnp.asarray(_norm_np(cfg, f, full))
    gate = noise_gate(-40.0, attenuation_db=-30.0)

    out = roundtrip_signal_fused(
        padded, nfft, hop, f, w64, norm, cfg.eps, interpret=True,
        spectral_packed=gate.packed,
    )
    pad = spec.pad_amount
    y = np.asarray(out[pad : pad + total])

    # Reference route: framed folded packed planes -> gate.packed -> inverse
    # -> OLA + norm (the same math the pipeline's nonlinear path runs).
    frames = jnp.stack(
        [padded[i * hop : i * hop + nfft] for i in range(f)]
    )
    re, im = rfft_folded_packed(
        frames, nfft, jnp.asarray(np.asarray(w64, np.float32))
    )
    re, im = gate.packed(re, im)
    out_frames = irfft_folded_parts(re, im, nfft)
    acc = overlap_add(out_frames, hop, full)
    ref = np.asarray(normalize(acc, norm, cfg.eps))[pad : pad + total]
    assert np.max(np.abs(y - ref)) < 5e-4


def test_frames_fused_spectral_matches_xla_packed():
    """The FRAMES-level fused kernel with spectral_packed (the sharded
    mesh's nonlinear route) must match the XLA packed-plane frames route
    within the HIGH tier."""
    import jax.numpy as jnp

    from crlot_tpu.fft.matmul_backend import (
        irfft_folded_parts,
        rfft_folded_packed,
    )
    from crlot_tpu.fft.pallas_rt import roundtrip_frames_fused
    from crlot_tpu.spectral import noise_gate
    from crlot_tpu.window.windows import get_window

    nfft, hop, f = 512, 128, 17
    rng = np.random.default_rng(5)
    x = rng.uniform(-1, 1, (f - 1) * hop + nfft).astype(np.float32)
    w64 = get_window(WindowType.HANN, nfft, True, dtype=np.float64)
    gate = noise_gate(-40.0, attenuation_db=-30.0)

    got = np.asarray(
        roundtrip_frames_fused(
            jnp.asarray(x), nfft, hop, f, w64, interpret=True,
            spectral_packed=gate.packed,
        )
    )
    frames = jnp.stack([x[i * hop : i * hop + nfft] for i in range(f)])
    re, im = rfft_folded_packed(
        frames, nfft, jnp.asarray(np.asarray(w64, np.float32))
    )
    re, im = gate.packed(re, im)
    want = np.asarray(irfft_folded_parts(re, im, nfft))
    assert np.max(np.abs(got - want)) < 5e-4


@pytest.mark.parametrize("make_fn", ["subtraction", "compose"])
def test_fullfused_spectral_other_packed_fns(make_fn):
    """The fused in-VMEM route must hold for every `.packed` fn shape the
    spectral module ships (it is the DEFAULT TPU route since r4):
    spectral subtraction (data-dependent magnitude scaling) and composed
    chains."""
    import jax.numpy as jnp

    from crlot_tpu.core.padding import pad_signal
    from crlot_tpu.core.types import StftConfig
    from crlot_tpu.fft.matmul_backend import (
        irfft_folded_parts,
        rfft_folded_packed,
    )
    from crlot_tpu.fft.pallas_rt import roundtrip_signal_fused
    from crlot_tpu.pipeline import _norm_np, _window_f64
    from crlot_tpu.spectral import band_gain, compose, noise_gate
    from crlot_tpu.spectral import spectral_subtraction

    nfft, hop = 512, 128
    if make_fn == "subtraction":
        noise = np.full(nfft // 2 + 1, 0.05, np.float32)
        fn = spectral_subtraction(jnp.asarray(noise), alpha=1.5)
    else:
        fn = compose(
            band_gain([4000.0], [1.0, 0.4], 48000, nfft),
            noise_gate(-50.0, attenuation_db=-40.0),
        )
    cfg = StftConfig(frame_size=nfft, hop_size=hop, center=True)
    total = 8000
    rng = np.random.default_rng(11)
    x = rng.uniform(-0.9, 0.9, total).astype(np.float32)
    spec = cfg.frame_spec
    f = spec.num_frames(total)
    padded = pad_signal(
        jnp.asarray(x), spec.pad_amount, spec.pad_amount, spec.pad_mode,
        spec.pad_value,
    )
    w64 = _window_f64(cfg)
    full = (f - 1) * hop + nfft
    norm = jnp.asarray(_norm_np(cfg, f, full))
    out = roundtrip_signal_fused(
        padded, nfft, hop, f, w64, norm, cfg.eps, interpret=True,
        spectral_packed=fn.packed,
    )
    pad = spec.pad_amount
    y = np.asarray(out[pad : pad + total])

    frames = jnp.stack(
        [padded[i * hop : i * hop + nfft] for i in range(f)]
    )
    re, im = rfft_folded_packed(
        frames, nfft, jnp.asarray(np.asarray(w64, np.float32))
    )
    re, im = fn.packed(re, im)
    out_frames = irfft_folded_parts(re, im, nfft)
    from crlot_tpu.ola.reference import normalize, overlap_add

    acc = overlap_add(out_frames, hop, full)
    ref = np.asarray(normalize(acc, norm, cfg.eps))[pad : pad + total]
    assert np.max(np.abs(y - ref)) < 1e-3
