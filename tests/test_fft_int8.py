"""Int8x2 DFT backend: exactness of the limb machinery + SNR gates.

The int8 path trades ~15 dB of SNR (vs the HIGH bf16 tier) for ~2x MXU
throughput; these tests pin the parts that must be EXACT (limb splits,
scale recombination) and gate the parts that are approximate (round-trip
SNR, held far above the reference's 60 dB target,
bench/e2e_benchmark.cc:336-343).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from crlot_tpu.core.types import WindowType
from crlot_tpu.fft.int8_backend import (
    QMAX,
    _quantize_dynamic,
    dot_i8x2,
    int8_supported,
    quantize_basis,
    roundtrip_folded_tiled_i8,
)
from crlot_tpu.window.windows import get_window



pytestmark = pytest.mark.slow  # opt-in int8 backend, large sizes: run with -m slow / full suite

def _snr(ref, test):
    ref = np.asarray(ref, np.float64)
    err = np.asarray(test, np.float64) - ref
    return 10 * np.log10(np.sum(ref**2) / max(np.sum(err**2), 1e-300))


def test_basis_limb_split_exact():
    rng = np.random.default_rng(0)
    b = rng.standard_normal((257, 130)) * 10 ** rng.uniform(-3, 3, (1, 130))
    hi, lo, cs = quantize_basis(b)
    assert hi.dtype == np.int8 and lo.dtype == np.int8
    recon = (hi.astype(np.float64) * 128 + lo) * cs.astype(np.float64)
    # half a quantum of each column's scale, plus the f32 rounding of the
    # stored scale itself (<= QMAX * 2^-24 ~ 0.001 quanta)
    err = np.abs(recon - b)
    assert np.all(err <= (0.5 + QMAX * 2.0**-24) * cs + 1e-12)
    # limbs within range, recombination magnitude within QMAX
    q = hi.astype(np.float64) * 128 + lo
    assert np.abs(q).max() <= QMAX


def test_dynamic_quantization_exact_split():
    rng = np.random.default_rng(1)
    x = (rng.standard_normal((16, 640)) * 10 ** rng.uniform(-4, 1)).astype(
        np.float32
    )
    hi, lo, s = _quantize_dynamic(jnp.asarray(x))
    hi, lo, s = np.asarray(hi), np.asarray(lo), np.asarray(s)
    q = hi.astype(np.float64) * 128 + lo
    assert np.abs(q).max() <= QMAX
    # per-row scale: every row's max maps to the full quantization range
    row_max = np.abs(x).max(axis=-1)
    live = row_max > 0
    assert np.all(np.abs(q[live]).max(axis=-1) >= QMAX - 1)
    recon = q * s
    assert np.abs(recon - x).max() <= 0.5 * s.max() + 1e-12


def test_zero_rows_are_safe():
    x = jnp.zeros((4, 512), jnp.float32)
    hi, lo, s = _quantize_dynamic(x)
    assert np.all(np.asarray(hi) == 0) and np.all(np.asarray(lo) == 0)
    b = np.eye(512)
    y = dot_i8x2(x, quantize_basis(b))
    assert np.all(np.isfinite(np.asarray(y))) and np.all(np.asarray(y) == 0)


def test_dot_snr_vs_f64():
    rng = np.random.default_rng(2)
    b = rng.standard_normal((512, 512))
    x = rng.standard_normal((256, 512)).astype(np.float32)
    y = dot_i8x2(jnp.asarray(x), quantize_basis(b))
    assert _snr(x.astype(np.float64) @ b, y) > 74


@pytest.mark.parametrize("nfft", [512, 1024, 2048, 4096])
def test_roundtrip_snr(nfft):
    assert int8_supported(nfft)
    rng = np.random.default_rng(3)
    w = get_window(WindowType.HANN, nfft, True, dtype=np.float64)
    fr = rng.uniform(-1, 1, (32, nfft)).astype(np.float32)
    out = roundtrip_folded_tiled_i8(jnp.asarray(fr), nfft, w)
    # identity round-trip of windowed frames; gate well above 60 dB
    assert _snr(fr.astype(np.float64) * w, out) > 74


def test_roundtrip_snr_per_frame_headroom():
    """A 60 dB frame-amplitude spread must not cost SNR (per-row scales)."""
    nfft = 1024
    rng = np.random.default_rng(4)
    w = get_window(WindowType.HANN, nfft, True, dtype=np.float64)
    fr = rng.uniform(-1, 1, (64, nfft))
    fr *= 10 ** np.linspace(-3, 0, 64)[:, None]
    fr = fr.astype(np.float32)
    out = roundtrip_folded_tiled_i8(jnp.asarray(fr), nfft, w)
    assert _snr(fr.astype(np.float64) * w, out) > 74


def test_roundtrip_with_per_bin_gains():
    nfft = 1024
    rng = np.random.default_rng(5)
    w = get_window(WindowType.HANN, nfft, True, dtype=np.float64)
    g = 10 ** rng.uniform(-1, 1, nfft // 2 + 1)  # +-20 dB EQ curve
    fr = rng.uniform(-1, 1, (32, nfft)).astype(np.float32)
    out = roundtrip_folded_tiled_i8(
        jnp.asarray(fr), nfft, w, per_bin_gains_f64=g
    )
    spec = np.fft.rfft(fr.astype(np.float64) * w, axis=-1) * g
    ref = np.fft.irfft(spec, n=nfft, axis=-1)
    assert _snr(ref, out) > 70


def test_roundtrip_synthesis_window():
    nfft = 512
    rng = np.random.default_rng(6)
    w = get_window(WindowType.HANN, nfft, True, dtype=np.float64)
    fr = rng.uniform(-1, 1, (16, nfft)).astype(np.float32)
    out = roundtrip_folded_tiled_i8(
        jnp.asarray(fr), nfft, w, synthesis_window_f64=w
    )
    assert _snr(fr.astype(np.float64) * w * w, out) > 74


def test_pipeline_accepts_int8_tier():
    """The INT8X2 tier threads through the public pipeline config (on CPU
    it falls back to the HIGH lowering for non-tiled ops; the config must
    be jit-hashable and round-trip above the 60 dB gate either way)."""
    from crlot_tpu.core.types import FftPrecision, StftConfig
    from crlot_tpu.pipeline import round_trip

    cfg = StftConfig(
        frame_size=1024, hop_size=256, fft_precision=FftPrecision.INT8X2
    )
    rng = np.random.default_rng(7)
    sig = rng.uniform(-1, 1, 48000).astype(np.float32)
    out = np.asarray(round_trip(jnp.asarray(sig), cfg))
    body = slice(1024, 48000 - 1024)
    assert _snr(sig[body], out[body]) > 60


def test_composed_i8_matches_oracle():
    """The int8 composed response round-trip (one quantized dot) vs the
    f64 rfft*g -> irfft oracle: single-dot quantization error only."""
    from crlot_tpu.fft.int8_backend import roundtrip_composed_i8

    nfft = 1024
    rng = np.random.default_rng(8)
    w = get_window(WindowType.HANN, nfft, True, dtype=np.float64)
    k = np.arange(nfft // 2 + 1)
    g = (10 ** rng.uniform(-0.5, 0.5, nfft // 2 + 1)) * np.exp(
        -2j * np.pi * k * 3 / nfft
    )
    fr = rng.uniform(-1, 1, (16, nfft)).astype(np.float32)
    out = roundtrip_composed_i8(jnp.asarray(fr), nfft, w, g)
    spec = np.fft.rfft(fr.astype(np.float64) * w, axis=-1) * g
    ref = np.fft.irfft(spec, n=nfft, axis=-1)
    # near-diagonal circulant: per-column quantization noise grows ~sqrt(K)
    # vs the signal (see roundtrip_composed_i8 docstring) — gate above the
    # reference's 60 dB but below the flat-basis paths' 74 dB
    assert _snr(ref, out) > 62
