"""FFT tests (reference: tests/fft_test.cc).

Patterns: round-trip RMSE < 1e-6 target / 1e-5 hard gate; analytic oracles
(DC magnitude = N, single tone bin k magnitude = A*N/2, phase 0, Nyquist);
batch per-element verification; strided layout round-trip; NaN/Inf/denormal
inputs yield finite output; invalid configs throw (odd real N, in_place).
"""

import numpy as np
import pytest

from crlot_tpu.core.types import FftDomain, FftPlanDesc
from crlot_tpu.fft.api import make_fft_plan

SIZES = [256, 512, 1024, 2048, 4096]


def _plan(nfft, domain=FftDomain.REAL, **kw):
    return make_fft_plan(FftPlanDesc(domain=domain, nfft=nfft, **kw))


@pytest.mark.parametrize("nfft", SIZES)
def test_real_round_trip_rmse(nfft):
    rng = np.random.default_rng(42)
    x = rng.uniform(-1, 1, nfft).astype(np.float32)
    plan = _plan(nfft)
    y = np.asarray(plan.inverse(plan.forward(x)))
    rmse = np.sqrt(np.mean((x - y) ** 2))
    assert rmse < 1e-6, f"N={nfft}: rmse {rmse}"  # target gate (fft_test.cc:76-82)


def test_dc_component():
    nfft = 1024
    x = np.ones(nfft, dtype=np.float32)
    spec = np.asarray(_plan(nfft).forward(x))
    assert spec.shape == (nfft // 2 + 1,)
    assert abs(spec[0]) == pytest.approx(nfft, rel=1e-5)
    assert np.max(np.abs(spec[1:])) < 1e-2


def test_single_tone_bin():
    nfft, k, amp = 1024, 7, 0.5
    t = np.arange(nfft)
    x = (amp * np.cos(2 * np.pi * k * t / nfft)).astype(np.float32)
    spec = np.asarray(_plan(nfft).forward(x))
    assert abs(spec[k]) == pytest.approx(amp * nfft / 2, rel=1e-4)
    assert np.angle(spec[k]) == pytest.approx(0.0, abs=1e-3)
    others = np.abs(spec)
    others[k] = 0
    assert np.max(others) < 1e-2


def test_nyquist():
    nfft = 512
    x = np.array([1.0, -1.0] * (nfft // 2), dtype=np.float32)
    spec = np.asarray(_plan(nfft).forward(x))
    assert abs(spec[-1]) == pytest.approx(nfft, rel=1e-5)


def test_inverse_includes_1_over_n():
    nfft = 256
    spec = np.zeros(nfft // 2 + 1, dtype=np.complex64)
    spec[0] = nfft  # DC of all-ones
    y = np.asarray(_plan(nfft).inverse(spec))
    np.testing.assert_allclose(y, np.ones(nfft), atol=1e-5)


def test_batch_per_element():
    nfft, batch = 512, 8
    rng = np.random.default_rng(3)
    x = rng.uniform(-1, 1, (batch, nfft)).astype(np.float32)
    plan = _plan(nfft, batch=batch)
    spec = np.asarray(plan.forward(x))
    for b in range(batch):
        single = np.asarray(_plan(nfft).forward(x[b]))
        np.testing.assert_allclose(spec[b], single, atol=1e-4)
    assert plan.supports_batch()
    assert plan.max_batch_size() > 16  # reference caps at 16; we lift it


def test_strided_round_trip():
    nfft, batch, stride = 256, 4, 3
    rng = np.random.default_rng(5)
    frames = rng.uniform(-1, 1, (batch, nfft)).astype(np.float32)
    flat = np.zeros(batch * nfft * stride, dtype=np.float32)
    flat[::stride] = frames.reshape(-1)
    plan = _plan(nfft, batch=batch, stride_in=stride, stride_out=1)
    spec_flat = np.asarray(plan.forward_strided(flat))
    spec = spec_flat.reshape(batch, nfft // 2 + 1)
    direct = np.asarray(_plan(nfft, batch=batch).forward(frames))
    np.testing.assert_allclose(spec, direct, atol=1e-5)


def test_complex_round_trip():
    nfft = 512
    rng = np.random.default_rng(7)
    x = (rng.standard_normal(nfft) + 1j * rng.standard_normal(nfft)).astype(
        np.complex64
    )
    plan = _plan(nfft, domain=FftDomain.COMPLEX)
    y = np.asarray(plan.inverse_complex(plan.forward_complex(x)))
    assert np.max(np.abs(x - y)) < 1e-4


def test_nan_inf_denormal_scrub():
    nfft = 256
    x = np.zeros(nfft, dtype=np.float32)
    x[0] = np.nan
    x[1] = np.inf
    x[2] = -np.inf
    x[3] = 1e-38  # denormal-ish, below 1e-30 threshold
    x[4:] = 0.5
    plan = _plan(nfft)
    spec = np.asarray(plan.forward(x))
    assert np.isfinite(spec).all()
    y = np.asarray(plan.inverse(spec))
    assert np.isfinite(y).all()


def test_scrub_disabled_passes_nan():
    nfft = 256
    x = np.full(nfft, np.nan, dtype=np.float32)
    spec = np.asarray(_plan(nfft, scrub=False).forward(x))
    assert np.isnan(spec).any()


def test_invalid_configs():
    with pytest.raises(ValueError):
        FftPlanDesc(domain=FftDomain.REAL, nfft=1023)  # odd real N
    with pytest.raises(ValueError):
        FftPlanDesc(domain=FftDomain.REAL, nfft=1024, in_place=True)
    with pytest.raises(ValueError):
        FftPlanDesc(domain=FftDomain.REAL, nfft=1024, batch=0)
    with pytest.raises(ValueError):
        FftPlanDesc(domain=FftDomain.REAL, nfft=1024, stride_in=0)
    with pytest.raises(ValueError):
        FftPlanDesc(domain=FftDomain.REAL, nfft=0)
    # odd N fine for COMPLEX
    FftPlanDesc(domain=FftDomain.COMPLEX, nfft=1023)


def test_domain_mismatch_raises():
    plan = _plan(512)
    with pytest.raises(ValueError):
        plan.forward_complex(np.zeros(512, dtype=np.complex64))
    cplan = _plan(512, domain=FftDomain.COMPLEX)
    with pytest.raises(ValueError):
        cplan.forward(np.zeros(512, dtype=np.float32))


def test_wrong_length_raises():
    plan = _plan(512)
    with pytest.raises(ValueError):
        plan.forward(np.zeros(500, dtype=np.float32))
