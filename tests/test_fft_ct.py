"""Cooley-Tukey matmul FFT backend vs numpy (large-N path)."""

import numpy as np
import pytest

from crlot_tpu.fft.ct_backend import factor, irfft_ct, rfft_ct

SIZES = [2048, 4096, 8192, 16384]


def test_factor():
    assert factor(8192) == (128, 64)
    assert factor(4096) == (64, 64)
    with pytest.raises(ValueError):
        factor(1000)


@pytest.mark.parametrize("nfft", SIZES)
def test_rfft_matches_numpy(nfft):
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (3, nfft)).astype(np.float32)
    got = np.asarray(rfft_ct(jnp.asarray(x), nfft))
    want = np.fft.rfft(x.astype(np.float64), axis=-1)
    err = np.max(np.abs(got - want)) / nfft
    assert err < 2e-6, f"N={nfft}: rel err {err}"


@pytest.mark.parametrize("nfft", SIZES)
def test_round_trip(nfft):
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, (2, nfft)).astype(np.float32)
    y = np.asarray(irfft_ct(rfft_ct(jnp.asarray(x), nfft), nfft))
    rmse = np.sqrt(np.mean((x - y) ** 2))
    assert rmse < 1e-5, f"N={nfft}: rmse {rmse}"  # reference hard gate


def test_tone_bin_large():
    import jax.numpy as jnp

    nfft, k, amp = 16384, 129, 0.25
    t = np.arange(nfft)
    x = (amp * np.cos(2 * np.pi * k * t / nfft)).astype(np.float32)
    spec = np.asarray(rfft_ct(jnp.asarray(x), nfft))
    assert abs(spec[k]) == pytest.approx(amp * nfft / 2, rel=1e-3)


def test_pipeline_large_frame_ct():
    from crlot_tpu.core.types import FftBackend, StftConfig
    from crlot_tpu.metrics import snr_db
    from crlot_tpu.pipeline import round_trip

    rng = np.random.default_rng(2)
    x = rng.uniform(-0.9, 0.9, 65536).astype(np.float32)
    cfg = StftConfig(
        frame_size=16384, hop_size=4096, center=True,
        fft_backend=FftBackend.MATMUL,  # MATMUL falls through to CT above cap
    )
    y = np.asarray(round_trip(x, cfg))
    assert snr_db(x, y) > 80.0


def test_complex_ct_matches_numpy():
    import jax.numpy as jnp

    from crlot_tpu.fft.ct_backend import fft_ct, ifft_ct

    rng = np.random.default_rng(3)
    x = (rng.standard_normal((2, 4096)) + 1j * rng.standard_normal((2, 4096))
         ).astype(np.complex64)
    got = np.asarray(fft_ct(jnp.asarray(x), 4096))
    want = np.fft.fft(x.astype(np.complex128), axis=-1)
    assert np.max(np.abs(got - want)) / 4096 < 2e-6
    back = np.asarray(ifft_ct(jnp.asarray(got), 4096))
    assert np.max(np.abs(back - x)) < 1e-3


def test_plan_complex_matmul_backend():
    import jax.numpy as jnp

    from crlot_tpu.core.types import FftBackend, FftDomain, FftPlanDesc
    from crlot_tpu.fft.api import make_fft_plan

    plan = make_fft_plan(
        FftPlanDesc(domain=FftDomain.COMPLEX, nfft=2048,
                    backend=FftBackend.MATMUL)
    )
    rng = np.random.default_rng(4)
    x = (rng.standard_normal(2048) + 1j * rng.standard_normal(2048)).astype(
        np.complex64
    )
    y = np.asarray(plan.inverse_complex(plan.forward_complex(jnp.asarray(x))))
    assert np.max(np.abs(y - x)) < 1e-3


def test_ct_high_tier_round_trip_snr():
    """The pipeline's HIGH tier through the CT path (dispatch at N > 4096)
    must still clear the 60 dB round-trip gate with margin."""
    import jax
    import jax.numpy as jnp

    from crlot_tpu.fft.ct_backend import irfft_ct, rfft_ct
    from crlot_tpu.metrics import snr_db

    rng = np.random.default_rng(5)
    x = rng.uniform(-1, 1, (4, 16384)).astype(np.float32)
    prec = jax.lax.Precision.HIGH
    y = np.asarray(
        irfft_ct(rfft_ct(jnp.asarray(x), 16384, prec), 16384, prec)
    )
    assert snr_db(x, y) > 80.0
