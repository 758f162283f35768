"""Pre-emphasis / de-emphasis and mu-law companding.

Oracles: scipy.signal.lfilter for the filter pair, the closed-form G.711
curve for companding, inversion round trips, and chunked-vs-oneshot
streaming continuity (SURVEY.md §4 patterns 1 and 3).
"""

import numpy as np
import pytest
import scipy.signal

import jax.numpy as jnp

from crlot_tpu.effects import (
    deemphasis,
    mu_compress,
    mu_expand,
    mu_law_decode,
    mu_law_encode,
    preemphasis,
)
from crlot_tpu.metrics import snr_db

RNG = np.random.default_rng(42)


def _audio(n=8000):
    t = np.arange(n) / 16000.0
    x = 0.5 * np.sin(2 * np.pi * 220 * t) + 0.1 * RNG.standard_normal(n)
    return np.clip(x, -0.99, 0.99).astype(np.float32)


# ---------------------------------------------------------------------------
# pre/de-emphasis
# ---------------------------------------------------------------------------

def test_preemphasis_matches_scipy_interior():
    x = _audio()
    got = np.asarray(preemphasis(x, coef=0.97))
    want = scipy.signal.lfilter([1.0, -0.97], [1.0], x)
    np.testing.assert_allclose(got[1:], want[1:], atol=1e-6)
    # Boundary convention: x[-1] = x[0] -> y[0] = (1-coef)*x[0].
    assert abs(got[0] - 0.03 * x[0]) < 1e-6


def test_deemphasis_inverts_preemphasis():
    x = _audio()
    y = np.asarray(deemphasis(preemphasis(x, coef=0.97), coef=0.97))
    assert snr_db(x, y) > 100.0


def test_preemphasis_streaming_zi_matches_oneshot():
    x = _audio()
    one = np.asarray(preemphasis(x))
    a = np.asarray(preemphasis(x[:3000]))
    b = np.asarray(preemphasis(x[3000:], zi=jnp.asarray(x[2999:3000])))
    np.testing.assert_array_equal(np.concatenate([a, b]), one)


def test_deemphasis_streaming_zi_matches_oneshot():
    x = _audio()
    y = np.asarray(preemphasis(x))
    one = np.asarray(deemphasis(jnp.asarray(y)))
    a = np.asarray(deemphasis(jnp.asarray(y[:3000])))
    b = np.asarray(deemphasis(jnp.asarray(y[3000:]), zi=jnp.asarray(a[-1:])))
    assert snr_db(one, np.concatenate([a, b])) > 90.0


def test_preemphasis_batched():
    x = np.stack([_audio(), 2 * _audio()])
    got = np.asarray(preemphasis(x))
    np.testing.assert_allclose(got[0], np.asarray(preemphasis(x[0])), atol=0)


# ---------------------------------------------------------------------------
# mu-law
# ---------------------------------------------------------------------------

def test_mu_compress_closed_form():
    x = np.linspace(-1, 1, 101).astype(np.float32)
    got = np.asarray(mu_compress(x))
    want = np.sign(x) * np.log1p(255.0 * np.abs(x)) / np.log1p(255.0)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_mu_expand_inverts_compress():
    x = _audio()
    y = np.asarray(mu_expand(mu_compress(x)))
    assert snr_db(x, y) > 100.0


@pytest.mark.parametrize("bits", [8, 10])
def test_mu_law_codes_in_range_and_monotone(bits):
    x = np.linspace(-1, 1, 4097).astype(np.float32)
    codes = np.asarray(mu_law_encode(x, bits=bits))
    assert codes.dtype == np.int32
    assert codes.min() == 0 and codes.max() == (1 << bits) - 1
    assert np.all(np.diff(codes) >= 0)


def test_mu_law_roundtrip_snr():
    x = _audio()
    y = np.asarray(mu_law_decode(mu_law_encode(x, bits=8), bits=8))
    # 8-bit mu-law holds ~35+ dB SNR on program material.
    assert snr_db(x, y) > 30.0
    # Quantized compress equals the encode->decode compress domain.
    q = np.asarray(mu_compress(x, quantize=True))
    z = np.asarray(mu_compress(y))
    np.testing.assert_allclose(q, z, atol=2e-3)


def test_mu_law_decode_hits_exact_levels():
    codes = jnp.arange(256, dtype=jnp.int32)
    x = np.asarray(mu_law_decode(codes))
    back = np.asarray(mu_law_encode(jnp.asarray(x)))
    np.testing.assert_array_equal(back, np.arange(256))
