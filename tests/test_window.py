"""Window tests (reference: tests/window_lut_test.cc, tests/window_test.cc).

Patterns: RMS < 1e-6 vs re-derived f64 formulas incl. non-pow2 sizes
{1000, 1023}; first/mid/last spot checks periodic & symmetric; normalization
invariants sum=1 / sum(w^2)=1 to 1e-6; cache identity + clear safety +
8-thread race test.
"""

import concurrent.futures
import math

import numpy as np
import pytest

from crlot_tpu.core.types import NormalizationType, WindowType
from crlot_tpu.window import windows as W

SIZES = [8, 64, 255, 256, 1000, 1023, 1024, 4096]


def _formula(wtype, n, periodic):
    if n == 1:
        return np.ones(1)
    denom = n if periodic else n - 1
    k = np.arange(n, dtype=np.float64)
    c = lambda m: np.cos(2.0 * math.pi * m * k / denom)  # noqa: E731
    if wtype == WindowType.HANN:
        return 0.5 - 0.5 * c(1)
    if wtype == WindowType.HAMMING:
        return 0.54 - 0.46 * c(1)
    if wtype == WindowType.BLACKMAN:
        return 0.42 - 0.5 * c(1) + 0.08 * c(2)
    if wtype == WindowType.BLACKMAN_HARRIS:
        return 0.35875 - 0.48829 * c(1) + 0.14128 * c(2) - 0.01168 * c(3)
    return np.ones(n)


@pytest.mark.parametrize("wtype", list(WindowType))
@pytest.mark.parametrize("n", SIZES)
@pytest.mark.parametrize("periodic", [True, False])
def test_window_matches_formula(wtype, n, periodic):
    w = W.get_window(wtype, n, periodic)
    assert w.dtype == np.float32
    assert w.shape == (n,)
    rms = W.calculate_rms_error(w, _formula(wtype, n, periodic))
    assert rms < 1e-6, f"{wtype} N={n} periodic={periodic}: rms {rms}"


def test_spot_checks_hann():
    # Symmetric Hann: endpoints 0, midpoint 1 (reference: window_test.cc:99-161)
    w = W.get_window(WindowType.HANN, 101, periodic=False)
    assert w[0] == pytest.approx(0.0, abs=1e-7)
    assert w[100] == pytest.approx(0.0, abs=1e-7)
    assert w[50] == pytest.approx(1.0, abs=1e-7)
    # Periodic Hann: w[0]=0 but w[N-1] != 0
    wp = W.get_window(WindowType.HANN, 100, periodic=True)
    assert wp[0] == pytest.approx(0.0, abs=1e-7)
    assert wp[50] == pytest.approx(1.0, abs=1e-7)
    assert wp[99] > 0.0


def test_rect_is_ones():
    w = W.get_window(WindowType.RECT, 77)
    np.testing.assert_array_equal(w, np.ones(77, dtype=np.float32))


@pytest.mark.parametrize("n", [256, 1000, 1024])
def test_sum_to_one(n):
    w = W.get_window(WindowType.HANN, n, norm=NormalizationType.SUM_TO_ONE)
    assert abs(W.calculate_sum(w) - 1.0) < 1e-6


@pytest.mark.parametrize("n", [256, 1000, 1024])
def test_l2_norm(n):
    w = W.get_window(WindowType.HAMMING, n, norm=NormalizationType.L2_NORM)
    assert abs(W.calculate_sum_of_squares(w) - 1.0) < 1e-6


def test_ola_unity_gain_with_hop():
    n, hop = 1024, 256
    w = W.get_window(
        WindowType.HANN, n, periodic=True,
        norm=NormalizationType.OLA_UNITY_GAIN, hop=hop,
    )
    # Steady-state overlapped sum at every phase must be <= 1 and == 1 at max
    w64 = w.astype(np.float64)
    sums = [w64[p::hop].sum() for p in range(hop)]
    assert max(sums) == pytest.approx(1.0, abs=1e-6)


def test_ola_unity_gain_without_hop_falls_back_to_l2():
    # Reference behavior: OLA_UNITY_GAIN without hop == L2 (WindowLUT.cc:345-356)
    a = W.get_window(WindowType.HANN, 512, norm=NormalizationType.OLA_UNITY_GAIN)
    b = W.get_window(WindowType.HANN, 512, norm=NormalizationType.L2_NORM)
    np.testing.assert_array_equal(a, b)


def test_ola_sum_wsq_with_hop():
    n, hop = 1024, 256
    w = W.get_window(
        WindowType.HANN, n, norm=NormalizationType.OLA_SUM_WSQ, hop=hop
    )
    # Reference scaling (WindowLUT.cc:363-374): sum(w^2) == hop/N after
    # normalization (scale = 1/(sqrt(sum w^2) * sqrt(N/hop))).
    assert W.calculate_sum_of_squares(w) == pytest.approx(hop / n, rel=1e-6)


def test_cache_identity_and_clear():
    W.clear_cache()
    a = W.get_window(WindowType.HANN, 512)
    b = W.get_window(WindowType.HANN, 512)
    assert a is b  # same key -> same object (reference cache semantics)
    assert W.cache_size() >= 1
    W.clear_cache()
    assert W.cache_size() == 0
    # Live reference survives a clear (generation-invalidation analog)
    assert a[256] == pytest.approx(1.0, abs=1e-6)
    c = W.get_window(WindowType.HANN, 512)
    np.testing.assert_array_equal(a, c)


def test_cache_immutable():
    w = W.get_window(WindowType.HANN, 64)
    with pytest.raises((ValueError, RuntimeError)):
        w[0] = 5.0


def test_cache_thread_race():
    # 8-thread stress (reference: window_lut_test.cc:244-284)
    W.clear_cache()

    def task(i):
        out = []
        for n in [256, 512, 1024, 1000]:
            out.append(W.get_window(WindowType.HANN, n, periodic=bool(i % 2)))
            if i % 3 == 0:
                W.clear_cache()
        return out

    with concurrent.futures.ThreadPoolExecutor(max_workers=8) as ex:
        results = list(ex.map(task, range(32)))
    for res in results:
        for w in res:
            assert np.isfinite(w).all()


def test_invalid_size_raises():
    with pytest.raises(ValueError):
        W.get_window(WindowType.HANN, 0)
    with pytest.raises(ValueError):
        W.get_window(WindowType.HANN, -4)


def test_calculate_ola_gain():
    # Hann periodic at 75% overlap: max overlapped sum of w^2 = 1.5
    w = W.get_window(WindowType.HANN, 1024, periodic=True)
    g = W.calculate_ola_gain(w, 256)
    assert g == pytest.approx(1.5, rel=1e-3)
    with pytest.raises(ValueError):
        W.calculate_ola_gain(w, 0)
