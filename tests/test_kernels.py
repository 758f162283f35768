"""Pallas-kernel-vs-jnp-reference equivalence (reference: tests/kernels_test.cc).

The reference checks every SIMD kernel against its scalar form within ±1 ULP
across sizes straddling SIMD lane boundaries {0,1,7,15,16,17,...,4096}
(kernels_test.cc:214-317, :375-428). TPU analog: Pallas (interpreted on CPU,
compiled on TPU) vs jnp, sizes straddling the 8x128 VPU tile.
"""

import numpy as np
import pytest

from crlot_tpu.ola import kernels as K

# Sizes straddling 128-lane and 8x128-tile boundaries (+ reference's sweep)
SIZES = [1, 7, 15, 16, 17, 127, 128, 129, 1023, 1024, 1025, 4096, 16384]


def _ulp_diff(a: np.ndarray, b: np.ndarray) -> int:
    """Max bit-level ULP distance (reference: kernels_test.cc:16-41)."""
    ai = np.asarray(a, dtype=np.float32).view(np.int32).astype(np.int64)
    bi = np.asarray(b, dtype=np.float32).view(np.int32).astype(np.int64)
    # Map to monotonic ordered-int space
    ai = np.where(ai < 0, np.int64(-(2**31)) - ai, ai)
    bi = np.where(bi < 0, np.int64(-(2**31)) - bi, bi)
    return int(np.max(np.abs(ai - bi))) if ai.size else 0


def _rand(n, seed):
    rng = np.random.default_rng(seed)
    return rng.uniform(-2, 2, n).astype(np.float32)


@pytest.mark.parametrize("n", SIZES)
def test_axpy_ulp(n):
    dst, src = _rand(n, 1), _rand(n, 2)
    got = np.asarray(K.axpy(dst, src, 1.5, use_pallas=True))
    want = np.asarray(K.axpy_reference(dst, src, 1.5))
    assert _ulp_diff(got, want) <= 1, f"n={n}"


@pytest.mark.parametrize("n", SIZES)
def test_axpy_windowed_ulp(n):
    dst, src, win = _rand(n, 3), _rand(n, 4), _rand(n, 5)
    got = np.asarray(K.axpy_windowed(dst, src, win, 0.75, use_pallas=True))
    want = np.asarray(K.axpy_windowed_reference(dst, src, win, 0.75))
    assert _ulp_diff(got, want) <= 1, f"n={n}"


@pytest.mark.parametrize("n", SIZES)
def test_normalize_and_clear_ulp(n):
    acc = _rand(n, 6)
    norm = np.abs(_rand(n, 7))
    norm[::5] = 0.0  # exercise the eps guard
    got, cleared = K.normalize_and_clear(acc, norm, eps=1e-8, use_pallas=True)
    want, _ = K.normalize_and_clear_reference(acc, norm, 1e-8)
    assert _ulp_diff(np.asarray(got), np.asarray(want)) <= 1, f"n={n}"
    assert np.all(np.asarray(cleared) == 0.0)


def test_axpy_semantics():
    dst = np.array([1.0, 2.0], dtype=np.float32)
    src = np.array([10.0, 20.0], dtype=np.float32)
    np.testing.assert_allclose(np.asarray(K.axpy(dst, src, 0.5)), [6.0, 12.0])


def test_axpy_windowed_semantics():
    dst = np.zeros(3, dtype=np.float32)
    src = np.array([1.0, 2.0, 3.0], dtype=np.float32)
    win = np.array([0.5, 0.5, 0.0], dtype=np.float32)
    np.testing.assert_allclose(
        np.asarray(K.axpy_windowed(dst, src, win, 2.0)), [1.0, 2.0, 0.0]
    )


def test_normalize_eps_guard_semantics():
    acc = np.array([1.0, 1.0], dtype=np.float32)
    norm = np.array([0.0, 2.0], dtype=np.float32)
    out, _ = K.normalize_and_clear(acc, norm, eps=0.5)
    np.testing.assert_allclose(np.asarray(out), [2.0, 0.5])


def test_empty_and_mismatch():
    empty = np.zeros(0, dtype=np.float32)
    assert K.axpy(empty, empty).size == 0
    with pytest.raises(ValueError):
        K.axpy(np.zeros(3, dtype=np.float32), np.zeros(4, dtype=np.float32))
    with pytest.raises(ValueError):
        K.axpy_windowed(
            np.zeros(3, dtype=np.float32),
            np.zeros(3, dtype=np.float32),
            np.zeros(2, dtype=np.float32),
        )


def test_dispatch_info():
    info = K.kernel_dispatch_info()
    assert info["backend"] in ("cpu", "tpu")
    assert 1 <= info["num_devices"] <= 64
    assert info["vpu_tile"] == (8, 128)
    K.print_kernel_dispatch_info()


def test_size_dispatch():
    """Auto-dispatch (reference analog: HWY_DYNAMIC_DISPATCH, kernels.cc:42-52):
    None routes small arrays to the jnp form (and everything off-TPU), while
    the forced paths agree within 1 ULP either way."""
    assert K.kernel_dispatch_info()["min_pallas_n"] == K.pallas_min_n()
    # Off-TPU auto must never pick interpreted Pallas.
    assert not K._dispatch_pallas(1 << 24, None)
    assert K._dispatch_pallas(123, True)
    assert not K._dispatch_pallas(1 << 24, False)
    dst, src = _rand(100, 8), _rand(100, 9)
    auto = np.asarray(K.axpy(dst, src, 1.5))
    forced = np.asarray(K.axpy(dst, src, 1.5, use_pallas=True))
    assert _ulp_diff(auto, forced) <= 1
