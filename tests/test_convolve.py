"""Toeplitz-matmul convolution vs the numpy oracle (all modes, sizes
straddling the hop-block boundary, batch, long taps)."""

import jax.numpy as jnp
import numpy as np
import pytest

from crlot_tpu.convolve import convolve


def _oracle(x, taps, mode):
    return np.convolve(np.asarray(x, np.float64), np.asarray(taps, np.float64),
                       mode=mode)


@pytest.mark.parametrize("mode", ["full", "same", "valid"])
@pytest.mark.parametrize("t,l", [(100, 7), (255, 64), (256, 127), (257, 128),
                                 (4096, 513), (1000, 1000)])
def test_convolve_matches_numpy(mode, t, l):
    rng = np.random.default_rng(t * 1000 + l)
    x = rng.uniform(-1, 1, t).astype(np.float32)
    taps = rng.uniform(-1, 1, l).astype(np.float32)
    got = np.asarray(convolve(jnp.asarray(x), taps, mode=mode))
    want = _oracle(x, taps, mode)
    assert got.shape == want.shape, f"{got.shape} vs {want.shape}"
    scale = max(1e-12, np.sqrt(np.mean(want**2)))
    err = np.sqrt(np.mean((got - want) ** 2)) / scale
    assert err < 1e-5, f"mode={mode} T={t} L={l}: rel rmse {err}"


def test_convolve_batched():
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (3, 2, 500)).astype(np.float32)
    taps = rng.uniform(-1, 1, 31).astype(np.float32)
    got = np.asarray(convolve(jnp.asarray(x), taps, mode="same"))
    assert got.shape == (3, 2, 500)
    for i in range(3):
        for c in range(2):
            want = _oracle(x[i, c], taps, "same")
            assert np.sqrt(np.mean((got[i, c] - want) ** 2)) < 1e-5


def test_convolve_identity_taps():
    x = np.arange(10, dtype=np.float32)
    got = np.asarray(convolve(jnp.asarray(x), np.ones(1, np.float32)))
    np.testing.assert_allclose(got, x, atol=1e-6)


def test_convolve_errors():
    x = jnp.ones(16)
    with pytest.raises(ValueError):
        convolve(x, np.ones(3), mode="reflect")
    with pytest.raises(ValueError):
        convolve(x, np.ones((2, 2)))


@pytest.mark.parametrize("mode", ["full", "same", "valid"])
@pytest.mark.parametrize("t,l", [(100, 255), (4, 8), (300, 513)])
def test_convolve_taps_longer_than_signal(mode, t, l):
    """numpy parity holds in the L > T orientation too (same returns
    max(T, L) centered; valid returns max - min + 1)."""
    rng = np.random.default_rng(l)
    x = rng.uniform(-1, 1, t).astype(np.float32)
    taps = rng.uniform(-1, 1, l).astype(np.float32)
    got = np.asarray(convolve(jnp.asarray(x), taps, mode=mode))
    want = _oracle(x, taps, mode)
    assert got.shape == want.shape, f"{got.shape} vs {want.shape}"
    err = np.sqrt(np.mean((got - want) ** 2))
    assert err < 1e-5, f"mode={mode} T={t} L={l}: rmse {err}"


def test_convolve_lowpass_attenuates():
    """A designed lowpass actually filters: a high tone drops > 60 dB."""
    sr = 48000
    t = np.arange(sr // 2) / sr
    lo = np.sin(2 * np.pi * 500 * t).astype(np.float32)
    hi = np.sin(2 * np.pi * 20000 * t).astype(np.float32)
    taps = (np.hamming(255) * np.sinc(np.arange(-127, 128) * 2 * 4000 / sr)
            * 2 * 4000 / sr).astype(np.float32)
    y_lo = np.asarray(convolve(jnp.asarray(lo), taps, mode="same"))
    y_hi = np.asarray(convolve(jnp.asarray(hi), taps, mode="same"))
    mid = slice(2048, -2048)
    assert np.max(np.abs(y_lo[mid])) > 0.5
    assert np.max(np.abs(y_hi[mid])) < np.max(np.abs(y_lo[mid])) * 1e-3


def test_convolve_rejects_traced_taps():
    """Traced taps fail with a clear TypeError, not an opaque numpy
    conversion error inside the kernel builder (ADVICE r1)."""
    import jax

    def f(taps):
        return convolve(jnp.ones(64), taps)

    with pytest.raises(TypeError, match="concrete host array"):
        jax.jit(f)(jnp.ones(8))


def test_toeplitz_kernel_cache_bounded():
    from crlot_tpu.convolve import _toeplitz_kernel

    assert _toeplitz_kernel.cache_parameters()["maxsize"] == 64
