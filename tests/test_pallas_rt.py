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
