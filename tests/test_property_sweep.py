"""Randomized config sweep: the round-trip contract must hold for ANY valid
StftConfig, not just the benched ones.

Property (SURVEY.md §6 quality gates): for every (N, hop, window, periodic,
center, synthesis_window, backend) drawn from the valid space, an identity
round-trip reconstructs the signal above the 60 dB gate (we assert 80 to
leave margin), at the exact input length, with finite output. Seeded deraws
keep failures reproducible.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from crlot_tpu.core.types import FftBackend, StftConfig, WindowType
from crlot_tpu.metrics import snr_db
from crlot_tpu.pipeline import round_trip

WINDOWS = [
    WindowType.HANN,
    WindowType.HAMMING,
    WindowType.BLACKMAN,
    WindowType.BLACKMAN_HARRIS,
]



pytestmark = pytest.mark.slow  # random property sweeps: run with -m slow / full suite

def _draw_config(rng):
    n = int(rng.choice([128, 192, 256, 320, 512, 768, 1024, 2048]))
    # hop <= N/2 keeps COLA coverage for every window family above.
    hop = int(rng.choice([d for d in (32, 64, 96, 128, 256, 512)
                          if d <= n // 2]))
    return StftConfig(
        frame_size=n,
        hop_size=hop,
        window=WINDOWS[int(rng.integers(len(WINDOWS)))],
        periodic=bool(rng.integers(2)),
        synthesis_window=bool(rng.integers(2)),
        center=True,
        fft_backend=FftBackend(
            str(rng.choice(["auto", "xla", "matmul"]))
        ),
    )


@pytest.mark.parametrize("seed", range(16))
def test_random_config_round_trip(seed):
    rng = np.random.default_rng(1000 + seed)
    cfg = _draw_config(rng)
    length = int(rng.integers(cfg.frame_size, 6 * cfg.frame_size))
    x = rng.uniform(-0.9, 0.9, length).astype(np.float32)
    y = np.asarray(round_trip(jnp.asarray(x), cfg))
    assert y.shape == x.shape, cfg
    assert np.isfinite(y).all(), cfg
    snr = snr_db(x, y)
    assert snr > 80.0, (cfg, length, snr)


@pytest.mark.parametrize("seed", range(6))
def test_random_config_stft_istft_consistency(seed):
    """stft -> istft equals round_trip (the packed fast path may not drift
    from the complex-spectrum path)."""
    rng = np.random.default_rng(2000 + seed)
    cfg = _draw_config(rng)
    length = int(rng.integers(2 * cfg.frame_size, 5 * cfg.frame_size))
    x = rng.uniform(-0.9, 0.9, length).astype(np.float32)
    from crlot_tpu.pipeline import istft, stft

    via_spec = np.asarray(istft(stft(jnp.asarray(x), cfg), cfg, length=length))
    direct = np.asarray(round_trip(jnp.asarray(x), cfg))
    assert np.max(np.abs(via_spec - direct)) < 5e-4, cfg


@pytest.mark.parametrize("seed", range(10))
def test_random_composed_response(seed):
    """Composed one-matmul round-trip vs the f64 rfft*g -> irfft oracle for
    random sizes (odd, non-pow2 included), windows, and responses (real
    gains or complex curves with phase)."""
    from crlot_tpu.fft.matmul_backend import roundtrip_composed_matmul
    from crlot_tpu.window.windows import get_window

    rng = np.random.default_rng(2000 + seed)
    n = int(rng.choice([256, 320, 500, 999, 1024, 2048, 4096]))
    kk = n // 2 + 1
    w = get_window(
        WINDOWS[int(rng.integers(len(WINDOWS)))], n,
        bool(rng.integers(2)), dtype=np.float64,
    )
    mag = 10.0 ** rng.uniform(-1, 1, kk)
    if rng.integers(2):
        g = mag.astype(np.complex128)
    else:
        g = mag * np.exp(1j * rng.uniform(-np.pi, np.pi, kk))
    syn = w if rng.integers(2) else None
    fr = rng.uniform(-1, 1, (3, n)).astype(np.float32)
    got = np.asarray(
        roundtrip_composed_matmul(jnp.asarray(fr), n, w, g, syn)
    )
    spec = np.fft.rfft(fr.astype(np.float64) * w, axis=-1) * g
    want = np.fft.irfft(spec, n=n, axis=-1)
    if syn is not None:
        want = want * w
    err = want - got
    snr = 10 * np.log10(np.sum(want**2) / max(np.sum(err**2), 1e-300))
    assert snr > 90, (n, snr)
