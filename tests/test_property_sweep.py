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
