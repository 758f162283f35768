"""Griffin-Lim gates: spectral convergence and tone reconstruction."""

import numpy as np
import pytest

import jax.numpy as jnp

from crlot_tpu.core.types import StftConfig
from crlot_tpu.griffinlim import griffin_lim
from crlot_tpu.pipeline import stft

SR = 48000


def _cfg():
    # synthesis_window=True: magnitude-modified spectra need tapered
    # resynthesis (same reasoning as the vocoder).
    return StftConfig(
        frame_size=1024, hop_size=256, center=True, synthesis_window=True
    )


def _spectral_convergence_db(mag_target, y, cfg):
    mag_got = np.abs(np.asarray(stft(jnp.asarray(y), cfg)))
    mt = np.asarray(mag_target)
    num = np.sqrt(np.sum((mag_got - mt) ** 2))
    den = np.sqrt(np.sum(mt**2))
    return 20 * np.log10(num / den)


def test_griffin_lim_tone():
    t = np.arange(SR // 2) / SR
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    cfg = _cfg()
    mag = jnp.abs(stft(jnp.asarray(x), cfg))
    y = np.asarray(griffin_lim(mag, cfg, iters=60, length=len(x)))
    assert y.shape == x.shape
    sc = _spectral_convergence_db(mag, y, cfg)
    assert sc < -20.0, f"spectral convergence {sc:.1f} dB"
    # The reconstructed tone sits at the right frequency (GL from random
    # phase converges to ~a few Hz of residual modulation) and level.
    spec = np.abs(np.fft.rfft(y[4096:-4096] * np.hanning(len(y) - 8192)))
    dom = np.argmax(spec) * SR / (len(y) - 8192)
    assert dom == pytest.approx(440.0, abs=10.0)
    assert np.sqrt(np.mean(y**2)) == pytest.approx(0.5 / np.sqrt(2), rel=0.05)


def test_griffin_lim_improves_with_iters():
    rng = np.random.default_rng(0)
    t = np.arange(12000) / SR
    x = (
        0.4 * np.sin(2 * np.pi * 440 * t)
        + 0.2 * np.sin(2 * np.pi * 1337 * t)
    ).astype(np.float32)
    cfg = _cfg()
    mag = jnp.abs(stft(jnp.asarray(x), cfg))
    sc1 = _spectral_convergence_db(
        mag, np.asarray(griffin_lim(mag, cfg, iters=1, length=len(x))), cfg
    )
    sc30 = _spectral_convergence_db(
        mag, np.asarray(griffin_lim(mag, cfg, iters=30, length=len(x))), cfg
    )
    assert sc30 < sc1 - 6.0, f"{sc1:.1f} -> {sc30:.1f} dB"


def test_griffin_lim_batched():
    t = np.arange(12000) / SR
    x = np.stack([
        0.5 * np.sin(2 * np.pi * 440 * t),
        0.5 * np.sin(2 * np.pi * 880 * t),
    ]).astype(np.float32)
    cfg = _cfg()
    mag = jnp.abs(stft(jnp.asarray(x), cfg))
    y = np.asarray(griffin_lim(mag, cfg, iters=20, length=x.shape[-1]))
    assert y.shape == x.shape
    assert np.isfinite(y).all()


def test_stft_magnitude_matches_abs_stft():
    from crlot_tpu.griffinlim import stft_magnitude

    rng = np.random.default_rng(5)
    x = rng.uniform(-1, 1, (2, 8000)).astype(np.float32)
    cfg = _cfg()
    got = np.asarray(stft_magnitude(jnp.asarray(x), cfg))
    want = np.abs(np.asarray(stft(jnp.asarray(x), cfg)))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_griffin_lim_validation():
    cfg = _cfg()
    mag = jnp.ones((10, 513))
    with pytest.raises(ValueError):
        griffin_lim(mag, cfg, iters=0)
    with pytest.raises(ValueError):
        griffin_lim(mag, cfg, momentum=1.5)
