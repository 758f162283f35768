"""HPSS: median-filter oracle, mask algebra, and analytic separation gates.

Oracle strategy (SURVEY.md §4 pattern 1): scipy.ndimage.median_filter for
the sliding median, energy-dominance gates on signals whose harmonic/
percussive identity is known by construction (steady tone vs click train),
and a completeness gate (parts sum to the round trip at unit margins).
"""

import numpy as np
import pytest
import scipy.ndimage

import jax.numpy as jnp

from crlot_tpu.core.types import StftConfig
from crlot_tpu.hpss import _sliding_median, harmonic, hpss, hpss_masks, percussive
from crlot_tpu.metrics import snr_db
from crlot_tpu.pipeline import round_trip

SR = 48000
CFG = StftConfig(frame_size=1024, hop_size=256, center=True)


def _tone(freq, seconds=1.0, sr=SR):
    t = np.arange(int(seconds * sr)) / sr
    return np.sin(2 * np.pi * freq * t).astype(np.float32)


def _clicks(seconds=1.0, sr=SR, period=4800, width=8):
    x = np.zeros(int(seconds * sr), dtype=np.float32)
    for p in range(period // 2, len(x) - width, period):
        x[p : p + width] = 1.0
    return x


def _energy(x):
    return float(np.sum(np.square(np.asarray(x, np.float64))))


# ---------------------------------------------------------------------------
# sliding median
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("size,axis", [(3, -1), (7, -1), (5, -2), (1, -1)])
def test_sliding_median_matches_scipy(size, axis):
    rng = np.random.default_rng(7)
    x = rng.standard_normal((9, 24)).astype(np.float32)
    got = np.asarray(_sliding_median(jnp.asarray(x), size, axis))
    shape = [1, 1]
    shape[axis] = size
    want = scipy.ndimage.median_filter(x, size=tuple(shape), mode="nearest")
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_sliding_median_rejects_even_size():
    with pytest.raises(ValueError):
        _sliding_median(jnp.zeros((4, 4)), 4, axis=-1)


# ---------------------------------------------------------------------------
# mask algebra
# ---------------------------------------------------------------------------

def test_masks_sum_to_one_at_unit_margin():
    rng = np.random.default_rng(3)
    p = jnp.asarray(rng.uniform(0.1, 2.0, (40, 33)).astype(np.float32))
    mh, mp = hpss_masks(p, kernel_harm=9, kernel_perc=9)
    np.testing.assert_allclose(np.asarray(mh + mp), 1.0, atol=1e-5)


def test_margin_rejects_below_one():
    with pytest.raises(ValueError):
        hpss_masks(jnp.ones((8, 8)), margin_harm=0.5)


def test_margin_leaves_residual():
    # With a dominance margin the masks no longer cover everything.
    rng = np.random.default_rng(4)
    p = jnp.asarray(rng.uniform(0.1, 2.0, (40, 33)).astype(np.float32))
    mh, mp = hpss_masks(p, kernel_harm=9, kernel_perc=9,
                        margin_harm=3.0, margin_perc=3.0)
    assert float(jnp.max(mh + mp)) < 1.0


# ---------------------------------------------------------------------------
# separation gates
# ---------------------------------------------------------------------------

def test_tone_is_harmonic():
    x = _tone(440.0)
    h, p = hpss(x, CFG)
    assert _energy(h) > 0.9 * _energy(x)
    assert _energy(p) < 0.1 * _energy(x)


def test_clicks_are_percussive():
    x = _clicks()
    h, p = hpss(x, CFG)
    assert _energy(p) > 0.8 * _energy(x)
    assert _energy(h) < 0.2 * _energy(x)


def test_mixture_separates():
    tone = _tone(440.0)
    clicks = 0.5 * _clicks()
    h, p = hpss(tone + clicks, CFG)
    # Each part should resemble its source far better than the mixture does.
    assert snr_db(tone, np.asarray(h)) > 10.0
    assert snr_db(clicks, np.asarray(p)) > 3.0
    assert snr_db(tone, np.asarray(h)) > snr_db(tone, tone + clicks)


def test_parts_sum_to_round_trip_at_unit_margin():
    rng = np.random.default_rng(11)
    x = rng.standard_normal(SR // 2).astype(np.float32)
    h, p = hpss(x, CFG)
    rt = np.asarray(round_trip(x, CFG))
    assert snr_db(rt, np.asarray(h) + np.asarray(p)) > 60.0


def test_wrappers_match_tuple():
    x = _tone(220.0, seconds=0.25)
    h, p = hpss(x, CFG)
    np.testing.assert_array_equal(np.asarray(harmonic(x, CFG)), np.asarray(h))
    np.testing.assert_array_equal(np.asarray(percussive(x, CFG)), np.asarray(p))


def test_sliding_median_chunked_matches_direct(monkeypatch):
    """The memory-bounded lax.map chunked path (advice r2: the naive stack
    grows linearly with signal length) must be bit-identical to the direct
    stacked median."""
    import sys

    import crlot_tpu.hpss  # noqa: F401 — the package re-exports the
    hpss_mod = sys.modules["crlot_tpu.hpss"]  # function under this name

    rng = np.random.default_rng(11)
    x = rng.standard_normal((37, 24)).astype(np.float32)
    for size, axis in [(5, -1), (7, -2)]:
        direct = np.asarray(_sliding_median(jnp.asarray(x), size, axis))
        # Force chunking (cap of 1k elems -> many chunks incl. a ragged tail)
        monkeypatch.setattr(hpss_mod, "_MEDIAN_STACK_ELEMS", 1024)
        chunked = np.asarray(_sliding_median(jnp.asarray(x), size, axis))
        monkeypatch.undo()
        np.testing.assert_array_equal(chunked, direct)


def test_sliding_median_chunked_batched(monkeypatch):
    """Chunking picks the largest non-filtered axis; batched inputs stay
    correct."""
    import sys

    import scipy.ndimage

    import crlot_tpu.hpss  # noqa: F401
    hpss_mod = sys.modules["crlot_tpu.hpss"]

    rng = np.random.default_rng(12)
    x = rng.standard_normal((3, 40, 8)).astype(np.float32)
    monkeypatch.setattr(hpss_mod, "_MEDIAN_STACK_ELEMS", 512)
    got = np.asarray(_sliding_median(jnp.asarray(x), 5, -2))
    want = np.stack([
        scipy.ndimage.median_filter(x[b], size=(5, 1), mode="nearest")
        for b in range(x.shape[0])
    ])
    np.testing.assert_allclose(got, want, atol=1e-6)
