"""DTW: brute-force DP oracle + alignment-geometry gates."""

import numpy as np
import pytest

import jax.numpy as jnp

from crlot_tpu.align import dtw, dtw_cost, dtw_path


def _dtw_oracle(c):
    """Classic O(N*M) sequential dynamic program."""
    n, m = c.shape
    d = np.full((n, m), np.inf)
    d[0, 0] = c[0, 0]
    for j in range(1, m):
        d[0, j] = d[0, j - 1] + c[0, j]
    for i in range(1, n):
        d[i, 0] = d[i - 1, 0] + c[i, 0]
        for j in range(1, m):
            d[i, j] = c[i, j] + min(d[i - 1, j], d[i, j - 1], d[i - 1, j - 1])
    return d


def test_acc_matrix_matches_oracle():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((17, 5)).astype(np.float32)
    y = rng.standard_normal((23, 5)).astype(np.float32)
    cost, acc = dtw(x, y)
    c = np.asarray(dtw_cost(jnp.asarray(x), jnp.asarray(y)))
    want = _dtw_oracle(c.astype(np.float64))
    np.testing.assert_allclose(np.asarray(acc), want, rtol=1e-5, atol=1e-4)
    assert abs(float(cost) - want[-1, -1]) < 1e-3


def test_identical_sequences_zero_cost_diagonal_path():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((20, 4)).astype(np.float32)
    cost, acc = dtw(x, x)
    # The matmul-expanded Euclidean distance has an ~1e-3 absolute floor
    # per frame (f32 cancellation in |x|^2+|y|^2-2<x,y> under the sqrt).
    assert float(cost) < 0.05
    path = dtw_path(acc)
    assert path == [(i, i) for i in range(20)]


def test_path_endpoints_and_monotonicity():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((12, 3)).astype(np.float32)
    y = rng.standard_normal((30, 3)).astype(np.float32)
    _, acc = dtw(x, y)
    path = dtw_path(acc)
    assert path[0] == (0, 0) and path[-1] == (11, 29)
    steps = set(
        (b[0] - a[0], b[1] - a[1]) for a, b in zip(path[:-1], path[1:])
    )
    assert steps <= {(1, 0), (0, 1), (1, 1)}


def test_time_shifted_tone_aligns_with_offset():
    """y = x delayed by 5 frames: the path's mid-section sits on j = i + 5."""
    n, d = 40, 8
    rng = np.random.default_rng(3)
    base = rng.standard_normal((n + 5, d)).astype(np.float32)
    x, y = base[:n], base[5 : n + 5]  # x[i] == y[i - 5]
    _, acc = dtw(x, y)
    path = dtw_path(acc)
    mid = [p for p in path if 10 <= p[0] <= n - 10]
    frac = np.mean([1.0 if j == i - 5 else 0.0 for i, j in mid])
    assert frac > 0.8, (frac, mid[:10])


def test_cosine_metric():
    x = np.eye(4, dtype=np.float32)
    c = np.asarray(dtw_cost(jnp.asarray(x), jnp.asarray(x), metric="cosine"))
    np.testing.assert_allclose(np.diag(c), 0.0, atol=1e-6)
    assert np.all(c[~np.eye(4, dtype=bool)] > 0.9)


def test_unknown_metric_raises():
    with pytest.raises(ValueError):
        dtw_cost(jnp.ones((3, 2)), jnp.ones((3, 2)), metric="manhattan")


def test_1d_inputs_promoted():
    x = jnp.asarray(np.random.default_rng(4).standard_normal(10), jnp.float32)
    cost, acc = dtw(x[:, None], x[:, None])
    assert float(cost) < 0.05


def test_1d_series_treated_as_scalar_features():
    """Advice r2: 1-D inputs are [N, 1] scalar-feature series, not a single
    N-dim frame (atleast_2d's silent misread)."""
    rng = np.random.default_rng(5)
    x = rng.standard_normal(12).astype(np.float32)
    y = np.concatenate([x[:3], x]).astype(np.float32)  # shifted/stretched
    c = dtw_cost(jnp.asarray(x), jnp.asarray(y))
    assert c.shape == (12, 15)
    cost, acc = dtw(jnp.asarray(x), jnp.asarray(y))
    assert acc.shape == (12, 15)
    assert np.isfinite(float(cost))
    # identical 1-D series align for free
    cost_same, _ = dtw(jnp.asarray(x), jnp.asarray(x))
    assert float(cost_same) < 1e-3


def test_rank3_input_raises():
    with pytest.raises(ValueError, match="expected"):
        dtw_cost(jnp.ones((2, 3, 4)), jnp.ones((3, 4)))
