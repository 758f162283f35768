"""Shared device-time measurement primitives for the flaky tunneled chip.

One home for the three tricks every TPU measurement in this repo needs
(bench.py, bench/suite.py, bench/regression.py import from here):

* `timed_chain_dyn`: ONE jit whose iteration count is a runtime
  `fori_loop` argument — both chain lengths share a single compiled
  program (the axon backend never hits the persistent compilation cache,
  and a contended-window remote compile can take minutes).
* `burst`: interleave the two chain lengths and difference their MINIMA
  (the tunnel's per-call overhead swings hundreds of ms between
  contention windows; only at the uncontended floor does it cancel).
  Returns None instead of fabricating throughput when unmeasurable.
* `mxu_probe_chain` / `hbm_probe_chain`: raw bf16-matmul and pure-HBM
  streaming chains measuring the resource rates the time-shared tunnel is
  ACTUALLY serving in the current window — what turns a raw throughput
  into a chip-adjusted percentage (docs/DESIGN.md 'rate regimes').
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np


def timed_chain_dyn(fn_one):
    """jit((k, s) -> scalar) running `fn_one` k times with a data
    dependency between iterations; one dispatch + one readback per call."""
    import jax
    import jax.numpy as jnp

    def chained(k, s):
        def body(_, carry):
            return fn_one(carry)

        y = jax.lax.fori_loop(0, k, body, s)
        return jnp.sum(y)

    return jax.jit(chained)


def burst(f, x, k_small, k_big, reps):
    """Per-iteration seconds via interleaved minima differencing, or None
    if the burst was too contended to measure (min big <= min small)."""
    t_small, t_big = [], []
    for _ in range(reps):
        for k, acc in ((k_small, t_small), (k_big, t_big)):
            t0 = time.perf_counter()
            float(f(k, x))
            acc.append(time.perf_counter() - t0)
    diff = min(t_big) - min(t_small)
    if diff <= 0:
        return None
    return diff / (k_big - k_small)


def mxu_probe_chain():
    """(jit_fn, operand, flops_per_iter) for the raw bf16 matmul chain
    (the op the roofline's compute peak is defined by)."""
    import jax
    import jax.numpy as jnp

    n = 4096
    rng = np.random.default_rng(1)
    m = jnp.asarray(
        (rng.standard_normal((n, n)) / np.sqrt(n)).astype(np.float32)
    ).astype(jnp.bfloat16)

    def one(c):
        return jax.lax.dot(
            m, c, precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)

    return timed_chain_dyn(one), m, 2.0 * n * n * n


def hbm_probe_chain():
    """(jit_fn, operand, bytes_per_iter) for the pure HBM streaming chain
    (read + write one 128 MB f32 array per iteration)."""
    import jax.numpy as jnp

    n = 32 * 1024 * 1024
    x = jnp.zeros((n,), jnp.float32)

    def one(c):
        return c * jnp.float32(1.0000001) + jnp.float32(1e-7)

    return timed_chain_dyn(one), x, 2.0 * 4.0 * n


def quick_headline_duty(
    seconds: int = 8, reps: int = 5, k_small: int = 8, k_big: int = 40
) -> Optional[dict]:
    """Cheap same-window co-measurement of the headline pipeline rate AND
    the raw MXU rate, for a per-run `headline_roofline_pct_chip_adjusted`
    (r3 verdict item 4: the regression guard's one regime-normalized
    timing band must be MEASURED every run, not 'armed but not measured').

    Returns {sps, mxu_duty, roofline_pct_chip_adjusted, snr_db} or None
    when the window was too contended for either measurement. Cost: two
    compiles + ~reps*(k_big+k_small) iterations of an `seconds`-second
    chain — a couple of minutes on a serving window.
    """
    import jax
    import jax.numpy as jnp

    from ..core.types import StftConfig
    from ..metrics import snr_db
    from ..pipeline import round_trip
    from ..profiling import device_specs, roofline_samples_per_sec

    cfg = StftConfig(frame_size=1024, hop_size=256, center=True)
    total = 48000 * seconds
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-0.9, 0.9, total).astype(np.float32))
    try:
        y = jax.jit(lambda s: round_trip(s, cfg))(x)
        snr = snr_db(np.asarray(x), np.asarray(y))
        f = timed_chain_dyn(lambda s: round_trip(s, cfg))
        float(f(1, x))
        per = burst(f, x, k_small, k_big, reps)
        if per is None:
            return None
        sps = total / per
        pf, pm, flops = mxu_probe_chain()
        float(pf(1, pm))
        mxu = burst(pf, pm, k_small, k_big, reps)
        if mxu is None:
            return None
        _, bf16_peak, _ = device_specs()
        duty = (flops / mxu) / bf16_peak
        if duty > 1.1:  # cross-window artifact, not a measurement
            return None
        roof = roofline_samples_per_sec(
            cfg.frame_size, cfg.hop_size, formulation="blocked"
        )
        comp_meas = roof["compute_bound_samples_per_sec"] * min(duty, 1.0)
        # Regime flag: in a DEGRADED service window the chip-adjusted
        # percentage is still depressed (MXU duty normalizes the chip
        # rate, not the co-tenancy overlap loss the pipeline suffers —
        # docs/DESIGN.md 'half-rate window' diagnosis), so consumers must
        # only band it when the window was serving near-full-rate.
        pct_model = 100.0 * sps / roof["roofline_samples_per_sec"]
        return {
            "sps": round(sps, 1),
            "mxu_duty": round(duty, 4),
            "roofline_pct_chip_adjusted": round(100.0 * sps / comp_meas, 1),
            "roofline_pct_model": round(pct_model, 1),
            "window_near_full_rate": bool(pct_model >= 72.0),
            "snr_db": round(snr, 1),
        }
    except Exception:  # noqa: BLE001 — tunnel 500s/UNIMPLEMENTED/hangs
        return None
