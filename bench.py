"""Headline benchmark: STFT->iSTFT->OLA round-trip throughput (samples/s).

North-star config per BASELINE.json: mono, FFT=1024, hop=256, Hann, centered.
Baseline: the reference C++ pipeline measures 0.90 ms for 1 s @ 48 kHz mono
(N=1024, H=512) on Apple Silicon => ~53.3e6 samples/s (BASELINE.md).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "samples/s", "vs_baseline": N/53.3e6, ...}

Runs on whatever backend jax selects (the real TPU chip under the driver).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

# Persist compiles: the remote TPU tunnel is flaky and recompiles are the
# expensive part of a retry.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

BASELINE_SAMPLES_PER_SEC = 48000 / 0.90e-3  # reference e2e: 0.90 ms / 1 s audio


def _timed_chain(fn_one, x, k: int):
    """Build a jit that runs `fn_one` k times with a data dependency between
    iterations, returning a scalar. One dispatch + one readback regardless of
    k, so (t(k2) - t(k1)) / (k2 - k1) isolates pure device time — required
    on remote-tunneled devices where per-dispatch latency is ~25 ms."""
    import jax
    import jax.numpy as jnp

    def chained(s):
        def body(carry, _):
            y = fn_one(carry)
            # Feed output back (same length) to serialize iterations.
            return y, ()

        y, _ = jax.lax.scan(body, s, length=k)
        return jnp.sum(y)

    return jax.jit(chained)


def _measure(fn_one, x, k_small=2, k_big=12, reps=8, bursts=3,
             burst_gap_s=None) -> float:
    """Per-iteration device seconds via two chain lengths, measured
    INTERLEAVED and differenced at their minima: the tunnel's per-call
    overhead swings by hundreds of ms between contention windows, and only
    at the uncontended floor (which both chain lengths visit at least once
    across reps) does the constant overhead actually cancel. The chip also
    alternates between full-rate and ~half-rate regimes lasting tens of
    minutes (time-shared), so the reps are split into `bursts` spanning
    several minutes — one burst can sit entirely inside a slow regime."""
    if burst_gap_s is None:
        # Span several minutes so one burst can catch the fast rate regime,
        # while keeping total runtime inside a cautious driver timeout;
        # CRLOT_BENCH_GAP_S widens it for deliberate long runs.
        burst_gap_s = float(os.environ.get("CRLOT_BENCH_GAP_S", "90"))
    f_small = _timed_chain(fn_one, x, k_small)
    f_big = _timed_chain(fn_one, x, k_big)
    float(f_small(x))  # compile + warm
    float(f_big(x))
    t_small, t_big = [], []
    # Up to 2 extra bursts if contention makes the difference non-positive
    # (minima landing in different tunnel windows). Never clamp: a clamped
    # difference FABRICATES throughput; failing lets the retry loop rerun.
    for burst in range(bursts + 2):
        if burst:
            time.sleep(burst_gap_s)
        for _ in range(reps):
            for f, acc in ((f_small, t_small), (f_big, t_big)):
                t0 = time.perf_counter()
                float(f(x))
                acc.append(time.perf_counter() - t0)
        diff = min(t_big) - min(t_small)
        if burst >= bursts - 1 and diff > 0:
            return diff / (k_big - k_small)
    raise RuntimeError(
        f"unmeasurable: min(t_big)={min(t_big):.3f} <= "
        f"min(t_small)={min(t_small):.3f} across {bursts + 2} bursts "
        "(tunnel contention); rerun"
    )


def main() -> None:
    import jax
    import jax.numpy as jnp

    from crlot_tpu.core.types import StftConfig
    from crlot_tpu.metrics import snr_db
    from crlot_tpu.pipeline import round_trip

    cfg = StftConfig(frame_size=1024, hop_size=256, center=True)
    seconds = 60
    sr = 48000
    total = sr * seconds
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-0.9, 0.9, total).astype(np.float32))

    fn_one = lambda s: round_trip(s, cfg)  # noqa: E731

    # Correctness gate before timing (the reference shipped a benchmark that
    # was failing its own SNR target; we refuse to report perf on bad audio).
    y = jax.jit(fn_one)(x)
    snr = snr_db(np.asarray(x), np.asarray(y))
    assert snr > 60.0, f"round-trip SNR {snr:.1f} dB < 60 dB gate"

    from crlot_tpu.profiling import roofline_samples_per_sec

    roof = roofline_samples_per_sec(cfg.frame_size, cfg.hop_size)
    # Physical plausibility cap: chain-minima differencing can UNDERestimate
    # when the two lengths' minima land in different tunnel windows,
    # fabricating faster-than-hardware numbers (docs/DESIGN.md records a
    # 0.195 ms outlier = ~1.9x the compute bound). Anything meaningfully
    # above every roofline bound is a measurement artifact — remeasure.
    cap = 1.35 * max(
        roof["bandwidth_bound_samples_per_sec"],
        roof["compute_bound_samples_per_sec"],
    )
    for _ in range(3):
        per_iter = _measure(fn_one, x, k_small=8, k_big=40, reps=10)
        samples_per_sec = total / per_iter
        if samples_per_sec <= cap:
            break
    else:
        raise RuntimeError(
            f"measured {samples_per_sec:.3g} samples/s exceeds 1.35x the "
            f"roofline ({cap:.3g}) in 3 attempts — tunnel artifact; rerun"
        )

    print(
        json.dumps(
            {
                "metric": "stft_istft_ola_roundtrip_throughput_n1024_h256",
                "value": round(samples_per_sec, 1),
                "unit": "samples/s",
                "vs_baseline": round(samples_per_sec / BASELINE_SAMPLES_PER_SEC, 3),
                "snr_db": round(snr, 1),
                "device_ms_per_60s_audio": round(per_iter * 1e3, 3),
                "audio_seconds": seconds,
                "roofline_pct": round(
                    100 * samples_per_sec / roof["roofline_samples_per_sec"], 1
                ),
                "backend": jax.default_backend(),
                "device": str(jax.devices()[0].device_kind),
            }
        )
    )


if __name__ == "__main__":
    main()
