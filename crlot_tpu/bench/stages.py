"""Per-stage microbenchmarks of the round-trip pipeline on the current backend.

Times each stage in isolation (reference analog: bench/micro_kernels_benchmark
and performance_benchmark component timings) to locate the bottleneck.
"""

from __future__ import annotations

import json
import os
import time

# Persist compiles across retries on the flaky remote tunnel (bench.py policy).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def _time(fn, x, reps=8, k_small=2, k_big=12):
    """Per-call device seconds for `fn(x)`, amortized over a k-length in-jit
    chain to cancel the remote dispatch+readback latency (~25 ms on the
    tunnel). A tiny scalar derived from each output perturbs the next input,
    so XLA cannot hoist the body out of the scan. The input is passed as a
    jit ARGUMENT (closure-captured device arrays would be embedded as
    constants, requiring a fragile device->host fetch at trace time).

    The tunnel's per-call overhead swings by hundreds of ms between
    contention windows, so the two chain lengths are measured INTERLEAVED
    and differenced at their MINIMA — both visit the uncontended floor at
    least once across reps, where the constant overhead actually cancels
    (medians of separately-measured runs can land in different windows and
    even go negative)."""
    x = np.asarray(x)

    def build(k):
        def chained(s0, xx):
            def body(s, _):
                out = fn(xx + s)
                # Probe with a FULL reduction: a single-element probe lets
                # XLA dead-code-eliminate everything not feeding that
                # element (it slices straight through matmuls), silently
                # benchmarking a tiny sliced program.
                probe = jnp.sum(out)
                if jnp.iscomplexobj(probe):
                    probe = probe.real
                return probe.astype(jnp.float32) * 1e-30, ()

            c, _ = jax.lax.scan(body, s0, length=k)
            return c

        f = jax.jit(chained)
        float(f(jnp.float32(0), x))  # compile + warm
        return f

    f_small, f_big = build(k_small), build(k_big)
    t_small, t_big = [], []
    # Heavy contention can make min(t_big) < min(t_small) (the minima land
    # in different tunnel windows); clamping that to epsilon would FABRICATE
    # absurd throughput, so give up with NaN — an honest "unmeasurable this
    # run". Extra sampling rounds are opt-in (CRLOT_BENCH_RETRIES=n):
    # suites time dozens of metrics and a default per-metric retry budget
    # multiplies across all of them, blowing the orchestration timeout.
    extra = int(os.environ.get("CRLOT_BENCH_RETRIES", "0"))
    for attempt in range(1 + max(extra, 0)):
        if attempt:
            time.sleep(10.0)
        for _ in range(reps):
            for f, acc in ((f_small, t_small), (f_big, t_big)):
                t0 = time.perf_counter()
                float(f(jnp.float32(0), x))
                acc.append(time.perf_counter() - t0)
        diff = min(t_big) - min(t_small)
        if diff > 0:
            return diff / (k_big - k_small)
    return float("nan")


def frame_take(padded, n, hop, f):
    starts = jnp.arange(f) * hop
    idx = starts[:, None] + jnp.arange(n)[None, :]
    return jnp.take(padded, idx, axis=-1)


def frame_slices(padded, n, hop, f):
    """Gather-free framing: hop-block reshape + R shifted static slices."""
    r = n // hop
    blocks_needed = f + r - 1
    blocks = padded[: blocks_needed * hop].reshape(blocks_needed, hop)
    parts = [blocks[i : i + f] for i in range(r)]
    return jnp.concatenate(parts, axis=-1)


def ola_dus(frames, hop, out_len):
    f, n = frames.shape
    r = n // hop
    hops = frames.reshape(f, r, hop)
    out = jnp.zeros((f + r - 1, hop), dtype=frames.dtype)
    for i in range(r - 1, -1, -1):
        out = out.at[i : i + f, :].add(hops[:, i, :])
    return out.reshape(-1)[:out_len]


def main(seconds=60, n=1024, hop=256):
    sr = 48000
    total = sr * seconds
    f = (total - (n - hop)) // hop
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, total).astype(np.float32))
    frames = jnp.asarray(rng.uniform(-1, 1, (f, n)).astype(np.float32))
    w = jnp.asarray(rng.uniform(0, 1, n).astype(np.float32))
    spec = jnp.fft.rfft(frames[:256], axis=-1)
    spec = jnp.tile(spec, (f // 256 + 1, 1))[:f]
    norm = jnp.abs(jnp.asarray(rng.uniform(0.5, 2, total).astype(np.float32)))

    results = {}
    results["frame_take_ms"] = _time(lambda s: frame_take(s, n, hop, f), x) * 1e3
    results["frame_slices_ms"] = _time(
        lambda s: frame_slices(s, n, hop, f), x
    ) * 1e3
    results["window_mul_ms"] = _time(lambda fr: fr * w, frames) * 1e3
    results["rfft_ms"] = _time(lambda fr: jnp.fft.rfft(fr, axis=-1), frames) * 1e3
    results["irfft_ms"] = _time(
        lambda s: jnp.fft.irfft(s, n=n, axis=-1), spec
    ) * 1e3
    results["ola_dus_ms"] = _time(lambda fr: ola_dus(fr, hop, total), frames) * 1e3
    results["normalize_ms"] = _time(lambda a: a / jnp.maximum(norm, 1e-8), x) * 1e3
    results["frames"] = f
    results["backend"] = jax.default_backend()
    print(json.dumps({k: round(v, 3) if isinstance(v, float) else v
                      for k, v in results.items()}))


def main_pipeline(seconds=60, n=1024, hop=256, only=None):
    """Time the REAL round-trip decomposition (not generic analogs): actual
    framing, the folded DFT matmuls, and the fused OLA drain, plus the full
    round_trip for cross-checking that the stage sum accounts for it.

    Emits one JSON line PER stage as it completes (the remote tunnel can hang
    mid-run; partial results must survive a timeout). `only` restricts to a
    comma-separated stage subset."""
    from ..core.types import StftConfig
    from ..fft import dispatch as _fftd
    from ..fft.matmul_backend import (
        irfft_folded_parts,
        rfft_folded_packed,
        roundtrip_folded_matmul,
    )
    from ..frame.framing import frame_signal
    from ..ola.fused import ola_normalized_auto
    from ..ola.norm import edge_norm
    from ..pipeline import _window_f64, round_trip

    sr = 48000
    total = sr * seconds
    cfg = StftConfig(frame_size=n, hop_size=hop, center=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, total).astype(np.float32))
    w64 = _window_f64(cfg)
    prec = _fftd.to_lax_precision(cfg.fft_precision)

    frames_np = rng.uniform(-1, 1, ((total // hop) + 1, n)).astype(np.float32)
    frames = jnp.asarray(frames_np)
    f = frames.shape[0]
    full = (f - 1) * hop + n
    norm = jnp.asarray(
        edge_norm(np.asarray(w64), hop, f, full).astype(np.float32)
    )
    re_im = rfft_folded_packed(frames, n, jnp.asarray(w64.astype(np.float32)))

    stages = {
        "frame_signal": (lambda s: frame_signal(s, cfg.frame_spec), x),
        "fwd_folded": (
            lambda fr: jnp.concatenate(
                rfft_folded_packed(fr, n, None, prec), axis=-1
            ),
            frames,
        ),
        "inv_folded": (
            lambda p: irfft_folded_parts(
                p[..., : n // 2 + 1], p[..., n // 2 + 1 :], n, prec
            ),
            jnp.concatenate(re_im, axis=-1),
        ),
        "rt_folded": (
            lambda fr: roundtrip_folded_matmul(fr, n, w64, None, prec), frames
        ),
        "ola_fused": (
            lambda fr: ola_normalized_auto(fr, norm, hop, full, 1e-8), frames
        ),
        "round_trip": (lambda s: round_trip(s, cfg), x),
    }
    wanted = set(only.split(",")) if only else set(stages)
    for name, (fn, arg) in stages.items():
        if name not in wanted:
            continue
        ms = _time(fn, arg, reps=7, k_small=40, k_big=200) * 1e3
        print(json.dumps({f"{name}_ms": round(ms, 4), "frames": f,
                          "backend": jax.default_backend()}), flush=True)


if __name__ == "__main__":
    import sys

    if "--pipeline" in sys.argv:
        only = None
        if "--only" in sys.argv:
            only = sys.argv[sys.argv.index("--only") + 1]
        main_pipeline(only=only)
    else:
        main()


# Canonical chain lengths for the sub-0.1 ms stream-block latency stage
# (CLAUDE.md timing hazards: short chains cannot cancel tunnel jitter).
STREAM_LAT_K_SMALL, STREAM_LAT_K_BIG = 20, 220


def stream_block_probe(cfg):
    """(one_block_fn, tail0) for per-hop-block latency timing: ONE hop
    block through the streaming scan step with the carried OLA tail.

    The carry-derived perturbation is threaded into the FRAMES, not just
    the tail: with loop-invariant frames XLA hoists the whole FFT half out
    of a timing chain and only the OLA is measured (observed 1.2 us/block
    vs the real ~15-20 us). Shared by bench.py's co-measurement and the
    suite's bench_streaming so the anti-hoisting trick lives in one place.
    """
    from ..streaming_pipeline import streaming_round_trip_blocks

    n, hop = cfg.frame_size, cfg.hop_size
    rng = np.random.default_rng(2)
    frames1 = jnp.asarray(rng.uniform(-1, 1, (1, 1, n)).astype(np.float32))

    def one_block(tail):
        f1 = frames1 + jnp.sum(tail) * 1e-30
        out_b, tail2 = streaming_round_trip_blocks(
            f1, cfg, 1, None, carry_tail=tail, return_carry=True,
        )
        return tail2 + jnp.sum(out_b) * 1e-30

    return one_block, jnp.zeros(n - hop, jnp.float32)
