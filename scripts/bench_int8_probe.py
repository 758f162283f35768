"""Probe: is an int8 MXU matmul actually ~2x the bf16 rate on this chip?

Times [F, 512] @ [512, 512] dots across input tiers, round-robin interleaved
(same contention windows for every variant — scripts/compare_rt.py rule).
If int8 wins ~2x over one bf16 pass, an int8x2 split DFT (3 int8 passes,
exact int32 accumulation, ~15-bit operands) can halve the round-trip's MXU
time vs the HIGH tier (3 bf16 passes) at >60 dB SNR.

Usage: python scripts/bench_int8_probe.py  (runs on the default backend)
"""

from __future__ import annotations

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

F, N, K = 11264, 512, 512


def _chain(body_fn, k):
    def chained(s0, xx):
        def body(s, _):
            out = body_fn(xx, s)
            return jnp.sum(out).astype(jnp.float32) * 1e-30, ()

        c, _ = jax.lax.scan(body, s0, length=k)
        return c

    return jax.jit(chained)


def main() -> None:
    rng = np.random.default_rng(0)
    x_f32 = jnp.asarray(rng.uniform(-1, 1, (F, N)).astype(np.float32))
    b_f32 = jnp.asarray(rng.uniform(-1, 1, (N, K)).astype(np.float32))
    x_bf16 = x_f32.astype(jnp.bfloat16)
    b_bf16 = b_f32.astype(jnp.bfloat16)
    x_i8 = jnp.asarray(
        np.clip(np.round(np.asarray(x_f32) * 127), -127, 127).astype(np.int8)
    )
    b_i8 = jnp.asarray(
        np.clip(np.round(np.asarray(b_f32) * 127), -127, 127).astype(np.int8)
    )

    def dot(a, b, prec=None, pref=jnp.float32):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            precision=prec, preferred_element_type=pref,
        )

    def _q2(x):
        amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
        ss = jnp.maximum(amax, 1e-30) / 16256.0
        q = jnp.round(x / ss)
        hi = jnp.clip(jnp.round(q * (1.0 / 128.0)), -127, 127)
        lo = q - hi * 128.0
        return hi.astype(jnp.int8), lo.astype(jnp.int8)

    variants = {
        # perturb input with the carry so the scan body can't be hoisted
        "bf16_1pass": lambda xx, s: dot(
            x_bf16 + s.astype(jnp.bfloat16), b_bf16
        ),
        "f32_high_3pass": lambda xx, s: dot(
            x_f32 + s, b_f32, jax.lax.Precision.HIGH
        ),
        "int8_1pass": lambda xx, s: dot(
            x_i8 + (s * 0).astype(jnp.int8) + jnp.int8(1), b_i8,
            pref=jnp.int32,
        ),
        # distinct additive constants per dot so XLA cannot CSE them into one
        "int8_3pass": lambda xx, s: (
            dot(x_i8 + (s * 0).astype(jnp.int8) + jnp.int8(1), b_i8,
                pref=jnp.int32)
            + dot(x_i8 + jnp.int8(2), b_i8, pref=jnp.int32)
            + dot(x_i8 + jnp.int8(3), b_i8, pref=jnp.int32)
        ),
        # isolate the f32 -> int8 quantize/convert/relayout cost
        "convert_only": lambda xx, s: (
            (x_f32 + s).astype(jnp.int8).astype(jnp.int32)
        ),
        "quantize_2limb": lambda xx, s: (
            lambda hl: hl[0].astype(jnp.int32) + hl[1]
        )(_q2(x_f32 + s)),
        # quantize inside the timed body, then one hi@hi dot: the real
        # end-to-end cost of an int8 dot fed from f32 data
        "int8_1pass_from_f32": lambda xx, s: dot(
            _q2(x_f32 + s)[0], b_i8, pref=jnp.int32
        ),
    }

    k_small, k_big, reps = 100, 600, 6
    fns = {}
    for name, fn in variants.items():
        try:
            f_s, f_b = _chain(fn, k_small), _chain(fn, k_big)
            float(f_s(jnp.float32(0), 0.0))
            float(f_b(jnp.float32(0), 0.0))
            fns[name] = (f_s, f_b)
        except Exception as e:  # noqa: BLE001 — report unlowered variants
            print(json.dumps({"variant": name, "error": str(e)[:200]}),
                  flush=True)

    acc = {name: ([], []) for name in fns}
    for _ in range(reps):
        for name, (f_s, f_b) in fns.items():
            t0 = time.perf_counter()
            float(f_s(jnp.float32(0), 0.0))
            acc[name][0].append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(f_b(jnp.float32(0), 0.0))
            acc[name][1].append(time.perf_counter() - t0)
    flops = 2.0 * F * N * K
    for name, (ts, tb) in acc.items():
        per = max((min(tb) - min(ts)) / (k_big - k_small), 1e-12)
        print(json.dumps({
            "variant": name,
            "us_per_dot": round(per * 1e6, 2),
            "tflops": round(flops / per / 1e12, 1),
            "backend": jax.default_backend(),
        }), flush=True)


if __name__ == "__main__":
    main()
