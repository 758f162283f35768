"""Probe: does Mosaic lower an in-kernel int8 MXU dot, and at what rate?

The XLA-level int8x2 DFT path measured at parity with the bf16 HIGH tier:
its 2x MXU saving is spent on limb materialization (int8 operand arrays +
int32 matmul intermediates in HBM). A fused Pallas kernel would erase that
traffic — IF Mosaic lowers int8 dots at the double rate. CLAUDE.md's kernel
cost notes cover bf16/f32 dots only; this measures int8 in-kernel.

Times per-variant in-kernel dots over a [F, 512] x [512, 512] workload,
round-robin interleaved (scripts/compare_rt.py rule).
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

F, N, K = 11264, 512, 512
TILE = 512


def _kernel_bf16(x_ref, b_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        x_ref[...],
        b_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _kernel_i8(x_ref, b_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        x_ref[...],
        b_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def _kernel_i8_3dot(x_ref, x2_ref, b_ref, b2_ref, o_ref):
    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    hh = dot(x_ref[...], b_ref[...])
    hl = dot(x_ref[...], b2_ref[...])
    lh = dot(x2_ref[...], b_ref[...])
    o_ref[...] = hh.astype(jnp.float32) * 128.0 + (hl + lh).astype(
        jnp.float32
    )


def _kernel_i8_fusedq(x_ref, b_ref, b2_ref, o_ref):
    """f32 tile in, quantize IN-KERNEL, 3 int8 dots, f32 out."""
    x = x_ref[...]
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    s = jnp.maximum(amax, 1e-30) / 16256.0
    q = jnp.round(x / s)
    hi = jnp.clip(jnp.round(q * (1.0 / 128.0)), -127, 127)
    lo = q - hi * 128.0
    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    xh = hi.astype(jnp.int8)
    xl = lo.astype(jnp.int8)
    hh = dot(xh, b_ref[...])
    cross = dot(xh, b2_ref[...]) + dot(xl, b_ref[...])
    acc = hh.astype(jnp.float32) * 128.0 + cross.astype(jnp.float32)
    o_ref[...] = acc * (s * 128.0)


def _grid_call(kernel, out_dtype, ins):
    n_in = len(ins)
    grid = (F // TILE,)
    in_specs = [pl.BlockSpec((TILE, N), lambda i: (i, 0))] + [
        pl.BlockSpec((N, K), lambda i: (0, 0)) for _ in range(n_in - 1)
    ]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TILE, K), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((F, K), out_dtype),
    )(*ins)


def _chain(fn, k):
    def chained(s0):
        def body(s, _):
            out = fn(s)
            return jnp.sum(out).astype(jnp.float32) * 1e-30, ()

        c, _ = jax.lax.scan(body, s0, length=k)
        return c

    return jax.jit(chained)


def main() -> None:
    rng = np.random.default_rng(0)
    x_f32 = jnp.asarray(rng.uniform(-1, 1, (F, N)).astype(np.float32))
    x_bf16 = x_f32.astype(jnp.bfloat16)
    b_f32 = rng.uniform(-1, 1, (N, K)).astype(np.float32)
    b_bf16 = jnp.asarray(b_f32).astype(jnp.bfloat16)
    to_i8 = lambda a: jnp.asarray(  # noqa: E731
        np.clip(np.rint(np.asarray(a) * 127), -127, 127).astype(np.int8)
    )
    x_i8, b_i8 = to_i8(x_f32), to_i8(b_f32)
    b2_i8 = to_i8(rng.uniform(-0.5, 0.5, (N, K)).astype(np.float32))

    variants = {
        "pl_bf16": lambda s: _grid_call(
            _kernel_bf16, jnp.float32,
            [x_bf16 + s.astype(jnp.bfloat16), b_bf16],
        ),
        "pl_i8": lambda s: _grid_call(
            _kernel_i8, jnp.int32,
            [x_i8 + (s * 0).astype(jnp.int8) + jnp.int8(1), b_i8],
        ),
        "pl_i8_3dot": lambda s: _grid_call(
            _kernel_i8_3dot, jnp.float32,
            [x_i8 + (s * 0).astype(jnp.int8) + jnp.int8(1), x_i8, b_i8,
             b2_i8],
        ),
        "pl_i8_fusedq": lambda s: _grid_call(
            _kernel_i8_fusedq, jnp.float32, [x_f32 + s, b_i8, b2_i8]
        ),
    }

    k_small, k_big, reps = 40, 200, 8
    fns = {}
    for name, fn in variants.items():
        try:
            f_s, f_b = _chain(fn, k_small), _chain(fn, k_big)
            float(f_s(jnp.float32(0)))
            float(f_b(jnp.float32(0)))
            fns[name] = (f_s, f_b)
        except Exception as e:  # noqa: BLE001 — report unlowered variants
            print(json.dumps({"variant": name, "error": str(e)[-300:]}),
                  flush=True)
    print(json.dumps({"compiled": list(fns)}), flush=True)

    acc = {name: ([], []) for name in fns}
    for _ in range(reps):
        for name, (f_s, f_b) in fns.items():
            for idx, f in ((0, f_s), (1, f_b)):
                t0 = time.perf_counter()
                float(f(jnp.float32(0)))
                acc[name][idx].append(time.perf_counter() - t0)
    flops = 2.0 * F * N * K
    for name, (ts, tb) in acc.items():
        per = max((min(tb) - min(ts)) / (k_big - k_small), 1e-12)
        print(json.dumps({
            "variant": name,
            "us_per_call": round(per * 1e6, 2),
            "tflops_1dot": round(flops / per / 1e12, 1),
            "backend": jax.default_backend(),
        }), flush=True)


if __name__ == "__main__":
    main()
