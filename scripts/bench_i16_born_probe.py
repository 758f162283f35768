"""Probe (r5, verdict r4 item 8): does a BORN-int16 wire buffer make an
integer DFT tier pay?

The int8 tier's killer was the f32->int8 quantize: a layout change
((8,128) -> (32,128) tiling) costing more than the dot it fed (CLAUDE.md,
scripts/bench_int8_probe.py). Wire audio arrives int16 ON DEVICE, so the
question becomes: is int16 -> two-int8-limbs (a (16,128) -> (32,128)
change, plus shifts) cheap enough that int8 blocked-kernel dots beat the
f32 dequant + HIGH-tier blocked kernel?

Variants (round-robin interleaved, compare_rt rules):
  i16_f32_blocked   int16 -> f32 dequant -> headline blocked kernel (HIGH)
  i16_i8x1_blocked  int16 -> exact hi/lo int8 limbs -> 2 int8 dots per
                    m-term against an 8-bit kernel (throughput ceiling;
                    ~7-bit kernel => SNR well below the 60 dB gate —
                    recorded to show the conversion economics only)
  i16_i8x2_blocked  same limbs against a two-limb ~15-bit kernel
                    (4 int8 dots; the accuracy-viable shape)
  conv_f32 / conv_i8x2  conversion-only chains (isolate the layout cost)

Prints one JSON line per variant; run on the TPU under timeout.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from crlot_tpu.core.types import FftBackend, StftConfig
from crlot_tpu.fft import dispatch as _fftd
from crlot_tpu.streaming_pipeline import (
    _blocked_stream_consts,
    _resolve_blocked_per_bin,
)

K_SMALL, K_BIG = 8, 40
ROUNDS = (
    int(sys.argv[sys.argv.index("--rounds") + 1])
    if "--rounds" in sys.argv
    else 10
)
SECONDS = (
    int(sys.argv[sys.argv.index("--seconds") + 1])
    if "--seconds" in sys.argv
    else 30
)


def _chain(fn, k):
    def chained(s0, xx):
        def body(s, _):
            out = fn(xx + s.astype(xx.dtype))
            return (
                jnp.sum(out.astype(jnp.float32)).astype(jnp.float32) * 1e-30,
                (),
            )

        c, _ = jax.lax.scan(body, s0, length=k)
        return c

    return jax.jit(chained)


def main() -> None:
    n, hop = 1024, 256
    cfg = StftConfig(
        frame_size=n, hop_size=hop, center=False,
        fft_backend=FftBackend.MATMUL,
    )
    rb = _resolve_blocked_per_bin(cfg, None)
    c = _blocked_stream_consts(cfg, rb)
    gh, edge, rctx = c["gh"], c["edge"], c["right_ctx"]
    kern = np.asarray(c["kern"])  # [mg*gh, gh] f32, norm-folded identity
    mg = kern.shape[0] // gh
    prec = _fftd.to_lax_precision(cfg.fft_precision)

    total = (48000 * SECONDS // gh) * gh
    rng = np.random.default_rng(0)
    x_f = rng.uniform(-0.9, 0.9, total)
    x_i16 = np.clip(np.rint(x_f * 32768.0), -32768, 32767).astype(np.int16)
    xj = jnp.asarray(x_i16)

    kj = jnp.asarray(kern)
    # 8-bit kernel (single limb) and two-limb ~15-bit kernel.
    kmax = float(np.max(np.abs(kern)))
    s1 = kmax / 127.0
    k_i8 = jnp.asarray(np.clip(np.rint(kern / s1), -127, 127).astype(np.int8))
    s2 = kmax / 16256.0  # 127*128: two-limb range
    kq = np.clip(np.rint(kern / s2), -16256, 16256).astype(np.int32)
    k_hi = jnp.asarray(np.round(kq / 128.0).astype(np.int8))
    k_lo = jnp.asarray((kq - np.round(kq / 128.0).astype(np.int32) * 128)
                       .astype(np.int8))

    def limbs(xi16):
        lo = ((xi16.astype(jnp.int32) + 128) & 0xFF) - 128
        hi = (xi16.astype(jnp.int32) - lo) >> 8
        return hi.astype(jnp.int8), lo.astype(jnp.int8)

    def blocks_of(v, nb):
        return v.reshape(v.shape[:-1] + (nb, gh))

    def hop_terms(xv, kmat, dot):
        """m-ordered accumulation of the blocked kernel terms, shared by
        every variant (mirrors matmul_backend.hopblock_apply)."""
        nb = total // gh
        acc = None
        for m in range(mg):
            sl = xv[..., m * gh : m * gh + nb * gh]
            term = dot(blocks_of(sl, nb), kmat[m * gh : (m + 1) * gh, :], m)
            acc = term if acc is None else acc + term
        return acc

    def f32_blocked(xi16):
        xf = xi16.astype(jnp.float32) * jnp.float32(1.0 / 32768.0)
        xe = jnp.pad(xf, (edge, rctx))
        return hop_terms(
            xe, kj,
            lambda a, b, m: jnp.dot(a, b, precision=prec),
        )

    def i8_dot(a, b):
        return jax.lax.dot_general(
            a, b, (((a.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    def i8x1_blocked(xi16):
        hi, lo = limbs(jnp.pad(xi16, (edge, rctx)))
        acc = hop_terms(
            hi, k_i8, lambda a, b, m: i8_dot(a, b) << 8
        ) + hop_terms(lo, k_i8, lambda a, b, m: i8_dot(a, b))
        return acc.astype(jnp.float32) * jnp.float32(s1 / 32768.0)

    def i8x2_blocked(xi16):
        hi, lo = limbs(jnp.pad(xi16, (edge, rctx)))
        a = (hop_terms(hi, k_hi, lambda a_, b_, m: i8_dot(a_, b_))
             .astype(jnp.float32) * jnp.float32(128.0 * 256.0))
        b = (hop_terms(lo, k_hi, lambda a_, b_, m: i8_dot(a_, b_))
             .astype(jnp.float32) * jnp.float32(128.0))
        d = (hop_terms(hi, k_lo, lambda a_, b_, m: i8_dot(a_, b_))
             .astype(jnp.float32) * jnp.float32(256.0))
        e = (hop_terms(lo, k_lo, lambda a_, b_, m: i8_dot(a_, b_))
             .astype(jnp.float32))
        return (a + b + d + e) * jnp.float32(s2 / 32768.0)

    def conv_f32(xi16):
        return xi16.astype(jnp.float32) * jnp.float32(1.0 / 32768.0)

    def conv_i8x2(xi16):
        hi, lo = limbs(xi16)
        return hi.astype(jnp.int32) + lo.astype(jnp.int32)

    variants = {
        "i16_f32_blocked": f32_blocked,
        "i16_i8x1_blocked": i8x1_blocked,
        "i16_i8x2_blocked": i8x2_blocked,
        "conv_f32": conv_f32,
        "conv_i8x2": conv_i8x2,
    }

    # Accuracy snapshot (interior; identity kernel): what each tier's
    # round-trip SNR would be.
    ref = x_f[: total].astype(np.float32)
    for name in ("i16_f32_blocked", "i16_i8x1_blocked", "i16_i8x2_blocked"):
        y = np.asarray(jax.jit(variants[name])(xj)).reshape(-1)[:total]
        err = y[edge:-edge] - ref[edge:-edge]
        snr = float(10 * np.log10(
            np.sum(ref[edge:-edge].astype(np.float64) ** 2)
            / max(float(np.sum(err.astype(np.float64) ** 2)), 1e-30)
        ))
        print(json.dumps({"variant": name, "interior_snr_db": round(snr, 1)}),
              flush=True)

    chains = {}
    for name, fn in variants.items():
        chains[name] = (_chain(fn, K_SMALL), _chain(fn, K_BIG))
        for ch in chains[name]:
            float(ch(jnp.float32(0), xj))
    print(json.dumps({"compiled": list(chains)}), flush=True)

    t = {name: ([], []) for name in chains}
    for _ in range(ROUNDS):
        for name, (cs, cb) in chains.items():
            for idx, ch in ((0, cs), (1, cb)):
                t0 = time.perf_counter()
                float(ch(jnp.float32(0), xj))
                t[name][idx].append(time.perf_counter() - t0)
    for name, (ts, tb) in t.items():
        diff = min(tb) - min(ts)
        ms = diff / (K_BIG - K_SMALL) * 1e3 if diff > 0 else float("nan")
        print(json.dumps({
            "variant": name,
            "ms": round(ms, 4) if ms == ms else ms,
            "gsamples_per_s": round(total / ms / 1e6, 3) if ms == ms else ms,
        }), flush=True)


if __name__ == "__main__":
    main()
