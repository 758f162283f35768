"""Interleaved round-robin comparison of round-trip variants on the TPU.

All variants' chains are timed in a single rotating schedule so every
variant samples the same tunnel-contention windows; per-variant device time
is min(t_big) - min(t_small) over the whole run. This is the only reliable
way to RANK implementations on the flaky tunnel (separate runs land in
different windows and can differ 2x for identical code).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from crlot_tpu.core.padding import pad_signal  # noqa: E402
from crlot_tpu.core.types import StftConfig  # noqa: E402
from crlot_tpu.fft import dispatch as _fftd  # noqa: E402
from crlot_tpu.fft.matmul_backend import (  # noqa: E402
    roundtrip_folded_matmul,
    roundtrip_folded_quad,
    roundtrip_folded_tiled,
)
from crlot_tpu.fft.pallas_rt import roundtrip_signal_fused  # noqa: E402
from crlot_tpu.frame.framing import frame_signal  # noqa: E402
from crlot_tpu.ola.fused import ola_normalized_auto  # noqa: E402
from crlot_tpu.pipeline import _norm_np, _window_f64  # noqa: E402

K_SMALL, K_BIG = 10, 60
ROUNDS = (
    int(sys.argv[sys.argv.index("--rounds") + 1])
    if "--rounds" in sys.argv
    else 12
)


def build_chain(fn, k):
    def chained(s0, xx):
        def body(s, _):
            out = fn(xx + s)
            return jnp.sum(out).astype(jnp.float32) * 1e-30, ()

        c, _ = jax.lax.scan(body, s0, length=k)
        return c

    return jax.jit(chained)


def main() -> None:
    n, hop = 1024, 256
    if "--nhop" in sys.argv:  # e.g. --nhop 256,64 (r5 small-hop gate work)
        n, hop = map(int, sys.argv[sys.argv.index("--nhop") + 1].split(","))
    seconds = 60
    if "--seconds" in sys.argv:
        seconds = int(sys.argv[sys.argv.index("--seconds") + 1])
    cfg = StftConfig(frame_size=n, hop_size=hop, center=True)
    total = 48000 * seconds
    rng = np.random.default_rng(0)
    x = np.asarray(rng.uniform(-0.9, 0.9, total).astype(np.float32))

    spec = cfg.frame_spec
    num_frames = spec.num_frames(total)
    w64 = _window_f64(cfg)
    full = (num_frames - 1) * hop + n
    norm = jnp.asarray(_norm_np(cfg, num_frames, full))
    pad = spec.pad_amount
    prec = _fftd.to_lax_precision(cfg.fft_precision)

    def xla_rt(rt_fn):
        def fn(s):
            frames = frame_signal(s, spec)
            out_frames = rt_fn(frames, n, w64, None, prec)
            out = ola_normalized_auto(out_frames, norm, hop, full, cfg.eps)
            return out[..., pad : pad + total]

        return fn

    def fullfused(s):
        padded = pad_signal(s, pad, pad, spec.pad_mode, spec.pad_value)
        out = roundtrip_signal_fused(
            padded, n, hop, num_frames, w64, norm, cfg.eps
        )
        return out[..., pad : pad + total]

    def fullfused_tile(tb):
        def fn(s):
            padded = pad_signal(s, pad, pad, spec.pad_mode, spec.pad_value)
            out = roundtrip_signal_fused(
                padded, n, hop, num_frames, w64, norm, cfg.eps, tile=tb
            )
            return out[..., pad : pad + total]

        return fn

    def tiled_jnp_ola(s):
        from crlot_tpu.ola.reference import normalize, overlap_add

        frames = frame_signal(s, spec)
        out_frames = roundtrip_folded_tiled(frames, n, w64, None, prec)
        acc = overlap_add(out_frames, hop, full)
        out = normalize(acc, norm[:full], cfg.eps)
        return out[..., pad : pad + total]

    def int8_rt(s):
        from crlot_tpu.fft.int8_backend import roundtrip_folded_tiled_i8

        frames = frame_signal(s, spec)
        out_frames = roundtrip_folded_tiled_i8(frames, n, w64, None)
        out = ola_normalized_auto(out_frames, norm, hop, full, cfg.eps)
        return out[..., pad : pad + total]

    def composed_eq(s):
        from crlot_tpu.fft.matmul_backend import roundtrip_composed_matmul

        gains = 10 ** np.linspace(-0.5, 0.5, n // 2 + 1)
        frames = frame_signal(s, spec)
        out_frames = roundtrip_composed_matmul(
            frames, n, w64, gains, precision=prec
        )
        out = ola_normalized_auto(out_frames, norm, hop, full, cfg.eps)
        return out[..., pad : pad + total]

    def composed_conv_eq(s):
        from crlot_tpu.core.padding import pad_signal
        from crlot_tpu.fft.matmul_backend import roundtrip_composed_conv

        gains = 10 ** np.linspace(-0.5, 0.5, n // 2 + 1)
        padded = pad_signal(s, pad, pad, spec.pad_mode, spec.pad_value)
        out_frames = roundtrip_composed_conv(
            padded, n, hop, num_frames, w64, gains, precision=prec
        )
        out = ola_normalized_auto(out_frames, norm, hop, full, cfg.eps)
        return out[..., pad : pad + total]

    def quad_eq(s):
        gains = 10 ** np.linspace(-0.5, 0.5, n // 2 + 1)
        frames = frame_signal(s, spec)
        out_frames = roundtrip_folded_quad(
            frames, n, w64, None, prec, per_bin_gains_f64=gains
        )
        out = ola_normalized_auto(out_frames, norm, hop, full, cfg.eps)
        return out[..., pad : pad + total]

    def blocked_eq_g(g):
        def fn(s):
            from crlot_tpu.fft.matmul_backend import (
                roundtrip_composed_blocked,
            )

            gains = 10 ** np.linspace(-0.5, 0.5, n // 2 + 1)
            padded = pad_signal(s, pad, pad, spec.pad_mode, spec.pad_value)
            acc = roundtrip_composed_blocked(
                padded, n, hop, num_frames, w64, gains, precision=prec,
                group=g,
            )
            out = acc / jnp.maximum(norm, cfg.eps)
            return out[..., pad : pad + total]

        return fn

    blocked_eq = blocked_eq_g(1)

    def blocked_id_g(g):
        # Identity response through the blocked kernel: same output as the
        # tiled identity round-trip (within tier) at HALF the FLOPs
        # ((R+G-2)*hop+N = 2048 MACs/sample vs ~4100) and ~6x the
        # arithmetic intensity — the candidate for keeping MXU duty in
        # half-rate windows where the balanced tiled path loses overlap
        # (verdict r3 item 2).
        def fn(s):
            from crlot_tpu.fft.matmul_backend import (
                roundtrip_composed_blocked,
            )

            ones = np.ones(n // 2 + 1)
            padded = pad_signal(s, pad, pad, spec.pad_mode, spec.pad_value)
            acc = roundtrip_composed_blocked(
                padded, n, hop, num_frames, w64, ones, precision=prec,
                group=g,
            )
            out = acc / jnp.maximum(norm, cfg.eps)
            return out[..., pad : pad + total]

        return fn

    def blocked_stream_g(k_chunks):
        # r5: the chunked BLOCKED stream (halo-extended segs, scan of pure
        # hop-block chunk matmuls — the BlockedChunkStreamer's device
        # program) ranked against the one-shot blocked kernel in the SAME
        # windows: quantifies what chunking costs on top of the headline.
        from crlot_tpu.core.types import FftBackend
        from crlot_tpu.fft.matmul_backend import hopblock_apply
        from crlot_tpu.streaming_pipeline import (
            _blocked_stream_consts,
            _resolve_blocked_per_bin,
        )

        cfgb = StftConfig(
            frame_size=n, hop_size=hop, center=False,
            fft_backend=FftBackend.MATMUL,
        )
        rb = _resolve_blocked_per_bin(cfgb, None)
        c = _blocked_stream_consts(cfgb, rb)
        gh, edge, rctx = c["gh"], c["edge"], c["right_ctx"]
        chunk = (total // k_chunks // gh) * gh
        span = edge + chunk + rctx
        kern = jnp.asarray(c["kern"])

        def fn(s):
            sp = jnp.pad(s[: chunk * k_chunks], (edge, rctx))
            segs = jnp.stack([
                jax.lax.dynamic_slice(sp, (i * chunk,), (span,))
                for i in range(k_chunks)
            ])

            def step(cr, seg):
                return cr, hopblock_apply(seg, kern, gh, chunk, 0, prec)

            _, ys = jax.lax.scan(step, jnp.float32(0), segs)
            return ys.reshape(-1)

        return fn

    def blocked_id_nf(s):
        # Norm-folded blocked identity: 1/COLA-norm folded into the kernel
        # at f64 design time — no norm read, no division pass over the
        # interior (edges divide by the true edge norm inside the patch).
        from crlot_tpu.fft.matmul_backend import roundtrip_composed_blocked
        from crlot_tpu.ola.norm import edge_norm

        ones = np.ones(n // 2 + 1)
        nf64 = edge_norm(w64, hop, num_frames, full)
        padded = pad_signal(s, pad, pad, spec.pad_mode, spec.pad_value)
        out = roundtrip_composed_blocked(
            padded, n, hop, num_frames, w64, ones, precision=prec,
            group=2, norm_f64=nf64, eps=cfg.eps,
        )
        return out[..., pad : pad + total]

    def split2_tiled(s):
        # Two independent half-batch tiled streams in one program — the
        # verdict's suggested restructure: gives XLA's scheduler two
        # dependency chains whose elementwise passes could interleave with
        # the other chain's matmuls (if inter-op overlap exists at all).
        frames = frame_signal(s, spec)
        f2 = frames.shape[-2] // 2
        a = roundtrip_folded_tiled(frames[..., :f2, :], n, w64, None, prec)
        b = roundtrip_folded_tiled(frames[..., f2:, :], n, w64, None, prec)
        out_frames = jnp.concatenate([a, b], axis=-2)
        out = ola_normalized_auto(out_frames, norm, hop, full, cfg.eps)
        return out[..., pad : pad + total]

    def tiled_eq(s):
        gains = 10 ** np.linspace(-0.5, 0.5, n // 2 + 1)
        frames = frame_signal(s, spec)
        out_frames = roundtrip_folded_tiled(
            frames, n, w64, None, prec, per_bin_gains_f64=gains
        )
        out = ola_normalized_auto(out_frames, norm, hop, full, cfg.eps)
        return out[..., pad : pad + total]

    # --- NONLINEAR per-bin fn (verdict r3 item 3): the slot that cannot
    # compose into the blocked kernel. tiled_mask = the pipeline's current
    # packed-plane XLA route; fullfused_mask = the Pallas kernel applying
    # the fn IN VMEM (spectrum never reaches HBM).
    from crlot_tpu.spectral import noise_gate

    _gate = noise_gate(-40.0, attenuation_db=-30.0)

    def tiled_mask(s):
        from crlot_tpu.fft.matmul_backend import (
            irfft_folded_tiled_parts,
            packed_to_tiled_parts,
            rfft_folded_tiled_parts,
            tiled_parts_to_packed,
        )

        frames = frame_signal(s, spec)
        w32 = jnp.asarray(np.asarray(w64, np.float32))
        re512, re_nyq, im_eff = rfft_folded_tiled_parts(frames, n, w32, prec)
        re, im = _gate.packed(*tiled_parts_to_packed(re512, re_nyq, im_eff))
        out_frames = irfft_folded_tiled_parts(
            *packed_to_tiled_parts(re, im, n), n, prec
        )
        out = ola_normalized_auto(out_frames, norm, hop, full, cfg.eps)
        return out[..., pad : pad + total]

    def fullfused_mask_tile(tb):
        def fn(s):
            padded = pad_signal(s, pad, pad, spec.pad_mode, spec.pad_value)
            out = roundtrip_signal_fused(
                padded, n, hop, num_frames, w64, norm, cfg.eps, tile=tb,
                spectral_packed=_gate.packed,
            )
            return out[..., pad : pad + total]

        return fn

    variants = {
        "xla_folded": xla_rt(roundtrip_folded_matmul),
        "xla_tiled": xla_rt(roundtrip_folded_tiled),
        "xla_quad": xla_rt(roundtrip_folded_quad),
        "quad_eq": quad_eq,
        "int8_tiled": int8_rt,
        "composed_eq": composed_eq,
        "blocked_eq": blocked_eq,
        "blocked2_eq": blocked_eq_g(2),
        "blocked3_eq": blocked_eq_g(3),
        "blocked6_eq": blocked_eq_g(6),
        "composed_conv_eq": composed_conv_eq,
        "tiled_eq": tiled_eq,
        "blocked2_id": blocked_id_g(2),
        "blocked3_id": blocked_id_g(3),
        "blocked6_id": blocked_id_g(6),
        "blocked10_id": blocked_id_g(10),
        "blocked2_id_nf": blocked_id_nf,
        "blocked_stream4": blocked_stream_g(4),
        "blocked_stream8": blocked_stream_g(8),
        "split2_tiled": split2_tiled,
        "xla_tiled_jnp_ola": tiled_jnp_ola,
        "fullfused": fullfused,
        "fullfused_t120": fullfused_tile(120),
        "fullfused_t240": fullfused_tile(240),
        "fullfused_t504": fullfused_tile(504),
        "tiled_mask": tiled_mask,
        "fullfused_mask": fullfused_mask_tile(128),
        "fullfused_mask_t240": fullfused_mask_tile(240),
        "fullfused_mask_t504": fullfused_mask_tile(504),
    }
    if "--only" in sys.argv:
        keep = set(sys.argv[sys.argv.index("--only") + 1].split(","))
        variants = {k: v for k, v in variants.items() if k in keep}

    chains = {}
    for name, fn in variants.items():
        chains[name] = (build_chain(fn, K_SMALL), build_chain(fn, K_BIG))
        for c in chains[name]:
            float(c(jnp.float32(0), x))  # compile + warm
    print(json.dumps({"compiled": list(chains)}), flush=True)

    from crlot_tpu.profiling import roofline_samples_per_sec

    # Cap at the hardest physical ceiling across formulations: the COMPUTE
    # bound (FLOP counts are exact, MXU peak is hardware; only the byte
    # model is conservative). 5% slack for measurement jitter.
    cap = 1.05 * max(
        roofline_samples_per_sec(n, hop, formulation=form)[
            "compute_bound_samples_per_sec"]
        for form in ("framed", "blocked")
    )
    t = {name: ([], []) for name in chains}
    for _ in range(ROUNDS):
        for name, (cs, cb) in chains.items():
            for idx, c in ((0, cs), (1, cb)):
                t0 = time.perf_counter()
                float(c(jnp.float32(0), x))
                t[name][idx].append(time.perf_counter() - t0)

    # Pairwise per-round wins: within one round every variant samples
    # near-adjacent seconds of the same window, so the sign of the
    # per-round (t_big - t_small) comparison is far more regime-robust
    # than cross-run minima (which flip when service fluctuates mid-run).
    names = list(chains)
    per_round = {
        name: [
            tb - ts for ts, tb in zip(t[name][0], t[name][1])
        ] for name in names
    }
    wins = {}
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            w = l = 0
            for da, db in zip(per_round[a], per_round[b]):
                if da > 0 and db > 0:
                    if da < db:
                        w += 1
                    elif db < da:
                        l += 1
            wins[f"{a} vs {b}"] = f"{w}-{l}"
    print(json.dumps({"pairwise_round_wins": wins}), flush=True)
    for name, (ts, tb) in t.items():
        diff = min(tb) - min(ts)
        # Never clamp a non-positive difference (minima in different tunnel
        # windows): report NaN instead of fabricating throughput.
        ms = diff / (K_BIG - K_SMALL) * 1e3 if diff > 0 else float("nan")
        rec = {
            "variant": name,
            "ms": round(ms, 4) if ms == ms else ms,
            "gsamples_per_s": (
                round(total / ms / 1e6, 3) if ms == ms else ms
            ),
            "min_small_ms": round(min(ts) * 1e3, 1),
            "min_big_ms": round(min(tb) * 1e3, 1),
        }
        # A positive-but-tiny difference can still be a cross-window artifact
        # (same failure mode bench.py rejects): flag anything implying
        # faster-than-hardware throughput instead of letting it rank.
        if ms == ms and total / (ms / 1e3) > cap:
            rec["suspect_above_roofline"] = True
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
