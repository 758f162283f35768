"""Measure fused round-trip kernel variants vs the XLA folded path on TPU.

Each variant is the FULL round-trip (pad -> frames/kernel -> OLA -> slice),
timed with the in-jit chain method (bench/stages._time). Emits one JSON line
per variant as it completes so partial results survive tunnel hangs.

Usage: python scripts/tune_rt.py [--only name1,name2] [--seconds 60]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from crlot_tpu.bench.stages import _time  # noqa: E402
from crlot_tpu.core.padding import pad_signal  # noqa: E402
from crlot_tpu.core.types import StftConfig  # noqa: E402
from crlot_tpu.fft.pallas_rt import (  # noqa: E402
    roundtrip_frames_fused,
    roundtrip_signal_fused,
)
from crlot_tpu.metrics import snr_db  # noqa: E402
from crlot_tpu.ola.fused import ola_normalized_auto  # noqa: E402
from crlot_tpu.pipeline import _norm_np, _window_f64, round_trip  # noqa: E402


def main() -> None:
    seconds = 60
    if "--seconds" in sys.argv:
        seconds = int(sys.argv[sys.argv.index("--seconds") + 1])
    only = None
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))

    n, hop = 1024, 256
    cfg = StftConfig(frame_size=n, hop_size=hop, center=True)
    sr = 48000
    total = sr * seconds
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-0.9, 0.9, total).astype(np.float32))

    spec = cfg.frame_spec
    num_frames = spec.num_frames(total)
    w64 = _window_f64(cfg)
    full = (num_frames - 1) * hop + n
    norm = jnp.asarray(_norm_np(cfg, num_frames, full))
    pad = spec.pad_amount

    def fused_rt(flip_mm):
        def fn(s):
            padded = pad_signal(s, pad, pad, spec.pad_mode, spec.pad_value)
            frames = roundtrip_frames_fused(
                padded, n, hop, num_frames, w64, flip_mm=flip_mm
            )
            out = ola_normalized_auto(frames, norm, hop, full, cfg.eps)
            return out[..., pad : pad + total]

        return fn

    def fullfused(s):
        padded = pad_signal(s, pad, pad, spec.pad_mode, spec.pad_value)
        out = roundtrip_signal_fused(
            padded, n, hop, num_frames, w64, norm, cfg.eps
        )
        return out[..., pad : pad + total]

    from crlot_tpu.fft import dispatch as _fftd
    from crlot_tpu.fft.matmul_backend import roundtrip_folded_matmul
    from crlot_tpu.frame.framing import frame_signal

    prec = _fftd.to_lax_precision(cfg.fft_precision)

    def xla_rt(rt_fn):
        def fn(s):
            frames = frame_signal(s, spec)
            out_frames = rt_fn(frames, n, w64, None, prec)
            out = ola_normalized_auto(out_frames, norm, hop, full, cfg.eps)
            return out[..., pad : pad + total]

        return fn

    variants = {
        "rt_pipeline_default": lambda s: round_trip(s, cfg),
        "rt_xla_folded": xla_rt(roundtrip_folded_matmul),
        "rt_fused_flipmm": fused_rt(True),
        "rt_fused_fbx": fused_rt(False),
        "rt_fullfused": fullfused,
    }
    for name, fn in variants.items():
        if only and name not in only:
            continue
        y = jax.jit(fn)(x)
        snr = float(snr_db(np.asarray(x), np.asarray(y)))
        ms = _time(fn, x, reps=10, k_small=8, k_big=48) * 1e3
        print(
            json.dumps(
                {
                    "variant": name,
                    "ms": round(ms, 4),
                    "gsamples_per_s": round(total / ms / 1e6, 3),
                    "snr_db": round(snr, 1),
                    "backend": jax.default_backend(),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
