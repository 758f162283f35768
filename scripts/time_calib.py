"""Calibrate the chain-timing method on the live tunnel: print RAW wall
times for interleaved chain lengths so slow/fast tunnel windows are visible.

t(k) should be a + b*k; if interleaved samples at the same k differ by more
than b*dk, the two-point difference method is unreliable at that spacing.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from crlot_tpu.core.types import StftConfig  # noqa: E402
from crlot_tpu.pipeline import round_trip  # noqa: E402


def main() -> None:
    n, hop = 1024, 256
    cfg = StftConfig(frame_size=n, hop_size=hop, center=True)
    total = 48000 * 60
    rng = np.random.default_rng(0)
    x = np.asarray(rng.uniform(-0.9, 0.9, total).astype(np.float32))
    fn = lambda s: round_trip(s, cfg)  # noqa: E731

    def chained(k):
        def run(s0, xx):
            def body(s, _):
                out = fn(xx + s)
                return jnp.sum(out).astype(jnp.float32) * 1e-30, ()

            c, _ = jax.lax.scan(body, s0, length=k)
            return c

        f = jax.jit(run)
        float(f(jnp.float32(0), x))  # compile+warm
        return f

    ks = [4, 24, 100]
    fs = {k: chained(k) for k in ks}
    for rep in range(6):
        row = {}
        for k in ks:
            t0 = time.perf_counter()
            float(fs[k](jnp.float32(0), x))
            row[k] = (time.perf_counter() - t0) * 1e3
        print(
            {f"t{k}_ms": round(v, 2) for k, v in row.items()}
            | {
                "b_4_24": round((row[24] - row[4]) / 20, 4),
                "b_24_100": round((row[100] - row[24]) / 76, 4),
            },
            flush=True,
        )


if __name__ == "__main__":
    main()
