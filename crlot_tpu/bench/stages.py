"""Per-stage microbenchmarks of the round-trip pipeline on the current backend.

Times each stage in isolation (reference analog: bench/micro_kernels_benchmark
and performance_benchmark component timings) to locate the bottleneck.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _time(fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2]


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
    results["frame_take_ms"] = _time(
        jax.jit(lambda s: frame_take(s, n, hop, f)), x
    ) * 1e3
    results["frame_slices_ms"] = _time(
        jax.jit(lambda s: frame_slices(s, n, hop, f)), x
    ) * 1e3
    results["window_mul_ms"] = _time(jax.jit(lambda fr: fr * w), frames) * 1e3
    results["rfft_ms"] = _time(
        jax.jit(lambda fr: jnp.fft.rfft(fr, axis=-1)), frames
    ) * 1e3
    results["irfft_ms"] = _time(
        jax.jit(lambda s: jnp.fft.irfft(s, n=n, axis=-1)), spec
    ) * 1e3
    results["ola_dus_ms"] = _time(
        jax.jit(lambda fr: ola_dus(fr, hop, total)), frames
    ) * 1e3
    results["normalize_ms"] = _time(
        jax.jit(lambda a: a / jnp.maximum(norm, 1e-8)), x
    ) * 1e3
    results["frames"] = f
    results["backend"] = jax.default_backend()
    print(json.dumps({k: round(v, 3) if isinstance(v, float) else v
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
