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
import time

import numpy as np

BASELINE_SAMPLES_PER_SEC = 48000 / 0.90e-3  # reference e2e: 0.90 ms / 1 s audio


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

    fn = jax.jit(lambda s: round_trip(s, cfg))
    y = fn(x)
    y.block_until_ready()  # compile + warm-up

    # Correctness gate before timing (the reference shipped a benchmark that
    # was failing its own SNR target; we refuse to report perf on bad audio).
    snr = snr_db(np.asarray(x), np.asarray(y))
    assert snr > 60.0, f"round-trip SNR {snr:.1f} dB < 60 dB gate"

    reps = 20
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(x).block_until_ready()
        times.append(time.perf_counter() - t0)
    best = min(times)
    median = sorted(times)[len(times) // 2]
    samples_per_sec = total / median

    print(
        json.dumps(
            {
                "metric": "stft_istft_ola_roundtrip_throughput_n1024_h256",
                "value": round(samples_per_sec, 1),
                "unit": "samples/s",
                "vs_baseline": round(samples_per_sec / BASELINE_SAMPLES_PER_SEC, 3),
                "snr_db": round(snr, 1),
                "median_ms": round(median * 1e3, 3),
                "best_ms": round(best * 1e3, 3),
                "audio_seconds": seconds,
                "backend": jax.default_backend(),
                "device": str(jax.devices()[0].device_kind),
            }
        )
    )


if __name__ == "__main__":
    main()
