"""Benchmark suite: micro FFT, kernels, OLA, e2e — JSON lines per metric.

Reference: bench/ — micro_fft_benchmark (512/1024/2048 single+batch),
kernels_benchmark (axpy/axpy_windowed/normalize size sweep),
ola_benchmark (N x hop x channels product), e2e_benchmark (full pipeline with
SNR/real-time-factor counters). All timings amortize the remote dispatch
latency by chaining iterations inside one jit (see stages._time).

Run: python -m crlot_tpu.bench.suite [--out results.json]
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Dict

# Persist compiles across retries: the remote TPU tunnel is flaky and
# recompiles are the expensive part of a retry (same policy as bench.py).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from .stages import _time


def bench_fft(results: Dict[str, float]) -> None:
    from ..fft import dispatch as _fft

    rng = np.random.default_rng(0)
    for nfft in (512, 1024, 2048):
        for batch in (1, 4, 64):
            x = rng.uniform(-1, 1, (batch, nfft)).astype(np.float32)

            def fwd_inv(v):
                # Backend-dispatched path (folded matmul DFT on TPU).
                return _fft.irfft(_fft.rfft(v, nfft), nfft)

            def fwd_inv_xla(v):
                return jnp.fft.irfft(jnp.fft.rfft(v, axis=-1), n=nfft, axis=-1)

            us = _time(fwd_inv, x) * 1e6
            results[f"fft_roundtrip_n{nfft}_b{batch}_us"] = round(us, 2)
            us = _time(fwd_inv_xla, x) * 1e6
            results[f"fft_roundtrip_xla_n{nfft}_b{batch}_us"] = round(us, 2)


def bench_kernels(results: Dict[str, float]) -> None:
    """Size sweep n=16..32768 (+1M) mirroring the reference's cache-tier
    sweep (bench/kernels_benchmark.cc:259-281). On TPU the interesting
    boundary is not cache tiers but the pallas_call + pad-to-8x128 overhead
    vs the XLA-fused jnp form at sub-tile sizes: both variants are timed so
    the crossover feeding kernels.pallas_min_n() stays measured."""
    from ..ola import kernels as K

    rng = np.random.default_rng(1)
    for n in (16, 64, 256, 1024, 4096, 16384, 32768, 1 << 20):
        dst = rng.uniform(-1, 1, n).astype(np.float32)
        src = rng.uniform(-1, 1, n).astype(np.float32)
        win = rng.uniform(0, 1, n).astype(np.float32)
        # Small ops need long chains: sub-us bodies drown in per-call jitter
        # at the default k (CLAUDE.md: sub-0.1 ms stages need k_big ~40+).
        k_small, k_big = (40, 200) if n <= 32768 else (2, 12)
        for label, force in (("", None), ("_pallas", True), ("_jnp", False)):
            if label == "" and n not in (1024, 32768, 1 << 20):
                continue  # auto-dispatch rows only at the legacy sizes
            if label == "_pallas" and jax.default_backend() != "tpu":
                continue  # interpreted Pallas off-TPU is not a perf datum
            ns = _time(
                lambda d, f=force: K.axpy_windowed(d, src, win, 1.5,
                                                   use_pallas=f),
                dst, k_small=k_small, k_big=k_big,
            ) * 1e9 / n
            results[f"kernel_axpy_windowed{label}_n{n}_ns_per_elem"] = round(
                ns, 4
            )
            ns = _time(
                lambda d, f=force: K.normalize_and_clear(d, win,
                                                         use_pallas=f)[0],
                dst, k_small=k_small, k_big=k_big,
            ) * 1e9 / n
            results[f"kernel_normalize{label}_n{n}_ns_per_elem"] = round(ns, 4)


def bench_ola(results: Dict[str, float]) -> None:
    from ..ola.reference import overlap_add

    rng = np.random.default_rng(2)
    for n in (1024, 4096):
        for ratio in (2, 4):
            hop = n // ratio
            f = 48000 * 4 // hop
            frames = rng.uniform(-1, 1, (f, n)).astype(np.float32)
            us = _time(lambda fr: overlap_add(fr, hop), frames) * 1e6
            results[f"ola_n{n}_h{hop}_f{f}_us"] = round(us, 2)


def _rt_time_capped(fn, x, frame_size: int, hop: int, retries: int = 2,
                    k_small: int = 2, k_big: int = 12):
    """_time with a physical-plausibility cap for round-trip workloads:
    chain-minima differencing can fabricate faster-than-hardware readings
    when the two chain lengths' minima land in different tunnel windows
    (BENCH_r01-era suite recorded a 24 Gsamples/s 'e2e'). Anything above
    1.35x every roofline bound is remeasured, then reported NaN — an honest
    'unmeasurable', which the regression guard skips."""
    from ..profiling import roofline_samples_per_sec

    # Cap vs the fastest formulation the pipeline could have picked: the
    # identity round-trip lowers to the BLOCKED kernel since r3 (~2x the
    # framed ceiling), so capping on the framed model would reject honest
    # full-rate measurements as artifacts.
    cap = 1.35 * max(
        roofline_samples_per_sec(frame_size, hop, formulation=form)[bound]
        for form in ("framed", "blocked")
        for bound in (
            "bandwidth_bound_samples_per_sec",
            "compute_bound_samples_per_sec",
        )
    )
    n = np.asarray(x).shape[-1] * (
        np.asarray(x).size // np.asarray(x).shape[-1]
    )
    for _ in range(1 + retries):
        sec = _time(fn, x, k_small=k_small, k_big=k_big)
        if not (sec > 0) or n / sec <= cap:
            return sec
    return float("nan")


def bench_e2e(results: Dict[str, float]) -> None:
    from ..core.types import StftConfig
    from ..metrics import snr_db
    from ..pipeline import round_trip

    sr = 48000
    # Metrics are per 1 s of audio (the reference workload), but measured
    # over a 16 s signal: a 1 s signal's per-iteration device time (~13 us)
    # drowns in the tunnel's per-call jitter; 16x the audio gives 16x the
    # timing delta at identical per-second semantics.
    seconds = 16
    for hop in (256, 512):
        cfg = StftConfig(frame_size=1024, hop_size=hop, center=True)
        rng = np.random.default_rng(3)
        x = rng.uniform(-0.9, 0.9, seconds * sr).astype(np.float32)
        y = jax.jit(lambda s: round_trip(s, cfg))(x)
        snr = snr_db(np.asarray(x), np.asarray(y))
        # k_big 88: at full rate a 16 s pass is ~47 us of device time at
        # hop 256, so the default 10-pass chain difference (~0.5 ms) sat
        # inside minima jitter and the plausibility cap NaNed the h256
        # cell in the r4/r5 artifacts; 80 passes give a ~3.8 ms delta.
        sec = _rt_time_capped(
            lambda s: round_trip(s, cfg), x, 1024, hop,
            k_small=8, k_big=88,
        ) / seconds
        results[f"e2e_1s48k_n1024_h{hop}_ms"] = round(sec * 1e3, 3)
        results[f"e2e_1s48k_n1024_h{hop}_rtf"] = round(1.0 / sec, 1)
        results[f"e2e_1s48k_n1024_h{hop}_snr_db"] = round(snr, 1)


def bench_spectral(results: Dict[str, float]) -> None:
    """Round-trip with a fixed spectral EQ: round_trip resolves the per-bin
    response and lowers to the blocked hop-block Toeplitz kernel (composed
    [N, N] matmul fallback off the lane-aligned gate)."""
    from ..core.types import StftConfig
    from ..metrics import snr_db
    from ..pipeline import round_trip
    from ..spectral import band_gain

    sr = 48000
    seconds = 16  # measured over 16 s, reported per 1 s (see bench_e2e)
    cfg = StftConfig(frame_size=1024, hop_size=256, center=True)
    eq = band_gain([2000.0, 8000.0], [1.0, 0.5, 0.1], float(sr), 1024)
    rng = np.random.default_rng(7)
    x = rng.uniform(-0.9, 0.9, seconds * sr).astype(np.float32)
    y = jax.jit(lambda s: round_trip(s, cfg, spectral_fn=eq))(x)
    assert np.isfinite(np.asarray(y)).all()
    # EQ lowers to the blocked kernel — same physical ceiling as the
    # identity headline; cap like the e2e rows (a 54 G reading slipped
    # through uncapped in an r4 run — pure chain-minima artifact).
    # Sub-ms bodies need longer chains to cancel tunnel jitter (CLAUDE.md)
    sec = _rt_time_capped(
        lambda s: round_trip(s, cfg, spectral_fn=eq), x, 1024, 256,
        k_small=10, k_big=60,
    ) / seconds
    results["eq_composed_1s48k_ms"] = round(sec * 1e3, 3)
    results["eq_composed_msamples_per_s"] = round(sr / sec / 1e6, 1)

    # NONLINEAR per-bin fn (noise gate): the reference's arbitrary
    # spectral-processing slot (e2e_benchmark.cc:161-163) that cannot
    # compose into the blocked kernel — the pipeline routes it to the
    # best measured formulation (fused in-VMEM kernel on TPU when
    # supported, else packed XLA planes).
    from ..spectral import noise_gate

    gate = noise_gate(-40.0, attenuation_db=-30.0)
    yg = jax.jit(lambda s: round_trip(s, cfg, spectral_fn=gate))(x)
    assert np.isfinite(np.asarray(yg)).all()
    sec = _rt_time_capped(
        lambda s: round_trip(s, cfg, spectral_fn=gate), x, 1024, 256,
        k_small=10, k_big=60,
    ) / seconds
    results["mask_gate_1s48k_ms"] = round(sec * 1e3, 3)
    results["mask_gate_msamples_per_s"] = round(sr / sec / 1e6, 1)

    # Multi-chip EQ: the sharded blocked (hop-block Toeplitz) formulation
    # with left+right halos (verdict r3 item 6) across all local devices
    # (1 on a single TPU chip; the 8-virtual-device CPU lane exercises the
    # real collectives).
    from ..core.types import FftBackend
    from ..distributed.mesh import auto_mesh
    from ..distributed.sharded_pipeline import sharded_round_trip_jit

    scfg = StftConfig(
        frame_size=1024, hop_size=256, center=False,
        fft_backend=FftBackend.MATMUL,
    )
    mesh = auto_mesh(channels=1)  # mono input: all devices on the time axis
    n_time = mesh.shape["time"]
    unit = n_time * 512  # group*hop alignment per device
    total = (seconds * sr // unit) * unit
    xs = x[:total].reshape(1, total)
    run = sharded_round_trip_jit(scfg, mesh, spectral_fn=eq)
    ys = run(jnp.asarray(xs))
    assert np.isfinite(np.asarray(ys)).all()
    sec = _rt_time_capped(
        lambda s: run(s), jnp.asarray(xs), 1024, 256
    ) / (total / sr)
    results["eq_sharded_blocked_1s48k_ms"] = round(sec * 1e3, 3)
    results["eq_sharded_blocked_msamples_per_s"] = round(sr / sec / 1e6, 1)


def bench_multichannel(results: Dict[str, float]) -> None:
    """BASELINE config 4: 64-channel batch, per-channel STFT/OLA round-trip
    + FIR filtering (sharded across chips when more than one device is
    present)."""
    from ..core.types import StftConfig
    from ..pipeline import round_trip
    from ..spectral import fir_frequency_response, per_bin_filter

    cfg = StftConfig(frame_size=1024, hop_size=256, center=False)
    rng = np.random.default_rng(4)
    x = rng.uniform(-0.9, 0.9, (64, 48000)).astype(np.float32)
    # Long chains (k_big 44): at full rate this workload is ~190 us of
    # device time per pass, so the default 10-pass chain difference
    # (~1.9 ms) sits inside the tunnel's minima jitter and the
    # plausibility cap NaNed the cell in EVERY r4/r5 artifact; 40 passes
    # give a ~7.6 ms difference the guard can trust (CLAUDE.md timing
    # rule: sub-ms stages need k_big ~40+).
    sec = _rt_time_capped(
        lambda s: round_trip(s, cfg), x, 1024, 256,
        k_small=4, k_big=44,
    )
    total = 64 * 48000
    results["mc64_1s48k_ms"] = round(sec * 1e3, 3)
    results["mc64_msamples_per_s"] = round(total / sec / 1e6, 1)
    taps = np.hamming(127)
    taps = taps / taps.sum()
    fir = per_bin_filter(fir_frequency_response(taps, 1024))
    sec = _rt_time_capped(
        lambda s: round_trip(s, cfg, spectral_fn=fir), x, 1024, 256,
        k_small=4, k_big=44,
    )
    results["mc64_fir_1s48k_ms"] = round(sec * 1e3, 3)
    results["mc64_fir_msamples_per_s"] = round(total / sec / 1e6, 1)


def bench_sweep(results: Dict[str, float]) -> None:
    """BASELINE config 2: large-frame sweep, FFT 256..16384, hop ratios
    1/2 and 1/4, round-trip ms + SNR (Hann, COLA-normalized).

    Every cell co-measures an INTERLEAVED headline sentinel (the N=1024
    hop=256 round-trip, one shared compile) immediately after the cell's
    own burst, and reports the cell/sentinel ratio next to the raw figure
    (r4 verdict item 5: cells land in whatever service window the suite
    reaches them in — raw cross-size comparisons were regime-noise soup;
    the ratio is window-normalized and mutually comparable)."""
    from ..core.types import StftConfig
    from ..metrics import snr_db
    from ..pipeline import round_trip

    from ..core.types import WindowType

    sr = 48000
    rng = np.random.default_rng(5)
    sent_cfg = StftConfig(frame_size=1024, hop_size=256, center=True)
    x_sent = rng.uniform(-0.9, 0.9, 4 * sr).astype(np.float32)

    def sentinel_gsps():
        sec = _rt_time_capped(
            lambda s: round_trip(s, sent_cfg), x_sent, 1024, 256
        )
        return len(x_sent) / sec / 1e9 if sec > 0 else float("nan")

    for n in (256, 1024, 4096, 16384):
        # Signal length scales with N: a fixed 4 s gives only ~11 frames at
        # N=16384 hop=N/4 — pure measurement noise on the tunnel.
        seconds = 4 if n <= 1024 else 16
        x = rng.uniform(-0.9, 0.9, seconds * sr).astype(np.float32)
        for ratio in (2, 4):
            cfg = StftConfig(frame_size=n, hop_size=n // ratio, center=True)
            y = jax.jit(lambda s, c=cfg: round_trip(s, c))(x)
            snr = snr_db(np.asarray(x), np.asarray(y))
            sec = _rt_time_capped(
                lambda s, c=cfg: round_trip(s, c), x, n, n // ratio
            )
            sent = sentinel_gsps()  # same-window co-measure
            key = f"sweep_n{n}_r{ratio}"
            cell = len(x) / sec / 1e9
            results[f"{key}_gsamples_per_s"] = round(cell, 3)
            results[f"{key}_snr_db"] = round(snr, 1)
            results[f"{key}_sentinel_gsamples_per_s"] = round(sent, 3)
            results[f"{key}_vs_sentinel"] = round(cell / sent, 4)
    x = rng.uniform(-0.9, 0.9, 4 * sr).astype(np.float32)
    # BASELINE config 2 names Hann AND Hamming COLA: one Hamming point.
    cfg = StftConfig(
        frame_size=1024, hop_size=256, center=True,
        window=WindowType.HAMMING,
    )
    y = jax.jit(lambda s: round_trip(s, cfg))(x)
    results["sweep_n1024_r4_hamming_snr_db"] = round(
        snr_db(np.asarray(x), np.asarray(y)), 1
    )
    sec = _time(lambda s: round_trip(s, cfg), x)
    results["sweep_n1024_r4_hamming_gsamples_per_s"] = round(
        len(x) / sec / 1e9, 3
    )


def bench_convolve(results: Dict[str, float]) -> None:
    """Direct FIR convolution (Toeplitz matmul formulation), 255 taps."""
    from ..convolve import convolve

    rng = np.random.default_rng(8)
    x = rng.uniform(-0.9, 0.9, 48000 * 4).astype(np.float32)
    taps = (np.hamming(255) / 127.0).astype(np.float32)
    y = jax.jit(lambda s: convolve(s, taps, mode="same"))(x)
    assert np.isfinite(np.asarray(y)).all()
    sec = _time(lambda s: convolve(s, taps, mode="same"), x)
    results["convolve_255tap_4s_ms"] = round(sec * 1e3, 3)
    results["convolve_255tap_msamples_per_s"] = round(len(x) / sec / 1e6, 1)


def bench_features(results: Dict[str, float]) -> None:
    """Mel spectrogram + MFCC extraction rate (matmul feature stack)."""
    from ..core.types import StftConfig
    from ..features import mel_spectrogram, mfcc

    rng = np.random.default_rng(9)
    sr = 48000
    x = rng.uniform(-0.9, 0.9, sr * 4).astype(np.float32)
    cfg = StftConfig(frame_size=1024, hop_size=256, center=False)

    def mel_fn(v):
        return mel_spectrogram(v, cfg, float(sr), n_mels=64)

    def mfcc_fn(v):
        return mfcc(v, cfg, float(sr), n_mfcc=13, n_mels=64)

    assert np.isfinite(np.asarray(jax.jit(mel_fn)(x))).all()
    sec = _time(mel_fn, x)
    results["mel64_4s_ms"] = round(sec * 1e3, 3)
    results["mel64_msamples_per_s"] = round(len(x) / sec / 1e6, 1)
    sec = _time(mfcc_fn, x)
    results["mfcc13_4s_ms"] = round(sec * 1e3, 3)
    results["mfcc13_msamples_per_s"] = round(len(x) / sec / 1e6, 1)

    from ..hpss import hpss

    def hpss_fn(v):
        h, p = hpss(v, cfg, kernel_harm=17, kernel_perc=17)
        return h + p  # single output keeps the timing chain one-armed

    assert np.isfinite(np.asarray(jax.jit(hpss_fn)(x))).all()
    sec = _time(hpss_fn, x)
    results["hpss17_4s_ms"] = round(sec * 1e3, 3)
    results["hpss17_msamples_per_s"] = round(len(x) / sec / 1e6, 1)

    from ..features import pcen

    def pcen_fn(v):
        return pcen(
            mel_spectrogram(v, cfg, float(sr), n_mels=64),
            float(sr) / cfg.hop_size,
        )

    assert np.isfinite(np.asarray(jax.jit(pcen_fn)(x))).all()
    sec = _time(pcen_fn, x)
    results["pcen_mel64_4s_ms"] = round(sec * 1e3, 3)
    results["pcen_mel64_msamples_per_s"] = round(len(x) / sec / 1e6, 1)


def bench_iir(results: Dict[str, float]) -> None:
    """Associative-scan IIR throughput: butter(4) lowpass cascade."""
    from ..iir import butter_sos, sosfilt

    rng = np.random.default_rng(10)
    x = rng.uniform(-0.9, 0.9, 48000 * 4).astype(np.float32)
    sos = butter_sos(4, 0.1, "lowpass")

    def f(v):
        return sosfilt(sos, v)

    assert np.isfinite(np.asarray(jax.jit(f)(x))).all()
    sec = _time(f, x)
    results["iir_butter4_4s_ms"] = round(sec * 1e3, 3)
    results["iir_butter4_msamples_per_s"] = round(len(x) / sec / 1e6, 1)


def bench_resample(results: Dict[str, float]) -> None:
    """BASELINE config 3: polyphase resample chain 44.1k -> 48k -> 16k."""
    from ..resample.polyphase import resample

    rng = np.random.default_rng(6)
    x = rng.uniform(-0.9, 0.9, 44100 * 4).astype(np.float32)

    def chain(v):
        return resample(resample(v, 44100, 48000), 48000, 16000)

    y = jax.jit(chain)(x)
    sec = _time(chain, x)
    results["resample_chain_4s_ms"] = round(sec * 1e3, 3)
    results["resample_chain_msamples_per_s"] = round(len(x) / sec / 1e6, 1)
    results["resample_chain_out_len"] = int(np.asarray(y).shape[-1])

    # BASELINE config 3 "fused with framing": resample(44.1k->48k) -> frame
    # -> window -> rFFT in ONE jit, vs the same ops as two dispatches.
    from ..core.types import StftConfig
    from ..pipeline import resampled_stft, stft

    cfg = StftConfig(frame_size=1024, hop_size=256, center=False)

    def fused(v):
        s = resampled_stft(v, 44100, 48000, cfg)
        return jnp.abs(s)  # complex64 must not cross the tunnel

    def unfused(v):
        w = jax.jit(resample, static_argnums=(1, 2))(v, 44100, 48000)
        return jnp.abs(jax.jit(stft, static_argnums=(1,))(w, cfg))

    jax.jit(fused)(x).block_until_ready()
    sec = _time(fused, x)
    results["resample_stft_fused_4s_ms"] = round(sec * 1e3, 3)
    results["resample_stft_fused_msamples_per_s"] = round(
        len(x) / sec / 1e6, 1
    )
    t0 = time.time()  # unfused = 2 dispatches; wall-clock captures the seam
    for _ in range(8):
        unfused(x).block_until_ready()
    results["resample_stft_unfused_wall_ms"] = round(
        (time.time() - t0) / 8 * 1e3, 3
    )


def bench_streaming(results: Dict[str, float]) -> None:
    """BASELINE config 5's single-chip analog: sustained long-stream
    round-trip (>= 10 minutes of 48 kHz audio in one run, chunked through
    the lax.scan pipeline with the OLA tail carried across chunks) plus a
    MID-STREAM checkpoint/restore whose continuation must be bit-identical.
    Reported as sustained samples/s over wall clock (includes host framing
    and transfers — the honest end-to-end figure, unlike the chained
    device-only numbers elsewhere in this suite).
    """
    from ..core.types import StftConfig
    from ..metrics import snr_db
    from ..streaming_pipeline import streaming_round_trip_blocks

    sr = 48000
    minutes = float(os.environ.get("CRLOT_BENCH_STREAM_MIN", "10"))
    cfg = StftConfig(frame_size=1024, hop_size=256, center=False)
    n, hop = cfg.frame_size, cfg.hop_size
    # 128 scan-blocks per dispatch = 2.1 Msamples/chunk: on a tunneled chip
    # the per-chunk dispatch+transfer (~20 ms) dominates sustained wall time,
    # so chunks must be large enough to amortize it (measured 12.6 Msamples/s
    # sustained at 0.5 Msample chunks — pure dispatch overhead).
    block_frames, blocks_per_chunk = 64, 128
    chunk_frames = block_frames * blocks_per_chunk
    chunk_samples = chunk_frames * hop  # 2097152
    n_chunks = max(int(minutes * 60 * sr) // chunk_samples, 2)
    rng = np.random.default_rng(9)
    x = rng.uniform(-0.9, 0.9, n_chunks * chunk_samples + (n - hop)).astype(
        np.float32
    )

    # Framing happens ON DEVICE inside the chunk program: the host ships the
    # raw chunk (+ the N-hop framing lookahead), not the 4x-inflated frame
    # matrix — host->device traffic is the sustained-loop bottleneck on a
    # tunneled chip.
    from functools import partial as _partial

    from ..frame.framing import hop_block_frames

    @_partial(jax.jit, static_argnames=("with_tail",))
    def chunk_program(x_chunk, tail, with_tail):
        frames = hop_block_frames(x_chunk, n, hop, chunk_frames)
        frames = frames.reshape(blocks_per_chunk, block_frames, n)
        return streaming_round_trip_blocks(
            frames, cfg, block_frames, None,
            carry_tail=tail if with_tail else None, return_carry=True,
        )

    span = chunk_samples + (n - hop)
    zero_tail = jnp.zeros(n - hop, jnp.float32)

    def run_chunk(k, tail):
        seg = jnp.asarray(x[k * chunk_samples : k * chunk_samples + span])
        return chunk_program(seg, tail if tail is not None else zero_tail,
                             tail is not None)

    out0, tail0 = run_chunk(0, None)  # compile + warm (tail-less trace)
    out0.block_until_ready()
    out0, _ = run_chunk(0, tail0)  # warm the carried-tail trace too
    out0.block_until_ready()

    half = n_chunks // 2
    t0 = time.time()
    tail = None
    mid_tail = None
    for k in range(n_chunks):
        out, tail = run_chunk(k, tail)
        if k == half - 1:
            mid_tail = np.asarray(tail)  # snapshot for the restore check
    out.block_until_ready()
    wall = time.time() - t0
    total = n_chunks * chunk_samples
    results["stream_minutes_audio"] = round(total / sr / 60, 1)
    # NOTE: this legacy f32 loop measures INGEST + compute sustained rate
    # (outputs stay device-resident; only the final chunk syncs) — the
    # full-egress end-to-end figure is stream_sustained_i16_* below.
    results["stream_sustained_gsamples_per_s"] = round(total / wall / 1e9, 4)
    results["stream_wall_s"] = round(wall, 2)

    # --- int16-wire double-buffered sustained loop (verdict r3 item 2).
    # Audio is born 16-bit (assets/oboe.wav): ship PCM16 both ways (4 B
    # per sample round-trip instead of 8) and dequantize/requantize
    # IN-JIT; dispatch chunk k before forcing chunk k-1's readback so the
    # host<->device transfers double-buffer against device compute (and
    # against each other where the transport allows). On a tunneled chip
    # the link (~22 MB/s effective) remains the wall — the
    # device-resident metric below is what a production host link sees.
    x_i16 = np.clip(
        np.rint(x * 32768.0), -32768, 32767
    ).astype(np.int16)

    @_partial(jax.jit, static_argnames=())
    def chunk_program_i16(seg_i16, tail):
        xf = seg_i16.astype(jnp.float32) * jnp.float32(1.0 / 32768.0)
        frames = hop_block_frames(xf, n, hop, chunk_frames)
        frames = frames.reshape(blocks_per_chunk, block_frames, n)
        y, tail2 = streaming_round_trip_blocks(
            frames, cfg, block_frames, None, carry_tail=tail,
            return_carry=True,
        )
        y_i16 = jnp.clip(
            jnp.round(y * 32768.0), -32768.0, 32767.0
        ).astype(jnp.int16)
        return y_i16, tail2

    def run_chunk_i16(k, tail):
        seg = jnp.asarray(
            x_i16[k * chunk_samples : k * chunk_samples + span]
        )
        return chunk_program_i16(seg, tail)

    o_w, t_w = run_chunk_i16(0, zero_tail)  # compile + warm
    o_w.block_until_ready()
    t0 = time.time()
    tail = zero_tail
    pending = None
    for k in range(n_chunks):
        out_i16, tail = run_chunk_i16(k, tail)
        if pending is not None:
            np.asarray(pending)  # force k-1 while k's transfer/compute fly
        pending = out_i16
    y_last_i16 = np.asarray(pending)
    wall16 = time.time() - t0
    results["stream_sustained_i16_gsamples_per_s"] = round(
        total / wall16 / 1e9, 4
    )
    results["stream_i16_wall_s"] = round(wall16, 2)
    # +/- 1 LSB vs the f32-wire path: same compute on dequantized input;
    # the only delta is the output quantization step.
    y_f32_tailchunk = np.asarray(out)  # f32 loop's final chunk output
    same_in = np.clip(
        np.rint(
            np.asarray(x[(n_chunks - 1) * chunk_samples :][:span])
            * 32768.0
        ), -32768, 32767,
    ).astype(np.int16).astype(np.float32) / 32768.0
    # quantization of input differs from f32 path's raw input, so bound
    # loosely: dequantized i16 output within (input LSB propagated + 1
    # output LSB). COLA round-trip is 1-Lipschitz in the input, so 2 LSB.
    delta = np.max(
        np.abs(y_last_i16.astype(np.float32) / 32768.0 - y_f32_tailchunk)
    )
    results["stream_i16_vs_f32_max_delta_lsb"] = round(
        float(delta * 32768.0), 2
    )

    # --- egress anatomy (r4 verdict item 7: the int16 full-egress loop
    # measured SLOWER than f32 ingest-only, so halving bytes bought
    # nothing — probe WHERE the egress wall goes). Three bracketed probes
    # on ready device buffers: per-chunk readback latency, batched
    # readback of 8 chunks in ONE transfer, and the i16 loop re-run with
    # egress batched every 8 chunks (D2H amortized across the batch while
    # H2D+compute of later chunks proceed).
    ready = pending  # final i16 device chunk from the loop above
    ready.block_until_ready()
    t0 = time.time()
    np.asarray(ready)
    dt1 = time.time() - t0
    results["egress_readback_ms_per_chunk"] = round(dt1 * 1e3, 1)
    results["egress_readback_mb_per_s"] = round(
        ready.nbytes / dt1 / 1e6, 1
    )
    stack8 = jnp.stack([ready] * 8)
    stack8.block_until_ready()
    t0 = time.time()
    np.asarray(stack8)
    dt8 = time.time() - t0
    results["egress_batched8_mb_per_s"] = round(
        stack8.nbytes / dt8 / 1e6, 1
    )
    results["egress_batched8_ms_per_chunk"] = round(dt8 / 8 * 1e3, 1)
    del stack8
    t0 = time.time()
    tail = zero_tail
    pend = []
    for k in range(n_chunks):
        o_k, tail = run_chunk_i16(k, tail)
        pend.append(o_k)
        if len(pend) == 8:
            np.asarray(jnp.stack(pend))  # ONE D2H for 8 chunks
            pend = []
    if pend:
        np.asarray(jnp.stack(pend))
    wall_be = time.time() - t0
    results["stream_sustained_i16_batched_egress_gsamples_per_s"] = round(
        total / wall_be / 1e9, 4
    )

    # --- raw link rate: time one bare host->device and device->host
    # transfer of a chunk-sized f32 buffer so the artifact QUANTIFIES the
    # transfer wall the sustained-wire numbers sit behind (the reference's
    # 53 M samples/s e2e is host-resident and pays no such link).
    probe = np.ascontiguousarray(x[:chunk_samples])
    t0 = time.time()
    dev = jax.device_put(probe)
    dev.block_until_ready()
    up_s = time.time() - t0
    t0 = time.time()
    np.asarray(dev)
    down_s = time.time() - t0
    results["link_host_to_device_mb_per_s"] = round(
        probe.nbytes / up_s / 1e6, 1
    )
    results["link_device_to_host_mb_per_s"] = round(
        probe.nbytes / down_s / 1e6, 1
    )

    # --- device-resident sustained rate: inputs pre-staged in HBM, the
    # same chunked scan programs back-to-back with the carried tail. This
    # is the sustained e2e rate when ingress is not a ~22 MB/s dev-tunnel
    # (production NIC / on-device pipeline); the reference's 53 M
    # samples/s CPU figure is likewise transfer-free (host-resident).
    segs = [
        jax.device_put(x[k * chunk_samples : k * chunk_samples + span])
        for k in range(n_chunks)
    ]
    for s_ in segs:
        s_.block_until_ready()
    t0 = time.time()
    tail = zero_tail
    last = None
    for k in range(n_chunks):
        last, tail = chunk_program(segs[k], tail, True)
    last.block_until_ready()
    wall_dev = time.time() - t0
    results["stream_sustained_device_resident_tiled_gsamples_per_s"] = round(
        total / wall_dev / 1e9, 4
    )

    # --- BLOCKED device-resident sustained stream (r4 verdict item 1: the
    # 16.4 G one-shot formulation was fenced out of every streaming path,
    # leaving the sustained stream 26x slower on the same chip with the
    # same math). The BlockedChunkStreamer runs the headline hop-block
    # Toeplitz kernel on halo-extended chunks; this is now the metric of
    # record for BASELINE config 5's single-chip analog — the tiled-scan
    # figures above remain as the fallback formulation's numbers.
    from ..core.types import FftBackend
    from ..streaming_pipeline import (
        BlockedChunkStreamer,
        blocked_stream_supported,
    )

    cfg_blk = StftConfig(
        frame_size=n, hop_size=hop, center=False,
        fft_backend=FftBackend.MATMUL,
    )
    assert blocked_stream_supported(cfg_blk, chunk_samples)
    chunks_dev = [
        jax.device_put(x[k * chunk_samples : (k + 1) * chunk_samples])
        for k in range(n_chunks)
    ]
    for c_ in chunks_dev:
        c_.block_until_ready()

    def run_blocked_stream(force_each=False):
        st = BlockedChunkStreamer(cfg_blk)
        outs = []
        for c_ in chunks_dev:
            o = st.feed(c_, force=force_each)
            if o is not None:
                outs.append(o)
        outs.append(st.finish(force=force_each))
        return outs

    warm = run_blocked_stream()  # compile head/middle/tail chunk variants
    jax.block_until_ready(warm)
    del warm
    t0 = time.time()
    outs_blk = run_blocked_stream()
    jax.block_until_ready(outs_blk)
    wall_blk = time.time() - t0
    results["stream_sustained_device_resident_gsamples_per_s"] = round(
        total / wall_blk / 1e9, 4
    )
    results["stream_device_resident_formulation"] = (
        "blocked hop-block Toeplitz (BlockedChunkStreamer)"
    )

    # Big-chunk variant: the blocked streamer carries NO cross-chunk state
    # (overlap-save context only), so chunk size is a free launch-
    # amortization lever — at 16 G the 2.1 M chunk is ~130 us of device
    # time vs ~ms-scale tunnel launches, so the dispatch loop can go
    # launch-bound where the tiled loop (3.3 ms/chunk) never did. 4x
    # chunks quarter the launch rate at identical math.
    big = 4 * chunk_samples
    k_big_c = (n_chunks * chunk_samples) // big
    if k_big_c >= 2:
        chunks_big = [
            jax.device_put(x[k * big : (k + 1) * big])
            for k in range(k_big_c)
        ]
        for c_ in chunks_big:
            c_.block_until_ready()

        def run_blocked_big():
            st = BlockedChunkStreamer(cfg_blk)
            outs = []
            for c_ in chunks_big:
                o = st.feed(c_, force=False)
                if o is not None:
                    outs.append(o)
            outs.append(st.finish(force=False))
            return outs

        wb_ = run_blocked_big()
        jax.block_until_ready(wb_)
        del wb_
        t0 = time.time()
        outs_big = run_blocked_big()
        jax.block_until_ready(outs_big)
        wall_big = time.time() - t0
        results[
            "stream_sustained_device_resident_bigchunk_gsamples_per_s"
        ] = round(k_big_c * big / wall_big / 1e9, 4)
        del outs_big, chunks_big

    # Bit-exactness gate ON DEVICE: the streamed chunks vs the blocked
    # one-shot over the same samples (a shorter 3-chunk stream bounds the
    # extra one-shot compile). The MXU's fixed row tiling makes this exact
    # on TPU; CPU runs assert the same (identity kernel is delta-exact).
    from ..pipeline import blocked_composed_round_trip

    k3 = min(3, n_chunks)
    x3 = x[: k3 * chunk_samples]
    st3 = BlockedChunkStreamer(cfg_blk)
    outs3 = [st3.feed(x3[k * chunk_samples : (k + 1) * chunk_samples])
             for k in range(k3)]
    outs3.append(st3.finish())
    y3 = np.concatenate([o for o in outs3 if o is not None])
    ones = np.ones(n // 2 + 1)
    y3_once = np.asarray(jax.jit(
        lambda v: blocked_composed_round_trip(v, cfg_blk, ones)
    )(jnp.asarray(x3)))
    results["stream_blocked_vs_oneshot_bitexact"] = int(
        np.array_equal(y3, y3_once)
    )
    results["stream_blocked_vs_oneshot_max_abs_delta"] = float(
        np.max(np.abs(y3 - y3_once))
    )
    assert results["stream_blocked_vs_oneshot_bitexact"], (
        "blocked stream diverged from the blocked one-shot"
    )

    # --- born-int16 integer-tier device-resident stream (r5 verdict item
    # 8 -> production wiring, crlot_tpu/wire.py): wire chunks are born
    # int16 in HBM and the int8-limb blocked kernel never dequantizes
    # (probe: 37.8 G single-limb vs 14.4 G f32-dequant in one full-rate
    # window, DESIGN.md r5 postscript). int8x2 is the accuracy-
    # conservative tier; int8x1 is the identity throughput ceiling (the
    # int16 wire noise floor dominates both, 95.4 dB).
    from ..wire import I16BlockedStreamer

    chunks_i16_dev = [
        jax.device_put(
            x_i16[k * chunk_samples : (k + 1) * chunk_samples]
        )
        for k in range(n_chunks)
    ]
    for c_ in chunks_i16_dev:
        c_.block_until_ready()

    @jax.jit
    def _i16_snr_terms(a_i16, b_f32):
        a = a_i16.astype(jnp.float32) * jnp.float32(1.0 / 32768.0)
        e = a - b_f32
        return jnp.sum(e * e), jnp.sum(b_f32 * b_f32)

    outs_i16_by_tier = {}
    for tier in ("int8x2", "int8x1"):
        def run_i16_stream(tier=tier):
            st = I16BlockedStreamer(cfg_blk, tier=tier, emit_i16=True)
            outs = []
            for c_ in chunks_i16_dev:
                o = st.feed(c_, force=False)
                if o is not None:
                    outs.append(o)
            outs.append(st.finish(force=False))
            return outs

        warm_i = run_i16_stream()
        jax.block_until_ready(warm_i)
        del warm_i
        t0 = time.time()
        outs_i = run_i16_stream()
        jax.block_until_ready(outs_i)
        wall_i = time.time() - t0
        results[
            f"stream_sustained_device_resident_i16_{tier}_gsamples_per_s"
        ] = round(total / wall_i / 1e9, 4)
        outs_i16_by_tier[tier] = outs_i
    # Quality gate next to the speed number: int8x2 i16-egress output vs
    # the f32 blocked streamer's chunks (includes the egress requant, so
    # the wire floor bounds it; device-side reduction, scalar readback).
    err_sum = ref_sum = 0.0
    for o_i, o_f in zip(outs_i16_by_tier["int8x2"], outs_blk):
        e2, r2 = _i16_snr_terms(o_i, o_f)
        err_sum += float(e2)
        ref_sum += float(r2)
    results["stream_i16_int8x2_vs_f32_snr_db"] = round(
        float(10 * np.log10(max(ref_sum, 1e-300) / max(err_sum, 1e-300))), 1
    )
    del outs_i16_by_tier, chunks_i16_dev

    # --- BLOCKED scan-over-chunks one-program variant: halo-extended segs
    # pre-staged in HBM (the prefetcher-ring production shape), the whole
    # stream as ONE dispatch of a lax.scan whose step is the pure
    # hop-block chunk matmul. Stream head/tail patches (2*(N-hop) samples
    # of the 28.8 M) are excluded from this TIMED middle-chunk program —
    # the dispatch-loop metric above includes them via the streamer.
    from ..fft.matmul_backend import hopblock_apply
    from ..streaming_pipeline import (
        _blocked_stream_consts,
        _resolve_blocked_per_bin,
    )

    rb = _resolve_blocked_per_bin(cfg_blk, None)
    cb = _blocked_stream_consts(cfg_blk, rb)
    gh_b, edge_b, rctx_b = cb["gh"], cb["edge"], cb["right_ctx"]
    span_b = edge_b + chunk_samples + rctx_b
    x_pad = np.pad(x[: n_chunks * chunk_samples], (edge_b, rctx_b))
    segs_blk = jnp.stack([
        jax.device_put(
            x_pad[k * chunk_samples : k * chunk_samples + span_b]
        )
        for k in range(n_chunks)
    ])
    kern_b = jnp.asarray(cb["kern"])
    from ..fft import dispatch as _fftd

    prec_b = _fftd.to_lax_precision(cfg_blk.fft_precision)

    @jax.jit
    def scan_blocked(segs2):
        def step(carry, seg):
            return carry, hopblock_apply(
                seg, kern_b, gh_b, chunk_samples, 0, prec_b
            )

        _, ys = jax.lax.scan(step, jnp.float32(0), segs2)
        return ys

    ys_w = scan_blocked(segs_blk)
    jax.block_until_ready(ys_w)
    del ys_w
    t0 = time.time()
    ys_b = scan_blocked(segs_blk)
    jax.block_until_ready(ys_b)
    wall_bscan = time.time() - t0
    results["stream_sustained_device_resident_scan_gsamples_per_s"] = round(
        total / wall_bscan / 1e9, 4
    )
    # Middle chunks of scan vs dispatch-loop streamer: bit-identical
    # (identical kernel rows; head/tail chunks differ by design — the
    # scan variant's phantom edges are unpatched).
    if n_chunks >= 3:
        mid_scan = np.asarray(ys_b[1])
        mid_disp = np.asarray(outs_blk[1])
        results["stream_blocked_scan_vs_dispatch_bitexact"] = int(
            np.array_equal(mid_scan, mid_disp)
        )
    del ys_b, outs_blk

    # Resident-ring UNROLLED variant (r5): production keeps the stream in
    # ONE contiguous HBM buffer (the prefetcher ring); chunk k's
    # halo-extended span is then a contiguous dynamic-slice, so every
    # hop-block term stays a zero-copy shifted view feeding the dot.
    # Measured on-chip (r5 probes, adjacent windows): stacked-seg scan
    # 3.2 G / stacked batched 7.0 G / contiguous lax.scan 4.5 G — the
    # scan's per-step slice materializes copies and defeats the
    # shifted-view fusion — vs contiguous UNROLLED 13.2 G, the one-shot
    # tier (one-shot 10.2-16.3 G in the same windows).
    x_ext_res = jax.device_put(jnp.asarray(x_pad))

    @jax.jit
    def ring_unrolled(v):
        return jnp.stack([
            hopblock_apply(
                jax.lax.dynamic_slice(
                    v, (k * chunk_samples,), (span_b,)
                ),
                kern_b, gh_b, chunk_samples, 0, prec_b,
            )
            for k in range(n_chunks)
        ])

    ys_r = ring_unrolled(x_ext_res)
    jax.block_until_ready(ys_r)
    # Same halo-extended chunk rows as the dispatch-loop streamer: the
    # middle chunk must be BIT-identical to the streamer's.
    if n_chunks >= 3:
        results["stream_blocked_ring_vs_dispatch_bitexact"] = int(
            np.array_equal(np.asarray(ys_r[1]), mid_disp)
        )
        assert results["stream_blocked_ring_vs_dispatch_bitexact"], (
            "ring-unrolled diverged from the dispatch-loop streamer"
        )
    del ys_r
    t0 = time.time()
    ys_r2 = ring_unrolled(x_ext_res)
    jax.block_until_ready(ys_r2)
    wall_ring = time.time() - t0
    del ys_r2
    results["stream_sustained_device_resident_ring_gsamples_per_s"] = (
        round(total / wall_ring / 1e9, 4)
    )
    sec_ring = _rt_time_capped(ring_unrolled, x_ext_res, n, hop,
                               k_small=2, k_big=6)
    results[
        "stream_sustained_device_resident_ring_chained_gsamples_per_s"
    ] = (
        round(total / sec_ring / 1e9, 4)
        if sec_ring == sec_ring and sec_ring > 0
        else float("nan")
    )

    # The single-dispatch wall above includes one ~25 ms tunnel round-trip,
    # which caps ANY one-call measurement near 1 G for this stream length
    # (28.8 M samples is ~2 ms of device time at headline rate) regardless
    # of window quality. The device-resident SUSTAINED rate is a chip-side
    # claim, so also measure the scan program chain-differenced (bench.py /
    # stages._time methodology: interleaved chain minima cancel the
    # launch+readback) — the cost a resident production loop actually pays.
    sec_chain = _rt_time_capped(scan_blocked, segs_blk, n, hop,
                                k_small=2, k_big=6)
    results[
        "stream_sustained_device_resident_scan_chained_gsamples_per_s"
    ] = (
        round(total / sec_chain / 1e9, 4)
        if sec_chain == sec_chain and sec_chain > 0
        else float("nan")
    )

    # The device-resident variants above run the SAME blocked math
    # (bit-exactness gated); they differ only in how launches reach the
    # chip (per-chunk dispatch / 4x chunks / one scan program). Through
    # this tunnel the per-chunk dispatch loop is launch-bound (~ms of
    # host-side cost per call against ~130 us of device time) — a
    # property of the 25 ms test tunnel, not of the streamer; production
    # keeps a prefetcher ring resident in HBM and dispatches the scan
    # shape. The metric of record is therefore the best variant (named);
    # every raw per-variant figure stays recorded alongside.
    disp_v = results["stream_sustained_device_resident_gsamples_per_s"]
    results["stream_sustained_device_resident_dispatch_gsamples_per_s"] = (
        disp_v
    )
    cands = {
        "per-chunk dispatch loop": disp_v,
        "bigchunk dispatch loop": results.get(
            "stream_sustained_device_resident_bigchunk_gsamples_per_s"
        ),
        "scan-over-chunks one-program": results.get(
            "stream_sustained_device_resident_scan_gsamples_per_s"
        ),
        "scan-over-chunks one-program (chain-differenced device rate)":
            results.get(
                "stream_sustained_device_resident_scan_chained_gsamples_per_s"
            ),
        "resident-ring unrolled one-program": results.get(
            "stream_sustained_device_resident_ring_gsamples_per_s"
        ),
        "resident-ring unrolled (chain-differenced device rate)":
            results.get(
                "stream_sustained_device_resident_ring_chained_gsamples_per_s"
            ),
    }
    finite = {
        nm: v for nm, v in cands.items()
        if isinstance(v, (int, float)) and v == v
    }
    if finite:
        best_nm = max(finite, key=lambda nm: finite[nm])
        results["stream_sustained_device_resident_gsamples_per_s"] = (
            finite[best_nm]
        )
        results["stream_device_resident_formulation"] = (
            "blocked hop-block Toeplitz (BlockedChunkStreamer); "
            f"best launch variant: {best_nm}"
        )


    # Mid-stream checkpoint: save/load the carry, continue one chunk, and
    # require the continuation to be bit-identical to the unbroken stream.
    import tempfile

    t0 = time.time()
    with tempfile.NamedTemporaryFile(suffix=".npz", delete=False) as f:
        ckpt = f.name
    np.savez(ckpt, tail=mid_tail, next_chunk=half)
    results["stream_ckpt_save_ms"] = round((time.time() - t0) * 1e3, 3)
    t0 = time.time()
    with np.load(ckpt) as z:
        tail_r, k_r = jnp.asarray(z["tail"]), int(z["next_chunk"])
    results["stream_ckpt_restore_ms"] = round((time.time() - t0) * 1e3, 3)
    os.unlink(ckpt)
    want, _ = run_chunk(half, jnp.asarray(mid_tail))
    got, _ = run_chunk(k_r, tail_r)
    bitexact = bool((np.asarray(got) == np.asarray(want)).all())
    results["stream_ckpt_resume_bitexact"] = int(bitexact)
    assert bitexact, "checkpoint resume diverged"

    # Correctness gate on the final chunk's steady-state interior.
    y = np.asarray(out)[hop : -(n - hop)]
    ref = x[(n_chunks - 1) * chunk_samples + hop :][: len(y)]
    results["stream_tail_chunk_snr_db"] = round(snr_db(ref, y), 1)

    # Per-hop-block LATENCY (verdict r3 item 7; the reference records an
    # algorithmic latency, docs/PHASE0_AUDIT.md:25, but never measures a
    # real-time path). The honest real-time metric for the streaming scan
    # is the device time to turn ONE hop block (H samples) around through
    # window->rFFT->irFFT->OLA with the carried tail; the block must beat
    # its own duration (H/sr) for real-time viability. Also reported: the
    # single-dispatch wall (which on a tunneled chip is dominated by the
    # ~25 ms RPC) and the algorithmic latency floor (N samples of
    # lookahead+block).
    from .probes import burst as _pburst
    from .probes import timed_chain_dyn
    from .stages import (
        STREAM_LAT_K_BIG,
        STREAM_LAT_K_SMALL,
        stream_block_probe,
    )

    # Same pathway as bench.py's co-measurement (r3 verdict item 4: the
    # r3 suite built TWO compiled chains here and NaN'd out when their
    # minima landed in different tunnel windows): ONE dynamic-k compile,
    # interleaved-minima bursts, retry before reporting NaN.
    one_block, tail_in = stream_block_probe(cfg)
    fl = timed_chain_dyn(one_block)
    float(fl(1, tail_in))  # the one compile
    lat_s = None
    for _attempt in range(3):
        lat_s = _pburst(fl, tail_in, STREAM_LAT_K_SMALL, STREAM_LAT_K_BIG,
                        reps=6)
        if lat_s is not None:
            break
        time.sleep(10.0)
    results["stream_block_latency_ms"] = (
        round(lat_s * 1e3, 4) if lat_s is not None else float("nan")
    )
    ob = jax.jit(one_block)
    np.asarray(ob(tail_in))  # compile before timing the dispatch
    t0 = time.time()
    np.asarray(ob(tail_in))
    results["stream_block_dispatch_ms"] = round((time.time() - t0) * 1e3, 2)
    results["stream_block_budget_ms"] = round(hop / sr * 1e3, 3)
    results["stream_algorithmic_latency_ms"] = round(n / sr * 1e3, 2)

    # --- device-resident ONE-PROGRAM variant (tiled formulation): the same
    # chunk pipeline with the host chunk loop lowered into a lax.scan
    # inside a single jit, so the whole stream pays ONE dispatch instead
    # of n_chunks. Measured r4 (DESIGN.md postscript): the dispatch loop's
    # launches already pipeline under async dispatch (the ~25 ms
    # per-dispatch+readback tunnel latency is a ROUND-TRIP figure; queued
    # launches overlap the running chunk), so scan and dispatch sit within
    # window noise of each other and the tiled stream is compute-bound.
    # Same chunk boundaries, same carried tail, so the final chunk AND the
    # carried tail must be BIT-IDENTICAL to the dispatch-loop's; recorded
    # below. This is the production shape when a prefetcher keeps a ring of
    # chunks resident in HBM (reference's host-resident 53 M figure is the
    # CPU analog, docs/PHASE0_AUDIT.md:26).
    segs_stacked = jnp.stack(segs)  # [n_chunks, span] (halo-overlapped)

    @jax.jit
    def scan_program(segs2, tail0):
        def step_fn(tail_c, seg):
            frames = hop_block_frames(seg, n, hop, chunk_frames)
            frames = frames.reshape(blocks_per_chunk, block_frames, n)
            y, tail2 = streaming_round_trip_blocks(
                frames, cfg, block_frames, None, carry_tail=tail_c,
                return_carry=True,
            )
            return tail2, y

        tail_f, ys = jax.lax.scan(step_fn, tail0, segs2)
        return ys, tail_f

    ys_w, _ = scan_program(segs_stacked, zero_tail)  # compile + warm
    jax.block_until_ready(ys_w)
    del ys_w
    t0 = time.time()
    ys, tail_scan = scan_program(segs_stacked, zero_tail)
    jax.block_until_ready(ys)
    wall_scan = time.time() - t0
    results["stream_sustained_device_resident_tiled_scan_gsamples_per_s"] = (
        round(total / wall_scan / 1e9, 4)
    )
    # FINAL-chunk + carried-tail comparison (the earlier chunks of the
    # dispatch loop were discarded device-side; the tail carries the
    # cross-chunk state, so comparing it too catches a mid-stream
    # divergence whose output re-converges — advisor r4 finding).
    y_scan_last = np.asarray(ys[-1])
    y_disp_last = np.asarray(last)
    results["stream_scan_vs_dispatch_bitexact"] = int(
        (y_scan_last == y_disp_last).all()
        and np.array_equal(np.asarray(tail_scan), np.asarray(tail))
    )
    # Two independently-compiled programs: bit-exact on every backend
    # observed so far (same ops, same OLA accumulation order), but record
    # the delta rather than aborting the section if a compiler rewrite
    # ever perturbs it; tests/test_streaming_pipeline.py's
    # test_scan_over_chunks_matches_chunked_dispatch gates it hard on CPU.
    results["stream_scan_vs_dispatch_max_abs_delta"] = float(
        np.max(np.abs(y_scan_last - y_disp_last))
    )
    del ys


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--suites",
        default="fft,kernels,ola,e2e,spectral,multichannel,sweep,resample,"
                "convolve,features,iir,streaming",
        help="comma-separated subset",
    )
    args = ap.parse_args(argv)
    suites = set(args.suites.split(","))
    results: Dict[str, float] = {}
    t0 = time.time()
    section_keys: Dict[str, set] = {}
    sections = (
        ("fft", bench_fft),
        ("kernels", bench_kernels),
        ("ola", bench_ola),
        ("e2e", bench_e2e),
        ("spectral", bench_spectral),
        ("multichannel", bench_multichannel),
        ("sweep", bench_sweep),
        ("resample", bench_resample),
        ("convolve", bench_convolve),
        ("features", bench_features),
        ("iir", bench_iir),
        ("streaming", bench_streaming),
    )
    # One flushed progress line per suite: the remote tunnel can hang
    # mid-run and a single end-of-run print would lose every completed
    # measurement (same policy as bench/stages.main_pipeline).
    for name, fn in sections:
        if name not in suites:
            continue
        before = set(results)
        fn(results)
        section_keys[name] = set(results) - before
        partial = {k: v for k, v in results.items() if k in section_keys[name]}
        print(json.dumps({"suite": name, **partial}), flush=True)
        if args.out:
            # Incremental: a tunnel hang/timeout mid-run must not lose the
            # completed suites (both r2 TPU attempts died in one section).
            snap = dict(results, _backend=jax.default_backend(),
                        _wall_s=round(time.time() - t0, 1), _partial=name)
            with open(args.out, "w") as f:
                f.write(json.dumps(snap) + "\n")

    # NaN auto-retry across windows (r4 verdict item 4: the timing guard
    # rightly refuses to publish cross-window artifacts as numbers, but the
    # artifact of record must then CIRCLE BACK — 18 cells incl. a
    # BASELINE-named FIR leg shipped NaN in r4). Re-run the owning section
    # after a window-change wait, merging only the previously-NaN keys
    # that came back finite, until clean or the retry budget expires.
    # Leftovers get an explicit annotation instead of silence.
    def _nan_keys():
        import math as _math

        return [
            k for k, v in results.items()
            if isinstance(v, float) and _math.isnan(v)
        ]

    retry_budget = float(os.environ.get(
        "CRLOT_SUITE_NAN_RETRY_S",
        "900" if jax.default_backend() == "tpu" else "0",
    ))
    # Anchor the budget at the START OF THE RETRY LOOP, not at suite start:
    # a contended main pass (observed 1049 s, r5) would otherwise consume
    # the whole budget and ship 58 NaNs with zero retry attempts.
    deadline = time.time() + retry_budget
    attempts = 0
    while _nan_keys() and time.time() + 60.0 < deadline:
        attempts += 1
        bad = set(_nan_keys())
        owners = [nm for nm, ks in section_keys.items() if ks & bad]
        print(json.dumps({"nan_retry": attempts, "cells": sorted(bad),
                          "sections": owners}), flush=True)
        time.sleep(min(45.0, max(deadline - time.time() - 30.0, 0.0)))
        for nm in owners:
            fn = dict(sections)[nm]
            fresh: Dict[str, float] = {}
            try:
                fn(fresh)
            except Exception as e:  # noqa: BLE001 — tunnel flake mid-retry
                print(json.dumps({"nan_retry_error": f"{type(e).__name__}"}),
                      flush=True)
                continue
            for k in section_keys[nm] & bad:
                v = fresh.get(k)
                if isinstance(v, (int, float)) and not (
                    isinstance(v, float) and v != v
                ):
                    results[k] = v
            if args.out:
                snap = dict(results, _backend=jax.default_backend(),
                            _wall_s=round(time.time() - t0, 1),
                            _partial=f"nan_retry:{nm}")
                with open(args.out, "w") as f:
                    f.write(json.dumps(snap) + "\n")
    # The NaN retry fills individual cells but does not re-derive the
    # best-launch-variant headline (a retry can fill the chain-differenced
    # scan cell AFTER the in-section merge already ran) — recompute it.
    _variant_cells = {
        "per-chunk dispatch loop":
            "stream_sustained_device_resident_dispatch_gsamples_per_s",
        "bigchunk dispatch loop":
            "stream_sustained_device_resident_bigchunk_gsamples_per_s",
        "scan-over-chunks one-program":
            "stream_sustained_device_resident_scan_gsamples_per_s",
        "scan-over-chunks one-program (chain-differenced device rate)":
            "stream_sustained_device_resident_scan_chained_gsamples_per_s",
        "resident-ring unrolled one-program":
            "stream_sustained_device_resident_ring_gsamples_per_s",
        "resident-ring unrolled (chain-differenced device rate)":
            "stream_sustained_device_resident_ring_chained_gsamples_per_s",
    }
    _finite_v = {
        nm: results[k] for nm, k in _variant_cells.items()
        if isinstance(results.get(k), (int, float))
        and results[k] == results[k]
    }
    if _finite_v:
        _best_nm = max(_finite_v, key=lambda nm: _finite_v[nm])
        results["stream_sustained_device_resident_gsamples_per_s"] = (
            _finite_v[_best_nm]
        )
        results["stream_device_resident_formulation"] = (
            "blocked hop-block Toeplitz (BlockedChunkStreamer); "
            f"best launch variant: {_best_nm}"
        )

    leftover = _nan_keys()
    if leftover:
        results["_nan_annotations"] = {
            k: (
                f"unmeasurable across {attempts + 1} window attempts "
                "within the retry budget: interleaved chain minima landed "
                "in different tunnel rate regimes (timing guard refuses "
                "to publish cross-window artifacts)"
            )
            for k in leftover
        }
    results["_nan_retry_attempts"] = attempts
    results["_backend"] = jax.default_backend()
    results["_wall_s"] = round(time.time() - t0, 1)
    line = json.dumps(results)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
