"""Bounded-memory streaming round-trip: lax.scan over hop blocks.

SURVEY.md §5 'Long-context': unbounded-length streams with bounded state —
the reference's Framer compacting buffer + OLA ring (framer.cc:169-179,
OLAAccumulator.cc:249-258) become a `lax.scan` whose carry is the ring pytree.
One scan step consumes `block_frames` new frames and emits `block_frames*hop`
finished samples; per-chip memory stays O(ring + block) regardless of stream
length, and the whole stream is ONE device program (no per-frame dispatch).

This is the single-device analog of the time-block sharded pipeline; for
multi-chip, shard the scan's frame batches by channel (distributed module).
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger("crlot_tpu.streaming")

from .core.types import StftConfig
from .fft import dispatch as _fft
from .ola.norm import build_norm_linear
from .window.windows import get_window


@partial(
    jax.jit,
    static_argnames=("cfg", "block_frames", "spectral_fn", "return_carry"),
)
def streaming_round_trip_blocks(
    frame_blocks: jnp.ndarray,  # [num_blocks, block_frames, N] raw frames
    cfg: StftConfig,
    block_frames: int,
    spectral_fn=None,
    carry_tail=None,  # [N - hop] tail from a previous call (chunk chaining)
    return_carry: bool = False,
):
    """Process framed blocks through window->rFFT->irFFT->OLA with a carried
    ring; returns [num_blocks * block_frames * hop] samples (steady-state
    normalized; the first frame's leading hop is emitted on the first step).

    The carry is the overlap tail: after OLA-ing a block spanning
    block_frames*hop + (N - hop) samples, the last (N - hop) stay in the
    carry and seed the next block (earliest-frame-first order, so output is
    bit-identical to the offline pipeline's interior).
    """
    n, hop = cfg.frame_size, cfg.hop_size
    halo = n - hop
    window_np = get_window(cfg.window, n, cfg.periodic)
    window_f64 = get_window(cfg.window, n, cfg.periodic, dtype=np.float64)
    window = jnp.asarray(window_np)
    norm_np = build_norm_linear(
        window_np.astype(np.float64) ** 2 if cfg.synthesis_window else window_np,
        -(-halo // hop) * hop + block_frames * hop,
        n,
        hop,
    )
    block_len = block_frames * hop
    norm = jnp.asarray(norm_np[:block_len])
    eps = jnp.float32(cfg.eps)

    from .ola.reference import overlap_add

    from .core.types import FftBackend
    from .fft.matmul_backend import (
        MAX_MATMUL_NFFT,
        roundtrip_composed_matmul,
        roundtrip_folded_tiled,
        tiled_supported,
    )
    from .spectral import resolve_per_bin_response

    on_matmul = _fft._pick(cfg.fft_backend, n) == FftBackend.MATMUL
    per_bin = (
        resolve_per_bin_response(spectral_fn, n)
        if spectral_fn is not None and on_matmul and n <= MAX_MATMUL_NFFT
        else None
    )
    on_packed = on_matmul and tiled_supported(n)
    prec = _fft.to_lax_precision(cfg.fft_precision)
    syn64 = window_f64 if cfg.synthesis_window else None

    def step(carry_tail, frames):
        # frames: [block_frames, N]; round-trip per block. On the matmul
        # path this is the packed tiled formulation — or, with a fixed
        # per-bin response, ONE composed [N, N] matmul (the offline
        # pipeline's blocked Toeplitz form folds the OLA into the kernel,
        # which conflicts with the scan's carried OLA tail — composed is
        # the streaming-safe formulation) — with no complex
        # interleave (same lowerings as pipeline.round_trip's TPU path,
        # so chunked-stream output stays consistent with the offline one);
        # other cases go through rfft -> spectral_fn -> irfft.
        if per_bin is not None:
            out_f = roundtrip_composed_matmul(
                frames, n, window_f64, per_bin, syn64, precision=prec
            )
        elif on_packed and (
            spectral_fn is None or hasattr(spectral_fn, "packed")
        ):
            if spectral_fn is None:
                out_f = roundtrip_folded_tiled(
                    frames, n, window_f64, syn64, precision=prec
                )
            else:
                from .fft.matmul_backend import (
                    irfft_folded_tiled_parts,
                    packed_to_tiled_parts,
                    rfft_folded_tiled_parts,
                    tiled_parts_to_packed,
                )

                re512, re_nyq, im_eff = rfft_folded_tiled_parts(
                    frames, n, window, prec
                )
                re, im = spectral_fn.packed(*tiled_parts_to_packed(
                    re512, re_nyq, im_eff
                ))
                out_f = irfft_folded_tiled_parts(
                    *packed_to_tiled_parts(re, im, n), n, prec
                )
                if cfg.synthesis_window:
                    out_f = out_f * window
        else:
            spec = _fft.rfft_windowed(
                frames, n, window_f64, backend=cfg.fft_backend,
                precision=prec,
            )
            if spectral_fn is not None:
                spec = spectral_fn(spec)
            out_f = _fft.irfft(
                spec, n, backend=cfg.fft_backend, precision=prec
            )
            if cfg.synthesis_window:
                out_f = out_f * window
        acc = overlap_add(
            out_f, hop, out_len=block_len + halo,
            init_head=carry_tail,
        )
        emitted = acc[..., :block_len] / jnp.maximum(norm, eps)
        new_tail = acc[..., block_len:]
        return new_tail, emitted

    init_tail = (
        jnp.zeros(frame_blocks.shape[2:-1] + (halo,), dtype=jnp.float32)
        if carry_tail is None
        else jnp.asarray(carry_tail, jnp.float32)
    )
    final_tail, blocks_out = jax.lax.scan(step, init_tail, frame_blocks)
    out = blocks_out.reshape(-1)
    return (out, final_tail) if return_carry else out


def streaming_round_trip(
    signal: np.ndarray,
    cfg: StftConfig,
    block_frames: int = 64,
    spectral_fn=None,
) -> Tuple[np.ndarray, int]:
    """Stream a long 1-D signal through the scan pipeline.

    Returns (output, valid_from): output[t] reconstructs signal[t] for
    t >= valid_from (the first `halo` samples lack full window coverage in
    steady-state normalization, like the reference's streaming OLA warm-up).
    `spectral_fn` follows round_trip's contract (fixed per-bin responses
    ride the composed one-matmul path; packed ops skip complex interleave).
    """
    if cfg.center:
        raise ValueError("streaming pipeline is uncentered (center=False)")
    n, hop = cfg.frame_size, cfg.hop_size
    x = np.asarray(signal, dtype=np.float32)
    num_frames = max((len(x) - (n - hop)) // hop, 0)
    blocks = num_frames // block_frames
    if blocks == 0:
        raise ValueError(
            f"signal too short: {len(x)} samples < "
            f"{block_frames * hop + (n - hop)} needed for one block"
        )
    f = blocks * block_frames
    idx = np.arange(f)[:, None] * hop + np.arange(n)[None, :]
    frames = jnp.asarray(x[idx].reshape(blocks, block_frames, n))
    out = np.asarray(
        streaming_round_trip_blocks(frames, cfg, block_frames, spectral_fn)
    )
    return out, n - hop


def process_wav_file(
    infile: str,
    outfile: str,
    cfg: StftConfig,
    spectral_fn=None,
    block_frames: int = 64,
    blocks_per_chunk: int = 16,
    bits: int = 16,
) -> int:
    """File-to-file streaming round-trip at bounded memory: read a WAV in
    hop-aligned chunks, run each through the scan pipeline with the OLA
    tail carried across chunks (so output equals an unbroken stream), and
    write incrementally. Handles any file length and channel count; frames
    past EOF are zero-padded (reference Framer ZERO_PAD semantics,
    dsp/frame/framer.cc:128-161). Returns samples written per channel.

    Warm-up/cool-down: the first and last (frame_size - hop) samples have
    partial window coverage (steady-state normalization), matching
    streaming_round_trip's `valid_from` contract.
    """
    from .io.wav import WavReader, WavWriter

    if cfg.center:
        raise ValueError("streaming pipeline is uncentered (center=False)")
    n, hop = cfg.frame_size, cfg.hop_size
    chunk_frames = block_frames * blocks_per_chunk
    chunk_out = chunk_frames * hop

    reader = WavReader(infile)
    channels = reader.channels
    total = reader.num_frames
    logger.info(
        "stream %s -> %s: %d ch, %d frames @ %d Hz, N=%d H=%d, "
        "chunk=%d frames",
        infile, outfile, channels, total, reader.sample_rate, n, hop,
        chunk_frames,
    )
    with WavWriter(
        outfile, channels, reader.sample_rate, bits=bits
    ) as writer:
        carries = [None] * channels
        pos = 0
        written = 0
        while written < total:
            span = (chunk_frames - 1) * hop + n
            raw = reader.read(pos, min(span, max(total - pos, 0)))
            if raw.shape[-1] < span:  # EOF: zero-pad trailing frames
                raw = np.pad(raw, [(0, 0), (0, span - raw.shape[-1])])
            idx = (
                np.arange(chunk_frames)[:, None] * hop
                + np.arange(n)[None, :]
            )
            out_ch = []
            for c in range(channels):
                frames = jnp.asarray(
                    raw[c][idx].reshape(blocks_per_chunk, block_frames, n)
                )
                out, carries[c] = streaming_round_trip_blocks(
                    frames, cfg, block_frames, spectral_fn,
                    carry_tail=carries[c], return_carry=True,
                )
                out_ch.append(np.asarray(out))
            chunk = np.stack(out_ch)[:, : min(chunk_out, total - written)]
            writer.write(chunk)
            written += chunk.shape[-1]
            pos += chunk_out
            logger.debug(
                "stream %s: %d/%d samples written", outfile, written, total
            )
    logger.info("stream %s done: %d samples/channel written", outfile, written)
    return written
