"""Unbounded-length sharded streaming: chunk-level overlap-save.

BASELINE.json config 5: hour-long multi-channel streams, time-blocks sharded
over the mesh, end-to-end samples/s. A stream of any length is processed in
fixed-shape chunks (one compile), each extended with `L_ctx >= frame_size`
samples of real context on both sides so every kept output sample sees its
full frame coverage — the chunk-level analog of the reference Framer's
overlap retention (framer.cc:164). Kept regions tile the stream exactly and
the result is bit-identical to one giant `sharded_round_trip` over the whole
stream (asserted in tests), while host memory stays O(chunk).

On a multi-host slice the same code runs under `jax.distributed` with the
mesh's time axis laid across hosts: the intra-chunk halos ride ICI, and only
the per-chunk context refeed crosses DCN (via the host).
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh

from ..core.types import StftConfig
from .mesh import CHANNEL_AXIS, TIME_AXIS, auto_mesh
from .sharded_pipeline import sharded_round_trip


def _ctx_len(cfg: StftConfig, n_time: int) -> int:
    unit = n_time * cfg.hop_size
    return -(-cfg.frame_size // unit) * unit


def sharded_stream(
    x: np.ndarray,  # [channels, T] (host array; any length)
    cfg: StftConfig,
    mesh: Optional[Mesh] = None,
    chunk_samples: int = 1 << 20,
    spectral_fn: Optional[Callable] = None,
) -> np.ndarray:
    """Process a long stream chunk-by-chunk on the mesh; returns [C, T]."""
    if mesh is None:
        mesh = auto_mesh()
    n_time = mesh.shape[TIME_AXIS]
    n_ch = mesh.shape[CHANNEL_AXIS]
    n, hop = cfg.frame_size, cfg.hop_size
    x = np.asarray(x, dtype=np.float32)
    channels, total = x.shape
    if channels % n_ch != 0:
        raise ValueError(f"channels ({channels}) % mesh channel ({n_ch}) != 0")
    unit = n_time * hop
    s = max(chunk_samples // unit, 1) * unit
    if s // n_time < n:
        s = -(-n * n_time // unit) * unit  # ensure block >= frame
    l_ctx = _ctx_len(cfg, n_time)
    ext = s + 2 * l_ctx

    out = np.zeros_like(x)
    for start in range(0, total, s):
        ext_start = start - l_ctx
        buf = np.zeros((channels, ext), dtype=np.float32)
        lo = max(0, ext_start)
        hi = min(total, ext_start + ext)
        if hi > lo:
            buf[:, lo - ext_start : hi - ext_start] = x[:, lo:hi]
        valid = int(np.clip(total - ext_start, 0, ext))
        y = np.asarray(
            sharded_round_trip(
                jnp.asarray(buf), cfg, mesh, spectral_fn,
                valid_len=valid,
                valid_start=max(0, -ext_start),  # first chunk: stream head
            )
        )
        keep = min(s, total - start)
        out[:, start : start + keep] = y[:, l_ctx : l_ctx + keep]
    return out


def sharded_stream_iter(
    chunks: Iterator[np.ndarray],
    cfg: StftConfig,
    mesh: Optional[Mesh] = None,
    spectral_fn: Optional[Callable] = None,
) -> Iterator[np.ndarray]:
    """Generator variant for true unbounded streams: consumes [C, S] chunks
    (all the same hop-aligned shape) and yields reconstructed [C, S] chunks
    with one chunk of latency (context refeed needs the successor's head)."""
    if mesh is None:
        mesh = auto_mesh()
    n_time = mesh.shape[TIME_AXIS]
    l_ctx = _ctx_len(cfg, n_time)
    prev: Optional[np.ndarray] = None  # previous chunk
    tail_ctx: Optional[np.ndarray] = None  # chunk before that (tail only)
    s: Optional[int] = None

    def process(left, mid, right, valid_from_mid, first):
        ext = np.concatenate(
            [left[:, -l_ctx:], mid, right[:, :l_ctx]], axis=1
        )
        valid = l_ctx + valid_from_mid
        y = np.asarray(
            sharded_round_trip(
                jnp.asarray(ext), cfg, mesh, spectral_fn,
                valid_len=valid,
                valid_start=l_ctx if first else 0,
            )
        )
        return y[:, l_ctx : l_ctx + mid.shape[1]]

    first = True
    for chunk in chunks:
        chunk = np.asarray(chunk, dtype=np.float32)
        if s is None:
            s = chunk.shape[1]
            unit = n_time * cfg.hop_size
            if s % unit or s // n_time < cfg.frame_size:
                raise ValueError(
                    f"chunk length {s} must be a multiple of {unit} with "
                    f"{s}//{n_time} >= frame_size ({cfg.frame_size})"
                )
            tail_ctx = np.zeros_like(chunk)
        if prev is not None:
            yield process(tail_ctx, prev, chunk, s + l_ctx, first)
            first = False
            tail_ctx = prev
        prev = chunk
    if prev is not None:
        yield process(tail_ctx, prev, np.zeros_like(prev), s, first)
