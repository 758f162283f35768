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
                allow_blocked=False,  # one formulation for every chunk
            )
        )
        keep = min(s, total - start)
        out[:, start : start + keep] = y[:, l_ctx : l_ctx + keep]
    return out


class ShardedStreamer:
    """Explicit-state resumable chunk streamer over the mesh.

    Feed equal-shape hop-aligned [C, S] chunks with `feed()` (returns the
    reconstructed predecessor chunk, one chunk of latency — the context
    refeed needs the successor's head) and drain the last chunk with
    `finish()`. The carried state — previous chunk, its left context, and
    the stream-head flag — is an ordinary dict of numpy arrays
    (`state()` / `load_state()`), so a multi-hour stream can checkpoint
    mid-flight and resume in a fresh process with BIT-IDENTICAL output
    (the reference has no streaming checkpoint at all; SURVEY.md §5
    'Checkpoint / resume' makes it a TPU-build requirement).
    """

    def __init__(
        self,
        cfg: StftConfig,
        mesh: Optional[Mesh] = None,
        spectral_fn: Optional[Callable] = None,
    ) -> None:
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else auto_mesh()
        self.spectral_fn = spectral_fn
        self._n_time = self.mesh.shape[TIME_AXIS]
        self._l_ctx = _ctx_len(cfg, self._n_time)
        self._prev: Optional[np.ndarray] = None  # previous chunk
        self._tail: Optional[np.ndarray] = None  # chunk before that
        self._first = True  # next processed chunk is the stream head
        self._s: Optional[int] = None
        self._finished = False  # finish() ends the stream; feed() raises

    def _process(self, left, mid, right, valid_from_mid):
        l_ctx = self._l_ctx
        ext = np.concatenate([left[:, -l_ctx:], mid, right[:, :l_ctx]], axis=1)
        y = sharded_round_trip(
            jnp.asarray(ext), self.cfg, self.mesh, self.spectral_fn,
            valid_len=l_ctx + valid_from_mid,
            valid_start=l_ctx if self._first else 0,
            # Middle chunks satisfy the blocked gates but edge chunks
            # never do: one formulation for every chunk keeps the
            # chunk-vs-one-shot bit-exactness invariant.
            allow_blocked=False,
        )
        self._first = False
        return y[:, l_ctx : l_ctx + mid.shape[1]]

    def feed(
        self, chunk: np.ndarray, force: bool = True
    ) -> Optional[np.ndarray]:
        """Feed one [C, S] chunk; returns the reconstructed PREDECESSOR
        chunk (one chunk of latency — the context refeed needs this
        chunk's head). `force=False` returns the un-forced device array
        instead of numpy: JAX's async dispatch then overlaps this chunk's
        halo exchanges and compute with the caller's work — the depth-2
        prefetch hook the weak-scaling model's `prefetch_basis` names
        (halos are input context, so nothing serializes on the previous
        chunk's OUTPUT)."""
        if self._finished:
            # Silently continuing would reuse the drained chunk as left
            # context with no stream-head masking (advisor r3 finding).
            raise RuntimeError(
                "feed() after finish(): the stream has ended; create a new "
                "ShardedStreamer (or load_state a checkpoint) to continue"
            )
        chunk = np.asarray(chunk, dtype=np.float32)
        if self._s is None:
            self._s = chunk.shape[1]
            unit = self._n_time * self.cfg.hop_size
            if self._s % unit or self._s // self._n_time < self.cfg.frame_size:
                raise ValueError(
                    f"chunk length {self._s} must be a multiple of {unit} "
                    f"with {self._s}//{self._n_time} >= frame_size "
                    f"({self.cfg.frame_size})"
                )
            self._tail = np.zeros_like(chunk)
        elif chunk.shape[1] != self._s:
            raise ValueError(
                f"chunk length changed: {chunk.shape[1]} != {self._s}"
            )
        out = None
        if self._prev is not None:
            out = self._process(
                self._tail, self._prev, chunk, self._s + self._l_ctx
            )
            if force:
                out = np.asarray(out)
            self._tail = self._prev
        self._prev = chunk
        return out

    def finish(self, force: bool = True) -> Optional[np.ndarray]:
        """Drain the final buffered chunk (treats the stream as ended)."""
        self._finished = True
        if self._prev is None:
            return None
        out = self._process(
            self._tail, self._prev, np.zeros_like(self._prev), self._s
        )
        if force:
            out = np.asarray(out)
        self._tail = self._prev
        self._prev = None
        return out

    def state(self) -> dict:
        """Picklable/npz-able checkpoint of the stream position."""
        return {
            "prev": None if self._prev is None else self._prev.copy(),
            "tail": None if self._tail is None else self._tail.copy(),
            "first": self._first,
            "s": self._s,
        }

    def load_state(self, st: dict) -> None:
        self._finished = False  # a restored checkpoint resumes the stream
        self._prev = None if st["prev"] is None else np.asarray(
            st["prev"], np.float32)
        self._tail = None if st["tail"] is None else np.asarray(
            st["tail"], np.float32)
        self._first = bool(st["first"])
        self._s = None if st["s"] is None else int(st["s"])


def sharded_stream_iter(
    chunks: Iterator[np.ndarray],
    cfg: StftConfig,
    mesh: Optional[Mesh] = None,
    spectral_fn: Optional[Callable] = None,
) -> Iterator[np.ndarray]:
    """Generator variant for true unbounded streams: consumes [C, S] chunks
    (all the same hop-aligned shape) and yields reconstructed [C, S] chunks
    with one chunk of latency (context refeed needs the successor's head)."""
    streamer = ShardedStreamer(cfg, mesh, spectral_fn)
    for chunk in chunks:
        out = streamer.feed(chunk)
        if out is not None:
            yield out
    out = streamer.finish()
    if out is not None:
        yield out
