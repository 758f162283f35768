"""Silence trimming and activity segmentation.

Frame-level activity is computed in-jit (dB RMS against a threshold
relative to the signal peak — static shapes, one reduction pass); the
data-dependent part (variable-length trims, interval lists) is a thin
host-side step on the boolean mask, because a jit program cannot return
data-dependent shapes. This mirrors `detect_onsets`' mask-then-host
convention (pitch.py).

The reference toolkit has no segmentation stage; this is the standard
"cut the silence before you batch" front-end an ML-pipeline user expects.
"""

from __future__ import annotations

from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .core.types import StftConfig

__all__ = [
    "activity_mask",
    "trim_silence",
    "split_silence",
    "frames_to_time",
    "time_to_frames",
]


def frames_to_time(frames, cfg: StftConfig, sr: float) -> np.ndarray:
    """Frame indices -> seconds (host helper for onset/tempo/segmentation
    consumers). With `cfg.center` frame f is centered at f*hop; otherwise
    the convention is the frame's center at f*hop + frame_size/2."""
    f = np.asarray(frames, np.float64)
    offset = 0.0 if cfg.center else cfg.frame_size / 2.0
    return (f * cfg.hop_size + offset) / float(sr)


def time_to_frames(times, cfg: StftConfig, sr: float) -> np.ndarray:
    """Seconds -> nearest frame indices (inverse of `frames_to_time`,
    clipped at 0)."""
    t = np.asarray(times, np.float64)
    offset = 0.0 if cfg.center else cfg.frame_size / 2.0
    f = np.rint((t * float(sr) - offset) / cfg.hop_size).astype(np.int64)
    return np.maximum(f, 0)


@partial(jax.jit, static_argnames=("cfg", "top_db"))
def activity_mask(
    signal: jnp.ndarray, cfg: StftConfig, top_db: float = 60.0
) -> jnp.ndarray:
    """Boolean per-frame activity `[..., T] -> [..., F]`: a frame is
    active when its RMS is within `top_db` dB of the signal's peak RMS
    frame (per batch element). All-silent input yields all-False."""
    from .features import frame_rms

    rms = frame_rms(jnp.asarray(signal, jnp.float32), cfg)  # [..., F]
    db = 20.0 * jnp.log10(jnp.maximum(rms, 1e-12))
    ref = jnp.max(db, axis=-1, keepdims=True)
    return (db > ref - top_db) & (ref > -120.0)


def _frame_span_to_samples(
    first: int, last: int, cfg: StftConfig, length: int
) -> Tuple[int, int]:
    """[first, last] active frame span -> sample span. With center=True
    frame f is centered at f*hop; otherwise it covers
    [f*hop, f*hop + frame_size)."""
    hop, n = cfg.hop_size, cfg.frame_size
    if cfg.center:
        start = first * hop - n // 2
        end = last * hop + n // 2 + 1
    else:
        start = first * hop
        end = last * hop + n
    return max(0, start), min(length, end)


def trim_silence(
    signal, cfg: StftConfig, top_db: float = 60.0
) -> Tuple[np.ndarray, Tuple[int, int]]:
    """Trim leading/trailing silence from 1-D audio. Returns
    `(trimmed, (start, end))` with `trimmed = signal[start:end]` as a host
    array. All-silent input returns an empty slice `(0, 0)`."""
    x = np.asarray(signal, np.float32)
    if x.ndim != 1:
        raise ValueError(f"trim_silence expects 1-D audio, got {x.shape}")
    mask = np.asarray(activity_mask(x, cfg, top_db=top_db))
    idx = np.nonzero(mask)[0]
    if idx.size == 0:
        return x[:0], (0, 0)
    start, end = _frame_span_to_samples(
        int(idx[0]), int(idx[-1]), cfg, len(x)
    )
    return x[start:end], (start, end)


def split_silence(
    signal, cfg: StftConfig, top_db: float = 60.0
) -> List[Tuple[int, int]]:
    """Split 1-D audio at silence: the list of `(start, end)` sample
    intervals covering each contiguous active region (non-overlapping,
    ascending; empty list for all-silent input)."""
    x = np.asarray(signal, np.float32)
    if x.ndim != 1:
        raise ValueError(f"split_silence expects 1-D audio, got {x.shape}")
    mask = np.asarray(activity_mask(x, cfg, top_db=top_db)).astype(np.int8)
    if not mask.any():
        return []
    edges = np.diff(np.concatenate([[0], mask, [0]]))
    starts = np.nonzero(edges == 1)[0]
    ends = np.nonzero(edges == -1)[0] - 1  # inclusive frame index
    out = []
    for f0, f1 in zip(starts, ends):
        s, e = _frame_span_to_samples(int(f0), int(f1), cfg, len(x))
        if out and s <= out[-1][1]:
            out[-1] = (out[-1][0], e)  # merge frame-overlapping regions
        else:
            out.append((s, e))
    return out
