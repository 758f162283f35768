"""Signal-conditioning effects: pre-emphasis / de-emphasis and mu-law
companding.

Pre-emphasis is the classic speech front-end high-pass y[n] = x[n] -
coef*x[n-1] (a pure FIR difference — one shifted subtract, embarrassingly
parallel). De-emphasis inverts it with the single-pole IIR y[n] = x[n] +
coef*y[n-1], which rides the framework's log-depth associative scan
(`iir.lfilter`) rather than a sequential loop, so both directions stay
O(log T) depth on device.

Mu-law companding (ITU-T G.711 mu=255 by default) is elementwise:
`mu_compress`/`mu_expand` map [-1, 1] through the log companding curve,
and `quantize=True` additionally rounds to the 2^bits discrete levels a
WaveNet-style categorical model consumes (returned as int32 codes via
`mu_law_encode`/`mu_law_decode`).

The reference toolkit has no conditioning stage (its pipeline starts at
framing, dsp/frame/framer.cc); these are the standard front-end ops a
speech/ML user expects between WAV I/O and the STFT.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from .iir import lfilter

__all__ = [
    "preemphasis",
    "deemphasis",
    "mu_compress",
    "mu_expand",
    "mu_law_encode",
    "mu_law_decode",
]


@partial(jax.jit, static_argnames=("coef",))
def preemphasis(
    signal: jnp.ndarray,
    coef: float = 0.97,
    zi: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """High-pass pre-emphasis `y[n] = x[n] - coef * x[n-1]` on `[..., T]`.

    `zi` is the previous chunk's final sample `[..., 1]` for streaming
    continuity (defaults to the scipy/librosa convention x[-1] = x[0],
    which makes y[0] = (1-coef)*x[0] rather than a boundary click).
    """
    x = jnp.asarray(signal, jnp.float32)
    prev = x[..., :1] if zi is None else jnp.asarray(zi, jnp.float32)
    return x - jnp.float32(coef) * jnp.concatenate(
        [prev, x[..., :-1]], axis=-1
    )


@partial(jax.jit, static_argnames=("coef",))
def deemphasis(
    signal: jnp.ndarray,
    coef: float = 0.97,
    zi: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Inverse of `preemphasis`: the one-pole IIR `y[n] = x[n] +
    coef*y[n-1]` via the associative scan. With matching `coef` and the
    default boundary convention, `deemphasis(preemphasis(x))`
    reconstructs `x` up to f32 scan accumulation (> 100 dB for audio).

    `zi` is the previous chunk's final OUTPUT sample `[..., 1]` for
    streaming (default reproduces the librosa zi = x[0]*coef choice that
    inverts preemphasis's own default).
    """
    x = jnp.asarray(signal, jnp.float32)
    if zi is None:
        # lfilter's DF2T state z0 = coef * y[-1]; the inverting choice is
        # y[-1] = x_original[0] = x[0] / (1 - coef).
        z0 = x[..., :1] * jnp.float32(coef / (1.0 - coef))
    else:
        z0 = jnp.asarray(zi, jnp.float32) * jnp.float32(coef)
    y, _ = lfilter([1.0], [1.0, -float(coef)], x, zi=z0)
    return y


@partial(jax.jit, static_argnames=("mu", "quantize"))
def mu_compress(
    signal: jnp.ndarray, mu: float = 255.0, quantize: bool = False
) -> jnp.ndarray:
    """Mu-law compress `[-1, 1] -> [-1, 1]`:
    `sign(x) * log1p(mu*|x|) / log1p(mu)`. With `quantize=True` the output
    is additionally snapped to the `mu+1` discrete level centers."""
    x = jnp.clip(jnp.asarray(signal, jnp.float32), -1.0, 1.0)
    m = jnp.float32(mu)
    y = jnp.sign(x) * jnp.log1p(m * jnp.abs(x)) / jnp.log1p(m)
    if quantize:
        # Same level grid as mu_law_encode/decode: mu+1 centers at
        # code*2/mu - 1 for integer codes in [0, mu].
        y = jnp.clip(jnp.floor((y + 1.0) / 2.0 * m + 0.5), 0.0, m) \
            * 2.0 / m - 1.0
    return y


@partial(jax.jit, static_argnames=("mu",))
def mu_expand(signal: jnp.ndarray, mu: float = 255.0) -> jnp.ndarray:
    """Inverse mu-law: `sign(y) * ((1+mu)^|y| - 1) / mu`."""
    y = jnp.asarray(signal, jnp.float32)
    m = jnp.float32(mu)
    return jnp.sign(y) * (jnp.expm1(jnp.abs(y) * jnp.log1p(m))) / m


@partial(jax.jit, static_argnames=("bits",))
def mu_law_encode(signal: jnp.ndarray, bits: int = 8) -> jnp.ndarray:
    """`[-1, 1]` audio -> int32 codes in `[0, 2^bits)` (mu = 2^bits - 1)."""
    mu = float((1 << bits) - 1)
    y = mu_compress(signal, mu=mu)  # [-1, 1]
    return jnp.clip(
        jnp.floor((y + 1.0) / 2.0 * mu + 0.5), 0, mu
    ).astype(jnp.int32)


@partial(jax.jit, static_argnames=("bits",))
def mu_law_decode(codes: jnp.ndarray, bits: int = 8) -> jnp.ndarray:
    """int32 codes in `[0, 2^bits)` -> `[-1, 1]` audio (inverse of
    `mu_law_encode` up to the quantization step)."""
    mu = float((1 << bits) - 1)
    y = codes.astype(jnp.float32) * 2.0 / mu - 1.0
    return mu_expand(y, mu=mu)
