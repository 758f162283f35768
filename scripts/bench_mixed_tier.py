"""Mixed-precision DFT tier experiment: can any 2-pass-containing scheme
clear the 60 dB round-trip gate? (VERDICT r1 item 4.)

Emulates the MXU pass structure EXACTLY with explicit bf16 splits
(round-to-nearest via astype, matching XLA's bf16x3 decomposition), so the
SNR grid is measurable on CPU — the numerics are backend-independent; only
throughput needs the chip. Schemes per matmul:

  3    : a_hi.B_hi + a_lo.B_hi + a_hi.B_lo   (HIGH tier, 3 passes)
  2a   : (a_hi + a_lo).B_hi                  (2 passes; basis single-rounded)
  2b   : a_hi.(B_hi + B_lo)                  (2 passes; activation
                                              single-rounded; the "residual
                                              split on the constant bases
                                              only" variant — the basis
                                              split is free at design time)
  1    : a_hi.B_hi

Measured verdict (v5e-independent, recorded in docs/DESIGN.md): every
scheme containing a 2-pass stage lands 53-60 dB — the best mixed variants
(fwd 3-pass + inv 2b: 59.9 dB; Im-only 2-pass: 60.0 dB) sit exactly AT the
gate with zero margin. The floor is structural: a bf16 pass carries 8
mantissa bits of one operand pairing, and reaching ~2^-16 product error
requires the hi.hi + both cross terms = 3 passes. REJECTED; HIGH (3-pass)
stays the default tier.

Run: python scripts/bench_mixed_tier.py   (forces CPU; prints the SNR grid)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import ml_dtypes  # noqa: E402
import numpy as np  # noqa: E402

from crlot_tpu.core.types import StftConfig  # noqa: E402
from crlot_tpu.fft.matmul_backend import (  # noqa: E402
    _fold_frames,
    _folded_forward_consts,
    _folded_inverse_consts,
)
from crlot_tpu.metrics import snr_db  # noqa: E402
from crlot_tpu.ola.reference import overlap_add  # noqa: E402
from crlot_tpu.pipeline import _norm_np, _window_f64  # noqa: E402

N, H = 1024, 256
BF = ml_dtypes.bfloat16


def _split_const(a):
    hi = np.asarray(a, np.float32).astype(BF)
    lo = (np.asarray(a, np.float32) - hi.astype(np.float32)).astype(BF)
    return jnp.asarray(hi), jnp.asarray(lo)


def _split_act(a):
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot1(a_bf, b_bf):
    return jnp.dot(a_bf, b_bf, preferred_element_type=jnp.float32)


def _mm(a, b_const, scheme):
    b_hi, b_lo = _split_const(b_const)
    a_hi, a_lo = _split_act(a)
    if scheme == 3:
        return _dot1(a_hi, b_hi) + _dot1(a_lo, b_hi) + _dot1(a_hi, b_lo)
    if scheme == "2b":
        return _dot1(a_hi, b_hi) + _dot1(a_hi, b_lo)
    if scheme == "2a":
        return _dot1(a_hi, b_hi) + _dot1(a_lo, b_hi)
    if scheme == 1:
        return _dot1(a_hi, b_hi)
    raise ValueError(scheme)


def main() -> None:
    cfg = StftConfig(frame_size=N, hop_size=H, center=False)
    w = _window_f64(cfg).astype(np.float32)
    rng = np.random.default_rng(0)
    x = rng.uniform(-0.9, 0.9, 4 * 48000).astype(np.float32)
    f = (len(x) - (N - H)) // H
    idx = np.arange(f)[:, None] * H + np.arange(N)[None, :]
    frames = jnp.asarray(x[idx] * w)
    cb, sb = _folded_forward_consts(N)
    ci, si = _folded_inverse_consts(N)
    norm = _norm_np(cfg, f, (f - 1) * H + N).astype(np.float32)

    def roundtrip(fwd, inv, fwd_im=None, inv_im=None):
        fwd_im = fwd_im or fwd
        inv_im = inv_im or inv
        even, odd = _fold_frames(frames, N)
        re = _mm(even, cb, fwd)
        im = _mm(odd, sb, fwd_im)
        a = _mm(re, ci, inv)
        b = _mm(im, si, inv_im)
        h = N // 2
        mid = a[..., 1:h]
        out = jnp.concatenate(
            [a[..., :1], mid + b, a[..., h : h + 1],
             jnp.flip(mid - b, axis=-1)],
            axis=-1,
        )
        y = np.asarray(overlap_add(out, H)) / np.maximum(norm, 1e-8)
        m = slice(N, len(x) - N)
        return snr_db(x[m], y[: len(x)][m])

    grid = [
        ("3-pass all (HIGH tier)", dict(fwd=3, inv=3)),
        ("1-pass all", dict(fwd=1, inv=1)),
        ("2a all (act split)", dict(fwd="2a", inv="2a")),
        ("2b all (basis split)", dict(fwd="2b", inv="2b")),
        ("mixed: fwd3 inv2a", dict(fwd=3, inv="2a")),
        ("mixed: fwd3 inv2b", dict(fwd=3, inv="2b")),
        ("mixed: fwd2a inv3", dict(fwd="2a", inv=3)),
        ("Im-only 2-pass", dict(fwd=3, inv=3, fwd_im="2a", inv_im="2a")),
    ]
    for name, args in grid:
        print(f"{name:28s} SNR {roundtrip(**args):6.1f} dB")


if __name__ == "__main__":
    main()
