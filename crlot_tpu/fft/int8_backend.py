"""Two-limb int8 DFT matmuls: ~2x the HIGH tier's MXU rate.

The v5e MXU executes int8 x int8 -> int32 at twice the bf16 FLOP rate
(394 vs 197 T/s peak; measured ~2.1x per dot on this chip —
scripts/bench_int8_probe.py: a 3-pass int8 dot runs 49 us where the
f32 Precision.HIGH dot of the same shape runs 105 us, sustaining ~360
int8 TOPS).

Scheme ("int8x2"): every matmul operand is quantized to 14 significant
bits as `q = hi * 128 + lo` with both limbs int8 (|hi| <= 127,
|lo| <= 64 — the split is EXACT). The product of two split operands has
four limb pairs; the lowest (lo @ lo, ~2^-16 relative) sits below the
operands' own quantization noise (~2^-15) and is dropped, so a full
dot is THREE int8 MXU passes with exact int32 accumulation:

    x @ b ~= s_x * s_b * 128 * (128 * (xh @ bh) + (xh @ bl) + (xl @ bh))

Per-matmul int32 sums stay below 2^23 for contraction dims <= 512, so
the int32 -> f32 recombination is exact as well; the only error sources
are the two operand roundings. Measured round-trip SNR ~78 dB — between
the HIGH tier (3 bf16 passes, ~95 dB) and the reference's 60 dB gate
(bench/e2e_benchmark.cc:336-343), at half the MXU time.

Scales: the constant DFT bases take a per-COLUMN scale (folded into the
f32 recombination; exact column scaling commutes out of the dot). The
runtime operand takes a dynamic per-ROW (= per-frame) scale from an
abs-max reduction — one fused pass, so quiet signals and quiet frames
keep full quantization headroom.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from .matmul_backend import (
    _tiled_consts,
    _tiled_inverse_gained,
    tiled_supported,
)

# Max quantized magnitude: 127 * 128 (hi limb saturates at 127, lo at 0).
QMAX = 16256.0


def _split_limbs_np(q: np.ndarray):
    """Exact two-limb split of integer-valued |q| <= QMAX (f64 numpy)."""
    hi = np.clip(np.rint(q / 128.0), -127, 127)
    lo = q - hi * 128.0
    assert np.abs(lo).max(initial=0.0) <= 127
    return hi.astype(np.int8), lo.astype(np.int8)


@lru_cache(maxsize=None)
def _quantize_basis(key, basis_bytes: bytes, shape):
    """Per-column 14-bit quantization of a constant basis.

    Returns (hi int8 [n, m], lo int8 [n, m], col_scale f32 [m]) with
    basis[:, j] ~= (hi + lo/128)[:, j] * 128 * col_scale[j]."""
    b = np.frombuffer(basis_bytes, dtype=np.float64).reshape(shape)
    col_max = np.abs(b).max(axis=0)
    col_max = np.where(col_max == 0.0, 1.0, col_max)
    q = np.rint(b * (QMAX / col_max))
    hi, lo = _split_limbs_np(q)
    return hi, lo, (col_max / QMAX).astype(np.float32)


def quantize_basis(b_f64: np.ndarray, key: str = ""):
    b = np.ascontiguousarray(b_f64, dtype=np.float64)
    return _quantize_basis(key, b.tobytes(), b.shape)


def _quantize_dynamic(x: jnp.ndarray):
    """14-bit two-limb quantization with a dynamic per-ROW scale.

    Returns (hi int8, lo int8, s f32 [..., 1]) with x ~= (hi*128+lo) * s.
    The scale is per matmul row (= per frame), so a quiet frame next to a
    loud one keeps its own full quantization headroom. All limb
    arithmetic is exact in f32 (values <= QMAX; /128 is an exponent
    shift), so the only error is the single round()."""
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    s = jnp.maximum(amax, jnp.float32(1e-30)) / QMAX
    q = jnp.round(x * (1.0 / s))
    hi = jnp.clip(jnp.round(q * (1.0 / 128.0)), -127, 127)
    lo = q - hi * 128.0
    return hi.astype(jnp.int8), lo.astype(jnp.int8), s


def _dot_i32(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.dot_general(
        a,
        b,
        (((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def dot_i8x2(x: jnp.ndarray, qbasis) -> jnp.ndarray:
    """f32 [..., n] @ quantized basis [n, m] -> f32 [..., m].

    Three int8 limb products in TWO MXU launches: hi@hi, plus both cross
    terms (hi@lo + lo@hi) merged into one dot over a doubled contraction
    dim ([xh | xl] @ [bl ; bh]) — same MXU FLOPs, but one fewer [.., m]
    int32 intermediate materialized to HBM (the XLA-path bottleneck)."""
    bh, bl, cs = qbasis
    bh = jnp.asarray(bh)
    bl = jnp.asarray(bl)
    xh, xl, s = _quantize_dynamic(x.astype(jnp.float32))
    hh = _dot_i32(xh, bh)
    cross = _dot_i32(
        jnp.concatenate([xh, xl], axis=-1),
        jnp.concatenate([bl, bh], axis=0),  # constant-folded at compile
    )
    acc = hh.astype(jnp.float32) * 128.0 + cross.astype(jnp.float32)
    return acc * ((128.0 * s) * jnp.asarray(cs))


def int8_supported(nfft: int) -> bool:
    """int32 accumulation is exact to contraction dim ~2^17 (127*127*K
    < 2^31); the int32->f32 recombine rounds at 2^-24 relative, an order
    below the 2^-15 operand quantization — so the whole tiled-path range
    qualifies."""
    return tiled_supported(nfft)


@lru_cache(maxsize=None)
def _tiled_consts_i8(nfft: int):
    """Int8-quantized tiled cores (borders stay f32 — they're VPU work)."""
    c512, s_eff, ci512, si_eff, cvec, alt, sign_h = _tiled_consts(nfft)
    return (
        quantize_basis(c512, f"c512:{nfft}"),
        quantize_basis(s_eff, f"s_eff:{nfft}"),
        quantize_basis(ci512, f"ci512:{nfft}"),
        quantize_basis(si_eff, f"si_eff:{nfft}"),
        cvec,
        alt,
        sign_h,
    )


@lru_cache(maxsize=None)
def _tiled_inverse_gained_i8(nfft: int, gains_bytes: bytes):
    """Inverse cores with per-bin gains folded in BEFORE quantization.

    Gains scale rows (the contraction dim); per-column quantization
    renormalizes afterwards, so the representation error stays 2^-14 of
    each output column's true magnitude — EQ still costs zero."""
    ci512_g, si_eff_g, cvec_g, g_nyq = _tiled_inverse_gained(
        nfft, gains_bytes
    )
    return (
        quantize_basis(ci512_g, f"ci512_g:{nfft}:{hash(gains_bytes)}"),
        quantize_basis(si_eff_g, f"si_eff_g:{nfft}:{hash(gains_bytes)}"),
        cvec_g,
        g_nyq,
    )


def rfft_folded_tiled_parts_i8(x: jnp.ndarray, nfft: int, window_f32=None):
    """Int8x2 variant of matmul_backend.rfft_folded_tiled_parts."""
    qc, qs, _, _, _, alt, sign_h = _tiled_consts_i8(nfft)
    h = nfft // 2
    y = x.astype(jnp.float32)
    if window_f32 is not None:
        y = y * window_f32
    head = y[..., 1:h]
    tail = jnp.flip(y[..., h + 1 :], axis=-1)
    e512 = jnp.concatenate([y[..., :1], head + tail], axis=-1)
    e_n = y[..., h : h + 1]
    o = head - tail
    altj = jnp.asarray(alt)
    re512 = dot_i8x2(e512, qc) + e_n * altj
    re_nyq = jnp.sum(e512 * altj, axis=-1, keepdims=True) + e_n * sign_h
    im_eff = dot_i8x2(o, qs)
    return re512, re_nyq, im_eff


def irfft_folded_tiled_parts_i8(
    re512: jnp.ndarray,
    re_nyq: jnp.ndarray,
    im_eff: jnp.ndarray,
    nfft: int,
    per_bin_gains_f64=None,
) -> jnp.ndarray:
    """Int8x2 variant of matmul_backend.irfft_folded_tiled_parts."""
    _, _, qci, qsi, cvec, alt, sign_h = _tiled_consts_i8(nfft)
    g_nyq = 1.0
    if per_bin_gains_f64 is not None:
        qci, qsi, cvec, g_nyq = _tiled_inverse_gained_i8(
            nfft,
            np.ascontiguousarray(per_bin_gains_f64, np.float64).tobytes(),
        )
    h = nfft // 2
    altj = jnp.asarray(alt)
    a512 = dot_i8x2(re512, qci) + (re_nyq * g_nyq) * (altj / nfft)
    a_nyq = (
        jnp.sum(re512 * jnp.asarray(cvec), axis=-1, keepdims=True)
        + re_nyq * (g_nyq * sign_h / nfft)
    )
    b = dot_i8x2(im_eff, qsi)
    mid = a512[..., 1:h]
    return jnp.concatenate(
        [a512[..., :1], mid + b, a_nyq, jnp.flip(mid - b, axis=-1)],
        axis=-1,
    )


def roundtrip_composed_i8(
    frames: jnp.ndarray,
    nfft: int,
    analysis_window_f64: np.ndarray,
    per_bin_response: np.ndarray,
    synthesis_window_f64=None,
) -> jnp.ndarray:
    """The composed one-matmul response round-trip on the int8 MXU path:
    the windowed-circulant matrix (matmul_backend._composed_roundtrip_basis)
    is pre-quantized per-column and the single dot runs as three int8 limb
    products. SNR caveat: for MILD responses the circulant is near-diagonal,
    so per-column quantization noise grows ~sqrt(K) relative to the signal
    (unlike the flat DFT bases) — measured ~65 dB for a +-10 dB EQ at
    N=1024, degrading toward the 60 dB gate as the response flattens toward
    identity; the f32 composed path (roundtrip_composed_matmul) has no such
    penalty."""
    from .matmul_backend import _composed_roundtrip_basis

    m = _composed_roundtrip_basis(
        nfft,
        np.ascontiguousarray(analysis_window_f64, np.float64).tobytes(),
        None
        if synthesis_window_f64 is None
        else np.ascontiguousarray(synthesis_window_f64, np.float64).tobytes(),
        np.ascontiguousarray(per_bin_response, np.complex128).tobytes(),
    )
    return dot_i8x2(frames, quantize_basis(m, f"composed:{nfft}"))


def roundtrip_folded_tiled_i8(
    frames: jnp.ndarray,
    nfft: int,
    analysis_window_f64: np.ndarray,
    synthesis_window_f64=None,
    per_bin_gains_f64=None,
) -> jnp.ndarray:
    """irfft(rfft(frames * w) [* g]) with every matmul on the int8 MXU
    path: 12 int8 passes total vs the HIGH tier's 12 bf16 passes, at
    ~2x the per-pass rate (see module docstring). Numerics: ~78 dB
    round-trip SNR, 18 dB above the reference gate."""
    w = jnp.asarray(np.asarray(analysis_window_f64, np.float32))
    re512, re_nyq, im_eff = rfft_folded_tiled_parts_i8(frames, nfft, w)
    out = irfft_folded_tiled_parts_i8(
        re512, re_nyq, im_eff, nfft, per_bin_gains_f64
    )
    if synthesis_window_f64 is not None:
        out = out * jnp.asarray(np.asarray(synthesis_window_f64, np.float32))
    return out
