"""Fully-fused STFT round-trip Pallas kernel: framing + windowed folded
rDFT + inverse + unfold in ONE pass over HBM.

Why: the XLA folded-matmul round-trip (matmul_backend.roundtrip_folded_matmul)
materializes every elementwise stage ([F,N] frames, fold operands, packed
spectrum, unfold) in HBM — ~8 full passes over the 46 MB frame matrix at
N=1024/H=256, which measures HBM-bound at ~0.43 ms while the pure matmul
compute bound is ~0.22 ms. This kernel keeps everything between the signal
and the output frames in VMEM:

  per frame tile [TM]:
    DMA hop-block rows of the padded signal (bx) and of its per-block
    lane-reversed copy (fbx) -> VMEM
    build y[:, :N/2] (windowed frame low half) and z[:, :N/2] (windowed
    REVERSED frame low half) from R/2 shifted block views each
    fold:   e = [y0 | y[1:h]+z[:h-1] | y_h],  o = [0 | y[1:h]-z[:h-1] | 0]
    matmul: Re = e @ C, Im = o @ S          (half-size forward bases)
            A = Re @ Cinv, B = Im @ Sinv    (half-size inverse bases)
    unfold: out[:, :K] = A + B;  out[:, K:] = (A - B) @ J
    write out tile -> HBM

Mosaic has no lane-reversal primitive, so the two reversals the folded DFT
needs are handled structurally: the INPUT reversal comes from fbx (row-wise
jnp.flip of the block matrix, one cheap XLA pass — reversed frame f chunk r
== fbx[f + R-1-r], same ascending-row access pattern as the forward chunks),
and the OUTPUT reversal is folded into the exchange-matrix matmul J (0/1
entries, exact in bf16).

Precision: matches the pipeline's HIGH tier by an explicit 3-pass bf16
hi/lo split (a@b ~= ah@bh + ah@bl + al@bh) with f32 accumulation — measured
slightly MORE accurate than XLA Precision.HIGH on the same operands. Bases
are float64-designed (fft/matmul_backend consts), split into bf16 hi/lo on
host.

Reference parity: computes irfft(rfft(frame * window)) exactly like
kissfft_adapter.cc:96-167 (including 1/N on the inverse); this is the hot
path of bench/e2e_benchmark.cc:138-186.

Constraints (else callers fall back to the XLA folded path):
  nfft % hop == 0, (nfft//hop) % 2 == 0, hop % 128 == 0, nfft <= 1024
  (bf16 hi/lo bases for N=2048 would need ~17 MB VMEM), f32 only.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .matmul_backend import _folded_forward_consts, _folded_inverse_consts

_SUBLANES = 8
_DEF_TILE = 128
MAX_FUSED_NFFT = 1024


def fused_rt_supported(nfft: int, hop: int) -> bool:
    return (
        nfft % 2 == 0
        and 4 <= nfft <= MAX_FUSED_NFFT
        and hop >= 128
        and hop % 128 == 0
        and nfft % hop == 0
        and (nfft // hop) % 2 == 0
    )


def _split_bf16(a: np.ndarray):
    """f32 -> (hi, lo) bf16 pair with hi + lo == f32 value to bf16x2."""
    import ml_dtypes

    a32 = np.asarray(a, np.float32)
    hi = a32.astype(ml_dtypes.bfloat16)
    lo = (a32 - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return hi, lo


def _split_f32(a32):
    """Exact in-kernel hi/lo split WITHOUT a bf16 convert round-trip.

    hi = a32 with the mantissa truncated to bf16's 8 bits (bitmask — stays in
    f32 layout; Mosaic lowers f32<->bf16 layout-change upcasts at ~10x the
    cost of the matmul they feed, see CLAUDE.md), lo = a32 - hi (exact: hi
    matches a32's top bits so the subtraction cancels without rounding).
    hi is exactly representable in bf16; lo rounds to bf16 with |err| <=
    2^-9 |a|."""
    bits = jax.lax.bitcast_convert_type(a32, jnp.int32)
    hi = jax.lax.bitcast_convert_type(
        bits & jnp.int32(-65536), jnp.float32
    )
    return hi, a32 - hi


@lru_cache(maxsize=None)
def _fused_consts(nfft: int):
    """bf16 hi/lo splits of the folded bases + the output exchange matrix.

    All [K, K] (S row-padded, Sinv col-padded with zeros so the operand's
    first/last columns need no masking); J is [K, N-K] with
    J[K-1-1-p ...] — J[j, p] = 1 iff j == (N//2) - 1 - p + 1, i.e. the
    column flip out[:, K + p] = (A - B)[:, N//2 - 1 - p + ...]."""
    k = nfft // 2 + 1
    c, s = _folded_forward_consts(nfft)
    s_full = np.zeros((k, k), np.float32)
    s_full[1 : k - 1] = s
    cinv, sinv = _folded_inverse_consts(nfft)
    sinv_full = np.zeros((k, k), np.float32)
    sinv_full[:, 1 : k - 1] = sinv
    # out[:, K + p] = (A - B)[:, h - 1 - p + 1] = d[:, (h) - 1 - p ... ]
    # True frames: out[N - n] = (A - B)[n] for n = 1..h-1; lane K+p has
    # n = N - (K + p) = h - 1 - p.
    j = np.zeros((k, nfft - k), np.float32)
    h = nfft // 2
    for p in range(nfft - k):
        j[h - 1 - p, p] = 1.0
    return (
        _split_bf16(c),
        _split_bf16(s_full),
        _split_bf16(cinv),
        _split_bf16(sinv_full),
        _split_bf16(j),
    )


def _dot3(a32, bh_ref, bl_ref):
    """3-pass bf16 emulation of an f32 matmul (Precision.HIGH equivalent).

    Activation split via bitmask truncation (one int mask + one subtract in
    f32 layout + two downcasts) — no bf16->f32 upcast anywhere."""
    hi, lo = _split_f32(a32)
    ah = hi.astype(jnp.bfloat16)
    al = lo.astype(jnp.bfloat16)
    d = lambda p, q: jnp.dot(  # noqa: E731
        p, q[:], preferred_element_type=jnp.float32
    )
    return (d(ah, bl_ref) + d(al, bh_ref)) + d(ah, bh_ref)


def _dot2_exact_b(a32, bh_ref):
    """2-pass variant for a B matrix EXACT in bf16 (its lo limb is
    identically zero — e.g. the 0/1 exchange matrix J): d(ah, bl) would
    multiply by zeros, so only the activation split pays. Values are
    bitwise identical to _dot3 with a zero bl (x + 0.0 first changes
    nothing), one full MXU pass cheaper."""
    hi, lo = _split_f32(a32)
    d = lambda p, q: jnp.dot(  # noqa: E731
        p, q[:], preferred_element_type=jnp.float32
    )
    return d(lo.astype(jnp.bfloat16), bh_ref) + d(
        hi.astype(jnp.bfloat16), bh_ref
    )


def _flip_lanes(src, jref):
    """Exact lane reversal of an f32 [rows, hop] block via the bf16 exchange
    matrix (Mosaic has no lane-reversal primitive). Exact because the hi/lo
    split reconstructs src exactly and J's 0/1 entries multiply losslessly
    with f32 accumulation."""
    hi, lo = _split_f32(src)
    d = lambda p: jnp.dot(  # noqa: E731
        p.astype(jnp.bfloat16), jref[:], preferred_element_type=jnp.float32
    )
    return d(hi) + d(lo)


def _build_fold_operands(nfft, hop, r_count, n_rows, bx_s, w_ref, wf_ref,
                         ybuf, zbuf, ebuf, obuf, jhop=None, flip_src=None,
                         valid=None):
    """Build the folded-DFT even/odd operands for `n_rows` consecutive
    frames into ebuf/obuf.

    y chunk r = bx[f + r] * w chunk r (windowed frame low half);
    z chunk r = flip(bx[f + R-1-r]) * flip(w) chunk r (windowed REVERSED
    frame low half) — the flip comes from the in-kernel exchange matmul
    (jhop) or a precomputed flipped copy (flip_src). `valid` (optional
    [n_rows, 1] bool) zero-masks phantom frames before the matmuls.
    """
    h = nfft // 2
    half = r_count // 2
    for r in range(half):
        ybuf[:, r * hop : (r + 1) * hop] = (
            bx_s[r : r + n_rows, :] * w_ref[0:1, r * hop : (r + 1) * hop]
        )
        shift = r_count - 1 - r
        rev = (
            flip_src[shift : shift + n_rows, :]
            if flip_src is not None
            else _flip_lanes(bx_s[shift : shift + n_rows, :], jhop)
        )
        zbuf[:, r * hop : (r + 1) * hop] = (
            rev * wf_ref[0:1, r * hop : (r + 1) * hop]
        )
    ycol = bx_s[half : half + n_rows, 0:1] * w_ref[0:1, h : h + 1]

    sel = (
        (lambda v: v)
        if valid is None
        else (lambda v: jnp.where(valid, v, 0.0))
    )
    ebuf[:, 0:1] = sel(ybuf[:, 0:1])
    ebuf[:, 1:h] = sel(ybuf[:, 1:h] + zbuf[:, 0 : h - 1])
    ebuf[:, h : h + 1] = sel(ycol)
    zero_col = jnp.zeros((n_rows, 1), jnp.float32)
    obuf[:, 0:1] = zero_col
    obuf[:, 1:h] = sel(ybuf[:, 1:h] - zbuf[:, 0 : h - 1])
    obuf[:, h : h + 1] = zero_col


def _rt_parts(ebuf, obuf, ch, cl, sh, sl, cih, cil, sih, sil,
              spectral_packed=None):
    """Folded forward + inverse: (a, b) with out[:, :K] = a + b and
    out[:, K:] = flip-cols(a - b).

    `spectral_packed` (optional) applies a nonlinear per-bin fn on the
    packed (Re, Im) planes IN VMEM between the forward and inverse
    matmuls — the spectrum never reaches HBM (the fused answer to the
    nonlinear-processing slot, e2e_benchmark.cc:161-163; the XLA path
    materializes spectrum + fn output as four [F, K] HBM arrays). The
    planes here are genuine packed layout (re[:, k] = Re X[k] for
    k = 0..h; im[:, 0] = im[:, h] = 0 structurally), the same contract as
    spectral.py's `.packed` fns."""
    re = _dot3(ebuf[:], ch, cl)
    im = _dot3(obuf[:], sh, sl)
    if spectral_packed is not None:
        re, im = spectral_packed(re, im)
    return _dot3(re, cih, cil), _dot3(im, sih, sil)


def _convert_spectral(spectral_packed, rows: int, k: int):
    """Hoist a `.packed` fn's closed-over arrays into explicit operands:
    a pallas kernel cannot capture traced constants (e.g.
    spectral_subtraction's noise profile, composed EQ curves), so the fn
    is traced to a jaxpr here and its consts ride as VMEM inputs
    (jax.closure_convert does NOT do this — it only hoists perturbable
    outer-scope tracers, leaving concrete arrays embedded). Returns
    (closed_fn, const_arrays_2d, const_shapes): the kernel rebuilds each
    const from its (1, size) VMEM ref via reshape and calls
    closed_fn(re, im, *consts)."""
    import jax

    example = [
        jax.ShapeDtypeStruct((rows, k), jnp.float32) for _ in range(2)
    ]
    closed_jaxpr = jax.make_jaxpr(
        lambda re, im: spectral_packed(re, im)
    )(*example)
    consts = closed_jaxpr.consts

    def closed(re, im, *cs):
        outs = jax.core.eval_jaxpr(closed_jaxpr.jaxpr, list(cs), re, im)
        return tuple(outs)

    shapes = tuple(tuple(np.shape(c)) for c in consts)
    flat = [jnp.reshape(jnp.asarray(c), (1, -1)) for c in consts]
    return closed, flat, shapes


def _spectral_fn_from_refs(spectral, sp_refs):
    """Effective (re, im) -> (re, im) fn inside the kernel, or None."""
    if spectral is None:
        return None
    closed, shapes = spectral

    def fn(re, im):
        consts = [
            r[:].reshape(shp) for r, shp in zip(sp_refs, shapes)
        ]
        return closed(re, im, *consts)

    return fn


def _rt_kernel(nfft, hop, r_count, tm, flip_mm, spectral, *args):
    n_sp = len(spectral[1]) if spectral is not None else 0
    if flip_mm:
        (bx_hbm, w_ref, wf_ref, jhop,
         ch, cl, sh, sl, cih, cil, sih, sil, jh, jl) = args[:14]
        sp_refs = args[14 : 14 + n_sp]
        (out_ref, bx_s, ybuf, zbuf, ebuf, obuf, sems) = args[14 + n_sp :]
        fbx_s = None
    else:
        (bx_hbm, fbx_hbm, w_ref, wf_ref,
         ch, cl, sh, sl, cih, cil, sih, sil, jh, jl) = args[:14]
        sp_refs = args[14 : 14 + n_sp]
        (out_ref, bx_s, fbx_s, ybuf, zbuf, ebuf, obuf, sems) = (
            args[14 + n_sp :]
        )
        jhop = None
    spectral_packed = _spectral_fn_from_refs(spectral, sp_refs)
    i = pl.program_id(0)
    rows = bx_s.shape[0]
    d1 = pltpu.make_async_copy(
        bx_hbm.at[pl.ds(i * tm, rows), :], bx_s, sems.at[0]
    )
    d1.start()
    if not flip_mm:
        d2 = pltpu.make_async_copy(
            fbx_hbm.at[pl.ds(i * tm, rows), :], fbx_s, sems.at[1]
        )
        d2.start()
    d1.wait()
    if not flip_mm:
        d2.wait()

    _build_fold_operands(
        nfft, hop, r_count, tm, bx_s, w_ref, wf_ref, ybuf, zbuf, ebuf, obuf,
        jhop=jhop, flip_src=fbx_s,
    )
    a, b = _rt_parts(ebuf, obuf, ch, cl, sh, sl, cih, cil, sih, sil,
                     spectral_packed)
    h = nfft // 2
    out_ref[:, 0 : h + 1] = a + b
    out_ref[:, h + 1 : nfft] = _dot2_exact_b(a - b, jh)


@lru_cache(maxsize=None)
def _exchange_bf16(hop: int) -> np.ndarray:
    """[hop, hop] lane-exchange matrix; 0/1 entries are exact in bf16."""
    import ml_dtypes

    j = np.zeros((hop, hop), ml_dtypes.bfloat16)
    j[np.arange(hop), hop - 1 - np.arange(hop)] = 1.0
    return j


@partial(
    jax.jit,
    static_argnames=("nfft", "hop", "n_frames", "tile", "interpret",
                     "flip_mm", "spectral_packed"),
)
def _rt_call(
    padded: jnp.ndarray,
    w32: jnp.ndarray,
    nfft: int,
    hop: int,
    n_frames: int,
    tile: int = _DEF_TILE,
    interpret: bool = False,
    flip_mm: bool = True,
    spectral_packed=None,
) -> jnp.ndarray:
    r_count = nfft // hop
    k = nfft // 2 + 1
    tm = tile
    grid = -(-n_frames // tm)
    extra = -(-(r_count - 1) // _SUBLANES) * _SUBLANES
    rows_total = grid * tm + extra
    need = rows_total * hop
    if padded.shape[-1] < need:
        padded = jnp.pad(padded, (0, need - padded.shape[-1]))
    bx = padded[:need].reshape(rows_total, hop)
    w2 = w32.reshape(1, nfft)
    wf2 = jnp.flip(w2, axis=-1)

    (ch, cl), (sh, sl), (cih, cil), (sih, sil), (jh, jl) = [
        tuple(map(jnp.asarray, pair)) for pair in _fused_consts(nfft)
    ]

    const_spec = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    hbm_spec = pl.BlockSpec(memory_space=pltpu.HBM)
    if flip_mm:
        inputs = [bx, w2, wf2, jnp.asarray(_exchange_bf16(hop))]
        in_specs = [hbm_spec, const_spec((1, nfft)), const_spec((1, nfft)),
                    const_spec((hop, hop))]
        scratch = [pltpu.VMEM((tm + extra, hop), jnp.float32)]
        n_sems = 1
    else:
        fbx = jnp.flip(bx, axis=-1)
        inputs = [bx, fbx, w2, wf2]
        in_specs = [hbm_spec, hbm_spec, const_spec((1, nfft)),
                    const_spec((1, nfft))]
        scratch = [
            pltpu.VMEM((tm + extra, hop), jnp.float32),
            pltpu.VMEM((tm + extra, hop), jnp.float32),
        ]
        n_sems = 2
    inputs += [ch, cl, sh, sl, cih, cil, sih, sil, jh, jl]
    in_specs += [
        const_spec((k, k)),
        const_spec((k, k)),
        const_spec((k, k)),
        const_spec((k, k)),
        const_spec((k, k)),
        const_spec((k, k)),
        const_spec((k, k)),
        const_spec((k, k)),
        const_spec((k, nfft - k)),
        const_spec((k, nfft - k)),
    ]
    spectral = None
    if spectral_packed is not None:
        closed, sp_flat, sp_shapes = _convert_spectral(
            spectral_packed, tm, k
        )
        spectral = (closed, sp_shapes)
        inputs += sp_flat
        in_specs += [const_spec(tuple(c.shape)) for c in sp_flat]
    # Inside a shard_map body the varying-axes checker requires the
    # pallas output's vma to be declared; it varies exactly as the
    # signal input does (empty set outside shard_map).
    vma = getattr(jax.typeof(bx), "vma", frozenset())
    out = pl.pallas_call(
        partial(_rt_kernel, nfft, hop, r_count, tm, flip_mm, spectral),
        out_shape=jax.ShapeDtypeStruct((grid * tm, nfft), jnp.float32,
                                       vma=vma),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (tm, nfft), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=scratch + [
            pltpu.VMEM((tm, nfft // 2), jnp.float32),
            pltpu.VMEM((tm, nfft // 2), jnp.float32),
            pltpu.VMEM((tm, k), jnp.float32),
            pltpu.VMEM((tm, k), jnp.float32),
            pltpu.SemaphoreType.DMA((n_sems,)),
        ],
        interpret=interpret,
    )(*inputs)
    return out[:n_frames]


def _rt_ola_kernel(nfft, hop, r_count, tb, n_frames, eps, spectral, *args):
    n_sp = len(spectral[1]) if spectral is not None else 0
    (bx_hbm, w_ref, wf_ref, jhop,
     ch, cl, sh, sl, cih, cil, sih, sil, jh, jl, norm_ref) = args[:15]
    sp_refs = args[15 : 15 + n_sp]
    (out_ref, bx_s, ybuf, zbuf, ebuf, obuf, rtf, sems) = args[15 + n_sp :]
    spectral_packed = _spectral_fn_from_refs(spectral, sp_refs)
    """Round-trip + OLA + normalize in one kernel: out tile = TB normalized
    signal hop-blocks. Computes NF = TB + R - 1 frames per tile (the R-1
    left-boundary frames are recomputed — (R-1)/TB FLOP overhead) so every
    output block's overlap sum completes locally; phantom frames outside
    [0, n_frames) are masked to zero before the matmuls (the OLA edge law:
    only real frames contribute, norm = edge_norm)."""
    i = pl.program_id(0)
    nf = tb + r_count - 1
    rows = bx_s.shape[0]
    d1 = pltpu.make_async_copy(
        bx_hbm.at[pl.ds(i * tb, rows), :], bx_s, sems.at[0]
    )
    d1.start()
    d1.wait()

    # Mask phantom frames: local row g is frame i*tb - (R-1) + g.
    f_abs = (
        jax.lax.broadcasted_iota(jnp.int32, (nf, 1), 0)
        + i * tb - (r_count - 1)
    )
    valid = jnp.logical_and(f_abs >= 0, f_abs < n_frames)
    _build_fold_operands(
        nfft, hop, r_count, nf, bx_s, w_ref, wf_ref, ybuf, zbuf, ebuf, obuf,
        jhop=jhop, valid=valid,
    )
    a, b = _rt_parts(ebuf, obuf, ch, cl, sh, sl, cih, cil, sih, sil,
                     spectral_packed)
    h = nfft // 2
    rtf[:, 0 : h + 1] = a + b
    rtf[:, h + 1 : nfft] = _dot2_exact_b(a - b, jh)

    # OLA: out block j sums frame chunks in ascending frame order
    # (r descending), the canonical summation order of every OLA path.
    r = r_count - 1
    acc = rtf[0:tb, r * hop : (r + 1) * hop]
    for r in range(r_count - 2, -1, -1):
        shift = r_count - 1 - r
        acc = acc + rtf[shift : shift + tb, r * hop : (r + 1) * hop]
    out_ref[:] = acc / jnp.maximum(norm_ref[:], eps)


@partial(
    jax.jit,
    static_argnames=("nfft", "hop", "n_frames", "out_len", "eps", "tile",
                     "interpret", "spectral_packed"),
)
def _rt_ola_call(
    padded: jnp.ndarray,
    w32: jnp.ndarray,
    norm: jnp.ndarray,
    nfft: int,
    hop: int,
    n_frames: int,
    out_len: int,
    eps: float,
    tile: int = _DEF_TILE,
    interpret: bool = False,
    spectral_packed=None,
) -> jnp.ndarray:
    r_count = nfft // hop
    k = nfft // 2 + 1
    tb = tile
    nf = tb + r_count - 1
    blocks_total = n_frames + r_count - 1  # == full/hop, hop-aligned
    grid = -(-blocks_total // tb)
    # Scratch rows: NF frames need NF + R-1 signal blocks; sublane-align.
    bx_rows = -(-(nf + r_count - 1) // _SUBLANES) * _SUBLANES
    rows_needed = (grid - 1) * tb + bx_rows
    # pbx row j = signal block j - (R-1) (front zeros realize left phantoms).
    front = (r_count - 1) * hop
    need = rows_needed * hop - front
    if padded.shape[-1] < need:
        padded = jnp.pad(padded, (0, need - padded.shape[-1]))
    pbx = jnp.pad(
        padded[:need], (front, 0)
    ).reshape(rows_needed, hop)
    w2 = w32.reshape(1, nfft)
    wf2 = jnp.flip(w2, axis=-1)
    full = (n_frames - 1) * hop + nfft
    norm_p = jnp.pad(norm, (0, grid * tb * hop - full)).reshape(
        grid * tb, hop
    )

    (ch, cl), (sh, sl), (cih, cil), (sih, sil), (jh, jl) = [
        tuple(map(jnp.asarray, pair)) for pair in _fused_consts(nfft)
    ]

    const_spec = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    spectral = None
    sp_flat = []
    if spectral_packed is not None:
        closed, sp_flat, sp_shapes = _convert_spectral(
            spectral_packed, nf, k
        )
        spectral = (closed, sp_shapes)
    out = pl.pallas_call(
        partial(_rt_ola_kernel, nfft, hop, r_count, tb, n_frames, eps,
                spectral),
        out_shape=jax.ShapeDtypeStruct((grid * tb, hop), jnp.float32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            const_spec((1, nfft)),
            const_spec((1, nfft)),
            const_spec((hop, hop)),
            const_spec((k, k)),
            const_spec((k, k)),
            const_spec((k, k)),
            const_spec((k, k)),
            const_spec((k, k)),
            const_spec((k, k)),
            const_spec((k, k)),
            const_spec((k, k)),
            const_spec((k, nfft - k)),
            const_spec((k, nfft - k)),
            pl.BlockSpec((tb, hop), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + [const_spec(tuple(c.shape)) for c in sp_flat],
        out_specs=pl.BlockSpec(
            (tb, hop), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((bx_rows, hop), jnp.float32),
            pltpu.VMEM((nf, nfft // 2), jnp.float32),
            pltpu.VMEM((nf, nfft // 2), jnp.float32),
            pltpu.VMEM((nf, k), jnp.float32),
            pltpu.VMEM((nf, k), jnp.float32),
            pltpu.VMEM((nf, nfft), jnp.float32),
            pltpu.SemaphoreType.DMA((1,)),
        ],
        interpret=interpret,
    )(pbx, w2, wf2, jnp.asarray(_exchange_bf16(hop)),
      ch, cl, sh, sl, cih, cil, sih, sil, jh, jl, norm_p, *sp_flat)
    return out.reshape(-1)[:out_len]


def roundtrip_signal_fused(
    padded: jnp.ndarray,
    nfft: int,
    hop: int,
    n_frames: int,
    analysis_window_f64: np.ndarray,
    norm: jnp.ndarray,
    eps: float = 1e-8,
    out_len: int | None = None,
    interpret: bool = False,
    tile: int = _DEF_TILE,
    spectral_packed=None,
) -> jnp.ndarray:
    """[..., Lp] padded signal -> [..., out_len] NORMALIZED reconstruction:
    framing + windowed folded rDFT + [nonlinear per-bin fn] + inverse +
    unfold + overlap-add + divide-by-norm in a single pass over HBM
    (HIGH-tier numerics).

    `norm` is the edge-aware COLA norm over the full OLA span
    ((n_frames-1)*hop + nfft samples, pipeline._norm_np). Output still
    carries the center padding — callers slice [pad : pad + length].
    `spectral_packed` (a hashable `(re, im) -> (re, im)` fn of elementwise
    jnp ops, e.g. `spectral.noise_gate(...).packed`) runs in VMEM — the
    spectrum never touches HBM, unlike the XLA nonlinear path.
    """
    if not fused_rt_supported(nfft, hop):
        raise ValueError(f"fused round-trip unsupported for N={nfft} H={hop}")
    full = (n_frames - 1) * hop + nfft
    if out_len is None:
        out_len = full
    w32 = jnp.asarray(np.asarray(analysis_window_f64, np.float32))
    fn = lambda p: _rt_ola_call(  # noqa: E731
        p, w32, norm, nfft, hop, n_frames, out_len, eps, tile=tile,
        interpret=interpret, spectral_packed=spectral_packed,
    )
    if padded.ndim == 1:
        return fn(padded)
    lead = padded.shape[:-1]
    flat = padded.reshape(-1, padded.shape[-1])
    outs = [fn(flat[i]) for i in range(flat.shape[0])]
    return jnp.stack(outs).reshape(lead + outs[0].shape)


def roundtrip_frames_fused(
    padded: jnp.ndarray,
    nfft: int,
    hop: int,
    n_frames: int,
    analysis_window_f64: np.ndarray,
    interpret: bool = False,
    flip_mm: bool = True,
    spectral_packed=None,
) -> jnp.ndarray:
    """[..., Lp] padded signal -> [..., n_frames, nfft] round-trip output
    frames (windowing + forward + [nonlinear per-bin fn] + inverse DFT
    fused; HIGH-tier numerics).

    `padded` must already carry the center padding (pipeline applies
    core.padding.pad_signal first); frame f covers padded[f*hop : f*hop+nfft].
    `flip_mm=True` derives the reversed-frame operand in-kernel from the
    exchange matmul (one HBM input); False DMAs a precomputed flipped copy.
    `spectral_packed` applies a nonlinear fn on the packed Re/Im planes in
    VMEM — the FRAMES-level variant used by the sharded mesh path, whose
    masking + tail-seeding OLA protocol needs per-frame outputs.
    """
    if not fused_rt_supported(nfft, hop):
        raise ValueError(f"fused round-trip unsupported for N={nfft} H={hop}")
    w32 = jnp.asarray(np.asarray(analysis_window_f64, np.float32))
    fn = lambda p: _rt_call(  # noqa: E731
        p, w32, nfft, hop, n_frames, interpret=interpret, flip_mm=flip_mm,
        spectral_packed=spectral_packed,
    )
    if padded.ndim == 1:
        return fn(padded)
    # vmap of a pallas_call with HBM-resident inputs does not lower on
    # Mosaic; unroll the (small, static) batch axes instead.
    lead = padded.shape[:-1]
    flat = padded.reshape(-1, padded.shape[-1])
    outs = [fn(flat[i]) for i in range(flat.shape[0])]
    return jnp.stack(outs).reshape(lead + outs[0].shape)
