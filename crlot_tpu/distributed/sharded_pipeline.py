"""Sharded STFT -> process -> iSTFT -> OLA over a (channel, time) mesh.

The reference is single-process; this is the multi-chip formulation the TPU
build adds (BASELINE.json north star; SURVEY.md §5/§7): channels shard
embarrassingly, the time axis shards into hop-aligned blocks with one
nearest-neighbor `ppermute` in each direction per step:

  1. pull the RIGHT halo (N - H samples) to frame trailing hops,
  2. frame + window + rFFT + spectral fn + irFFT locally (batched),
  3. local overlap-add,
  4. push the (N - H)-sample OLA tail RIGHT; the received left tail is
     pre-seeded into the local accumulation in earliest-frame-first order,
     so N-device output is BIT-IDENTICAL to the 1-device pipeline
     (tested in tests/test_distributed.py).

Constraints (checked): T % n_time == 0, block % hop == 0, block >= frame
(so halos touch only immediate neighbors), center=False (global centering
would couple edge devices; center on the host or pad explicitly).
"""

from __future__ import annotations

import os
from functools import lru_cache, partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from ..core.types import StftConfig
from ..fft import dispatch as _fft
from ..ola.norm import edge_norm
from ..ola.reference import overlap_add
from ..window.windows import get_window
from .halo import pull_left_halo, pull_right_halo, push_right_tail
from .mesh import CHANNEL_AXIS, TIME_AXIS, auto_mesh, make_mesh


def _blocked_local_round_trip(
    x_local: jnp.ndarray,  # [C_local, T_block]
    window_f64: np.ndarray,
    cfg: StftConfig,
    per_bin: np.ndarray,
    group: int,
    num_frames: int,
    t_block: int,
    n_time: int,
    prec,
) -> jnp.ndarray:
    """Sharded blocked (hop-block Toeplitz) composed round-trip: the
    UN-normalized OLA accumulation for this device's output span.

    Each output sample is ONE kernel row over the signal extended by the
    (N - hop) look-back/look-ahead halos (pulled from both neighbors), so
    the OLA summation ORDER is identical across device counts BY
    CONSTRUCTION — no tail-seeding protocol, no frame matrix, no OLA
    pass (docs/DESIGN.md 'blocked EQ'; deferred in r2, shipped r3). The
    residual N-device-vs-1-device delta is the backend's dot-product
    reduction order WITHIN a row when the local matmul batch differs
    (<= 2 ULP, observed 4.8e-7 on CPU; the MXU's fixed row tiling is
    batch-independent). The global head/tail phantom-frame patches are
    computed on every device (SPMD, identical shapes on every mesh — so
    bit-identical) and applied only on the edge devices via axis_index
    masks.

    Preconditions (gated by the caller): composed_block_supported,
    t_block % (group*hop) == 0, full-coverage frame set (valid_start == 0,
    valid_len == T), num_frames >= 2*(N/hop - 1).

    COMM/COMPUTE OVERLAP (r4): the main hop-block matmul chain reads ONLY
    x_local (zero-padded halos), so it has NO data dependence on the two
    `ppermute`s; the received halos are consumed by small edge-correction
    matmuls ([C, halo] x [halo, group*hop] per boundary block row) that
    come last. XLA's latency-hiding scheduler can therefore issue
    collective-permute-start before the local dot chain and land the
    -done only where the corrections need it — the structural property
    the weak-scaling model's overlap bound assumes (asserted at jaxpr
    level in tests/test_distributed.py). Numerics: zero-padded partial
    rows plus a halo correction reorders the boundary samples' float
    summation vs the single-device full-row dot by at most the split
    point — within the mesh-consistency test's 3e-6 rtol; the GLOBAL
    head/tail edge samples stay bit-identical (patched below).
    """
    from ..fft.matmul_backend import (
        _composed_block_kernel_grouped,
        _composed_roundtrip_basis,
        hopblock_apply,
    )

    n, hop = cfg.frame_size, cfg.hop_size
    halo = n - hop
    r_count = n // hop
    gh = group * hop
    span = (num_frames - 1) * hop + n
    wb = np.ascontiguousarray(window_f64, np.float64).tobytes()
    sb = wb if cfg.synthesis_window else None
    rb = np.ascontiguousarray(per_bin, np.complex128).tobytes()

    # Issue both halo exchanges FIRST (the scheduler overlaps them with
    # the interior matmuls below, which do not consume them).
    left = pull_left_halo(x_local, TIME_AXIS, halo)
    right = pull_right_halo(x_local, TIME_AXIS, halo)

    kern = _composed_block_kernel_grouped(n, hop, group, wb, sb, rb)
    mg = -(-kern.shape[0] // gh)
    if mg * gh != kern.shape[0]:
        kern = np.pad(kern, ((0, mg * gh - kern.shape[0]), (0, 0)))
    # Interior: the single-device program on this block (zero halos).
    acc = hopblock_apply(x_local, kern, gh, t_block, left=halo,
                         precision=prec)
    # Halo corrections. Output sample y[t] (t in [0, t_block)) reads
    # extended positions [t, t + mg*gh) of [left | x_local | right], i.e.
    # y-block b consumes kern rows u = pos - b*gh. The left halo
    # (positions [0, halo)) reaches blocks b*gh < halo; the right halo
    # (positions [halo + t_block, halo + t_block + halo)) reaches blocks
    # with b*gh + mg*gh > halo + t_block.
    kj = jnp.asarray(kern)
    nb = t_block // gh
    for b in range(-(-halo // gh)):
        corr = jnp.dot(left[..., b * gh :], kj[: halo - b * gh, :],
                       precision=prec)
        acc = acc.at[..., b * gh : (b + 1) * gh].add(corr)
    for b in range(nb):
        u_lo = halo + t_block - b * gh
        if u_lo >= mg * gh:
            continue
        hi = min(mg * gh - u_lo, halo)
        corr = jnp.dot(right[..., :hi], kj[u_lo : u_lo + hi, :],
                       precision=prec)
        acc = acc.at[..., b * gh : (b + 1) * gh].add(corr)

    # Exact phantom-frame patches (identical op sequence to
    # roundtrip_composed_blocked so edge devices stay bit-identical to the
    # single-device path): recompute the global head/tail (R-1) hop-blocks
    # from the real boundary frames. The patch frames may straddle the
    # left halo (when t_block < 2*halo), so they read the concatenated
    # view — small matmuls in the consume-the-halo-last set, like the
    # corrections above.
    x_blk = jnp.concatenate([left, x_local, right], axis=-1)
    m = jnp.asarray(_composed_roundtrip_basis(n, wb, sb, rb))
    edge = (r_count - 1) * hop

    def _patch(local_start: int) -> jnp.ndarray:
        frames_small = jnp.stack(
            [
                x_blk[..., local_start + f * hop : local_start + f * hop + n]
                for f in range(r_count - 1)
            ],
            axis=-2,
        )
        of = jnp.matmul(frames_small, m, precision=prec)
        span_l = (r_count - 2) * hop + n
        acc_l = jnp.zeros(of.shape[:-2] + (span_l,), jnp.float32)
        for f in range(r_count - 1):
            acc_l = acc_l.at[..., f * hop : f * hop + n].add(of[..., f, :])
        return acc_l

    t_idx = jax.lax.axis_index(TIME_AXIS)
    # Head: global frames [0, R-1) live at x_blk[halo:] on device 0.
    head = _patch(halo)[..., :edge]
    acc = acc.at[..., :edge].set(
        jnp.where(t_idx == 0, head, acc[..., :edge])
    )
    # Tail: global frames [num_frames-R+1, num_frames) on the last device.
    t0_last = (n_time - 1) * t_block
    tail_local_start = (num_frames - r_count + 1) * hop - t0_last + halo
    tail_span = _patch(tail_local_start)
    tail = tail_span[..., tail_span.shape[-1] - edge :]
    off = span - t0_last  # end of the covered span within the last block
    acc = acc.at[..., off - edge : off].set(
        jnp.where(t_idx == n_time - 1, tail, acc[..., off - edge : off])
    )
    return acc


def _block_round_trip(
    x_local: jnp.ndarray,  # [C_local, T_block]
    norm_local: jnp.ndarray,  # [T_block]
    window_f64: np.ndarray,  # [N] float64 host design (folds into DFT basis)
    cfg: StftConfig,
    total_len: int,
    spectral_fn: Optional[Callable],
    valid_start: int = 0,
    with_metrics: bool = False,
    blocked: Optional[dict] = None,
):
    n, hop = cfg.frame_size, cfg.hop_size
    halo = n - hop
    t_block = x_local.shape[-1]
    frames_per_block = t_block // hop

    from ..core.types import FftBackend
    from ..fft.matmul_backend import (
        irfft_folded_tiled_parts,
        rfft_folded_tiled_parts,
        tiled_supported,
    )
    from ..fft.pallas_rt import fused_rt_supported
    from ..spectral import resolve_per_bin_response

    prec = _fft.to_lax_precision(cfg.fft_precision)
    on_matmul = _fft._pick(cfg.fft_backend, n) == FftBackend.MATMUL
    per_bin = (
        resolve_per_bin_response(spectral_fn, n)
        if spectral_fn is not None and on_matmul
        else None
    )

    if blocked is not None:
        # Fast multi-chip EQ/identity path: hop-block Toeplitz kernel with
        # LEFT + RIGHT halos; summation order identical to the
        # single-device blocked pipeline by construction (each output
        # sample is one kernel row). The caller resolved the per-bin
        # response (ones for identity) when it built the gate.
        acc = _blocked_local_round_trip(
            x_local, window_f64, cfg, blocked["per_bin"], blocked["group"],
            blocked["num_frames"], t_block, blocked["n_time"], prec,
        )
        eps = jnp.float32(cfg.eps)
        # Under the blocked gates the frame span covers the signal exactly
        # (hop | T and hop | N force span == T), so plain eps-guarded
        # division matches the composed path's semantics everywhere —
        # including the zero-coverage head sample, which all formulations
        # divide by eps (reference normalize_and_clear contract).
        out = acc / jnp.maximum(norm_local, eps)
        if not with_metrics:
            return out
        axes = (CHANNEL_AXIS, TIME_AXIS)
        sig = jax.lax.psum(jnp.sum(jnp.square(x_local)), axes)
        noise = jax.lax.psum(jnp.sum(jnp.square(x_local - out)), axes)
        peak = jax.lax.pmax(jnp.max(jnp.abs(out)), axes)
        return out, {
            "signal_energy": sig, "noise_energy": noise, "peak": peak,
        }

    # 1. right halo in (overlap-save for framing)
    right = pull_right_halo(x_local, TIME_AXIS, halo)
    x_ext = jnp.concatenate([x_local, right], axis=-1)

    # 2. local framing (gather-free hop-block slicing); the analysis window
    # folds into the DFT basis on the matmul path (rfft_windowed)
    from ..frame.framing import hop_block_frames

    starts = jnp.arange(frames_per_block) * hop
    frames = hop_block_frames(x_ext, n, hop, frames_per_block)

    # mask frames that do not exist globally (start + N > total_len): only
    # the last device can have these (its halo is zeros anyway, but masking
    # keeps the spectrum exactly equal to the unsharded stft's frame set).
    t_idx = jax.lax.axis_index(TIME_AXIS)
    global_start = t_idx * t_block + starts
    valid = (
        (global_start + n <= total_len) & (global_start >= valid_start)
    )[None, :, None]

    if per_bin is not None:
        # A fixed real per-bin gain composes with the DFT bases into one
        # [N, N] matmul. The offline pipeline's blocked Toeplitz form is
        # NOT used here: it folds the OLA into the kernel, which would
        # bypass the masked-frame + pre-seeded-tail protocol that makes
        # N-device output bit-identical to 1 device.
        from ..fft.matmul_backend import roundtrip_composed_matmul

        out_frames = roundtrip_composed_matmul(
            frames, n, window_f64, per_bin, precision=prec
        )
    elif (
        spectral_fn is not None
        and hasattr(spectral_fn, "packed")
        and on_matmul
        and jax.default_backend() == "tpu"
        and cfg.fft_precision.name == "HIGH"
        and os.environ.get("CRLOT_FUSED_SPECTRAL", "1") != "0"
        and fused_rt_supported(n, hop)
    ):
        # NONLINEAR per-bin fn on the mesh: the frames-level fused kernel
        # (fn applied in VMEM, spectrum never in HBM — the single-chip
        # default since r4) producing per-frame outputs that drop into
        # the unchanged masking + tail-seeding OLA protocol below.
        from ..fft.pallas_rt import roundtrip_frames_fused

        out_frames = roundtrip_frames_fused(
            x_ext, n, hop, frames_per_block, window_f64,
            spectral_packed=spectral_fn.packed,
        )
    elif on_matmul and tiled_supported(n) and (
        spectral_fn is None or hasattr(spectral_fn, "packed")
    ):
        # Packed no-complex path: identity, or a nonlinear per-bin fn that
        # operates on packed Re/Im planes (no complex interleave).
        from ..fft.matmul_backend import (
            packed_to_tiled_parts,
            tiled_parts_to_packed,
        )

        w32 = jnp.asarray(window_f64.astype(np.float32))
        re512, re_nyq, im_eff = rfft_folded_tiled_parts(frames, n, w32, prec)
        if spectral_fn is not None:
            re, im = spectral_fn.packed(*tiled_parts_to_packed(
                re512, re_nyq, im_eff
            ))
            re512, re_nyq, im_eff = packed_to_tiled_parts(re, im, n)
        out_frames = irfft_folded_tiled_parts(
            re512, re_nyq, im_eff, n, prec, None
        )
    else:
        spec = _fft.rfft_windowed(
            frames, n, window_f64, backend=cfg.fft_backend, precision=prec
        )
        if spectral_fn is not None:
            spec = spectral_fn(spec)
        out_frames = _fft.irfft(spec, n, backend=cfg.fft_backend,
                                precision=prec)
    if cfg.synthesis_window:
        out_frames = out_frames * jnp.asarray(
            window_f64.astype(np.float32)
        )
    out_frames = jnp.where(valid, out_frames, 0.0)

    # 3.+4. local OLA with left-tail pre-seed (canonical summation order)
    acc_ext_len = t_block + halo
    # First pass without seed to obtain the tail we must ship right:
    # cheaper: compute full acc_ext once, split tail, then seed head.
    acc_ext = overlap_add(out_frames, hop, out_len=acc_ext_len)
    tail = acc_ext[..., t_block:]
    left_tail = push_right_tail(tail, TIME_AXIS)
    # Re-run the head accumulation with the seed in front. Seeding after the
    # fact (acc + left_tail) would change float summation order; instead we
    # overlap-add again with init_head so order = earlier frames first.
    acc = overlap_add(
        out_frames, hop, out_len=t_block, init_head=left_tail
    )

    # 5. normalize
    eps = jnp.float32(cfg.eps)
    out = acc / jnp.maximum(norm_local, eps)
    if not with_metrics:
        return out
    # 6. in-mesh metric reductions (SURVEY §5 'Metrics'; reference peak
    # meter OLAAccumulator.cc:290-295, SNR counters e2e_benchmark.cc:79-121):
    # each shard contributes local partials, one psum/pmax over BOTH mesh
    # axes replicates the global scalars to every device — no host gather
    # of the output is needed to meter a sharded stream. The peak meters
    # all channels (the reference meters ch0 of each produce() block; with
    # channels sharded, a per-channel meter would defeat the reduction).
    axes = (CHANNEL_AXIS, TIME_AXIS)
    sig = jax.lax.psum(jnp.sum(jnp.square(x_local)), axes)
    noise = jax.lax.psum(jnp.sum(jnp.square(x_local - out)), axes)
    peak = jax.lax.pmax(jnp.max(jnp.abs(out)), axes)
    return out, {"signal_energy": sig, "noise_energy": noise, "peak": peak}


@lru_cache(maxsize=None)
def _norm_np(cfg: StftConfig, num_frames: int, out_len: int) -> np.ndarray:
    w = get_window(cfg.window, cfg.frame_size, cfg.periodic).astype(np.float64)
    contrib = w * w if cfg.synthesis_window else w
    return edge_norm(contrib, cfg.hop_size, num_frames, out_len)


def sharded_round_trip(
    x: jnp.ndarray,  # [channels, T]
    cfg: StftConfig,
    mesh: Optional[Mesh] = None,
    spectral_fn: Optional[Callable] = None,
    valid_len: Optional[int] = None,
    valid_start: int = 0,
    return_metrics: bool = False,
    allow_blocked: bool = True,
) -> jnp.ndarray:
    """Distributed round-trip over a (channel, time) mesh.

    Output is bit-identical to `pipeline.round_trip(x, cfg)` with
    center=False for the covered span (positions past the last frame get
    zeros, like the unsharded pipeline). `valid_start`/`valid_len` restrict
    the frame set to frames fully inside x[..., valid_start:valid_len] — used
    by the chunked stream driver, whose edge chunks are zero-padded to a
    fixed shape (valid_start must be hop-aligned).

    With `return_metrics=True` returns `(y, metrics)` where `metrics` holds
    the IN-MESH psum/pmax reductions {signal_energy, noise_energy, peak}
    (replicated scalars; see `metrics_report` for dB conversion) — the
    distributed analog of the reference's peak meter and SNR counters
    (OLAAccumulator.cc:290-295, e2e_benchmark.cc:79-121).
    """
    if mesh is None:
        mesh = auto_mesh()
    if cfg.center:
        raise ValueError(
            "sharded pipeline requires center=False; pad on the host first"
        )
    channels, total_len = x.shape
    if valid_len is None:
        valid_len = total_len
    valid_len = min(valid_len, total_len)
    n_ch = mesh.shape[CHANNEL_AXIS]
    n_time = mesh.shape[TIME_AXIS]
    n, hop = cfg.frame_size, cfg.hop_size
    if channels % n_ch != 0:
        raise ValueError(f"channels ({channels}) % mesh channel ({n_ch}) != 0")
    if total_len % n_time != 0:
        raise ValueError(f"T ({total_len}) % mesh time ({n_time}) != 0")
    t_block = total_len // n_time
    if t_block % hop != 0:
        raise ValueError(f"time block ({t_block}) must be hop-aligned ({hop})")
    if t_block < n:
        raise ValueError(
            f"time block ({t_block}) must be >= frame_size ({n}) so halos "
            "touch only immediate neighbors"
        )

    if valid_start % hop != 0:
        raise ValueError(f"valid_start ({valid_start}) must be hop-aligned")
    num_frames = cfg.frame_spec.num_frames(valid_len - valid_start)
    if num_frames <= 0:
        return jnp.zeros_like(x)
    span = (num_frames - 1) * hop + n
    norm = jnp.asarray(
        np.pad(
            _norm_np(cfg, num_frames, span),
            (valid_start, total_len - valid_start - span),
        )
    )
    window_f64 = get_window(cfg.window, n, cfg.periodic, dtype=np.float64)

    # Fixed per-bin responses take the blocked hop-block Toeplitz path
    # (left+right halos, OLA folded into the kernel, bit-identical across
    # device counts by construction) when the full frame set is covered
    # and the local blocks align to the group grid; otherwise the masked
    # frame formulation with the tail-seeding protocol.
    blocked = None
    if allow_blocked and valid_start == 0 and valid_len == total_len:
        per_bin_b = blocked_per_bin(
            cfg, spectral_fn, t_block=t_block, num_frames=num_frames
        )
        if per_bin_b is not None:
            blocked = {"group": BLOCKED_GROUP, "num_frames": num_frames,
                       "n_time": n_time, "per_bin": per_bin_b}

    out_specs = PartitionSpec(CHANNEL_AXIS, TIME_AXIS)
    if return_metrics:
        # psum/pmax over both axes replicate the metric scalars.
        out_specs = (out_specs, {
            "signal_energy": PartitionSpec(),
            "noise_energy": PartitionSpec(),
            "peak": PartitionSpec(),
        })
    fn = jax.shard_map(
        partial(
            _block_round_trip,
            window_f64=window_f64,
            cfg=cfg,
            total_len=valid_len,
            spectral_fn=spectral_fn,
            valid_start=valid_start,
            with_metrics=return_metrics,
            blocked=blocked,
        ),
        mesh=mesh,
        in_specs=(
            PartitionSpec(CHANNEL_AXIS, TIME_AXIS),
            PartitionSpec(TIME_AXIS),
        ),
        out_specs=out_specs,
    )
    x = jax.device_put(x, NamedSharding(mesh, PartitionSpec(CHANNEL_AXIS, TIME_AXIS)))
    norm = jax.device_put(norm, NamedSharding(mesh, PartitionSpec(TIME_AXIS)))
    return fn(x, norm)


BLOCKED_GROUP = 2  # measured fastest/most stable (docs/DESIGN.md)


def blocked_per_bin(
    cfg: StftConfig,
    spectral_fn: Optional[Callable],
    t_block: int,
    num_frames: int,
) -> Optional[np.ndarray]:
    """The per-bin response the blocked mesh formulation would use for a
    FULL-COVERAGE sharded_round_trip with these shapes, or None when the
    gate does not hold (wrong backend pick, unsupported N/hop, unaligned
    blocks, too few frames, non-per-bin spectral fn, or the
    CRLOT_BLOCKED_IDENTITY=0 escape hatch). Shared by the gate and by the
    dryrun's accounting assert so 'measured the blocked program' is a
    checkable fact, not an assumption (review r3 finding: both
    formulations move the same collective volume, so byte counts alone
    cannot distinguish them)."""
    from ..core.types import FftBackend
    from ..fft.matmul_backend import composed_block_supported
    from ..spectral import resolve_per_bin_response

    n, hop = cfg.frame_size, cfg.hop_size
    if spectral_fn is None:
        # IDENTITY promotes to per-bin ones, like pipeline.round_trip
        # (measured 3.6x the tiled path in contended windows).
        if os.environ.get("CRLOT_BLOCKED_IDENTITY", "1") == "0":
            return None
        per_bin = np.ones(n // 2 + 1)
    else:
        per_bin = resolve_per_bin_response(spectral_fn, n)
    if (
        per_bin is not None
        and _fft._pick(cfg.fft_backend, n) == FftBackend.MATMUL
        and composed_block_supported(n, hop)
        and t_block % (BLOCKED_GROUP * hop) == 0
        and num_frames >= 2 * (n // hop - 1)
    ):
        return per_bin
    return None


def metrics_report(metrics: dict) -> dict:
    """Convert in-mesh metric reductions to the reference's report units:
    SNR in dB (e2e_benchmark.cc:79-121) and peak/peak dBFS
    (OLAAccumulator.cc:290-295)."""
    sig = float(metrics["signal_energy"])
    noise = float(metrics["noise_energy"])
    peak = float(metrics["peak"])
    if sig <= 0.0:
        snr = float("-inf")
    elif noise <= 0.0:
        snr = float("inf")
    else:
        snr = 10.0 * np.log10(sig / noise)
    return {
        "snr_db": snr,
        "peak": peak,
        "peak_db": 20.0 * np.log10(peak) if peak > 0 else float("-inf"),
    }


def sharded_round_trip_jit(cfg: StftConfig, mesh: Mesh, spectral_fn=None):
    """Jitted closure over (cfg, mesh) for repeated streaming use."""

    def run(x):
        return sharded_round_trip(x, cfg, mesh, spectral_fn)

    return jax.jit(run)


# Interconnect assumptions for the weak-scaling communication model
# (public per-direction figures; the halo protocol uses ONE neighbor link
# each way). v5e ICI: ~45 GB/s per link with ~1 us collective latency;
# DCN: ~25 GB/s per host NIC with ~10 us latency.
ICI_BYTES_PER_S = 45e9
ICI_LATENCY_S = 1e-6
DCN_BYTES_PER_S = 25e9
DCN_LATENCY_S = 10e-6


def permute_bytes_from_hlo(txt: str) -> list:
    """Byte sizes of every collective-permute OP DEFINITION in an HLO
    text dump. Counts sync `collective-permute(` and async
    `collective-permute-start(` lines only: anchoring on the opcode
    immediately followed by its operand list keeps `-done` lines from
    matching through their `%collective-permute-start.N` operand NAME,
    which would double-count every async pair (advisor r3 finding;
    tested against both lowerings in tests/test_distributed.py)."""
    import re

    dsize = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4}
    per_op = []
    for m in re.finditer(
        r"(f64|f32|bf16|f16|s32|u32)\[([\d,]*)\][^\n]*?"
        r"collective-permute(?:-start)?\(", txt
    ):
        n = 1
        for d in m.group(2).split(",") if m.group(2) else []:
            if d:
                n *= int(d)
        per_op.append(dsize[m.group(1)] * n)
    return per_op


def collective_bytes_per_step(
    cfg: StftConfig, mesh: Mesh, channels: int, total_len: int
) -> dict:
    """Per-device collective traffic of one sharded round-trip step,
    extracted from the compiled HLO (SPMD: every device runs the same
    program, so op shapes ARE per-device volumes). Returns op count and
    byte totals for the collective-permute halo exchanges."""
    run = sharded_round_trip_jit(cfg, mesh)
    x = jnp.zeros((channels, total_len), jnp.float32)
    txt = jax.jit(run).lower(x).compile().as_text()
    per_op = permute_bytes_from_hlo(txt)
    return {
        "collective_permute_ops": len(per_op),
        "bytes_per_device_per_step": sum(per_op),
        "per_op_bytes": per_op,
    }


def overlap_dot_fraction(
    cfg: StftConfig,
    mesh: Mesh,
    channels: int,
    total_len: int,
    spectral_fn: Optional[Callable] = None,
) -> dict:
    """Fraction of dot_general MACs in the shard_map body that carry NO
    data dependence on the halo ppermutes — the structural evidence behind
    the weak-scaling model's overlap bound (a dot independent of the
    permutes can be scheduled across collective-permute-start/done by
    XLA's latency-hiding scheduler). Computed by tainting the ppermute
    outputs through the traced jaxpr; conservative (any tainted operand
    taints every output, sub-jaxprs included)."""
    import jax.extend.core as jex_core

    jaxpr = jax.make_jaxpr(
        lambda v: sharded_round_trip(v, cfg, mesh, spectral_fn)
    )(jnp.zeros((channels, total_len), jnp.float32))
    inner = None
    for eqn in jaxpr.jaxpr.eqns:
        if eqn.primitive.name == "shard_map":
            inner = eqn.params["jaxpr"]
    if inner is None:
        raise ValueError("no shard_map eqn in the traced round-trip")
    tainted: set = set()
    clean_macs = 0.0
    tainted_macs = 0.0
    n_permute = 0
    for eqn in inner.eqns:
        hit = eqn.primitive.name == "ppermute" or any(
            not isinstance(v, jex_core.Literal) and v in tainted
            for v in eqn.invars
        )
        if eqn.primitive.name == "ppermute":
            n_permute += 1
        if hit:
            tainted.update(eqn.outvars)
        if eqn.primitive.name == "dot_general":
            lhs = eqn.invars[0].aval
            (lc, _), _ = eqn.params["dimension_numbers"]
            contract = 1
            for d in lc:
                contract *= lhs.shape[d]
            out_elems = 1
            for d in eqn.outvars[0].aval.shape:
                out_elems *= d
            macs = float(out_elems) * contract
            if hit:
                tainted_macs += macs
            else:
                clean_macs += macs
    total = clean_macs + tainted_macs
    return {
        "ppermute_ops": n_permute,
        "dot_macs_independent_of_halo": clean_macs,
        "dot_macs_consuming_halo": tainted_macs,
        "independent_fraction": (
            round(clean_macs / total, 4) if total else 0.0
        ),
    }


def weak_scaling_model(
    cfg: StftConfig,
    channels_local: int,
    t_block: int,
    device_kind: Optional[str] = None,
) -> dict:
    """Quantitative weak-scaling model for the halo protocol (BASELINE.json
    target: >= 80% on >= 2 hosts; this environment has one chip, so the
    claim is argued from measured-HLO byte counts + interconnect specs +
    the STRUCTURAL overlap property of the r4 blocked formulation).

    Fixed per-device work (weak scaling): each device round-trips
    `t_block * channels_local` samples per step and exchanges one
    `(N - H) * 4 * channels_local`-byte halo in EACH direction (verified
    against the compiled HLO by `collective_bytes_per_step`). Three bounds
    per interconnect:

    * `no_overlap` (legacy, pessimistic): the two permutes run serially
      before compute — eff = t_comp / (t_comp + 2*lat + bytes_total/bw).
    * `overlap` (the r4 formulation's bound, and the one the dryrun
      GATES): the main hop-block dot chain has no data dependence on the
      permutes (asserted at jaxpr level,
      tests/test_distributed.py::test_blocked_mesh_main_dots_independent_
      of_halo_permutes), so XLA's latency-hiding scheduler runs both
      permutes concurrently with compute on their own links —
      step = max(t_comp, lat + bytes_one_dir/bw),
      eff = t_comp / step.
    * `prefetch_limit`: unlike NN-layer halos, these halos are INPUT
      signal context (overlap-save), not computed results — a depth-p
      chunk prefetch can have p exchanges in flight, hiding latency
      entirely; the sustained bound is bandwidth-only:
      eff = t_comp / max(t_comp, bytes_one_dir/bw). Reported with the
      depth needed (p such that (p-1)*t_comp >= lat), as design
      headroom — the chunked ShardedStreamer's one-exchange-per-chunk
      structure is what makes this reachable.
    """
    from ..profiling import roofline_samples_per_sec

    halo = cfg.frame_size - cfg.hop_size
    bytes_one_dir = halo * 4 * channels_local
    comm_bytes = 2 * bytes_one_dir
    # Model the BLOCKED formulation (the mesh identity/EQ path since r3):
    # a faster per-device compute bound is the conservative choice for a
    # comm-overhead model.
    roof = roofline_samples_per_sec(
        cfg.frame_size, cfg.hop_size, device_kind=device_kind,
        formulation="blocked",
    )["roofline_samples_per_sec"]
    t_comp = t_block * channels_local / roof

    def leg(bw, lat):
        t_serial = 2.0 * lat + comm_bytes / bw
        eff_no = t_comp / (t_comp + t_serial)
        t_cc = lat + bytes_one_dir / bw
        eff_ov = t_comp / max(t_comp, t_cc)
        t_bw = bytes_one_dir / bw
        eff_pf = t_comp / max(t_comp, t_bw)
        depth = 1 + int(np.ceil(lat / t_comp)) if t_comp > 0 else 0
        # smallest per-device block with overlap-eff >= 0.8:
        # t_comp >= 0.8 * t_cc (t_cc is block-independent)
        min_block = int(np.ceil(0.8 * t_cc * roof / channels_local))
        return {
            "efficiency_no_overlap": round(eff_no, 4),
            "efficiency_overlap": round(eff_ov, 4),
            "efficiency_prefetch_limit": round(eff_pf, 4),
            "prefetch_depth_needed": depth,
            "t_comm_serial_us": round(t_serial * 1e6, 3),
            "t_comm_overlap_us": round(t_cc * 1e6, 3),
            "min_block_for_80pct_overlap": min_block,
        }

    return {
        "halo_samples": halo,
        "comm_bytes_per_device_per_step": comm_bytes,
        "block_samples_per_device": t_block * channels_local,
        "t_compute_us": round(t_comp * 1e6, 3),
        "ici": leg(ICI_BYTES_PER_S, ICI_LATENCY_S),
        "dcn_host_edge": leg(DCN_BYTES_PER_S, DCN_LATENCY_S),
        "assumptions": {
            "ici_bytes_per_s": ICI_BYTES_PER_S,
            "ici_latency_s": ICI_LATENCY_S,
            "dcn_bytes_per_s": DCN_BYTES_PER_S,
            "dcn_latency_s": DCN_LATENCY_S,
            "overlap_basis": (
                "main dot chain independent of halo permutes "
                "(jaxpr-asserted); permutes concurrent on their own links"
            ),
            "prefetch_basis": (
                "halos are input overlap-save context, known before "
                "compute; requires depth-p chunk prefetch in the streamer"
            ),
        },
    }


def dryrun(n_devices: int) -> None:
    """North-star multi-chip validation (driver hook). Exercises the
    HEADLINE config — N=1024, H=256 — on an n-device (channel x time)
    mesh: a multi-chunk resumable sharded stream with one mid-stream
    checkpoint/restore, bit-exactness of (a) resumed vs unbroken stream
    and (b) stream vs one-shot mesh round-trip, in-mesh psum/pmax
    metrics, and collective byte accounting from the compiled HLO feeding
    a quantitative weak-scaling model. Prints a JSON summary so the
    driver's MULTICHIP artifact carries the evidence."""
    import json
    import os
    import tempfile

    from .stream import ShardedStreamer, _ctx_len

    if n_devices % 2 == 0 and n_devices > 2:
        mesh = make_mesh(channel=2, time=n_devices // 2)
    else:
        mesh = make_mesh(channel=1, time=n_devices)
    cfg = StftConfig(frame_size=1024, hop_size=256, center=False)
    n_time = mesh.shape[TIME_AXIS]
    n_ch = mesh.shape[CHANNEL_AXIS]
    channels = 2 * n_ch
    s = 2 * cfg.frame_size * n_time  # per-chunk samples; t_block = 2N
    n_chunks = 3

    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (channels, n_chunks * s)).astype(np.float32)
    chunks = [x[:, i * s : (i + 1) * s] for i in range(n_chunks)]

    # Unbroken resumable stream over the full signal.
    st_a = ShardedStreamer(cfg, mesh)
    outs = [st_a.feed(c) for c in chunks] + [st_a.finish()]
    y_stream = np.concatenate([o for o in outs if o is not None], axis=1)

    # Same stream with a checkpoint/restore between chunks 1 and 2: the
    # state crosses a process-boundary-equivalent (npz round-trip through
    # disk) and the continuation must be bit-identical.
    st_b = ShardedStreamer(cfg, mesh)
    outs_b = [st_b.feed(chunks[0]), st_b.feed(chunks[1])]
    with tempfile.TemporaryDirectory() as d:
        ck = os.path.join(d, "stream_ckpt.npz")
        sb = st_b.state()
        np.savez(ck, prev=sb["prev"], tail=sb["tail"],
                 first=sb["first"], s=sb["s"])
        del st_b
        with np.load(ck) as z:
            restored = {"prev": z["prev"], "tail": z["tail"],
                        "first": bool(z["first"]), "s": int(z["s"])}
    st_c = ShardedStreamer(cfg, mesh)
    st_c.load_state(restored)
    outs_b += [st_c.feed(chunks[2]), st_c.finish()]
    y_ckpt = np.concatenate([o for o in outs_b if o is not None], axis=1)
    assert np.array_equal(y_ckpt, y_stream), (
        "checkpoint/restore broke bit-exactness"
    )

    # One-shot mesh round-trip over the whole signal, with in-mesh metrics.
    # allow_blocked=False to MATCH the stream's formulation: the streamer
    # always disables the blocked path (one formulation per chunk), and on
    # a TPU backend the one-shot identity would otherwise engage it and
    # break the bit-exactness comparison (review r3 finding).
    y_once, m = sharded_round_trip(
        jnp.asarray(x), cfg, mesh, return_metrics=True, allow_blocked=False
    )
    y_once = np.asarray(y_once)
    assert np.array_equal(y_stream, y_once), (
        "chunked stream != one-shot mesh round-trip"
    )
    assert np.isfinite(y_once).all()
    rep = metrics_report(m)
    # Quality gate on the INTERIOR (r3 verdict item 5): the center=False
    # round-trip's first/last N-H samples divide partial window coverage
    # by eps-guarded near-zero COLA norms — correct per the reference's
    # normalize_and_clear contract, but their total-SNR contribution (the
    # ~32 dB figure in MULTICHIP_r03) is an edge artifact a reader cannot
    # distinguish from a regression. Gate the interior hard and report
    # both, with the edge policy named.
    edge_taper = cfg.frame_size - cfg.hop_size
    total_samples = x.shape[1]
    interior_snr = float(
        10.0 * np.log10(
            np.sum(np.square(x[:, edge_taper : total_samples - edge_taper]))
            / max(
                np.sum(np.square(
                    (x - y_once)[:, edge_taper : total_samples - edge_taper]
                )),
                1e-300,
            )
        )
    )
    assert interior_snr >= 60.0, (
        f"interior SNR {interior_snr:.1f} dB < 60 dB gate"
    )

    # Collective byte accounting from the compiled HLO + scaling model.
    l_ctx = _ctx_len(cfg, n_time)
    ext_len = s + 2 * l_ctx
    acct = collective_bytes_per_step(cfg, mesh, channels, ext_len)
    halo_bytes = (cfg.frame_size - cfg.hop_size) * 4 * (channels // n_ch)
    assert acct["bytes_per_device_per_step"] == 2 * halo_bytes, acct
    # The blocked (hop-block Toeplitz) formulation moves the SAME volume,
    # split as a LEFT input halo + RIGHT input halo instead of right halo
    # + OLA tail — account it from its own compiled HLO (forced MATMUL so
    # the identity promotion engages on any backend).
    from ..core.types import FftBackend

    cfg_b = StftConfig(
        frame_size=cfg.frame_size, hop_size=cfg.hop_size, center=False,
        fft_backend=FftBackend.MATMUL,
    )
    # Both formulations move identical volume, so byte counts alone cannot
    # prove WHICH program was measured — assert engagement explicitly.
    nf_b = (ext_len - cfg.frame_size) // cfg.hop_size + 1
    assert blocked_per_bin(
        cfg_b, None, t_block=ext_len // n_time, num_frames=nf_b
    ) is not None, "blocked formulation did not engage for the accounting"
    acct_blocked = collective_bytes_per_step(cfg_b, mesh, channels, ext_len)
    assert acct_blocked["bytes_per_device_per_step"] == 2 * halo_bytes, (
        acct_blocked
    )
    # The scaling model is a claim about the TARGET hardware (v5e pods per
    # BASELINE.json), not about whatever backend hosts this dryrun.
    target = "TPU v5 lite"
    model = weak_scaling_model(
        cfg, channels // n_ch, ext_len // n_time, device_kind=target
    )
    # A production-scale streaming block (1 s of 48 kHz audio per device).
    model_1s = weak_scaling_model(
        cfg, channels // n_ch, 48000, device_kind=target
    )
    # GATE (BASELINE.md ">= 80% weak-scaling", r3 verdict item 1c): the
    # overlap bound — backed by the jaxpr independence evidence computed
    # on this very mesh/config below — must clear 80% on ICI at the
    # production 1 s block.
    eff_ici_1s = model_1s["ici"]["efficiency_overlap"]
    assert eff_ici_1s >= 0.8, (
        f"ICI weak-scaling efficiency {eff_ici_1s} < 0.8 at a 1 s block"
    )
    # Structural overlap evidence for the artifact: the blocked
    # formulation's main dots must not consume the halo permutes.
    # Evaluated at the ~1 s-per-device production block (trace-time
    # analysis — no compute): at the dryrun's tiny 2N blocks the
    # fixed-size boundary patches dominate the MAC count, which is a
    # block-size artifact, not a scheduling property.
    t_1s = 49152  # hop- and group-aligned ~1 s @ 48 kHz per device
    ov = overlap_dot_fraction(cfg_b, mesh, channels, t_1s * n_time)
    ov["block_samples_per_device"] = t_1s
    assert ov["independent_fraction"] >= 0.75, ov
    print(json.dumps({
        "dryrun": "north-star",
        "config": {"frame_size": cfg.frame_size, "hop_size": cfg.hop_size,
                   "mesh": {CHANNEL_AXIS: n_ch, TIME_AXIS: n_time},
                   "channels": channels, "chunk_samples": s,
                   "chunks": n_chunks, "total_samples": n_chunks * s},
        "stream_vs_oneshot_bitexact": True,
        "checkpoint_resume_bitexact": True,
        "mesh_metrics": {k: round(float(v), 3) for k, v in rep.items()},
        "interior_snr_db": round(interior_snr, 1),
        "interior_snr_gate_60db": "pass",
        "edge_policy": (
            f"first/last {edge_taper} samples divide partial window "
            "coverage by eps-guarded COLA norms (reference "
            "normalize_and_clear contract); excluded from the gated "
            "interior SNR, included in mesh_metrics.snr_db"
        ),
        "collectives": acct,
        "collectives_blocked_formulation": acct_blocked,
        "weak_scaling_model_dryrun_block": model,
        "weak_scaling_model_1s_block": model_1s,
        "weak_scaling_gate_ici_1s_overlap": {
            "efficiency": eff_ici_1s, "threshold": 0.8, "pass": True,
        },
        "overlap_structure_blocked_formulation": ov,
    }))
