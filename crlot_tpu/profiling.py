"""Tracing, roofline accounting, and NaN-debug mode.

Reference analogs (SURVEY.md §5): google_benchmark custom reporters +
`scripts/run_all.sh` env capture -> `trace()` (jax.profiler) and
`environment_info()`; the SIGFPE/NaN posture -> `nan_debug()`; the in-code
µs/roofline targets -> `roofline_samples_per_sec()` for the >=90%-of-roofline
gate in BASELINE.json.
"""

from __future__ import annotations

import contextlib
import json
import platform
import subprocess
from dataclasses import dataclass
from typing import Iterator, Optional

import jax

# Published HBM bandwidth / peak compute by device kind (per-chip).
_DEVICE_SPECS = {
    # device_kind substring: (hbm_bytes_per_sec, bf16_flops, f32_flops)
    "TPU v5 lite": (819e9, 197e12, 98e12),   # v5e (197 TF bf16; 394 is int8)
    "TPU v5": (1228e9, 459e12, 115e12),      # v5p (fallback match after v5e)
    "TPU v4": (1200e9, 275e12, 69e12),
    "TPU v6": (1640e9, 918e12, 230e12),      # trillium
}


def device_specs(kind: Optional[str] = None):
    kind = kind or jax.devices()[0].device_kind
    for sub, spec in _DEVICE_SPECS.items():
        if sub in kind:
            return spec
    return (100e9, 1e12, 5e11)  # conservative unknown-device fallback


@dataclass(frozen=True)
class PipelineTraffic:
    """HBM bytes and FLOPs per INPUT SAMPLE for a round-trip config."""

    bytes_per_sample: float
    flops_per_sample: float


def roundtrip_traffic(
    frame_size: int, hop: int, matmul_fft: bool = True, folded: bool = True,
    formulation: str = "framed", group: int = 2,
) -> PipelineTraffic:
    """Traffic model of the round-trip, per INPUT sample.

    `formulation="framed"` (default): ideal-fusion model of
    frame->window->rFFT->irFFT->OLA->norm — read x once, write+read the
    [F, N] frame matrix in both directions (overlap factor R = N/H),
    spectrum write+read, write y once. FLOPs: the symmetry-folded DFT
    matmul is N*(N/2+1) MACs per frame per direction
    (fft/matmul_backend.py::rfft_folded_packed), the direct basis
    2*N*(N+2) MACs; FFT is 5*N*log2(N) per direction.

    `formulation="spectral"`: the framed NONLINEAR per-bin path (packed
    Re/Im planes through an arbitrary elementwise spectral fn —
    pipeline.round_trip's `.packed` route). Same folded-DFT FLOPs as
    "framed" plus the fn's elementwise work; bytes add one spectrum
    read+write pass for the fn (XLA cannot fuse an elementwise stage
    INTO a dot operand, so the fn's output is a materialized [F, K]
    pair). This model is why nonlinear processing cannot reach the
    blocked identity/EQ rate: identity/EQ COMPOSE into the kernel at
    design time (halving MACs and shedding the frame matrix), while a
    nonlinear fn forces the spectrum through HBM. The OLA-folded
    hop-block synthesis alternative is strictly worse: folding OLA into
    the inverse basis breaks the even/odd fold (R*2K = ~4x MACs/sample
    vs the folded inverse) for only ~25% byte savings — a modeled
    negative result (docs/DESIGN.md r4).

    `formulation="blocked"`: the hop-block Toeplitz round-trip
    (matmul_backend.roundtrip_composed_blocked — the TPU identity/EQ path
    since r3). Per output sample the kernel row spans
    (R + G - 2)*hop + N input samples (R = N/hop), i.e. 2048 MACs at the
    headline config vs the framed formulation's ~4100, with NO frame
    matrix: the mg = ceil(kernel_height / (G*hop)) matmul terms each read
    the signal once and write a partial, and the final fused
    add+normalize reads the partials + norm and writes the output.

    Both models are APPROXIMATE by construction: XLA's fusion can
    eliminate modeled passes (e.g. folding elementwise stages into matmul
    operands), so a well-fused pipeline can measure slightly ABOVE this
    "roofline" — treat roofline_pct near or over 100 as "the modeled
    passes are fully fused", not as a physical violation.
    """
    if formulation == "blocked":
        r = frame_size // hop
        gh = group * hop
        height = (r + group - 2) * hop + frame_size
        mg = -(-height // gh)
        flops = 2.0 * height + 6  # + normalize epilogue
        b = (
            4.0 * mg      # signal read per matmul term
            + 4.0 * mg    # per-term partial write
            + 4.0 * mg    # final fused add reads the partials
            + 4.0         # norm read
            + 4.0         # output write
        )
        return PipelineTraffic(bytes_per_sample=b, flops_per_sample=flops)
    import math

    r = frame_size / hop
    bytes_frames = 2 * 4 * r  # write + read, forward
    bytes_spec = 2 * 4 * r * ((frame_size // 2 + 1) * 2 / frame_size)
    bytes_out_frames = 2 * 4 * r
    b = 4 + bytes_frames + bytes_spec + bytes_out_frames + 4 + 4
    if formulation == "spectral":
        b += bytes_spec  # the fn's output planes: one more write + read
    if matmul_fft and folded and frame_size % 2 == 0:
        # 2 FLOP per MAC x half-size [Re | Im] bases, two directions.
        flops_per_frame = 2 * frame_size * (frame_size // 2 + 1) * 2
    elif matmul_fft:
        flops_per_frame = 2 * frame_size * (frame_size + 2) * 2
    else:
        flops_per_frame = 2 * 5 * frame_size * math.log2(frame_size)
    f = flops_per_frame / hop + 10  # + window/ola/normalize elementwise
    return PipelineTraffic(bytes_per_sample=b, flops_per_sample=f)


def roofline_samples_per_sec(
    frame_size: int, hop: int, matmul_fft: bool = True,
    device_kind: Optional[str] = None, precision: str = "high",
    folded: bool = True, formulation: str = "framed", group: int = 2,
) -> dict:
    """Speed-of-light samples/s for the round-trip on this device: the min of
    the HBM-bandwidth bound and the compute bound, with both reported.

    precision: 'high' (bf16x3 DFT matmuls, the pipeline default — compute
    peak ~ bf16/3) or 'highest' (bf16x6 ~ f32 peak).
    """
    hbm, bf16, f32 = device_specs(device_kind)
    t = roundtrip_traffic(frame_size, hop, matmul_fft, folded,
                          formulation, group)
    compute_peak = bf16 / 3.0 if precision == "high" else f32
    bw_bound = hbm / t.bytes_per_sample
    compute_bound = compute_peak / t.flops_per_sample
    return {
        "bandwidth_bound_samples_per_sec": bw_bound,
        "compute_bound_samples_per_sec": compute_bound,
        "roofline_samples_per_sec": min(bw_bound, compute_bound),
        "bytes_per_sample": t.bytes_per_sample,
        "flops_per_sample": t.flops_per_sample,
        "precision": precision,
        "formulation": formulation,
    }


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/crlot_trace") -> Iterator[None]:
    """jax.profiler trace scope; open with xprof/tensorboard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def nan_debug() -> Iterator[None]:
    """Scope that makes NaN production raise immediately (the debugging
    counterpart of the pipeline's finite-scrub contract)."""
    prev = jax.config.read("jax_debug_nans")
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def environment_info() -> dict:
    """Build/CPU/git capture (reference: scripts/run_all.sh:54-72)."""
    try:
        git = subprocess.run(
            ["git", "rev-parse", "HEAD"], capture_output=True, text=True,
            timeout=5,
        ).stdout.strip()
    except Exception:
        git = "unknown"
    dev = jax.devices()[0]
    return {
        "git": git,
        "platform": platform.platform(),
        "python": platform.python_version(),
        "jax": jax.__version__,
        "backend": jax.default_backend(),
        "device_kind": dev.device_kind,
        "num_devices": len(jax.devices()),
    }


if __name__ == "__main__":
    info = environment_info()
    info["roofline_n1024_h256"] = {
        k: round(v, 2) if isinstance(v, (int, float)) else v
        for k, v in roofline_samples_per_sec(1024, 256).items()
    }
    print(json.dumps(info, indent=1))
