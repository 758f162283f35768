"""TPU-side smoke gate: run the core quality contracts ON the real chip.

CPU tests (interpret-mode Pallas, XLA:CPU) cannot catch Mosaic lowering
failures or TPU-only numerics (example: vmap of an HBM-input pallas_call
lowers fine nowhere but fails only on device). This script compiles and
runs every TPU-dispatched code path at small sizes and asserts the same
gates the test suite uses. Exit 0 = all pass.

Usage: python scripts/tpu_smoke.py   (run under `timeout` + retry — tunnel)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main() -> int:
    assert jax.default_backend() == "tpu", (
        f"smoke gate needs the TPU backend, got {jax.default_backend()}"
    )
    import crlot_tpu as ct
    from crlot_tpu.core.padding import pad_signal
    from crlot_tpu.fft.pallas_rt import (
        roundtrip_frames_fused,
        roundtrip_signal_fused,
    )
    from crlot_tpu.pipeline import _norm_np, _window_f64

    rng = np.random.default_rng(0)
    results = []

    def check(name, cond, detail=""):
        results.append((name, bool(cond), detail))
        print(f"{'PASS' if cond else 'FAIL'} {name} {detail}", flush=True)

    # 1. Round-trip SNR gates on the default path (the blocked identity
    #    kernel since r3), mono and batched, both hop ratios.
    for hop in (256, 512):
        cfg = ct.StftConfig(frame_size=1024, hop_size=hop, center=True)
        x = rng.uniform(-0.9, 0.9, (2, 24000)).astype(np.float32)
        y = np.asarray(jax.jit(lambda s, c=cfg: ct.round_trip(s, c))(x))
        snr = float(ct.snr_db(x, y))
        check(f"round_trip_h{hop}_batched", snr > 60.0, f"snr={snr:.1f}dB")

    # 1b. Blocked identity (default) vs the tiled formulation (escape
    #     hatch): same reconstruction within the f32 tier on device.
    import os as _os

    cfg_b = ct.StftConfig(frame_size=1024, hop_size=256, center=True)
    xb = rng.uniform(-0.9, 0.9, 24000).astype(np.float32)
    y_blk = np.asarray(
        jax.jit(lambda s: ct.round_trip(s, cfg_b))(jnp.asarray(xb))
    )
    _prev_bi = _os.environ.get("CRLOT_BLOCKED_IDENTITY")
    _os.environ["CRLOT_BLOCKED_IDENTITY"] = "0"
    try:
        y_tld = np.asarray(
            jax.jit(lambda s: ct.round_trip(s, cfg_b))(jnp.asarray(xb))
        )
    finally:
        # restore (not pop): a user-exported escape-hatch value must survive
        if _prev_bi is None:
            _os.environ.pop("CRLOT_BLOCKED_IDENTITY", None)
        else:
            _os.environ["CRLOT_BLOCKED_IDENTITY"] = _prev_bi
    agree = float(ct.snr_db(y_tld, y_blk))
    check("blocked_identity_vs_tiled", agree > 60.0, f"snr={agree:.1f}dB")

    # 2. Fused Pallas kernels (both layouts) vs the pipeline output.
    cfg = ct.StftConfig(frame_size=1024, hop_size=256, center=True)
    x1 = rng.uniform(-0.9, 0.9, 24000).astype(np.float32)
    ref = np.asarray(jax.jit(lambda s: ct.round_trip(s, cfg))(jnp.asarray(x1)))
    spec = cfg.frame_spec
    f = spec.num_frames(x1.shape[-1])
    padded = pad_signal(
        jnp.asarray(x1), spec.pad_amount, spec.pad_amount, spec.pad_mode,
        spec.pad_value,
    )
    w64 = _window_f64(cfg)
    full = (f - 1) * cfg.hop_size + cfg.frame_size
    norm = jnp.asarray(_norm_np(cfg, f, full))
    out = roundtrip_signal_fused(
        padded, cfg.frame_size, cfg.hop_size, f, w64, norm, cfg.eps
    )
    got = np.asarray(out)[spec.pad_amount : spec.pad_amount + x1.shape[-1]]
    err = float(np.max(np.abs(got - ref)))
    check("pallas_signal_fused_vs_pipeline", err < 2e-4, f"max_err={err:.2e}")
    frames_out = roundtrip_frames_fused(
        padded, cfg.frame_size, cfg.hop_size, f, w64
    )
    check(
        "pallas_frames_fused_shape",
        frames_out.shape == (f, cfg.frame_size),
        str(frames_out.shape),
    )

    # 3. Opt-in fused config end-to-end.
    cfg_f = ct.StftConfig(
        frame_size=1024, hop_size=256, center=True, fused_roundtrip=True
    )
    yf = np.asarray(jax.jit(lambda s: ct.round_trip(s, cfg_f))(jnp.asarray(x1)))
    snrf = float(ct.snr_db(x1, yf))
    check("fused_roundtrip_config", snrf > 60.0, f"snr={snrf:.1f}dB")

    # 3b. Foldable spectral EQ: the packed fast path (gains folded into the
    #     inverse constants) must match the complex-spectrum route.
    import crlot_tpu.spectral as spc
    from crlot_tpu.pipeline import istft, stft

    eq = spc.band_gain([2000.0, 8000.0], [1.0, 0.5, 0.1], 48000, 1024)
    y_fast = np.asarray(
        jax.jit(lambda s: ct.round_trip(s, cfg, spectral_fn=eq))(
            jnp.asarray(x1)
        )
    )
    y_cplx = np.asarray(
        jax.jit(
            lambda s: istft(eq(stft(s, cfg)), cfg, length=x1.shape[-1])
        )(jnp.asarray(x1))
    )
    eq_err = float(np.max(np.abs(y_fast - y_cplx)))
    check("spectral_eq_folded_fastpath", eq_err < 5e-4, f"max_err={eq_err:.2e}")

    # 3c. Packed nonlinear fn (noise gate on split Re/Im planes) must match
    #     the complex route exactly (measured bit-identical on device).
    gate = spc.noise_gate(-45.0, attenuation_db=-80.0)
    y_packed = np.asarray(
        jax.jit(lambda s: ct.round_trip(s, cfg, spectral_fn=gate))(
            jnp.asarray(x1)
        )
    )
    y_gc = np.asarray(
        jax.jit(
            lambda s: ct.round_trip(
                s, cfg, spectral_fn=lambda sp: gate(sp)
            )
        )(jnp.asarray(x1))
    )
    pk_err = float(np.max(np.abs(y_packed - y_gc)))
    check("spectral_packed_gate", pk_err < 5e-4, f"max_err={pk_err:.2e}")

    # 3c2. A `.packed` fn with a CLOSED-OVER ARRAY (noise profile): the
    #      fused default route must hoist it into kernel operands
    #      (pallas_rt._convert_spectral) and still match the complex
    #      route on the real chip.
    noise_prof = np.full(513, 0.02, np.float32)
    sub = spc.spectral_subtraction(jnp.asarray(noise_prof), alpha=1.2)
    y_sub = np.asarray(
        jax.jit(lambda s: ct.round_trip(s, cfg, spectral_fn=sub))(
            jnp.asarray(x1)
        )
    )
    y_sub_c = np.asarray(
        jax.jit(
            lambda s: ct.round_trip(
                s, cfg, spectral_fn=lambda sp: sub(sp)
            )
        )(jnp.asarray(x1))
    )
    sub_err = float(np.max(np.abs(y_sub - y_sub_c)))
    check("spectral_subtraction_fused_hoist", sub_err < 5e-4,
          f"max_err={sub_err:.2e}")

    # 3c3. MESH nonlinear route (shard_map + fused frames kernel) on a
    #      1-device mesh: the only place this lowering meets real
    #      hardware before a pod does.
    from crlot_tpu.core.types import FftBackend
    from crlot_tpu.distributed.mesh import make_mesh
    from crlot_tpu.distributed.sharded_pipeline import sharded_round_trip

    mcfg = ct.StftConfig(
        frame_size=1024, hop_size=256, center=False,
        fft_backend=FftBackend.MATMUL,
    )
    mesh1 = make_mesh(channel=1, time=1)
    n_s = (x1.shape[-1] // 2048) * 2048  # hop- and block-aligned length
    xm = x1[:n_s].reshape(1, -1)
    y_mesh = np.asarray(
        sharded_round_trip(
            jnp.asarray(xm), mcfg, mesh1, spectral_fn=gate
        )
    )
    y_ref = np.asarray(
        jax.jit(lambda s: ct.round_trip(s, mcfg, spectral_fn=gate))(
            jnp.asarray(xm[0])
        )
    )
    cov = (mcfg.frame_spec.num_frames(xm.shape[1]) - 1) * 256 + 1024
    # INTERIOR comparison only: the first/last N-H samples divide
    # near-zero COLA coverage by eps on both routes, amplifying ULP
    # noise arbitrarily (the dryrun's edge_policy).
    m_err = float(np.max(np.abs(
        y_mesh[0][768 : cov - 768] - y_ref[768 : cov - 768]
    )))
    check("mesh_fused_spectral_1dev", m_err < 5e-4, f"max_err={m_err:.2e}")

    # 3d. Complex response (pure delay) through the composed one-matmul
    #     path: output must be the delayed input.
    k = np.arange(513)
    delay = spc.per_bin_filter(np.exp(-2j * np.pi * k * 8 / 1024))
    y_d = np.asarray(
        jax.jit(lambda s: ct.round_trip(s, cfg, spectral_fn=delay))(
            jnp.asarray(x1)
        )
    )
    body = slice(2048, len(x1) - 2048)
    snr_d = float(ct.snr_db(np.roll(x1, 8)[body], y_d[body]))
    check("spectral_complex_delay_composed", snr_d > 60.0,
          f"snr={snr_d:.1f}dB")

    # 3f. Phase vocoder: complex64 stays inside one jit (eager complex ops
    #     fail UNIMPLEMENTED on this backend); duration law + finite out.
    t1 = np.arange(24000) / 48000.0
    tone = (0.5 * np.sin(2 * np.pi * 440 * t1)).astype(np.float32)
    y_st = np.asarray(ct.time_stretch(jnp.asarray(tone), cfg, 1.5))
    ok_st = (
        np.isfinite(y_st).all()
        and abs(y_st.shape[-1] / len(tone) - 1.5) < 0.05
    )
    check("vocoder_time_stretch", ok_st,
          f"len_ratio={y_st.shape[-1] / len(tone):.3f}")

    # 3g. Toeplitz-matmul convolution vs numpy on device.
    taps = (np.hamming(255) / 127.0).astype(np.float32)
    y_cv = np.asarray(
        jax.jit(lambda s: ct.convolve(s, taps, mode="same"))(
            jnp.asarray(tone)
        )
    )
    want_cv = np.convolve(tone.astype(np.float64), taps, mode="same")
    cv_err = float(np.sqrt(np.mean((y_cv - want_cv) ** 2)))
    check("convolve_toeplitz_matmul", cv_err < 1e-5, f"rmse={cv_err:.2e}")

    # 3e. INT8X2 tier (double-rate MXU path, opt-in) still clears the gate.
    cfg_i8 = ct.StftConfig(
        frame_size=1024, hop_size=256, center=True,
        fft_precision=ct.FftPrecision.INT8X2,
    )
    y_i8 = np.asarray(
        jax.jit(lambda s: ct.round_trip(s, cfg_i8))(jnp.asarray(x1))
    )
    snr_i8 = float(ct.snr_db(x1, y_i8))
    check("int8x2_tier_roundtrip", snr_i8 > 60.0, f"snr={snr_i8:.1f}dB")

    # 4. Plan API (scrub path) + CT backend (large pow2).
    plan = ct.make_fft_plan(
        ct.FftPlanDesc(domain=ct.FftDomain.REAL, nfft=1024, batch=4)
    )
    fr = rng.uniform(-1, 1, (4, 1024)).astype(np.float32)
    fr[0, 0] = np.nan
    sp = plan.forward(jnp.asarray(fr))
    back = np.asarray(plan.inverse(sp))
    check("plan_scrub_finite", np.isfinite(back).all())
    big = rng.uniform(-1, 1, (2, 8192)).astype(np.float32)
    from crlot_tpu.fft import dispatch as _fftd

    spec_big = _fftd.rfft(jnp.asarray(big), 8192)
    rt_big = np.asarray(_fftd.irfft(spec_big, 8192))
    rmse = float(np.sqrt(np.mean((rt_big - big) ** 2)))
    check("ct_backend_8192_roundtrip", rmse < 1e-4, f"rmse={rmse:.2e}")

    # 5. Resampler on MXU.
    t = np.arange(24000, dtype=np.float32) / 48000
    sine = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y48 = np.asarray(ct.resample(jnp.asarray(sine), 48000, 44100))
    check(
        "resample_44k1",
        abs(y48.shape[-1] - int(len(sine) * 44100 / 48000)) <= 1,
        str(y48.shape),
    )

    # 6. Streaming scan pipeline on device (uncentered by design; output is
    #    sample-aligned with an N-sample partial-coverage warm-up).
    cfg_s = ct.StftConfig(frame_size=1024, hop_size=256, center=False)
    ys, valid_from = ct.streaming_round_trip(x1, cfg_s)
    m = min(len(x1), len(ys))
    snrs = float(ct.snr_db(x1[valid_from:m], np.asarray(ys)[valid_from:m]))
    check("streaming_round_trip", snrs > 60.0, f"snr={snrs:.1f}dB")

    # 7. Feature stack (mel/MFCC matmuls) on device.
    mel = np.asarray(
        ct.mel_spectrogram(jnp.asarray(x1), cfg_s, 48000.0, n_mels=64)
    )
    check(
        "mel_spectrogram",
        np.isfinite(mel).all() and mel.min() >= 0 and mel.shape[-1] == 64,
        str(mel.shape),
    )

    # 8. Associative-scan IIR vs scipy on device (exact-f32 scan products;
    #    the default bf16 matmul passes measured ~41 dB here — HIGHEST in
    #    iir._affine_scan is what this gate protects).
    import scipy.signal

    sos = ct.butter_sos(4, 0.2)
    y_iir = np.asarray(ct.sosfilt(sos, jnp.asarray(x1)))
    want_iir = scipy.signal.sosfilt(sos, x1.astype(np.float64))
    snr_iir = float(ct.snr_db(want_iir.astype(np.float32), y_iir))
    check("iir_sosfilt_vs_scipy", snr_iir > 70.0, f"snr={snr_iir:.1f}dB")

    failed = [r for r in results if not r[1]]
    print(f"{len(results) - len(failed)}/{len(results)} passed", flush=True)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
