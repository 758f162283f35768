"""Scan-based streaming pipeline vs offline pipeline equivalence."""

import numpy as np
import pytest

from crlot_tpu.core.types import StftConfig
from crlot_tpu.metrics import snr_db
from crlot_tpu.pipeline import round_trip
from crlot_tpu.streaming_pipeline import streaming_round_trip


def _sig(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(-0.9, 0.9, n).astype(np.float32)


@pytest.mark.parametrize("n,hop,bf", [(256, 64, 16), (1024, 256, 8), (256, 128, 32)])
def test_streaming_matches_offline_interior(n, hop, bf):
    cfg = StftConfig(frame_size=n, hop_size=hop, center=False)
    x = _sig(hop * bf * 6 + n)
    got, valid_from = streaming_round_trip(x, cfg, block_frames=bf)
    want = np.asarray(round_trip(x, cfg))
    lo, hi = max(valid_from, n), len(got) - n
    assert snr_db(want[lo:hi], got[lo:hi]) > 120.0
    # reconstruction quality vs the original signal too
    assert snr_db(x[lo:hi], got[lo:hi]) > 80.0


def test_streaming_block_boundaries_bitexact():
    # The carry hand-off must not depend on block size: two block sizes give
    # bit-identical streams (same frame set, same summation order).
    cfg = StftConfig(frame_size=256, hop_size=64, center=False)
    x = _sig(64 * 96 + 256, seed=1)
    a, _ = streaming_round_trip(x, cfg, block_frames=8)
    b, _ = streaming_round_trip(x, cfg, block_frames=32)
    m = min(len(a), len(b))
    np.testing.assert_array_equal(a[:m], b[:m])


def test_streaming_too_short_raises():
    cfg = StftConfig(frame_size=256, hop_size=64, center=False)
    with pytest.raises(ValueError):
        streaming_round_trip(_sig(100), cfg, block_frames=8)


def test_streaming_center_rejected():
    cfg = StftConfig(frame_size=256, hop_size=64, center=True)
    with pytest.raises(ValueError):
        streaming_round_trip(_sig(10000), cfg)


def test_streaming_matmul_backend_packed_path():
    """Forcing the MATMUL backend exercises the packed tiled round-trip
    inside the scan (the TPU lowering) on CPU; output must match the XLA
    route within the matmul-DFT tolerance and keep block-size invariance."""
    from crlot_tpu.core.types import FftBackend, FftPrecision

    cfg = StftConfig(
        frame_size=512, hop_size=128, center=False,
        fft_backend=FftBackend.MATMUL, fft_precision=FftPrecision.HIGHEST,
    )
    cfg_xla = StftConfig(frame_size=512, hop_size=128, center=False)
    x = _sig(128 * 128 + 512, seed=2)
    a, v = streaming_round_trip(x, cfg, block_frames=16)
    b, _ = streaming_round_trip(x, cfg_xla, block_frames=16)
    m = min(len(a), len(b))
    np.testing.assert_allclose(a[v:m], b[v:m], atol=1e-4)
    c, _ = streaming_round_trip(x, cfg, block_frames=64)
    m = min(len(a), len(c))
    # CPU GEMM reduction order can vary with the batch (M) dimension, so
    # block-size invariance is ULP-tight here, not bit-exact (the XLA-FFT
    # route, transformed row-wise, stays bit-exact — tested above).
    np.testing.assert_allclose(a[:m], c[:m], atol=2e-6)


def test_streaming_spectral_fn_matches_offline():
    """Streaming with a spectral fn equals offline round_trip with the same
    fn on the interior — across all three lowerings: composed (fixed EQ on
    MATMUL), packed (noise gate on MATMUL), complex (XLA route)."""
    import crlot_tpu.spectral as S
    from crlot_tpu.core.types import FftBackend, FftPrecision

    n, hop, bf = 512, 128, 16
    x = _sig(hop * bf * 6 + n, seed=3)
    cfg_mm = StftConfig(
        frame_size=n, hop_size=hop, center=False,
        fft_backend=FftBackend.MATMUL, fft_precision=FftPrecision.HIGHEST,
    )
    cfg_xla = StftConfig(frame_size=n, hop_size=hop, center=False)
    eq = S.band_gain([4000.0, 12000.0], [1.0, 0.4, 0.1], 48000, n)
    gate = S.noise_gate(-40.0)
    for cfg, fn in [
        (cfg_mm, eq),      # composed one-matmul path
        (cfg_mm, gate),    # packed Re/Im path
        (cfg_xla, eq),     # complex XLA route
        (cfg_xla, lambda s: s * 0.5),  # plain fn, complex route
    ]:
        got, valid_from = streaming_round_trip(
            x, cfg, block_frames=bf, spectral_fn=fn
        )
        want = np.asarray(round_trip(x, cfg, spectral_fn=fn))
        lo, hi = max(valid_from, n), len(got) - n
        assert snr_db(want[lo:hi], got[lo:hi]) > 90.0, (cfg.fft_backend, fn)


def test_process_wav_file_matches_unbroken_stream(tmp_path):
    """File-to-file chunked processing equals one unbroken streaming run
    bit-for-bit before the 16-bit quantization, and survives WAV round-trip
    at the codec's precision; stereo + EQ + zero-padded tail covered."""
    import crlot_tpu as ct
    from crlot_tpu import spectral as S
    from crlot_tpu.streaming_pipeline import process_wav_file

    rng = np.random.default_rng(9)
    sr = 48000
    total = 50321  # deliberately NOT chunk-aligned (exercises EOF padding)
    x = rng.uniform(-0.8, 0.8, (2, total)).astype(np.float32)
    infile = str(tmp_path / "in.wav")
    outfile = str(tmp_path / "out.wav")
    ct.write_wav(infile, x, sr, bits=32, float_format=True)

    cfg = StftConfig(frame_size=512, hop_size=128, center=False)
    eq = S.band_gain([4000.0], [1.0, 0.5], sr, 512)
    n_written = process_wav_file(
        infile, outfile, cfg, spectral_fn=eq,
        block_frames=16, blocks_per_chunk=4, bits=32,
    )
    assert n_written == total
    y, _ = ct.read_wav(outfile)
    assert y.shape == (2, total)

    # reference: unbroken single-call stream per channel over the same
    # frame set (zero-pad past EOF like the chunked path does)
    n, hop = 512, 128
    chunk = 16 * 4 * hop
    span_frames = -(-total // chunk) * (chunk // hop)
    need = (span_frames - 1) * hop + n
    xp = np.pad(x, [(0, 0), (0, need - total)])
    for c in range(2):
        want, _ = __import__("crlot_tpu").streaming_round_trip(
            xp[c], cfg, block_frames=16, spectral_fn=eq
        )
        np.testing.assert_allclose(
            y[c], want[:total], atol=2e-6,
        )


def test_int16_wire_path_within_one_lsb():
    """The int16-wire streaming path (dequantize in-jit -> round-trip ->
    requantize, bench/suite.py's sustained loop) must match the f32 path
    run on the SAME dequantized input to within one output LSB — the only
    difference is the final quantization step (verdict r3 item 2)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from crlot_tpu.core.types import StftConfig
    from crlot_tpu.frame.framing import hop_block_frames
    from crlot_tpu.streaming_pipeline import streaming_round_trip_blocks

    cfg = StftConfig(frame_size=256, hop_size=64, center=False)
    n, hop = 256, 64
    block_frames, blocks = 8, 4
    chunk_frames = block_frames * blocks
    span = chunk_frames * hop + (n - hop)
    rng = np.random.default_rng(7)
    x = rng.uniform(-0.9, 0.9, span).astype(np.float32)
    x_i16 = np.clip(np.rint(x * 32768.0), -32768, 32767).astype(np.int16)
    tail0 = jnp.zeros(n - hop, jnp.float32)

    @jax.jit
    def f32_path(seg):
        frames = hop_block_frames(seg, n, hop, chunk_frames)
        frames = frames.reshape(blocks, block_frames, n)
        y, _ = streaming_round_trip_blocks(
            frames, cfg, block_frames, None, carry_tail=tail0,
            return_carry=True,
        )
        return y

    @jax.jit
    def i16_path(seg_i16):
        xf = seg_i16.astype(jnp.float32) * jnp.float32(1.0 / 32768.0)
        y = f32_path(xf)
        return jnp.clip(
            jnp.round(y * 32768.0), -32768.0, 32767.0
        ).astype(jnp.int16)

    dequant = x_i16.astype(np.float32) / 32768.0
    y_f32 = np.asarray(f32_path(jnp.asarray(dequant)))
    y_i16 = np.asarray(i16_path(jnp.asarray(x_i16)))
    delta_lsb = np.max(
        np.abs(y_i16.astype(np.float32) / 32768.0 - y_f32)
    ) * 32768.0
    assert delta_lsb <= 1.0, f"int16 wire path off by {delta_lsb:.2f} LSB"


def test_scan_over_chunks_matches_chunked_dispatch():
    """The suite's one-program device-resident formulation (lax.scan over
    chunks, bench/suite.py stream_sustained_device_resident_scan_*) must be
    bit-identical to dispatching the same chunk program once per chunk with
    a host-carried tail — same chunk boundaries, same OLA accumulation
    order, so the outputs may not differ by even 1 ULP."""
    import jax
    import jax.numpy as jnp

    from crlot_tpu.core.types import StftConfig
    from crlot_tpu.frame.framing import hop_block_frames
    from crlot_tpu.streaming_pipeline import streaming_round_trip_blocks

    cfg = StftConfig(frame_size=256, hop_size=64, center=False)
    n, hop = 256, 64
    block_frames, blocks_per_chunk, n_chunks = 8, 4, 5
    chunk_frames = block_frames * blocks_per_chunk
    chunk_samples = chunk_frames * hop
    span = chunk_samples + (n - hop)
    x = _sig(n_chunks * chunk_samples + (n - hop), seed=11)

    def chunk(seg, tail):
        frames = hop_block_frames(seg, n, hop, chunk_frames)
        frames = frames.reshape(blocks_per_chunk, block_frames, n)
        return streaming_round_trip_blocks(
            frames, cfg, block_frames, None, carry_tail=tail,
            return_carry=True,
        )

    segs = np.stack(
        [x[k * chunk_samples : k * chunk_samples + span]
         for k in range(n_chunks)]
    )

    dispatch = jax.jit(chunk)
    tail = jnp.zeros(n - hop, jnp.float32)
    outs = []
    for k in range(n_chunks):
        y, tail = dispatch(jnp.asarray(segs[k]), tail)
        outs.append(np.asarray(y))

    @jax.jit
    def scan_program(segs2, tail0):
        def step_fn(tail_c, seg):
            y, tail2 = chunk(seg, tail_c)
            return tail2, y

        return jax.lax.scan(step_fn, tail0, segs2)

    _, ys = scan_program(
        jnp.asarray(segs), jnp.zeros(n - hop, jnp.float32)
    )
    np.testing.assert_array_equal(np.asarray(ys), np.stack(outs))
