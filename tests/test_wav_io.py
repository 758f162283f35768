"""WAV I/O tests (reference: tests/wav_io_test.cc).

Patterns: 16-bit round-trip error <= -84 dBFS across levels; float32
round-trip of the oboe asset <= -100 dBFS; 16/24/32-bit and 44.1k/48k
round-trips, mono/stereo; invalid-format rejection.
"""

import struct

import numpy as np
import pytest

from crlot_tpu.io.wav import (
    WavFormatError,
    WavReader,
    WavWriter,
    read_wav,
    write_wav,
)
from crlot_tpu.metrics import rms_db


def _sine(n, freq, sr, amp=0.5):
    t = np.arange(n, dtype=np.float64) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


@pytest.mark.parametrize("level_db", [0.0, -6.0, -20.0, -60.0])
def test_16bit_round_trip_error(tmp_path, level_db):
    sr = 48000
    amp = 10 ** (level_db / 20.0) * 0.999
    x = _sine(sr, 440.0, sr, amp)
    p = str(tmp_path / "t16.wav")
    write_wav(p, x, sr, bits=16)
    y, rate = read_wav(p)
    assert rate == sr
    err = rms_db(np.asarray(y[0]) - x)
    assert err <= -84.0, f"16-bit round-trip error {err:.1f} dBFS"


def test_float32_round_trip_bit_exact(tmp_path):
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, 10000).astype(np.float32)
    p = str(tmp_path / "f32.wav")
    write_wav(p, x, 44100, float_format=True)
    y, _ = read_wav(p)
    np.testing.assert_array_equal(y[0], x)  # beats the -100 dBFS gate


def test_float32_oboe_round_trip(tmp_path, oboe):
    x, sr = oboe
    p = str(tmp_path / "oboe_f32.wav")
    write_wav(p, x, sr, float_format=True)
    y, rate = read_wav(p)
    assert rate == sr
    err = rms_db(np.asarray(y[0]) - x)
    assert err <= -100.0 or err == float("-inf")


@pytest.mark.parametrize("bits,gate_dbfs", [(16, -84.0), (24, -130.0), (32, -180.0)])
@pytest.mark.parametrize("sr", [44100, 48000])
def test_bit_depths_round_trip(tmp_path, bits, gate_dbfs, sr):
    x = _sine(sr // 10, 997.0, sr, 0.9)
    p = str(tmp_path / f"t{bits}_{sr}.wav")
    write_wav(p, x, sr, bits=bits)
    y, rate = read_wav(p)
    assert rate == sr
    assert rms_db(np.asarray(y[0]) - x) <= gate_dbfs


def test_stereo_round_trip(tmp_path):
    sr = 48000
    x = np.stack([_sine(4800, 440, sr), _sine(4800, 880, sr)])
    p = str(tmp_path / "stereo.wav")
    write_wav(p, x, sr, bits=24)
    y, _ = read_wav(p)
    assert y.shape == x.shape
    assert rms_db(y - x) <= -120.0


def test_clipping_clamps(tmp_path):
    x = np.array([2.0, -2.0, 0.5], dtype=np.float32)
    p = str(tmp_path / "clip.wav")
    write_wav(p, x, 8000, bits=16)
    y, _ = read_wav(p)
    assert abs(y[0, 0] - 1.0) < 1e-4
    assert abs(y[0, 1] + 1.0) < 1e-4


def test_reader_writer_classes(tmp_path):
    sr = 44100
    x = _sine(1000, 440, sr)
    p = str(tmp_path / "cls.wav")
    with WavWriter(p, channels=1, sample_rate=sr, bits=16) as w:
        w.write(x[:500])
        w.write(x[500:])
    r = WavReader(p)
    assert r.channels == 1
    assert r.sample_rate == sr
    assert r.num_frames == 1000
    assert r.read(100, 50).shape == (1, 50)
    assert rms_db(r.read_all()[0] - x) <= -84.0


def test_invalid_formats(tmp_path):
    p = str(tmp_path / "bad.wav")
    with open(p, "wb") as f:
        f.write(b"not a wav file at all")
    with pytest.raises(WavFormatError):
        read_wav(p)
    with pytest.raises(WavFormatError):
        write_wav(str(tmp_path / "x.wav"), np.zeros(10, dtype=np.float32), 8000, bits=8)
    # strict channel guard (reference: io/wav.cc:30-58 channels in {1,2})
    multi = np.zeros((4, 10), dtype=np.float32)
    with pytest.raises(WavFormatError):
        write_wav(str(tmp_path / "m.wav"), multi, 8000)
    # non-strict allows it
    write_wav(str(tmp_path / "m.wav"), multi, 8000, strict=False)
    y, _ = read_wav(str(tmp_path / "m.wav"), strict=False)
    assert y.shape == (4, 10)
    with pytest.raises(WavFormatError):
        read_wav(str(tmp_path / "m.wav"), strict=True)


def test_unsupported_bitdepth_rejected(tmp_path):
    # Hand-craft an 8-bit PCM wav; reader must reject (bits in {16,24,32})
    p = str(tmp_path / "u8.wav")
    payload = bytes(range(100))
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(payload)) + payload
    with open(p, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body)
    with pytest.raises(WavFormatError):
        read_wav(p)


def test_extra_chunks_skipped(tmp_path):
    # LIST/INFO chunks before data must be skipped
    sr = 8000
    x = _sine(100, 440, sr)
    p = str(tmp_path / "chunks.wav")
    write_wav(p, x, sr, bits=16)
    with open(p, "rb") as f:
        blob = f.read()
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    patched = blob[:12] + extra + blob[12:]
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    p2 = str(tmp_path / "chunks2.wav")
    with open(p2, "wb") as f:
        f.write(patched)
    y, rate = read_wav(p2)
    assert rate == sr
    assert y.shape == (1, 100)


def test_stream_reader_matches_full_read(tmp_path, oboe):
    from crlot_tpu.io.wav import WavStreamReader

    x, sr = oboe
    p = str(tmp_path / "stream.wav")
    write_wav(p, x, sr, bits=16)
    full, _ = read_wav(p)
    r = WavStreamReader(p)
    assert (r.channels, r.sample_rate, r.num_frames) == (1, sr, len(x))
    chunks = [r.read_chunk(10007) for _ in range(len(x) // 10007 + 2)]
    got = np.concatenate([c for c in chunks if c.size], axis=1)
    np.testing.assert_array_equal(got, full)
    assert r.read_chunk(10).shape == (1, 0)  # EOF
    r.seek(100)
    np.testing.assert_array_equal(r.read_chunk(5), full[:, 100:105])
    got_iter = np.concatenate(list(WavStreamReader(p)), axis=1)
    np.testing.assert_array_equal(got_iter, full)


def test_malformed_wav_fuzz(tmp_path):
    """Truncations and byte corruptions of a valid WAV must raise a clean
    WavFormatError/ValueError (or decode successfully) — never crash, hang,
    or return non-finite audio. Reference posture: io/wav.cc:30-58 format
    guards."""
    import numpy as np

    from crlot_tpu.io.wav import WavFormatError, read_wav, write_wav

    good = tmp_path / "good.wav"
    rng = np.random.default_rng(0)
    x = rng.uniform(-0.5, 0.5, 2000).astype(np.float32)
    write_wav(str(good), x, 16000, bits=16)
    blob = good.read_bytes()

    cases = []
    for cut in (0, 3, 11, 12, 20, 43, 44, len(blob) // 2, len(blob) - 1):
        cases.append(blob[:cut])
    for pos in (0, 8, 20, 22, 34, 40):
        b = bytearray(blob)
        b[pos] ^= 0xFF
        cases.append(bytes(b))
    cases.append(b"")
    cases.append(b"RIFF" + b"\x00" * 100)
    cases.append(rng.bytes(256))

    bad = tmp_path / "bad.wav"
    for i, payload in enumerate(cases):
        bad.write_bytes(payload)
        try:
            data, sr = read_wav(str(bad))
        except (WavFormatError, ValueError, EOFError) as e:
            assert str(e), f"case {i}: empty error message"
            continue
        # Decoded despite corruption: output must still be sane.
        assert np.isfinite(np.asarray(data)).all(), f"case {i}"
        assert sr > 0, f"case {i}"
