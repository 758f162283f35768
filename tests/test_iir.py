"""IIR filtering (associative-scan DF2T) vs scipy.signal oracles.

Pattern per SURVEY.md §4: dual-implementation equivalence against the
sequential scipy reference in float64, with SNR gates for the f32 device
path, plus chunked-streaming state-carry consistency.
"""

import numpy as np
import pytest
import scipy.signal

from crlot_tpu.iir import (
    a_weighting_sos,
    butter_sos,
    c_weighting_sos,
    lfilter,
    sosfilt,
    sosfilt_zi,
    sosfiltfilt,
)
from crlot_tpu.metrics import snr_db


def _noise(n, seed=0):
    return np.random.default_rng(seed).standard_normal(n).astype(np.float32)


# ---------------------------------------------------------------------------
# sosfilt vs scipy
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("order", [2, 4, 6])
def test_sosfilt_matches_scipy(order):
    sos = scipy.signal.butter(order, 0.2, output="sos")
    x = _noise(48000)
    want = scipy.signal.sosfilt(sos, x.astype(np.float64))
    got = np.asarray(sosfilt(sos, x))
    assert snr_db(want.astype(np.float32), got) > 70.0


def test_sosfilt_highpass_matches_scipy():
    sos = scipy.signal.butter(4, 0.35, btype="highpass", output="sos")
    x = _noise(20000, seed=1)
    want = scipy.signal.sosfilt(sos, x.astype(np.float64))
    got = np.asarray(sosfilt(sos, x))
    assert snr_db(want.astype(np.float32), got) > 70.0


def test_sosfilt_impulse_response():
    sos = scipy.signal.butter(4, 0.25, output="sos")
    x = np.zeros(256, np.float32)
    x[0] = 1.0
    want = scipy.signal.sosfilt(sos, x.astype(np.float64))
    got = np.asarray(sosfilt(sos, x))
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_sosfilt_zi_state_carry_matches_scipy():
    sos = scipy.signal.butter(4, 0.2, output="sos")
    rng = np.random.default_rng(2)
    x = rng.standard_normal(4096).astype(np.float32)
    zi = rng.standard_normal((sos.shape[0], 2)).astype(np.float32)
    want_y, want_zf = scipy.signal.sosfilt(
        sos, x.astype(np.float64), zi=zi.astype(np.float64)
    )
    got_y, got_zf = sosfilt(sos, x, zi=zi)
    assert snr_db(want_y.astype(np.float32), np.asarray(got_y)) > 70.0
    np.testing.assert_allclose(np.asarray(got_zf), want_zf, atol=1e-4)


def test_sosfilt_chunked_stream_matches_oneshot():
    # Carry zf across chunks; must match the one-shot filter to f32
    # tolerance (scan reduction order differs across chunk boundaries, so
    # bit-exactness is not promised — unlike the OLA paths).
    sos = scipy.signal.butter(6, 0.15, output="sos")
    x = _noise(32768, seed=3)
    one = np.asarray(sosfilt(sos, x))
    z = np.zeros((sos.shape[0], 2), np.float32)
    outs = []
    for chunk in np.split(x, 8):
        y, z = sosfilt(sos, chunk, zi=z)
        outs.append(np.asarray(y))
    chunked = np.concatenate(outs)
    assert snr_db(one, chunked) > 90.0


def test_sosfilt_batched():
    sos = scipy.signal.butter(2, 0.3, output="sos")
    x = np.stack([_noise(8192, seed=i) for i in range(3)])
    got = np.asarray(sosfilt(sos, x))
    for i in range(3):
        single = np.asarray(sosfilt(sos, x[i]))
        np.testing.assert_allclose(got[i], single, rtol=1e-5, atol=1e-6)


def test_sosfilt_validation():
    with pytest.raises(ValueError):
        sosfilt(np.zeros((2, 5)), _noise(64))
    bad = np.array([[1.0, 0, 0, 0.0, 0, 0]])  # a0 == 0
    with pytest.raises(ValueError):
        sosfilt(bad, _noise(64))
    sos = scipy.signal.butter(4, 0.2, output="sos")
    with pytest.raises(ValueError):
        sosfilt(sos, _noise(64), zi=np.zeros((1, 2), np.float32))


# ---------------------------------------------------------------------------
# sosfilt_zi / sosfiltfilt vs scipy
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("order", [2, 4, 7])
def test_sosfilt_zi_matches_scipy(order):
    sos = scipy.signal.butter(order, 0.22, output="sos")
    np.testing.assert_allclose(
        sosfilt_zi(sos), scipy.signal.sosfilt_zi(sos), rtol=1e-10
    )


def test_sosfilt_zi_step_has_no_transient():
    sos = scipy.signal.butter(4, 0.2, output="sos")
    step = np.ones(256, np.float32)
    zi = np.asarray(sosfilt_zi(sos), np.float32)
    y, _ = sosfilt(sos, step, zi=zi)
    np.testing.assert_allclose(np.asarray(y), 1.0, atol=1e-4)


@pytest.mark.parametrize("order", [2, 4])
def test_sosfiltfilt_matches_scipy(order):
    sos = scipy.signal.butter(order, 0.2, output="sos")
    x = _noise(16384, seed=8)
    want = scipy.signal.sosfiltfilt(sos, x.astype(np.float64))
    got = np.asarray(sosfiltfilt(sos, x))
    assert snr_db(want.astype(np.float32), got) > 70.0


def test_sosfiltfilt_zero_phase():
    # A passband tone must come out with zero group delay (forward pass
    # alone delays it). Compare phase via cross-correlation peak.
    sr = 48000
    t = np.arange(sr // 2) / sr
    x = np.sin(2 * np.pi * 500 * t).astype(np.float32)
    sos = scipy.signal.butter(4, 0.1, output="sos")
    y = np.asarray(sosfiltfilt(sos, x))
    mid = slice(sr // 8, 3 * sr // 8)
    lag = np.argmax(np.correlate(y[mid], x[mid], mode="full"))
    assert lag == len(x[mid]) - 1  # zero shift
    y_fwd = np.asarray(sosfilt(sos, x))
    lag_f = np.argmax(np.correlate(y_fwd[mid], x[mid], mode="full"))
    assert lag_f != len(x[mid]) - 1  # forward-only IS delayed


def test_sosfiltfilt_batched_matches_single():
    sos = scipy.signal.butter(4, 0.25, output="sos")
    x = np.stack([_noise(4096, seed=i) for i in range(3)])
    got = np.asarray(sosfiltfilt(sos, x))
    for i in range(3):
        one = np.asarray(sosfiltfilt(sos, x[i]))
        np.testing.assert_allclose(got[i], one, rtol=1e-4, atol=1e-6)


def test_sosfiltfilt_padlen_validation():
    sos = scipy.signal.butter(4, 0.25, output="sos")
    with pytest.raises(ValueError):
        sosfiltfilt(sos, _noise(12))  # default padlen (15) >= signal length


# ---------------------------------------------------------------------------
# lfilter vs scipy
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("order", [1, 2, 5])
def test_lfilter_matches_scipy(order):
    b, a = scipy.signal.butter(order, 0.25)
    x = _noise(16384, seed=4)
    want = scipy.signal.lfilter(b, a, x.astype(np.float64))
    got = np.asarray(lfilter(b, a, x))
    assert snr_db(want.astype(np.float32), got) > 70.0


def test_lfilter_fir_only():
    # Pure FIR through the same path (a = [1]).
    b = np.array([0.25, 0.5, 0.25])
    x = _noise(1024, seed=5)
    want = scipy.signal.lfilter(b, [1.0], x.astype(np.float64))
    got = np.asarray(lfilter(b, [1.0], x))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_lfilter_gain_only():
    x = _noise(128, seed=6)
    got = np.asarray(lfilter([2.0], [1.0], x))
    np.testing.assert_allclose(got, 2.0 * x, rtol=1e-6)


def test_lfilter_zi_matches_scipy():
    b, a = scipy.signal.butter(3, 0.3)
    rng = np.random.default_rng(7)
    x = rng.standard_normal(2048).astype(np.float32)
    zi = rng.standard_normal(3).astype(np.float32)
    want_y, want_zf = scipy.signal.lfilter(
        b, a, x.astype(np.float64), zi=zi.astype(np.float64)
    )
    got_y, got_zf = lfilter(b, a, x, zi=zi)
    assert snr_db(want_y.astype(np.float32), np.asarray(got_y)) > 70.0
    np.testing.assert_allclose(np.asarray(got_zf), want_zf, atol=1e-4)


# ---------------------------------------------------------------------------
# butter_sos designer vs scipy
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("order,wn,btype", [
    (1, 0.2, "lowpass"),
    (2, 0.2, "lowpass"),
    (4, 0.1, "lowpass"),
    (5, 0.4, "lowpass"),
    (3, 0.3, "highpass"),
    (6, 0.15, "highpass"),
])
def test_butter_sos_frequency_response(order, wn, btype):
    mine = butter_sos(order, wn, btype)
    ref = scipy.signal.butter(order, wn, btype=btype, output="sos")
    w, h_mine = scipy.signal.sosfreqz(mine, worN=512)
    _, h_ref = scipy.signal.sosfreqz(ref, worN=512)
    np.testing.assert_allclose(np.abs(h_mine), np.abs(h_ref),
                               rtol=1e-9, atol=1e-12)
    # -3 dB point lands at wn.
    k3 = np.argmin(np.abs(w - np.pi * wn))
    assert abs(20 * np.log10(np.abs(h_mine[k3])) + 3.01) < 0.1


def test_butter_sos_hz_api():
    a = butter_sos(4, 1000.0, "lowpass", fs=48000.0)
    b = butter_sos(4, 2 * 1000.0 / 48000.0, "lowpass")
    np.testing.assert_allclose(a, b, rtol=1e-12)


def test_butter_sos_validation():
    with pytest.raises(ValueError):
        butter_sos(0, 0.5)
    with pytest.raises(ValueError):
        butter_sos(2, 1.5)
    with pytest.raises(ValueError):
        butter_sos(2, 0.5, btype="bandpass")


# ---------------------------------------------------------------------------
# IEC 61672 weighting designers
# ---------------------------------------------------------------------------

def _analog_a_raw(f):
    """IEC 61672 A-weighting analog magnitude in dB, unnormalized (the
    standard's own closed form), as the oracle for the digital design."""
    f = np.asarray(f, dtype=np.float64)
    f2 = f * f
    num = (12194.217 ** 2) * f2 * f2
    den = (
        (f2 + 20.598997 ** 2)
        * np.sqrt((f2 + 107.65265 ** 2) * (f2 + 737.86223 ** 2))
        * (f2 + 12194.217 ** 2)
    )
    return 20.0 * np.log10(num / den)


def _analog_a_db(f):
    # Normalized exactly the way the digital design is: 0 dB at 1 kHz.
    return _analog_a_raw(f) - _analog_a_raw(1000.0)


def _analog_c_raw(f):
    f = np.asarray(f, dtype=np.float64)
    f2 = f * f
    num = (12194.217 ** 2) * f2
    den = (f2 + 20.598997 ** 2) * (f2 + 12194.217 ** 2)
    return 20.0 * np.log10(num / den)


def _analog_c_db(f):
    return _analog_c_raw(f) - _analog_c_raw(1000.0)


def _digital_db(sos, f, fs):
    w, h = scipy.signal.sosfreqz(sos, worN=2 * np.pi * np.atleast_1d(f) / fs)
    return 20.0 * np.log10(np.abs(h))


@pytest.mark.parametrize("fs", [44100.0, 48000.0, 96000.0])
def test_a_weighting_matches_analog_curve(fs):
    sos = a_weighting_sos(fs)
    assert sos.shape == (3, 6)
    # Exactly 0 dB at the 1 kHz reference by construction.
    assert abs(_digital_db(sos, 1000.0, fs)[0]) < 1e-9
    freqs = np.array([31.5, 63.0, 125.0, 250.0, 500.0, 1000.0, 2000.0,
                      4000.0])
    got = _digital_db(sos, freqs, fs)
    want = _analog_a_db(freqs)
    # Below fs/6 the bilinear warp is negligible (IEC class-1 band is
    # wider than this tolerance everywhere).
    np.testing.assert_allclose(got, want, atol=0.06)
    # 8 kHz / 16 kHz: warping grows with f/fs; class-2 tolerances there
    # are +-2.5 / +5,-inf dB.
    assert abs(_digital_db(sos, 8000.0, fs)[0] - _analog_a_db(8000.0)) < 1.0


def test_a_weighting_iec_spot_values():
    # Published table values (rounded to 0.1 dB) at 48 kHz.
    sos = a_weighting_sos(48000.0)
    for f, want in [(31.5, -39.4), (125.0, -16.1), (500.0, -3.2),
                    (2000.0, 1.2), (4000.0, 1.0)]:
        got = _digital_db(sos, f, 48000.0)[0]
        assert abs(got - want) < 0.15, (f, got, want)


@pytest.mark.parametrize("fs", [44100.0, 48000.0])
def test_c_weighting_matches_analog_curve(fs):
    sos = c_weighting_sos(fs)
    assert sos.shape == (2, 6)
    assert abs(_digital_db(sos, 1000.0, fs)[0]) < 1e-9
    freqs = np.array([31.5, 125.0, 1000.0, 4000.0])
    np.testing.assert_allclose(
        _digital_db(sos, freqs, fs), _analog_c_db(freqs), atol=0.1
    )


def test_weighting_filters_run_through_sosfilt():
    # End-to-end: A-weighted level of a 100 Hz tone is ~19 dB below the
    # same-amplitude 1 kHz tone (table: A(100) = -19.1 dB).
    sr = 48000
    t = np.arange(sr) / sr
    sos = a_weighting_sos(float(sr))
    lvl = {}
    for f in (100.0, 1000.0):
        x = np.sin(2 * np.pi * f * t).astype(np.float32)
        y = np.asarray(sosfilt(sos, x))[sr // 4:]
        lvl[f] = 20 * np.log10(np.std(y) / np.std(x[sr // 4:]))
    assert abs(lvl[1000.0]) < 0.1
    assert abs(lvl[100.0] - (-19.1)) < 0.3


def test_weighting_validation():
    with pytest.raises(ValueError):
        a_weighting_sos(1000.0)
    with pytest.raises(ValueError):
        c_weighting_sos(500.0)


def test_designed_filter_end_to_end():
    # Design + filter: a 4th-order lowpass at 0.1 Nyquist attenuates a
    # high tone by >= 35 dB while passing a low tone within 1 dB.
    sr = 48000
    t = np.arange(sr) / sr
    lo = np.sin(2 * np.pi * 200 * t).astype(np.float32)
    hi = np.sin(2 * np.pi * 8000 * t).astype(np.float32)
    sos = butter_sos(4, 1000.0, "lowpass", fs=sr)
    y_lo = np.asarray(sosfilt(sos, lo))[sr // 4:]
    y_hi = np.asarray(sosfilt(sos, hi))[sr // 4:]
    gain_lo = 20 * np.log10(np.std(y_lo) / np.std(lo[sr // 4:]))
    gain_hi = 20 * np.log10(np.std(y_hi) / np.std(hi[sr // 4:]))
    assert abs(gain_lo) < 1.0
    assert gain_hi < -35.0
