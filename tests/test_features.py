"""Spectral features: mel filterbank / mel spectrogram / MFCC / descriptors.

Oracle strategy (SURVEY.md §4 pattern 1): brute-force per-bin triangle
construction for the filterbank, scipy.fft.dct for the MFCC's DCT stage, and
analytic tone/noise gates for the descriptors.
"""

import numpy as np
import pytest
import scipy.fft

import jax.numpy as jnp

from crlot_tpu.core.types import StftConfig
from crlot_tpu.features import (
    _dct_ii_ortho,
    hz_to_mel,
    mel_filterbank,
    mel_spectrogram,
    mel_to_hz,
    mfcc,
    power_to_db,
    spectral_bandwidth,
    spectral_centroid,
    spectral_flatness,
    spectral_rolloff,
)
from crlot_tpu.pipeline import stft

SR = 48000
CFG = StftConfig(frame_size=1024, hop_size=256, center=True)


def _tone(freq, seconds=0.5, sr=SR):
    t = np.arange(int(seconds * sr)) / sr
    return np.sin(2 * np.pi * freq * t).astype(np.float32)


# ---------------------------------------------------------------------------
# mel scale
# ---------------------------------------------------------------------------

def test_htk_mel_1khz():
    # 2595*log10(1 + 1000/700) is within 0.02 mel of 1000 by construction.
    assert abs(hz_to_mel(1000.0, htk=True) - 1000.0) < 0.1


def test_slaney_mel_linear_below_1khz():
    # Slaney: linear region f/66.67 mel.
    assert abs(hz_to_mel(500.0) - 500.0 * 3.0 / 200.0) < 1e-9


@pytest.mark.parametrize("htk", [False, True])
def test_mel_hz_roundtrip(htk):
    f = np.linspace(0.0, SR / 2, 777)
    back = mel_to_hz(hz_to_mel(f, htk), htk)
    np.testing.assert_allclose(back, f, rtol=1e-12, atol=1e-9)


# ---------------------------------------------------------------------------
# filterbank
# ---------------------------------------------------------------------------

def _oracle_fb(sr, n_fft, n_mels, fmin, fmax, htk, norm):
    """Brute per-bin triangle evaluation (independent formulation: piecewise
    linear in Hz per bin, explicit loops)."""
    pts = mel_to_hz(
        np.linspace(hz_to_mel(fmin, htk), hz_to_mel(fmax, htk), n_mels + 2),
        htk,
    )
    freqs = np.fft.rfftfreq(n_fft, 1.0 / sr)
    fb = np.zeros((n_mels, len(freqs)))
    for m in range(n_mels):
        lo, mid, hi = pts[m], pts[m + 1], pts[m + 2]
        for k, f in enumerate(freqs):
            if lo < f < mid:
                fb[m, k] = (f - lo) / (mid - lo)
            elif mid <= f < hi:
                fb[m, k] = (hi - f) / (hi - mid)
            elif f == mid:
                fb[m, k] = 1.0
        if norm == "slaney":
            fb[m] *= 2.0 / (hi - lo)
    return fb.astype(np.float32)


@pytest.mark.parametrize("htk,norm", [(False, "slaney"), (True, None)])
def test_filterbank_vs_bruteforce_oracle(htk, norm):
    got = mel_filterbank(SR, 512, n_mels=24, fmin=50.0, fmax=20000.0,
                         htk=htk, norm=norm)
    want = _oracle_fb(SR, 512, 24, 50.0, 20000.0, htk, norm)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_filterbank_shape_dtype_cache():
    fb = mel_filterbank(SR, 1024, n_mels=64)
    assert fb.shape == (64, 513)
    assert fb.dtype == np.float32
    assert np.all(fb >= 0)
    assert mel_filterbank(SR, 1024, n_mels=64) is fb  # cached object
    assert not fb.flags.writeable


def test_filterbank_unit_peak_when_unnormalized():
    # Wide filters (few mels, many bins): apex lands within one bin of a
    # grid point, so the max is ~1.
    fb = mel_filterbank(SR, 4096, n_mels=16, norm=None)
    peaks = fb.max(axis=1)
    assert np.all(peaks > 0.9) and np.all(peaks <= 1.0 + 1e-6)


def test_filterbank_slaney_unit_area():
    fb = mel_filterbank(SR, 4096, n_mels=16, fmin=100.0, norm="slaney")
    df = SR / 4096
    areas = fb.sum(axis=1) * df
    np.testing.assert_allclose(areas, 1.0, rtol=0.05)


def test_filterbank_validation():
    with pytest.raises(ValueError):
        mel_filterbank(SR, 1024, n_mels=0)
    with pytest.raises(ValueError):
        mel_filterbank(SR, 1024, fmin=-1.0)
    with pytest.raises(ValueError):
        mel_filterbank(SR, 1024, fmin=1000.0, fmax=500.0)
    with pytest.raises(ValueError):
        mel_filterbank(SR, 1024, norm="l2")


# ---------------------------------------------------------------------------
# mel spectrogram
# ---------------------------------------------------------------------------

def test_mel_spectrogram_is_power_matmul():
    x = np.random.default_rng(0).standard_normal(SR // 4).astype(np.float32)
    got = np.asarray(mel_spectrogram(x, CFG, SR, n_mels=40))
    spec = np.asarray(stft(jnp.asarray(x), CFG))
    p = np.abs(spec) ** 2
    fb = mel_filterbank(SR, CFG.frame_size, 40)
    want = p @ fb.T
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)


def test_mel_spectrogram_tone_band():
    freq = 2000.0
    m = np.asarray(mel_spectrogram(_tone(freq), CFG, SR, n_mels=64))
    band = int(np.argmax(m.mean(axis=0)))
    centers = mel_to_hz(
        np.linspace(hz_to_mel(0.0), hz_to_mel(SR / 2), 66), False
    )[1:-1]
    assert abs(centers[band] - freq) < 250.0  # within a band spacing at 2 kHz


def test_mel_spectrogram_batched():
    x = np.random.default_rng(1).standard_normal((3, SR // 8))
    m = mel_spectrogram(x.astype(np.float32), CFG, SR, n_mels=32)
    assert m.shape[:1] == (3,) and m.shape[-1] == 32
    one = mel_spectrogram(x[1].astype(np.float32), CFG, SR, n_mels=32)
    # Batched and unbatched traces may pick different contraction layouts;
    # equality is to f32 tolerance, not bit-exact.
    np.testing.assert_allclose(
        np.asarray(m[1]), np.asarray(one), rtol=1e-5, atol=1e-7
    )


# ---------------------------------------------------------------------------
# MFCC
# ---------------------------------------------------------------------------

def test_dct_matrix_orthonormal():
    d = np.asarray(_dct_ii_ortho(32, 32), dtype=np.float64)
    np.testing.assert_allclose(d @ d.T, np.eye(32), atol=1e-6)


def test_mfcc_matches_scipy_dct_of_logmel():
    x = np.random.default_rng(2).standard_normal(SR // 4).astype(np.float32)
    got = np.asarray(mfcc(x, CFG, SR, n_mfcc=13, n_mels=40))
    logmel = np.asarray(
        power_to_db(mel_spectrogram(x, CFG, SR, n_mels=40))
    ).astype(np.float64)
    want = scipy.fft.dct(logmel, type=2, norm="ortho", axis=-1)[..., :13]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-3)


def test_mfcc_constant_logmel_energy_in_c0():
    # A flat log-mel spectrum has all DCT energy in coefficient 0; white-ish
    # noise is not flat, but a DC log-mel vector run through the DCT matrix
    # directly must be exactly [c0, 0, 0, ...].
    d = np.asarray(_dct_ii_ortho(13, 40), dtype=np.float64)
    out = d @ np.ones(40)
    assert abs(out[0] - np.sqrt(40)) < 1e-5
    np.testing.assert_allclose(out[1:], 0.0, atol=1e-5)


def test_mfcc_validation():
    with pytest.raises(ValueError):
        mfcc(np.zeros(4096, np.float32), CFG, SR, n_mfcc=20, n_mels=13)


# ---------------------------------------------------------------------------
# descriptors
# ---------------------------------------------------------------------------

def test_centroid_of_tone():
    freq = 3000.0
    c = np.asarray(spectral_centroid(_tone(freq), CFG, SR))
    interior = c[4:-4]  # skip centered edge frames
    bin_hz = SR / CFG.frame_size
    assert np.all(np.abs(interior - freq) < 2 * bin_hz)


def test_centroid_silent_is_zero_not_nan():
    c = np.asarray(spectral_centroid(np.zeros(8192, np.float32), CFG, SR))
    assert np.all(np.isfinite(c)) and np.all(c == 0.0)


def test_bandwidth_tone_vs_noise():
    bw_tone = np.asarray(spectral_bandwidth(_tone(3000.0), CFG, SR))[4:-4]
    rng = np.random.default_rng(3)
    noise = rng.standard_normal(SR // 2).astype(np.float32)
    bw_noise = np.asarray(spectral_bandwidth(noise, CFG, SR))[4:-4]
    assert np.all(bw_tone < 500.0)
    assert np.all(bw_noise > 3000.0)


def test_rolloff_tone():
    freq = 3000.0
    r = np.asarray(spectral_rolloff(_tone(freq), CFG, SR))[4:-4]
    bin_hz = SR / CFG.frame_size
    assert np.all(np.abs(r - freq) < 3 * bin_hz)


def test_rolloff_monotonic_in_percent():
    rng = np.random.default_rng(4)
    x = rng.standard_normal(SR // 2).astype(np.float32)
    r50 = np.asarray(spectral_rolloff(x, CFG, SR, roll_percent=0.5))
    r95 = np.asarray(spectral_rolloff(x, CFG, SR, roll_percent=0.95))
    assert np.all(r95 >= r50)


def test_flatness_tone_vs_noise():
    flat_tone = np.asarray(spectral_flatness(_tone(3000.0), CFG))[4:-4]
    rng = np.random.default_rng(5)
    noise = rng.standard_normal(SR // 2).astype(np.float32)
    flat_noise = np.asarray(spectral_flatness(noise, CFG))[4:-4]
    assert np.all(flat_tone < 0.05)
    # Exponentially-distributed periodogram bins: E[GM/AM] = exp(-gamma)
    # ~ 0.56; windowed overlap correlates bins a bit, widen the band.
    assert np.all(flat_noise > 0.3) and np.all(flat_noise < 0.9)


# ---------------------------------------------------------------------------
# LPC
# ---------------------------------------------------------------------------

def _lpc_oracle(frame, order):
    """Solve the autocorrelation normal equations directly (f64)."""
    t = len(frame)
    r = np.array([np.dot(frame[: t - k], frame[k:])
                  for k in range(order + 1)])
    R = np.array([[r[abs(i - j)] for j in range(order)]
                  for i in range(order)])
    a = np.linalg.solve(R, -r[1 : order + 1])
    return np.concatenate([[1.0], a])


@pytest.mark.parametrize("order", [4, 12])
def test_lpc_matches_normal_equation_oracle(order):
    from crlot_tpu.features import lpc
    from crlot_tpu.frame.framing import frame_signal
    from crlot_tpu.window.windows import get_window

    x = np.random.default_rng(10).standard_normal(SR // 8).astype(np.float32)
    got = np.asarray(lpc(x, CFG, order=order))
    frames = np.asarray(frame_signal(x, CFG.frame_spec)).astype(np.float64)
    w = np.asarray(get_window(CFG.window, CFG.frame_size, CFG.periodic))
    for i in range(4, frames.shape[0] - 4, 7):
        want = _lpc_oracle(frames[i] * w, order)
        np.testing.assert_allclose(got[i], want, rtol=5e-3, atol=5e-4)


def test_lpc_recovers_ar_process():
    from crlot_tpu.features import lpc
    from crlot_tpu.iir import lfilter

    # Drive a known all-pole filter with white noise; LPC must recover
    # the denominator coefficients from the output alone.
    a_true = np.array([1.0, -1.2, 0.8, -0.1])
    rng = np.random.default_rng(11)
    e = rng.standard_normal(SR // 2).astype(np.float32)
    x = np.asarray(lfilter([1.0], a_true, e))
    got = np.asarray(lpc(x, CFG, order=3))
    med = np.median(got[4:-4], axis=0)  # robust over frames
    np.testing.assert_allclose(med, a_true, atol=0.05)


def test_lpc_silence_is_finite():
    from crlot_tpu.features import lpc

    a = np.asarray(lpc(np.zeros(8192, np.float32), CFG, order=8))
    assert np.all(np.isfinite(a))
    np.testing.assert_allclose(a[..., 0], 1.0)


def test_lpc_validation():
    from crlot_tpu.features import lpc

    with pytest.raises(ValueError):
        lpc(np.zeros(4096, np.float32), CFG, order=0)
    with pytest.raises(ValueError):
        lpc(np.zeros(4096, np.float32), CFG, order=CFG.frame_size)


def test_lpc_envelope_matches_direct_eval():
    from crlot_tpu.features import lpc_envelope_db

    a = np.array([1.0, -1.2, 0.8, -0.1], np.float32)
    got = np.asarray(lpc_envelope_db(a, 512))
    w = 2 * np.pi * np.arange(257) / 512
    A = sum(a[k] * np.exp(-1j * w * k) for k in range(4))
    want = -20 * np.log10(np.abs(A))
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_lpc_envelope_tracks_ar_resonance():
    from crlot_tpu.features import lpc, lpc_envelope_db
    from crlot_tpu.iir import lfilter

    # AR(2) resonator at ~3 kHz: the LPC envelope must peak there.
    sr = SR
    f0, r = 3000.0, 0.97
    a_true = [1.0, -2 * r * np.cos(2 * np.pi * f0 / sr), r * r]
    e = np.random.default_rng(12).standard_normal(sr // 2).astype(np.float32)
    x = np.asarray(lfilter([1.0], a_true, e))
    a_hat = np.asarray(lpc(x, CFG, order=2))
    env = np.asarray(lpc_envelope_db(np.median(a_hat[4:-4], axis=0),
                                     CFG.frame_size))
    f_peak = np.argmax(env) * sr / CFG.frame_size
    assert abs(f_peak - f0) < 150.0


def test_real_cepstrum_echo_peak():
    from crlot_tpu.features import real_cepstrum

    rng = np.random.default_rng(13)
    x = rng.standard_normal(SR // 2).astype(np.float32)
    d = 160  # echo lag in samples
    y = x.copy()
    y[d:] += 0.5 * x[:-d]
    c = np.asarray(real_cepstrum(y, CFG)).mean(axis=0)
    # Peak in the searchable quefrency band (excluding the low-quefrency
    # envelope region) must land at the echo lag.
    band = c[32 : CFG.frame_size // 2]
    assert abs((np.argmax(band) + 32) - d) <= 2


def test_real_cepstrum_oracle():
    from crlot_tpu.features import real_cepstrum
    from crlot_tpu.pipeline import stft
    import jax.numpy as jnp_

    x = np.random.default_rng(14).standard_normal(SR // 8).astype(np.float32)
    got = np.asarray(real_cepstrum(x, CFG))
    spec = np.asarray(stft(jnp_.asarray(x), CFG))
    want = np.fft.irfft(np.log(np.maximum(np.abs(spec), 1e-10)),
                        n=CFG.frame_size, axis=-1)
    np.testing.assert_allclose(got, want, atol=2e-4)


# ---------------------------------------------------------------------------
# inversion: mfcc_to_mel / mel_to_linear / mel_to_audio
# ---------------------------------------------------------------------------

def test_mfcc_to_mel_full_coeffs_exact():
    from crlot_tpu.features import mfcc_to_mel

    x = np.random.default_rng(6).standard_normal(SR // 4).astype(np.float32)
    logmel = np.asarray(
        power_to_db(mel_spectrogram(x, CFG, SR, n_mels=32))
    )
    c = np.asarray(mfcc(x, CFG, SR, n_mfcc=32, n_mels=32))
    back = np.asarray(mfcc_to_mel(c, n_mels=32))
    want = 10.0 ** (logmel / 10.0)
    np.testing.assert_allclose(back, want, rtol=2e-3, atol=1e-7)


def test_mfcc_to_mel_truncated_is_smoothed():
    from crlot_tpu.features import mfcc_to_mel

    x = np.random.default_rng(7).standard_normal(SR // 4).astype(np.float32)
    c = np.asarray(mfcc(x, CFG, SR, n_mfcc=13, n_mels=40))
    back = np.asarray(mfcc_to_mel(c, n_mels=40))
    assert back.shape[-1] == 40 and np.all(back >= 0)
    with pytest.raises(ValueError):
        mfcc_to_mel(c, n_mels=8)


def test_mel_to_linear_nnls_residual():
    from crlot_tpu.features import mel_to_linear

    x = np.random.default_rng(8).standard_normal(SR // 4).astype(np.float32)
    mel = np.asarray(mel_spectrogram(x, CFG, SR, n_mels=64))
    lin = np.asarray(
        mel_to_linear(mel, SR, CFG.frame_size, n_mels=64, iters=64)
    )
    assert np.all(lin >= 0)
    fb = mel_filterbank(SR, CFG.frame_size, 64)
    resid = np.linalg.norm(lin @ fb.T - mel) / np.linalg.norm(mel)
    # NNLS in the mel domain converges tightly (the null-space of fb is
    # unconstrained; only the projection is testable).
    assert resid < 0.02


def test_mel_to_audio_recovers_tone_pitch():
    from crlot_tpu.features import mel_to_audio

    freq = 1500.0
    x = _tone(freq, seconds=0.35)
    mel = np.asarray(mel_spectrogram(x, CFG, SR, n_mels=128))
    y = np.asarray(
        mel_to_audio(mel, CFG, SR, n_mels=128, gl_iters=16,
                     length=len(x))
    )
    assert y.shape == x.shape and np.all(np.isfinite(y))
    spec = np.abs(np.fft.rfft(y[SR // 8 : SR // 4] *
                              np.hanning(SR // 8)))
    f_peak = np.argmax(spec) * SR / (SR // 8)
    assert abs(f_peak - freq) < 60.0  # within a mel band at 1.5 kHz


def test_envelope_matches_scipy_hilbert():
    import scipy.signal as ss

    x = _tone(440.0, seconds=0.25) * np.hanning(SR // 4).astype(np.float32)
    from crlot_tpu.features import envelope

    got = np.asarray(envelope(x))
    want = np.abs(ss.hilbert(x.astype(np.float64)))
    np.testing.assert_allclose(got, want, atol=2e-4)


@pytest.mark.parametrize("n", [4096, 4097])  # even + odd length paths
def test_envelope_am_tone(n):
    # AM tone: envelope must recover the modulator (interior, away from
    # the Hilbert edge transients).
    from crlot_tpu.features import envelope

    t = np.arange(n) / SR
    mod = 1.0 + 0.5 * np.sin(2 * np.pi * 13.0 * t)
    x = (mod * np.sin(2 * np.pi * 3000.0 * t)).astype(np.float32)
    env = np.asarray(envelope(x))[n // 8 : -n // 8]
    want = mod[n // 8 : -n // 8]
    assert np.max(np.abs(env - want)) < 0.02


def test_instantaneous_frequency_of_tone():
    from crlot_tpu.features import instantaneous_frequency

    freq = 2500.0
    x = _tone(freq, seconds=0.25)
    f = np.asarray(instantaneous_frequency(x, float(SR)))
    interior = f[SR // 50 : -SR // 50]
    assert np.all(np.abs(interior - freq) < 1.0)


def test_frame_rms_of_tone():
    from crlot_tpu.features import frame_rms

    x = 0.6 * _tone(997.0)  # off-bin tone, amplitude 0.6
    r = np.asarray(frame_rms(x, CFG))[4:-4]
    np.testing.assert_allclose(r, 0.6 / np.sqrt(2.0), atol=2e-3)


def test_zero_crossing_rate():
    from crlot_tpu.features import zero_crossing_rate

    freq = 1200.0
    z = np.asarray(zero_crossing_rate(_tone(freq), CFG))[4:-4]
    # A sine crosses zero twice per period: rate = 2 f / sr.
    np.testing.assert_allclose(z, 2.0 * freq / SR, atol=2e-3)
    # Constant positive signal: no crossings (centered zero-pad edges
    # excluded by the interior slice).
    const = np.ones(8192, np.float32)
    zc = np.asarray(zero_crossing_rate(const, CFG))[4:-4]
    assert np.all(zc == 0.0)


def test_power_to_db_floor():
    p = jnp.asarray([0.0, 1.0, 100.0], jnp.float32)
    db = np.asarray(power_to_db(p, floor_db=-100.0))
    np.testing.assert_allclose(db, [-100.0, 0.0, 20.0], atol=1e-4)


# ---------------------------------------------------------------------------
# chroma + delta
# ---------------------------------------------------------------------------

def test_chroma_tone_pitch_class():
    from crlot_tpu.features import chroma

    # A4 = 440 Hz -> class 9 (A) with class 0 = C.
    c = np.asarray(chroma(_tone(440.0), CFG, SR)).mean(axis=0)
    assert int(np.argmax(c)) == 9
    # E5 = 659.26 Hz -> class 4 (E).
    c2 = np.asarray(chroma(_tone(659.26), CFG, SR)).mean(axis=0)
    assert int(np.argmax(c2)) == 4


def test_chroma_octave_invariance():
    from crlot_tpu.features import chroma

    # A3 at 220 Hz needs a finer FFT grid than N=1024 (bin spacing must be
    # well under a semitone — see chroma_filterbank docstring).
    cfg = StftConfig(frame_size=4096, hop_size=1024, center=True)
    for f in (220.0, 440.0, 880.0):  # A3/A4/A5 all map to class A
        c = np.asarray(chroma(_tone(f), cfg, SR)).mean(axis=0)
        assert int(np.argmax(c)) == 9, f


def test_chroma_filterbank_shape_and_energy_distribution():
    from crlot_tpu.features import chroma_filterbank

    fb = chroma_filterbank(SR, 1024)
    assert fb.shape == (12, 513) and fb.dtype == np.float32
    # Columns above fmin distribute (sum to 1); low bins are zero.
    col = fb.sum(axis=0)
    freqs = np.fft.rfftfreq(1024, 1.0 / SR)
    np.testing.assert_allclose(col[freqs >= 32.0], 1.0, atol=1e-5)
    assert np.all(col[freqs < 32.0] == 0.0)


def test_delta_of_linear_ramp_is_slope():
    from crlot_tpu.features import delta

    f, dim, slope = 40, 5, 0.37
    feat = (slope * np.arange(f))[:, None] * np.ones((1, dim))
    d = np.asarray(delta(feat.astype(np.float32), width=9))
    interior = d[4:-4]
    np.testing.assert_allclose(interior, slope, rtol=1e-4)


def test_delta_matches_direct_oracle():
    from crlot_tpu.features import delta

    rng = np.random.default_rng(15)
    feat = rng.standard_normal((30, 4)).astype(np.float32)
    width, half = 5, 2
    got = np.asarray(delta(feat, width=width))
    dd = np.arange(-half, half + 1)
    denom = np.sum(dd * dd)
    padded = np.pad(feat, ((half, half), (0, 0)), mode="edge")
    want = np.stack(
        [sum(d * padded[t + d + half] for d in dd) / denom
         for t in range(feat.shape[0])]
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_delta_validation_and_order2():
    from crlot_tpu.features import delta

    feat = np.zeros((10, 3), np.float32)
    with pytest.raises(ValueError):
        delta(feat, width=4)
    with pytest.raises(ValueError):
        delta(feat, order=0)
    assert np.asarray(delta(feat, order=2)).shape == feat.shape


# ---------------------------------------------------------------------------
# dB conversions + magphase (librosa-parity conveniences, r3)
# ---------------------------------------------------------------------------

def test_db_conversions_roundtrip():
    from crlot_tpu.features import (
        amplitude_to_db,
        db_to_amplitude,
        db_to_power,
        power_to_db,
    )

    rng = np.random.default_rng(3)
    p = jnp.asarray(rng.uniform(1e-6, 10.0, 64).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(db_to_power(power_to_db(p))), np.asarray(p), rtol=1e-5
    )
    a = jnp.sqrt(p)
    np.testing.assert_allclose(
        np.asarray(db_to_amplitude(amplitude_to_db(a))), np.asarray(a),
        rtol=1e-5,
    )
    # amplitude dB == power dB of the square
    np.testing.assert_allclose(
        np.asarray(amplitude_to_db(a)), np.asarray(power_to_db(p)),
        atol=1e-4,
    )
    # silence floors instead of -inf
    assert float(power_to_db(jnp.zeros(1))[0]) == -100.0
    assert float(amplitude_to_db(jnp.zeros(1))[0]) == -100.0


def test_magphase_reconstructs():
    from crlot_tpu.features import magphase

    rng = np.random.default_rng(4)
    spec = jnp.asarray(
        (rng.standard_normal((5, 9)) + 1j * rng.standard_normal((5, 9)))
        .astype(np.complex64)
    )
    spec = spec.at[0, 0].set(0.0)  # zero bin: phasor must be 1, not NaN
    mag, ph = magphase(spec)
    np.testing.assert_allclose(
        np.asarray(mag * ph), np.asarray(spec), atol=1e-6
    )
    np.testing.assert_allclose(np.abs(np.asarray(ph)), 1.0, atol=1e-6)
    assert np.asarray(ph)[0, 0] == 1.0
