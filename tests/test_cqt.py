"""Pseudo-CQT: filterbank geometry + tone-localization gates."""

import numpy as np
import pytest

from crlot_tpu.core.types import StftConfig
from crlot_tpu.features import cqt_filterbank, pseudo_cqt

SR = 48000
CFG = StftConfig(frame_size=4096, hop_size=1024, center=True)


def _tone(freq, seconds=0.4, sr=SR):
    t = np.arange(int(seconds * sr)) / sr
    return np.sin(2 * np.pi * freq * t).astype(np.float32)


def test_filterbank_shape_and_rows():
    fb = cqt_filterbank(SR, 4096, n_bins=84)
    assert fb.shape == (84, 4096 // 2 + 1)
    assert np.all(fb >= 0)
    np.testing.assert_allclose(fb.sum(axis=1), 1.0, atol=1e-5)


def test_filterbank_peak_at_center():
    fb = cqt_filterbank(SR, 4096, n_bins=48, fmin=110.0)
    freqs = np.fft.rfftfreq(4096, 1.0 / SR)
    centers = 110.0 * 2.0 ** (np.arange(48) / 12.0)
    got = freqs[np.argmax(fb, axis=1)]
    # Peak bin within one FFT bin of the design center.
    assert np.all(np.abs(got - centers) <= SR / 4096 + 1e-6)


def test_filterbank_rejects_above_nyquist():
    with pytest.raises(ValueError):
        cqt_filterbank(8000, 1024, n_bins=96)


def test_tone_lands_in_its_bin():
    fmin = 110.0
    for k in (12, 24, 31):  # exact bin centers incl. a non-octave one
        f = fmin * 2.0 ** (k / 12.0)
        c = np.asarray(pseudo_cqt(_tone(f), CFG, SR, n_bins=48, fmin=fmin))
        mid = c[c.shape[0] // 2]
        assert int(np.argmax(mid)) == k, (k, int(np.argmax(mid)))


def test_octave_shift_moves_12_bins():
    fmin = 110.0
    c1 = np.asarray(pseudo_cqt(_tone(220.0), CFG, SR, n_bins=48, fmin=fmin))
    c2 = np.asarray(pseudo_cqt(_tone(440.0), CFG, SR, n_bins=48, fmin=fmin))
    b1 = int(np.argmax(c1[c1.shape[0] // 2]))
    b2 = int(np.argmax(c2[c2.shape[0] // 2]))
    assert b2 - b1 == 12


def test_batched_shape():
    x = np.stack([_tone(220.0, 0.2), _tone(440.0, 0.2)])
    c = pseudo_cqt(x, CFG, SR, n_bins=36, fmin=110.0)
    assert c.shape[0] == 2 and c.shape[-1] == 36


def test_chroma_cqt_pitch_class_and_octave_invariance():
    from crlot_tpu.features import chroma_cqt

    a3, a4 = 220.0, 440.0  # both pitch class A = 9 from a C fmin
    c3 = np.asarray(chroma_cqt(_tone(a3), CFG, SR))
    c4 = np.asarray(chroma_cqt(_tone(a4), CFG, SR))
    assert c3.shape[-1] == 12
    m3 = c3[c3.shape[0] // 2]
    m4 = c4[c4.shape[0] // 2]
    assert int(np.argmax(m3)) == 9 and int(np.argmax(m4)) == 9
