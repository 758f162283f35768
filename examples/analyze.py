"""Example: music/audio analysis report for a WAV.

Runs the analysis stack in a handful of jitted programs: silence
segmentation, global tempo, harmonic/percussive energy split, spectral
contrast, tonal centroids, and a PCEN mel front-end — and prints a compact
report. Optionally writes the separated harmonic/percussive parts.

Usage: python examples/analyze.py in.wav [--write-stems outdir]
"""

import argparse

import numpy as np

import os as _os
import sys as _sys

# allow `python examples/<name>.py` without installing the package
_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)

import crlot_tpu as ct


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("infile")
    ap.add_argument("--write-stems", default=None,
                    help="directory for harmonic/percussive WAV stems")
    args = ap.parse_args()

    x, sr = ct.read_wav(args.infile)
    mono = x if x.ndim == 1 else np.mean(x, axis=0).astype(np.float32)
    cfg = ct.StftConfig(frame_size=1024, hop_size=256, center=True)

    # Segmentation
    trimmed, (s, e) = ct.trim_silence(mono, cfg, top_db=50.0)
    regions = ct.split_silence(mono, cfg, top_db=50.0)
    print(f"length: {len(mono) / sr:.2f} s  active span: "
          f"[{s / sr:.2f}, {e / sr:.2f}] s  regions: {len(regions)}")
    if trimmed.size == 0:
        print("all silence — nothing to analyze")
        return

    # Rhythm
    bpm = float(ct.tempo(trimmed, cfg, float(sr)))
    print(f"tempo: {bpm:.1f} BPM")

    # Harmonic / percussive balance
    h, p = ct.hpss(trimmed, cfg)
    h, p = np.asarray(h), np.asarray(p)
    eh = float(np.sum(np.square(h, dtype=np.float64)))
    ep = float(np.sum(np.square(p, dtype=np.float64)))
    print(f"harmonic/percussive energy: {eh / (eh + ep + 1e-30):.1%} / "
          f"{ep / (eh + ep + 1e-30):.1%}")

    # Tonality
    contrast = np.asarray(ct.spectral_contrast(trimmed, cfg, float(sr)))
    print("median octave-band contrast (dB):",
          np.round(np.median(contrast, axis=0), 1))
    tc = np.asarray(ct.tonnetz(trimmed, cfg, float(sr))).mean(axis=0)
    print("mean tonal centroid (6-D):", np.round(tc, 3))

    # ML front-end sanity: PCEN mel
    mel = ct.mel_spectrogram(trimmed, cfg, float(sr), n_mels=64)
    z = np.asarray(ct.pcen(mel, float(sr) / cfg.hop_size))
    print(f"pcen mel: {z.shape} range [{z.min():.2f}, {z.max():.2f}]")

    if args.write_stems:
        _os.makedirs(args.write_stems, exist_ok=True)
        ct.write_wav(_os.path.join(args.write_stems, "harmonic.wav"),
                     h, sr, bits=16)
        ct.write_wav(_os.path.join(args.write_stems, "percussive.wav"),
                     p, sr, bits=16)
        print(f"stems written to {args.write_stems}")


if __name__ == "__main__":
    main()
