"""Example: phase-vocoder time-stretch (and optional pitch-shift) of a WAV.

Usage: python examples/time_stretch.py in.wav out.wav --rate 1.5
       python examples/time_stretch.py in.wav out.wav --semitones 4
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
    ap.add_argument("outfile")
    ap.add_argument("--rate", type=float, default=None,
                    help="duration factor (>1 = slower)")
    ap.add_argument("--semitones", type=float, default=None,
                    help="pitch shift at constant duration")
    args = ap.parse_args()
    if (args.rate is None) == (args.semitones is None):
        ap.error("give exactly one of --rate / --semitones")

    x, sr = ct.read_wav(args.infile)
    cfg = ct.StftConfig(frame_size=1024, hop_size=256)
    if args.rate is not None:
        y = np.asarray(ct.time_stretch(x, cfg, args.rate))
        what = f"stretched x{args.rate}"
    else:
        y = np.asarray(ct.pitch_shift(x, cfg, args.semitones))
        what = f"shifted {args.semitones:+.1f} semitones"
    ct.write_wav(args.outfile, y, sr, bits=16)
    print(f"{args.infile} -> {args.outfile}: {what}, "
          f"{x.shape[-1]} -> {y.shape[-1]} samples")


if __name__ == "__main__":
    main()
