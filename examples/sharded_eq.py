"""Example: multi-channel graphic EQ over a device mesh.

Shards channels and time blocks over every available chip, applies a
band-gain EQ in the spectral domain, and reconstructs bit-identically to the
single-device pipeline.

Usage: python examples/sharded_eq.py in.wav out.wav
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
from crlot_tpu.distributed.mesh import auto_mesh
from crlot_tpu.distributed.stream import sharded_stream


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("infile")
    ap.add_argument("outfile")
    args = ap.parse_args()

    x, sr = ct.read_wav(args.infile)
    cfg = ct.StftConfig(frame_size=1024, hop_size=256, center=False)
    eq = ct.spectral.band_gain(
        [200.0, 2000.0, 8000.0], [1.2, 1.0, 0.8, 0.5], sr, 1024
    )
    mesh = auto_mesh(channels=x.shape[0])
    y = sharded_stream(x, cfg, mesh, chunk_samples=1 << 20, spectral_fn=eq)
    ct.write_wav(args.outfile, y, sr, bits=16)
    print(f"processed {x.shape} over mesh {dict(mesh.shape)}")


if __name__ == "__main__":
    main()
