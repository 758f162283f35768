"""Test harness config: force CPU with an 8-device virtual mesh.

Multi-node testing strategy per SURVEY.md §4: simulate meshes on CPU with
`xla_force_host_platform_device_count=8` so shard_map / halo-exchange logic is
unit-tested without TPU hardware, asserting 1-device vs N-device consistency.
Must run before jax is imported anywhere.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The environment's sitecustomize force-registers the axon TPU backend and
# sets jax_platforms=axon at interpreter start; env vars alone cannot undo a
# config.update, so override the config directly before any backend inits.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def oboe():
    """The reference's real test asset (assets/oboe.wav, 44.1 kHz 16-bit) if
    present, else a deterministic synthetic oboe-ish signal (same length
    class, harmonic stack + vibrato + noise floor)."""
    path = "/root/reference/assets/oboe.wav"
    if os.path.exists(path):
        from crlot_tpu.io.wav import read_wav

        data, sr = read_wav(path)
        return np.asarray(data[0], dtype=np.float32), sr
    sr = 44100
    t = np.arange(sr * 2, dtype=np.float64) / sr
    f0 = 440.0 * (1.0 + 0.003 * np.sin(2 * np.pi * 5.0 * t))
    x = sum(
        a * np.sin(2 * np.pi * (k + 1) * f0 * t)
        for k, a in enumerate([0.5, 0.35, 0.2, 0.1, 0.05])
    )
    rng = np.random.default_rng(1234)
    x += 1e-4 * rng.standard_normal(len(t))
    x *= 0.5 / np.max(np.abs(x))
    return x.astype(np.float32), sr
