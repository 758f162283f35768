"""In-test perf assertions (reference: tests/framer_test.cc:324-382 framer
>= 10x real-time @48kHz; tests/window_test.cc:206-239 cache reuse >= 10x
faster than rebuild). Conservative gates so CI noise cannot flake them."""

import time

import numpy as np

from crlot_tpu.core.types import WindowType
from crlot_tpu.frame.streaming import Framer
from crlot_tpu.window import windows as W


def test_framer_10x_realtime_48k():
    sr = 48000
    x = np.zeros(sr, dtype=np.float32)  # 1 second of audio
    fr = Framer(1024, 256)
    t0 = time.perf_counter()
    for chunk in x.reshape(100, -1):
        fr.push(chunk)
        fr.pop_batch()
    dt = time.perf_counter() - t0
    assert dt < 0.1, f"framer processed 1 s of 48 kHz audio in {dt:.3f} s (>0.1)"


def test_native_framer_faster_than_realtime():
    import pytest

    from crlot_tpu.io import native as N

    if not N.native_available():
        pytest.skip("native toolchain unavailable")
    sr = 48000
    x = np.zeros(sr * 10, dtype=np.float32)
    fr = N.NativeFramer(1024, 256)
    t0 = time.perf_counter()
    for chunk in x.reshape(100, -1):
        fr.push(chunk)
        fr.pop_batch()
    dt = time.perf_counter() - t0
    assert dt < 1.0, f"native framer: 10 s of audio in {dt:.3f} s"


def test_window_cache_reuse_10x_faster():
    W.clear_cache()
    n = 1 << 16
    t0 = time.perf_counter()
    W.get_window(WindowType.BLACKMAN_HARRIS, n)
    build = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(10):
        W.get_window(WindowType.BLACKMAN_HARRIS, n)
    reuse = (time.perf_counter() - t0) / 10
    assert reuse * 10 < build or reuse < 1e-4, (
        f"cache reuse {reuse:.6f}s not >=10x faster than build {build:.6f}s"
    )
