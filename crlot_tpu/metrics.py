"""Quality metrics: SNR, cross-correlation delay, peak meter.

Reference: bench/e2e_benchmark.cc:79-121 `QualityMetrics` (SNR dB +
cross-correlation delay ms reported as benchmark counters) and the running
peak meter (OLAAccumulator.cc:290-295). Here they are ordinary host
functions returning values; the distributed variants — in-mesh psum SNR
partials and a pmax peak meter — live in
`distributed.sharded_pipeline.sharded_round_trip(..., return_metrics=True)`
+ `metrics_report` (SURVEY.md §5 'Metrics').
"""

from __future__ import annotations

from typing import Union

import numpy as np

ArrayLike = Union[np.ndarray, "jax.Array"]  # noqa: F821


def snr_db(reference: ArrayLike, test: ArrayLike) -> float:
    """Signal-to-noise ratio in dB: 10*log10(sum(ref^2)/sum((ref-test)^2)).

    Computed in float64 on host (it is a verdict, not a hot op). Returns +inf
    for a bit-exact match and -inf for zero reference energy.
    """
    ref = np.asarray(reference, dtype=np.float64).reshape(-1)
    tst = np.asarray(test, dtype=np.float64).reshape(-1)
    if ref.shape != tst.shape:
        raise ValueError(f"shape mismatch: {ref.shape} vs {tst.shape}")
    sig = np.sum(ref * ref)
    noise = np.sum(np.square(ref - tst))
    if sig <= 0.0:
        return float("-inf")
    if noise <= 0.0:
        return float("inf")
    return float(10.0 * np.log10(sig / noise))


def rms_db(x: ArrayLike) -> float:
    x64 = np.asarray(x, dtype=np.float64).reshape(-1)
    if x64.size == 0:
        return float("-inf")
    rms = np.sqrt(np.mean(np.square(x64)))
    return float(20.0 * np.log10(rms)) if rms > 0 else float("-inf")


def xcorr_delay_samples(reference: ArrayLike, test: ArrayLike) -> int:
    """Lag (samples) maximizing cross-correlation of test against reference
    (reference: e2e_benchmark.cc:94-121). Positive = test lags reference."""
    ref = np.asarray(reference, dtype=np.float64).reshape(-1)
    tst = np.asarray(test, dtype=np.float64).reshape(-1)
    n = max(len(ref), len(tst))
    nfft = 1 << (2 * n - 1).bit_length()
    rf = np.fft.rfft(ref, nfft)
    tf = np.fft.rfft(tst, nfft)
    corr = np.fft.irfft(tf * np.conj(rf), nfft)
    corr = np.concatenate([corr[-(n - 1) :], corr[:n]])
    return int(np.argmax(corr)) - (n - 1)


def xcorr_delay_ms(reference: ArrayLike, test: ArrayLike, sample_rate: int) -> float:
    return xcorr_delay_samples(reference, test) * 1000.0 / sample_rate


class PeakMeter:
    """Running peak level (reference: OLAAccumulator.cc:290-295, .h:149)."""

    def __init__(self) -> None:
        self._peak = 0.0

    def update(self, x: ArrayLike) -> float:
        block = np.asarray(x, dtype=np.float64)
        if block.size:
            self._peak = max(self._peak, float(np.max(np.abs(block))))
        return self._peak

    @property
    def peak(self) -> float:
        return self._peak

    @property
    def peak_db(self) -> float:
        return float(20.0 * np.log10(self._peak)) if self._peak > 0 else float("-inf")

    def reset(self) -> None:
        self._peak = 0.0
