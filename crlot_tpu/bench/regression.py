"""Performance-regression guard with saved baselines and tolerance bands.

Reference: bench/regression_test.cc — runs the benchmark suites, parses the
timings, compares against a saved `name: time` baseline within a ±10% band
(±5% for FFT-1024), and `--update-baseline` writes a new one. Same contract
here over the JSON suite output; the baseline lives at
crlot_tpu/bench/baseline.json (checked in per machine/backend key).

Run: python -m crlot_tpu.bench.regression [--update-baseline] [--baseline PATH]
Exit code 0 = within bands, 1 = regression detected.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
from typing import Dict, Tuple

DEFAULT_BAND = 0.10  # ±10% (regression_test.cc:20)
FFT1024_BAND = 0.05  # ±5% for the FFT-1024 metric (regression_test.cc:173-175)
SNR_ABS_BAND_DB = 0.5  # SNR compares in ABSOLUTE dB (a ratio band on a log
# quantity would allow a 9.5 dB drop from 95 dB — meaningless)

_BASELINE_PATH = os.path.join(os.path.dirname(__file__), "baseline.json")


def band_for(name: str) -> float:
    return FFT1024_BAND if "fft" in name and "n1024" in name else DEFAULT_BAND


def is_timing_metric(name: str) -> bool:
    """Only latency-like metrics regress upward; counters (rtf, snr, pct)
    are checked downward."""
    return name.endswith(("_us", "_ms", "_ns_per_elem"))


def is_pct_metric(name: str) -> bool:
    """Regime-normalized percentage metrics (roofline_pct_chip_adjusted and
    friends): the TPU-side guard bands THESE, not raw tunnel timings whose
    service rate swings ~2x between windows (docs/DESIGN.md 'rate
    regimes'). Chip-adjustment divides out the window's measured MXU/HBM
    rates, so a drop here is the pipeline's own regression."""
    return name.endswith("_pct") or "_pct_" in name


def compare(
    current: Dict[str, float], baseline: Dict[str, float]
) -> Tuple[bool, list]:
    report = []
    ok = True
    for name, base in baseline.items():
        if name.startswith("_"):
            continue
        if name not in current:
            # An armed band that was never measured this run must be
            # VISIBLE: a contended window that drops the chip-adjusted
            # headline metric would otherwise yield a silent PASS with
            # zero timing coverage (review r3 finding). A note, not a
            # failure — unmeasurable is not a regression verdict.
            report.append(
                {"metric": name, "baseline": base, "pass": None,
                 "note": "armed but not measured this run"}
            )
            continue
        cur = current[name]
        # A NaN baseline (recorded in a contended window) must not poison
        # the verdict: NaN <= 0 is False, and cur/NaN would fail every band.
        if (not isinstance(base, (int, float)) or not math.isfinite(base)
                or base <= 0):
            continue
        if not isinstance(cur, (int, float)) or not math.isfinite(cur):
            # stages._time reports NaN when the tunnel was too contended to
            # measure; an unmeasurable run is not a regression verdict.
            report.append(
                {"metric": name, "baseline": base, "current": cur,
                 "pass": None, "note": "unmeasurable (NaN) — skipped"}
            )
            continue
        band = band_for(name)
        ratio = cur / base
        if is_timing_metric(name):
            passed = ratio <= 1.0 + band
        elif name.endswith("_snr_db"):
            passed = cur >= base - SNR_ABS_BAND_DB
            band = f"-{SNR_ABS_BAND_DB} dB abs"
        elif name.endswith("_rtf") or is_pct_metric(name):
            passed = ratio >= 1.0 - band
        else:
            continue
        ok &= passed
        report.append(
            {
                "metric": name,
                "baseline": base,
                "current": cur,
                "ratio": round(ratio, 3),
                "band": band,
                "pass": passed,
            }
        )
    return ok, report


def merge_headline(current: Dict[str, float], headline: dict) -> None:
    """Fold the headline bench record (bench.py's JSON line) into a suite
    result dict under `headline_*` names so the guard can band the
    regime-normalized fields. Raw throughput/ms stay unbanded on TPU (the
    tunnel's service regime swings them ~2x); `roofline_pct_chip_adjusted`
    and `snr_db` are the stable, regression-meaningful signals."""
    for src, dst in (
        ("roofline_pct_chip_adjusted", "headline_roofline_pct_chip_adjusted"),
        ("snr_db", "headline_snr_db"),
    ):
        if src in headline:
            current[dst] = headline[src]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--update-baseline", action="store_true")
    ap.add_argument("--baseline", default=_BASELINE_PATH)
    ap.add_argument("--suites", default="fft,kernels,ola,e2e")
    ap.add_argument(
        "--current", default=None,
        help="use a pre-recorded suite JSON instead of re-running",
    )
    ap.add_argument(
        "--headline", default=None,
        help="bench.py JSON record to merge (regime-normalized fields are "
        "banded under headline_* names)",
    )
    args = ap.parse_args(argv)

    if args.current:
        with open(args.current) as f:
            current = json.loads(f.read().strip())
    else:
        import io
        from contextlib import redirect_stdout

        from . import suite

        buf = io.StringIO()
        with redirect_stdout(buf):
            suite.main(["--suites", args.suites])
        current = json.loads(buf.getvalue().strip().splitlines()[-1])

    if args.headline:
        try:
            with open(args.headline) as f:
                merge_headline(current, json.loads(f.read().strip()))
        except (OSError, ValueError) as e:
            print(f"headline merge skipped: {e}", file=sys.stderr)

    # Per-run duty probe (r3 verdict item 4): on TPU, when no headline
    # record supplied the chip-adjusted percentage, MEASURE it now — a
    # cheap same-window pipeline burst + MXU probe — so the one
    # regime-normalized timing band is evaluated in every regression run
    # instead of self-reporting 'armed but not measured'. Opt out with
    # CRLOT_REGRESSION_DUTY=0 (e.g. when another TPU job holds the chip).
    # The one TPU timing band must carry an EXPLICIT verdict every run
    # (r4 verdict item 3: "armed but not measured" self-reports are not a
    # verdict): pass / fail / not-applicable(regime=..., probe=...).
    chip_verdict = None
    if current.get("_backend") != "tpu":
        chip_verdict = {
            "status": "not-applicable", "regime": "non-tpu-backend",
            "probe": None,
        }
    elif "headline_roofline_pct_chip_adjusted" in current:
        chip_verdict = {"status": "banded-from-headline-record"}
    elif os.environ.get("CRLOT_REGRESSION_DUTY", "1") == "0":
        chip_verdict = {
            "status": "not-applicable",
            "regime": "probe disabled (CRLOT_REGRESSION_DUTY=0)",
            "probe": None,
        }
    else:
        from .probes import quick_headline_duty

        duty = quick_headline_duty()
        if duty is not None and duty.get("window_near_full_rate"):
            current["headline_roofline_pct_chip_adjusted"] = duty[
                "roofline_pct_chip_adjusted"
            ]
            current["headline_snr_db"] = duty["snr_db"]
            current["_duty_probe"] = duty
            chip_verdict = {"status": "banded-from-duty-probe"}
        elif duty is not None:
            # A degraded window depresses even the chip-adjusted figure
            # (co-tenancy overlap loss is not MXU-rate-normalizable);
            # banding it would turn window luck into a regression verdict.
            current["_duty_probe"] = dict(duty, skipped=(
                "window degraded; chip-adjusted band not evaluated"
            ))
            current["headline_snr_db"] = duty["snr_db"]
            chip_verdict = {
                "status": "not-applicable",
                "regime": (
                    f"degraded window ({duty['roofline_pct_model']}% of "
                    "model roofline < 72% threshold)"
                ),
                "probe": duty,
            }
            print("duty probe: degraded window; band not evaluated",
                  file=sys.stderr)
        else:
            chip_verdict = {
                "status": "not-applicable",
                "regime": "window too contended to measure",
                "probe": None,
            }
            print("duty probe unmeasurable this window", file=sys.stderr)

    key = current.get("_backend", "unknown")
    baselines = {}
    if os.path.exists(args.baseline):
        with open(args.baseline) as f:
            baselines = json.load(f)

    if args.update_baseline:
        baselines[key] = current
        with open(args.baseline, "w") as f:
            json.dump(baselines, f, indent=1, sort_keys=True)
        print(json.dumps({"updated": args.baseline, "backend": key}))
        return 0

    if key not in baselines:
        print(
            json.dumps(
                {"error": f"no baseline for backend '{key}'", "hint":
                 "run with --update-baseline first"}
            )
        )
        return 0  # no baseline yet is not a failure

    ok, report = compare(current, baselines[key])
    if chip_verdict is not None and chip_verdict["status"].startswith(
        "banded"
    ):
        # Resolve the banded verdict from the actual check result (or the
        # baseline's absence, which arms the band on the next --update).
        hit = [r for r in report
               if r["metric"] == "headline_roofline_pct_chip_adjusted"]
        if hit and hit[0].get("pass") is not None:
            chip_verdict["status"] = "pass" if hit[0]["pass"] else "fail"
            chip_verdict["check"] = hit[0]
        else:
            chip_verdict["status"] = "not-applicable"
            chip_verdict["regime"] = "no baseline entry for the band"
            chip_verdict["probe"] = current.get("_duty_probe")
    out = {"pass": ok, "exit": 0 if ok else 1, "backend": key,
           "checks": report}
    if chip_verdict is not None:
        out["chip_adjusted_verdict"] = chip_verdict
    print(json.dumps(out))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
