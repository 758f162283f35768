#!/usr/bin/env bash
# Build + test + bench orchestration (reference: scripts/run_all.sh).
# Usage: ./run_all.sh [outdir]
set -euo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-out/$(date +%Y%m%d_%H%M%S)}"
mkdir -p "$OUT"

echo "== environment ==" | tee "$OUT/env.txt"
python -m crlot_tpu.profiling | tee "$OUT/env.json"

echo "== native build =="
python -c "from crlot_tpu.io.native import native_available; print('native:', native_available())"

echo "== tests =="
python -m pytest tests/ -q 2>&1 | tee "$OUT/tests.txt"

echo "== bench suite =="
python -m crlot_tpu.bench.suite --out "$OUT/suite.json"

echo "== regression guard =="
python -m crlot_tpu.bench.regression --current "$OUT/suite.json" | tee "$OUT/regression.json"

echo "== headline bench =="
python bench.py | tee "$OUT/bench.json"
