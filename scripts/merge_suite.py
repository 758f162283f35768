"""Merge bench-suite artifacts: NaN cells in the base run are filled from
later runs (first finite value wins), with per-cell provenance recorded.

Usage: python scripts/merge_suite.py base.json fill1.json [fill2.json ...] \
           [--out merged.json]

The base run stays the artifact of record — only its NaN cells (where the
timing guard refused to publish a cross-window artifact) are filled, the
same policy as the suite's own in-run NaN retry (suite.py), applied across
runs. Filled cells are listed in `_merged_cells` as {key: source_path} and
any still-NaN leftovers keep their `_nan_annotations` entries.
"""

from __future__ import annotations

import json
import math
import sys


def _finite(v) -> bool:
    return isinstance(v, (int, float)) and not (
        isinstance(v, float) and math.isnan(v)
    )


def main(argv=None) -> None:
    argv = list(sys.argv[1:] if argv is None else argv)
    out_path = None
    if "--out" in argv:
        i = argv.index("--out")
        out_path = argv[i + 1]
        del argv[i : i + 2]
    if len(argv) < 2:
        raise SystemExit(__doc__)
    base = json.load(open(argv[0]))
    merged_cells = {}
    for path in argv[1:]:
        fill = json.load(open(path))
        for k, v in base.items():
            if (
                isinstance(v, float)
                and math.isnan(v)
                and _finite(fill.get(k))
            ):
                base[k] = fill[k]
                merged_cells[k] = path
    ann = base.get("_nan_annotations")
    if isinstance(ann, dict):
        ann = {k: v for k, v in ann.items() if k not in merged_cells}
        if ann:
            base["_nan_annotations"] = ann
        else:
            base.pop("_nan_annotations", None)
    if merged_cells:
        base["_merged_cells"] = merged_cells
    line = json.dumps(base)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
