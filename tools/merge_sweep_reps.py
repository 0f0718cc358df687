"""Merge N single-rep sweep_keys.py outputs into one artifact with per-key
reps, median, and spread — the 'weather sensitivity' record the r11 verdict
asked for (Next round #8): regression detection on the sf1 replica should
read spreads, not prose attribution.

Usage: python tools/merge_sweep_reps.py out.json rep1.json [rep2.json ...]
"""

from __future__ import annotations

import json
import statistics
import sys


def main() -> None:
    out, reps = sys.argv[1], sys.argv[2:]
    data = [json.load(open(f)) for f in reps]
    keys = sorted({k for d in data for k in d})
    merged = {}
    for k in keys:
        times = [d[k]["s"] for d in data if k in d]
        rows = sorted({d[k]["rows"] for d in data if k in d})
        merged[k] = {
            "reps_s": times,
            "median_s": round(statistics.median(times), 1),
            "spread_s": [min(times), max(times)],
            "rows": rows[0] if len(rows) == 1 else rows,  # list ⇒ NOT invariant
        }
    with open(out, "w") as f:
        json.dump(merged, f, indent=1)
    print(json.dumps(merged, indent=1))


if __name__ == "__main__":
    main()
