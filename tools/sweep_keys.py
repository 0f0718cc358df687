"""Full-registry timing sweep: count every `queries()` key at a scale
directory, recording per-key wall seconds + row counts to JSON.

The per-round scale-sanity tool (BENCHNOTES "full-registry sweep"
sections): run once at sf0.1 and once at the 10x replica
(tools/make_scale_replica.py), then compare factors — at 10x data,
~10x = linear scan-bound, <=3.5x = sublinear, >>10x and not
output-bound = investigate (this harness caught the AQE coalesce traps
in r7, the knn_classify quadratic seed set in r8, and the fixed-K IVF
cliffs + keep_best OOM in r9). Timings are one rep and only trustworthy
on a quiet machine; re-time suspicious keys before concluding anything.

Usage: python tools/sweep_keys.py <sf_dir> <out.json> [key ...]
(named keys restrict the sweep — the per-round changed-plan refresh)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graphchidb_scala_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sweep_keys.json"
    import __spark_entry__ as entry

    spark = get_spark(cpus=32, shuffle_partitions=32)
    qs = entry.queries()
    only = set(sys.argv[3:])
    if only:
        missing = only - set(qs)
        if missing:
            raise SystemExit(f"unknown keys: {sorted(missing)}")
        qs = {k: v for k, v in qs.items() if k in only}
    res: dict[str, dict] = {}
    print(f"TOTAL {len(qs)} keys @ {sf}", flush=True)
    for name, fn in qs.items():
        t0 = time.time()
        try:
            n = fn(spark, sf).count()
            res[name] = {"s": round(time.time() - t0, 1), "rows": n}
            print(f"KEY {name}: {res[name]['s']}s rows={n}", flush=True)
        except Exception as e:  # noqa: BLE001 — a broken key must not end the sweep
            res[name] = {
                "s": round(time.time() - t0, 1),
                "err": f"{type(e).__name__}: {str(e)[:200]}",
            }
            print(f"KEY {name}: ERROR {res[name]['s']}s {res[name]['err']}", flush=True)
        with open(out, "w") as f:
            json.dump(res, f, indent=1)
    spark.stop()
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
