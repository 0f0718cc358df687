"""Dump .explain('formatted') for named registry keys to files.

Usage: python tools/capture_plans.py <out_dir> <suffix> key [key ...]
Writes <out_dir>/<key>_<suffix>.txt for each key (e.g. suffix=before/after).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graphchidb_scala_spark.session import get_spark


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    keys = sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)
    import __spark_entry__ as entry

    qs = entry.queries()
    spark = get_spark("plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    for k in keys:
        df = qs[k](spark, sf)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{k}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue())} bytes)", flush=True)


if __name__ == "__main__":
    main()
