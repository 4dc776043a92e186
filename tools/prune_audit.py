"""Audit the bench's count()-vs-noop measurement gap per query.

bench.py has always timed `df.count()`.  For queries whose final stage
is a row-preserving projection (per-doc text metrics, window columns,
decoded payloads), Catalyst PRUNES the projected columns under count()
- the timed plan degenerates to counting scan rows and the query's
actual compute never runs.  The noop sink (guide §1.4) evaluates every
output column.  This tool times both actions hot, same session, and
prints the ratio - the bench-integrity evidence for the r13 fix.

Usage: python tools/prune_audit.py [--out plans/r13/prune_audit.json]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from daisy_spark.catalog import build_bucketed_mirror  # noqa: E402
from daisy_spark.queries import QUERIES  # noqa: E402
from daisy_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("prune_audit")
    spark.sparkContext.setLogLevel("ERROR")
    if os.environ.get("SPARK_GRAFT_BUCKET", "1") != "0":
        build_bucketed_mirror(spark, sf_dir)
    QUERIES["pricing_summary"](spark, sf_dir).count()

    out: dict = {}
    for name, fn in QUERIES.items():
        try:
            df = fn(spark, sf_dir)
            df.count()  # warm count plan
            df.write.format("noop").mode("overwrite").save()  # warm noop plan
            tc, tn = [], []
            for _ in range(args.reps):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                fn(spark, sf_dir).count()
                tc.append(time.perf_counter() - t0)
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                tn.append(time.perf_counter() - t0)
            c, n = statistics.median(tc), statistics.median(tn)
            out[name] = {
                "count_sec": round(c, 4),
                "noop_sec": round(n, 4),
                "noop_over_count": round(n / c, 3) if c else None,
            }
            print(
                f"{name:22s} count {c:7.3f}  noop {n:7.3f}  "
                f"x{out[name]['noop_over_count']}", flush=True,
            )
        except Exception as exc:  # noqa: BLE001
            out[name] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
            print(f"{name:22s} ERROR {out[name]['error']}", flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
