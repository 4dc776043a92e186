#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": hot_total_sec, "unit": "sec",
"queries": {name: hot_sec}, "sf": ..., "geomean": ..., "cold": {...}}.

Each query runs twice; the reported timing is the HOT (second) run, so
the number compares like-for-like with the reference baseline's hot
timings (BASELINE.md) instead of folding Spark's one-time JIT/codegen
cost into every query.  Timing = full execution to a count (materializes
the result without driver-transfer overhead dominating).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from daisy_spark.queries import QUERIES  # noqa: E402
from daisy_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("daisy_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers once with the cheapest query
    QUERIES["revenue_forecast"](spark, sf_dir).collect()

    hot: dict[str, float] = {}
    cold: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, fn in QUERIES.items():
        # bound memory: operators that persist() intermediates would
        # otherwise accumulate across the suite
        spark.catalog.clearCache()
        # one broken query must never zero the whole artifact: record the
        # failure and keep timing the rest
        try:
            t0 = time.perf_counter()
            assert fn(spark, sf_dir).count() >= 0
            cold[name] = round(time.perf_counter() - t0, 4)
            t1 = time.perf_counter()
            assert fn(spark, sf_dir).count() >= 0
            hot[name] = round(time.perf_counter() - t1, 4)
        except Exception as exc:  # noqa: BLE001
            errors[name] = f"{type(exc).__name__}: {exc}"[:400]
    total = round(sum(hot.values()), 4)
    geomean = round(
        math.exp(sum(math.log(max(t, 1e-4)) for t in hot.values()) / max(len(hot), 1)),
        4,
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_hot_total",
                "value": total,
                "unit": "sec",
                "queries": hot,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "geomean": geomean,
                "cold_total": round(sum(cold.values()), 4),
                "n_queries": len(hot),
                "errors": errors,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
