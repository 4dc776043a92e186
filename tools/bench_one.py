"""Focused per-query timing with the noop sink (guide §1.4).

Usage: python tools/bench_one.py [-n REPS] query [query ...]
Times each query REPS times (default 5) after one warm run, via
df.write.format("noop") so the full computation (every column) is paid
without driver-transfer cost.  Prints per-rep times + min/median.

NOT the driver-contract bench (bench.py is); this is the measurement
loop for optimization work.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from daisy_spark.catalog import build_bucketed_mirror
from daisy_spark.queries import QUERIES
from daisy_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    reps = 5
    if args and args[0] == "-n":
        reps = int(args[1])
        args = args[2:]
    names = args or list(QUERIES)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("daisy_spark_bench_one")
    spark.sparkContext.setLogLevel("ERROR")
    if os.environ.get("SPARK_GRAFT_BUCKET", "1") != "0":
        build_bucketed_mirror(spark, sf_dir)
    # warm codegen/JIT paths once
    QUERIES["pricing_summary"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    for name in names:
        fn = QUERIES[name]
        spark.catalog.clearCache()
        sc = spark.sparkContext
        try:
            sc.setJobDescription(f"{name}: warm")
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts = []
            for i in range(reps):
                spark.catalog.clearCache()
                sc.setJobDescription(f"{name}: rep{i}")
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                ts.append(time.perf_counter() - t0)
            print(
                f"{name:24s} min={min(ts):.3f} med={statistics.median(ts):.3f} "
                + " ".join(f"{t:.3f}" for t in ts)
            )
        except Exception as exc:  # noqa: BLE001
            print(f"{name:24s} FAIL {type(exc).__name__}: {exc}")
        finally:
            sc.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
