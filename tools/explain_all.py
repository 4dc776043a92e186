"""Capture .explain("formatted") for every registry query.

Usage: python tools/explain_all.py <tag> [query ...]
Writes $SPARK_GRAFT_PLANS_DIR/<query>_<tag>.txt for each query
(default dir: plans/r13; default: all queries).
Mirrors bench.py's storage-side prep (bucketed mirror) so the captured
plan is the one the bench actually runs.
"""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from contextlib import redirect_stdout

from daisy_spark.catalog import build_bucketed_mirror
from daisy_spark.queries import QUERIES
from daisy_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.environ.get(
        "SPARK_GRAFT_PLANS_DIR",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "plans", "r13",
        ),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("daisy_spark_explain")
    spark.sparkContext.setLogLevel("ERROR")
    if os.environ.get("SPARK_GRAFT_BUCKET", "1") != "0":
        build_bucketed_mirror(spark, sf_dir)
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
                f.write(buf.getvalue())
            print(f"ok   {name}")
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: {type(exc).__name__}: {exc}")
    spark.stop()


if __name__ == "__main__":
    main()
