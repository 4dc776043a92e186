"""-State/-Merge: partial states merged across a finer grouping must
equal direct aggregation, including the HLL sketch path."""

from __future__ import annotations

from pyspark.sql import functions as F

from daisy_spark.functions import states as STX


def test_state_merge_equals_direct(spark):
    df = spark.createDataFrame(
        [(u, d, float(v)) for u in range(4) for d in range(3) for v in range(u + d + 1)],
        ["user", "day", "v"],
    )
    # write path: states at (user, day) grain
    st = STX.state_by(
        df,
        ["user", "day"],
        {
            "cnt": ("count", F.col("v")),
            "total": ("sum", F.col("v")),
            "avg_v": ("avg", F.col("v")),
            "mx": ("max", F.col("v")),
            "am": ("argMax", STX.arg_max_input(F.col("day"), F.col("v"))),
        },
    )
    # merge path: roll up to user grain
    merged = STX.merge_states(
        st,
        ["user"],
        {"cnt": "count", "total": "sum", "avg_v": "avg", "mx": "max", "am": "argMax"},
    ).orderBy("user")

    direct = (
        df.groupBy("user")
        .agg(
            F.count("v").alias("cnt"),
            F.sum("v").alias("total"),
            F.avg("v").alias("avg_v"),
            F.max("v").alias("mx"),
            F.max_by("day", F.struct(F.col("v"), F.col("day"))).alias("am"),
        )
        .orderBy("user")
    )
    got = [(r.user, r.cnt, r.total, round(r.avg_v, 9), r.mx) for r in merged.collect()]
    want = [(r.user, r.cnt, r.total, round(r.avg_v, 9), r.mx) for r in direct.collect()]
    assert got == want


def test_uniq_hll_state_merges(spark):
    df = spark.createDataFrame(
        [(i % 3, f"u{i % 50}") for i in range(500)], ["bucket", "uid"]
    )
    st = STX.state_by(df, ["bucket"], {"u": ("uniq", F.col("uid"))})
    merged = STX.merge_states(st, [], {"u": "uniq"})
    est = merged.collect()[0].u
    assert abs(est - 50) <= 3  # HLL estimate of 50 distinct
