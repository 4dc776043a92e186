"""Bucketed-mirror layout (catalog.build_bucketed_mirror, SURVEY §4.3).

The reference sorts each part by the table's ORDER BY key at insert
(MergeTree write path); the Spark analogue is bucketBy+sortBy at write,
which lets orderkey-equi-joins read co-located sorted buckets with no
shuffle and no sort.
"""

import pytest
from pyspark.sql import functions as F

from daisy_spark.catalog import (
    BUCKETED_MIRRORS,
    build_bucketed_mirror,
    load_table,
)
from daisy_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def mirrored(spark):
    build_bucketed_mirror(spark, SF, buckets=4)
    yield spark
    # unregister: a mirror changes float summation ORDER (bucket-sorted
    # reads), which flips last-cent rounding vs the oracle in later
    # tests sharing this process
    import os

    for name in ("lineitem", "orders", "customer"):
        BUCKETED_MIRRORS.pop((os.path.abspath(SF), name), None)


def test_mirror_registered_and_equal(mirrored):
    import os

    key = (os.path.abspath(SF), "lineitem")
    assert key in BUCKETED_MIRRORS
    plain = mirrored.read.parquet(f"{SF}/lineitem.parquet")
    mirror = load_table(mirrored, SF, "lineitem")
    assert mirror.count() == plain.count()
    assert set(mirror.columns) == set(plain.columns)


def test_bucketed_join_has_no_shuffle(mirrored):
    """The l⋈o orderkey join over the mirrors must contain no
    shuffle Exchange — only broadcast exchanges are allowed (the plan
    reads co-located buckets; this is the property that holds at any
    scale, 100 TB included)."""
    l = load_table(mirrored, SF, "lineitem")
    o = load_table(mirrored, SF, "orders")
    # disable auto-broadcast so the join can't cheat at test scale
    prev = mirrored.conf.get("spark.sql.autoBroadcastJoinThreshold")
    mirrored.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = l.join(o, l.l_orderkey == o.o_orderkey).groupBy(
            "l_orderkey"
        ).agg(F.sum("l_quantity").alias("q"))
        plan = j._jdf.queryExecution().executedPlan().toString()
    finally:
        mirrored.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    shuffle_lines = [
        ln for ln in plan.split("\n")
        if "Exchange" in ln and "BroadcastExchange" not in ln
    ]
    assert shuffle_lines == [], shuffle_lines
    assert "SortMergeJoin" in plan


def test_customer_side_reads_bucketed_no_shuffle(mirrored):
    """The o⋈c custkey join over the customer mirror shuffles ONLY the
    probe (orders) side — the customer scan feeds the join straight
    from its bucketed layout.  This is the 100-TB path where the
    customer broadcast stops being free: one exchange (orders into
    customer's distribution) instead of a per-executor broadcast."""
    o = load_table(mirrored, SF, "orders")
    c = load_table(mirrored, SF, "customer")
    prev = mirrored.conf.get("spark.sql.autoBroadcastJoinThreshold")
    mirrored.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = o.join(c, o.o_custkey == c.c_custkey).groupBy(
            "c_mktsegment"
        ).agg(F.sum("o_totalprice").alias("v"))
        plan = j._jdf.queryExecution().executedPlan().toString()
    finally:
        mirrored.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan
    # exactly the exchanges BELOW the join: orders reshuffles into the
    # bucket distribution, customer does not (the aggregation above the
    # join may legitimately exchange on c_mktsegment)
    join_part = plan.split("SortMergeJoin", 1)[1]
    shuffles = [
        ln for ln in join_part.split("\n")
        if "Exchange hashpartitioning" in ln
    ]
    assert len(shuffles) == 1, shuffles
    assert "o_custkey" in shuffles[0], shuffles


def test_queries_identical_with_mirror(mirrored):
    """shipping_priority / region_revenue return byte-identical results
    with and without the bucketed path."""
    for name in ("shipping_priority", "region_revenue"):
        with_mirror = sorted(
            tuple(r) for r in QUERIES[name](mirrored, SF).collect()
        )
        import daisy_spark.catalog as C

        saved = dict(C.BUCKETED_MIRRORS)
        C.BUCKETED_MIRRORS.clear()
        try:
            plain = sorted(
                tuple(r) for r in QUERIES[name](mirrored, SF).collect()
            )
        finally:
            C.BUCKETED_MIRRORS.update(saved)
        assert with_mirror == plain, name
