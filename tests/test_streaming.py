"""Ingest contract: replayed batches with duplicate idempotent keys land
exactly once; streaming ingest dedups across micro-batches and survives
checkpointed restart."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from daisy_spark import streaming as ST


def test_batch_ingest_idempotent_replay(spark, tmp_path):
    sink = str(tmp_path / "tbl")
    rows = [
        {"_idem": "a", "v": 1, "_time": "2024-01-01 00:00:00"},
        {"_idem": "b", "v": 2, "_time": "2024-01-02 00:00:00"},
    ]
    df = spark.createDataFrame(rows).withColumn("_time", F.col("_time").cast("timestamp"))
    r1 = ST.ingest_batch(df, sink)
    assert r1.appended == 2 and r1.deduped == 0

    # replay the same block + one new row -> only the new row lands
    rows2 = rows + [{"_idem": "c", "v": 3, "_time": "2024-01-02 05:00:00"}]
    df2 = spark.createDataFrame(rows2).withColumn("_time", F.col("_time").cast("timestamp"))
    r2 = ST.ingest_batch(df2, sink)
    assert r2.appended == 1 and r2.deduped == 2

    got = ST.read_table(spark, sink)
    assert sorted(r["_idem"] for r in got.collect()) == ["a", "b", "c"]
    # granularity partitioning materialized (D -> yyyymmdd ints)
    assert sorted(r._part for r in got.select("_part").distinct().collect()) == [
        20240101, 20240102,
    ]


def test_batch_ingest_defaults_time_and_idem(spark, tmp_path):
    sink = str(tmp_path / "tbl2")
    df = spark.createDataFrame([{"v": 1}, {"v": 1}, {"v": 2}])
    r = ST.ingest_batch(df, sink)
    # identical rows share the content-hash idem key -> in-batch dedup
    assert r.appended == 2 and r.deduped == 1
    got = ST.read_table(spark, sink)
    assert {c for c in got.columns} >= {"v", "_time", "_idem", "_part"}


def test_stream_ingest_dedup_and_restart(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    schema = "_idem STRING, v LONG, _time TIMESTAMP"

    def write_file(name, rows):
        with open(src / name, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    write_file("f1.json", [
        {"_idem": "a", "v": 1, "_time": "2024-01-01 00:00:00"},
        {"_idem": "a", "v": 1, "_time": "2024-01-01 00:00:00"},
        {"_idem": "b", "v": 2, "_time": "2024-01-01 01:00:00"},
    ])

    stream = ST.json_lines_source(spark, str(src), schema)
    q = ST.ingest_stream(stream, sink, ckpt, trigger_once=True)
    q.awaitTermination(120)

    got = sorted(r["_idem"] for r in ST.read_table(spark, sink).collect())
    assert got == ["a", "b"]

    # restart from checkpoint with a new file: old keys within watermark
    # state are deduped, new key lands
    write_file("f2.json", [
        {"_idem": "b", "v": 2, "_time": "2024-01-01 01:00:00"},
        {"_idem": "c", "v": 3, "_time": "2024-01-01 02:00:00"},
    ])
    stream2 = ST.json_lines_source(spark, str(src), schema)
    q2 = ST.ingest_stream(stream2, sink, ckpt, trigger_once=True)
    q2.awaitTermination(120)

    got2 = sorted(r["_idem"] for r in ST.read_table(spark, sink).collect())
    assert got2 == ["a", "b", "c"]


def test_live_view_refreshes(spark, tmp_path):
    sink = str(tmp_path / "lv")
    df1 = spark.createDataFrame(
        [{"_idem": "a", "v": 1, "_time": "2024-01-01 00:00:00"}]
    ).withColumn("_time", F.col("_time").cast("timestamp"))
    ST.ingest_batch(df1, sink)

    q = ST.live_view(
        spark,
        sink,
        "v LONG, _time TIMESTAMP, _idem STRING, _part INT",
        lambda s: s.groupBy().agg(F.sum("v").alias("total")),
        name="lv_totals",
    )
    try:
        q.processAllAvailable()
        assert spark.sql("SELECT total FROM lv_totals").collect()[0].total == 1

        df2 = spark.createDataFrame(
            [{"_idem": "b", "v": 41, "_time": "2024-01-01 01:00:00"}]
        ).withColumn("_time", F.col("_time").cast("timestamp"))
        ST.ingest_batch(df2, sink)
        q.processAllAvailable()
        assert spark.sql("SELECT total FROM lv_totals").collect()[0].total == 42
    finally:
        q.stop()


def test_rawstore_ingest_and_search(spark, tmp_path):
    sink = str(tmp_path / "raw")
    lines = spark.createDataFrame(
        [("2024-03-01 10:00:00", "ERROR disk full on /dev/sda1"),
         ("2024-03-01 11:00:00", "INFO backup completed"),
         ("2024-03-02 09:30:00", "ERROR timeout talking to db")],
        "ts string, value string",
    )
    r = ST.ingest_rawstore(
        lines, sink, time_col="ts", sourcetype="syslog", source="unit", host="h1"
    )
    assert r.appended == 3
    # replaying the same lines is a no-op (idempotent key = content+time)
    r2 = ST.ingest_rawstore(lines, sink, time_col="ts", sourcetype="syslog")
    assert r2.appended == 0 and r2.deduped == 3

    hits = ST.search_rawstore(
        spark, sink, pattern="ERROR",
        start_time="2024-03-01", end_time="2024-03-02",
    ).collect()
    assert len(hits) == 1 and "disk full" in hits[0]["_raw"]
    assert hits[0]["sourcetype"] == "syslog" and hits[0]["host"] == "h1"
    all_err = ST.search_rawstore(spark, sink, pattern="ERROR").collect()
    assert len(all_err) == 2
