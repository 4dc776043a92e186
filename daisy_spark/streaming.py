"""Ingest: batch + Structured Streaming with idempotent-key dedup.

The reference is a "streaming warehouse": rows arrive via REST/Kafka, get
a ``_time`` column defaulted to now (rawstore schema —
src/Server/RestRouterHandlers/RawstoreTableRestRouterHandler.cpp:87-92),
land in granularity-partitioned storage (partition exprs ``toYYYYMMDD
(_time)`` etc — TableRestRouterHandler.cpp:55-58), and are committed
idempotently: each block carries an idempotent key and replays of
already-seen keys are dropped (StorageDistributedMergeTree.cpp:1080-1196,
buildIdempotentKeysIndex).

Spark-first mapping:

- batch ingest      = DataFrame -> partitioned parquet append, with an
                      anti-join against already-ingested ``_idem`` keys
                      (exactly-once on replay, the reference's contract);
- streaming ingest  = readStream -> withWatermark + dropDuplicates on the
                      idempotent key (Spark's state store plays the role
                      of the reference's in-memory key index, with the
                      watermark as its ``max_idempotent_ids`` retention
                      analog) -> foreachBatch partitioned append with
                      checkpointing (restart-safe offsets).

Partition columns follow the reference granularities: M/D/H/m.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: reference granularity -> partition column expression over _time
#: (TableRestRouterHandler.cpp:55-58); thunks because building a Column
#: requires an active SparkSession
GRANULARITY_EXPRS = {
    "M": lambda: F.date_format("_time", "yyyyMM").cast("int"),
    "D": lambda: F.date_format("_time", "yyyyMMdd").cast("int"),
    "H": lambda: F.date_format("_time", "yyyyMMddHH"),
    "m": lambda: F.date_format("_time", "yyyyMMddHHmm"),
}

IDEM_COL = "_idem"
TIME_COL = "_time"
PARTITION_COL = "_part"


def with_ingest_columns(
    df: DataFrame,
    time_col: str | None = None,
    idem_col: str | None = None,
    granularity: str = "D",
) -> DataFrame:
    """Attach the ingest conventions: ``_time`` (defaulted to
    current_timestamp when absent, like the rawstore DEFAULT now64(3)),
    ``_idem`` (defaulted to a content hash when absent), and the
    granularity partition column."""
    if granularity not in GRANULARITY_EXPRS:
        raise ValueError(f"granularity must be one of M/D/H/m, got {granularity!r}")
    if time_col and time_col != TIME_COL:
        df = df.withColumn(TIME_COL, F.col(time_col).cast("timestamp"))
    elif TIME_COL not in df.columns:
        df = df.withColumn(TIME_COL, F.current_timestamp())
    if idem_col and idem_col != IDEM_COL:
        df = df.withColumn(IDEM_COL, F.col(idem_col).cast("string"))
    elif IDEM_COL not in df.columns:
        df = df.withColumn(
            IDEM_COL, F.sha2(F.to_json(F.struct(*df.columns)), 256)
        )
    return df.withColumn(PARTITION_COL, GRANULARITY_EXPRS[granularity]())


@dataclass
class IngestResult:
    appended: int
    deduped: int


def ingest_batch(
    df: DataFrame,
    path: str,
    time_col: str | None = None,
    idem_col: str | None = None,
    granularity: str = "D",
) -> IngestResult:
    """Exactly-once batch append: drop rows whose ``_idem`` key is already
    present in the sink (replay-safe, the reference's idempotent-commit
    contract), dedup within the batch, then append partitioned parquet.

    Scale shape: the existing-keys read prunes to the partitions the
    incoming batch touches (partition filter on ``_part``), and the
    anti-join shuffles on the key — no full-sink scan.
    """
    spark = df.sparkSession
    staged = with_ingest_columns(df, time_col, idem_col, granularity)
    before = staged.count()
    staged = staged.dropDuplicates([IDEM_COL])
    if os.path.exists(path):
        parts = [r[0] for r in staged.select(PARTITION_COL).distinct().collect()]
        existing = (
            spark.read.parquet(path)
            .filter(F.col(PARTITION_COL).isin(parts))
            .select(IDEM_COL)
        )
        staged = staged.join(existing, on=IDEM_COL, how="left_anti")
    appended = staged.count()
    staged.write.mode("append").partitionBy(PARTITION_COL).parquet(path)
    return IngestResult(appended=appended, deduped=before - appended)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


# ---------------------------------------------------------------------------
# Rawstore — Splunk-like raw event tables
# ---------------------------------------------------------------------------

#: fixed rawstore schema (RawstoreTableRestRouterHandler.cpp:87-92):
#: _raw + event/index times + source coordinates
RAWSTORE_COLUMNS = ["_raw", "_time", "_index_time", "sourcetype", "source", "host"]


def to_rawstore(
    lines: DataFrame,
    raw_col: str = "value",
    time_col: str | None = None,
    sourcetype: str = "generic_single_line",
    source: str = "",
    host: str = "",
) -> DataFrame:
    """Shape arbitrary line data into the rawstore schema: ``_raw`` is
    the untouched event text, ``_time`` the event time (defaulted to
    ingest time, like the rawstore column DEFAULT now64(3)),
    ``_index_time`` always ingest time."""
    out = lines.withColumn("_raw", F.col(raw_col).cast("string"))
    if time_col and time_col in lines.columns:
        out = out.withColumn(TIME_COL, F.col(time_col).cast("timestamp"))
    else:
        out = out.withColumn(TIME_COL, F.current_timestamp())
    return out.select(
        "_raw",
        TIME_COL,
        F.current_timestamp().alias("_index_time"),
        F.lit(sourcetype).alias("sourcetype"),
        F.lit(source).alias("source"),
        F.lit(host).alias("host"),
    )


def ingest_rawstore(
    lines: DataFrame,
    path: str,
    raw_col: str = "value",
    time_col: str | None = None,
    granularity: str = "D",
    **source_coords,
) -> IngestResult:
    """Rawstore ingest = shape to the fixed schema + the standard
    idempotent partitioned append (the ``_raw`` content hash is the
    idempotent key, so replaying the same log file is a no-op)."""
    shaped = to_rawstore(lines, raw_col, time_col, **source_coords)
    # hash only the event content + time: _index_time changes per replay
    shaped = shaped.withColumn(
        IDEM_COL,
        F.sha2(
            F.concat_ws("\x1f", F.col("_raw"), F.col(TIME_COL).cast("string")), 256
        ),
    )
    return ingest_batch(shaped, path, granularity=granularity)


def search_rawstore(
    spark: SparkSession,
    path: str,
    pattern: str | None = None,
    start_time=None,
    end_time=None,
) -> DataFrame:
    """Time-bounded regex search over a rawstore — the REST search
    contract (`_time` predicate injection, AddTimeParamVisitor.cpp:84-119)
    applied to raw events. The ``_part`` partition filter prunes files
    before the ``_raw`` scan."""
    df = spark.read.parquet(path)
    if start_time is not None:
        df = df.filter(F.col(TIME_COL) >= F.lit(start_time).cast("timestamp"))
    if end_time is not None:
        df = df.filter(F.col(TIME_COL) < F.lit(end_time).cast("timestamp"))
    if pattern:
        df = df.filter(F.col("_raw").rlike(pattern))
    return df.select(*RAWSTORE_COLUMNS)


def ingest_stream(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    time_col: str | None = None,
    idem_col: str | None = None,
    granularity: str = "D",
    watermark: str = "1 hour",
    trigger_once: bool = False,
):
    """Structured Streaming ingest with idempotent-key dedup.

    ``withWatermark(_time) + dropDuplicates(_idem)`` keeps the key index
    bounded (state older than the watermark ages out — the Spark analog of
    the reference's max_idempotent_ids ring); ``foreachBatch`` appends
    partitioned parquet; the checkpoint makes source offsets + dedup state
    restart-safe.  Returns the StreamingQuery.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_df.write.mode("append").partitionBy(PARTITION_COL).parquet(path)

    staged = with_ingest_columns(stream_df, time_col, idem_col, granularity)
    staged = staged.withWatermark(TIME_COL, watermark).dropDuplicates([IDEM_COL])
    writer = (
        staged.writeStream.option("checkpointLocation", checkpoint)
        .foreachBatch(write_batch)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def live_view(
    spark: SparkSession,
    path: str,
    schema: str,
    query_fn,
    name: str,
    trigger_seconds: float | None = None,
):
    """LiveView / WATCH (reference: src/Storages/LiveView/StorageLiveView —
    a continuously refreshed materialized query; WATCH streams its
    updates).

    Spark-first: a Structured Streaming query over the table directory
    (new parquet files picked up incrementally), re-aggregated in
    complete mode into an in-memory sink; ``SELECT * FROM <name>`` always
    reads the freshest result — the LiveView contract.  Returns the
    StreamingQuery (``.processAllAvailable()`` = synchronous WATCH tick;
    ``.stop()`` = DROP VIEW).
    """
    src = spark.readStream.schema(schema).parquet(path)
    out = query_fn(src)
    writer = (
        out.writeStream.outputMode("complete").format("memory").queryName(name)
    )
    if trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def json_lines_source(
    spark: SparkSession,
    path: str,
    schema: str,
    max_files_per_trigger: int = 10,
) -> DataFrame:
    """File-based JSONEachRow streaming source (the reference's most
    common ingest format — src/Formats/registerFormats.cpp JSONEachRow).
    On a real deployment the same pipeline reads ``spark.readStream
    .format('kafka')`` + ``from_json``; file source keeps tests hermetic.
    """
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(path)
    )
