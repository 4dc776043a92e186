"""Table maintenance: TTL, OPTIMIZE, mutations (SURVEY §2.11).

Reference semantics:

- TTL expression per table drops expired rows during merges
  (src/Storages/TTLDescription.h:37, TTLBlockInputStream.cpp);
- ``OPTIMIZE TABLE [FINAL]`` forces a merge — compacts parts and applies
  engine merge semantics (src/Interpreters/InterpreterOptimizeQuery.cpp);
- mutations ``ALTER TABLE ... DELETE / UPDATE`` rewrite affected parts
  asynchronously (src/Interpreters/MutationsInterpreter.cpp).

Spark-first: a table is a directory of immutable parquet partitions, so
all three are REWRITES — read, transform, write back.  Each operates
partition-directory-at-a-time where possible (TTL on a time-partitioned
table prunes whole partitions without reading them — the exact analog of
the reference dropping whole parts past TTL).
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from daisy_spark.streaming import PARTITION_COL


@dataclass
class MaintenanceResult:
    rows_before: int
    rows_after: int
    partitions_dropped: int = 0


def _atomic_rewrite(spark: SparkSession, path: str, df: DataFrame) -> None:
    """Rewrite a parquet table directory via a staging dir + swap.

    Spark cannot overwrite a path it is reading; staging keeps the table
    readable until the swap and makes a crashed rewrite recoverable (the
    original is intact until the final rename).  The ingest partitioning
    column, when present, is preserved as directory partitioning."""
    staging = path.rstrip("/") + ".__rewrite__"
    backup = path.rstrip("/") + ".__old__"
    writer = df.write.mode("overwrite")
    if PARTITION_COL in df.columns:
        writer = writer.partitionBy(PARTITION_COL)
    writer.parquet(staging)
    os.rename(path, backup)
    os.rename(staging, path)
    shutil.rmtree(backup)


def apply_ttl(
    spark: SparkSession,
    path: str,
    time_col: str,
    older_than: str,
) -> MaintenanceResult:
    """Drop rows whose ``time_col`` is older than the cutoff.

    When the table is partitioned on the ingest granularity column
    (streaming.PARTITION_COL, day-level ints), whole expired partition
    DIRECTORIES are deleted without reading a row — the scan+rewrite
    fallback only runs for the single boundary partition.
    """
    df = spark.read.parquet(path)
    cutoff = F.lit(older_than).cast("timestamp")
    before = df.count()

    dropped_dirs = 0
    if PARTITION_COL in df.columns:
        cutoff_day = (
            spark.range(1)
            .select(F.date_format(cutoff, "yyyyMMdd").cast("int").alias("d"))
            .collect()[0]
            .d
        )
        for entry in list(os.listdir(path)):
            if entry.startswith(f"{PARTITION_COL}="):
                try:
                    part = int(entry.split("=", 1)[1])
                except ValueError:
                    continue
                if part < cutoff_day:  # strictly before the cutoff's day
                    shutil.rmtree(os.path.join(path, entry))
                    dropped_dirs += 1
        df = spark.read.parquet(path)

    remaining_expired = df.filter(F.col(time_col) < cutoff).limit(1).count()
    if remaining_expired:
        _atomic_rewrite(spark, path, df.filter(F.col(time_col) >= cutoff))
    after = spark.read.parquet(path).count()
    return MaintenanceResult(before, after, dropped_dirs)


def mutate_delete(
    spark: SparkSession, path: str, predicate: Column
) -> MaintenanceResult:
    """ALTER TABLE ... DELETE WHERE predicate — rewrite without matches."""
    df = spark.read.parquet(path)
    before = df.count()
    _atomic_rewrite(spark, path, df.filter(~predicate))
    after = spark.read.parquet(path).count()
    return MaintenanceResult(before, after)


def mutate_update(
    spark: SparkSession,
    path: str,
    assignments: dict[str, Column],
    predicate: Column,
) -> MaintenanceResult:
    """ALTER TABLE ... UPDATE col = expr WHERE predicate — conditional
    rewrite of the assigned columns."""
    df = spark.read.parquet(path)
    before = df.count()
    out = df
    for col, expr in assignments.items():
        out = out.withColumn(col, F.when(predicate, expr).otherwise(F.col(col)))
    _atomic_rewrite(spark, path, out)
    return MaintenanceResult(before, before)


def optimize(
    spark: SparkSession,
    path: str,
    target_partitions: int | None = None,
    final_spec=None,
) -> MaintenanceResult:
    """OPTIMIZE TABLE [FINAL]: compact small files (coalesce to
    ``target_partitions``, default = max(1, bytes/128MB)) and, with a
    TableSpec, apply engine merge semantics so reads no longer need
    FINAL."""
    df = spark.read.parquet(path)
    before = df.count()
    if final_spec is not None:
        from daisy_spark.operators.final import read_final

        df = read_final(df, final_spec)
    if target_partitions is None:
        total_bytes = sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs in os.walk(path)
            for f in fs
        )
        target_partitions = max(1, total_bytes // (128 << 20))
    out = df.coalesce(int(target_partitions))
    _atomic_rewrite(spark, path, out)
    after = spark.read.parquet(path).count()
    return MaintenanceResult(before, after)
