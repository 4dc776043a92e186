"""Engine-semantics-on-read: FINAL normalization (SURVEY §2.1).

The reference's MergeTree engine variants apply row-merge semantics during
background merges; ``SELECT ... FINAL`` forces merge-on-read
(src/Processors/QueryPlan/MergingFinal.cpp, algorithms in
src/Processors/Merges/Algorithms/*SortedAlgorithm.cpp).  On Spark the data
is immutable Parquet, so FINAL becomes a read-time normalization:

- ReplacingMergeTree  -> keep last row per ORDER BY key (by version column
  if declared, else load order surrogate)
- SummingMergeTree    -> groupBy key, sum numeric columns
- AggregatingMergeTree-> groupBy key, caller-provided merge expressions
- CollapsingMergeTree -> keep rows where the sign-sum survives
- VersionedCollapsing -> per (key, version) cancel +1/-1 pairs

All are plain DataFrame ops -> Catalyst keeps pushdown/AQE through them.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from daisy_spark.catalog import TableSpec


def replacing_final(
    df: DataFrame, key: Sequence[str], version: str | None = None
) -> DataFrame:
    """ReplacingSortedAlgorithm.cpp: last row (max version) per key wins.

    One hash aggregation (``max_by`` over the packed non-key struct) —
    a single shuffle with map-side partial aggregation, instead of the
    window row_number form whose per-key sort buffers the whole
    partition.  At 100× the data the agg form also dodges the full-sort
    skew of hot keys."""
    others = [c for c in df.columns if c not in key]
    if not others:
        return df.dropDuplicates(list(key))
    ver = F.col(version) if version else F.lit(1)
    packed = F.struct(*[F.col(c) for c in others])
    out = df.groupBy(*key).agg(F.max_by(packed, ver).alias("__row"))
    return out.select(
        *key, *[F.col("__row")[c].alias(c) for c in others]
    ).select(*df.columns)


def summing_final(
    df: DataFrame, key: Sequence[str], summed: Sequence[str] = ()
) -> DataFrame:
    """SummingSortedAlgorithm.cpp: one row per key, numeric columns summed.

    Columns outside key+summed take an arbitrary surviving value (`any`),
    matching the reference's 'first row of the merge range'.
    """
    numeric = list(summed) or [
        f.name
        for f in df.schema.fields
        if f.name not in key and f.dataType.typeName() in
        ("byte", "short", "integer", "long", "float", "double", "decimal")
    ]
    others = [c for c in df.columns if c not in key and c not in numeric]
    aggs = [F.sum(c).alias(c) for c in numeric] + [F.first(c).alias(c) for c in others]
    out = df.groupBy(*key).agg(*aggs)
    if numeric:
        # SummingSortedAlgorithm.cpp: a fully-merged row is dropped when
        # every summed column is zero ("empty part" behaviour)
        alive = None
        for c in numeric:
            cond = F.col(c) != 0
            alive = cond if alive is None else (alive | cond)
        out = out.filter(alive)
    return out.select(*df.columns)


def collapsing_final(df: DataFrame, key: Sequence[str], sign: str) -> DataFrame:
    """CollapsingSortedAlgorithm.cpp: +1/-1 rows cancel; a key survives when
    sum(sign) > 0 (unbalanced +1 remains)."""
    w = Window.partitionBy(*key)
    out = df.withColumn("__s", F.sum(sign).over(w))
    return (
        out.filter((F.col("__s") > 0) & (F.col(sign) > 0))
        .drop("__s")
        .dropDuplicates(list(key))
    )


def versioned_collapsing_final(
    df: DataFrame, key: Sequence[str], sign: str, version: str
) -> DataFrame:
    """VersionedCollapsingAlgorithm.cpp: cancel (+1,-1) pairs per
    (key, version); keep latest surviving state row."""
    w = Window.partitionBy(*(list(key) + [version]))
    survivors = (
        df.withColumn("__s", F.sum(sign).over(w))
        .filter((F.col("__s") > 0) & (F.col(sign) > 0))
        .drop("__s")
    )
    return replacing_final(survivors, key, version)


def read_final(df: DataFrame, spec: TableSpec) -> DataFrame:
    """Apply the table's engine semantics (FINAL) per its TableSpec."""
    kind = spec.engine.replace("MergeTree", "")
    if kind in ("", "MergeTree"):
        return df
    if kind == "Replacing":
        return replacing_final(df, spec.order_by, spec.version_column)
    if kind == "Summing":
        return summing_final(df, spec.order_by, spec.summed_columns)
    if kind == "Collapsing":
        return collapsing_final(df, spec.order_by, spec.sign_column)
    if kind == "VersionedCollapsing":
        return versioned_collapsing_final(
            df, spec.order_by, spec.sign_column, spec.version_column
        )
    if kind == "Aggregating":
        # state columns merge via functions.states.merge_states (the
        # -State/-Merge path); without declared states the Replacing
        # behaviour (last row per key) is the closest contract
        return replacing_final(df, spec.order_by, spec.version_column)
    raise ValueError(f"unknown engine {spec.engine}")
