"""Shuffle-efficient top-K by frequency (reference: topK / SpaceSaving,
src/AggregateFunctions/AggregateFunctionTopK.h — exact-first here, since
Catalyst's two-level aggregation replaces the sketch).

The single-expression form in functions.aggregates.top_k collects each
group's values into one buffer — fine for bounded groups, wrong for
high-cardinality ones.  This operator is the scale path: count per
(group, value) with map-side partial aggregation, then rank within group;
both shuffles are on proper keys and no executor ever holds a whole group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def top_k_df(
    df: DataFrame,
    value_col: str,
    k: int = 10,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Top-``k`` most frequent ``value_col`` per group (count desc, value
    asc tiebreak).  Output: group cols + ``value``, ``cnt``, ``rank``.
    """
    group_cols = group_cols or []
    counts = df.groupBy(*group_cols, F.col(value_col).alias("value")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("cnt").desc(), F.col("value").asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def top_k_array(
    df: DataFrame,
    value_col: str,
    k: int = 10,
    group_cols: list[str] | None = None,
    out_col: str = "top_k",
) -> DataFrame:
    """Same, but folded back to one array row per group (the reference's
    topK() return shape)."""
    group_cols = group_cols or []
    ranked = top_k_df(df, value_col, k=k, group_cols=group_cols)
    # collect_list of ≤ k pre-ranked rows per group — bounded buffer
    gb = ranked.groupBy(*group_cols) if group_cols else ranked.groupBy()
    return gb.agg(
        F.expr(
            "transform(array_sort(collect_list(named_struct('rank', rank, 'value', value))), "
            "s -> s.value)"
        ).alias(out_col)
    )
