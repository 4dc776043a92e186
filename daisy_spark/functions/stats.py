"""Statistical-test aggregates — df-level scale path (SURVEY §2.4 ML/stats).

Reference: src/AggregateFunctions/AggregateFunctionMannWhitney.h,
AggregateFunctionRankCorrelation.h,
AggregateFunctionCategoricalInformationValue.h.

The rank-based tests need ranks over the whole group, which the reference
computes by buffering every value in the aggregation state
(MannWhitney keeps two PODArrays per group). On Spark the same statistic
is a WINDOW rank — one shuffle on the group key, sort spills to disk, no
per-key memory buffer — so these are DataFrame transforms, not Column
aggregates. Moment-based tests (welch/studentTTest) have closed-form
Column builders in aggregates.py.

Each function returns one row per group: ``group_cols + result columns``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _gw(group_cols: list[str]):
    return Window.partitionBy(*group_cols) if group_cols else Window.partitionBy()


def mann_whitney_u_test_df(
    df: DataFrame,
    value: str,
    sample_index: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """mannWhitneyUTest(value, sample_index): U statistics of the two
    samples (index 0/1), with average ranks for ties (the reference's
    'continuity-corrected ranks').

    Plan shape: one window rank over (group, value) + one hash
    aggregation — both shuffle on the group key, the sort spills.
    Returns ``group_cols + [u0, u1, z]`` where z is the tie-uncorrected
    normal approximation of u0.
    """
    group_cols = group_cols or []
    v = F.col(value).cast("double")
    # average rank with ties: rank() gives the first position; the average
    # rank of a tie run of length L starting at r is r + (L-1)/2
    w = _gw(group_cols).orderBy(v)
    ranked = df.withColumn(
        "__avgrank",
        F.rank().over(w)
        + (F.count(F.lit(1)).over(_gw(group_cols + [value])) - 1) / 2.0,
    )
    g = F.col(sample_index).cast("int")
    agg = ranked.groupBy(*group_cols).agg(
        F.sum(F.when(g == 0, F.col("__avgrank"))).alias("__r0"),
        F.count(F.when(g == 0, F.lit(1))).alias("__n0"),
        F.count(F.when(g == 1, F.lit(1))).alias("__n1"),
    )
    n0, n1 = F.col("__n0").cast("double"), F.col("__n1").cast("double")
    u0 = F.col("__r0") - n0 * (n0 + 1) / 2.0
    u1 = n0 * n1 - u0
    mean_u = n0 * n1 / 2.0
    sd_u = F.sqrt(n0 * n1 * (n0 + n1 + 1) / 12.0)
    return agg.select(
        *group_cols,
        u0.alias("u0"),
        u1.alias("u1"),
        ((u0 - mean_u) / sd_u).alias("z"),
    )


def rank_corr_df(
    df: DataFrame,
    x: str,
    y: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """rankCorr(x, y): Spearman rank correlation = Pearson corr of the
    average ranks of x and y (AggregateFunctionRankCorrelation.h).

    Two window ranks (same partition key, different sort) + corr — the
    shuffles spill; no per-key buffer. Returns ``group_cols + [rank_corr]``.
    """
    group_cols = group_cols or []
    def avg_rank(col: str):
        w = _gw(group_cols).orderBy(F.col(col).cast("double"))
        return (
            F.rank().over(w)
            + (F.count(F.lit(1)).over(_gw(group_cols + [col])) - 1) / 2.0
        )
    ranked = df.withColumn("__rx", avg_rank(x)).withColumn("__ry", avg_rank(y))
    return ranked.groupBy(*group_cols).agg(
        F.corr("__rx", "__ry").alias("rank_corr")
    )


def categorical_information_value_df(
    df: DataFrame,
    category: str,
    outcome: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """categoricalInformationValue(category, outcome) at scale: two-level
    hash aggregation (per-category counts, then the IV fold) — map-side
    combinable at both levels, no row buffer. Returns
    ``group_cols + [information_value]``."""
    group_cols = group_cols or []
    o = F.col(outcome).cast("int")
    per_cat = df.groupBy(*group_cols, category).agg(
        F.sum(o).alias("__g"),
        F.sum(1 - o).alias("__b"),
    )
    wt = _gw(group_cols)
    with_tot = per_cat.withColumn("__gt", F.sum("__g").over(wt)).withColumn(
        "__bt", F.sum("__b").over(wt)
    )
    gp = F.col("__g") / F.col("__gt")
    bp = F.col("__b") / F.col("__bt")
    return with_tot.groupBy(*group_cols).agg(
        F.sum((gp - bp) * (F.log(gp) - F.log(bp))).alias("information_value")
    )


def logistic_regression_df(
    df: DataFrame,
    x_cols: list[str],
    label_col: str,
    iters: int = 25,
    lr: float = 2.0,
) -> tuple[list[float], float]:
    """stochasticLogisticRegression
    (src/AggregateFunctions/AggregateFunctionMLMethod.cpp) — the
    reference trains by SGD over arena-held state; here deterministic
    FULL-BATCH gradient descent: each iteration is ONE distributed
    aggregation computing the exact gradient (map-side combinable sums),
    and the driver holds only the (n_features + 1) coefficient vector —
    never data rows.  Features are standardized internally for stable
    step sizes; returned weights are de-standardized.

    Returns ``(weights, bias)`` for p = sigmoid(w·x + b).
    """
    k = len(x_cols)
    proj = df.select(
        *[F.col(c).cast("double").alias(f"_x{i}") for i, c in enumerate(x_cols)],
        F.col(label_col).cast("double").alias("_y"),
    ).persist()
    try:
        stat = proj.agg(
            *[F.avg(f"_x{i}").alias(f"m{i}") for i in range(k)],
            *[F.stddev_pop(f"_x{i}").alias(f"s{i}") for i in range(k)],
        ).collect()[0]
        means = [float(stat[f"m{i}"]) for i in range(k)]
        stds = [float(stat[f"s{i}"]) or 1.0 for i in range(k)]
        w = [0.0] * k
        b = 0.0
        for _ in range(iters):
            z = F.lit(b)
            for i in range(k):
                z = z + F.lit(w[i]) * ((F.col(f"_x{i}") - means[i]) / stds[i])
            err = F.lit(1.0) / (F.lit(1.0) + F.exp(-z)) - F.col("_y")
            g = proj.agg(
                F.avg(err).alias("gb"),
                *[
                    F.avg(
                        err * ((F.col(f"_x{i}") - means[i]) / stds[i])
                    ).alias(f"g{i}")
                    for i in range(k)
                ],
            ).collect()[0]
            b -= lr * float(g["gb"])
            for i in range(k):
                w[i] -= lr * float(g[f"g{i}"])
    finally:
        proj.unpersist()
    w_out = [w[i] / stds[i] for i in range(k)]
    b_out = b - sum(w[i] * means[i] / stds[i] for i in range(k))
    return w_out, b_out


def logistic_predict(w: list[float], b: float, x_cols: list[str]):
    """Column of sigmoid(w·x + b) from a trained coefficient vector."""
    z = F.lit(float(b))
    for wi, c in zip(w, x_cols):
        z = z + F.lit(float(wi)) * F.col(c).cast("double")
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
