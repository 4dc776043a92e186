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

import re
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
    # Nested groups named *Map merge as MAPS: first member is the key,
    # the rest sum per key; zero-sum entries drop and keys sort
    # (SummingSortedAlgorithm::MapDescription)
    orig_cols = list(df.columns)
    prefixes: dict[str, list[str]] = {}
    for c in df.columns:
        if "." in c:
            prefixes.setdefault(c.split(".", 1)[0], []).append(c)
    def _elem_numeric(col: str) -> bool:
        f = next(x for x in df.schema.fields if x.name == col)
        t = f.dataType.simpleString()
        return t.startswith("array<") and t[6:-1] in (
            "tinyint", "smallint", "int", "bigint", "float", "double",
        )

    # a *Map group maps only when every VALUE column sums (numeric
    # array elements); otherwise rows keep first-row semantics
    map_groups = {
        p: cols for p, cols in prefixes.items()
        if p.endswith("Map") and len(cols) >= 2 and p not in key
        and all(_elem_numeric(c) for c in cols[1:])
    }
    map_cols = {c for cols in map_groups.values() for c in cols}
    if summed:
        # explicit column list: ONLY those sum (group names drop out —
        # the map merge below covers them)
        numeric = [
            c for c in summed if c not in map_cols and c not in map_groups
        ]
    else:
        numeric = [
            f.name
            for f in df.schema.fields
            if f.name not in key and f.name not in map_cols
            and f.dataType.typeName() in
            ("byte", "short", "integer", "long", "float", "double", "decimal")
        ]
    others = [
        c for c in df.columns
        if c not in key and c not in numeric and c not in map_cols
    ]
    pair_tmp: dict[str, str] = {}
    for p, cols in map_groups.items():
        idc, vals = cols[0], cols[1:]
        fields = ", ".join(
            [f"element_at(`{idc}`, __i) AS k"]
            + [
                f"element_at(`{v}`, __i) AS v{x}"
                for x, v in enumerate(vals)
            ]
        )
        tmp = f"__mp_{p.replace('.', '_')}"
        df = df.withColumn(
            tmp,
            F.expr(
                f"transform(sequence(1, size(`{idc}`)), "
                f"__i -> struct({fields}))"
            ),
        )
        pair_tmp[p] = tmp
    aggs = [F.sum(f"`{c}`").alias(c) for c in numeric]
    aggs += [F.first(f"`{c}`").alias(c) for c in others]
    aggs += [
        F.flatten(F.collect_list(tmp)).alias(tmp)
        for tmp in pair_tmp.values()
    ]
    out = df.groupBy(*key).agg(*aggs)
    for p, tmp in pair_tmp.items():
        cols = map_groups[p]
        idc, vals = cols[0], cols[1:]
        # the reference sums nested-map numerics in their native width
        # (SummingSortedAlgorithm.cpp) — accumulate integrals in BIGINT
        # (no 2^53 precision loss), floats in DOUBLE
        elem_types = []
        for v in vals:
            st = next(
                f.dataType.simpleString() for f in df.schema.fields
                if f.name == v
            )
            inner = st[6:-1] if st.startswith("array<") else st
            elem_types.append(
                "BIGINT"
                if inner in ("tinyint", "smallint", "int", "bigint")
                else "DOUBLE"
            )
        sums = ", ".join(
            [f"__k AS k"]
            + [
                f"aggregate(filter({tmp}, __x -> __x.k <=> __k), "
                f"CAST(0 AS {elem_types[x]}), "
                f"(__a, __x) -> __a + __x.v{x}) AS v{x}"
                for x in range(len(vals))
            ]
        )
        alive = " OR ".join(f"__m.v{x} <> 0" for x in range(len(vals)))
        merged = (
            f"filter(transform(array_sort(array_distinct("
            f"transform({tmp}, __x -> __x.k))), __k -> struct({sums})), "
            f"__m -> {alive})"
        )
        out = out.withColumn("__merged", F.expr(merged))
        out = out.withColumn(
            idc, F.expr("transform(__merged, __m -> __m.k)")
        )
        id_type = next(
            f.dataType.simpleString() for f in df.schema.fields
            if f.name == idc
        )
        out = out.withColumn(idc, F.col(f"`{idc}`").cast(id_type))
        for x, v in enumerate(vals):
            v_type = next(
                f.dataType.simpleString() for f in df.schema.fields
                if f.name == v
            )
            out = out.withColumn(
                v, F.expr(f"transform(__merged, __m -> __m.v{x})")
            ).withColumn(v, F.col(f"`{v}`").cast(v_type))
        out = out.drop("__merged", tmp)
    if numeric:
        # SummingSortedAlgorithm.cpp: a fully-merged row is dropped when
        # every summed column is zero ("empty part" behaviour)
        alive = None
        for c in numeric:
            cond = F.col(c) != 0
            alive = cond if alive is None else (alive | cond)
        out = out.filter(alive)
    return out.select(*[f"`{c}`" for c in orig_cols])


def aggregating_final(
    df: DataFrame,
    key: Sequence[str],
    agg_columns: dict[str, str] | None = None,
) -> DataFrame:
    """AggregatingMergeTree merge: one row per key with STATE columns
    combined (AggregatingSortedAlgorithm.cpp).  States live here in
    mergeable finalized forms: set-based uniq states (arrays) merge by
    concatenation (the reader's -Merge dedups), count/sum partials
    merge by SUM, min/max by themselves, anything else keeps the first
    value.  ``agg_columns`` maps column name -> the DECLARED
    AggregateFunction name; columns NOT declared as states are ordinary
    and take the group's FIRST row's value (startGroup), never a sum."""
    key = [k for k in key if k in df.columns]
    if not key:
        return df
    aggs = []
    for f in df.schema.fields:
        if f.name in key:
            continue
        t = f.dataType.typeName()
        declared = None if agg_columns is None else agg_columns.get(f.name)
        if agg_columns is not None and declared is None:
            aggs.append(F.first(f"`{f.name}`").alias(f.name))
            continue
        # root aggregate of the declared state (strip combinators)
        root = re.sub(
            r"(?:If|OrNull|OrDefault|Distinct)+$", "", declared or ""
        ).lower()
        if t == "array":
            aggs.append(
                F.flatten(F.collect_list(f"`{f.name}`")).alias(f.name)
            )
        elif t == "struct" and set(
            sf.name for sf in f.dataType.fields  # type: ignore[union-attr]
        ) == {"s", "c"}:
            # avg partial (sum, count): merge field-wise
            aggs.append(
                F.struct(
                    F.sum(F.col(f"`{f.name}`").getField("s")).alias("s"),
                    F.sum(F.col(f"`{f.name}`").getField("c")).alias("c"),
                ).alias(f.name)
            )
        elif root == "min":
            aggs.append(F.min(f"`{f.name}`").alias(f.name))
        elif root == "max":
            aggs.append(F.max(f"`{f.name}`").alias(f.name))
        elif root in ("any", "anylast", "argmin", "argmax"):
            aggs.append(F.first(f"`{f.name}`", True).alias(f.name))
        elif t in ("byte", "short", "integer", "long", "float", "double",
                   "decimal"):
            # sum/count partials — and the legacy no-declaration
            # heuristic for numerics
            aggs.append(F.sum(f"`{f.name}`").alias(f.name))
        else:
            aggs.append(F.first(f"`{f.name}`", True).alias(f.name))
    if not aggs:
        # key-only table: the merge collapses duplicate keys
        return df.dropDuplicates(list(key))
    out = df.groupBy(*[f"`{k}`" for k in key]).agg(*aggs)
    return out.select(*[f"`{c}`" for c in df.columns])


def collapsing_final(df: DataFrame, key: Sequence[str], sign: str) -> DataFrame:
    """CollapsingSortedAlgorithm.cpp: +1/-1 rows cancel; a key survives when
    sum(sign) > 0 (unbalanced +1 remains).

    ONE hash aggregation: the sign-sum and a representative +1 row
    (``max_by`` over the packed non-key struct, ordered by a
    +1-rows-only marker so -1 rows never win) come out of the same
    groupBy — map-side partial aggregation, a single shuffle.  The
    window + dropDuplicates form this replaces paid two shuffles and a
    full per-key sort, and could not partially aggregate."""
    # the surviving row is a +1 row, so its sign column IS +1
    # (CollapsingSortedAlgorithm requires sign ∈ {1, -1}) — reconstruct
    # it as a literal instead of carrying it through max_by; with no
    # other payload the whole aggregation then stays primitive-typed
    # (HashAggregate; a struct-valued max_by falls back to the
    # sort-based aggregate and re-introduces per-partition sorts)
    payload = [c for c in df.columns if c not in key and c != sign]
    one = F.lit(1).cast(df.schema[sign].dataType).alias(sign)
    if not payload:
        out = df.groupBy(*key).agg(F.sum(sign).alias("__s"))
        return (
            out.filter(F.col("__s") > 0)
            .select(*key, one)
            .select(*df.columns)
        )
    packed = F.struct(*[F.col(c) for c in payload])
    plus_only = F.when(F.col(sign) > 0, F.lit(1))
    out = df.groupBy(*key).agg(
        F.sum(sign).alias("__s"),
        F.max_by(packed, plus_only).alias("__row"),
    )
    return (
        out.filter(F.col("__s") > 0)
        .select(*key, one, *[F.col("__row")[c].alias(c) for c in payload])
        .select(*df.columns)
    )


def versioned_collapsing_final(
    df: DataFrame, key: Sequence[str], sign: str, version: str
) -> DataFrame:
    """VersionedCollapsingAlgorithm.cpp: cancel (+1,-1) pairs per
    (key, version); keep latest surviving state row.

    Stage 1 is ONE hash aggregation per (key, version) — sign-sum plus
    a representative +1 row via ``max_by`` — instead of the previous
    window-sum + filter, which shuffled AND fully sorted every row and
    could not partially aggregate; it also feeds
    :func:`replacing_final` one row per (key, version) rather than
    every surviving +1 row, shrinking the second shuffle."""
    keyv = list(key) + [version]
    payload = [c for c in df.columns if c not in keyv and c != sign]
    one = F.lit(1).cast(df.schema[sign].dataType).alias(sign)
    if not payload:
        # sign-only table: both stages are primitive hash aggregations
        # (sum per (key, version); max version per key) — no
        # struct-valued max_by, so no sort-based aggregate anywhere
        per_ver = df.groupBy(*keyv).agg(F.sum(sign).alias("__s"))
        out = (
            per_ver.filter(F.col("__s") > 0)
            .groupBy(*key)
            .agg(F.max(version).alias(version))
        )
        return out.select(*key, F.col(version), one).select(*df.columns)
    packed = F.struct(*[F.col(c) for c in payload])
    plus_only = F.when(F.col(sign) > 0, F.lit(1))
    per_ver = df.groupBy(*keyv).agg(
        F.sum(sign).alias("__s"),
        F.max_by(packed, plus_only).alias("__row"),
    )
    survivors = (
        per_ver.filter(F.col("__s") > 0)
        .select(*keyv, one, *[F.col("__row")[c].alias(c) for c in payload])
        .select(*df.columns)
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
        return aggregating_final(df, spec.order_by, spec.agg_columns)
    raise ValueError(f"unknown engine {spec.engine}")
