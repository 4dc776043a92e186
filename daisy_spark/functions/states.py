"""-State / -Merge combinators: partial aggregation states
(SURVEY §2.4; reference: src/DataTypes/DataTypeAggregateFunction.h —
AggregateFunction(fn, T) columns hold serialized partial states; -State
produces them, -Merge combines them; AggregatingMergeTree merges state
rows at merge time).

Spark-first: a state is a typed COLUMN (struct/long/binary), not an
opaque blob — so Catalyst sees through it and partial aggregation is
still map-side combined.  Each aggregate is an AggState with three
expressions:

- ``state(col)``    the -State aggregate (groupBy produces state rows)
- ``merge(state)``  the -Merge aggregate (combine state rows)
- ``finalize(col)`` state -> final value

For uniq, the state is Spark's HLL sketch binary (hll_sketch_agg /
hll_union_agg) — a real mergeable sketch, the same design as the
reference's uniqCombined state.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.col(x)


@dataclass
class AggState:
    name: str
    state: Callable[[Column], Column]
    merge: Callable[[Column], Column]
    finalize: Callable[[Column], Column]


def _ident(c: Column) -> Column:
    return c


count_state = AggState(
    "count",
    state=lambda c: F.count(_c(c)),
    merge=lambda s: F.sum(_c(s)),
    finalize=_ident,
)

sum_state = AggState(
    "sum",
    state=lambda c: F.sum(_c(c)),
    merge=lambda s: F.sum(_c(s)),
    finalize=_ident,
)

min_state = AggState(
    "min",
    state=lambda c: F.min(_c(c)),
    merge=lambda s: F.min(_c(s)),
    finalize=_ident,
)

max_state = AggState(
    "max",
    state=lambda c: F.max(_c(c)),
    merge=lambda s: F.max(_c(s)),
    finalize=_ident,
)

avg_state = AggState(
    "avg",
    state=lambda c: F.struct(
        F.sum(_c(c).cast("double")).alias("s"),
        F.count(_c(c)).alias("n"),
    ),
    merge=lambda s: F.struct(
        F.sum(_c(s).getField("s")).alias("s"),
        F.sum(_c(s).getField("n")).alias("n"),
    ),
    finalize=lambda c: _c(c).getField("s") / _c(c).getField("n"),
)

uniq_state = AggState(
    "uniq",
    state=lambda c: F.hll_sketch_agg(_c(c)),
    merge=lambda s: F.hll_union_agg(_c(s)),
    finalize=lambda c: F.hll_sketch_estimate(_c(c)),
)

arg_max_state = AggState(
    "argMax",
    state=lambda c: F.max(_c(c)),  # c = struct(ord, val)
    merge=lambda s: F.max(_c(s)),
    finalize=lambda c: _c(c).getField("val"),
)


STATES: dict[str, AggState] = {
    s.name: s
    for s in (
        count_state, sum_state, min_state, max_state, avg_state,
        uniq_state, arg_max_state,
    )
}


def arg_max_input(value: Column, order: Column) -> Column:
    """Build the argMax state input struct (max over (order, value))."""
    return F.struct(_c(order).alias("ord"), _c(value).alias("val"))


def state_by(df, group_cols: list[str], states: dict[str, tuple[str, Column]]):
    """GROUP BY -> one state row per key.

    ``states``: out_col -> (agg name, input column).  This is the -State
    write path (what an AggregatingMergeTree insert materializes).
    """
    aggs = [
        STATES[name].state(col).alias(out) for out, (name, col) in states.items()
    ]
    return df.groupBy(*group_cols).agg(*aggs)


def merge_states(df, group_cols: list[str], states: dict[str, str]):
    """Combine state rows to a coarser key and finalize.

    ``states``: col -> agg name.  This is -Merge: state columns combine
    with the aggregate's own merge function, never by re-scanning rows —
    EXACTLY like the reference's AggregatingMergeTree FINAL.
    """
    aggs = [
        STATES[name].merge(F.col(col)).alias(col) for col, name in states.items()
    ]
    merged = df.groupBy(*group_cols).agg(*aggs)
    out = merged
    for col, name in states.items():
        out = out.withColumn(col, STATES[name].finalize(F.col(col)))
    return out
