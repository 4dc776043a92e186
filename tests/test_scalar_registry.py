"""FUNCTIONS registry round-trip: every name maps to a callable, and the
array/JSON/map/tuple family evaluates to the reference semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from daisy_spark.functions.scalar import ARRAY_JSON_FUNCTIONS, FUNCTIONS


def test_every_registry_name_is_callable():
    assert len(FUNCTIONS) >= 230
    for name, fn in FUNCTIONS.items():
        assert callable(fn), name


def _eval(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0].v


@pytest.mark.parametrize(
    "name,make_args,expected",
    [
        ("arrayMap", lambda: (F.array(F.lit(1), F.lit(2)), lambda x: x * 10), [10, 20]),
        ("arrayFilter", lambda: (F.array(F.lit(1), F.lit(5)), lambda x: x > 2), [5]),
        ("arrayExists", lambda: (F.array(F.lit(1), F.lit(5)), lambda x: x > 4), True),
        ("arrayAll", lambda: (F.array(F.lit(1), F.lit(5)), lambda x: x > 0), True),
        ("arrayCount", lambda: (F.array(F.lit(1), F.lit(5)), lambda x: x > 2), 1),
        ("arraySum", lambda: (F.array(F.lit(1.5), F.lit(2.5)),), 4.0),
        ("arrayAvg", lambda: (F.array(F.lit(2.0), F.lit(4.0)),), 3.0),
        ("arrayUniq", lambda: (F.array(F.lit(1), F.lit(1), F.lit(2)),), 2),
        ("arrayCompact", lambda: (F.array(F.lit(1), F.lit(1), F.lit(2), F.lit(1)),), [1, 2, 1]),
        ("arrayDifference", lambda: (F.array(F.lit(1), F.lit(4), F.lit(2)),), [0.0, 3.0, -2.0]),
        ("arrayCumSum", lambda: (F.array(F.lit(1), F.lit(2), F.lit(3)),), [1.0, 3.0, 6.0]),
        ("arrayPushBack", lambda: (F.array(F.lit(1)), F.lit(2)), [1, 2]),
        ("arrayPopFront", lambda: (F.array(F.lit(1), F.lit(2)),), [2]),
        ("arraySlice", lambda: (F.array(F.lit(1), F.lit(2), F.lit(3)), 2, 2), [2, 3]),
        ("hasAll", lambda: (F.array(F.lit(1), F.lit(2)), F.array(F.lit(2))), True),
        ("hasAny", lambda: (F.array(F.lit(1)), F.array(F.lit(9))), False),
        ("indexOf", lambda: (F.array(F.lit("a"), F.lit("b")), F.lit("b")), 2),
        ("arrayElement", lambda: (F.array(F.lit(7), F.lit(8)), -1), 8),
        ("emptyArrayToSingle", lambda: (F.array().cast("array<int>"),), [None]),
        ("JSONExtractString", lambda: (F.lit('{"k": "x"}'), "k"), "x"),
        ("JSONExtractInt", lambda: (F.lit('{"k": 7}'), "k"), 7),
        ("JSONHas", lambda: (F.lit('{"k": 7}'), "q"), False),
        ("JSONLength", lambda: (F.lit('{"a": 1, "b": 2}'),), 2),
        ("JSONExtractKeys", lambda: (F.lit('{"a": 1, "b": 2}'),), ["a", "b"]),
        ("mapKeys", lambda: (F.create_map(F.lit("k"), F.lit(1)),), ["k"]),
        ("mapContains", lambda: (F.create_map(F.lit("k"), F.lit(1)), F.lit("k")), True),
        ("tupleElement", lambda: (F.struct(F.lit(10), F.lit(20)), 2), 20),
        ("range", lambda: (F.lit(3),), [0, 1, 2]),
    ],
)
def test_array_json_semantics(spark, name, make_args, expected):
    args = make_args()
    if not isinstance(args, tuple):
        args = (args,)
    got = _eval(spark, ARRAY_JSON_FUNCTIONS[name](*args))
    assert got == expected, f"{name}: {got!r} != {expected!r}"
