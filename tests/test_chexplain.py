"""Unit tests for the canonical EXPLAIN SYNTAX renderer (chexplain.py).

These are pure text->text: no SparkSession involved.  End-to-end
byte-parity against the reference's .reference files is covered by the
explain-cluster entries in test_reference_corpus.py.
"""

from __future__ import annotations

import pytest

from daisy_spark.chexplain import (
    ChExplainError,
    explain_syntax,
    fmt_float,
)


def test_star_expansion_multiline():
    out = explain_syntax("SELECT * FROM a", {"a": ["a", "b"]})
    assert out == "SELECT\n    a,\n    b\nFROM a"


def test_operator_parens_only_where_needed():
    out = explain_syntax(
        "SELECT 1 WHERE k = 1 AND name LIKE 'A%'",
        {"t": ["k", "name"]},
    )
    assert "WHERE (k = 1) AND (name LIKE 'A%')" in out


def test_union_distinct_normalization():
    out = explain_syntax(
        "SELECT 1 UNION ALL SELECT 1 UNION DISTINCT SELECT 1"
    )
    assert out == (
        "SELECT 1\nUNION DISTINCT\nSELECT 1\nUNION DISTINCT\nSELECT 1"
    )


def test_order_by_gets_explicit_asc():
    out = explain_syntax("SELECT dummy FROM system.one ORDER BY dummy")
    assert out.endswith("ORDER BY dummy ASC")


def test_duplicate_distinct_removed_bottom_up():
    out = explain_syntax(
        "SELECT DISTINCT number FROM (SELECT DISTINCT number FROM numbers(1))"
    )
    assert out.startswith("SELECT number\n")
    assert out.count("DISTINCT") == 1


def test_move_to_prewhere_and_fold():
    meta = {
        "t": {"cols": ["x1", "x2"], "sorting_key": [], "mergetree": True}
    }
    out = explain_syntax("SELECT x1, x2 FROM t WHERE x1 > 100", meta)
    assert "PREWHERE x1 > 100" in out
    assert "WHERE" not in out.replace("PREWHERE", "")


def test_predicate_pushdown_into_subquery():
    out = explain_syntax(
        "SELECT number FROM (SELECT number FROM numbers(10)) AS s "
        "WHERE number = 5"
    )
    # pushed copy inside, original kept outside
    assert out.count("number = 5") == 2


def test_constant_folding_true_drops_where():
    assert "WHERE" not in explain_syntax("SELECT 1 WHERE 1 IN (0, 1, 2)")
    assert explain_syntax("SELECT 1 WHERE 1 = 0").endswith("WHERE 0")


def test_float_formatting_matches_reference():
    assert fmt_float(1.8446744073709552e19) == "18446744073709552000."
    assert fmt_float(2.0) == "2."
    assert fmt_float(0.01) == "0.01"
    assert fmt_float(1e22) == "1e22"


def test_any_arity_error():
    from daisy_spark.plans.dialect import DialectError

    with pytest.raises(DialectError):
        explain_syntax("SELECT any(1, 2)")


def test_unsupported_raises_chexplain_error():
    with pytest.raises(ChExplainError):
        explain_syntax("INSERT INTO t VALUES (1)")
