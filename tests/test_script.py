"""plans.script: multi-statement DDL/INSERT/SELECT script execution.

Mirrors the reference's stateless-test shape (CREATE ... ENGINE; INSERT;
SELECT) — the same statement layer tests/queries/0_stateless/*.sql files
exercise (e.g. 00043_summing_empty_part.sql, 00084_summing_merge_tree.sql,
00253_insert_recursive_defaults.sql).
"""

import pytest

from daisy_spark.plans.script import ScriptRunner, split_statements


def rows(df):
    return [tuple(r) for r in df.collect()]


@pytest.fixture()
def runner(spark):
    r = ScriptRunner(spark)
    yield r
    r.close()


def test_split_statements_respects_strings_and_comments():
    text = (
        "SELECT 'a;b';  -- trailing; comment\n"
        "/* block; comment */ SELECT 2;\n"
        "-- only a comment\n"
        "SELECT ';'"
    )
    stmts = split_statements(text)
    assert len(stmts) == 3
    assert stmts[0].startswith("SELECT 'a;b'")
    # leading comment lines stay attached (the tokenizer drops them)
    assert stmts[2].endswith("SELECT ';'")


def test_create_insert_select_roundtrip(runner):
    runner.execute(
        "CREATE TABLE t1 (a UInt32, b String, c Nullable(Float64)) "
        "ENGINE = MergeTree ORDER BY a"
    )
    runner.execute("INSERT INTO t1 VALUES (3, 'three', 3.5), (1, 'one', NULL)")
    runner.execute("INSERT INTO t1 (a) VALUES (2)")
    # per-part read order: each insert is one part sorted by the key
    assert rows(runner.execute("SELECT a FROM t1")) == [(1,), (3,), (2,)]
    # missing columns take type defaults ('' for String, NULL for Nullable)
    assert rows(runner.execute("SELECT b, c FROM t1 WHERE a = 2")) == [("", None)]


def test_values_tuples_without_commas(runner):
    runner.execute("CREATE TABLE jux (x UInt8) ENGINE = Memory")
    runner.execute("INSERT INTO jux VALUES (1) (2), (3) (4)")
    assert rows(runner.execute("SELECT count() AS c FROM jux")) == [(4,)]


def test_replacing_final_and_optimize(runner):
    runner.execute(
        "CREATE TABLE r1 (k UInt8, v UInt32, ver UInt8) "
        "ENGINE = ReplacingMergeTree(ver) ORDER BY k"
    )
    runner.execute("INSERT INTO r1 VALUES (1, 10, 1), (1, 20, 2), (2, 5, 1)")
    assert rows(runner.execute("SELECT * FROM r1 FINAL ORDER BY k")) == [
        (1, 20, 2), (2, 5, 1),
    ]
    runner.execute("OPTIMIZE TABLE r1 FINAL")
    assert rows(runner.execute("SELECT count() AS c FROM r1")) == [(2,)]


def test_summing_drops_all_zero_rows(runner):
    # 00043_summing_empty_part.sql semantics: a fully-cancelled key
    # disappears after merge (SummingSortedAlgorithm.cpp)
    runner.execute(
        "CREATE TABLE s1 (d Date, k UInt64, v Int8) "
        "ENGINE = SummingMergeTree(d, k, 8192)"  # legacy syntax: key = k
    )
    runner.execute("INSERT INTO s1 VALUES ('2015-01-01', 1, 10)")
    runner.execute("INSERT INTO s1 VALUES ('2015-01-01', 1, -10)")
    runner.execute("INSERT INTO s1 VALUES ('2015-01-01', 2, -9)")
    runner.execute("OPTIMIZE TABLE s1")
    assert rows(runner.execute("SELECT k, v FROM s1")) == [(2, -9)]


def test_legacy_engine_tuple_key(runner):
    runner.execute(
        "CREATE TABLE lg (d Date, x UInt32, s String) "
        "ENGINE = MergeTree(d, (x, d), 8192)"
    )
    runner.execute("INSERT INTO lg VALUES ('2020-01-01', 2, 'b'), ('2020-01-01', 1, 'a')")
    assert rows(runner.execute("SELECT x FROM lg")) == [(1,), (2,)]


def test_recursive_defaults_and_materialized_hidden(runner):
    # 00253_insert_recursive_defaults.sql shape: untyped DEFAULT columns
    # infer their type; MATERIALIZED/ALIAS columns are computed but
    # excluded from SELECT *
    runner.execute(
        "CREATE TABLE dflt (a UInt8, b DEFAULT 0, c DEFAULT identity(b), "
        "m UInt16 MATERIALIZED a * 2, al ALIAS m) ENGINE = Memory"
    )
    runner.execute("INSERT INTO dflt (a) VALUES (3)")
    assert rows(runner.execute("SELECT * FROM dflt")) == [(3, 0, 0)]
    assert rows(runner.execute("SELECT m, al FROM dflt")) == [(6, 6)]


def test_buffer_proxies_target(runner):
    runner.execute("CREATE TABLE tgt (x UInt32) ENGINE = Memory")
    runner.execute(
        "CREATE TABLE buf AS tgt ENGINE = "
        "Buffer(currentDatabase(), tgt, 16, 10, 100, 10000, 1000000, "
        "10000000, 100000000)"
    )
    runner.execute("INSERT INTO tgt VALUES (7)")
    runner.execute("INSERT INTO buf VALUES (8)")
    assert rows(runner.execute("SELECT x FROM buf ORDER BY x")) == [(7,), (8,)]
    assert rows(runner.execute("SELECT x FROM tgt ORDER BY x")) == [(7,), (8,)]
    runner.execute("DROP TABLE buf")
    assert rows(runner.execute("SELECT count() AS c FROM tgt")) == [(2,)]


def test_truncate_drop_exists(runner):
    runner.execute("CREATE TABLE td (x UInt8) ENGINE = Memory")
    runner.execute("INSERT INTO td VALUES (1)")
    runner.execute("TRUNCATE TABLE td")
    assert rows(runner.execute("SELECT count() AS c FROM td")) == [(0,)]
    assert rows(runner.execute("EXISTS TABLE td")) == [(1,)]
    runner.execute("DROP TABLE td")
    assert rows(runner.execute("EXISTS TABLE td")) == [(0,)]


def test_insert_select_and_create_as_select(runner):
    runner.execute(
        "CREATE TABLE src (n UInt32) ENGINE = Memory AS "
        "SELECT number AS n FROM numbers(5)"
    )
    runner.execute("CREATE TABLE dst (n UInt32, doubled UInt64 DEFAULT n * 2) ENGINE = Memory")
    runner.execute("INSERT INTO dst (n) SELECT n FROM src WHERE n >= 3")
    assert rows(runner.execute("SELECT n, doubled FROM dst ORDER BY n")) == [
        (3, 6), (4, 8),
    ]


def test_datetime_from_digit_string(runner):
    # reference parses '1234567890' inserted into DateTime as a unix
    # timestamp (00141_parse_timestamp_as_datetime.sql)
    runner.execute("CREATE TABLE ts (t DateTime) ENGINE = Memory")
    runner.execute("INSERT INTO ts VALUES ('1234567890')")
    assert rows(runner.execute("SELECT toUInt32(t) FROM ts")) == [(1234567890,)]


def test_alter_update_single_mutation_stage(runner):
    # All assignments of one UPDATE evaluate against pre-mutation values
    # (reference MutationsInterpreter.cpp:517: one column_to_updated map)
    runner.execute(
        "CREATE TABLE swp (a UInt32, b UInt32) ENGINE = MergeTree ORDER BY a"
    )
    runner.execute("INSERT INTO swp VALUES (1, 10), (2, 20)")
    runner.execute("ALTER TABLE swp UPDATE a = b, b = a WHERE 1")
    assert rows(runner.execute("SELECT a, b FROM swp ORDER BY a")) == [
        (10, 1), (20, 2),
    ]


def test_empty_set_agg_defaults_respect_declared_nullability(runner):
    # sum/avg over an empty set: non-nullable input reads back 0 / nan;
    # a declared Nullable column keeps NULL even as a bare reference
    # (reference AggregateFunctionNull wrapping — the guard must consult
    # the schema, not just the expression text)
    runner.execute(
        "CREATE TABLE esd (a UInt32, b Nullable(Int64)) ENGINE = Memory"
    )
    got = rows(runner.execute("SELECT sum(a), sum(b), avg(b) FROM esd"))
    assert len(got) == 1
    s_a, s_b, a_b = got[0]
    assert s_a == 0
    assert s_b is None
    assert a_b is None


def test_summing_map_merge_integer_width(runner):
    # nested-*Map values sum in native integer width, not DOUBLE —
    # 2^53+1 must survive exactly (SummingSortedAlgorithm.cpp sums
    # integrals without a float detour)
    big = (1 << 53) + 1
    runner.execute(
        "CREATE TABLE smw (k UInt8, vMap Nested(id UInt16, val Int64)) "
        "ENGINE = SummingMergeTree ORDER BY k"
    )
    runner.execute(f"INSERT INTO smw VALUES (1, [7], [{big}])")
    runner.execute("INSERT INTO smw VALUES (1, [7], [1])")
    got = rows(runner.execute("SELECT `vMap.val` FROM smw FINAL"))
    assert got == [([big + 1],)]


def test_index_hint_census_early_out_on_big_table(runner):
    # the granule census must count BEFORE materializing: past the
    # 4096-granule cap no global row_number() window or driver-side
    # collect may run — the predicate degrades to full-scan (None)
    # without touching the census query (plans/script.py
    # _index_hint_pred; src/Functions/indexHint.cpp KeyCondition
    # degrade path)
    runner.execute(
        "CREATE TABLE ih_big (x UInt32) ENGINE = MergeTree ORDER BY x "
        "SETTINGS index_granularity = 1"
    )
    runner.execute(
        "INSERT INTO ih_big SELECT number FROM numbers(4097)"
    )
    calls = []
    orig = runner.spark.sql

    def spy(q, *a, **kw):
        calls.append(q)
        return orig(q, *a, **kw)

    runner.spark.sql = spy
    try:
        assert runner._index_hint_pred("ih_big", ["x", "=", "5"]) is None
    finally:
        runner.spark.sql = orig
    # only the bounding count ran — never the window census
    assert any("count(*)" in q for q in calls)
    assert not any("row_number" in q for q in calls)


def test_index_hint_census_still_prunes_small_table(runner):
    runner.execute(
        "CREATE TABLE ih_small (x UInt32) ENGINE = MergeTree ORDER BY x "
        "SETTINGS index_granularity = 8192"
    )
    runner.execute(
        "INSERT INTO ih_small SELECT number FROM numbers(100)"
    )
    pred = runner._index_hint_pred("ih_small", ["x", "=", "5"])
    assert pred is not None


def test_totals_under_join_blocks(runner):
    # 00150: the joined subqueries' totals rows run through the same
    # join; a totals-less side contributes a defaults row
    # (TotalsHavingStep.cpp + HashJoin joinTotals)
    runner.settings["joined_subquery_requires_alias"] = "0"
    df = runner.execute(
        "SELECT k, s1, s2 FROM (SELECT intDiv(number, 3) AS k, "
        "sum(number) AS s1 FROM (SELECT * FROM system.numbers LIMIT 10) "
        "GROUP BY k WITH TOTALS) ANY LEFT JOIN (SELECT intDiv(number, 4) "
        "AS k, sum(number) AS s2 FROM (SELECT * FROM system.numbers "
        "LIMIT 10) GROUP BY k) USING k ORDER BY k"
    )
    assert [tuple(r) for r in df.collect()] == [
        (0, 3, 6), (1, 12, 22), (2, 21, 17), (3, 9, 0),
    ]
    assert df._daisy_totals == [(0, 45, 0)]
