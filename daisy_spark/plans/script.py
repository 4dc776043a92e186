"""Multi-statement reference-SQL script execution (DDL + DML + SELECT).

The reference's stateless test files are scripts: ``DROP TABLE IF
EXISTS t; CREATE TABLE t (...) ENGINE = MergeTree ORDER BY k; INSERT
INTO t VALUES (...); SELECT ... FROM t;``.  The SELECT translator
(``plans.dialect``) covers only the query half; this module adds the
statement layer so whole scripts run on Spark:

- ``CREATE TABLE`` (reference syntax: src/Parsers/ParserCreateQuery.cpp)
  -> an in-session table backed by a DataFrame and registered as a temp
  view (plus a ``<name>__final`` companion view carrying the engine's
  merge-on-read semantics, which ``FROM t FINAL`` lowers to).
- ``INSERT INTO ... VALUES / SELECT`` -> a DataFrame batch, cast to the
  declared column types, appended by union.  MergeTree-family batches
  are sorted by the table's ORDER BY key inside a single partition --
  mirroring the reference where every insert forms one part sorted by
  primary key and single-threaded reads return parts in insertion
  order (src/Storages/MergeTree/MergeTreeDataWriter.cpp).
- ``OPTIMIZE TABLE ... FINAL`` -> materializes the engine merge into
  the stored DataFrame (the read-time equivalent of a forced merge).
- ``TRUNCATE`` / ``DROP TABLE`` / ``EXISTS TABLE`` / ``SET``.

Scripts drive *test-scale* data (inline VALUES); bulk data flows through
``catalog``/``sources``.  Everything stays declarative DataFrame ops, so
a CREATE+INSERT+SELECT script on a real cluster still gets Catalyst
planning end-to-end -- nothing here collects rows to the driver.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from daisy_spark.catalog import TableSpec
from daisy_spark.chsyntax import ch_expr, ch_type_canon, strip_outer_parens
from daisy_spark.operators.final import read_final
from daisy_spark.plans.dialect import (
    DialectError,
    _SQL_KEYWORDS,
    _emit,
    _is_ident,
    _kw,
    _map_type,
    _match_paren,
    _paren_depth_at,
    _split_top,
    _translate_expr,
    sql as dialect_sql,
    tokenize,
)

__all__ = ["ScriptRunner", "split_statements", "split_statements_tagged"]


def split_statements(text: str) -> list[str]:
    """Split raw script text on top-level ``;`` respecting string
    literals, quoted identifiers, and both comment styles."""
    stmts: list[str] = []
    buf: list[str] = []
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if ch == "-" and text[i : i + 2] == "--":
            j = text.find("\n", i)
            j = n if j < 0 else j
            buf.append(text[i:j])
            i = j
            continue
        if ch == "/" and text[i : i + 2] == "/*":
            j = text.find("*/", i + 2)
            j = n if j < 0 else j + 2
            buf.append(text[i:j])
            i = j
            continue
        if ch in ("'", "`", '"'):
            j = i + 1
            while j < n:
                if text[j] == "\\" and ch != "`":
                    j += 2
                    continue
                if text[j] == ch:
                    if ch == "'" and text[j : j + 2] == "''":
                        j += 2
                        continue
                    j += 1
                    break
                j += 1
            buf.append(text[i:j])
            i = j
            continue
        if ch == ";":
            stmts.append("".join(buf))
            buf = []
            i += 1
            continue
        buf.append(ch)
        i += 1
    stmts.append("".join(buf))
    out = []
    for s in stmts:
        body = "\n".join(
            ln for ln in s.splitlines() if not ln.strip().startswith("--")
        ).strip()
        if body:
            out.append(s.strip())
    return out


_ERR_TAG_RE = re.compile(r"\{\s*(?:serverError|clientError)\b")


def split_statements_tagged(text: str) -> list[tuple[str, bool]]:
    """Like :func:`split_statements`, but pairs each statement with
    whether the reference test expects it to ERROR: a trailing
    ``-- { serverError N }`` / ``{ clientError N }`` comment on the
    statement's closing semicolon (clickhouse-test convention — the tag
    physically lands at the head of the NEXT raw chunk after the split,
    or in a trailing comment-only chunk for the last statement)."""
    raw: list[str] = []
    buf: list[str] = []
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if ch == "-" and text[i : i + 2] == "--":
            j = text.find("\n", i)
            j = n if j < 0 else j
            buf.append(text[i:j])
            i = j
            continue
        if ch == "/" and text[i : i + 2] == "/*":
            j = text.find("*/", i + 2)
            j = n if j < 0 else j + 2
            buf.append(text[i:j])
            i = j
            continue
        if ch in ("'", "`", '"'):
            j = i + 1
            while j < n:
                if text[j] == "\\" and ch != "`":
                    j += 2
                    continue
                if text[j] == ch:
                    if ch == "'" and text[j : j + 2] == "''":
                        j += 2
                        continue
                    j += 1
                    break
                j += 1
            buf.append(text[i:j])
            i = j
            continue
        if ch == ";":
            raw.append("".join(buf))
            buf = []
            i += 1
            continue
        buf.append(ch)
        i += 1
    raw.append("".join(buf))

    def _body(s: str) -> str:
        return "\n".join(
            ln for ln in s.splitlines() if not ln.strip().startswith("--")
        ).strip()

    def _leading_tag(s: str) -> bool:
        # tag in the comment line(s) BEFORE any SQL content
        for ln in s.lstrip().splitlines():
            t = ln.strip()
            if not t.startswith("--"):
                break
            if _ERR_TAG_RE.search(t):
                return True
        return True if not _body(s) and _ERR_TAG_RE.search(s) else False

    def _trailing_tag(s: str) -> bool:
        # a semicolon-less final statement carries its tag on its own
        # last line ("SELECT ceil(1, -54212) --{serverError 69}")
        for ln in reversed(s.rstrip().splitlines()):
            t = ln.strip()
            if not t:
                continue
            if "--" in t and _ERR_TAG_RE.search(t[t.index("--") :]):
                return True
            break
        return False

    out: list[tuple[str, bool]] = []
    for k, s in enumerate(raw):
        if not _body(s):
            continue
        expect_err = (
            k + 1 < len(raw) and _leading_tag(raw[k + 1])
        ) or _trailing_tag(s)
        out.append((s.strip(), expect_err))
    return out


# -- type defaults (reference semantics: missing INSERT columns get the
#    type's zero value; DataTypes/*::getDefault) --------------------------

_DIGIT_STR = re.compile(r"^'\d+'$")


def _cast_sql(val: str, spark_type: str) -> str:
    """CH-compatible cast of a translated value expression: an all-digit
    string inserted into DateTime is a unix timestamp (the reference's
    parseDateTime accepts numeric strings); an integer into Date is
    days-since-epoch mod 2^16 (Date IS a UInt16 day number), an integer
    into DateTime is unix seconds (FunctionsConversion.h)."""
    up = spark_type.upper()
    if up == "TIMESTAMP" and _DIGIT_STR.match(val.strip()):
        return f"timestamp_seconds({val.strip()[1:-1]})"
    m_int = re.fullmatch(r"[(\s]*(-?\d+)[)\s]*", val)
    if m_int:
        if up == "DATE":
            return (
                f"DATE_ADD(DATE '1970-01-01', {int(m_int.group(1)) % 65536})"
            )
        if up == "TIMESTAMP":
            return f"timestamp_seconds({m_int.group(1)})"
    return f"CAST(({val}) AS {spark_type})"


def _type_default(spark_type: str, nullable: bool) -> str:
    if nullable:
        return "NULL"
    t = spark_type.upper()
    if t.startswith("ARRAY"):
        return "ARRAY()"
    if t in ("STRING",):
        return "''"
    if t == "DATE":
        return "DATE '1970-01-01'"
    if t == "TIMESTAMP":
        return "TIMESTAMP '1970-01-01 00:00:00'"
    if t == "BOOLEAN":
        return "FALSE"
    if t.startswith("MAP"):
        return "MAP()"
    if t.startswith("STRUCT<S: DOUBLE, C: BIGINT>"):
        # empty avg state (sum, count): contributes nothing to a merge
        return (
            "named_struct('s', CAST(0 AS DOUBLE), 'c', CAST(0 AS BIGINT))"
        )
    return "0"


def _render_index_defs(span: list[str]) -> list[str]:
    """Canonical `INDEX name expr TYPE kind GRANULARITY n` strings from
    a CREATE column-definition span (skipping index expr outer parens,
    like the reference's AST rendering)."""
    out: list[str] = []
    for part in _split_top(span, ","):
        if not part or _kw(part[0]) != "INDEX":
            continue
        nm = part[1].strip('`"')
        tpos = next(
            (
                k for k in range(2, len(part))
                if _kw(part[k]) == "TYPE"
                and _paren_depth_at(part, k) == 0
            ),
            len(part),
        )
        expr = ch_expr(strip_outer_parens(part[2:tpos]))
        tail = ch_expr(part[tpos:])
        out.append(f"INDEX {nm} {expr} {tail}".rstrip())
    return out


def _render_compact(toks: list[str]) -> str:
    """Reference-style expression text: no space around parens/commas
    (DESCRIBE shows the original expression, not the translation)."""
    out = []
    for t in toks:
        if t in (")", ",") or (out and out[-1].endswith("(")):
            out[-1] = out[-1] + t if out else t
        elif t == "(" and out and (out[-1][-1:].isalnum() or out[-1][-1:] in ")_"):
            out[-1] += t
        else:
            out.append(t)
    return " ".join(out)


@dataclass
class _Col:
    name: str
    spark_type: str
    ch_type: str  # original reference type text (DESCRIBE fidelity)
    nullable: bool = False
    default: str | None = None  # translated Spark SQL expression
    default_raw: str | None = None  # original reference expression text
    # MATERIALIZED/ALIAS columns: stored (computed at insert -- data is
    # immutable afterwards, so insert-time == read-time) but excluded
    # from SELECT * like the reference's non-physical columns
    hidden: bool = False
    # ALTER ADD COLUMN doesn't materialize data for existing parts: the
    # column reads as the CURRENT type's default until an insert writes
    # it — a later MODIFY re-defaults instead of casting
    virtual_default: bool = False
    default_kind: str = "DEFAULT"
    ttl_raw: str = ""  # column TTL expression (SHOW CREATE fidelity)


@dataclass
class _Table:
    name: str
    cols: list[_Col]
    spec: TableSpec
    sort_keys: list[str] = field(default_factory=list)
    df: DataFrame | None = None
    aka: list[str] = field(default_factory=list)  # Buffer proxy names
    #: Distributed proxy names whose cluster has N>1 (local) shards:
    #: reads through the name see the target's rows N times
    #: (programs/server/config.xml remote_servers
    #: test_cluster_two_shards_localhost — both shards are localhost,
    #: so a distributed read unions the same local table twice)
    shard_views: dict[str, int] = field(default_factory=dict)
    sample_by: str = ""  # SAMPLE BY key expression (translated)
    partition_by: str = ""  # PARTITION BY expression (translated)
    merge_pattern: str = ""  # ENGINE = Merge(db, 'regex') member regex
    # MergeTree part bookkeeping (names only — data lives in df).  One
    # part per (insert, partition); OPTIMIZE merges a partition's parts.
    # Part naming mirrors the reference: {partition}_{min}_{max}_{level}
    # with block numbers from 1 (Replicated* allocates from 0).
    parts: list[tuple[str, int, int, int]] = field(default_factory=list)
    #: SORT-FREE twin of ``df`` for the __final view: per-key FINAL
    #: outcomes depend only on the RELATIVE order of same-key rows,
    #: which the stable per-insert primary-key sort preserves — so the
    #: FINAL read may skip that single-partition sort entirely (each
    #: insert contributes coalesce(1) in insertion order).  Valid only
    #: while ``df_final_src_of is df`` (object identity): any mutation
    #: path that rebinds ``df`` (ALTER/OPTIMIZE/DELETE/...) silently
    #: invalidates the twin and the __final view falls back to ``df``.
    df_final_src: DataFrame | None = None
    df_final_src_of: DataFrame | None = None
    next_block: int = 1
    # SHOW CREATE fidelity: clause texts in canonical reference spelling
    order_by_raw: str = ""
    partition_by_raw: str = ""
    sample_by_raw: str = ""
    ttl_raw: str = ""
    settings_raw: str = ""
    engine_raw: str = ""  # e.g. "MergeTree", "Memory", "Join(ANY, LEFT, k)"
    indices: list[str] = field(default_factory=list)  # rendered INDEX defs
    #: CONSTRAINT CHECK expressions (raw dialect tokens), validated on
    #: every INSERT block (src/Storages/ConstraintsDescription, err 469)
    constraints: list[list[str]] = field(default_factory=list)
    as_tf_raw: str = ""  # CREATE TABLE t AS numbers(5)
    view_select_raw: str = ""  # CREATE VIEW body, canonical


_ENGINE_KIND = {
    "MERGETREE": "MergeTree",
    "REPLACINGMERGETREE": "Replacing",
    "SUMMINGMERGETREE": "Summing",
    "AGGREGATINGMERGETREE": "Aggregating",
    "COLLAPSINGMERGETREE": "Collapsing",
    "VERSIONEDCOLLAPSINGMERGETREE": "VersionedCollapsing",
    "MEMORY": "Memory",
    "LOG": "Memory",
    "TINYLOG": "Memory",
    "STRIPELOG": "Memory",
    "NULL": "Null",
    "BUFFER": "Buffer",
    "JOIN": "Join",
    # Distributed(cluster, db, table[, key]) has no cluster here — reads
    # and writes proxy to the (single) local shard table, which is the
    # exact single-node behavior of the reference
    "DISTRIBUTED": "Distributed",
    "SET": "Memory",
    "MERGE": "Memory",
}

#: SHOW CREATE engine display names (canonical reference casing)
_ENGINE_DISPLAY = {
    "MERGETREE": "MergeTree", "REPLACINGMERGETREE": "ReplacingMergeTree",
    "SUMMINGMERGETREE": "SummingMergeTree",
    "AGGREGATINGMERGETREE": "AggregatingMergeTree",
    "COLLAPSINGMERGETREE": "CollapsingMergeTree",
    "VERSIONEDCOLLAPSINGMERGETREE": "VersionedCollapsingMergeTree",
    "MEMORY": "Memory", "LOG": "Log", "TINYLOG": "TinyLog",
    "STRIPELOG": "StripeLog", "NULL": "Null", "BUFFER": "Buffer",
    "JOIN": "Join", "DISTRIBUTED": "Distributed", "SET": "Set",
    "MERGE": "Merge",
}

_CLAUSE_KW = {
    "ORDER", "PRIMARY", "PARTITION", "SAMPLE", "SETTINGS", "TTL",
    "COMMENT", "AS",
}


class ScriptRunner:
    """Execute a reference-dialect SQL script statement by statement.

    ``execute`` returns a DataFrame for row-producing statements
    (SELECT / EXISTS / DESCRIBE) and ``None`` for DDL/DML.
    """

    def __init__(self, spark: SparkSession):
        self.spark = spark
        # exact-hash / geo UDFs for dynamic args (functions/chhash.py,
        # functions/chgeo.py; idempotent per session)
        from daisy_spark.functions.chcoding import (
            register_udfs as _coding_udfs,
        )
        from daisy_spark.functions.chgeo import register_udfs as _geo_udfs
        from daisy_spark.functions.chweek import register_udfs as _week_udfs
        from daisy_spark.functions.chh3 import register_udfs as _h3_udfs
        from daisy_spark.functions.chhash import register_udfs
        from daisy_spark.functions.chpoly import register_udfs as _poly_udfs
        from daisy_spark.functions.chstats import register_udfs as _stats_udfs
        from daisy_spark.functions.chtext import register_udfs as _text_udfs
        _text_udfs(spark)
        _stats_udfs(spark)
        _coding_udfs(spark)

        register_udfs(spark)
        _geo_udfs(spark)
        _h3_udfs(spark)
        _week_udfs(spark)
        _poly_udfs(spark)
        self.tables: dict[str, _Table] = {}
        #: LIVE VIEW registry: name -> {toks, version, last} — evaluated
        #: lazily on read; version counts distinct-result evaluations
        #: (src/Storages/LiveView/StorageLiveView.cpp semantics)
        self.live_views: dict[str, dict] = {}
        #: MATERIALIZED VIEW registry: name -> {toks, srcs, storage}
        self.mat_views: dict[str, dict] = {}
        #: known database namespaces; `db.table` flattens to `table`
        self.databases: set[str] = {"default", "test", "system"}
        #: per-runner StorageJoin registry (ENGINE = Join key/default
        #: layouts for joinGet); activated around each execute() so two
        #: runners on one interpreter never share or clobber state
        self.storage_join_meta: dict[str, dict] = {}
        #: CREATE DICTIONARY registry: name -> dialect _DICTS_CTX meta
        self.dictionaries: dict[str, dict] = {}
        #: SET statement state (join_use_nulls etc.) — published to the
        #: dialect during execute()
        self.settings: dict[str, str] = {}
        #: DataFrames persisted by _sorted_batch (one per materialized
        #: part); released in close() so corpus runs don't accumulate
        #: blocks across ~1200 cases in one JVM
        self._persisted: list[DataFrame] = []
        # the reference wraps on overflow, nulls on bad casts, and yields
        # defaults/NULL on out-of-range subscripts — Spark's non-ANSI
        # mode is the matching behavior set.  Session-scoped for the
        # runner's lifetime (plans analyze lazily, after execute()
        # returns); close() restores the previous value.
        self._prev_ansi = spark.conf.get("spark.sql.ansi.enabled", "true")
        spark.conf.set("spark.sql.ansi.enabled", "false")
        # the reference has no positional GROUP BY — `GROUP BY 1` groups
        # by the CONSTANT 1 (enable_positional_arguments is off in this
        # snapshot); Spark's ordinal interpretation must be disabled
        self._prev_gbo = spark.conf.get("spark.sql.groupByOrdinal", "true")
        spark.conf.set("spark.sql.groupByOrdinal", "false")
        # AQE stays ON: with it off, unordered GROUP BY / join output
        # arrives in raw shuffle-partition order, which does NOT match
        # the reference's hash-table iteration order on a dozen corpus
        # files (r5 regressed 10 of them); with AQE's partition coalesce
        # the order matches.  The RIGHT-USING dedup instability that
        # motivated turning it off in r5 (NULLS LAST placement flipping
        # between runs) is instead pinned by the explicit NULLS LAST
        # ordering the __jord stream-order wrapper now carries.
        self._prev_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        # ...but OptimizeOneRowPlan misfires during AQE RE-optimization:
        # once a join input materializes as a LogicalQueryStage, the rule
        # deletes a top-level global Sort outright (observed on 00445:
        # RIGHT JOIN over a LIMIT..OFFSET stage + ORDER BY — first run
        # sorted, every later run unsorted).  The static-optimizer copy
        # of the rule is fine; only the adaptive re-run is excluded.
        # Append to (not clobber) any caller-set exclusions; close()
        # restores the prior value alongside ansi/groupByOrdinal.
        _ONE_ROW = "org.apache.spark.sql.catalyst.optimizer.OptimizeOneRowPlan"
        self._prev_excl = spark.conf.get(
            "spark.sql.adaptive.optimizer.excludedRules", ""
        ) or ""
        rules = [r for r in self._prev_excl.split(",") if r.strip()]
        if _ONE_ROW not in rules:
            rules.append(_ONE_ROW)
        spark.conf.set(
            "spark.sql.adaptive.optimizer.excludedRules", ",".join(rules)
        )

    # -- public ----------------------------------------------------------

    def run_script(self, text: str) -> list[DataFrame]:
        outs = []
        for stmt in split_statements(text):
            df = self.execute(stmt)
            if df is not None:
                outs.append(df)
        return outs

    def execute(self, stmt: str) -> DataFrame | None:
        from daisy_spark.plans.dialect import (
            _DICTS_CTX,
            _SCRIPT_SCHEMAS_CTX,
            _SETTINGS_CTX,
            _STORAGE_JOIN_CTX,
        )

        from daisy_spark.plans.dialect import _SAMPLE_BY_CTX, _TOTALS_BLOCK_CTX

        sample_map = {
            name: t.sample_by
            for name, t in self.tables.items() if t.sample_by
        }
        for name, t in self.tables.items():
            if t.merge_pattern and name not in sample_map:
                # Merge tables inherit the members' sampling key
                member = next(
                    (
                        m for m, mt in self.tables.items()
                        if mt.sample_by and re.fullmatch(
                            t.merge_pattern, m
                        )
                    ),
                    None,
                )
                if member:
                    sample_map[name] = self.tables[member].sample_by
        token6 = _SAMPLE_BY_CTX.set(sample_map)
        token5 = _TOTALS_BLOCK_CTX.set(True)
        token4 = _SETTINGS_CTX.set(self.settings)
        token3 = _DICTS_CTX.set(self.dictionaries)
        token = _STORAGE_JOIN_CTX.set(self.storage_join_meta)
        schemas = {
            name: [
                (c.name, c.spark_type, _type_default(c.spark_type, c.nullable))
                for c in t.cols
            ]
            for name, t in self.tables.items()
        }
        token2 = _SCRIPT_SCHEMAS_CTX.set(schemas)
        from daisy_spark.plans.dialect import _DIST_LOCAL_CTX

        dist_local = {
            dname: t.name
            for t in self.tables.values()
            for dname in t.shard_views
        }
        token9 = _DIST_LOCAL_CTX.set(dist_local)
        from daisy_spark.plans.dialect import _SCRIPT_CHTYPES_CTX

        chtypes = {}
        chtypes_by_table: dict = {}
        for name, t in self.tables.items():
            per = {}
            for c in t.cols:
                if c.ch_type and not c.ch_type.islower():
                    # declared reference type (skip raw Spark fallbacks,
                    # which are all-lowercase simpleStrings)
                    per[c.name] = ch_type_canon(c.ch_type)
            chtypes.update(per)
            if per:
                chtypes_by_table[name] = per
        token8 = _SCRIPT_CHTYPES_CTX.set(chtypes)
        from daisy_spark.plans.dialect import _SCRIPT_CHTYPES_BY_TABLE_CTX

        token8b = _SCRIPT_CHTYPES_BY_TABLE_CTX.set(chtypes_by_table)
        from daisy_spark.plans.dialect import _AGG_COLS_CTX
        agg_cols: dict = {}
        for t in self.tables.values():
            for c in t.cols:
                m = re.match(
                    r"(?i)AggregateFunction\s*\(\s*(\w+)\s*(\([^)]*\))?",
                    c.ch_type or "",
                )
                if m:
                    agg_cols[c.name] = (m.group(1), m.group(2) or "")
        token7 = _AGG_COLS_CTX.set(agg_cols)
        try:
            # PARAMETER_OUT_OF_BOUND (reference error 12): a zero block
            # size fails every read at pipeline setup.  Must reject HERE
            # — 00694 pairs it with an unbounded system.numbers scan
            # that would otherwise collect the 1e9-row lazy range and
            # kill the JVM for the whole shared test session.
            if str(self.settings.get("max_block_size", "")).strip(
                "'\" "
            ) == "0" and not re.match(r"(?i)\s*SET\b", stmt):
                raise DialectError("max_block_size must be positive")
            return self._execute(stmt)
        finally:
            _AGG_COLS_CTX.reset(token7)
            _DIST_LOCAL_CTX.reset(token9)
            _SCRIPT_CHTYPES_BY_TABLE_CTX.reset(token8b)
            _SCRIPT_CHTYPES_CTX.reset(token8)
            _SCRIPT_SCHEMAS_CTX.reset(token2)
            _STORAGE_JOIN_CTX.reset(token)
            _DICTS_CTX.reset(token3)
            _SETTINGS_CTX.reset(token4)
            _TOTALS_BLOCK_CTX.reset(token5)
            _SAMPLE_BY_CTX.reset(token6)

    def _execute(self, stmt: str) -> DataFrame | None:
        toks = tokenize(stmt.strip().rstrip(";"))
        if not toks:
            return None
        # trailing FORMAT TSV / TabSeparated is the default rendering —
        # strip it; FORMAT Null runs the statement but discards its rows
        # (any other format name keeps erroring honestly)
        discard = False
        if len(toks) >= 2 and _kw(toks[-2]) == "FORMAT":
            if toks[-1] in ("TSV", "TabSeparated"):
                toks = toks[:-2]
            elif toks[-1] == "Null":
                toks = toks[:-2]
                discard = True
            if not toks:
                return None
        if discard:
            self._execute_core(_emit(toks))
            return None
        return self._execute_core(_emit(toks))

    def _explain_schemas(self) -> dict:
        schemas = {}
        for nm, t in self.tables.items():
            sk = []
            for k in t.sort_keys or []:
                kt = k.replace("`", "").strip()
                if re.fullmatch(r"[A-Za-z_][A-Za-z_0-9]*", kt):
                    sk.append(kt)
            schemas[nm] = {
                "cols": [c.name for c in t.cols if not c.hidden],
                "sorting_key": sk,
                "sorting_key_raw": t.order_by_raw or "",
                "mergetree": "MERGETREE"
                in (t.engine_raw or "").upper().replace(" ", ""),
                "view": t.view_select_raw or "",
            }
        return schemas

    def _explain_syntax(self, toks: list[str]) -> DataFrame | None:
        """EXPLAIN SYNTAX: the reference prints the TreeRewriter-
        normalized query in the canonical formatted-AST rendering
        (src/Parsers/IAST.h formatImpl family), one output row per
        line.  Falls back (None) outside chexplain's supported
        subset so the legacy translation dump still shows."""
        from daisy_spark.chexplain import ChExplainError, explain_syntax

        try:
            text = explain_syntax(
                _emit(toks), self._explain_schemas(), self.settings
            )
        except ChExplainError:
            return None
        return self.spark.createDataFrame(
            [(ln,) for ln in text.split("\n")], "explain STRING"
        )

    def _explain_plan(self, toks: list[str]) -> DataFrame | None:
        """EXPLAIN [PLAN]: query-plan step rendering
        (src/Processors/QueryPlan/QueryPlan.cpp explainPlan).  Falls
        back (None) outside chexplain's supported subset."""
        from daisy_spark.chexplain import ChExplainError, explain_plan

        try:
            text = explain_plan(
                _emit(toks), self._explain_schemas(), self.settings
            )
        except ChExplainError:
            return None
        return self.spark.createDataFrame(
            [(ln,) for ln in text.split("\n")], "explain STRING"
        )

    def _execute_core(self, stmt: str) -> DataFrame | None:
        toks = tokenize(stmt.strip().rstrip(";"))
        if not toks:
            return None
        head = _kw(toks[0])
        toks = self._strip_db_quals(toks)
        stmt = _emit(toks)
        if head in ("SELECT", "WITH", "EXPLAIN") or toks[0] == "(":
            if head == "EXPLAIN" and len(toks) > 1:
                k1 = _kw(toks[1])
                df9 = None
                if k1 == "SYNTAX":
                    df9 = self._explain_syntax(toks[2:])
                elif k1 == "PLAN":
                    df9 = self._explain_plan(toks[2:])
                elif k1 in ("SELECT", "WITH") or toks[1] == "(":
                    # bare EXPLAIN defaults to the PLAN kind
                    # (ASTExplainQuery.h QueryPlan)
                    df9 = self._explain_plan(toks[1:])
                if df9 is not None:
                    return df9
            if self.live_views:
                toks = self._resolve_live_views(toks)
                stmt = _emit(toks)
            if any(_kw(tk) == "INDEXHINT" for tk in toks):
                toks = self._rewrite_index_hint(toks)
                stmt = _emit(toks)
            # SELECT * FROM (sub WITH TOTALS): the totals block
            # propagates through a transparent projection
            # (TotalsHavingStep sits below the outer plan, 00152) —
            # equivalent to running the subquery directly
            if (
                len(toks) > 5
                and _kw(toks[0]) == "SELECT" and toks[1] == "*"
                and _kw(toks[2]) == "FROM" and toks[3] == "("
                and _match_paren(toks, 3) == len(toks) - 1
            ):
                sub9 = toks[4:-1]
                if any(
                    _kw(x) == "TOTALS" and _paren_depth_at(sub9, k) == 0
                    for k, x in enumerate(sub9)
                ):
                    toks = sub9
                    stmt = _emit(toks)
            df150 = self._totals_under_join(toks)
            if df150 is not None:
                return df150
            if str(self.settings.get(
                "force_primary_key", "0"
            )).strip("'\" ") == "1":
                # SET force_primary_key: reject selects whose WHERE
                # doesn't constrain the table's primary key (error 277)
                for j9, tk9 in enumerate(toks):
                    if _kw(tk9) != "FROM" or j9 + 1 >= len(toks):
                        continue
                    t9f = self.tables.get(toks[j9 + 1].strip('`"'))
                    if t9f is None or not t9f.sort_keys:
                        continue
                    w9 = next(
                        (
                            k for k, x in enumerate(toks)
                            if _kw(x) in ("WHERE", "PREWHERE")
                        ),
                        None,
                    )
                    pk9 = {k.strip('`" ') for k in t9f.sort_keys}
                    # an ALIAS column defined over a primary-key column
                    # constrains the key too (01835)
                    for c9f in t9f.cols:
                        if (
                            getattr(c9f, "default_kind", "") == "ALIAS"
                            and any(
                                p9 in (c9f.default_raw or "")
                                for p9 in pk9
                            )
                        ):
                            pk9.add(c9f.name)
                    if w9 is None or not any(
                        x.strip('`"') in pk9 for x in toks[w9:]
                    ):
                        raise DialectError(
                            "Primary key is not used and setting "
                            "force_primary_key is set (277)"
                        )
            merge_tables = {
                nm: t.merge_pattern
                for nm, t in self.tables.items() if t.merge_pattern
            }
            if merge_tables and any(
                tk.strip('`"') in merge_tables for tk in toks
            ):
                # ENGINE=Merge tables read as the merge() TVF union
                # (adds the _table virtual column per branch)
                out_t: list[str] = []
                for j3, tk in enumerate(toks):
                    nm = tk.strip('`"')
                    prev3 = toks[j3 - 1] if j3 else ""
                    if (
                        nm in merge_tables and prev3 != "."
                        and _kw(prev3) in ("FROM", "JOIN", ",")
                    ):
                        nxt3 = toks[j3 + 1] if j3 + 1 < len(toks) else ""
                        has_alias = _kw(nxt3) == "AS" or (
                            nxt3 and nxt3[0].isalpha()
                            and _kw(nxt3) not in _SQL_KEYWORDS
                        )
                        out_t += tokenize(
                            f"merge(currentDatabase(), "
                            f"'{merge_tables[nm]}')"
                            + ("" if has_alias else f" AS {nm}")
                        )
                    else:
                        out_t.append(tk)
                toks = out_t
                stmt = _emit(toks)
            # `_partition_value` (MergeTreeData.cpp virtuals): a tuple of
            # the table's partition-key expressions, computed per-row —
            # rewrite to an inline tuple so element access / comparisons
            # ride the existing tuple paths.  Tables without a partition
            # key have no such column (reference error 16, 01848).
            if any(tk.strip('`"') == "_partition_value" for tk in toks):
                t_pv = None
                for j3, tk in enumerate(toks):
                    if (
                        j3 > 0 and _kw(toks[j3 - 1]) in ("FROM", "JOIN")
                        and tk.strip('`"') in self.tables
                    ):
                        t_pv = self.tables[tk.strip('`"')]
                        break
                if t_pv is not None:
                    praw = (t_pv.partition_by_raw or "").strip()
                    if not praw or praw in ("tuple()", "tuple ( )"):
                        raise DialectError(
                            "There is no column _partition_value in "
                            f"table {t_pv.name} (error 16)"
                        )
                    inner = (
                        praw[1:-1]
                        if praw.startswith("(") and praw.endswith(")")
                        else praw
                    )
                    pk_elems = [
                        p for p in _split_top(tokenize(inner), ",") if p
                    ]
                    out9: list[str] = []
                    j3 = 0
                    while j3 < len(toks):
                        if toks[j3].strip('`"') != "_partition_value":
                            out9.append(toks[j3])
                            j3 += 1
                            continue
                        nxt = toks[j3 + 1] if j3 + 1 < len(toks) else ""
                        nxt2 = toks[j3 + 2] if j3 + 2 < len(toks) else ""
                        if nxt == "." and nxt2.isdigit():
                            # tupleElement access -> the N-th key expr
                            # (scalar comparisons then coerce normally)
                            idx = int(nxt2)
                            if not 1 <= idx <= len(pk_elems):
                                raise DialectError(
                                    "_partition_value tuple element "
                                    f"{idx} out of range (error 127)"
                                )
                            out9 += ["("] + pk_elems[idx - 1] + [")"]
                            j3 += 3
                            continue
                        if nxt == "=" and nxt2 == "(":
                            close9 = _match_paren(toks, j3 + 2)
                            lits = [
                                p for p in _split_top(
                                    toks[j3 + 3 : close9], ","
                                ) if p
                            ]
                            if len(lits) == len(pk_elems):
                                conj = []
                                for pe, le in zip(pk_elems, lits):
                                    if conj:
                                        conj.append("AND")
                                    conj += (
                                        ["(", "("] + pe + [")", "="]
                                        + ["("] + le + [")", ")"]
                                    )
                                out9 += ["("] + conj + [")"]
                                j3 = close9 + 1
                                continue
                        # bare reference: an inline tuple of the keys
                        out9 += ["("] + tokenize(f"tuple({inner})") + [")"]
                        j3 += 1
                    toks = out9
                    stmt = _emit(toks)
            # `_partition_id` (MergeTreeData.cpp virtuals) is the part
            # name's partition prefix — rewrite to a `_part` expression
            # so the companion-view routing below picks it up
            if any(tk == "_partition_id" for tk in toks):
                out9: list[str] = []
                for tk in toks:
                    if tk == "_partition_id":
                        out9 += tokenize(
                            "substr(_part, 1, position(_part, '_') - 1)"
                        )
                    else:
                        out9.append(tk)
                toks = out9
                stmt = _emit(toks)
            # `_part` / `_part_index` virtual columns
            # (MergeTreeData.cpp:4826-4827) live on the companion
            # __vparts view — route table references there when the
            # statement names a virtual
            if any(tk in ("_part", "_part_index") for tk in toks):
                out_v: list[str] = []
                routed_v: list[str] = []
                for j3, tk in enumerate(toks):
                    if (
                        tk.strip('`"') in self.tables
                        and j3 > 0
                        and _kw(toks[j3 - 1]) in ("FROM", "JOIN", ",")
                        and self.spark.catalog.tableExists(
                            tk.strip('`"') + "__vparts"
                        )
                    ):
                        nm_v = tk.strip('`"')
                        nxt_v = toks[j3 + 1] if j3 + 1 < len(toks) else ""
                        has_alias_v = _kw(nxt_v) == "AS" or (
                            nxt_v and nxt_v[0].isalpha()
                            and _kw(nxt_v) not in _SQL_KEYWORDS
                        )
                        out_v.append(nm_v + "__vparts")
                        routed_v.append(nm_v)
                        if not has_alias_v:
                            out_v += ["AS", nm_v]
                        continue
                    out_v.append(tk)
                toks = out_v
                # a bare * must not expand the virtuals the companion
                # view carries — expand to the declared columns
                if len(routed_v) == 1 and "*" in toks:
                    t_v = self.tables[routed_v[0]]
                    out_s: list[str] = []
                    for j3, tk in enumerate(toks):
                        prev_v = _kw(toks[j3 - 1]) if j3 else "SELECT"
                        if tk == "*" and prev_v in (
                            "SELECT", "DISTINCT", ",",
                        ):
                            out_s += tokenize(", ".join(
                                f"`{c.name}`" for c in t_v.cols
                                if not c.hidden
                            ))
                        else:
                            out_s.append(tk)
                    toks = out_s
                stmt = _emit(toks)
            return self._split_totals(
                dialect_sql(self.spark, self._rewrite_star(toks, stmt))
            )
        if head == "WATCH":
            return self._watch(toks)
        if head == "CREATE":
            return self._create(toks)
        if head == "INSERT":
            return self._insert(toks)
        if head == "DROP":
            return self._drop(toks)
        if head == "TRUNCATE":
            return self._truncate(toks)
        if head == "OPTIMIZE":
            return self._optimize(toks)
        if head == "EXISTS":
            name = self._table_name(toks[-1:])[0]
            return self.spark.createDataFrame(
                [(1 if name in self.tables else 0,)], "result INT"
            )
        if head in ("DESCRIBE", "DESC"):
            return self._describe(toks)
        if head == "CHECK":
            # CHECK TABLE: parquet-backed views have no broken parts.
            # With check_query_single_value_result=0 the reference
            # emits one (part_name, 1, '') row per data part.
            svr = self.settings.get(
                "check_query_single_value_result", "1"
            ).strip("'\"").lower()
            if svr in ("0", "false"):
                j = 1
                if j < len(toks) and _kw(toks[j]) == "TABLE":
                    j += 1
                cname, j = self._table_name(toks, j)
                pid_filter = None
                for j2 in range(j, len(toks) - 1):
                    if _kw(toks[j2]) == "PARTITION":
                        pid_filter = toks[j2 + 1].strip("'`\"")
                        break
                ct = self.tables.get(cname)
                rows = [
                    (f"{pid}_{mn}_{mx}_{lv}", 1, "")
                    for pid, mn, mx, lv in sorted(
                        ct.parts if ct else [],
                        key=lambda p: (p[0], p[1]),
                    )
                    if pid_filter is None or pid == pid_filter
                ]
                return self.spark.createDataFrame(
                    rows,
                    "part_path STRING, is_passed INT, message STRING",
                )
            return self.spark.createDataFrame([(1,)], "result INT")
        if head == "SET":
            return self._set(toks)
        if head == "ALTER":
            return self._alter(toks)
        if head == "SHOW":
            j = 1
            if j < len(toks) and _kw(toks[j]) == "TEMPORARY":
                j += 1
            if j < len(toks) and _kw(toks[j]) == "TABLES":
                names = sorted(
                    {t.name for t in self.tables.values()}
                    | set(self.dictionaries)
                )
                j += 1
                if j + 1 < len(toks) and _kw(toks[j]) in ("FROM", "IN"):
                    j += 2  # db namespaces flatten; nothing to filter
                if j + 1 < len(toks) and _kw(toks[j]) == "LIKE":
                    import fnmatch

                    pat = toks[j + 1].strip("'").replace("%", "*")
                    names = [x for x in names if fnmatch.fnmatch(x, pat)]
                    j += 2
                if j < len(toks) and _kw(toks[j]) == "LIMIT":
                    # constant arithmetic only, via a whitelisted AST
                    # walk — NOT eval(): corpus SQL is untrusted, and a
                    # regex-guarded eval still admits '**' (9**9**9
                    # would hang materializing an astronomical int)
                    import ast as _ast

                    def _const_int(txt: str):
                        def w(nd):
                            if isinstance(nd, _ast.Expression):
                                return w(nd.body)
                            if isinstance(nd, _ast.Constant) and isinstance(
                                nd.value, int
                            ):
                                return nd.value
                            if isinstance(nd, _ast.UnaryOp) and isinstance(
                                nd.op, (_ast.USub, _ast.UAdd)
                            ):
                                v = w(nd.operand)
                                return -v if isinstance(nd.op, _ast.USub) else v
                            if isinstance(nd, _ast.BinOp) and isinstance(
                                nd.op,
                                (_ast.Add, _ast.Sub, _ast.Mult, _ast.Div,
                                 _ast.FloorDiv),
                            ):
                                le, ri = w(nd.left), w(nd.right)
                                if isinstance(nd.op, _ast.Add):
                                    return le + ri
                                if isinstance(nd.op, _ast.Sub):
                                    return le - ri
                                if isinstance(nd.op, _ast.Mult):
                                    return le * ri
                                return le / ri if isinstance(
                                    nd.op, _ast.Div
                                ) else le // ri
                            raise ValueError(txt)

                        return int(w(_ast.parse(txt, mode="eval")))

                    lim_txt = _emit(toks[j + 1 :])
                    try:
                        lim = _const_int(lim_txt)
                    except Exception:  # noqa: BLE001
                        raise DialectError("SHOW TABLES LIMIT: not const")
                    names = names[:lim]
                return self.spark.createDataFrame(
                    [(x,) for x in names], "name STRING"
                )
            if j < len(toks) and _kw(toks[j]) == "CREATE":
                return self._show_create(toks, j + 1)
            raise DialectError(f"unsupported SHOW {_emit(toks[1:2])}")
        if head == "USE":
            return None
        raise DialectError(f"unsupported statement: {head}")

    def close(self) -> None:
        try:
            self.spark.conf.set("spark.sql.ansi.enabled", self._prev_ansi)
            self.spark.conf.set("spark.sql.groupByOrdinal", self._prev_gbo)
            self.spark.conf.set(
                "spark.sql.adaptive.enabled", self._prev_aqe
            )
            if self._prev_excl:
                self.spark.conf.set(
                    "spark.sql.adaptive.optimizer.excludedRules",
                    self._prev_excl,
                )
            else:
                self.spark.conf.unset(
                    "spark.sql.adaptive.optimizer.excludedRules"
                )
        except Exception:  # noqa: BLE001
            pass
        for df in self._persisted:
            try:
                df.unpersist(blocking=False)
            except Exception:  # noqa: BLE001
                pass
        self._persisted.clear()
        for name in list(self.tables):
            self._drop_views(name)
        for name in list(self.dictionaries):
            try:
                self.spark.catalog.dropTempView(name)
            except Exception:  # noqa: BLE001
                pass
        self.dictionaries.clear()
        self.storage_join_meta.clear()
        self.tables.clear()
        self.live_views.clear()
        self.mat_views.clear()

    # -- helpers ---------------------------------------------------------

    def _show_create(self, toks: list[str], i: int) -> DataFrame:
        """SHOW CREATE [TEMPORARY] TABLE / DATABASE — reconstruct the DDL
        in the reference's canonical rendering (newlines TSV-escaped as
        the literal two characters, as clickhouse-client prints them)."""
        temp = ""
        if i < len(toks) and _kw(toks[i]) == "TEMPORARY":
            temp = "TEMPORARY "
            i += 1
        kind = _kw(toks[i]) if i < len(toks) else ""
        if kind == "DATABASE":
            name = toks[i + 1].strip('`"')
            ddl = f"CREATE DATABASE {name}\nENGINE = Atomic"
            return self.spark.createDataFrame([(ddl,)], "statement STRING")
        if kind in ("TABLE", "VIEW"):
            i += 1
        name, _ = self._table_name(toks, i)
        t = self.tables.get(name)
        if t is None:
            raise DialectError(f"SHOW CREATE of unknown table {name}")
        # temporary tables live outside any database — no `default.`
        qual = "" if temp else "default."
        defs = []
        for c in t.cols:
            if c.default_kind == "VIRTUAL":
                continue
            d = f"`{c.name}` {ch_type_canon(c.ch_type or c.spark_type)}"
            if c.default_raw:
                d += f" {c.default_kind} {c.default_raw}"
            if c.ttl_raw:
                d += f" TTL {c.ttl_raw}"
            defs.append(d)
        defs += t.indices
        cols = ",\n    ".join(defs)
        if t.view_select_raw:
            ddl = (
                f"CREATE VIEW {qual}{name}\n(\n    {cols}\n) AS\n"
                f"{t.view_select_raw}"
            )
        elif t.as_tf_raw:
            ddl = (
                f"CREATE {temp}TABLE {qual}{name}\n(\n    {cols}\n)"
                f" AS {t.as_tf_raw}"
            )
        else:
            engine = t.engine_raw or (
                t.spec.engine if t.spec.engine != "MergeTree" else "Memory"
            )
            ddl = (
                f"CREATE {temp}TABLE {qual}{name}\n(\n    {cols}\n)\n"
                f"ENGINE = {engine}"
            )
            if t.partition_by_raw:
                ddl += f"\nPARTITION BY {t.partition_by_raw}"
            if t.order_by_raw:
                ddl += f"\nORDER BY {t.order_by_raw}"
            if t.sample_by_raw:
                ddl += f"\nSAMPLE BY {t.sample_by_raw}"
            if t.ttl_raw:
                ddl += f"\nTTL {t.ttl_raw}"
            if engine.endswith("MergeTree"):
                st = t.settings_raw
                if "index_granularity" not in st:
                    st = (st + ", " if st else "") + "index_granularity = 8192"
                ddl += f"\nSETTINGS {st}"
            elif t.settings_raw:
                ddl += f"\nSETTINGS {t.settings_raw}"
        return self.spark.createDataFrame([(ddl,)], "statement STRING")

    def _strip_db_quals(self, toks: list[str]) -> list[str]:
        """Flatten `db.table` to `table` for known database namespaces
        (system.numbers is the dialect's own concern and stays)."""
        out: list[str] = []
        i = 0
        n = len(toks)
        while i < n:
            if (
                i + 2 < n
                and toks[i + 1] == "."
                and toks[i].strip('`"') in self.databases
                and toks[i].strip('`"') != "system"
                and _is_ident(toks[i + 2])
            ):
                out.append(toks[i + 2])
                i += 3
                continue
            out.append(toks[i])
            i += 1
        return out

    @staticmethod
    def _table_name(toks: list[str], i: int = 0) -> tuple[str, int]:
        """Parse [db.]name at position i; returns (bare_name, next_i).

        Scripts address tables as ``t``, ``test.t`` or ``default.t``
        interchangeably; views are registered under the bare name.
        """
        name = toks[i]
        i += 1
        if i < len(toks) and toks[i] == ".":
            name = toks[i + 1]
            i += 2
        return name.strip('`"'), i

    def _rewrite_index_hint(self, toks: list[str]) -> list[str]:
        """``WHERE indexHint(cond)``: the function itself is constant 1
        (src/Functions/indexHint.cpp) but its argument still drives
        partition pruning and primary-key mark selection, so whole
        granules come back.  Emulated for the single-MergeTree-table
        case: a partition-key condition applies exactly (pruning is
        all-or-nothing per partition value); a first-sort-key
        equality/IN selects every granule whose key range
        [first_key(g), first_key(g+1)] (last granule: its own max, the
        final mark) contains a constant — the reference's
        MergeTreeDataSelectExecutor::markRangesFromPKRange rule.
        Unsupported shapes degrade to constant 1 (full scan), which is
        also what the reference does when KeyCondition can't use the
        argument (e.g. a type-incompatible constant)."""
        tbl_name = None
        for j, tk in enumerate(toks):
            if _kw(tk) == "FROM" and j + 1 < len(toks):
                nm = toks[j + 1].strip('`"')
                if nm in self.tables:
                    tbl_name = nm
        out = list(toks)
        i = 0
        while i < len(out):
            if (
                _kw(out[i]) == "INDEXHINT"
                and i + 1 < len(out) and out[i + 1] == "("
            ):
                close = _match_paren(out, i + 1)
                inner = out[i + 2 : close]
                repl = None
                if tbl_name is not None:
                    try:
                        repl = self._index_hint_pred(tbl_name, inner)
                    except Exception:  # noqa: BLE001
                        repl = None
                out[i : close + 1] = tokenize(repl or "1")
                i += 1
                continue
            i += 1
        return out

    def _index_hint_pred(self, tbl_name: str, inner: list[str]) -> str | None:
        t = self.tables[tbl_name]
        if not inner or len(inner) < 2:
            return None
        col = inner[0].strip('`"')
        rest = inner[1:]
        pk = (t.partition_by_raw or "").strip().strip("`\"")
        if pk and col == pk:
            return "(" + _emit(inner) + ")"
        sort0 = t.sort_keys[0].strip("`\" ") if t.sort_keys else ""
        if col != sort0:
            return None
        # constants on the right-hand side
        consts: list[int] = []
        if rest[0] == "=":
            expr = rest[1:]
            if any(
                _kw(x) in ("TODATETIME", "TODATE", "TODATETIME64")
                for x in expr
            ):
                # DateTime constant vs integer key: KeyCondition finds
                # no monotonic chain -> index unused -> full scan
                return None
            try:
                consts = [int(_emit(expr))]
            except ValueError:
                r1 = dialect_sql(
                    self.spark, "SELECT " + _emit(expr)
                ).collect()
                consts = [int(r1[0][0])]
        elif _kw(rest[0]) == "IN" and len(rest) > 1 and rest[1] == "(":
            in_toks = rest[2 : _match_paren(rest, 1)]
            if in_toks and _kw(in_toks[0]) in ("SELECT", "WITH"):
                rows = dialect_sql(self.spark, _emit(in_toks)).collect()
                consts = [int(r[0]) for r in rows if r[0] is not None]
            else:
                consts = [
                    int(_emit(p)) for p in _split_top(in_toks, ",")
                ]
        else:
            return None
        if not consts:
            return "0"
        m = re.search(
            r"(?i)index_granularity\s*=\s*(\d+)", t.settings_raw or ""
        )
        gran = int(m.group(1)) if m else 8192
        pp_sql = "0"
        if pk:
            pp_sql = _emit(_translate_expr(tokenize(t.partition_by_raw)))
        col_sql = f"`{col}`"
        # bound BEFORE materializing: a table past the granule cap must
        # not pay the global row_number() window nor a driver-side
        # collect of the whole granule list — count first (cheap
        # map-side agg), and cap the collect at 4097 rows regardless
        n_rows = self.spark.sql(
            f"SELECT count(*) FROM `{tbl_name}`"
        ).collect()[0][0]
        if n_rows > 4096 * gran:
            return None
        g = self.spark.sql(
            f"SELECT __pp, floor(__rn / {gran}) AS __g, "
            f"min(__k) AS f, max(__k) AS l FROM ("
            f"SELECT {pp_sql} AS __pp, {col_sql} AS __k, "
            f"row_number() OVER (PARTITION BY {pp_sql} "
            f"ORDER BY {col_sql}) - 1 AS __rn FROM `{tbl_name}`) "
            f"GROUP BY __pp, floor(__rn / {gran}) "
            f"ORDER BY __pp, __g"
        ).limit(4097).collect()
        if len(g) > 4096:
            return None
        ranges: list[tuple] = []
        for k, row in enumerate(g):
            nxt = g[k + 1] if k + 1 < len(g) else None
            ub = (
                nxt["f"] if nxt is not None and nxt["__pp"] == row["__pp"]
                else row["l"]
            )
            if any(row["f"] <= c <= ub for c in consts):
                # merge with the previous selected range when adjacent
                if (
                    ranges and ranges[-1][0] == row["__pp"]
                    and ranges[-1][3] == row["__g"] - 1
                ):
                    ranges[-1] = (
                        row["__pp"], ranges[-1][1], row["l"], row["__g"],
                    )
                else:
                    ranges.append(
                        (row["__pp"], row["f"], row["l"], row["__g"])
                    )
        if not ranges:
            return "0"
        if len(ranges) > 64:
            return None
        parts = []
        for pp, lo, hi, _g in ranges:
            cond = f"{col} >= {lo} AND {col} <= {hi}"
            if pk:
                cond = f"({t.partition_by_raw}) = {pp} AND " + cond
            parts.append("(" + cond + ")")
        return "(" + " OR ".join(parts) + ")"

    def _rewrite_star(self, toks: list[str], stmt: str) -> str:
        """``SELECT *`` must not expand MATERIALIZED/ALIAS columns.

        Those columns are physically stored here (insert-time compute),
        so when the query's FROM names exactly one table that has hidden
        columns, a top-level ``*`` is replaced by the visible columns.
        """
        target = None
        for j, tok in enumerate(toks):
            if _kw(tok) == "FROM" and j + 1 < len(toks):
                t = self.tables.get(toks[j + 1].strip('`"'))
                if t is not None and any(c.hidden for c in t.cols):
                    if target is not None and target is not t:
                        return stmt  # two hidden-col tables: ambiguous
                    target = t
        if target is None:
            return stmt
        out = []
        for j, tok in enumerate(toks):
            prev = _kw(toks[j - 1]) if j else "SELECT"
            if tok == "*" and prev in ("SELECT", "DISTINCT", ","):
                out.append(", ".join(
                    f"`{c.name}`" for c in target.cols if not c.hidden
                ))
            else:
                out.append(tok)
        return _emit(out)

    def _register(self, t: _Table) -> None:
        df = t.df if t.df is not None else self._empty_df(t)
        # the `_part`/`_part_index` virtuals must not leak into
        # SELECT * — the main view drops them; queries that NAME them
        # are routed to the companion __vparts view (execute())
        vparts = None
        if "_part" in df.columns:
            vparts = df
            df = df.drop("_part", "_part_index")
        # FINAL reads skip the per-insert primary-key sort when the
        # sort-free twin is still valid (see _Table.df_final_src): the
        # stable sort never reorders same-key rows, and every per-key
        # FINAL outcome (max_by version winner, summing first-row
        # fields, collapsing sign pairing) depends only on same-key
        # relative order — so the twin yields byte-identical results
        # while sparing a full single-task sort per FINAL-reading query.
        fsrc = df
        if (
            t.df_final_src is not None
            and t.df_final_src_of is t.df
        ):
            fsrc = t.df_final_src
        try:
            final = read_final(fsrc, t.spec)
        except Exception:  # noqa: BLE001 - exotic keys: FINAL view = raw
            final = df
        for name in [t.name, *t.aka]:
            df.createOrReplaceTempView(name)
            final.createOrReplaceTempView(name + "__final")
            if vparts is not None:
                vparts.createOrReplaceTempView(name + "__vparts")
        for name, n in t.shard_views.items():
            mdf, mfinal = df, final
            for _ in range(n - 1):
                mdf = mdf.unionAll(df)
                mfinal = mfinal.unionAll(final)
            mdf.createOrReplaceTempView(name)
            mfinal.createOrReplaceTempView(name + "__final")

    def _drop_views(self, name: str) -> None:
        for v in (name, name + "__final"):
            try:
                self.spark.catalog.dropTempView(v)
            except Exception:  # noqa: BLE001
                pass

    def _empty_df(self, t: _Table) -> DataFrame:
        ddl = ", ".join(f"`{c.name}` {c.spark_type}" for c in t.cols)
        return self.spark.createDataFrame([], ddl)

    # -- CREATE ----------------------------------------------------------

    def _create(self, toks: list[str]) -> None:
        i = 1
        if _kw(toks[i]) == "OR" and _kw(toks[i + 1]) == "REPLACE":
            i += 2
        if _kw(toks[i]) == "TEMPORARY":
            i += 1
        kind = _kw(toks[i])
        if kind == "DATABASE":
            j = i + 1
            while j < len(toks) and _kw(toks[j]) in ("IF", "NOT", "EXISTS"):
                j += 1
            if j < len(toks):
                self.databases.add(toks[j].strip('`"'))
            return None  # databases are a namespace; names map bare here
        if kind == "VIEW":
            return self._create_view(toks, i + 1)
        if kind == "LIVE" and i + 1 < len(toks) and _kw(toks[i + 1]) == "VIEW":
            return self._create_live_view(toks, i + 2)
        if (
            kind == "MATERIALIZED"
            and i + 1 < len(toks)
            and _kw(toks[i + 1]) == "VIEW"
        ):
            return self._create_materialized_view(toks, i + 2)
        if kind == "DICTIONARY":
            return self._create_dictionary(toks, i + 1)
        if kind != "TABLE":
            raise DialectError(f"unsupported CREATE {kind}")
        i += 1
        if_not_exists = False
        if (
            _kw(toks[i]) == "IF"
            and _kw(toks[i + 1]) == "NOT"
            and _kw(toks[i + 2]) == "EXISTS"
        ):
            if_not_exists = True
            i += 3
        name, i = self._table_name(toks, i)
        if i + 2 < len(toks) and _kw(toks[i]) == "ON" and _kw(toks[i + 1]) == "CLUSTER":
            i += 3
        if name in self.tables:
            if if_not_exists:
                return None
            self._drop_views(name)
        cols: list[_Col] = []
        indices_raw: list[str] = []
        constraints_raw: list[list[str]] = []
        if i < len(toks) and toks[i] == "(":
            close = _match_paren(toks, i)
            cols = self._parse_coldefs(toks[i + 1 : close])
            constraints_raw = list(getattr(self, "_last_constraints", []))
            self._infer_untyped(cols)
            indices_raw = _render_index_defs(toks[i + 1 : close])
            i = close + 1
        engine, engine_args = "Memory", []
        replicated_tbl = False
        engine_raw = order_by_raw = partition_by_raw = ""
        ttl_raw = settings_raw = ""
        order_keys: list[str] = []
        sample_by = ""
        partition_by = ""
        as_select: list[str] | None = None
        buffer_target: str | None = None
        dist_shards = 1
        merge_pattern = ""
        n = len(toks)
        while i < n:
            up = _kw(toks[i])
            if up == "ENGINE":
                i += 1
                if i < n and toks[i] == "=":
                    i += 1
                ename = _kw(toks[i])
                replicated = replicated_tbl = ename.startswith("REPLICATED")
                if replicated:
                    # Replicated<X>MergeTree(zk_path, replica, ...): same
                    # read semantics as <X>MergeTree; zk args dropped
                    ename = ename[len("REPLICATED"):]
                if ename not in _ENGINE_KIND:
                    raise DialectError(f"unsupported engine {toks[i]}")
                engine = _ENGINE_KIND[ename]
                i += 1
                raw_args: list[list[str]] = []
                if i < n and toks[i] == "(":
                    close = _match_paren(toks, i)
                    raw_args = [
                        p for p in _split_top(toks[i + 1 : close], ",") if p
                    ]
                    i = close + 1
                if replicated:
                    raw_args = raw_args[2:]
                disp = _ENGINE_DISPLAY.get(ename, ename.title())
                engine_raw = ("Replicated" if replicated else "") + disp
                if raw_args:
                    engine_raw += (
                        "(" + ", ".join(ch_expr(p) for p in raw_args) + ")"
                    )
                if ename == "MERGE" and len(raw_args) > 1:
                    # Merge(db, 'regex'): reads union the matching
                    # tables at query time (TableFunctionMerge) — keep
                    # the pattern, the SELECT path rewrites to merge()
                    merge_pattern = _emit(raw_args[1]).strip("'\"` ")
                    engine_args = []
                    continue
                if engine == "Buffer":
                    # Buffer(db, target, tiers...): proxy to target
                    buffer_target = (
                        raw_args[1][0].strip('`"') if len(raw_args) > 1 else ""
                    )
                    engine_args = []
                    continue
                if engine == "Distributed":
                    if len(raw_args) > 2:
                        buffer_target = raw_args[2][0].strip('`"\'')
                        if raw_args[1][0].strip('`"\'') == "system":
                            buffer_target = "system." + buffer_target
                    # all-localhost clusters read the SAME local table
                    # once per shard (rows double); different-databases
                    # clusters collapse to one table that already holds
                    # every shard's rows (db quals are stripped), so a
                    # second read would double-count (01231, 01487)
                    if (
                        raw_args and "two_shards" in raw_args[0][0]
                        and "different_databases" not in raw_args[0][0]
                    ):
                        dist_shards = 2
                    engine_args = []
                    continue
                gran = [
                    j for j, p in enumerate(raw_args)
                    if len(p) == 1 and p[0].isdigit()
                ]
                if gran:
                    # legacy syntax: Engine(date, [sample,] (pk), granularity
                    # [, extras]) -- pk tuple becomes the sorting key, the
                    # date/sample/granularity args carry no read semantics
                    gi = gran[0]
                    if gi >= 2:
                        # the leading date column carries BY-MONTH
                        # partition semantics (legacy MergeTree always
                        # partitions by toYYYYMM of its first arg) —
                        # _partition_id must render the 197004 form
                        d_arg = raw_args[0]
                        if len(d_arg) == 1 and _is_ident(d_arg[0]):
                            d9l = d_arg[0].strip('`"')
                            partition_by = (
                                f"date_format(`{d9l}`, 'yyyyMM')"
                            )
                            partition_by_raw = f"toYYYYMM({d9l})"
                        # pk is the arg just before granularity: a tuple
                        # or a single bare expression (date/sampling
                        # args before it carry partition semantics only)
                        pk = raw_args[gi - 1]
                        if pk and pk[0] == "(":
                            order_keys = [
                                _emit(_translate_expr(q))
                                for q in _split_top(pk[1:-1], ",") if q
                            ]
                        else:
                            order_keys = [_emit(_translate_expr(pk))]
                    post = raw_args[gi + 1 :]
                else:
                    post = raw_args
                # flatten tuple args: SummingMergeTree((a, b)) names columns
                engine_args = []
                for p in post:
                    if p and p[0] == "(":
                        engine_args += [
                            _emit(q).strip('`"')
                            for q in _split_top(p[1:-1], ",") if q
                        ]
                    else:
                        engine_args.append(_emit(p).strip('`"'))
            elif up == "ORDER" and i + 1 < n and _kw(toks[i + 1]) == "BY":
                j0 = i + 2
                order_keys, i = self._parse_key_list(toks, j0)
                order_by_raw = ch_expr(toks[j0:i])
            elif up == "SAMPLE" and i + 1 < n:
                # SAMPLE BY expr: recorded so dialect SAMPLE f reads become
                # a deterministic key-range filter (the reference's
                # sampling is keyed and repeatable, never Bernoulli)
                sample_keys, i = self._parse_key_list(toks, i + 2)
                sample_by = sample_keys[0] if sample_keys else ""
            elif up == "PARTITION" and i + 1 < n:
                # PARTITION BY expr: recorded so ALTER ... DROP PARTITION
                # can filter the matching rows out
                j0 = i + 2
                part_keys, i = self._parse_key_list(toks, j0)
                partition_by = part_keys[0] if part_keys else ""
                partition_by_raw = ch_expr(toks[j0:i])
            elif up == "PRIMARY" and i + 1 < n:
                _, i = self._parse_key_list(toks, i + 2)
            elif up == "TTL":
                # table TTL: capture for SHOW CREATE (data expiry itself
                # is handled by maintenance.apply_ttl)
                j0 = i + 1
                depth0 = 0
                while j0 < n:
                    if toks[j0] == "(":
                        depth0 += 1
                    elif toks[j0] == ")":
                        depth0 -= 1
                    elif depth0 == 0 and _kw(toks[j0]) in (
                        "SETTINGS", "COMMENT", "AS",
                    ):
                        break
                    j0 += 1
                ttl_raw = ch_expr(toks[i + 1 : j0])
                i = j0
            elif up == "SETTINGS":
                j0 = i + 1
                while j0 < n and _kw(toks[j0]) not in ("COMMENT", "AS"):
                    j0 += 1
                settings_raw = ch_expr(toks[i + 1 : j0])
                i = j0
            elif up == "COMMENT":
                break
            elif up == "AS":
                as_select = toks[i + 1 :]
                break
            else:
                raise DialectError(f"unsupported CREATE clause at {toks[i]!r}")
        join_keys: list[str] | None = None
        if engine == "Join":
            # Join(strictness, side, k1[, k2...]): a Memory table whose
            # key layout backs joinGet()/joinGetOrNull()
            join_keys = engine_args[2:] or engine_args[-1:]
            engine, engine_args = "Memory", []
        if engine in ("Buffer", "Distributed"):
            if buffer_target in ("system.numbers", "system.one"):
                # Distributed over a system generator: each shard reads
                # the same generator — a bounded slice is enough for the
                # point-filter + LIMIT shapes the tests use
                if buffer_target.endswith("numbers"):
                    one = self.spark.range(1 << 20).toDF("number")
                else:
                    one = self.spark.sql("SELECT CAST(0 AS SMALLINT) dummy")
                df9 = one
                for _ in range(dist_shards - 1):
                    df9 = df9.unionAll(one)
                cols9 = [
                    _Col("number", "bigint", "UInt64")
                    if buffer_target.endswith("numbers")
                    else _Col("dummy", "smallint", "UInt8")
                ]
                t9 = _Table(
                    name=name, cols=cols9,
                    spec=TableSpec(name=name, path="", engine="MergeTree"),
                    df=df9,
                )
                t9.engine_raw = engine_raw or "Memory"
                self.tables[name] = t9
                self._register(t9)
                return None
            if buffer_target and buffer_target in self.tables:
                other = self.tables[buffer_target]
                if dist_shards > 1:
                    other.shard_views[name] = dist_shards
                else:
                    other.aka.append(name)
                self.tables[name] = other
                self._register(other)
                return None
            engine = "Memory"  # unflushed standalone buffer
        version = sign = None
        summed: tuple[str, ...] = ()
        if engine == "Replacing" and engine_args:
            version = engine_args[0]
        elif engine == "Summing" and engine_args:
            summed = tuple(engine_args)
        elif engine == "Collapsing":
            sign = engine_args[0] if engine_args else "sign"
        elif engine == "VersionedCollapsing":
            if len(engine_args) < 2:
                raise DialectError("VersionedCollapsingMergeTree(sign, ver)")
            sign, version = engine_args[0], engine_args[1]
        ident_keys = tuple(
            k.strip('`"') for k in order_keys
            if k.strip('`"').replace("_", "a").isalnum()
        )
        spec = TableSpec(
            name=name, path="", engine=(
                engine if engine in ("Memory", "Null", "MergeTree")
                else engine + "MergeTree"
            ),
            order_by=ident_keys, version_column=version, sign_column=sign,
            summed_columns=summed,
        )
        if spec.engine == "AggregatingMergeTree":
            spec.agg_columns = {
                c.name: m.group(1)
                for c in cols
                if (m := re.match(
                    r"(?i)(?:Simple)?AggregateFunction\s*\(\s*(\w+)",
                    c.ch_type or "",
                ))
            }
        # Memory/Null never merge -> MergeTree identity semantics on read
        if spec.engine in ("Memory", "Null"):
            spec = TableSpec(
                name=name, path="", engine="MergeTree", order_by=ident_keys
            )
        t = _Table(
            name=name, cols=cols, spec=spec, sort_keys=order_keys,
            sample_by=sample_by, partition_by=partition_by,
            merge_pattern=merge_pattern,
        )
        t.engine_raw = engine_raw or "Memory"
        t.constraints = constraints_raw
        t.order_by_raw = order_by_raw
        t.partition_by_raw = partition_by_raw
        t.ttl_raw = ttl_raw
        t.settings_raw = settings_raw
        t.indices = indices_raw
        if replicated_tbl:
            # replicated block numbers are ZK-sequential from 0
            t.next_block = 0
        if engine == "Null":
            # Null engine discards all inserts; only the schema exists
            t.spec = TableSpec(name=name, path="", engine="Null")
            t.sort_keys = []
            if as_select is not None and not cols:
                src = dialect_sql(self.spark, _emit(as_select))
                t.cols = [
                    _Col(f.name, f.dataType.simpleString(), f.dataType.simpleString(), True)
                    for f in src.schema.fields
                ]
            self.tables[name] = t
            self._register(t)
            return None
        if as_select is not None:
            nxt = _kw(as_select[0]) if as_select else ""
            head2 = _emit(as_select[:3]).replace(" ", "")
            if (
                head2.startswith(("system.numbers", "system.one"))
                and "(" not in head2
            ):
                # CREATE TABLE t AS system.numbers|one [ENGINE = ...]:
                # clone the system table's SCHEMA, start empty
                # (StorageSystemNumbers/StorageSystemOne)
                t.cols = (
                    [_Col("dummy", "smallint", "UInt8")]
                    if head2.startswith("system.one")
                    else [_Col("number", "bigint", "UInt64")]
                )
                self.tables[name] = t
                self._register(t)
                return None
            if nxt in ("SELECT", "WITH") or (as_select and as_select[0] == "("):
                src = dialect_sql(self.spark, _emit(as_select))
            elif self._table_name(as_select, 0)[0] in self.tables:
                other_name, j = self._table_name(as_select, 0)
                other = self.tables[other_name]
                tail = [_kw(x) for x in as_select[j:]]
                if "BUFFER" in tail[:4] or "DISTRIBUTED" in tail[:4]:
                    # CREATE TABLE t AS target ENGINE = Buffer/Distributed:
                    # reads see the target (+ in-flight buffer rows) and
                    # writes flush through -- a pure proxy, except a
                    # multi-shard all-localhost cluster reads rows twice
                    if "DISTRIBUTED" in tail[:4] and any(
                        "two_shards" in x
                        and "different_databases" not in x
                        for x in as_select[j : j + 8]
                    ):
                        other.shard_views[name] = 2
                    else:
                        other.aka.append(name)
                    self.tables[name] = other
                    self._register(other)
                    return None
                # CREATE TABLE t AS other: clone schema, start empty
                t.cols = list(other.cols)
                t.sort_keys = t.sort_keys or list(other.sort_keys)
                # SHOW CREATE renders the clone like the original
                t.engine_raw = other.engine_raw
                t.order_by_raw = other.order_by_raw
                t.partition_by_raw = other.partition_by_raw
                t.ttl_raw = other.ttl_raw
                t.settings_raw = other.settings_raw
                t.indices = list(other.indices)
                t.as_tf_raw = other.as_tf_raw
                if other.as_tf_raw:
                    # AS <tvf> tables read the generator, not stored
                    # parts — the clone inherits the generator with it
                    t.df = other.df
                if "MERGE" in tail[:4]:
                    # AS other ENGINE = Merge(db, 'regex'): reads union
                    # the matching tables at query time
                    m6 = re.search(
                        r"Merge\s*\([^,]*,\s*'((?:[^'\\\\]|\\\\.)*)'",
                        _emit(as_select[j:]),
                    )
                    if m6:
                        t.merge_pattern = m6.group(1)
                self.tables[name] = t
                self._register(t)
                return None
            else:
                # AS <table-function> (numbers(...), generateRandom(...))
                src = dialect_sql(
                    self.spark, "SELECT * FROM " + _emit(as_select)
                )
                t.as_tf_raw = ch_expr(as_select)
            if cols:
                src = src.select(
                    *[
                        F.col(f.name).cast(c.spark_type).alias(c.name)
                        for f, c in zip(src.schema.fields, cols)
                    ]
                )
            else:
                from daisy_spark.chsyntax import spark_to_ch

                # positional ch-types from the SELECT items where the
                # static inferencer can derive them — this is what keeps
                # SimpleAggregateFunction(...) tags alive so the
                # Aggregating merge knows the column's combine function
                ch_types: dict[int, str] = {}
                if as_select and _kw(as_select[0]) == "SELECT":
                    from daisy_spark.plans.dialect import (
                        _ch_type_of as _cto,
                        _TYPE_ENV_DEFAULT as _ted,
                    )

                    body9 = as_select[1:]
                    for stop9 in ("FROM", "GROUP", "WHERE", "ORDER",
                                  "HAVING", "LIMIT", "SETTINGS"):
                        for k9, tk9 in enumerate(body9):
                            if _kw(tk9) == stop9 and _paren_depth_at(
                                body9, k9
                            ) == 0:
                                body9 = body9[:k9]
                                break
                    for k9, it9 in enumerate(_split_top(body9, ",")):
                        if len(it9) >= 2 and _kw(it9[-2]) == "AS":
                            it9 = it9[:-2]
                        elif (
                            len(it9) >= 2 and _is_ident(it9[-1])
                            and _kw(it9[-1]) not in _SQL_KEYWORDS
                            and not it9[-1].startswith("'")
                            and (it9[-2] == ")" or _is_ident(it9[-2]))
                        ):
                            it9 = it9[:-1]
                        tt9 = _cto(it9, _ted)
                        if tt9 and tt9.startswith(
                            "SimpleAggregateFunction("
                        ):
                            ch_types[k9] = tt9
                is_numbers = t.as_tf_raw.startswith("numbers")
                t.cols = [
                    _Col(
                        f.name, f.dataType.simpleString(),
                        # system.numbers' column is unsigned
                        "UInt64" if is_numbers and f.name == "number"
                        else ch_types.get(
                            k10, spark_to_ch(f.dataType.simpleString())
                        ),
                        True,
                    )
                    for k10, f in enumerate(src.schema.fields)
                ]
            t.df = self._sorted_batch(t, src, heavy=True)
            if t.spec.engine == "AggregatingMergeTree" and not (
                t.spec.agg_columns
            ):
                # AS SELECT columns carry their state tags in ch_type
                t.spec.agg_columns = {
                    c.name: m.group(1)
                    for c in t.cols
                    if (m := re.match(
                        r"(?i)(?:Simple)?AggregateFunction\s*\(\s*(\w+)",
                        c.ch_type or "",
                    ))
                }
        if t.df is not None:
            # CREATE ... AS SELECT materializes one initial part; the
            # `_part` virtuals ride a companion view (see _register)
            t.df = self._record_parts(t, t.df)
        self.tables[name] = t
        self._register(t)
        if join_keys:
            self.storage_join_meta[name] = {
                "keys": join_keys,
                "defaults": {
                    c.name: _type_default(c.spark_type, c.nullable)
                    for c in t.cols
                },
            }
        return None

    def _create_dictionary(self, toks: list[str], i: int) -> None:
        """CREATE DICTIONARY name (attrs...) PRIMARY KEY k SOURCE(...)
        LAYOUT(...) [RANGE(MIN a MAX b)] — the reference's external
        dictionary DDL (src/Interpreters/InterpreterCreateQuery.cpp,
        getDictionaryConfigurationFromAST).  Spark-first: the dictionary
        becomes a temp VIEW over its source table (attribute EXPRESSIONs
        applied, declared types cast), and dictGet* lower to point-lookup
        subqueries Catalyst decorrelates into broadcast-style joins —
        the same executor-resident-dimension shape as the reference's
        in-memory layouts.  Only SOURCE(CLICKHOUSE(TABLE ...)) — i.e. a
        table of this runner — is meaningful here; other sources raise."""
        if_not_exists = False
        if (
            _kw(toks[i]) == "IF" and _kw(toks[i + 1]) == "NOT"
            and _kw(toks[i + 2]) == "EXISTS"
        ):
            if_not_exists = True
            i += 3
        name, i = self._table_name(toks, i)
        if i + 2 < len(toks) and _kw(toks[i]) == "ON" and _kw(toks[i + 1]) == "CLUSTER":
            i += 3
        if name in self.dictionaries:
            if if_not_exists:
                return None
            raise DialectError(f"dictionary {name} already exists")
        if toks[i] != "(":
            raise DialectError("CREATE DICTIONARY requires an attribute list")
        close = _match_paren(toks, i)
        colpart = toks[i + 1 : close]
        i = close + 1
        # extract per-attribute EXPRESSION clauses before the shared
        # column parser (they are dictionary-specific)
        expressions: dict[str, str] = {}
        cleaned: list[str] = []
        hier_attr: str | None = None
        for part in _split_top(colpart, ","):
            if not part:
                continue
            cname = part[0].strip('`"')
            if any(_kw(x) == "HIERARCHICAL" for x in part):
                hier_attr = cname
            j, kept = 1, [part[0]]
            while j < len(part):
                if _kw(part[j]) == "EXPRESSION" and j + 1 < len(part):
                    k = j + 1
                    depth = 0
                    while k < len(part):
                        if part[k] == "(":
                            depth += 1
                        elif part[k] == ")":
                            depth -= 1
                        elif depth == 0 and _kw(part[k]) in (
                            "HIERARCHICAL", "INJECTIVE", "IS_OBJECT_ID",
                        ):
                            break
                        k += 1
                    expr_toks = part[j + 1 : k]
                    # a quoted literal holds reference-dialect SQL text
                    if len(expr_toks) == 1 and expr_toks[0].startswith("'"):
                        expr_toks = tokenize(expr_toks[0][1:-1])
                    expressions[cname] = _emit(_translate_expr(expr_toks))
                    j = k
                elif _kw(part[j]) in ("HIERARCHICAL", "INJECTIVE", "IS_OBJECT_ID"):
                    j += 1
                else:
                    kept.append(part[j])
                    j += 1
            if cleaned:
                cleaned.append(",")
            cleaned += kept
        cols = self._parse_coldefs(cleaned)
        keys: list[str] = []
        source_tbl: str | None = None
        rng: tuple[str, str] | None = None
        n = len(toks)
        while i < n:
            kw = _kw(toks[i])
            if kw == "PRIMARY" and i + 1 < n and _kw(toks[i + 1]) == "KEY":
                i += 2
                ks: list[str] = []
                while i < n and _kw(toks[i]) not in (
                    "SOURCE", "LAYOUT", "LIFETIME", "RANGE", "SETTINGS",
                    "COMMENT",
                ):
                    ks.append(toks[i])
                    i += 1
                while ks and ks[0] == "(" and _match_paren(ks, 0) == len(ks) - 1:
                    ks = ks[1:-1]
                keys = [
                    _emit(p).strip('`"') for p in _split_top(ks, ",") if p
                ]
            elif kw in (
                "SOURCE", "LAYOUT", "LIFETIME", "RANGE", "SETTINGS",
            ) and i + 1 < n and toks[i + 1] == "(":
                close2 = _match_paren(toks, i + 1)
                inner = toks[i + 2 : close2]
                if kw == "SOURCE":
                    src_kind = _kw(inner[0]) if inner else ""
                    if src_kind != "CLICKHOUSE":
                        raise DialectError(
                            f"unsupported dictionary source {src_kind}"
                        )
                    for x, tk in enumerate(inner):
                        if _kw(tk) == "TABLE" and x + 1 < len(inner):
                            source_tbl = inner[x + 1].strip("'`\"").split(".")[-1]
                if kw == "RANGE":
                    mn = mx = None
                    for x, tk in enumerate(inner):
                        if _kw(tk) == "MIN" and x + 1 < len(inner):
                            mn = inner[x + 1].strip('`"')
                        if _kw(tk) == "MAX" and x + 1 < len(inner):
                            mx = inner[x + 1].strip('`"')
                    if mn and mx:
                        rng = (mn, mx)
                i = close2 + 1
            else:
                i += 1
        if source_tbl is None:
            raise DialectError("CREATE DICTIONARY requires SOURCE(CLICKHOUSE(TABLE ...))")
        if not keys:
            raise DialectError("CREATE DICTIONARY requires PRIMARY KEY")
        # the reference exposes dictionary columns key-first, then the
        # RANGE bounds, then the remaining attributes in DDL order
        # (getDictionaryConfigurationFromAST attribute layout)
        ordered: list = []
        for k in keys:
            ordered += [c for c in cols if c.name == k and c not in ordered]
        if rng:
            for r in rng:
                ordered += [
                    c for c in cols if c.name == r and c not in ordered
                ]
        ordered += [c for c in cols if c not in ordered]
        cols = ordered
        sel = []
        for c in cols:
            if c.name in expressions:
                sel.append(
                    f"CAST(({expressions[c.name]}) AS {c.spark_type}) AS `{c.name}`"
                )
            else:
                sel.append(f"CAST(`{c.name}` AS {c.spark_type}) AS `{c.name}`")
        self.spark.sql(
            f"CREATE OR REPLACE TEMP VIEW `{name}` AS "
            f"SELECT {', '.join(sel)} FROM `{source_tbl}`"
        )
        self.dictionaries[name] = {
            "view": f"`{name}`",
            "keys": keys,
            "attrs": {
                c.name: (
                    c.spark_type,
                    c.default
                    if c.default is not None
                    else _type_default(c.spark_type, c.nullable),
                )
                for c in cols
            },
            "range": rng,
            "source": source_tbl,
            "hier": hier_attr,
        }
        return None

    def _create_view(self, toks: list[str], i: int) -> None:
        if (
            _kw(toks[i]) == "IF" and _kw(toks[i + 1]) == "NOT"
            and _kw(toks[i + 2]) == "EXISTS"
        ):
            i += 3
        name, i = self._table_name(toks, i)
        decl: list[_Col] = []
        if i < len(toks) and toks[i] == "(":
            # optional declared column list: the SELECT's outputs are
            # CAST to the declared types (StorageView type conversion)
            close = _match_paren(toks, i)
            decl = self._parse_coldefs(toks[i + 1 : close])
            i = close + 1
        if _kw(toks[i]) != "AS":
            raise DialectError("CREATE VIEW requires AS SELECT")
        df = dialect_sql(self.spark, _emit(toks[i + 1 :]))
        if decl and len(decl) == len(df.columns):
            df = df.select(*[
                F.col(old).cast(c.spark_type).alias(c.name)
                for old, c in zip(df.columns, decl)
            ])
        df.createOrReplaceTempView(name)
        df.createOrReplaceTempView(name + "__final")
        from daisy_spark.chsyntax import format_select, spark_to_ch

        if decl:
            ch_types = {c.name: c.ch_type for c in decl}
        else:
            # infer reference-side output types for SHOW CREATE (the
            # static inferencer knows system.numbers' UInt64 etc.)
            ch_types = self._select_out_ch_types(toks[i + 1 :])
        vt = _Table(
            name=name,
            cols=[
                _Col(
                    f.name, f.dataType.simpleString(),
                    ch_types.get(f.name)
                    or spark_to_ch(f.dataType.simpleString()),
                    True,
                )
                for f in df.schema.fields
            ],
            spec=TableSpec(name=name, path="", engine="MergeTree"),
            df=df,
        )
        try:
            vt.view_select_raw = format_select(toks[i + 1 :])
        except Exception:  # noqa: BLE001
            vt.view_select_raw = _emit(toks[i + 1 :])
        self.tables[name] = vt
        return None

    @staticmethod
    def _select_out_ch_types(sel_toks: list[str]) -> dict[str, str]:
        """name -> reference type for a view body's ALIASED select items
        (best-effort static inference; unknown items are omitted)."""
        from daisy_spark.plans.dialect import _ch_type_of, _split_top
        from daisy_spark.plans.dialect import _TYPE_ENV_DEFAULT

        out: dict[str, str] = {}
        if not sel_toks or _kw(sel_toks[0]) != "SELECT":
            return out
        stop = next(
            (
                k for k in range(1, len(sel_toks))
                if _paren_depth_at(sel_toks, k) == 0
                and _kw(sel_toks[k]) in (
                    "FROM", "WHERE", "GROUP", "ORDER", "LIMIT", "SETTINGS",
                )
            ),
            len(sel_toks),
        )
        for item in _split_top(sel_toks[1:stop], ","):
            if not item:
                continue
            nm, expr = None, item
            if len(item) >= 3 and _kw(item[-2]) == "AS" and _is_ident(item[-1]):
                nm, expr = item[-1].strip('`"'), item[:-2]
            elif len(item) == 1 and _is_ident(item[0]):
                nm = item[0].strip('`"')
            if nm is None:
                continue
            try:
                tpe = _ch_type_of(expr, dict(_TYPE_ENV_DEFAULT))
                if (
                    tpe is None and len(expr) == 3
                    and expr[1] in ("+", "-", "*")
                ):
                    # int arithmetic keeps the column's width class
                    # (UInt64 + small literal stays UInt64)
                    ident = (
                        expr[0] if _is_ident(expr[0]) and
                        expr[2].isdigit() else
                        expr[2] if _is_ident(expr[2]) and
                        expr[0].isdigit() else None
                    )
                    if ident is not None:
                        tpe = _ch_type_of([ident], dict(_TYPE_ENV_DEFAULT))
            except Exception:  # noqa: BLE001
                tpe = None
            if tpe:
                out[nm] = tpe
        return out

    # -- MATERIALIZED VIEW (src/Storages/StorageMaterializedView.cpp) ----

    def _create_materialized_view(self, toks: list[str], i: int) -> None:
        """CREATE MATERIALIZED VIEW mv [(cols)] [TO target] [ENGINE=...]
        [POPULATE] AS SELECT ... — per the reference, the view's SELECT
        runs on each INSERTED BLOCK of its source table and the result is
        appended to the backing storage (or the TO target); pre-existing
        rows are included only with POPULATE."""
        if (
            _kw(toks[i]) == "IF" and _kw(toks[i + 1]) == "NOT"
            and _kw(toks[i + 2]) == "EXISTS"
        ):
            i += 3
        name, i = self._table_name(toks, i)
        n = len(toks)
        cols: list[_Col] = []
        if i < n and toks[i] == "(":
            close = _match_paren(toks, i)
            cols = self._parse_coldefs(toks[i + 1 : close])
            self._infer_untyped(cols)
            i = close + 1
        target = None
        if i < n and _kw(toks[i]) == "TO":
            target, i = self._table_name(toks, i + 1)
        populate = False
        # skip engine/partition/order clauses up to the top-level AS
        depth = 0
        while i < n:
            if toks[i] == "(":
                depth += 1
            elif toks[i] == ")":
                depth -= 1
            elif depth == 0 and _kw(toks[i]) == "POPULATE":
                populate = True
            elif depth == 0 and _kw(toks[i]) == "AS" and i + 1 < n and (
                _kw(toks[i + 1]) in ("SELECT", "WITH") or toks[i + 1] == "("
            ):
                break
            i += 1
        if i >= n:
            raise DialectError("CREATE MATERIALIZED VIEW requires AS SELECT")
        query_toks = toks[i + 1 :]
        storage = target or name
        if target is None:
            if not cols:
                probe = dialect_sql(self.spark, _emit(query_toks)).limit(0)
                cols = [
                    _Col(f.name, f.dataType.simpleString(),
                         f.dataType.simpleString(), True)
                    for f in probe.schema.fields
                ]
            t = _Table(
                name=name,
                cols=cols,
                spec=TableSpec(name=name, path="", engine="MergeTree"),
                df=None,
            )
            self.tables[name] = t
            self._register(t)
        else:
            # TO form: the view name reads the target table
            tgt = self.tables.get(target)
            if tgt is not None:
                tgt.aka.append(name)
                self._register(tgt)
        srcs = {
            tok for tok in query_toks
            if _is_ident(tok) and tok.strip('`"') in self.tables
        }
        self.mat_views[name] = {
            "toks": query_toks,
            "srcs": {s.strip('`"') for s in srcs} - {name, storage},
            "storage": storage,
        }
        if populate:
            self._mv_append(name, None)
        return None

    def _mv_append(self, mv_name: str, batch) -> None:
        """Run the MV query (against the given inserted block, or the
        full current state when batch is None) and append to storage."""
        mv = self.mat_views[mv_name]
        saved: list[str] = []
        try:
            if batch is not None:
                src_name, src_batch = batch
                saved.append(src_name)
                src_batch.createOrReplaceTempView(src_name)
            rows = dialect_sql(self.spark, _emit(mv["toks"]))
            st = self.tables.get(mv["storage"])
            if st is None:
                return
            by_name = {c.name: c for c in st.cols}
            sel = []
            for f, c in zip(rows.schema.fields, st.cols):
                sel.append(F.col(f.name).cast(c.spark_type).alias(c.name))
            out = rows.select(*sel)
            st.df = out if st.df is None else st.df.unionByName(out)
            self._register(st)
        finally:
            for src_name in saved:  # restore the real table view
                t = self.tables.get(src_name)
                if t is not None:
                    self._register(t)

    # -- LIVE VIEW (src/Storages/LiveView/StorageLiveView.cpp) -----------

    def _create_live_view(self, toks: list[str], i: int) -> None:
        if (
            _kw(toks[i]) == "IF" and _kw(toks[i + 1]) == "NOT"
            and _kw(toks[i + 2]) == "EXISTS"
        ):
            i += 3
        name, i = self._table_name(toks, i)
        if _kw(toks[i]) == "WITH" and _kw(toks[i + 1]) == "TIMEOUT":
            i += 2
            if i < len(toks) and toks[i].isdigit():
                i += 1  # refresh timeout: no batch semantics
        if _kw(toks[i]) != "AS":
            raise DialectError("CREATE LIVE VIEW requires AS SELECT")
        self.live_views[name] = {
            "toks": toks[i + 1 :],
            "version": 0,
            "last": None,
        }
        return None

    def _lv_refresh(self, name: str):
        """Evaluate the live view query against CURRENT table state;
        bump _version when the result set changed.  Returns
        (rows, schema, version)."""
        lv = self.live_views[name]
        df = dialect_sql(self.spark, _emit(lv["toks"]))
        rows = [tuple(r) for r in df.collect()]
        # keyless aggregate over an EMPTY source: the reference emits the
        # aggregates' zero values, Spark one all-NULL row.  Only rewrite
        # when every referenced source table is actually empty — a
        # legitimate all-NULL row over non-empty data (e.g. max of an
        # all-NULL column) must pass through untouched, and _version
        # change-detection must key off the real value.
        if (
            len(rows) == 1
            and all(v is None for v in rows[0])
            and self._lv_sources_empty(lv["toks"])
        ):
            rows = [tuple(
                0 if f.dataType.simpleString() in (
                    "bigint", "int", "smallint", "tinyint", "double",
                    "float", "decimal",
                ) or f.dataType.simpleString().startswith("decimal")
                else None
                for f in df.schema.fields
            )]
        canon = sorted(rows)
        if lv["last"] is None or canon != lv["last"]:
            lv["version"] += 1
            lv["last"] = canon
        return rows, df.schema, lv["version"]

    # -- ALTER TABLE (src/Storages/AlterCommands.cpp; mutations are
    # synchronous rewrites here — single-node Memory storage) ----------
    def _alter(self, toks: list[str]) -> None:
        i = 1
        if _kw(toks[i]) == "TABLE":
            i += 1
        name, i = self._table_name(toks, i)
        if name not in self.tables:
            raise DialectError(f"ALTER on unknown table {name}")
        t = self.tables[name]
        if t.df is None:
            t.df = self._empty_df(t)
        # trailing SETTINGS (mutations_sync etc.): mutations here are
        # always synchronous — accept and drop
        rest = toks[i:]
        for k in range(len(rest)):
            if (
                _kw(rest[k]) == "SETTINGS"
                and _paren_depth_at(rest, k) == 0
            ):
                rest = rest[:k]
                break
        acts = [a for a in _split_top(rest, ",") if a]
        if acts and _kw(acts[0][0]) == "UPDATE":
            # UPDATE c1 = e1, c2 = e2 WHERE pred — commas belong to the
            # assignment list, not to an action list
            self._alter_update(t, rest)
        else:
            for action in acts:
                self._alter_action(t, action)
        self._register(t)
        return None

    def _alter_update(self, t: _Table, a: list[str]) -> None:
        # All assignments of one UPDATE command form a single mutation
        # stage evaluated against PRE-mutation values (reference
        # MutationsInterpreter.cpp:517 — one column_to_updated map), so
        # `UPDATE a = b, b = a` swaps.  Build every new-column expression
        # first, then apply them in one select over the snapshot.
        w = next((k for k in range(len(a)) if _kw(a[k]) == "WHERE"), -1)
        if w < 0:
            raise DialectError("ALTER UPDATE requires WHERE")
        pred = _emit(_translate_expr(a[w + 1 :]))
        updated: dict[str, str] = {}
        for asg in _split_top(a[1:w], ","):
            if not asg:
                continue
            eq = next(k for k in range(len(asg)) if asg[k] == "=")
            cname = "".join(x.strip('`"') for x in asg[:eq])
            expr = _emit(_translate_expr(asg[eq + 1 :]))
            ctype = next(
                c.spark_type for c in t.cols if c.name == cname
            )
            updated[cname] = (
                f"IF(CAST(({pred}) AS BOOLEAN), "
                f"CAST(({expr}) AS {ctype}), `{cname}`)"
            )
        t.df = t.df.select(*[
            F.expr(updated[f]).alias(f) if f in updated else F.col(f"`{f}`")
            for f in t.df.columns
        ])

    #: conversions with identical in-memory layout — the only MODIFYs
    #: allow_non_metadata_alters=0 permits (AlterCommands.cpp
    #: isMetadataOnlyConversion): same type, reinterpret-equal widths,
    #: and Enum value APPENDS (checked separately)
    _META_ONLY_PAIRS = {
        ("UInt16", "Date"), ("Date", "UInt16"),
        ("UInt32", "DateTime"), ("DateTime", "UInt32"),
        ("Int32", "UInt32"), ("UInt32", "Int32"),
        ("Int64", "UInt64"), ("UInt64", "Int64"),
        ("Int16", "UInt16"), ("UInt16", "Int16"),
        ("Int8", "UInt8"), ("UInt8", "Int8"),
    }

    def _check_metadata_only(self, t: _Table, a: list[str]) -> None:
        """SET allow_non_metadata_alters=0: reject alters that would
        rewrite data (reference error 524 ALTER_OF_COLUMN_IS_FORBIDDEN);
        metadata-only conversions and Enum appends pass."""
        if str(self.settings.get(
            "allow_non_metadata_alters", "1"
        )).strip("'\" ") != "0":
            return
        op = _kw(a[0])
        sub = _kw(a[1]) if len(a) > 1 else ""
        if (op, sub) in (("DROP", "COLUMN"), ("RENAME", "COLUMN")):
            raise DialectError(
                "ALTER of column is forbidden: non-metadata alter (524)"
            )
        if (op, sub) != ("MODIFY", "COLUMN"):
            return
        j = 2
        if j + 1 < len(a) and _kw(a[j]) == "IF" and _kw(a[j + 1]) == "EXISTS":
            j += 2
        cname9 = a[j].strip('`"')
        rest9 = a[j + 1 :]
        col9 = next((c for c in t.cols if c.name == cname9), None)
        if col9 is None or not rest9:
            return
        if _kw(rest9[0]) in ("DEFAULT", "MATERIALIZED", "ALIAS", "COMMENT"):
            return  # default-only change: metadata
        if any(
            _kw(x) == "TTL" and _paren_depth_at(rest9, k9) == 0
            for k9, x in enumerate(rest9)
        ) and str(self.settings.get(
            "materialize_ttl_after_modify", "1"
        )).strip("'\" ") != "0":
            raise DialectError(
                "ALTER of column is forbidden: TTL materialization (524)"
            )
        _, consumed9 = _map_type(rest9, 0)
        new_ch = _render_compact(rest9[:consumed9])
        old_ch = col9.ch_type or ""
        o9, n9 = old_ch.strip(), new_ch.strip()
        if o9 == n9 or (o9, n9) in self._META_ONLY_PAIRS:
            return
        if o9.startswith("Enum") and n9.startswith("Enum"):
            olds = dict(re.findall(r"'((?:[^'\\]|\\.)*)'\s*=\s*(-?\d+)", o9))
            news = dict(re.findall(r"'((?:[^'\\]|\\.)*)'\s*=\s*(-?\d+)", n9))
            if o9[:5] == n9[:5] and all(
                news.get(k9e) == v9e for k9e, v9e in olds.items()
            ):
                return  # pure value append: metadata-only
        raise DialectError(
            "ALTER of column is forbidden: non-metadata conversion (524)"
        )

    def _alter_action(self, t: _Table, a: list[str]) -> None:
        op = _kw(a[0])
        self._check_metadata_only(t, a)
        j = 1
        if op == "ADD" and j < len(a) and _kw(a[j]) == "COLUMN":
            j += 1
            if_not_exists = False
            if (
                j + 2 < len(a) and _kw(a[j]) == "IF"
                and _kw(a[j + 1]) == "NOT" and _kw(a[j + 2]) == "EXISTS"
            ):
                if_not_exists = True
                j += 3
            # position suffix: AFTER col | FIRST
            after = None
            first = False
            body = a[j:]
            if len(body) >= 2 and _kw(body[-2]) == "AFTER":
                after, body = body[-1].strip('`"'), body[:-2]
            elif body and _kw(body[-1]) == "FIRST":
                first, body = True, body[:-1]
            new_cols = self._parse_coldefs(body)
            self._infer_untyped(new_cols)
            if (
                if_not_exists and body and _is_ident(body[0])
                and any(
                    x.name.startswith(body[0].strip('`"') + ".")
                    or x.name == body[0].strip('`"')
                    for x in t.cols
                )
            ):
                # IF NOT EXISTS checks the declared NAME (a Nested group
                # counts as existing if any member does)
                return
            for c in new_cols:
                if any(x.name == c.name for x in t.cols):
                    continue
                d = c.default or _type_default(c.spark_type, c.nullable)
                if "." in c.name and c.spark_type.lower().startswith("array<"):
                    # a new Nested member keeps the group's offsets: the
                    # default array matches the sibling's length
                    # (NestedColumn shared offsets)
                    prefix = c.name.split(".", 1)[0] + "."
                    sib = next(
                        (x for x in t.cols
                         if x.name.startswith(prefix) and x.name != c.name),
                        None,
                    )
                    if sib is not None and not c.default:
                        elem = _type_default(c.spark_type[6:-1], False)
                        d = (
                            f"transform(`{sib.name}`, __nd -> "
                            f"CAST({elem} AS {c.spark_type[6:-1]}))"
                        )
                t.df = t.df.withColumn(c.name, F.expr(d).cast(c.spark_type))
                if not c.default:
                    c.virtual_default = True
                if first:
                    t.cols.insert(0, c)
                    first = False
                    after = c.name  # siblings follow in declared order
                elif after is not None:
                    idx = next(
                        (k + 1 for k, x in enumerate(t.cols)
                         if x.name == after), len(t.cols),
                    )
                    t.cols.insert(idx, c)
                    after = c.name
                else:
                    t.cols.append(c)
            t.df = t.df.select(*[f"`{c.name}`" for c in t.cols])
            return
        if op == "DROP" and j < len(a) and _kw(a[j]) == "COLUMN":
            j += 1
            if j + 1 < len(a) and _kw(a[j]) == "IF" and _kw(a[j + 1]) == "EXISTS":
                j += 2
            cname = "".join(x.strip('`"') for x in a[j:])
            # dropping a Nested group name drops every member column
            doomed = {
                c.name for c in t.cols
                if c.name == cname or c.name.startswith(cname + ".")
            }
            t.cols = [c for c in t.cols if c.name not in doomed]
            for d in doomed:
                t.df = t.df.drop(d)
            return
        if op == "MODIFY" and j < len(a) and _kw(a[j]) == "COLUMN":
            j += 1
            if_exists = False
            if j + 1 < len(a) and _kw(a[j]) == "IF" and _kw(a[j + 1]) == "EXISTS":
                if_exists = True
                j += 2
            cname = a[j].strip('`"')
            j += 1
            while j + 1 < len(a) and a[j] == "." and _is_ident(a[j + 1]):
                cname += "." + a[j + 1].strip('`"')
                j += 2
            col = next((c for c in t.cols if c.name == cname), None)
            if col is None:
                if if_exists:
                    return
                raise DialectError(f"MODIFY unknown column {cname}")
            rest = a[j:]
            if rest and _kw(rest[0]) in ("DEFAULT", "MATERIALIZED", "ALIAS"):
                col.default = _emit(_translate_expr(rest[1:]))
                col.default_raw = ch_expr(rest[1:])
                col.default_kind = _kw(rest[0])
                col.hidden = col.default_kind in ("MATERIALIZED", "ALIAS")
                return
            if not rest:
                return
            spark_type, consumed = _map_type(rest, 0)
            col.spark_type = spark_type
            col.ch_type = _render_compact(rest[:consumed])
            # trailing DEFAULT/MATERIALIZED/ALIAS / TTL after the type
            tail = rest[consumed:]
            while tail:
                tk = _kw(tail[0])
                if tk in ("DEFAULT", "MATERIALIZED", "ALIAS"):
                    stop = next(
                        (
                            k for k in range(1, len(tail))
                            if _paren_depth_at(tail, k) == 0
                            and _kw(tail[k]) in ("TTL", "CODEC", "COMMENT")
                        ),
                        len(tail),
                    )
                    col.default = _emit(_translate_expr(tail[1:stop]))
                    col.default_raw = ch_expr(tail[1:stop])
                    col.default_kind = tk
                    col.hidden = tk in ("MATERIALIZED", "ALIAS")
                    tail = tail[stop:]
                elif tk == "TTL":
                    stop = next(
                        (
                            k for k in range(1, len(tail))
                            if _paren_depth_at(tail, k) == 0
                            and _kw(tail[k]) in (
                                "DEFAULT", "CODEC", "COMMENT",
                            )
                        ),
                        len(tail),
                    )
                    col.ttl_raw = ch_expr(tail[1:stop])
                    tail = tail[stop:]
                elif tk == "CODEC" and len(tail) > 1 and tail[1] == "(":
                    tail = tail[_match_paren(tail, 1) + 1 :]
                else:
                    tail = tail[1:]
            if col.virtual_default:
                new_val = F.expr(
                    _type_default(spark_type, col.nullable)
                ).cast(spark_type)
            else:
                old_st = next(
                    (
                        f.dataType.simpleString()
                        for f in (t.df.schema if t.df is not None else [])
                        if f.name == cname
                    ),
                    "",
                )
                ints_m = ("tinyint", "smallint", "int", "bigint")
                # integer -> Date/DateTime conversions read day numbers /
                # unix seconds like the reference (FunctionsConversion.h)
                if spark_type.lower() == "date" and old_st in ints_m:
                    new_val = F.expr(
                        f"DATE_ADD(DATE '1970-01-01', "
                        f"CAST(pmod(`{cname}`, 65536) AS INT))"
                    )
                elif (
                    spark_type.lower() == "timestamp" and old_st in ints_m
                ):
                    new_val = F.expr(f"timestamp_seconds(`{cname}`)")
                else:
                    new_val = F.col(f"`{cname}`").cast(spark_type)
            fs = re.match(r"FixedString\((\d+)\)", col.ch_type)
            if fs:
                # FixedString(n) pads stored values to width with NULs
                new_val = F.rpad(
                    F.col(f"`{cname}`").cast("string"),
                    int(fs.group(1)), "\x00",
                )
            t.df = t.df.withColumn(cname, new_val).select(
                *[f"`{c.name}`" for c in t.cols]
            )
            return
        if op == "RENAME" and j < len(a) and _kw(a[j]) == "COLUMN":
            j += 1
            sep = next(
                (k for k in range(j, len(a)) if _kw(a[k]) == "TO"), -1
            )
            old = "".join(x.strip('`"') for x in a[j:sep])
            new = "".join(x.strip('`"') for x in a[sep + 1 :])

            def _ren_expr(expr: str | None) -> str | None:
                # the reference rewrites references to the renamed
                # column inside other columns' DEFAULT/MATERIALIZED
                # expressions (AlterCommands::apply → renameColumn —
                # 01275/01276 lock this in)
                if not expr or old not in expr:
                    return expr
                expr = re.sub(
                    rf"(?<![\w`]){re.escape(old)}(?![\w`])", new, expr
                )
                return expr.replace(f"`{old}`", f"`{new}`")

            for c in t.cols:
                if c.name == old:
                    c.name = new
                c.default = _ren_expr(c.default)
                c.default_raw = _ren_expr(c.default_raw)
            t.df = t.df.withColumnRenamed(old, new)
            return
        if op == "CLEAR" and j < len(a) and _kw(a[j]) == "COLUMN":
            j += 1
            if j + 1 < len(a) and _kw(a[j]) == "IF" and _kw(a[j + 1]) == "EXISTS":
                j += 2
            cname = a[j].strip('`"')
            col = next((c for c in t.cols if c.name == cname), None)
            if col is None:
                return
            d = col.default or _type_default(col.spark_type, col.nullable)
            t.df = t.df.withColumn(
                cname, F.expr(d).cast(col.spark_type)
            ).select(*[f"`{c.name}`" for c in t.cols])
            return
        if op == "DELETE":
            # ALTER ... DELETE WHERE pred — synchronous mutation
            k = 1 if _kw(a[1]) == "WHERE" else 0
            pred = _emit(_translate_expr(a[k + 1 :]))
            # NULL predicate rows are NOT deleted (mutation filters on
            # pred = TRUE only)
            t.df = t.df.filter(
                F.expr(f"CAST(({pred}) AS BOOLEAN) IS NOT TRUE")
            )
            return
        if op == "COMMENT":
            return
        if op in ("ADD", "DROP", "CLEAR", "MATERIALIZE") and j < len(a) and _kw(
            a[j]
        ) in ("INDEX", "PROJECTION"):
            # skipping indexes / projections are physical-layout hints
            # with no query semantics — but SHOW CREATE lists them, so
            # ADD/DROP INDEX keep the rendered-definition registry
            if _kw(a[j]) == "INDEX" and op in ("ADD", "DROP"):
                body = a[j:]
                after = None
                if len(body) >= 2 and _kw(body[-2]) == "AFTER":
                    after, body = body[-1].strip('`"'), body[:-2]
                if op == "ADD":
                    rendered = _render_index_defs(body)
                    for r in rendered:
                        nm = r.split()[1]
                        t.indices = [
                            x for x in t.indices if x.split()[1] != nm
                        ]
                        if after is not None:
                            pos = next(
                                (
                                    k + 1 for k, x in enumerate(t.indices)
                                    if x.split()[1] == after
                                ),
                                len(t.indices),
                            )
                            t.indices.insert(pos, r)
                        else:
                            t.indices.append(r)
                else:
                    k2 = j + 1
                    if (
                        k2 + 1 < len(a) and _kw(a[k2]) == "IF"
                        and _kw(a[k2 + 1]) == "EXISTS"
                    ):
                        k2 += 2
                    nm = a[k2].strip('`"')
                    t.indices = [
                        x for x in t.indices if x.split()[1] != nm
                    ]
            return
        if op == "DROP" and j < len(a) and _kw(a[j]) == "PARTITION":
            # DROP PARTITION v: remove rows whose partition expression
            # equals the literal (single-expression partitioning)
            if not t.partition_by:
                raise DialectError("DROP PARTITION on unpartitioned table")
            lit = _emit(_translate_expr(a[j + 1 :]))
            t.df = t.df.filter(
                F.expr(
                    f"NOT (CAST({t.partition_by} AS STRING) <=> "
                    f"CAST({lit} AS STRING))"
                )
            )
            dropped = lit.strip("'`\"")
            t.parts = [p for p in t.parts if p[0] != dropped]
            return
        raise DialectError(f"unsupported ALTER action {_emit(a[:2])}")

    @staticmethod
    def _totals_fix_row(fields, r) -> tuple:
        """NULLs in a totals row become type defaults
        (Processors/Transforms/TotalsHavingTransform.cpp)."""
        vals = []
        for f, v in zip(fields, r):
            if v is None:
                t = f.dataType.simpleString()
                if t in (
                    "tinyint", "smallint", "int", "bigint",
                    "double", "float",
                ) or t.startswith("decimal"):
                    v = 0
                elif t == "string":
                    v = ""
            vals.append(v)
        return tuple(vals)

    @staticmethod
    def _ch_literal(v) -> str | None:
        """Render a collected Python value as a ClickHouse literal for
        the totals-under-join replay; None = unrepresentable (caller
        falls back to no-totals)."""
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return "1" if v else "0"
        if isinstance(v, int):
            return str(v)
        if isinstance(v, float):
            return repr(v)
        if isinstance(v, str):
            esc = v.replace("\\", "\\\\").replace("'", "\\'")
            return f"'{esc}'"
        return None

    _JOIN_MODS = {
        "ANY", "ALL", "LEFT", "RIGHT", "FULL", "INNER", "OUTER",
        "SEMI", "ANTI", "ASOF", "GLOBAL", "CROSS", "JOIN",
    }

    def _totals_under_join(self, toks: list[str]) -> DataFrame | None:
        """WITH TOTALS inside joined subqueries (00150): the reference
        runs the two sides' totals blocks through the same join, a side
        without TOTALS contributing a row of column defaults
        (src/Processors/QueryPlan/TotalsHavingStep.cpp; HashJoin
        joinTotals).  Emulated by re-running the outer join with each
        subquery replaced by a one-row literal SELECT of that side's
        totals (or defaults) block."""
        if _kw(toks[0]) != "SELECT":
            return None
        depth = 0
        fr = None
        for i, t in enumerate(toks):
            if t == "(":
                depth += 1
            elif t == ")":
                depth -= 1
            elif depth == 0 and _kw(t) == "FROM":
                fr = i
                break
        if fr is None or fr + 1 >= len(toks) or toks[fr + 1] != "(":
            return None
        close_a = _match_paren(toks, fr + 1)
        sub_a = toks[fr + 2:close_a]
        # optional alias + join-modifier words, then the second subquery
        j = close_a + 1
        while j < len(toks) and _kw(toks[j]) != "JOIN":
            if _kw(toks[j]) in self._JOIN_MODS or _kw(toks[j]) == "AS" \
                    or _is_ident(toks[j]):
                j += 1
            else:
                return None
        if j >= len(toks) or j + 1 >= len(toks) or toks[j + 1] != "(":
            return None
        mid = toks[close_a + 1:j + 1]
        close_b = _match_paren(toks, j + 1)
        sub_b = toks[j + 2:close_b]
        tail = toks[close_b + 1:]

        def _has_totals(sub: list[str]) -> bool:
            return any(
                _kw(x) == "TOTALS" and _paren_depth_at(sub, k) == 0
                for k, x in enumerate(sub)
            )

        def _strip_totals(sub: list[str]) -> list[str]:
            out = []
            k = 0
            while k < len(sub):
                if (
                    _kw(sub[k]) == "WITH" and k + 1 < len(sub)
                    and _kw(sub[k + 1]) == "TOTALS"
                    and _paren_depth_at(sub, k) == 0
                ):
                    k += 2
                    continue
                out.append(sub[k])
                k += 1
            return out

        ta, tb = _has_totals(sub_a), _has_totals(sub_b)
        if not (ta or tb):
            return None
        if any(
            _kw(x) == "JOIN" and _paren_depth_at(tail, k) == 0
            for k, x in enumerate(tail)
        ):
            return None  # >2-way joins: out of scope, keep regular path
        sa, sb = _strip_totals(sub_a), _strip_totals(sub_b)
        regular = self._execute_core(_emit(
            toks[:fr + 1] + ["("] + sa + [")"] + mid
            + ["("] + sb + [")"] + tail
        ))
        if regular is None:
            return None

        def _side_literal(sub: list[str], has: bool) -> list[str] | None:
            """One-row literal SELECT of the side's totals (or
            defaults) block, in ClickHouse syntax.  `sub` keeps its
            TOTALS when present (the recursive execute splits the block
            onto `_daisy_totals`); a totals-less side only contributes
            its schema for the defaults row."""
            df_s = self._execute_core(_emit(sub))
            if df_s is None:
                return None
            fields = df_s.schema.fields
            if has:
                trows = getattr(df_s, "_daisy_totals", None)
                if not trows:
                    return None
                row = trows[0]
            else:
                row = self._totals_fix_row(
                    fields, tuple(None for _ in fields)
                )
            items = []
            for f, v in zip(fields, row):
                lit = self._ch_literal(v)
                if lit is None:
                    return None
                items.append(f"{lit} AS `{f.name}`")
            return tokenize("SELECT " + ", ".join(items))

        lit_a = _side_literal(sub_a, ta)
        lit_b = _side_literal(sub_b, tb)
        if lit_a is None or lit_b is None:
            regular._daisy_totals = []  # type: ignore[attr-defined]
            return regular
        tot_df = self._execute_core(_emit(
            toks[:fr + 1] + ["("] + lit_a + [")"] + mid
            + ["("] + lit_b + [")"] + tail
        ))
        if tot_df is None:
            return regular
        fixed = [
            self._totals_fix_row(tot_df.schema.fields, tuple(r))
            for r in tot_df.collect()
        ]
        regular._daisy_totals = fixed  # type: ignore[attr-defined]
        return regular

    def _split_totals(self, df: DataFrame | None) -> DataFrame | None:
        """WITH TOTALS: the dialect tags the totals row with a hidden
        `__is_total` marker.  The reference emits totals as a SEPARATE
        block (empty line, then one row with group keys at their type
        defaults — Processors/Transforms/TotalsHavingTransform.cpp).
        Regular rows come back as the DataFrame; the rendered totals rows
        ride on the `_daisy_totals` attribute for script-level renderers."""
        if df is None or "__is_total" not in df.columns:
            return df
        # constant-only group keys leave the marker NULL for the global
        # set (Spark null-extends the whole expression) — NULL = totals
        marker = F.coalesce(F.col("__is_total"), F.lit(1))
        regular = df.filter(marker == 0).drop("__is_total")
        trows = df.filter(marker == 1).drop("__is_total").collect()
        fields = [f for f in df.schema.fields if f.name != "__is_total"]
        fixed = []
        for r in trows:
            vals = []
            for f, v in zip(fields, r):
                if v is None:
                    t = f.dataType.simpleString()
                    if t in (
                        "tinyint", "smallint", "int", "bigint",
                        "double", "float",
                    ) or t.startswith("decimal"):
                        v = 0
                    elif t == "string":
                        v = ""
                vals.append(v)
            fixed.append(tuple(vals))
        regular._daisy_totals = fixed  # type: ignore[attr-defined]
        return regular

    def _lv_sources_empty(self, toks: list[str]) -> bool:
        """True iff every script-engine table referenced by the live-view
        query currently holds zero rows (and at least one is referenced).
        Drives the empty-source keyless-aggregate zero rewrite."""
        refs = [t for t in self.tables if t in toks]
        if not refs:
            return False
        for name in refs:
            t = self.tables[name]
            if t.df is not None and not t.df.isEmpty():
                return False
        return True

    def _resolve_live_views(self, toks: list[str]) -> list[str]:
        """Refresh + register every referenced live view as a snapshot
        temp view, and substitute `_version` with the literal version."""
        hit_version = None
        for name in self.live_views:
            if name in toks:
                rows, schema, ver = self._lv_refresh(name)
                self.spark.createDataFrame(
                    rows, schema
                ).createOrReplaceTempView(name)
                hit_version = ver
        if hit_version is None:
            return toks
        return [
            f"{hit_version} AS _version" if t == "_version" else t
            for t in toks
        ]

    def _watch(self, toks: list[str]) -> DataFrame:
        name, i = self._table_name(toks, 1)
        if name not in self.live_views:
            raise DialectError(f"WATCH of unknown live view {name}")
        events = i < len(toks) and _kw(toks[i]) == "EVENTS"
        rows, schema, ver = self._lv_refresh(name)
        if events:
            return self.spark.createDataFrame(
                [(ver,)], "version BIGINT"
            )
        out_rows = [r + (ver,) for r in rows]
        from pyspark.sql import types as T

        out_schema = T.StructType(
            list(schema.fields)
            + [T.StructField("_version", T.LongType(), False)]
        )
        return self.spark.createDataFrame(out_rows, out_schema)

    def _parse_coldefs(self, toks: list[str]) -> list[_Col]:
        from daisy_spark.plans.dialect import _TYPE_ENV_CTX

        cols = []
        # CONSTRAINT name CHECK expr — collected for INSERT-time
        # validation (reference error 469, ConstraintsDescription);
        # caller picks them off _last_constraints
        self._last_constraints: list[list[str]] = []
        env: dict[str, str] = {}  # earlier columns, for DEFAULT typing
        for part in _split_top(toks, ","):
            if not part:
                continue
            head = _kw(part[0])
            if head == "CONSTRAINT":
                kx = next(
                    (k for k, tk in enumerate(part) if _kw(tk) == "CHECK"),
                    -1,
                )
                if kx > 0:
                    self._last_constraints.append(part[kx + 1 :])
                continue
            if head in ("INDEX", "CONSTRAINT", "PROJECTION"):
                continue  # storage-side metadata: no query semantics
            if head in ("PRIMARY",):
                continue
            name = part[0].strip('`"')
            j = 1
            # dotted names: Nested member columns (`nest.x Array(T)`)
            while (
                j + 1 < len(part) and part[j] == "."
                and _is_ident(part[j + 1])
            ):
                name += "." + part[j + 1].strip('`"')
                j += 2
            # Nested(a T, b U) = parallel arrays named name.a, name.b
            # (DataTypeNested flattens to Array columns; docs/nested)
            if (
                len(part) > j + 1
                and _kw(part[j]) == "NESTED"
                and part[j + 1] == "("
            ):
                close = _match_paren(part, j + 1)
                for mem in _split_top(part[j + 2 : close], ","):
                    if not mem:
                        continue
                    mname = mem[0].strip('`"')
                    mtype, _ = _map_type(mem, 1)
                    cols.append(_Col(
                        f"{name}.{mname}",
                        f"array<{mtype}>",
                        f"Array({_render_compact(mem[1:])})",
                        False,
                    ))
                continue
            # Array(Tuple(named members)) flattens like Nested when the
            # tuple elements are NAMED (flatten_nested=1 default:
            # DataTypeNested) — a.key Array(K), a.value Array(V)
            if (
                len(part) > j + 3
                and _kw(part[j]) == "ARRAY" and part[j + 1] == "("
                and _kw(part[j + 2]) == "TUPLE" and part[j + 3] == "("
            ):
                close_t = _match_paren(part, j + 3)
                mems = [
                    m for m in _split_top(part[j + 4 : close_t], ",") if m
                ]
                from daisy_spark.chsyntax import _TYPE_CANON

                named = mems and all(
                    len(m) >= 2 and _is_ident(m[0])
                    and m[0].strip('`"').lower() not in _TYPE_CANON
                    and m[1] != "("
                    for m in mems
                )
                if named:
                    for mem in mems:
                        mname = mem[0].strip('`"')
                        mtype, _ = _map_type(mem, 1)
                        cols.append(_Col(
                            f"{name}.{mname}",
                            f"array<{mtype}>",
                            f"Array({_render_compact(mem[1:])})",
                            False,
                        ))
                    continue
            nullable = any(_kw(x) == "NULLABLE" for x in part[j : j + 2])
            if len(part) > j and _kw(part[j]) in (
                "DEFAULT", "MATERIALIZED", "ALIAS",
            ):
                # no declared type: inferred from the default expression
                # after all columns parse (_infer_untyped)
                spark_type, ch_type = "", ""
            else:
                ch_type_start = j
                spark_type, j = _map_type(part, j)
                ch_type = _render_compact(part[ch_type_start:j])
            default = default_raw = None
            hidden = False
            kind = "DEFAULT"
            col_ttl = ""
            while j < len(part):
                kw = _kw(part[j])
                if kw in ("MATERIALIZED", "ALIAS"):
                    hidden = True
                    kind = kw
                    kw = "DEFAULT"  # parse the expression identically
                if kw == "DEFAULT":
                    # expression runs until the next modifier keyword at
                    # paren depth 0 (CODEC only when called: a column may
                    # legitimately be named `codec`)
                    k = j + 1
                    depth = 0
                    while k < len(part):
                        tok = part[k]
                        if tok == "(":
                            depth += 1
                        elif tok == ")":
                            depth -= 1
                        elif depth == 0:
                            kw2 = _kw(tok)
                            if kw2 in ("TTL", "COMMENT") or (
                                kw2 == "CODEC"
                                and k + 1 < len(part)
                                and part[k + 1] == "("
                            ):
                                break
                        k += 1
                    # translate WITH the earlier columns' types visible
                    # (decimal division truncation needs the numerator's
                    # declared scale)
                    tok_env = _TYPE_ENV_CTX.set(
                        {**(_TYPE_ENV_CTX.get() or {}), **env}
                    )
                    # a flattened Nested member is one dotted-name column
                    # (`dcount ALIAS length(c.d)` — 01521): merge the
                    # `c . d` triple into its backquoted column name
                    dot_names = {c.name for c in cols if "." in c.name}
                    expr_toks = list(part[j + 1 : k])
                    if dot_names:
                        merged: list[str] = []
                        m9 = 0
                        while m9 < len(expr_toks):
                            t9 = expr_toks[m9]
                            if (
                                m9 + 2 < len(expr_toks)
                                and expr_toks[m9 + 1] == "."
                                and f"{t9.strip('`')}."
                                f"{expr_toks[m9 + 2].strip('`')}"
                                in dot_names
                                and (not merged or merged[-1] != ".")
                            ):
                                merged.append(
                                    f"`{t9.strip('`')}."
                                    f"{expr_toks[m9 + 2].strip('`')}`"
                                )
                                m9 += 3
                            else:
                                merged.append(t9)
                                m9 += 1
                        expr_toks = merged
                    try:
                        default = _emit(_translate_expr(expr_toks))
                    finally:
                        _TYPE_ENV_CTX.reset(tok_env)
                    default_raw = ch_expr(part[j + 1 : k])
                    j = k
                elif kw == "EPHEMERAL":
                    raise DialectError(f"unsupported column kind {kw}")
                elif kw == "NOT" or kw == "NULL":
                    nullable = kw == "NULL"
                    j += 2 if kw == "NOT" else 1
                elif kw in ("CODEC",) and j + 1 < len(part) and part[j + 1] == "(":
                    j = _match_paren(part, j + 1) + 1
                elif kw == "TTL":
                    # column TTL: SHOW CREATE fidelity only
                    k = j + 1
                    depth = 0
                    while k < len(part):
                        if part[k] == "(":
                            depth += 1
                        elif part[k] == ")":
                            depth -= 1
                        elif depth == 0 and _kw(part[k]) in (
                            "COMMENT", "CODEC", "DEFAULT",
                        ):
                            break
                        k += 1
                    col_ttl = ch_expr(part[j + 1 : k])
                    j = k
                elif kw == "COMMENT":
                    break
                else:
                    j += 1
            if ch_type:
                env[name] = ch_type_canon(ch_type)
            cols.append(
                _Col(name, spark_type, ch_type, nullable, default,
                     default_raw, hidden, default_kind=kind,
                     ttl_raw=col_ttl)
            )
        if not cols:
            raise DialectError("CREATE TABLE with no columns")
        return cols

    @staticmethod
    def _int_arith_ch_type(raw: str, env: dict[str, str]) -> str | None:
        """Reference result type of a simple integer `A op B` DEFAULT
        expression (NumberTraits.h: + - * promote to the next size up
        of the wider operand, capped at 64 bits; either side signed —
        or any subtraction — makes the result signed; / is Float64).
        The global inferencer deliberately leaves int arithmetic to the
        runtime; DESCRIBE's declared type needs the reference rule."""
        from daisy_spark.plans.dialect import (
            _ch_type_of, _match_paren, _split_top, tokenize,
        )

        toks = tokenize(raw)
        depth = 0
        op_at = None
        for k, t in enumerate(toks):
            if t in ("(", "["):
                depth += 1
            elif t in (")", "]"):
                depth -= 1
            elif depth == 0 and t in ("+", "-", "*", "/") and k > 0:
                if toks[k - 1] in ("(", "[", ",", "+", "-", "*", "/"):
                    continue  # unary sign
                if op_at is not None:
                    return None  # keep to the single-op shape
                op_at = (k, t)
        if op_at is None:
            return None
        k, op = op_at
        sides = []
        for part in (toks[:k], toks[k + 1 :]):
            t0 = _ch_type_of(part, env)
            m = re.fullmatch(r"(U?)Int(8|16|32|64)", t0 or "")
            if not m:
                return None
            sides.append((m.group(1) == "", int(m.group(2))))
        if op == "/":
            return "Float64"
        signed = op == "-" or sides[0][0] or sides[1][0]
        width = min(max(sides[0][1], sides[1][1]) * 2, 64)
        return f"{'' if signed else 'U'}Int{width}"

    def _infer_untyped(self, cols: list[_Col]) -> None:
        """Columns declared with only DEFAULT/MATERIALIZED/ALIAS take the
        expression's type (a zero-row analyze, no job runs)."""
        if all(c.spark_type for c in cols):
            return
        df = self.spark.range(1)
        for c in cols:
            if c.spark_type:
                df = df.withColumn(
                    c.name,
                    F.expr(_type_default(c.spark_type, c.nullable)).cast(
                        c.spark_type
                    ),
                )
        from daisy_spark.plans.dialect import _ch_type_of

        env = {
            c.name: ch_type_canon(c.ch_type) for c in cols if c.ch_type
        }
        for c in cols:
            if not c.spark_type:
                df = df.withColumn(c.name, F.expr(c.default or "NULL"))
                c.spark_type = dict(df.dtypes)[c.name]
                # reference-side type: the declared-type rules (decimal
                # class/scale preservation) beat Spark's widened result
                cht = None
                if c.default_raw:
                    try:
                        cht = _ch_type_of(tokenize(c.default_raw), env)
                    except Exception:  # noqa: BLE001
                        cht = None
                if cht is None and c.default_raw:
                    cht = self._int_arith_ch_type(c.default_raw, env)
                c.ch_type = c.ch_type or cht or c.spark_type
                if cht:
                    env[c.name] = ch_type_canon(cht)
        return

    def _parse_key_list(self, toks: list[str], i: int) -> tuple[list[str], int]:
        n = len(toks)
        if i < n and _kw(toks[i]) == "TUPLE" and i + 1 < n and toks[i + 1] == "(":
            close = _match_paren(toks, i + 1)
            parts = _split_top(toks[i + 2 : close], ",")
            return [_emit(_translate_expr(p)) for p in parts if p], close + 1
        if i < n and toks[i] == "(":
            close = _match_paren(toks, i)
            parts = _split_top(toks[i + 1 : close], ",")
            return [_emit(_translate_expr(p)) for p in parts if p], close + 1
        # bare expression (possibly with function calls): consume balanced
        # parens, stop at the next top-level clause keyword
        j = i
        depth = 0
        while j < n:
            if toks[j] == "(":
                depth += 1
            elif toks[j] == ")":
                if depth == 0:
                    break
                depth -= 1
            elif depth == 0 and _kw(toks[j]) in _CLAUSE_KW:
                break
            j += 1
        expr = toks[i:j]
        if not expr:
            return [], j
        return [_emit(_translate_expr(expr))], j

    # -- INSERT ----------------------------------------------------------

    def _insert(self, toks: list[str]) -> None:
        i = 1
        if _kw(toks[i]) != "INTO":
            raise DialectError("INSERT requires INTO")
        i += 1
        if _kw(toks[i]) == "TABLE":
            i += 1
        name, i = self._table_name(toks, i)
        if name not in self.tables:
            raise DialectError(f"INSERT into unknown table {name}")
        t = self.tables[name]
        # a bare INSERT targets the physical (non-MATERIALIZED) columns
        target_cols = [c.name for c in t.cols if not c.hidden]
        if i < len(toks) and toks[i] == "(":
            close = _match_paren(toks, i)
            target_cols = [
                # dotted Nested member names arrive as `n . a` tokens
                x.replace(" ", "").strip('`"')
                for p in _split_top(toks[i + 1 : close], ",")
                for x in [_emit(p)]
            ]
            i = close + 1
        for c in t.cols:
            if c.name in target_cols:
                c.virtual_default = False
        kw = _kw(toks[i]) if i < len(toks) else ""
        rest: list[str] = []
        if kw == "VALUES":
            batch, rest = self._values_batch(t, target_cols, toks[i + 1 :])
        elif kw in ("SELECT", "WITH", "FORMAT") or toks[i] == "(":
            if kw == "FORMAT":
                raise DialectError("INSERT ... FORMAT not supported")
            src = dialect_sql(self.spark, _emit(toks[i:]))
            # INSERT SELECT ... WITH TOTALS: the totals block is an
            # OUTPUT artifact, never inserted (00209)
            if "__is_total" in src.columns:
                src = src.filter(
                    F.coalesce(F.col("__is_total"), F.lit(1)) == 0
                ).drop("__is_total")
            by_name = {c.name: c for c in t.cols}
            # POSITIONAL mapping (the reference maps INSERT SELECT by
            # position); rename first so duplicate source column names
            # (e.g. `toString(x) AS s, s`) can't make F.col ambiguous
            src = src.toDF(*[f"__ins{x}" for x in range(len(src.columns))])
            ints9 = ("tinyint", "smallint", "int", "bigint")
            sel = []
            for x, tc in zip(range(len(src.columns)), target_cols):
                ty9 = by_name[tc].spark_type.lower()
                st9 = src.schema[x].dataType.simpleString()
                # integer sources into Date/DateTime follow the
                # reference's day-number / unix-seconds reading
                if ty9 == "date" and st9 in ints9:
                    sel.append(F.expr(
                        f"DATE_ADD(DATE '1970-01-01', "
                        f"CAST(pmod(`__ins{x}`, 65536) AS INT))"
                    ).alias(tc))
                elif ty9 == "timestamp" and st9 in ints9:
                    sel.append(
                        F.expr(f"timestamp_seconds(`__ins{x}`)").alias(tc)
                    )
                else:
                    sel.append(
                        F.col(f"__ins{x}").cast(by_name[tc].spark_type)
                        .alias(tc)
                    )
            batch = self._fill_defaults(t, src.select(*sel), target_cols)
        else:
            raise DialectError("INSERT requires VALUES or SELECT")
        # an inserted now()/rand()/uuid expression must FREEZE at insert
        # time — lazy plans would re-evaluate it at every later query
        # (00746: rows inserted with now() must age)
        if any(
            _kw(x) in (
                "NOW", "NOW64", "TODAY", "YESTERDAY", "RAND", "RAND64",
                "RANDCONSTANT", "GENERATEUUIDV4", "RANDOMSTRING",
                "RANDOMFIXEDSTRING", "RANDOMSTRINGUTF8", "FUZZBITS",
            )
            for x in toks
        ):
            try:
                batch = batch.localCheckpoint(eager=True)
            except Exception:  # noqa: BLE001
                batch = self.spark.createDataFrame(
                    batch.collect(), batch.schema
                )
        for cexpr in t.constraints:
            from daisy_spark.plans.dialect import _translate_expr

            try:
                csql = _emit(_translate_expr(list(cexpr)))
                bad = batch.filter(
                    ~F.coalesce(F.expr(csql).cast("boolean"), F.lit(False))
                ).limit(1).count()
            except DialectError:
                raise
            except Exception:  # noqa: BLE001
                # a constraint whose expression this engine cannot
                # evaluate is not enforced (pre-round-8 behavior)
                continue
            if bad > 0:
                raise DialectError(
                    f"Constraint violated on INSERT into {name}"
                )
        if t.spec.engine != "Null":
            prev_df = t.df
            sb = self._sorted_batch(t, batch, heavy=(kw != "VALUES"))
            sb = self._record_parts(t, sb)
            t.df = sb if t.df is None else t.df.unionByName(
                sb, allowMissingColumns=True
            )
            # maintain the sort-free twin for the __final view: same
            # rows, same per-insert partition (coalesce(1)), just no
            # primary-key sort.  Extendable only while the twin tracked
            # df (identity check) — any other mutation since last
            # insert reverts FINAL reads to the sorted lineage.
            ub = batch.coalesce(1)
            if prev_df is None:
                t.df_final_src = ub
            elif (
                t.df_final_src is not None
                and t.df_final_src_of is prev_df
            ):
                t.df_final_src = t.df_final_src.unionByName(
                    ub, allowMissingColumns=True
                )
            else:
                t.df_final_src = None
            t.df_final_src_of = t.df
            self._register(t)
        # materialized views fire per inserted block — also for Null
        # sources, whose own data is discarded
        for mv_name, mv in list(self.mat_views.items()):
            if name in mv["srcs"]:
                self._mv_append(mv_name, (name, batch))
        if rest:
            # clickhouse-client ends VALUES at the newline; a script can
            # chain further statements without semicolons
            return self.execute(_emit(rest))
        return None

    def _values_batch(
        self, t: _Table, target_cols: list[str], toks: list[str]
    ) -> tuple[DataFrame, list[str]]:
        """Parse VALUES tuples; returns (batch, remaining_tokens) — the
        remainder is a further statement chained without a semicolon."""
        rows = []
        i = 0
        while i < len(toks):
            # tuples may be juxtaposed with or without commas:
            # VALUES (1, 'a'), (2, 'b') (3, 'c')
            if toks[i] == ",":
                i += 1
                continue
            if toks[i] != "(":
                if rows and _is_ident(toks[i]):
                    break  # next semicolonless statement starts here
                raise DialectError("malformed VALUES tuple")
            close = _match_paren(toks, i)
            elems = [
                _emit(_translate_expr(p))
                for p in _split_top(toks[i + 1 : close], ",")
            ]
            if len(elems) != len(target_cols):
                raise DialectError("VALUES arity != column list")
            rows.append(elems)
            i = close + 1
        rest = toks[i:]
        if not rows:
            return self._empty_df(t), rest
        by_name = {c.name: c for c in t.cols}
        cols = []
        for cname in target_cols:
            c = by_name.get(cname)
            if c is None:
                raise DialectError(f"unknown INSERT column {cname}")
            cols.append(c)
        cast_rows = [
            [
                _cast_sql(val, c.spark_type)
                for val, c in zip(r, cols)
            ]
            for r in rows
        ]
        # single inline VALUES table: one shallow parse regardless of
        # row count (a UNION ALL chain trips the parser's complexity
        # limit in the hundreds of rows — 00500_point_in_polygon_bug)
        names = ", ".join(f"`{c.name}`" for c in cols)
        try:
            df = self.spark.sql(
                "SELECT * FROM VALUES "
                + ", ".join("(" + ", ".join(r) + ")" for r in cast_rows)
                + f" AS __v({names})"
            )
        except Exception:  # noqa: BLE001 — non-foldable exprs: chunked UNION
            selects = [
                "SELECT " + ", ".join(
                    f"{val} AS `{c.name}`" for val, c in zip(r, cols)
                )
                for r in cast_rows
            ]
            df = None
            for k in range(0, len(selects), 50):
                part = self.spark.sql(
                    " UNION ALL ".join(selects[k : k + 50])
                )
                df = part if df is None else df.unionAll(part)
        return self._fill_defaults(t, df, target_cols), rest

    def _fill_defaults(
        self, t: _Table, df: DataFrame, provided: list[str]
    ) -> DataFrame:
        """Add missing columns in declaration order; a DEFAULT expression
        may reference any earlier-computed column (recursive defaults)."""
        for c in t.cols:
            if c.name not in provided:
                d = c.default or _type_default(c.spark_type, c.nullable)
                if (
                    "." in c.name
                    and c.spark_type.lower().startswith("array<")
                    and not c.default
                ):
                    # missing Nested members share the group's offsets:
                    # default arrays match a PROVIDED sibling's length
                    prefix = c.name.split(".", 1)[0] + "."
                    sib = next(
                        (p for p in provided
                         if p.startswith(prefix) and p != c.name),
                        None,
                    )
                    if sib is not None:
                        elem_t = c.spark_type[6:-1]
                        elem = _type_default(elem_t, False)
                        d = (
                            f"transform(`{sib}`, __nd -> "
                            f"CAST({elem} AS {elem_t}))"
                        )
                df = df.withColumn(c.name, F.expr(d).cast(c.spark_type))
        # backticks: Nested member columns carry dots in their NAMES
        return df.select(*[f"`{c.name}`" for c in t.cols])

    def _sorted_batch(
        self, t: _Table, batch: DataFrame, heavy: bool = False
    ) -> DataFrame:
        """One insert = one part: single partition, primary-key sorted,
        insertion order preserved on ties (MergeTreeDataWriter sorts each
        block stably by the sorting key).

        ``heavy`` (INSERT..SELECT / table rebuilds): assign ``__seq``
        BEFORE a repartition shuffle instead of ``coalesce(1)``-ing the
        whole upstream into one task.  coalesce(1) concatenates source
        partitions in partition order, and ``monotonically_increasing_id``
        on the multi-partition source is increasing in exactly that
        (partition, offset) order — so the stable sort by
        ``(keys, __seq)`` reproduces the identical total row order while
        the source scan/projection keeps its parallelism (a 1M-row
        INSERT..SELECT was a single task end-to-end before this).
        VALUES batches are driver-local — nothing to parallelize, and
        the extra shuffle would only add per-insert latency.

        The returned part is PERSISTED (memory-and-disk, released in
        ``close()``): every later SELECT re-executes ``t.df``'s whole
        union-of-parts lineage otherwise — a case that inserts 1M rows
        and then runs four SELECTs paid the generation + single-task
        sort five times.  Persisting also pins one materialization the
        way the reference does (parts are physical), so lazy
        re-evaluation can never disagree with itself."""
        keys = [k for k in t.sort_keys if k and k != "tuple ( )"]
        # a Map sorting key is unsortable in Spark — sort by its entry
        # list instead (same key order semantics at this granularity)
        map_cols = {
            f.name for f in batch.schema
            if f.dataType.simpleString().startswith("map<")
        }
        keys = [
            f"sort_array(map_entries(`{k9s}`))"
            if (k9s := k.strip('`" ')) in map_cols else k
            for k in keys
        ]
        if keys and heavy:
            batch = (
                batch.withColumn("__seq", F.monotonically_increasing_id())
                .repartition(1, F.col("__seq"))
                .sortWithinPartitions(*[F.expr(k) for k in keys], F.col("__seq"))
                .drop("__seq")
            )
        elif keys:
            batch = (
                batch.coalesce(1)
                .withColumn("__seq", F.monotonically_increasing_id())
                .sortWithinPartitions(*[F.expr(k) for k in keys], F.col("__seq"))
                .drop("__seq")
            )
        else:
            batch = batch.coalesce(1)
        batch = batch.persist()
        self._persisted.append(batch)
        return batch

    # -- maintenance -----------------------------------------------------

    def _drop(self, toks: list[str]) -> None:
        i = 1
        if _kw(toks[i]) == "TEMPORARY":
            i += 1
        if _kw(toks[i]) in ("TABLE", "VIEW", "DICTIONARY"):
            i += 1
        elif _kw(toks[i]) == "DATABASE":
            # dictionaries of the dropped namespace go with it (names are
            # flattened, so clear any whose source db matched)
            return None
        if (
            i + 1 < len(toks)
            and _kw(toks[i]) == "IF" and _kw(toks[i + 1]) == "EXISTS"
        ):
            i += 2
        name, i = self._table_name(toks, i)
        self.live_views.pop(name, None)
        self.mat_views.pop(name, None)
        self.storage_join_meta.pop(name, None)
        if self.dictionaries.pop(name, None) is not None:
            self.spark.catalog.dropTempView(name)
        t = self.tables.pop(name, None)
        if t is not None and t.name != name and name in t.aka:
            t.aka.remove(name)  # dropping a Buffer proxy, not the target
        if t is not None and t.name != name and name in t.shard_views:
            del t.shard_views[name]
        self._drop_views(name)
        return None

    def _truncate(self, toks: list[str]) -> None:
        i = 1
        if _kw(toks[i]) == "TABLE":
            i += 1
        if (
            i + 1 < len(toks)
            and _kw(toks[i]) == "IF" and _kw(toks[i + 1]) == "EXISTS"
        ):
            i += 2
        name, _ = self._table_name(toks, i)
        if name in self.tables:
            self.tables[name].df = None
            self.tables[name].parts = []
            self._register(self.tables[name])
        return None

    def _record_parts(self, t: _Table, batch: DataFrame) -> DataFrame:
        """One part per (insert, touched partition), reference naming
        {partition_id}_{min_block}_{max_block}_{level} (MergeTreeData
        part naming).  Unpartitioned tables use partition id 'all'.
        When the table carries the `_part`/`_part_index` virtual columns
        (MergeTreeData.cpp:4826-4827), the batch comes back TAGGED with
        each row's part name and block ordinal.

        Gate on the ORIGINAL declared engine (engine_raw), not
        spec.engine: Memory/Log/Set are remapped to spec.engine
        'MergeTree' for read semantics but have no parts, while
        specialized engines carry full names ('ReplacingMergeTree')."""
        raw_head = (t.engine_raw or "").split("(", 1)[0].strip()
        if not raw_head.endswith("MergeTree"):
            return batch
        pb = (t.partition_by or "").strip()
        if not pb or pb.replace(" ", "") in ("tuple()", "()"):
            pids = ["all"]
            pid_expr = "'all'"
        else:
            pid_expr = f"coalesce(CAST(({pb}) AS STRING), 'all')"
            try:
                pids = sorted(
                    "all" if r[0] is None else r[0]
                    for r in batch.selectExpr(
                        f"CAST(({pb}) AS STRING) AS __p"
                    ).distinct().collect()
                )
            except Exception:  # noqa: BLE001
                pids = ["all"]
                pid_expr = "'all'"
        assigned: dict[str, tuple[str, int]] = {}
        for pid in pids:
            b = t.next_block
            t.next_block += 1
            t.parts.append((pid, b, b, 0))
            assigned[pid] = (f"{pid}_{b}_{b}_0", b)
        if True:  # virtuals ride every MergeTree table's companion view
            name_case = "CASE " + " ".join(
                f"WHEN {pid_expr} = '{pid}' THEN '{nm}'"
                for pid, (nm, _) in assigned.items()
            ) + " ELSE 'all_0_0_0' END"
            idx_case = "CASE " + " ".join(
                f"WHEN {pid_expr} = '{pid}' THEN CAST({b} AS BIGINT)"
                for pid, (_, b) in assigned.items()
            ) + " ELSE CAST(0 AS BIGINT) END"
            batch = batch.withColumn("_part", F.expr(name_case)).withColumn(
                "_part_index", F.expr(idx_case)
            )
        return batch

    @staticmethod
    def _merge_parts(t: _Table, pid_filter: str | None) -> dict[str, str]:
        """OPTIMIZE semantics on the part registry: each partition with
        more than one part merges to (min, max, max_level + 1); single
        parts stay as they are (the reference rewrites nothing).
        Returns the old-part-name -> new-part-name mapping so the
        `_part` virtual column can be retagged."""
        by_pid: dict[str, list[tuple[str, int, int, int]]] = {}
        for p in t.parts:
            by_pid.setdefault(p[0], []).append(p)
        out: list[tuple[str, int, int, int]] = []
        renames: dict[str, str] = {}
        for pid, ps in by_pid.items():
            if (pid_filter is None or pid == pid_filter) and len(ps) > 1:
                merged = (
                    pid,
                    min(x[1] for x in ps),
                    max(x[2] for x in ps),
                    max(x[3] for x in ps) + 1,
                )
                out.append(merged)
                new_nm = f"{pid}_{merged[1]}_{merged[2]}_{merged[3]}"
                for x in ps:
                    renames[f"{pid}_{x[1]}_{x[2]}_{x[3]}"] = new_nm
            else:
                out.extend(ps)
        t.parts = sorted(out, key=lambda p: (p[0], p[1]))
        return renames

    def _optimize(self, toks: list[str]) -> None:
        i = 1
        if _kw(toks[i]) == "TABLE":
            i += 1
        name, i = self._table_name(toks, i)
        if name not in self.tables:
            return None
        t = self.tables[name]
        kws9 = {_kw(x) for x in toks[i:]}
        pid_filter = None
        for j in range(i, len(toks) - 1):
            if _kw(toks[j]) == "PARTITION":
                pid_filter = toks[j + 1].strip("'`\"")
                break
        self._merge_parts(t, pid_filter)
        if t.df is None:
            return None
        # the _part/_part_index virtuals must not enter the merge
        # (Summing would treat them as groupers/values) — strip,
        # merge, then retag rows from the post-merge part registry
        vcols = [
            c for c in ("_part", "_part_index") if c in t.df.columns
        ]
        pb9 = (t.partition_by or "").strip()
        if not pb9 or pb9.replace(" ", "") in ("tuple()", "()"):
            pid_expr9 = "'all'"
        else:
            pid_expr9 = f"coalesce(CAST(({pb9}) AS STRING), 'all')"
        if pid_filter is not None and any(
            p[0] == pid_filter for p in t.parts
        ):
            # OPTIMIZE ... PARTITION merges ONLY that partition: other
            # partitions keep their rows — and their per-insert _part
            # identity — verbatim (parts that didn't merge are never
            # retagged).  A pid that isn't in the registry (old-syntax
            # engines flatten to 'all') falls through to the whole-table
            # merge, which is what the single-partition case means.
            touched9 = t.df.filter(F.expr(f"{pid_expr9} = '{pid_filter}'"))
            rest9 = t.df.filter(
                F.expr(f"NOT ({pid_expr9} = '{pid_filter}')")
            )
            df = read_final(
                touched9.drop(*vcols) if vcols else touched9, t.spec
            )
            if "DEDUPLICATE" in kws9:
                df = df.dropDuplicates()
            df = self._sorted_batch(t, df, heavy=True)
            if vcols:
                head9 = next(
                    (p for p in t.parts if p[0] == pid_filter), None
                )
                nm9, b9 = (
                    (f"{head9[0]}_{head9[1]}_{head9[2]}_{head9[3]}",
                     head9[1])
                    if head9 is not None else ("all_0_0_0", 0)
                )
                df = df.withColumn("_part", F.lit(nm9)).withColumn(
                    "_part_index", F.lit(b9).cast("bigint")
                )
            t.df = rest9.unionByName(df)
            self._register(t)
            return None
        base = t.df.drop(*vcols) if vcols else t.df
        df = read_final(base, t.spec)
        if "DEDUPLICATE" in kws9:
            df = df.dropDuplicates()
        t.df = self._sorted_batch(t, df, heavy=True)
        if vcols and t.parts:
            # full-table OPTIMIZE leaves exactly one part per partition
            # (every multi-part group merged), so the registry head per
            # partition is the exact tag for all of that partition's rows
            by_pid: dict[str, tuple[str, int]] = {}
            for pid9, b1, b2, lv in t.parts:
                if pid9 not in by_pid:
                    by_pid[pid9] = (f"{pid9}_{b1}_{b2}_{lv}", b1)
            nm9 = "CASE " + " ".join(
                f"WHEN {pid_expr9} = '{p9}' THEN '{nm}'"
                for p9, (nm, _) in by_pid.items()
            ) + " ELSE 'all_0_0_0' END"
            ix9 = "CASE " + " ".join(
                f"WHEN {pid_expr9} = '{p9}' THEN CAST({b} AS BIGINT)"
                for p9, (_, b) in by_pid.items()
            ) + " ELSE CAST(0 AS BIGINT) END"
            t.df = t.df.withColumn("_part", F.expr(nm9)).withColumn(
                "_part_index", F.expr(ix9)
            )
        self._register(t)
        return None

    def _describe(self, toks: list[str]) -> DataFrame:
        i = 1
        if _kw(toks[i]) == "TABLE":
            i += 1
        name, _ = self._table_name(toks, i)
        if name not in self.tables:
            raise DialectError(f"DESCRIBE unknown table {name}")
        t = self.tables[name]
        rows = [
            (c.name, ch_type_canon(c.ch_type) if c.ch_type else c.spark_type,
             c.default_kind if c.default else "",
             c.default_raw or "", "", "", c.ttl_raw)
            for c in t.cols
            if c.default_kind != "VIRTUAL"
        ]
        return self.spark.createDataFrame(
            rows,
            "name STRING, type STRING, default_type STRING, "
            "default_expression STRING, comment STRING, "
            "codec_expression STRING, ttl_expression STRING",
        )

    def _set(self, toks: list[str]) -> None:
        from daisy_spark.session import apply_settings

        try:
            pairs = _split_top(toks[1:], ",")
            settings = {}
            for p in pairs:
                if "=" in p:
                    eq = p.index("=")
                    settings[_emit(p[:eq]).strip()] = _emit(p[eq + 1 :]).strip("' ")
            self.settings.update(settings)
            apply_settings(self.spark, settings)
        except Exception:  # noqa: BLE001 - unknown knobs are no-ops
            pass
        return None
