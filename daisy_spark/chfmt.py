"""ClickHouse-style TSV output rendering, shared by the corpus sweep
(tools/corpus_run.py), the single-file diff tool (tools/corpus_one.py)
and the pytest parity suite (tests/test_reference_corpus.py).

One formatter, one loop — the round-5 verdict found the test suite and
the sweep carrying diverged private copies (timedelta / Decimal
rendering), which made 4 files "fail" whose engine output was right.

Rendering rules mirror the reference's TSV writer
(src/Formats/ — writeEscapedString, DecimalField full-scale printing,
ECMAScript shortest-round-trip floats per src/IO/WriteHelpers.h).
"""

import datetime
import decimal
import math
import re


def js_float(s: str) -> str:
    """Format shortest-round-trip float digits the way the reference
    does (same rules as ECMAScript Number::toString: positional for
    10^-7 < |x| < 10^21, exponential outside).  ``s`` is Python's repr
    (which flips to exponent notation at different thresholds)."""
    if "e" not in s and "E" not in s:
        return s
    mant, _, exp = s.partition("e")
    e = int(exp)
    neg = mant.startswith("-")
    digits = mant.lstrip("-").replace(".", "")
    point = mant.lstrip("-").find(".")
    if point < 0:
        point = len(mant.lstrip("-"))
    # exponent of the FIRST digit
    e10 = e + point - 1
    digits = digits.rstrip("0") or "0"
    sign = "-" if neg else ""
    if -7 < e10 < 21:
        if e10 >= len(digits) - 1:
            return sign + digits + "0" * (e10 - len(digits) + 1)
        if e10 >= 0:
            return sign + digits[: e10 + 1] + "." + digits[e10 + 1 :]
        return sign + "0." + "0" * (-e10 - 1) + digits
    m = digits[0] + ("." + digits[1:] if len(digits) > 1 else "")
    return f"{sign}{m}e{'' if e10 >= 0 else '-'}{abs(e10)}"


def fmt(v, nested=False):
    if v is None:
        # composite values render the bare word NULL; top level is \N
        return "NULL" if nested else "\\N"
    if isinstance(v, datetime.datetime):
        s = v.strftime("%Y-%m-%d %H:%M:%S")
        if v.microsecond:  # DateTime64 renders its fractional digits
            s += f".{v.microsecond:06d}"
        return f"'{s}'" if nested else s
    if isinstance(v, datetime.date):
        return f"'{v.isoformat()}'" if nested else v.isoformat()
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, decimal.Decimal):
        # full scale, positional — str(Decimal('0E-8')) is scientific
        return format(v, "f")
    if isinstance(v, datetime.timedelta):
        # DateTime-DateTime renders seconds, Date-Date renders days
        # (reference subtraction yields Int32, never an interval)
        if v.seconds or v.microseconds:
            return str(int(v.total_seconds()))
        return str(v.days)
    if isinstance(v, float):
        if v != v:
            return "nan"
        if v == float("inf"):
            return "inf"
        if v == float("-inf"):
            return "-inf"
        if v == int(v) and abs(v) <= 9007199254740992:
            # negative zero keeps its sign (the reference prints -0)
            if v == 0 and math.copysign(1.0, v) < 0:
                return "-0"
            return str(int(v))
        return js_float(repr(v))
    if isinstance(v, tuple):  # Row (struct) — ClickHouse tuple rendering
        return "(" + ",".join(fmt(x, nested=True) for x in v) + ")"
    if isinstance(v, list):
        return "[" + ",".join(fmt(x, nested=True) for x in v) + "]"
    if isinstance(v, str) and nested:
        # ClickHouse TSV quotes strings inside composite values
        return "'" + (v.replace("\\", "\\\\").replace("\x00", "\\0")
                      .replace("'", "\\'")) + "'"
    if isinstance(v, str):
        # TSV escaping (writeEscapedString): backslash + control chars
        # + apostrophe
        return (
            v.replace("\\", "\\\\").replace("\t", "\\t")
            .replace("\n", "\\n").replace("\r", "\\r")
            .replace("\x00", "\\0").replace("'", "\\'")
        )
    return str(v)


def fmt_f32(v):
    """Float32 columns: the reference prints the float's SHORTEST
    round-trip at 32-bit precision (21.99, not 21.989999771118164)."""
    if isinstance(v, float):
        import numpy as np

        if v != v or v in (float("inf"), float("-inf")) or v == int(v):
            return fmt(v)
        return str(np.float32(v))
    return fmt(v)


def _extreme(vals, want_max):
    """Min/max of one column's values, skipping NULL/NaN like the
    reference's extremes calculator; all-skipped keeps the skip value."""
    def _key(v):
        return tuple(v) if isinstance(v, tuple) else v

    best = None
    for v in vals:
        if v is None or (isinstance(v, float) and v != v):
            continue
        if best is None or (
            (_key(v) > _key(best)) if want_max else (_key(v) < _key(best))
        ):
            best = v
    if best is not None:
        return best
    # all NaN -> nan; all NULL -> NULL
    return next((v for v in vals if v is not None), None)


def render_df(df, outs, extremes=False):
    """Append a DataFrame's rows (and its WITH TOTALS block, if any)
    to ``outs`` in reference TSV rendering.  With ``extremes`` a blank
    line plus min/max rows follow (SETTINGS extremes = 1)."""
    f32 = [fld.dataType.simpleString() == "float"
           for fld in df.schema.fields]

    def _line(r):
        return "\t".join(
            fmt_f32(v) if is32 else fmt(v) for v, is32 in zip(r, f32)
        )

    # Bounded collect: reference tests never byte-match beyond a few
    # million rows, and an expected-error statement over the (capped)
    # lazy numbers range would otherwise hang the shared test JVM on a
    # 1e9-row collect.  CollectLimit stops the scan at the cap.
    rows = df.limit(4_000_001).collect()
    if len(rows) > 4_000_000:
        raise RuntimeError("render cap exceeded (4M rows)")
    for r in rows:
        outs.append(_line(r))
    # WITH TOTALS: separate block after an empty line
    for r in getattr(df, "_daisy_totals", None) or []:
        outs.append("")
        outs.append(_line(r))
    if extremes and rows:
        cols = list(zip(*[tuple(r) for r in rows]))
        outs.append("")
        outs.append(_line([_extreme(c, False) for c in cols]))
        outs.append(_line([_extreme(c, True) for c in cols]))


def render_script(runner, txt: str) -> str:
    """Execute a multi-statement reference test file through an already
    constructed ScriptRunner and return the full rendered output
    (clickhouse-test echo-mode aware).  Caller owns runner.close()."""
    from daisy_spark.plans.script import split_statements_tagged

    outs = []
    echo = False
    for s, expect_err in split_statements_tagged(txt):
        if "-- { echoOn" in s or "-- { echo }" in s:
            echo = True
        elif "-- { echoOff" in s:
            echo = False
        if echo:
            # clickhouse-test echo mode: the statement text (with its
            # comment lines) precedes its own output
            outs.append(s.strip() + ";")
        want_ext = bool(
            re.search(r"(?i)\bextremes\s*=\s*1\b", s)
        ) or str(
            getattr(runner, "settings", {}).get("extremes", "0")
        ).strip("'\" ") == "1"
        if expect_err:
            # `-- { serverError N }` statement: the reference expects a
            # FAILURE and prints nothing.  If ours succeeds instead,
            # render its rows — the honest divergence shows as a diff.
            try:
                df = runner.execute(s)
                if df is not None:
                    render_df(df, outs, extremes=want_ext)
            except Exception:  # noqa: BLE001
                pass
            continue
        df = runner.execute(s)
        if df is None:
            continue
        render_df(df, outs, extremes=want_ext)
    return "\n".join(outs).strip()
