"""Scan the reference's stateless SQL tests for dialect-translatable cases.

Runs every candidate file (pure SELECT statements, no DDL/system tables,
bounded row counts) through plans.dialect.translate + spark.sql and
compares the output with the committed .reference expectation using
ClickHouse TSV rendering. Writes progress to /tmp/corpus_state.json after
every file — fold new matches into tests/test_reference_corpus.py::CORPUS.

A query that hard-crashes the JVM (codegen stack overflow, OOM) kills the
py4j gateway. The runner detects the dead session, records the culprit
file, and force-resets the gateway singletons so a brand-new JVM can
launch in-process; if even that fails it exits with code 42 and the state
file carries the resume point (rerun until exit 0):

    while python tools/corpus_run.py; [ $? -eq 42 ]; do :; done
"""

import collections
import glob
import json
import os
import re
import sys

sys.path.insert(0, "/root/repo")

from daisy_spark.plans.script import ScriptRunner, split_statements  # noqa: E402

STATE = "/tmp/corpus_state.json"

# DDL/INSERT scripts run through plans.script.ScriptRunner; only the
# statement classes with no Spark mapping stay excluded.
SKIP_RE = re.compile(
    r"(?i)\b(SYSTEM\s+(?:STOP|START|FLUSH|RELOAD|DROP|SYNC|RESTART)"
    r"|ATTACH|DETACH|RENAME\s+TABLE"
    r"|KILL|system\.(?!numbers|one\b)|remote\(|cluster\(|file\(|url\("
    # FORMAT TSV/TabSeparated is the default rendering (ScriptRunner
    # strips it); any other format, or inline-data INSERT..FORMAT, skips
    r"|INSERT[^;]*FORMAT\s|FORMAT\s+(?!TSV\b|TabSeparated\b)\w)"
    # expected-error statements are handled per-statement now
    # (split_statements_tagged); files using them are fair game
)
# >10M generated rows: JVM OOM risk on local runs
BIG_RE = re.compile(r"(numbers|range)\s*\(\s*[0-9_]{8,}")
# a groupArray over >=100k rows materializes one huge array; exploding
# it (ARRAY JOIN) then re-scanning the source array per row is O(n^2)
# memory/CPU in Spark's row model and kills the JVM (00041_big_array_join:
# 12 sweep kills).  The reference streams this shape; ours cannot —
# skip with a recorded cause instead of paying a JVM restart per pass.
BIG_AGG_RE = re.compile(
    r"(?is)INSERT[^;]*groupArray[^;]*LIMIT\s+[0-9_]{6,}"
)


from daisy_spark.chfmt import fmt, fmt_f32, render_script  # noqa: E402


def new_session():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("FATAL")
    return spark


def alive(spark) -> bool:
    try:
        spark.sql("SELECT 1").collect()
        return True
    except Exception:  # noqa: BLE001
        return False


def hard_reset():
    """Tear down the dead gateway singletons so getOrCreate launches a
    fresh JVM in this process."""
    from pyspark import SparkContext
    from pyspark.sql import SparkSession

    try:
        if SparkContext._gateway:
            SparkContext._gateway.shutdown()
    except Exception:  # noqa: BLE001
        pass
    SparkContext._active_spark_context = None
    SparkContext._gateway = None
    SparkContext._jvm = None
    SparkSession._instantiatedSession = None
    SparkSession._activeSession = None
    os.environ.pop("PYSPARK_GATEWAY_PORT", None)
    os.environ.pop("PYSPARK_GATEWAY_SECRET", None)


def load_state():
    if os.path.exists(STATE):
        with open(STATE) as f:
            return json.load(f)
    return {"done": [], "matched": [], "killers": [], "fails": {}, "fail_files": {}}


def save_state(st):
    with open(STATE, "w") as f:
        json.dump(st, f)


def main():
    st = load_state()
    # --retry [ClassName|all]: clear previously-failed (and mismatched)
    # files from done so the sweep re-attempts them with current code
    if len(sys.argv) > 1 and sys.argv[1] == "--retry":
        which = sys.argv[2] if len(sys.argv) > 2 else "all"
        redo: set[str] = set()
        for cls, files in st["fail_files"].items():
            if which in ("all", cls):
                redo.update(files)
        if which == "all":
            redo.update(st.get("mismatch", {}))
        st["done"] = [f for f in st["done"] if f not in redo]
        for cls in list(st["fail_files"]):
            if which in ("all", cls):
                st["fails"].pop(cls, None)
                st["fail_files"].pop(cls, None)
        if which == "all":
            st["mismatch"] = {}
        print(f"retrying {len(redo)} files")
    # --recheck-matched: re-verify the CURRENT matched set with HEAD
    # code.  "matched" is otherwise append-only history, not current
    # truth — round 5 shipped 14 red pytest files because stale greens
    # were synced into the test list without re-execution.  Run this
    # before any sync of tests/test_reference_corpus.py::CORPUS.
    if len(sys.argv) > 1 and sys.argv[1] == "--recheck-matched":
        redo = set(st["matched"])
        st["done"] = [f for f in st["done"] if f not in redo]
        st["matched"] = []
        print(f"rechecking {len(redo)} previously-matched files")
    done = set(st["done"])
    spark = new_session()
    files = sorted(glob.glob("/root/reference/tests/queries/0_stateless/0*.sql"))
    for f in files:
        name = f.split("/")[-1]
        if name in done:
            continue
        ref = f[:-4] + ".reference"
        try:
            exp = open(ref, encoding="utf-8").read()
            txt = open(f, encoding="utf-8").read()
        except Exception:
            st["done"].append(name)
            continue
        if SKIP_RE.search(txt) or BIG_RE.search(txt) or BIG_AGG_RE.search(txt):
            st["done"].append(name)
            save_state(st)
            continue
        stmts = split_statements(txt)
        if not (1 <= len(stmts) <= 40):
            st["done"].append(name)
            save_state(st)
            continue
        runner = ScriptRunner(spark)
        # watchdog: a runaway query (e.g. an O(n*m) decorrelated plan)
        # must not stall the whole sweep — cancel its jobs after 90s
        import threading

        watchdog = threading.Timer(
            90, lambda: spark.sparkContext.cancelAllJobs()
        )
        watchdog.daemon = True
        watchdog.start()
        try:
            got = render_script(runner, txt)
            if got == exp.strip():
                st["matched"].append(name)
            else:
                # ran to completion but output differs: record the first
                # differing line pair for the burn-down
                gl, el = got.split("\n"), exp.strip().split("\n")
                # only benign when no statement carries a semantic
                # top-level ORDER BY — otherwise wrong row order is a
                # real mismatch, not iteration-order noise
                has_order = any(
                    re.search(r"(?i)\bORDER\s+BY\b", s) for s in stmts
                )
                if sorted(gl) == sorted(el) and not has_order:
                    # values all correct, interleaving differs — the
                    # reference's hash-table iteration order (01671
                    # class).  Separate bucket so `mismatch` measures
                    # actionable divergence only.
                    st.setdefault("order_only", {})[name] = [
                        len(gl), len(el)
                    ]
                    st.setdefault("mismatch", {}).pop(name, None)
                else:
                    pair = next(
                        (
                            (a, b)
                            for a, b in zip(
                                gl + [""] * len(el), el + [""] * len(gl)
                            )
                            if a != b
                        ),
                        ("", ""),
                    )
                    st.setdefault("mismatch", {})[name] = [
                        len(gl), len(el), pair[0][:160], pair[1][:160]
                    ]
        except Exception as e:  # noqa: BLE001
            m = next(
                (ln for ln in str(e).split("\n") if ln.strip()), ""
            )
            mm = re.search(r"Cannot resolve routine `(\w+)`", m)
            key = ("fn:" + mm.group(1)) if mm else type(e).__name__
            st["fails"][key] = st["fails"].get(key, 0) + 1
            st["fail_files"].setdefault(key, []).append(name)
            # first-line message per file: lets the burn-down bucket
            # AnalysisException/ParseException by actual cause
            st.setdefault("fail_msgs", {})[name] = m[:300]
            if not alive(spark):
                st["killers"].append(name)
                st["done"].append(name)
                save_state(st)
                hard_reset()
                try:
                    spark = new_session()
                except Exception:  # noqa: BLE001
                    sys.exit(42)
                if not alive(spark):
                    sys.exit(42)
                continue
        finally:
            watchdog.cancel()
            try:
                runner.close()
            except Exception:  # noqa: BLE001
                pass
        st["done"].append(name)
        save_state(st)
    tried = len(st["matched"]) + sum(st["fails"].values())
    print(f"candidates tried {tried}, output-matched {len(st['matched'])}")
    print("jvm-killers:", st["killers"])
    fails = collections.Counter(st["fails"])
    print("top failures:", fails.most_common(20))
    save_state(st)


if __name__ == "__main__":
    main()
