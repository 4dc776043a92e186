"""Subprocess worker for the sharded reference-corpus lane.

Runs a bounded list of corpus files (one JVM per invocation — the
caller chunks the list, so process exit IS the JVM recycle) and prints
one line ``CORPUSJSON:{name: "ok" | "MISMATCH: ..." | "ERROR: ..."}``.

Not a pytest module (no ``test_`` prefix): tests/test_reference_corpus.py
orchestrates several of these in parallel lanes.  Run standalone:

    python tests/corpus_worker.py --list /tmp/files.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPUS_DIR = "/root/reference/tests/queries/0_stateless"


def _session():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.appName("daisy_corpus_worker")
        .master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        # several cases materialize multi-million-row script tables with
        # GB-scale transient row buffers; 12g × 4 concurrent lanes stays
        # comfortably inside the sandbox
        .config("spark.driver.memory", "12g")
        # ANTLR full-context prediction on large generated statements
        .config("spark.driver.extraJavaOptions", "-Xss32m")
        .config("spark.sql.ui.retainedExecutions", "50")
        .config("spark.ui.retainedJobs", "100")
        .config("spark.ui.retainedStages", "200")
        .config("spark.ui.retainedTasks", "1000")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    return s


def run_files(names: list[str]) -> dict[str, str]:
    from daisy_spark.chfmt import render_script
    from daisy_spark.plans.script import ScriptRunner

    spark = _session()
    out: dict[str, str] = {}
    for name in names:
        path = os.path.join(CORPUS_DIR, name)
        # the same single-stream pin the inline lane applies per case
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        try:
            expected = open(path[:-4] + ".reference", encoding="utf-8").read()
            txt = open(path, encoding="utf-8").read()
            runner = ScriptRunner(spark)
            try:
                got = render_script(runner, txt)
            finally:
                runner.close()
            if got == expected.strip():
                out[name] = "ok"
            else:
                g, e = got.split("\n"), expected.strip().split("\n")
                head = next(
                    (
                        f"line {i + 1}: got {g[i]!r} want {e[i]!r}"
                        for i in range(min(len(g), len(e)))
                        if g[i] != e[i]
                    ),
                    f"line counts {len(g)} vs {len(e)}",
                )
                out[name] = f"MISMATCH: {head}"[:300]
        except Exception as exc:  # noqa: BLE001
            out[name] = f"ERROR: {type(exc).__name__}: {exc}"[:300]
            # a poisoned JVM fails every later case in this process —
            # stop here; the orchestrator's retry pass reruns the
            # missing cases (and this one) on a fresh JVM
            try:
                spark.sql("SELECT 1").collect()
            except Exception:  # noqa: BLE001
                break
    try:
        spark.stop()
    except Exception:  # noqa: BLE001
        pass
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--list", required=True, help="JSON file: list of names")
    args = ap.parse_args()
    with open(args.list) as f:
        names = json.load(f)
    out = run_files(names)
    print("CORPUSJSON:" + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
