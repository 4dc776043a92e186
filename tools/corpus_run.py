"""Scan the reference's stateless SQL tests for dialect-translatable cases.

Runs every candidate file (pure SELECT statements, no DDL/system tables,
bounded row counts) through plans.dialect.translate + spark.sql and
compares the output with the committed .reference expectation using
ClickHouse TSV rendering. Prints a summary and writes the matching file
list to /tmp/corpus_matched.json — fold new matches into
tests/test_reference_corpus.py::CORPUS.

Usage: python tools/corpus_run.py
"""

import collections
import glob
import json
import re
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402

from daisy_spark.plans.dialect import translate  # noqa: E402

SKIP_RE = re.compile(
    r"(?i)\b(CREATE|DROP|INSERT|ALTER|SYSTEM|ATTACH|DETACH|OPTIMIZE|RENAME"
    r"|KILL|numbers_mt|system\.|remote\(|cluster\(|file\(|url\(|FORMAT\s)"
)
# >10M generated rows: JVM OOM risk on local runs
BIG_RE = re.compile(r"(numbers|range)\s*\(\s*[0-9_]{8,}")


def fmt(v):
    if v is None:
        return "\\N"
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, list):
        return "[" + ",".join(fmt(x) for x in v) + "]"
    return str(v)


def main():
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("FATAL")
    files = sorted(glob.glob("/root/reference/tests/queries/0_stateless/0*.sql"))
    tried = ran = 0
    matched: list[str] = []
    fails: collections.Counter = collections.Counter()
    for f in files:
        ref = f[:-4] + ".reference"
        try:
            exp = open(ref, encoding="utf-8").read()
            txt = open(f, encoding="utf-8").read()
        except Exception:
            continue
        if SKIP_RE.search(txt) or BIG_RE.search(txt):
            continue
        stmts = [
            s.strip()
            for s in txt.split(";")
            if s.strip()
            and not all(
                ln.strip().startswith("--") or not ln.strip()
                for ln in s.splitlines()
            )
        ]
        if not (1 <= len(stmts) <= 6):
            continue
        tried += 1
        try:
            outs = []
            for s in stmts:
                if re.match(r"(?i)\s*SET\b", s):
                    continue
                t = translate(s)
                for r in spark.sql(t.spark_sql).collect():
                    outs.append("\t".join(fmt(v) for v in r))
            ran += 1
            if "\n".join(outs).strip() == exp.strip():
                matched.append(f.split("/")[-1])
        except Exception as e:  # noqa: BLE001
            m = str(e).split("\n")[0]
            mm = re.search(r"Cannot resolve routine `(\w+)`", m)
            fails[("fn:" + mm.group(1)) if mm else type(e).__name__] += 1
    print(f"tried {tried}, ran {ran}, output-matched {len(matched)}")
    print("top failures:", fails.most_common(20))
    json.dump(matched, open("/tmp/corpus_matched.json", "w"))


if __name__ == "__main__":
    main()
