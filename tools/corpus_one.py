"""Run ONE (or a few) reference stateless test files through the script
engine and print a unified diff vs the .reference expectation — the
fast inner loop for the corpus burn-down.

    python tools/corpus_one.py 00104_totals_having_mode.sql [more.sql ...]
"""

import difflib
import sys

sys.path.insert(0, "/root/repo")

from tools.corpus_run import fmt, fmt_f32, new_session  # noqa: E402

from daisy_spark.plans.script import ScriptRunner, split_statements  # noqa: E402

REF = "/root/reference/tests/queries/0_stateless/"


def run_file(spark, name: str) -> bool:
    txt = open(REF + name, encoding="utf-8").read()
    exp = open(REF + name[:-4] + ".reference", encoding="utf-8").read()
    runner = ScriptRunner(spark)
    outs = []
    echo = False
    try:
        for s in split_statements(txt):
            if "-- { echoOn" in s or "-- { echo }" in s:
                echo = True
            elif "-- { echoOff" in s:
                echo = False
            if echo:
                outs.append(s.strip() + ";")
            df = runner.execute(s)
            if df is None:
                continue
            f32 = [fld.dataType.simpleString() == "float"
                   for fld in df.schema.fields]
            for r in df.collect():
                outs.append("\t".join(
                    fmt_f32(v) if is32 else fmt(v)
                    for v, is32 in zip(r, f32)
                ))
            for r in getattr(df, "_daisy_totals", None) or []:
                outs.append("")
                outs.append("\t".join(
                    fmt_f32(v) if is32 else fmt(v)
                    for v, is32 in zip(r, f32)
                ))
    finally:
        runner.close()
    got = "\n".join(outs).strip()
    ok = got == exp.strip()
    print(f"=== {name}: {'MATCH' if ok else 'MISMATCH'}")
    if not ok:
        diff = list(difflib.unified_diff(
            exp.strip().split("\n"), got.split("\n"),
            "expected", "got", lineterm="", n=1,
        ))
        print("\n".join(diff[:60]))
    return ok


if __name__ == "__main__":
    spark = new_session()
    results = {}
    for name in sys.argv[1:]:
        try:
            results[name] = run_file(spark, name)
        except Exception as e:  # noqa: BLE001
            msg = next(ln for ln in str(e).split("\n") if ln.strip())
            print(f"=== {name}: ERROR {type(e).__name__}: {msg[:300]}")
            results[name] = False
    print({k: ("ok" if v else "FAIL") for k, v in results.items()})
