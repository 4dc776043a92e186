"""Run ONE (or a few) reference stateless test files through the script
engine and print a unified diff vs the .reference expectation — the
fast inner loop for the corpus burn-down.

    python tools/corpus_one.py 00104_totals_having_mode.sql [more.sql ...]
"""

import difflib
import sys

sys.path.insert(0, "/root/repo")

from tools.corpus_run import new_session  # noqa: E402

from daisy_spark.chfmt import render_script  # noqa: E402
from daisy_spark.plans.script import ScriptRunner  # noqa: E402

REF = "/root/reference/tests/queries/0_stateless/"


def run_file(spark, name: str) -> bool:
    txt = open(REF + name, encoding="utf-8").read()
    exp = open(REF + name[:-4] + ".reference", encoding="utf-8").read()
    runner = ScriptRunner(spark)
    try:
        got = render_script(runner, txt)
    finally:
        runner.close()
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
