"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry from ``__spark_entry__`` on a VANILLA
SparkSession (no daisy_spark session confs — mirrors the driver) and the
matching ``oracle_sql()`` on DuckDB over the same parquet, then compares
row count, schema (column-name sets), and a value hash with columns
sorted by name and rows sorted by their rendered form.

Usage: python tools/driver_sim.py [sf_dir] [query ...]
"""

import hashlib
import sys
import datetime
import decimal

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if v != v:
            return "nan"
        return format(round(v, 6) + 0.0, ".6f")
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm(x) for x in v) + "]"
    if isinstance(v, bool):
        return "1" if v else "0"
    return str(v)


def hash_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i].lower())
    lines = sorted(",".join(norm(r[i]) for i in idx) for r in rows)
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()


def main():
    spark = (
        SparkSession.builder.appName("driver_sim")
        .master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    n_pass = n_fail = n_weak = 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        try:
            df = fn(spark, SF)
            s_cols = df.columns
            s_rows = [tuple(r) for r in df.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark err {repr(e)[:300]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"weak {name}: rows-only ({len(s_rows)} rows)")
            n_weak += 1
            continue
        try:
            o = con.execute(oracles[name])
            o_cols = [d[0] for d in o.description]
            o_rows = o.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle err {repr(e)[:300]}")
            n_fail += 1
            continue
        rows_ok = len(s_rows) == len(o_rows)
        schema_ok = sorted(c.lower() for c in s_cols) == sorted(
            c.lower() for c in o_cols
        )
        hash_ok = schema_ok and hash_rows(s_cols, s_rows) == hash_rows(
            o_cols, o_rows
        )
        if rows_ok and schema_ok and hash_ok:
            print(f"pass {name} ({len(s_rows)} rows)")
            n_pass += 1
        else:
            print(
                f"FAIL {name}: rows {len(s_rows)}/{len(o_rows)} "
                f"schema={schema_ok} hash={hash_ok} "
                f"spark_cols={s_cols} oracle_cols={o_cols}"
            )
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_weak} rows-only")


if __name__ == "__main__":
    main()
