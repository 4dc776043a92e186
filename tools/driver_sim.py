"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry from ``__spark_entry__`` on a VANILLA
SparkSession (no daisy_spark session confs — mirrors the driver) and the
matching ``oracle_sql()`` on DuckDB over the same parquet, then compares
row count, schema (column-name sets), and a value hash with columns
sorted by name and rows sorted by their rendered form.

Canonicalization mirrors the driver EXACTLY: both sides go through
pandas (``df.toPandas()`` / ``con.execute(sql).df()``), so dtype
artifacts surface — DuckDB HUGEINT becomes float64 ("56250000.0" vs
Spark's int64 "56250000"), and list/array-typed columns crash pandas
``sort_values`` exactly like the driver's canon does.

Usage: python tools/driver_sim.py [sf_dir] [query ...]
"""

import hashlib
import sys
import datetime
import decimal

import duckdb
import numpy as np
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
    if v is None or v is np.nan or (isinstance(v, float) and v != v):
        return "NULL" if v is None else "nan"
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, (float, np.floating)):
        return format(round(float(v), 6) + 0.0, ".6f")
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(norm(x) for x in v) + "]"
    if isinstance(v, (bool, np.bool_)):
        return "1" if v else "0"
    return str(v)


def hash_pdf(pdf):
    """Mirror the driver's canon: sort columns by name, pandas
    ``sort_values`` over all columns (raises TypeError on list-typed
    cells, exactly like the driver crashes), then hash rendered rows.

    Crucially we render the PANDAS values (post ``toPandas()``/``.df()``
    dtype coercion), not the raw Python rows — DuckDB HUGEINT arrives as
    float64 here and renders with a decimal point, so an un-cast bigint
    oracle mismatches just as it does on the driver.
    """
    cols = sorted(pdf.columns, key=lambda c: c.lower())
    pdf = pdf[cols]
    pdf.sort_values(by=cols)  # replicate the driver's crash on lists
    lines = sorted(
        ",".join(norm(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    )
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
            s_pdf = df.toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark err {repr(e)[:300]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"weak {name}: rows-only ({len(s_pdf)} rows)")
            n_weak += 1
            continue
        try:
            o_pdf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle err {repr(e)[:300]}")
            n_fail += 1
            continue
        rows_ok = len(s_pdf) == len(o_pdf)
        schema_ok = sorted(c.lower() for c in s_pdf.columns) == sorted(
            c.lower() for c in o_pdf.columns
        )
        try:
            hash_ok = schema_ok and hash_pdf(s_pdf) == hash_pdf(o_pdf)
        except TypeError as e:
            print(f"FAIL {name}: driver canon would crash: {repr(e)[:200]}")
            n_fail += 1
            continue
        if rows_ok and schema_ok and hash_ok:
            print(f"pass {name} ({len(s_pdf)} rows)")
            n_pass += 1
        else:
            print(
                f"FAIL {name}: rows {len(s_pdf)}/{len(o_pdf)} "
                f"schema={schema_ok} hash={hash_ok} "
                f"spark_cols={list(s_pdf.columns)} "
                f"oracle_cols={list(o_pdf.columns)}"
            )
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_weak} rows-only")


if __name__ == "__main__":
    main()
