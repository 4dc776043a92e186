"""Table registry: name -> path, format, engine semantics.

The reference's tables are IStorage implementations whose engine choice
(MergeTree / ReplacingMergeTree / SummingMergeTree / ...) carries
*merge-time semantics* (reference: src/Storages/MergeTree/
registerStorageMergeTree.cpp:943-960).  In a Spark-first design the data
lives in partitioned Parquet and the engine semantics become *read-time
normalization rules* applied by :mod:`daisy_spark.operators.final` when a
query asks for ``FINAL``.

A :class:`TableSpec` records what the CREATE TABLE would have said:
engine kind, ORDER BY key (the dedup/merge key), version column,
sign column, partition expression, and TTL.  The Daisy conventions
(`_time DateTime64(3)` auto-column, time-granularity partitioning —
reference: src/Server/RestRouterHandlers/TableRestRouterHandler.cpp:55-58,
309-333) are captured by ``time_column`` / ``partition_granularity``.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: tables the test-data driver generates (TESTDATA.md)
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@dataclass
class TableSpec:
    name: str
    path: str
    fmt: str = "parquet"
    # engine semantics (read-time normalization under FINAL)
    engine: str = "MergeTree"  # MergeTree|Replacing|Summing|Aggregating|Collapsing|VersionedCollapsing
    order_by: tuple[str, ...] = ()  # dedup/merge key
    version_column: str | None = None  # ReplacingMergeTree(version)
    sign_column: str | None = None  # CollapsingMergeTree(sign)
    summed_columns: tuple[str, ...] = ()  # SummingMergeTree cols ((), = all numeric)
    # AggregatingMergeTree: column -> declared AggregateFunction name
    # (e.g. "sum", "anyIf"); None = declarations unknown, use the
    # shape heuristic.  Ordinary (undeclared) columns merge as FIRST
    # per the reference (AggregatingSortedAlgorithm::startGroup).
    agg_columns: dict[str, str] | None = None
    # Daisy time conventions
    time_column: str | None = None  # `_time`-equivalent event-time column
    partition_granularity: str | None = None  # M | D | H | m (TableRestRouterHandler.cpp:55-58)
    ttl: str | None = None  # e.g. "30 days" on time_column
    options: dict[str, str] = field(default_factory=dict)


class Catalog:
    """In-memory registry mapping table names to specs + temp views."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.tables: dict[str, TableSpec] = {}

    def register(self, spec: TableSpec, view: bool = True) -> None:
        self.tables[spec.name] = spec
        if view:
            self.load(spec.name).createOrReplaceTempView(spec.name)

    def load(self, name: str) -> DataFrame:
        spec = self.tables[name]
        _ensure_nanos_readable(self.spark)
        reader = self.spark.read.format(spec.fmt)
        if spec.options:
            reader = reader.options(**spec.options)
        return normalize_nanos(spec.name, reader.load(spec.path))

    def register_dir(self, sf_dir: str, view: bool = True) -> None:
        """Register every known test table found under ``sf_dir``."""
        for name in TESTDATA_TABLES:
            path = os.path.join(sf_dir, f"{name}.parquet")
            if os.path.exists(path):
                time_col = "ts" if name == "events" else None
                self.register(
                    TableSpec(name=name, path=path, time_column=time_col),
                    view=view,
                )


#: columns stored as TIMESTAMP(NANOS) in the driver's parquet, which Spark
#: reads as long (spark.sql.legacy.parquet.nanosAsLong) — normalized to
#: µs-precision timestamps here, matching DuckDB's read of the same files.
NANOS_TS_COLUMNS = {"events": ("ts",)}


def _ensure_nanos_readable(spark: SparkSession) -> None:
    """Make TIMESTAMP(NANOS) parquet columns readable on ANY session.

    Spark has no nanosecond timestamp type; without this conf a read of the
    driver's ``events.parquet`` dies with PARQUET_TYPE_ILLEGAL.  The conf is
    runtime-settable, so set it here rather than relying on the caller's
    session factory (the correctness driver builds a vanilla session).
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # already set read-only / unsupported build — reads will tell


def normalize_nanos(name: str, df: DataFrame) -> DataFrame:
    for col in NANOS_TS_COLUMNS.get(name, ()):
        if col in df.columns and isinstance(df.schema[col].dataType, T.LongType):
            # integer division: epoch-ns ~1.7e18 exceeds double's exact range,
            # float division would land ~12% of timestamps 1µs off the
            # oracle's exact truncation
            df = df.withColumn(
                col, F.timestamp_micros(F.expr(f"`{col}` div 1000"))
            )
    return df


#: bucketed mirrors built by :func:`build_bucketed_mirror`:
#: (abs sf_dir, table) -> managed-table name.  Session-local — bucket
#: metadata lives in the in-memory catalog of the session that built it.
BUCKETED_MIRRORS: dict[tuple[str, str], str] = {}

#: the big-join tables and their co-location keys (SURVEY §4.3: the
#: reference sorts by ORDER BY key at insert; bucketing-by-join-key at
#: write is the Spark equivalent — the l⋈o join then needs NO shuffle).
#: customer is bucketed by custkey so the o⋈c join reads the customer
#: side with no shuffle at any scale: at 100x data the customer
#: broadcast stops being free, and the probe side (orders) shuffles
#: into customer's bucket distribution instead of materializing a
#: multi-GB broadcast per executor.
BUCKET_SPECS = (
    ("lineitem", "l_orderkey"),
    ("orders", "o_orderkey"),
    ("customer", "c_custkey"),
)


def build_bucketed_mirror(
    spark: SparkSession,
    sf_dir: str,
    specs: tuple[tuple[str, str], ...] = BUCKET_SPECS,
    buckets: int = 32,
) -> None:
    """Write bucketed + sorted managed-table mirrors of the big join
    tables, so orderkey-equi-joins read co-located sorted buckets and
    skip both the shuffle AND the sort (storage-side preparation, the
    analogue of the reference's MergeTree insert-time sort).

    At 100-TB scale this is exactly the layout a production deployment
    would write once at ingest: bucket count scales with cluster cores,
    and every orderkey join/aggregation downstream rides the layout."""
    import hashlib

    key_dir = os.path.abspath(sf_dir)
    tag = hashlib.md5(key_dir.encode()).hexdigest()[:8]
    for name, key in specs:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        # bucket count is part of the identity: re-attaching files
        # written with a different count would declare a false
        # co-location and let Spark elide shuffles incorrectly
        tbl = f"{name}_bkt{buckets}_{tag}"
        try:
            if not spark.catalog.tableExists(tbl):
                # a PREVIOUS session's mirror survives as files in the
                # warehouse dir (the in-memory catalog does not) — and
                # managed saveAsTable refuses an existing location.
                # Re-attach those files as an EXTERNAL bucketed table:
                # same bucket layout, zero rewrite cost per session.
                wh = spark.conf.get(
                    "spark.sql.warehouse.dir", "spark-warehouse"
                ).removeprefix("file:")
                loc = os.path.join(wh, tbl)
                if os.path.exists(os.path.join(loc, "_SUCCESS")):
                    df = load_table(spark, sf_dir, name)
                    cols = ", ".join(
                        f"`{f.name}` {f.dataType.simpleString()}"
                        for f in df.schema.fields
                    )
                    spark.sql(
                        f"CREATE TABLE `{tbl}` ({cols}) USING PARQUET "
                        f"CLUSTERED BY (`{key}`) SORTED BY (`{key}`) "
                        f"INTO {buckets} BUCKETS "
                        f"LOCATION '{loc}'"
                    )
                else:
                    import shutil

                    shutil.rmtree(loc, ignore_errors=True)  # partial write
                    df = load_table(spark, sf_dir, name)
                    (
                        df.write.mode("overwrite")
                        .bucketBy(buckets, key)
                        .sortBy(key)
                        .saveAsTable(tbl)
                    )
            BUCKETED_MIRRORS[(key_dir, name)] = tbl
        except Exception:  # noqa: BLE001
            # bucketing is an optimization only — never break a query
            BUCKETED_MIRRORS.pop((key_dir, name), None)


def load_table(
    spark: SparkSession, sf_dir: str, name: str, plain: bool = False
) -> DataFrame:
    """``plain=True`` skips the bucketed mirror: a BROADCAST build side
    gains nothing from bucket co-location and pays for it (32 small
    bucket files to open + schedule vs one parquet — measured ~0.1-0.2s
    on the sf1 region_revenue broadcast of customer)."""
    tbl = (
        None if plain
        else BUCKETED_MIRRORS.get((os.path.abspath(sf_dir), name))
    )
    if tbl is not None:
        try:
            return spark.table(tbl)
        except Exception:  # noqa: BLE001
            pass  # other session / dropped — fall back to parquet
    path = os.path.join(sf_dir, f"{name}.parquet")
    _ensure_nanos_readable(spark)
    return normalize_nanos(name, spark.read.parquet(path))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load all test tables from ``sf_dir`` as DataFrames (no views)."""
    out: dict[str, DataFrame] = {}
    for name in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            out[name] = load_table(spark, sf_dir, name)
    return out
