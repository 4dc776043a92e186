"""Batch sources/sinks for the reference's wire formats + table functions.

The reference registers ~40 input/output formats
(src/Formats/registerFormats.cpp:27-85); the ones that matter for a Spark
engine map onto Spark's built-in readers with the right options.  Each
entry is (spark format, default options) — anything not listed raises
with the supported set, instead of silently mis-parsing.

Table functions mirror src/TableFunctions/ (numbers, generateRandom,
values...): distributed generators via ``spark.range`` — never a
driver-side collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: reference format name -> (spark reader format, options)
FORMAT_MAP: dict[str, tuple[str, dict[str, str]]] = {
    "CSV": ("csv", {"header": "false", "inferSchema": "true"}),
    "CSVWithNames": ("csv", {"header": "true", "inferSchema": "true"}),
    "TSV": ("csv", {"sep": "\t", "header": "false", "inferSchema": "true"}),
    "TabSeparated": ("csv", {"sep": "\t", "header": "false", "inferSchema": "true"}),
    "TSVWithNames": ("csv", {"sep": "\t", "header": "true", "inferSchema": "true"}),
    "TabSeparatedWithNames": ("csv", {"sep": "\t", "header": "true", "inferSchema": "true"}),
    "JSONEachRow": ("json", {}),
    "JSONStringsEachRow": ("json", {"primitivesAsString": "true"}),
    "Parquet": ("parquet", {}),
    "ORC": ("orc", {}),
    "Avro": ("avro", {}),
    "LineAsString": ("text", {}),
    "RawBLOB": ("binaryFile", {}),
}


#: row-based binary formats decoded by pure-Python wire codecs
#: (formats_binary.py) — they need a schema (or, for Protobuf, a
#: {field_no: (name, type)} map passed via ``options["fields"]``)
BINARY_FORMATS = {"MsgPack", "RowBinary", "Protobuf", "ProtobufSingle"}


def read_format(
    spark: SparkSession,
    path: str,
    fmt: str,
    schema: str | None = None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Read ``path`` in a reference-named format."""
    if fmt in BINARY_FORMATS:
        from daisy_spark import formats_binary as fb

        if fmt == "MsgPack":
            return fb.read_msgpack(spark, path, schema)
        if fmt == "RowBinary":
            return fb.read_row_binary(spark, path, schema)
        fields = (options or {}).get("fields")
        if not isinstance(fields, dict):
            raise ValueError(
                "Protobuf needs options={'fields': {field_no: (name, type)}}"
            )
        return fb.read_protobuf(
            spark, path, fields, single=fmt == "ProtobufSingle"
        )
    if fmt not in FORMAT_MAP:
        raise ValueError(
            f"format {fmt!r} not supported; available: "
            f"{sorted(FORMAT_MAP) + sorted(BINARY_FORMATS)}"
        )
    spark_fmt, defaults = FORMAT_MAP[fmt]
    reader = spark.read.format(spark_fmt)
    opts = dict(defaults)
    if options:
        opts.update(options)
    if schema is not None:
        reader = reader.schema(schema)
        opts.pop("inferSchema", None)
    return reader.options(**opts).load(path)


def write_format(
    df: DataFrame,
    path: str,
    fmt: str,
    mode: str = "error",
    partition_by: list[str] | None = None,
    options: dict[str, str] | None = None,
) -> None:
    if fmt not in FORMAT_MAP:
        raise ValueError(
            f"format {fmt!r} not supported; available: {sorted(FORMAT_MAP)}"
        )
    spark_fmt, defaults = FORMAT_MAP[fmt]
    writer = df.write.format(spark_fmt).mode(mode)
    opts = {k: v for k, v in defaults.items() if k != "inferSchema"}
    if options:
        opts.update(options)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.options(**opts).save(path)


# ---------------------------------------------------------------------------
# Table functions (src/TableFunctions/)
# ---------------------------------------------------------------------------

def numbers(spark: SparkSession, count: int, offset: int = 0) -> DataFrame:
    """numbers(N) — the reference's system.numbers / numbers() table
    function: a distributed range, partitioned across executors."""
    return spark.range(offset, offset + count).withColumnRenamed("id", "number")


def values(spark: SparkSession, schema: str, rows: list[tuple]) -> DataFrame:
    """VALUES table function — inline literal rows."""
    return spark.createDataFrame(rows, schema=schema)


def generate_random(
    spark: SparkSession,
    schema: dict[str, str],
    count: int,
    seed: int = 42,
) -> DataFrame:
    """generateRandom('a Int64, b Float64, ...') — deterministic synthetic
    data, generated distributed (hash-derived per row id, no driver RNG).
    Supported types: long/int, double/float, string, boolean, timestamp.
    """
    df = spark.range(count)
    for name, typ in schema.items():
        h = F.xxhash64(F.col("id"), F.lit(name), F.lit(seed))
        t = typ.lower()
        if t in ("long", "bigint", "int64"):
            col = h
        elif t in ("int", "int32"):
            col = (F.pmod(h, F.lit(2**31))).cast("int")
        elif t in ("double", "float64"):
            col = F.pmod(h, F.lit(10**9)) / 1e9
        elif t in ("float", "float32"):
            col = (F.pmod(h, F.lit(10**6)) / 1e6).cast("float")
        elif t == "string":
            col = F.base64(F.expr("CAST(string(xxhash64(id)) AS BINARY)"))
        elif t in ("boolean", "bool"):
            col = F.pmod(h, F.lit(2)) == 1
        elif t == "timestamp":
            col = F.timestamp_seconds(F.lit(1704067200) + F.pmod(h, F.lit(86400 * 365)))
        else:
            raise ValueError(f"generate_random: unsupported type {typ!r}")
        df = df.withColumn(name, col)
    return df.drop("id")
