import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("DAISY_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    # Deliberately a VANILLA session (not daisy_spark.session.get_spark):
    # the correctness driver builds its own bare SparkSession, so every
    # conf the engine needs (e.g. nanosAsLong for the events parquet) must
    # be set at runtime by the catalog/query layer, and the tests must
    # prove that works.  Only test-speed knobs here.
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.appName("daisy_spark_tests")
        .master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        # corpus cases materialize up to ~10M-row script tables
        # (e.g. 01079_order_by_pk) with 2-4 GB transient row buffers,
        # and the ANTLR parser DFA cache grows monotonically over the
        # ~1000 distinct generated statements — 8g OOMed at the END of
        # the full suite (r7/r8 heap dumps: [J/[B spikes + ATNConfig)
        .config("spark.driver.memory", "20g")
        # ANTLR full-context prediction on large generated statements
        # needs more than the 1m default thread stack
        .config("spark.driver.extraJavaOptions", "-Xss32m")
        # bound retained per-execution state (plan strings of generated
        # queries are large); UI is off, these only feed the status store
        .config("spark.sql.ui.retainedExecutions", "50")
        .config("spark.ui.retainedJobs", "100")
        .config("spark.ui.retainedStages", "200")
        .config("spark.ui.retainedTasks", "1000")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with the test tables registered as views."""
    import duckdb

    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        path = os.path.join(SF_DIR, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    return con
