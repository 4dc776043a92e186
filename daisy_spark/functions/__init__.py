"""Function library: reference function names -> Spark Column expressions.

Split by family:

- ``scalar``     arithmetic/comparison/conditional/conversion/date-time/
                  string/array/JSON/hash/math/... (SURVEY §2.8)
- ``aggregates`` aggregate functions incl. combinators (SURVEY §2.4)
- ``timeseries`` windowFunnel, retention, sequenceMatch, rate, deltaSum,
                  histogram (SURVEY §2.4 time-series family)

Every public callable takes/returns :class:`pyspark.sql.Column` so the
whole library stays JVM-side (whole-stage codegen); no row-at-a-time
Python UDFs.
"""

from daisy_spark.functions import scalar, aggregates, timeseries  # noqa: F401
from daisy_spark.functions.scalar import FUNCTIONS  # noqa: F401
