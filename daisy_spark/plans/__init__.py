"""SQL dialect front-end: reference-dialect SQL -> Spark SQL.

- ``dialect``  tokenizer + clause/function rewriter (the translator)
- ``api``      search/ingest entry points using the translator
"""

from daisy_spark.plans.dialect import DialectError, sql, translate  # noqa: F401
