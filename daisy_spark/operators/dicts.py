"""Dictionary / StorageJoin dimension-enrichment (SURVEY §2.3).

The reference's standard enrichment idioms:

- ``dictGet('dict', 'attr', key)`` — point lookup into an external
  dictionary held in executor memory
  (src/Functions/FunctionsExternalDictionaries.h);
- ``ENGINE = Join`` tables — a pre-built hash table joined with
  ``joinGet`` or plain JOIN (src/Storages/StorageJoin.cpp).

Spark-first: both are BROADCAST HASH JOINS against a small dimension
DataFrame — the dimension ships once per executor exactly like the
reference's dictionary replica, and Catalyst keeps the probe inside
whole-stage codegen.  A Dictionary wraps the dimension with the
reference's access semantics (default values, has-check, hierarchy
walk) without ever collecting to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class Dictionary:
    """A keyed small dimension with dictGet semantics.

    ``source`` must be small enough to broadcast (the same constraint the
    reference's in-memory dictionaries have).
    """

    def __init__(self, source: DataFrame, key: str):
        self.source = source
        self.key = key

    def get(
        self,
        df: DataFrame,
        attrs: dict[str, str],
        key_expr: str | Column,
        defaults: dict[str, object] | None = None,
    ) -> DataFrame:
        """dictGetOrDefault: append ``attrs`` (attr -> output name) looked
        up by ``key_expr``; misses take ``defaults`` (else NULL, the
        dictGetOrNull behaviour)."""
        defaults = defaults or {}
        k = F.col(key_expr) if isinstance(key_expr, str) else key_expr
        dim = F.broadcast(
            self.source.select(
                F.col(self.key).alias("__dk"),
                *[F.col(a).alias(f"__v_{a}") for a in attrs],
            )
        )
        out = df.join(dim, k == F.col("__dk"), "left").drop("__dk")
        for attr, name in attrs.items():
            col = F.col(f"__v_{attr}")
            if attr in defaults:
                col = F.coalesce(col, F.lit(defaults[attr]))
            out = out.withColumn(name, col).drop(f"__v_{attr}")
        return out

    def has(self, df: DataFrame, key_expr: str | Column, out_col: str = "has") -> DataFrame:
        """dictHas: boolean membership column."""
        k = F.col(key_expr) if isinstance(key_expr, str) else key_expr
        dim = F.broadcast(self.source.select(F.col(self.key).alias("__dk")))
        return (
            df.join(dim.withColumn("__hit", F.lit(True)), k == F.col("__dk"), "left")
            .withColumn(out_col, F.coalesce(F.col("__hit"), F.lit(False)))
            .drop("__dk", "__hit")
        )

    def get_hierarchy(
        self,
        df: DataFrame,
        parent_attr: str,
        key_expr: str | Column,
        max_depth: int = 8,
        out_col: str = "hierarchy",
    ) -> DataFrame:
        """dictGetHierarchy: array of ancestors (self first) by walking
        ``parent_attr`` up to ``max_depth`` levels — implemented as
        ``max_depth`` chained broadcast lookups (bounded, no iteration on
        the driver)."""
        k = F.col(key_expr) if isinstance(key_expr, str) else key_expr
        dim = F.broadcast(
            self.source.select(
                F.col(self.key).alias("__dk"),
                F.col(parent_attr).alias("__parent"),
            )
        )
        out = df.withColumn("__cur", k).withColumn(
            out_col, F.array(k)
        )
        for level in range(max_depth):
            out = (
                out.join(dim, F.col("__cur") == F.col("__dk"), "left")
                .withColumn(
                    out_col,
                    F.when(
                        F.col("__parent").isNotNull()
                        & (F.col("__parent") != 0)
                        & ~F.array_contains(F.col(out_col), F.col("__parent")),
                        F.concat(F.col(out_col), F.array(F.col("__parent"))),
                    ).otherwise(F.col(out_col)),
                )
                .withColumn(
                    "__cur",
                    F.when(
                        F.col("__parent").isNotNull() & (F.col("__parent") != 0),
                        F.col("__parent"),
                    ).otherwise(F.lit(None)),
                )
                .drop("__dk", "__parent")
            )
        return out.drop("__cur")


def join_get(
    df: DataFrame,
    join_table: DataFrame,
    key: str,
    value_col: str,
    key_expr: str | Column,
    out_col: str | None = None,
) -> DataFrame:
    """joinGet('tbl', 'value', key) — StorageJoin point lookup
    (src/Storages/StorageJoin.cpp joinGet): ANY-join semantics, one value
    per key (first when duplicated, like the reference's Join-engine ANY
    strictness)."""
    out_col = out_col or value_col
    k = F.col(key_expr) if isinstance(key_expr, str) else key_expr
    dim = F.broadcast(
        join_table.groupBy(F.col(key).alias("__jk")).agg(
            F.first(value_col).alias("__jv")
        )
    )
    return (
        df.join(dim, k == F.col("__jk"), "left")
        .withColumn(out_col, F.col("__jv"))
        .drop("__jk", "__jv")
    )
