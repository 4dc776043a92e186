"""Similarity search over embedding columns (``array<float>``).

Two tiers, mirroring how a 100-TB training-data pipeline would run ANN:

- :func:`cosine_topk` — exact brute-force top-k.  Correct baseline; the
  query side must be small (it is broadcast), the corpus side streams
  through a single narrow pass (no corpus shuffle — the only wide step is
  the final per-query top-k, which carries ≤ ``k`` rows per partition per
  query after partial aggregation).
- :func:`ivf_topk` — IVF-style: restrict the search to the corpus cells
  whose centroid is nearest the query (probe=1 default).  Cells come from
  a label/cluster column (k-means assignment upstream); centroids are one
  aggregation over the corpus.
- :func:`with_hyperplane_signature` — random-hyperplane sign bits, the
  building block for LSH-bucketed ANN and embedding dedup
  (:func:`daisy_spark.operators.dedup.embedding_dedup_pairs`).

All vector math is JVM-side higher-order expressions (``zip_with`` +
``aggregate`` folds) inside whole-stage codegen — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * y), "
        "cast(0 as double), (acc, x) -> acc + x)"
    )


def _norm(a: str) -> str:
    return (
        f"sqrt(aggregate(transform({a}, x -> cast(x as double) * x), "
        "cast(0 as double), (acc, x) -> acc + x))"
    )


def cosine_expr(a: str, b: str) -> F.Column:
    """Cosine similarity between two array columns as a single expression.

    Higher-order-function folds run INTERPRETED in Catalyst — fine for
    tiny inputs (the IVF centroid probe: |queries| × |cells| rows), but
    the bulk scoring paths use :func:`cosine_pandas` (Arrow-batched
    numpy) instead: one einsum per batch measured ~3-5× faster per row
    than the interpreted fold (r13; the bit-identical literal-chain
    alternative was measured and REJECTED in r12 — 64-term chains blow
    the JVM 64 KB codegen limit and ran ~40% slower)."""
    return F.expr(f"{_dot(a, b)} / ({_norm(a)} * {_norm(b)})")


def cosine_pandas() -> "F.udf":
    """Arrow-batched cosine scorer: numpy row-wise dot/norms per batch
    (guide §4.1/§4.2 — hand whole batches to vectorized native code).

    Float semantics vs the JVM fold: elements are widened float32 →
    float64 exactly as ``cast(x as double)`` does; only the SUMMATION
    ORDER differs (einsum reassociates).  The measured perturbation is
    ≤ ~1e-15 while the declared queries' 6-dp rounding boundaries,
    rank gaps and thresholds sit ≥ 1e-7 away (tools/cosine_tolerance.py,
    committed in OPTIMIZATION_r13.md) — no observable output can flip.

    Vectors within a batch must share one dimensionality (np.stack), as
    every embedding column in the pipeline does.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _cos(a: "pd.Series", b: "pd.Series") -> "pd.Series":
        import numpy as np

        if len(a) == 0:
            return pd.Series([], dtype="float64")
        A = np.stack(a.to_numpy()).astype(np.float64, copy=False)
        B = np.stack(b.to_numpy()).astype(np.float64, copy=False)
        num = np.einsum("ij,ij->i", A, B)
        with np.errstate(divide="ignore", invalid="ignore"):
            den = np.sqrt(np.einsum("ij,ij->i", A, A)) * np.sqrt(
                np.einsum("ij,ij->i", B, B)
            )
            out = num / den
        return pd.Series(out)

    _cos.__annotations__ = {"a": pd.Series, "b": pd.Series, "return": pd.Series}
    return pandas_udf(_cos, "double")


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    query_vec: str,
    corpus_vec: str,
    k: int = 10,
) -> DataFrame:
    """Exact brute-force cosine top-k of ``corpus`` for each query row.

    ``queries`` is broadcast (must be small — the point of a top-k scan);
    the corpus is read once with no shuffle, and the row_number window
    partitions by query id so the final top-k shuffle moves only candidate
    rows, never vectors-of-the-corpus × queries.
    """
    q = F.broadcast(
        queries.select(
            F.col(query_id).alias("_qid"), F.col(query_vec).alias("_qvec")
        )
    )
    scored = corpus.select(corpus_id, corpus_vec).join(q).select(
        F.col("_qid").alias(query_id),
        F.col(corpus_id),
        cosine_pandas()(F.col("_qvec"), F.col(corpus_vec)).alias("cosine"),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cosine").desc(), F.col(corpus_id)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "cosine", "rank")
    )


def cluster_centroids(
    corpus: DataFrame, vec_col: str, cell_col: str
) -> DataFrame:
    """Per-cell mean vector (the IVF coarse quantizer), one aggregation.

    posexplode → groupBy(cell, dim) avg → re-assemble the array ordered by
    dimension.  The shuffle carries (cells × dims) rows — trivial.
    """
    exploded = corpus.select(
        F.col(cell_col), F.posexplode(vec_col).alias("pos", "v")
    )
    per_dim = exploded.groupBy(cell_col, "pos").agg(
        F.avg(F.col("v").cast("double")).alias("c")
    )
    return per_dim.groupBy(cell_col).agg(
        F.expr(
            "transform(array_sort(collect_list(named_struct('pos', pos, 'c', c))), "
            "s -> s.c)"
        ).alias("centroid")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    query_vec: str,
    corpus_vec: str,
    cell_col: str,
    k: int = 10,
    n_probe: int = 1,
) -> DataFrame:
    """IVF ANN: route each query to its ``n_probe`` nearest cell centroids,
    then exact top-k *within those cells only*.

    At scale the corpus is hash-partitioned (or bucketed) by ``cell_col``;
    the probe join is a broadcast of (queries × n_probe) cell keys, so the
    scan prunes to the probed cells instead of the whole corpus.
    """
    cents = cluster_centroids(corpus, corpus_vec, cell_col)
    q = queries.select(
        F.col(query_id).alias("_qid"), F.col(query_vec).alias("_qvec")
    )
    # queries × centroids is (|Q| × cells) — both tiny; broadcast centroids
    probe_w = Window.partitionBy("_qid").orderBy(
        F.col("_csim").desc(), F.col(cell_col)
    )
    probes = (
        q.join(F.broadcast(cents))
        .select(
            "_qid", "_qvec", cell_col, cosine_expr("_qvec", "centroid").alias("_csim")
        )
        .withColumn("_pr", F.row_number().over(probe_w))
        .filter(F.col("_pr") <= n_probe)
        .select("_qid", "_qvec", cell_col)
    )
    scored = corpus.select(cell_col, corpus_id, corpus_vec).join(
        F.broadcast(probes), on=cell_col
    ).select(
        F.col("_qid").alias(query_id),
        F.col(corpus_id),
        F.col(cell_col),
        cosine_pandas()(F.col("_qvec"), F.col(corpus_vec)).alias("cosine"),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cosine").desc(), F.col(corpus_id)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, cell_col, "cosine", "rank")
    )


def _plane_matrix(planes: int, dims: int):
    """Deterministic pseudo-random hyperplane components in [-1, 1]:
    a splitmix64-style integer hash of (plane, dim) — identical on every
    executor and across runs, no RNG state to ship."""
    import numpy as np

    p = np.arange(planes, dtype=np.uint64)[:, None]
    d = np.arange(dims, dtype=np.uint64)[None, :]
    x = p * np.uint64(0x9E3779B97F4A7C15) + d * np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xD6E8FEB86659FD93)
    x ^= x >> np.uint64(27)
    return ((x % np.uint64(2001)).astype(np.float64) - 1000.0) / 1000.0


def with_hyperplane_signature(
    df: DataFrame,
    vec_col: str,
    planes: int = 16,
    out_col: str = "_hp_sig",
) -> DataFrame:
    """Random-hyperplane LSH sign bits (array<long> of 0/1, length
    ``planes``).  sign(q·p) agreement probability is 1 - angle/π, the
    standard SRP-LSH guarantee.

    Implemented as an Arrow-batched pandas UDF doing ONE numpy matmul per
    batch (vectors × planesᵀ) — the textbook "Python is unavoidable →
    vectorize it" case: the per-element higher-order-expression form runs
    interpreted in Catalyst and benchmarked ~50× slower.  No shuffle; the
    projection is embarrassingly parallel per partition.
    """
    import numpy as np
    import pandas as pd  # noqa: F401  (annotation resolution for pandas_udf)
    from pyspark.sql.functions import pandas_udf

    def _project(vecs: "pd.Series") -> "pd.Series":
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        mat = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        pm = _plane_matrix(planes, mat.shape[1])
        bits = (mat @ pm.T >= 0).astype(np.int64)
        return pd.Series(list(bits))

    _project.__annotations__ = {"vecs": pd.Series, "return": pd.Series}
    project = pandas_udf(_project, "array<long>")
    return df.withColumn(out_col, project(F.col(vec_col)))


def lsh_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    query_vec: str,
    corpus_vec: str,
    k: int = 10,
    planes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """LSH-bucketed approximate top-k: candidates share ≥1 signature band
    with the query; exact cosine re-ranks candidates.

    Unlike :func:`ivf_topk` this needs no cluster column — the corpus
    shuffles once on (band, band-value) and each query touches only its
    colliding buckets.
    """
    rows_per_band = planes // bands
    # flat literal-index band values: higher-order functions over
    # sequence() run interpreted per row (see dedup.with_simhash) —
    # the spelled-out shift/add chain stays in whole-stage codegen
    band_expr = "array(" + ", ".join(
        f"named_struct('band', {b}, 'bv', cast("
        + " + ".join(
            f"shiftleft(element_at(_hp_sig, {b * rows_per_band + i + 1}), {i})"
            for i in range(rows_per_band)
        )
        + " as bigint))"
        for b in range(bands)
    ) + ")"

    def banded(df: DataFrame, idc: str, vecc: str) -> DataFrame:
        # ids only — the corpus-side band explode must not carry the
        # vector (bands× duplication through the bucket join otherwise)
        return (
            with_hyperplane_signature(df, vecc, planes=planes)
            .select(F.col(idc), F.explode(F.expr(band_expr)).alias("bb"))
            .select(idc, F.col("bb.band").alias("band"), F.col("bb.bv").alias("bv"))
        )

    qb = F.broadcast(
        banded(queries, query_id, query_vec).withColumnRenamed(query_id, "_qid")
    )
    cand_ids = (
        banded(corpus, corpus_id, corpus_vec)
        .join(qb, on=["band", "bv"])
        .select("_qid", corpus_id)
        .dropDuplicates(["_qid", corpus_id])
    )
    qv = F.broadcast(
        queries.select(
            F.col(query_id).alias("_qid"), F.col(query_vec).alias("_qvec")
        )
    )
    cand = cand_ids.join(
        corpus.select(corpus_id, corpus_vec), corpus_id
    ).join(qv, "_qid")
    scored = cand.select(
        F.col("_qid").alias(query_id),
        F.col(corpus_id),
        cosine_pandas()(F.col("_qvec"), F.col(corpus_vec)).alias("cosine"),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cosine").desc(), F.col(corpus_id)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "cosine", "rank")
    )
