"""Oracle rounding-tolerance analysis for the Arrow/numpy cosine switch.

The ANN/dedup queries declare cosine ROUNDED TO 6 DP (plus rank order and
threshold filters on the raw double).  Replacing the JVM left-fold
(aggregate(zip_with(...))) with numpy matmul/einsum REASSOCIATES the
float summation, perturbing the raw double by ~dims*eps.  This script
quantifies, for every cosine the declared queries actually compute at a
given SF:

  1. |fold - numpy| observed perturbation (max over all pairs),
  2. distance of each raw value to its nearest 6-dp rounding boundary
     (value*1e6 distance to x.5) — a flip needs perturbation > distance,
  3. distance to the decision thresholds/sort boundaries:
     - dedup_embedding: |cosine - 0.95| (the filter),
     - ann_topk / ann_ivf / ann_lsh: min gap between adjacent cosines in
       each query's ranking (a rank flip needs perturbation > gap/2),
     - ann_ivf probe: min gap between the best and second-best centroid.

Run:  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python tools/cosine_tolerance.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from daisy_spark.catalog import load_table  # noqa: E402
from daisy_spark.session import get_spark  # noqa: E402


def boundary_dist(vals: np.ndarray) -> float:
    """Min distance of round(v,6) inputs to the nearest .5 ulp-of-6dp
    boundary, in raw-value units."""
    scaled = np.abs(vals) * 1e6
    frac = scaled - np.floor(scaled)
    return float(np.min(np.abs(frac - 0.5))) / 1e6


def fold_dot(a: np.ndarray, b: np.ndarray) -> float:
    """Reproduce the JVM left fold exactly: sequential sum of products."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


def fold_norm(a: np.ndarray) -> float:
    acc = 0.0
    for x in a:
        acc += float(x) * float(x)
    return float(np.sqrt(acc))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("cosine_tolerance")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding"
    )
    rows = emb.orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in rows])
    labels = np.array([r["label"] for r in rows])
    mat = np.array([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    n, dims = mat.shape
    print(f"sf_dir={sf_dir} n={n} dims={dims}")

    qmask = ids < 5
    Q, C = mat[qmask], mat[~qmask]
    qid, cid, clab = ids[qmask], ids[~qmask], labels[~qmask]

    # numpy cosines (the candidate implementation: matmul + vector norms)
    nq = np.linalg.norm(Q, axis=1)
    nc = np.linalg.norm(C, axis=1)
    cos_np = (Q @ C.T) / np.outer(nq, nc)

    # fold cosines (what the JVM computes today)
    cos_fold = np.empty_like(cos_np)
    for i in range(len(Q)):
        fq = fold_norm(Q[i])
        for j in range(len(C)):
            cos_fold[i, j] = fold_dot(Q[i], C[j]) / (fq * fold_norm(C[j]))

    pert = np.abs(cos_np - cos_fold)
    print(f"[ann_topk] max |numpy - fold| = {pert.max():.3e}")
    print(f"[ann_topk] min 6dp-boundary distance = {boundary_dist(cos_fold):.3e}")
    flips = np.sum(np.round(cos_np, 6) != np.round(cos_fold, 6))
    print(f"[ann_topk] 6dp flips across ALL {cos_fold.size} pairs: {flips}")

    # rank-gap per query (rank = cosine desc, corpus_id asc tiebreak):
    # a rank flip needs two DIFFERENT cosines to cross, so the relevant
    # margin is the min nonzero gap between adjacent sorted cosines
    for name, M in (("ann_topk ranking", cos_fold),):
        gaps = []
        for i in range(M.shape[0]):
            s = np.sort(M[i])[::-1]
            d = np.abs(np.diff(s))
            gaps.append(d[d > 0].min() if np.any(d > 0) else np.inf)
        print(f"[{name}] min nonzero adjacent-cosine gap = {min(gaps):.3e}")

    # ann_ivf probe: centroid = per-dim mean over the cell (JVM avg —
    # stays JVM-side in the plan; only query->centroid cosine would move
    # to numpy). Compare best-vs-second-best centroid margin.
    cents = {}
    for lab in np.unique(clab):
        cents[lab] = C[clab == lab].mean(axis=0)
    labs = sorted(cents)
    CM = np.array([cents[v] for v in labs])
    csim_np = (Q @ CM.T) / np.outer(nq, np.linalg.norm(CM, axis=1))
    csim_fold = np.empty_like(csim_np)
    for i in range(len(Q)):
        fq = fold_norm(Q[i])
        for j in range(len(CM)):
            csim_fold[i, j] = fold_dot(Q[i], CM[j]) / (fq * fold_norm(CM[j]))
    s = np.sort(csim_fold, axis=1)[:, ::-1]
    print(f"[ann_ivf probe] max |numpy - fold| = {np.abs(csim_np - csim_fold).max():.3e}")
    print(f"[ann_ivf probe] min best-vs-2nd centroid margin = {(s[:, 0] - s[:, 1]).min():.3e}")

    # dedup_embedding: pairwise cosines vs the 0.95 threshold.  The
    # operator normalizes per vector then dots unit vectors — reproduce
    # both that form and plain numpy over ALL pairs (superset of any
    # LSH candidate set).
    nrm = np.linalg.norm(mat, axis=1)
    unit = mat / nrm[:, None]
    cos_all_np = unit @ unit.T
    iu = np.triu_indices(n, k=1)
    vals_np = cos_all_np[iu]
    # fold form on unit vectors for the pairs NEAR the threshold only
    # (fold on all n^2 pairs is too slow in Python; perturbation is
    # uniformly bounded by the max measured above)
    near = np.abs(vals_np - 0.95) < 1e-3
    print(f"[dedup_embedding] pairs within 1e-3 of 0.95: {int(near.sum())}")
    ii, jj = iu[0][near], iu[1][near]
    worst_margin = np.inf
    worst_pert = 0.0
    for a, b in zip(ii, jj):
        # the JVM path: unit vectors built by fold-norm division, then fold-dot
        ua = mat[a] / fold_norm(mat[a])
        ub = mat[b] / fold_norm(mat[b])
        cf = fold_dot(ua, ub)
        worst_margin = min(worst_margin, abs(cf - 0.95))
        worst_pert = max(worst_pert, abs(cf - cos_all_np[a, b]))
    print(f"[dedup_embedding] min |cosine-0.95| among near pairs = {worst_margin:.3e}")
    print(f"[dedup_embedding] max |numpy - fold| among near pairs = {worst_pert:.3e}")
    bd = boundary_dist(vals_np[vals_np >= 0.9499])
    print(f"[dedup_embedding] min 6dp-boundary distance (cos>=0.9499) = {bd:.3e}")

    spark.stop()


if __name__ == "__main__":
    main()
