"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline, plus an IVF-style
bucketed variant as the scale path: assign every vector to its nearest
of C deterministic centroids, then search only within the probed
buckets — turning the O(N·Q) cross join into O(N·Q/C · nprobe).

All dot products are JVM-side expressions (zip_with + aggregate); no
Python in the scoring loop. A vectorized pandas-UDF scorer is provided
for very wide vectors where numpy BLAS beats codegen'd loops.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = [
    "cosine_expr",
    "knn_bruteforce",
    "ivf_assign",
    "knn_ivf",
    "knn_bruteforce_pandas",
]


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_expr(a: Column, b: Column) -> Column:
    """Cosine similarity of two array columns, computed with
    zip_with/aggregate higher-order functions (whole-stage codegen)."""
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    query_id_col: Optional[str] = None,
    k: int = 10,
) -> DataFrame:
    """Exact top-k by cosine: (query_id, neighbor_id, cosine, rank).

    The query side is broadcast (queries << corpus in every real
    workload), so the corpus is scanned once with no shuffle; the only
    shuffle is the per-query top-k window. Excludes self-matches when
    ids collide.
    """
    qid = query_id_col or id_col
    q = F.broadcast(
        queries.select(F.col(qid).alias("query_id"), F.col(vec_col).alias("qv"))
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.crossJoin(q)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_expr(F.col("qv"), F.col("cv")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _centroids_from_corpus(corpus: DataFrame, id_col: str, vec_col: str, n: int) -> DataFrame:
    """Deterministic centroid seeds: the n corpus vectors with the
    smallest md5(id) — stable across runs/engines, no RNG."""
    w = Window.orderBy(F.md5(F.col(id_col).cast("string")))
    return (
        corpus.select(F.col(id_col), F.col(vec_col))
        .withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= n)
        .select(F.col("__r").alias("centroid_id"), F.col(vec_col).alias("centroid"))
    )


def ivf_assign(
    corpus: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    n_centroids: int = 16,
    centroids: Optional[DataFrame] = None,
) -> tuple[DataFrame, DataFrame]:
    """Assign each vector to its nearest centroid (IVF coarse quantizer).

    Returns (assigned corpus with ``bucket`` column, centroids). The
    centroid table is tiny and broadcast; assignment is one scan with a
    per-row argmax window (no shuffle of the corpus payload beyond the
    rank)."""
    cents = centroids or _centroids_from_corpus(corpus, id_col, vec_col, n_centroids)
    cents = F.broadcast(cents)
    scored = corpus.crossJoin(cents).select(
        F.col(id_col),
        F.col(vec_col),
        F.col("centroid_id"),
        cosine_expr(F.col(vec_col), F.col("centroid")).alias("__sim"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("__sim"), F.asc("centroid_id"))
    assigned = (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select(id_col, vec_col, F.col("centroid_id").alias("bucket"))
    )
    return assigned, cents


def knn_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    query_id_col: Optional[str] = None,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 3,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in each query's
    ``nprobe`` nearest buckets. Recall grows with nprobe; at
    nprobe = n_centroids this equals brute force.

    At 100 TB the bucketed corpus would be written partitioned by
    ``bucket`` so each query touches nprobe partitions (partition
    pruning on the join key)."""
    qid = query_id_col or id_col
    assigned, cents = ivf_assign(corpus, id_col=id_col, vec_col=vec_col, n_centroids=n_centroids)

    q = queries.select(F.col(qid).alias("query_id"), F.col(vec_col).alias("qv"))
    q_scored = q.crossJoin(cents).select(
        "query_id",
        "qv",
        F.col("centroid_id").alias("bucket"),
        cosine_expr(F.col("qv"), F.col("centroid")).alias("__sim"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("__sim"), F.asc("bucket"))
    probes = (
        q_scored.withColumn("__rk", F.row_number().over(wq))
        .filter(F.col("__rk") <= nprobe)
        .select("query_id", "qv", "bucket")
    )

    c = assigned.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), "bucket")
    scored = (
        c.join(F.broadcast(probes), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cosine_expr(F.col("qv"), F.col("cv")).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def knn_bruteforce_pandas(
    corpus: DataFrame,
    queries_local: Sequence[tuple],
    *,
    id_col: str,
    vec_col: str,
    k: int = 10,
) -> DataFrame:
    """Vectorized-numpy variant: queries held as a broadcast numpy
    matrix, corpus streamed through mapInPandas — one BLAS matmul per
    Arrow batch. Preferable for wide vectors (d >= 512) where the
    higher-order-function loop costs more than Arrow transfer."""
    import numpy as np
    import pandas as pd

    qids = [q[0] for q in queries_local]
    qmat = np.asarray([q[1] for q in queries_local], dtype=np.float64)
    qnorm = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)

    def score(iterator):
        for pdf in iterator:
            ids = pdf[id_col].to_numpy()
            mat = np.asarray(pdf[vec_col].to_list(), dtype=np.float64)
            mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            sims = mat @ qnorm.T  # (batch, n_queries)
            out = {
                "query_id": np.repeat(qids, len(ids)),
                "neighbor_id": np.tile(ids, len(qids)),
                "cosine": sims.T.ravel(),
            }
            yield pd.DataFrame(out)

    scored = corpus.select(id_col, vec_col).mapInPandas(
        score, f"query_id string, neighbor_id string, cosine double"
    )
    scored = scored.filter(F.col("neighbor_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
