"""Incremental near-duplicate detection — dedup a NEW ingestion batch
against an EXISTING corpus without rescanning the corpus.

The production continual-ingestion shape: a 100 TB corpus is deduped
once, its banded MinHash index is persisted (parquet — ``bands`` small
rows per document: band, bucket, signature), and every subsequent batch
only (1) signs itself, (2) equi-joins its band buckets against the
index, and (3) scores the collisions. Cost per batch is
O(batch × bands) shuffle rows plus the bucket-collision join — the
corpus is touched only through the index, never re-shingled.

Consistency contract (pinned in ``tests/test_incremental_dedup.py``):
the same banding and estimator as the batch pipeline
(:func:`openmldb_spark.pipeline.dedup.minhash_lsh_pairs`), so
``incremental_near_dups(new, index(old))`` equals the (old, new) cross
pairs of ``minhash_lsh_pairs(old ∪ new)`` exactly — batch-rebuild and
incremental ingestion can be mixed freely without drift. The streaming
sibling (:mod:`openmldb_spark.streaming.fuzzydedup`) covers the
micro-batch case with bounded state; this module is the batch-to-batch
case with an unbounded, persistable index.

Reference note: the reference has no corpus-dedup surface; this is
Spark-native pipeline tooling (SURVEY §6 pipeline additions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import minhash_signatures


def _band_buckets(sig: DataFrame, id_col: str, sig_col: str, bands: int) -> DataFrame:
    """(id, band, bucket) per document — the exact banding of
    ``minhash_lsh_candidates`` (hash of the band's signature slice), kept
    in lockstep so incremental and batch pipelines collide identically."""
    s = F.col(sig_col)
    return sig.select(
        F.col(id_col).alias("__id"),
        s.alias("__sig"),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.array_join(
                            F.transform(
                                F.slice(
                                    s,
                                    (b * (F.size(s) / bands)).cast("int") + 1,
                                    (F.size(s) / bands).cast("int"),
                                ),
                                lambda x: x.cast("string"),
                            ),
                            ",",
                        )
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select(
        "__id", "__sig",
        F.col("bb.band").alias("__band"), F.col("bb.bucket").alias("__bucket"),
    )


def minhash_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 5,
) -> DataFrame:
    """The persistable banded index of a corpus: one row per (document,
    band) with columns ``(id, band, bucket, minhash)``. Write it out with
    ``df.write.parquet(...)`` partitioned however the store likes; union
    a new batch's own index rows onto it after ingestion so the next
    batch dedups against both. ``num_hashes % bands`` must be 0-safe the
    same way the batch pipeline slices (integer division of the
    signature)."""
    sig = minhash_signatures(
        df.select(id_col, text_col), text_col,
        id_col=id_col, num_hashes=num_hashes, shingle_n=shingle_n,
    )
    return _band_buckets(sig, id_col, "minhash", bands).select(
        F.col("__id").alias("id"),
        F.col("__band").alias("band"),
        F.col("__bucket").alias("bucket"),
        F.col("__sig").alias("minhash"),
    )


def exact_index(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Persistable exact-dup index: ``(id, fp)``, fp = xxhash64 of the
    text — the house 64-bit hash-for-set-membership convention (collision
    odds ~2^-64 per pair; the batch ``exact_dedup`` keys RAW values, which
    an index can't afford at 100 TB). Parquet it, union new batches on."""
    return df.select(
        F.col(id_col).alias("id"), F.xxhash64(F.col(text_col)).alias("fp")
    )


def incremental_exact_dups(
    new_docs: DataFrame,
    index: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Exact duplicates of a new batch against an indexed corpus:
    ``(new_id, corpus_id)`` per fingerprint collision. One equi-join on
    the 8-byte fingerprint; broadcast-ability is the optimizer's call
    (the batch side is usually the small one). Drop the new batch's
    duplicate rows with an anti-join on ``new_id``."""
    nb = exact_index(new_docs, id_col, text_col)
    return (
        nb.alias("n")
        .join(index.alias("c"), F.col("n.fp") == F.col("c.fp"))
        .where(F.col("n.id") != F.col("c.id"))
        .select(
            F.col("n.id").alias("new_id"), F.col("c.id").alias("corpus_id")
        )
    )


def incremental_near_dups(
    new_docs: DataFrame,
    index: DataFrame,
    id_col: str,
    text_col: str,
    *,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 5,
    min_jaccard_est: float = 0.0,
    max_bucket: int = 1000,
) -> DataFrame:
    """Near-duplicate pairs between a new batch and an indexed corpus:
    ``(new_id, corpus_id, jaccard_est)``. MinHash parameters MUST match
    the ones the index was built with (same banding → same collisions).

    Plan shape: the new batch signs itself (one shuffle on its own ids),
    band buckets equi-join the index on (band, bucket) — never all-pairs
    — and the estimate is the matching-slot fraction over the two stored
    signatures. Index buckets larger than ``max_bucket`` are dropped
    (the boilerplate guard of the batch pipeline, same stance)."""
    nb = _band_buckets(
        minhash_signatures(
            new_docs.select(id_col, text_col), text_col,
            id_col=id_col, num_hashes=num_hashes, shingle_n=shingle_n,
        ),
        id_col, "minhash", bands,
    )
    big = (
        index.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("__bsize"))
        .filter(F.col("__bsize") > max_bucket)
        .select("band", "bucket")
    )
    idx = index.join(F.broadcast(big), ["band", "bucket"], "left_anti")
    cand = (
        nb.join(
            idx,
            (nb["__band"] == idx["band"]) & (nb["__bucket"] == idx["bucket"]),
        )
        .where(nb["__id"] != idx["id"])
        .select(
            nb["__id"].alias("new_id"),
            idx["id"].alias("corpus_id"),
            nb["__sig"].alias("__sa"),
            idx["minhash"].alias("__sb"),
        )
        .dropDuplicates(["new_id", "corpus_id"])
    )
    est = (
        F.size(
            F.filter(
                F.zip_with(F.col("__sa"), F.col("__sb"), lambda x, y: x == y),
                lambda eq: eq,
            )
        )
        / F.size(F.col("__sa"))
    )
    return (
        cand.withColumn("jaccard_est", est)
        .filter(F.col("jaccard_est") >= min_jaccard_est)
        .select("new_id", "corpus_id", "jaccard_est")
    )
