"""Incremental near-dup detection against a persisted MinHash index
(pipeline/incremental.py) — the batch-to-batch continual-ingestion shape.
The decisive contract: incremental(new vs index(old)) == the (old, new)
cross pairs of the batch pipeline run over old ∪ new."""

from pyspark.sql import functions as F

from openmldb_spark.pipeline.dedup import minhash_lsh_pairs, minhash_signatures
from openmldb_spark.pipeline.incremental import (
    incremental_near_dups,
    minhash_index,
)

OLD = [
    (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2, "one two three four five six seven eight nine ten"),
    (3, "red orange yellow green blue indigo violet pink brown black"),
]
NEW = [
    (11, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),  # copy of 1
    (12, "one two three four five six seven eight nine eleven"),       # near 2
    (13, "totally different words with no overlap at all whatsoever"),
]
KW = dict(num_hashes=32, bands=8, shingle_n=3)


def test_incremental_equals_batch_cross_pairs(spark):
    old = spark.createDataFrame(OLD, "doc_id int, text string")
    new = spark.createDataFrame(NEW, "doc_id int, text string")
    idx = minhash_index(old, "doc_id", "text", **KW)
    inc = {
        (r["corpus_id"], r["new_id"]): round(r["jaccard_est"], 6)
        for r in incremental_near_dups(new, idx, "doc_id", "text", **KW).collect()
    }

    both = old.unionByName(new)
    sigs = minhash_signatures(
        both, "text", id_col="doc_id", num_hashes=32, shingle_n=3
    )
    batch = {
        (r["a"], r["b"]): round(r["jaccard_est"], 6)
        for r in minhash_lsh_pairs(sigs, "doc_id", bands=8).collect()
        if r["a"] <= 10 < r["b"]  # restrict to (old, new) cross pairs
    }
    assert inc == batch, (inc, batch)
    assert (1, 11) in inc and inc[(1, 11)] == 1.0  # the exact copy


def test_index_round_trips_through_parquet(spark, tmp_path):
    """The index is a plain persistable table: write/read parquet and the
    incremental join must produce identical pairs."""
    old = spark.createDataFrame(OLD, "doc_id int, text string")
    new = spark.createDataFrame(NEW, "doc_id int, text string")
    p = str(tmp_path / "mh_index")
    minhash_index(old, "doc_id", "text", **KW).write.parquet(p)
    idx = spark.read.parquet(p)
    got = {
        (r["new_id"], r["corpus_id"])
        for r in incremental_near_dups(
            new, idx, "doc_id", "text", min_jaccard_est=0.5, **KW
        ).collect()
    }
    assert got == {(11, 1), (12, 2)}, got


def test_threshold_and_hot_bucket_guard(spark):
    old = spark.createDataFrame(OLD, "doc_id int, text string")
    new = spark.createDataFrame(NEW, "doc_id int, text string")
    idx = minhash_index(old, "doc_id", "text", **KW)
    # a high threshold keeps only the exact copy
    strict = incremental_near_dups(
        new, idx, "doc_id", "text", min_jaccard_est=0.99, **KW
    ).collect()
    assert {(r["new_id"], r["corpus_id"]) for r in strict} == {(11, 1)}
    # max_bucket=0 drops EVERY bucket -> no pairs at all (guard wiring)
    none = incremental_near_dups(
        new, idx, "doc_id", "text", max_bucket=0, **KW
    ).collect()
    assert none == []


def test_index_union_grows_incrementally(spark):
    """Ingesting a batch = union its own index rows; the NEXT batch then
    matches against both the original corpus and the first batch."""
    old = spark.createDataFrame(OLD, "doc_id int, text string")
    b1 = spark.createDataFrame(NEW, "doc_id int, text string")
    b2 = spark.createDataFrame(
        [(21, "totally different words with no overlap at all whatsoever")],
        "doc_id int, text string",
    )  # copy of 13, which only exists in batch 1
    idx = minhash_index(old, "doc_id", "text", **KW).unionByName(
        minhash_index(b1, "doc_id", "text", **KW)
    )
    got = {
        (r["new_id"], r["corpus_id"])
        for r in incremental_near_dups(
            b2, idx, "doc_id", "text", min_jaccard_est=0.9, **KW
        ).collect()
    }
    assert got == {(21, 13)}, got


def test_incremental_exact_dups(spark):
    from openmldb_spark.pipeline.incremental import (
        exact_index,
        incremental_exact_dups,
    )

    old = spark.createDataFrame(OLD, "doc_id int, text string")
    new = spark.createDataFrame(NEW, "doc_id int, text string")
    idx = exact_index(old, "doc_id", "text")
    got = {
        (r["new_id"], r["corpus_id"])
        for r in incremental_exact_dups(new, idx, "doc_id", "text").collect()
    }
    assert got == {(11, 1)}, got  # only the byte-identical copy
    # dropping flagged rows keeps the rest of the batch
    dups = incremental_exact_dups(new, idx, "doc_id", "text").select(
        F.col("new_id").alias("doc_id")
    )
    kept = new.join(dups, "doc_id", "left_anti")
    assert {r["doc_id"] for r in kept.collect()} == {12, 13}
