"""Streaming MinHash near-dup detection (streaming/fuzzydedup.py):
cross-micro-batch matches through bucket state, exact-copy estimate of
1.0, unrelated docs silent, FIFO state cap, bands|num_hashes contract.
"""

import pytest

from openmldb_spark.streaming.fuzzydedup import stream_minhash_dedup

BASE = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lam mu nu xi omicron pi rho sigma tau upsilon"
)
NEAR = BASE.replace("kappa", "kappa2")  # one token changed
OTHER = (
    "one two three four five six seven eight nine ten "
    "eleven twelve thirteen fourteen fifteen sixteen s17 s18 s19 s20"
)


def _run(spark, tmp_path, batches, **kw):
    src = tmp_path / "fd_src"
    src.mkdir(exist_ok=True)
    stream = (
        spark.readStream.schema("doc_id int, text string")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    out = stream_minhash_dedup(stream, shingle_n=3, **kw)
    got: list = []
    q = (
        out.writeStream.outputMode("append")
        .foreachBatch(
            lambda df, bid: got.extend(
                df.dropDuplicates(["doc_id", "match_id"]).collect()
            )
        )
        .option("checkpointLocation", str(tmp_path / "fd_ckpt"))
        .start()
    )
    try:
        for i, rows in enumerate(batches):
            spark.createDataFrame(rows, "doc_id int, text string").coalesce(
                1
            ).write.parquet(str(src / f"b{i}"))
            for _ in range(3):
                q.processAllAvailable()
    finally:
        q.stop()
    return got


def test_cross_batch_near_dup_and_exact_copy(spark, tmp_path):
    got = _run(
        spark,
        tmp_path,
        [
            [(1, BASE)],
            [(2, NEAR), (3, OTHER)],  # near-dup of doc 1 + unrelated
            [(4, BASE)],              # exact copy of doc 1, two batches later
        ],
    )
    pairs = {(r["doc_id"], r["match_id"]): r["est_jaccard"] for r in got}
    assert ("2", "1") in pairs, pairs  # cross-batch: state carried doc 1
    assert pairs[("2", "1")] >= 0.5
    # exact copy: every minhash slot equal
    assert pairs.get(("4", "1")) == 1.0, pairs
    # the unrelated doc matches nothing, and nothing matches it
    assert not any("3" in p for p in pairs), pairs


@pytest.mark.slow
def test_emits_only_against_earlier_docs(spark, tmp_path):
    got = _run(spark, tmp_path, [[(1, BASE)], [(2, BASE)]])
    pairs = {(r["doc_id"], r["match_id"]) for r in got}
    assert pairs == {("2", "1")}, pairs  # never the reverse direction


@pytest.mark.slow
def test_state_fifo_cap(spark, tmp_path):
    """max_per_bucket=1: doc 1 is evicted from every bucket once doc 2
    lands, so the later exact copy of doc 1 can only match doc 2."""
    got = _run(
        spark,
        tmp_path,
        [[(1, BASE)], [(2, BASE)], [(3, BASE)]],
        max_per_bucket=1,
    )
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], set()).add(r["match_id"])
    assert by_doc["2"] == {"1"}
    assert by_doc["3"] == {"2"}, by_doc  # doc 1 evicted


def test_bands_must_divide(spark, tmp_path):
    src = tmp_path / "fd_div_src"
    src.mkdir()
    stream = spark.readStream.schema("doc_id int, text string").parquet(str(src))
    with pytest.raises(ValueError, match="divide"):
        stream_minhash_dedup(stream, num_hashes=64, bands=7)


@pytest.mark.slow
def test_redelivered_doc_id_does_not_inflate_state(spark, tmp_path):
    """ADVICE r10: a re-delivered doc_id must refresh its bucket entry, not
    append a copy — with max_per_bucket=2, three deliveries of doc 1 would
    otherwise evict doc 2 and doc 3's copy could only match doc 1."""
    got = _run(
        spark,
        tmp_path,
        [[(1, BASE)], [(2, BASE)], [(1, BASE)], [(1, BASE)], [(3, BASE)]],
        max_per_bucket=2,
    )
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], set()).add(r["match_id"])
    # doc 2 survived the cap (state holds one entry per DISTINCT id)
    assert by_doc["3"] == {"1", "2"}, by_doc
    # a re-delivery never matches itself
    assert "1" not in by_doc.get("1", set()), by_doc


@pytest.mark.slow
def test_stream_pairs_equal_batch_lsh_pairs(spark, tmp_path):
    """Mode-consistency pin (SURVEY §0 north star): the same corpus through
    the STREAM op (one doc per micro-batch) and the BATCH LSH pipeline with
    identical num_hashes/shingle_n/bands/threshold yields the SAME pair set
    with the SAME estimates (the stream signature is the projection-form
    minhash_signatures, the batch banding groups on equal band slices)."""
    from pyspark.sql import functions as F

    from openmldb_spark.pipeline.dedup import minhash_lsh_pairs, minhash_signatures

    docs = [
        (1, BASE),
        (2, NEAR),
        (3, OTHER),
        (4, BASE),
        (5, OTHER.replace("three", "tres").replace("nine", "nueve")),
    ]
    kw = dict(num_hashes=32, bands=8, threshold=0.4)
    got = _run(spark, tmp_path, [[d] for d in docs], **kw)
    stream_pairs = {
        (int(r["match_id"]), int(r["doc_id"])): r["est_jaccard"] for r in got
    }

    bdf = spark.createDataFrame(docs, "doc_id int, text string")
    sigs = minhash_signatures(
        bdf, "text", num_hashes=32, shingle_n=3, out_col="minhash"
    )
    batch = minhash_lsh_pairs(
        sigs, "doc_id", bands=8, min_jaccard_est=0.4
    ).select("a", "b", F.round("jaccard_est", 4).alias("est"))
    batch_pairs = {(r["a"], r["b"]): r["est"] for r in batch.collect()}

    # docs arrive in id order, so stream direction (earlier, later) == (a, b)
    assert stream_pairs == batch_pairs, (stream_pairs, batch_pairs)
    assert stream_pairs, "corpus must produce at least one near-dup pair"
