"""Incremental near-dup detection against a persisted MinHash index
(pipeline/incremental.py) — the batch-to-batch continual-ingestion shape.
The decisive contract: incremental(new vs index(old)) == the (old, new)
cross pairs of the batch pipeline run over old ∪ new — including at the
max_bucket boundary (the guard counts old∪new like the batch run). The
index is SKINNY: band rows are (id, band, bucket) only; signatures live
once per doc in a companion table and join on AFTER the pair dedup."""

import pytest
from pyspark.sql import functions as F

from openmldb_spark.pipeline.dedup import minhash_lsh_pairs, minhash_signatures
from openmldb_spark.pipeline.incremental import (
    compact_index,
    incremental_near_dups,
    minhash_index,
    minhash_signature_table,
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


def _index_pair(spark, rows):
    df = spark.createDataFrame(rows, "doc_id int, text string")
    return (
        minhash_index(df, "doc_id", "text", **KW),
        minhash_signature_table(
            df, "doc_id", "text", num_hashes=32, shingle_n=3
        ),
    )


def test_incremental_equals_batch_cross_pairs(spark):
    old = spark.createDataFrame(OLD, "doc_id int, text string")
    new = spark.createDataFrame(NEW, "doc_id int, text string")
    idx, sigs_old = _index_pair(spark, OLD)
    inc = {
        (r["corpus_id"], r["new_id"]): round(r["jaccard_est"], 6)
        for r in incremental_near_dups(
            new, idx, "doc_id", "text", signatures=sigs_old, **KW
        ).collect()
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


def test_index_is_skinny_and_round_trips_through_parquet(spark, tmp_path):
    """Both index tables are plain persistable parquet: band rows carry
    NO signature array (ids-only-shuffle design), and the probe over the
    re-read tables produces identical pairs."""
    idx, sigs = _index_pair(spark, OLD)
    assert set(idx.columns) == {
        "id", "band", "bucket", "num_hashes", "bands", "shingle_n"
    }
    assert not any("array" in f.dataType.typeName() for f in idx.schema.fields)
    assert set(sigs.columns) == {"id", "minhash"}

    new = spark.createDataFrame(NEW, "doc_id int, text string")
    pb, ps = str(tmp_path / "mh_bands"), str(tmp_path / "mh_sigs")
    idx.write.parquet(pb)
    sigs.write.parquet(ps)
    got = {
        (r["new_id"], r["corpus_id"])
        for r in incremental_near_dups(
            new, spark.read.parquet(pb), "doc_id", "text",
            signatures=spark.read.parquet(ps), min_jaccard_est=0.5, **KW
        ).collect()
    }
    assert got == {(11, 1), (12, 2)}, got


def test_threshold_and_hot_bucket_guard(spark):
    new = spark.createDataFrame(NEW, "doc_id int, text string")
    idx, sigs = _index_pair(spark, OLD)
    # a high threshold keeps only the exact copy
    strict = incremental_near_dups(
        new, idx, "doc_id", "text", signatures=sigs,
        min_jaccard_est=0.99, **KW
    ).collect()
    assert {(r["new_id"], r["corpus_id"]) for r in strict} == {(11, 1)}
    # max_bucket=0 drops EVERY bucket -> no pairs at all (guard wiring)
    none = incremental_near_dups(
        new, idx, "doc_id", "text", signatures=sigs, max_bucket=0, **KW
    ).collect()
    assert none == []


@pytest.mark.slow
def test_hot_bucket_guard_counts_both_sides(spark):
    """The guard sizes buckets over old∪new exactly like the batch run:
    2 old copies + 2 new copies of one text = 4-row buckets, so at
    max_bucket=3 BOTH pipelines drop the pairs (an index-only count of 2
    would keep them), and at max_bucket=4 both keep them."""
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    old_rows = [(1, text), (2, text)]
    new_rows = [(11, text), (12, text)]
    new = spark.createDataFrame(new_rows, "doc_id int, text string")
    idx, sigs = _index_pair(spark, old_rows)

    both = spark.createDataFrame(
        old_rows + new_rows, "doc_id int, text string"
    )
    bsigs = minhash_signatures(
        both, "text", id_col="doc_id", num_hashes=32, shingle_n=3
    )
    for cap in (3, 4):
        inc = {
            (r["corpus_id"], r["new_id"])
            for r in incremental_near_dups(
                new, idx, "doc_id", "text", signatures=sigs,
                max_bucket=cap, **KW
            ).collect()
        }
        batch = {
            (r["a"], r["b"])
            for r in minhash_lsh_pairs(
                bsigs, "doc_id", bands=8, max_bucket=cap
            ).collect()
            if r["a"] <= 10 < r["b"]
        }
        assert inc == batch, (cap, inc, batch)
    assert inc == {(1, 11), (1, 12), (2, 11), (2, 12)}  # cap=4 keeps all


@pytest.mark.slow
def test_index_union_grows_incrementally(spark):
    """Ingesting a batch = union its own index rows (both tables); the
    NEXT batch then matches against the original corpus AND batch 1."""
    b2 = spark.createDataFrame(
        [(21, "totally different words with no overlap at all whatsoever")],
        "doc_id int, text string",
    )  # copy of 13, which only exists in batch 1
    i0, s0 = _index_pair(spark, OLD)
    i1, s1 = _index_pair(spark, NEW)
    got = {
        (r["new_id"], r["corpus_id"])
        for r in incremental_near_dups(
            b2, i0.unionByName(i1), "doc_id", "text",
            signatures=s0.unionByName(s1), min_jaccard_est=0.9, **KW
        ).collect()
    }
    assert got == {(21, 13)}, got


@pytest.mark.slow
def test_reingestion_compaction_idempotent(spark):
    """Replaying an ingestion (same index rows unioned twice) is repaired
    by compact_index: probe results equal the single-ingest results, and
    the compacted row count is back to docs × bands."""
    new = spark.createDataFrame(NEW, "doc_id int, text string")
    idx, sigs = _index_pair(spark, OLD)
    replayed = compact_index(idx.unionByName(idx))
    assert replayed.count() == len(OLD) * KW["bands"]
    once = {
        (r["new_id"], r["corpus_id"])
        for r in incremental_near_dups(
            new, idx, "doc_id", "text", signatures=sigs,
            min_jaccard_est=0.5, **KW
        ).collect()
    }
    again = {
        (r["new_id"], r["corpus_id"])
        for r in incremental_near_dups(
            new, replayed, "doc_id", "text", signatures=sigs,
            min_jaccard_est=0.5, **KW
        ).collect()
    }
    assert once == again == {(11, 1), (12, 2)}


@pytest.mark.slow
def test_parameter_validation(spark):
    new = spark.createDataFrame(NEW, "doc_id int, text string")
    idx, sigs = _index_pair(spark, OLD)
    # bands must divide num_hashes (parity with streaming/fuzzydedup)
    with pytest.raises(ValueError, match="must divide"):
        minhash_index(new, "doc_id", "text", num_hashes=32, bands=6)
    with pytest.raises(ValueError, match="must divide"):
        incremental_near_dups(
            new, idx, "doc_id", "text", signatures=sigs,
            num_hashes=32, bands=6, shingle_n=3,
        )
    # a probe whose parameters disagree with the index metadata raises
    # naming stored vs given, instead of silently returning near-nothing
    with pytest.raises(ValueError, match=r"\(32, 8, 3\).*\(32, 4, 3\)"):
        incremental_near_dups(
            new, idx, "doc_id", "text", signatures=sigs,
            num_hashes=32, bands=4, shingle_n=3,
        )
    # a pre-metadata (or externally built) skinny index passes unchecked
    bare = idx.select("id", "band", "bucket")
    got = incremental_near_dups(
        new, bare, "doc_id", "text", signatures=sigs,
        min_jaccard_est=0.5, **KW
    ).collect()
    assert {(r["new_id"], r["corpus_id"]) for r in got} == {(11, 1), (12, 2)}


@pytest.mark.slow
def test_collision_join_shuffles_no_arrays(spark):
    """Plan pin for the ids-only discipline: every Exchange that feeds
    the band/bucket collision join or the pair dedup carries NO array
    column — signatures join on only after dropDuplicates."""
    new = spark.createDataFrame(NEW, "doc_id int, text string")
    idx, sigs = _index_pair(spark, OLD)
    df = incremental_near_dups(
        new, idx, "doc_id", "text", signatures=sigs, **KW
    )
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(mode)
    exchanges = []
    for para in plan.split("\n\n"):
        lines = para.strip().splitlines()
        if not lines or ") Exchange" not in lines[0]:
            continue
        args = next((l for l in lines if l.startswith("Arguments")), "")
        inp = next((l for l in lines if l.startswith("Input")), "")
        exchanges.append((args, inp))
    assert exchanges, plan  # formatted explain did list Exchange nodes
    band_exchanges = [
        (a, i) for a, i in exchanges if "band" in a or "bucket" in a
    ]
    assert band_exchanges, plan  # the collision join's shuffles exist
    for args, inp in band_exchanges:
        assert "minhash" not in inp and "__sa" not in inp and "__sb" not in inp, (
            args, inp,
        )


@pytest.mark.slow
def test_empty_batch_and_empty_index(spark):
    """Degenerate inputs stay well-formed: an empty new batch or an empty
    index produce zero pairs without erroring (the metadata validator
    skips an empty index — first() returns None)."""
    from pyspark.sql import functions as F

    new = spark.createDataFrame(NEW, "doc_id int, text string")
    idx, sigs = _index_pair(spark, OLD)
    empty_docs = new.where(F.lit(False))
    assert incremental_near_dups(
        empty_docs, idx, "doc_id", "text", signatures=sigs, **KW
    ).count() == 0
    assert incremental_near_dups(
        new, idx.where(F.lit(False)), "doc_id", "text",
        signatures=sigs, **KW
    ).count() == 0


@pytest.mark.slow
def test_index_store_lifecycle(spark, tmp_path):
    """MinhashIndexStore: build -> ingest (detect BEFORE append) ->
    next batch matches the previous one -> compact repairs a replay."""
    from openmldb_spark.pipeline.incremental import MinhashIndexStore

    store = MinhashIndexStore(spark, str(tmp_path / "mh"), **KW)
    assert not store.exists()
    store.build(
        spark.createDataFrame(OLD, "doc_id int, text string"), "doc_id", "text"
    )
    assert store.exists()

    b1 = spark.createDataFrame(NEW, "doc_id int, text string")
    dups1 = store.ingest(b1, "doc_id", "text", min_jaccard_est=0.5)
    # detected against the PRE-append index: no self-matches
    got1 = {(r["new_id"], r["corpus_id"]) for r in dups1.collect()}
    assert got1 == {(11, 1), (12, 2)}, got1
    # batch 2 duplicates a batch-1 doc -> the append made it visible
    b2 = spark.createDataFrame(
        [(21, "totally different words with no overlap at all whatsoever")],
        "doc_id int, text string",
    )
    dups2 = store.ingest(b2, "doc_id", "text", min_jaccard_est=0.9)
    assert {(r["new_id"], r["corpus_id"]) for r in dups2.collect()} == {(21, 13)}

    # replay batch 2 (its self-copy now matches), then compact: row
    # counts return to one-per-(id, band) and probes are unchanged
    store.ingest(b2, "doc_id", "text")
    n_docs = len(OLD) + len(NEW) + 2  # b2 ingested twice
    assert store.index().count() == n_docs * KW["bands"]
    store.compact()
    assert store.index().count() == (n_docs - 1) * KW["bands"]
    assert store.signatures().count() == n_docs - 1
    probe = store.near_dups(b1, "doc_id", "text", min_jaccard_est=0.99)
    got = {(r["new_id"], r["corpus_id"]) for r in probe.collect()}
    # doc 11's own ingested copy shares its id (same-id pairs are
    # excluded by design); its corpus twin still matches, and doc 13
    # now matches its batch-2 copy (21) through the ingested index
    assert got == {(11, 1), (13, 21)}, got

    # a store opened at different parameters raises on the first probe
    wrong = MinhashIndexStore(
        spark, str(tmp_path / "mh"), num_hashes=32, bands=4, shingle_n=3
    )
    with pytest.raises(ValueError, match="same banding"):
        wrong.near_dups(b1, "doc_id", "text").collect()


@pytest.mark.slow
def test_store_hadoop_fs_lifecycle_and_compact_repairs_orphans(spark, tmp_path):
    """Lifecycle hardening (r13: Hadoop-FS lifecycle): a ``file:`` URI
    root — refused in r12 because the lifecycle was ``os.*`` — now runs
    the full build/ingest/compact cycle through the Hadoop FileSystem
    API (the same path resolution Spark's parquet IO applies, so bare
    paths on a non-``file:`` ``fs.defaultFS`` cluster cannot split
    between driver-local and Spark-side filesystems), and compact()
    drops orphan band rows that have no signature (a torn ingest) so
    their collisions stop inflating hot buckets."""
    from openmldb_spark.pipeline.incremental import (
        MinhashIndexStore,
        minhash_index,
    )

    uri_store = MinhashIndexStore(
        spark, "file://" + str(tmp_path / "mh_uri"), **KW
    )
    assert not uri_store.exists()
    uri_store.build(
        spark.createDataFrame(OLD, "doc_id int, text string"), "doc_id", "text"
    )
    assert uri_store.exists()
    b1u = spark.createDataFrame(NEW, "doc_id int, text string")
    got_uri = {
        (r["new_id"], r["corpus_id"])
        for r in uri_store.ingest(b1u, "doc_id", "text", min_jaccard_est=0.5).collect()
    }
    assert got_uri == {(11, 1), (12, 2)}, got_uri
    uri_store.compact()
    assert uri_store.index().count() == (len(OLD) + len(NEW)) * KW["bands"]

    store = MinhashIndexStore(spark, str(tmp_path / "mh"), **KW)
    store.build(
        spark.createDataFrame(OLD, "doc_id int, text string"), "doc_id", "text"
    )
    # orphan band rows: an id (99) present in bands/ but absent from sigs/
    orphan = spark.createDataFrame(
        [(99, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        "doc_id int, text string",
    )
    minhash_index(orphan, "doc_id", "text", **KW).write.mode("append").parquet(
        store.bands_path
    )
    assert store.index().where("id = 99").count() == KW["bands"]
    store.compact()
    assert store.index().where("id = 99").count() == 0
    assert store.index().count() == len(OLD) * KW["bands"]
    # probes over the repaired store are intact
    b1 = spark.createDataFrame(NEW, "doc_id int, text string")
    got = {
        (r["new_id"], r["corpus_id"])
        for r in store.near_dups(b1, "doc_id", "text", min_jaccard_est=0.5).collect()
    }
    assert got == {(11, 1), (12, 2)}, got


def test_torn_compact_self_heals_on_open(spark, tmp_path):
    """A crash between compact()'s two renames leaves the table parked in
    <table>.compact.old with the live path missing; the next store open
    renames it back (HadoopFs.recover), so a torn swap costs nothing but
    the compaction itself (ADVICE r12: the old docstring over-claimed one
    atomic swap; the swap is two renames)."""
    import os

    from openmldb_spark.pipeline.incremental import MinhashIndexStore

    root = str(tmp_path / "mh")
    store = MinhashIndexStore(spark, root, **KW)
    store.build(
        spark.createDataFrame(OLD, "doc_id int, text string"), "doc_id", "text"
    )
    n = store.index().count()
    # simulate the torn state: live table parked, nothing renamed back yet
    os.rename(store.bands_path, store.bands_path + ".compact.old")
    assert not os.path.isdir(store.bands_path)

    healed = MinhashIndexStore(spark, root, **KW)
    assert healed.exists()
    assert healed.index().count() == n
    assert not os.path.isdir(store.bands_path + ".compact.old")


@pytest.mark.slow
def test_replayed_uncompacted_probe_has_no_duplicate_pairs(spark, tmp_path):
    """r12 verdict #2: a replayed-but-uncompacted ingestion leaves
    duplicate (id) SIGNATURE rows, and the probe's estimate join then
    multiplied each candidate pair. The signature read now restores the
    one-row-per-doc invariant, so a probe between replay and compact()
    returns the same pair SET (no duplicates) as the compacted store."""
    from openmldb_spark.pipeline.incremental import MinhashIndexStore

    store = MinhashIndexStore(spark, str(tmp_path / "mh"), **KW)
    store.build(
        spark.createDataFrame(OLD, "doc_id int, text string"), "doc_id", "text"
    )
    b2 = spark.createDataFrame(
        [(21, "totally different words with no overlap at all whatsoever")],
        "doc_id int, text string",
    )
    store.ingest(b2, "doc_id", "text")
    store.ingest(b2, "doc_id", "text")  # replay, NOT compacted

    probe_df = store.near_dups(
        spark.createDataFrame(NEW, "doc_id int, text string"),
        "doc_id", "text", min_jaccard_est=0.5,
    )
    rows = [(r["new_id"], r["corpus_id"]) for r in probe_df.collect()]
    assert len(rows) == len(set(rows)), f"duplicate pairs: {sorted(rows)}"
    got_uncompacted = set(rows)
    assert (13, 21) in got_uncompacted  # the replayed doc still matches

    store.compact()
    got_compacted = {
        (r["new_id"], r["corpus_id"])
        for r in store.near_dups(
            spark.createDataFrame(NEW, "doc_id int, text string"),
            "doc_id", "text", min_jaccard_est=0.5,
        ).collect()
    }
    assert got_uncompacted == got_compacted


def test_mixed_parameter_index_raises(spark):
    """ADVICE r12: an index accidentally unioned from builds with
    different MinHash parameters must RAISE, not silently under-return
    collisions for the mismatched portion (a first()-row check passed
    whichever half it sampled)."""
    old = spark.createDataFrame(OLD, "doc_id int, text string")
    idx_a = minhash_index(old, "doc_id", "text", **KW)
    idx_b = minhash_index(
        old.withColumn("doc_id", F.col("doc_id") + 100),
        "doc_id", "text", num_hashes=32, bands=4, shingle_n=3,
    )
    mixed = idx_a.unionByName(idx_b)
    sigs = minhash_signature_table(
        old, "doc_id", "text", num_hashes=32, shingle_n=3
    )
    new = spark.createDataFrame(NEW, "doc_id int, text string")
    with pytest.raises(ValueError, match="mixes MinHash parameter tuples"):
        incremental_near_dups(
            new, mixed, "doc_id", "text", signatures=sigs, **KW
        )


@pytest.mark.slow
def test_ingest_signs_the_batch_exactly_once(spark, tmp_path):
    """ADVICE r12 (medium): ingest used to run the shingle+MinHash stage
    twice — once for detection, once for the append — so a
    nondeterministic source could index different signatures than it
    detected against. Pin: one ingest = exactly ONE minhash_signatures
    call (the checkpointed signing feeds both consumers)."""
    from openmldb_spark.pipeline import incremental as inc

    store = inc.MinhashIndexStore(spark, str(tmp_path / "mh"), **KW)
    store.build(
        spark.createDataFrame(OLD, "doc_id int, text string"), "doc_id", "text"
    )
    calls = []
    real = inc.minhash_signatures
    inc.minhash_signatures = lambda *a, **k: (calls.append(1), real(*a, **k))[1]
    try:
        dups = store.ingest(
            spark.createDataFrame(NEW, "doc_id int, text string"),
            "doc_id", "text", min_jaccard_est=0.5,
        )
        assert len(calls) == 1, f"batch signed {len(calls)} times"
    finally:
        inc.minhash_signatures = real
    got = {(r["new_id"], r["corpus_id"]) for r in dups.collect()}
    assert got == {(11, 1), (12, 2)}, got


def test_recover_swap_rolls_forward_committed_rewrite(spark, tmp_path):
    """A compact torn DURING the tmp->live rename (the object-store
    copy+delete case: live table left partially copied, committed tmp
    still present) must roll FORWARD on open — the committed rewrite
    supersedes whatever the live path holds. An UNCOMMITTED tmp (its
    writing job died: no _SUCCESS) is dropped instead and the live
    table stays authoritative."""
    import os
    import shutil

    from openmldb_spark.pipeline.incremental import MinhashIndexStore

    root = str(tmp_path / "mh")
    store = MinhashIndexStore(spark, root, **KW)
    store.build(
        spark.createDataFrame(OLD, "doc_id int, text string"), "doc_id", "text"
    )
    n = store.index().count()

    # committed tmp (full copy incl. _SUCCESS) + partially-copied live
    tmp = store.bands_path + ".compact.tmp"
    shutil.copytree(store.bands_path, tmp)
    assert os.path.exists(os.path.join(tmp, "_SUCCESS"))
    for f in sorted(os.listdir(store.bands_path)):
        if f.endswith(".parquet"):
            os.remove(os.path.join(store.bands_path, f))  # simulate tear
            break
    healed = MinhashIndexStore(spark, root, **KW)
    assert healed.index().count() == n
    assert not os.path.isdir(tmp)

    # uncommitted tmp: dropped, live untouched
    os.makedirs(tmp)
    open(os.path.join(tmp, "part-zzz.parquet"), "wb").close()  # no _SUCCESS
    healed2 = MinhashIndexStore(spark, root, **KW)
    assert not os.path.isdir(tmp)
    assert healed2.index().count() == n


def test_legacy_union_mixed_with_metadata_raises_cleanly(spark):
    """A pre-metadata index slice unioned in (allowMissingColumns) yields
    a (None, None, None) parameter tuple; the mixed-params error must be
    the informative ValueError, not a TypeError from ordering None
    against int."""
    old = spark.createDataFrame(OLD, "doc_id int, text string")
    idx_a = minhash_index(old, "doc_id", "text", **KW)
    legacy = idx_a.select("id", "band", "bucket")
    mixed = idx_a.unionByName(legacy, allowMissingColumns=True)
    sigs = minhash_signature_table(
        old, "doc_id", "text", num_hashes=32, shingle_n=3
    )
    new = spark.createDataFrame(NEW, "doc_id int, text string")
    with pytest.raises(ValueError, match="mixes MinHash parameter tuples"):
        incremental_near_dups(
            new, mixed, "doc_id", "text", signatures=sigs, **KW
        )


@pytest.mark.slow
def test_store_validates_params_once(spark, tmp_path):
    """The store memoizes parameter validation (the distinct scan is
    cheap but not free per probe at the design point): N probes = one
    _validate_index_params call."""
    from openmldb_spark.pipeline import incremental as inc

    store = inc.MinhashIndexStore(spark, str(tmp_path / "mh"), **KW)
    store.build(
        spark.createDataFrame(OLD, "doc_id int, text string"), "doc_id", "text"
    )
    calls = []
    real = inc._validate_index_params
    inc._validate_index_params = lambda *a, **k: (calls.append(1), real(*a, **k))[1]
    try:
        b1 = spark.createDataFrame(NEW, "doc_id int, text string")
        store.near_dups(b1, "doc_id", "text").collect()
        store.near_dups(b1, "doc_id", "text").collect()
        store.ingest(b1, "doc_id", "text")
        assert len(calls) == 1, f"validated {len(calls)} times"
    finally:
        inc._validate_index_params = real


def test_recover_swap_state_machine(spark, tmp_path):
    """Every crash point of compact()'s stage-and-swap, simulated as an
    on-disk state, must recover to a committed, probe-able table on the
    next open — with no .compact.tmp/.compact.old leftovers:

    1. tmp UNCOMMITTED (writer died), live intact  -> tmp dropped
    2. tmp COMMITTED, live intact (pre-park crash) -> roll forward
    3. tmp COMMITTED, live missing, parked present -> roll forward
    4. no tmp, live missing, parked present        -> roll back
    5. no tmp, live intact, parked orphan          -> orphan dropped
    """
    import os
    import shutil

    from openmldb_spark.pipeline.incremental import MinhashIndexStore

    base = str(tmp_path / "mh0")
    store0 = MinhashIndexStore(spark, base, **KW)
    store0.build(
        spark.createDataFrame(OLD, "doc_id int, text string"), "doc_id", "text"
    )
    n = store0.index().count()

    def scratch(tag, mutate):
        root = str(tmp_path / f"mh_{tag}")
        shutil.copytree(base, root)
        bands = os.path.join(root, "bands")
        mutate(bands)
        st = MinhashIndexStore(spark, root, **KW)
        assert st.exists(), tag
        assert st.index().count() == n, tag
        assert not os.path.exists(bands + ".compact.tmp"), tag
        assert not os.path.exists(bands + ".compact.old"), tag

    def s1(bands):
        os.makedirs(bands + ".compact.tmp")
        open(os.path.join(bands + ".compact.tmp", "part-x.parquet"), "wb").close()

    def s2(bands):
        shutil.copytree(bands, bands + ".compact.tmp")

    def s3(bands):
        shutil.copytree(bands, bands + ".compact.tmp")
        os.rename(bands, bands + ".compact.old")

    def s4(bands):
        os.rename(bands, bands + ".compact.old")

    def s5(bands):
        shutil.copytree(bands, bands + ".compact.old")

    for tag, mut in [("s1", s1), ("s2", s2), ("s3", s3), ("s4", s4), ("s5", s5)]:
        scratch(tag, mut)


def test_exists_requires_committed_build(spark, tmp_path):
    """A build that crashed mid band-table write (partial directory, no
    _SUCCESS) must read as 'no index' — exists() keys on the commit
    marker, not directory presence."""
    import os

    from openmldb_spark.pipeline.incremental import MinhashIndexStore

    root = str(tmp_path / "mh")
    store = MinhashIndexStore(spark, root, **KW)
    store.build(
        spark.createDataFrame(OLD, "doc_id int, text string"), "doc_id", "text"
    )
    assert store.exists()
    os.remove(os.path.join(store.bands_path, "_SUCCESS"))
    assert not MinhashIndexStore(spark, root, **KW).exists()
