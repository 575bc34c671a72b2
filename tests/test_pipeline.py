"""Pipeline operators: dedup, similarity, text analysis, multimodal plumbing."""

import pytest
from pyspark.sql import functions as F

from openmldb_spark.pipeline import dedup as D
from openmldb_spark.pipeline import similarity as S
from openmldb_spark.pipeline import text as T
from openmldb_spark.pipeline import multimodal as M


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again today"),
        (2, "the quick brown fox jumps over the lazy dog again and again tonight"),  # near-dup of 1
        (3, "completely different text about spark engines and distributed shuffles"),
        (4, "the quick brown fox jumps over the lazy dog again and again today"),  # exact dup of 1
        (5, "der hund läuft und das ist nicht ein problem mit auf sich"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark, docs):
    out = D.exact_dedup(docs, ["text"], id_col="doc_id")
    ids = {r["doc_id"] for r in out.collect()}
    assert 4 not in ids and 1 in ids and len(ids) == 4


def test_exact_dedup_partition_pin_is_size_aware(spark, docs):
    """r14 (guide §2): the AQE-coalescing guard pins the dedupe exchange
    with an input-size-derived partition count — multi-partition always
    (>= 2, never the 1-partition collapse the pin exists to prevent) but
    bounded by the shuffle-partitions knob instead of always equal to it
    (a tiny input must not pay a knob-wide fan-out of near-empty tasks)."""
    out = D.exact_dedup(docs, ["text"], id_col="doc_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"hashpartitioning\(text#\d+, (\d+)\), REPARTITION_BY_NUM", plan)
    assert m, f"expected a pinned REPARTITION_BY_NUM exchange, got:\n{plan}"
    n = int(m.group(1))
    knob = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert 2 <= n <= knob
    # exactly the documented derivation: ceil(estimated bytes / 64 KiB),
    # floored at 2, capped at the knob (the input's own estimate, so the
    # assertion holds whatever the local-relation size heuristic says)
    est = int(str(docs._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))
    assert n == min(knob, max(2, -(-est // (64 << 10))))


def test_minhash_signature_deterministic(spark, docs):
    s1 = D.minhash_signatures(docs, "text", num_hashes=16).collect()
    s2 = D.minhash_signatures(docs, "text", num_hashes=16).collect()
    m1 = {r["doc_id"]: r["minhash"] for r in s1}
    m2 = {r["doc_id"]: r["minhash"] for r in s2}
    assert m1 == m2
    assert m1[1] == m1[4]  # identical text -> identical signature
    assert len(m1[1]) == 16


def test_minhash_lsh_finds_near_dups(spark, docs):
    sigs = D.minhash_signatures(docs, "text", num_hashes=32, shingle_n=3)
    pairs = D.minhash_lsh_pairs(sigs, "doc_id", bands=16).collect()
    found = {(r["a"], r["b"]) for r in pairs}
    assert (1, 4) in found            # exact dup always caught
    assert (1, 2) in found or (2, 4) in found  # near-dup caught
    assert all(p[0] < p[1] for p in found)


def test_minhash_dedup_drops_duplicates(spark, docs):
    out = D.minhash_dedup(docs, "doc_id", "text", num_hashes=32, bands=16,
                          shingle_n=3, threshold=0.9)
    ids = {r["doc_id"] for r in out.collect()}
    assert 1 in ids and 4 not in ids  # min-id representative survives
    assert 3 in ids and 5 in ids      # distinct docs untouched


def test_simhash_near_dups_close(spark, docs):
    out = {r["doc_id"]: r["simhash"] for r in D.simhash(docs, "text").collect()}
    assert out[1] == out[4]
    d_near = bin(out[1] ^ out[2]).count("1")
    d_far = bin(out[1] ^ out[3]).count("1")
    assert d_near < d_far


def test_ngram_jaccard_exact_values(spark, docs):
    cands = spark.createDataFrame([(1, 4), (1, 3)], "a long, b long")
    out = D.ngram_jaccard_pairs(
        docs, "doc_id", "text", shingle_n=3, candidates=cands, threshold=0.0
    ).collect()
    j = {(r["a"], r["b"]): r["jaccard"] for r in out}
    assert j[(1, 4)] == 1.0
    assert j[(1, 3)] < 0.1


def test_brute_force_topk(spark):
    vecs = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0]),
        (3, [0.0, 1.0, 0.0]),
        (4, [0.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, v array<float>")
    out = S.brute_force_topk(
        df, df.where(F.col("vec_id") == 1),
        corpus_id="vec_id", corpus_vec="v", query_id="vec_id", query_vec="v", k=2,
    ).collect()
    assert [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rank"])] == [2, 3]


def test_lsh_topk_recall_on_identical(spark):
    import math
    vecs = [(i, [math.cos(i * 0.1), math.sin(i * 0.1), 0.5]) for i in range(50)]
    vecs.append((100, vecs[0][1]))  # identical to vec 0
    df = spark.createDataFrame(vecs, "vec_id long, v array<float>")
    out = S.lsh_topk(
        df, df.where(F.col("vec_id") == 0),
        corpus_id="vec_id", corpus_vec="v", query_id="vec_id", query_vec="v",
        k=3, planes=6,
    ).collect()
    assert any(r["neighbor_id"] == 100 and r["rank"] == 1 for r in out)


def test_embedding_dedup(spark):
    vecs = [
        (1, [1.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0]),    # duplicate of 1
        (3, [0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, v array<float>")
    out = D.embedding_dedup(df, "vec_id", "v", threshold=0.99, planes=4)
    ids = {r["vec_id"] for r in out.collect()}
    assert ids == {1, 3}


def test_embedding_dedup_matmul_verify_matches_pairwise(spark):
    """r13: the per-bucket Gram-matmul verify must equal the old pairwise
    HOF-cosine verify — including NULL vectors / NULL elements (never drop,
    never dropped) and the zero vector (cosine NaN -> never >= t)."""
    import math

    from openmldb_spark.pipeline.similarity import cosine as hof_cosine

    vecs = [(i, [math.cos(i * 0.37), math.sin(i * 0.37), 0.25 * (i % 4)]) for i in range(40)]
    vecs += [(100, vecs[5][1]), (101, vecs[7][1])]      # exact dups
    vecs += [(102, None), (103, [1.0, None, 0.0]), (104, [0.0, 0.0, 0.0])]
    df = spark.createDataFrame(vecs, "vec_id long, v array<double>")

    out = {r["vec_id"] for r in D.embedding_dedup(df, "vec_id", "v", threshold=0.98, planes=0).collect()}

    # old formulation: all-pairs self-join + interpreted HOF cosine
    a = df.select(F.col("vec_id").alias("a"), F.col("v").alias("va"))
    b = df.select(F.col("vec_id").alias("b"), F.col("v").alias("vb"))
    losers = {
        r["b"]
        for r in a.crossJoin(b)
        .filter(F.col("a") < F.col("b"))
        .filter(hof_cosine(F.col("va"), F.col("vb")) >= 0.98)
        .collect()
    }
    assert out == {i for i, _ in vecs} - losers
    assert {102, 103, 104} <= out


def test_embedding_dedup_mixed_length_bucket_does_not_crash(spark):
    """r14 (ADVICE r13 #4): a bucket holding vectors of DIFFERENT lengths
    previously raised inside np.asarray (inhomogeneous shape) and failed
    the job; the pairwise zip_with cosine just skipped the cross-length
    pair. Same-length pairs must still verify; cross-length pairs never
    match; NaN-element vectors neither drop nor get dropped (the pinned
    missing-element policy — null and NaN are indistinguishable through
    Arrow)."""
    vecs = [
        (1, [1.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0]),          # dup of 1 (same length)
        (3, [1.0, 0.0]),               # shorter: never pairs with 1/2
        (4, [1.0, 0.0]),               # dup of 3 within its length group
        (5, [float("nan"), 1.0, 0.0]),  # NaN element: inert
    ]
    df = spark.createDataFrame(vecs, "vec_id long, v array<double>")
    # planes=0 puts everything in one bucket: the crash shape
    out = {r["vec_id"] for r in
           D.embedding_dedup(df, "vec_id", "v", threshold=0.99, planes=0).collect()}
    assert out == {1, 3, 5}


def test_text_quality_features(spark, docs):
    out = T.quality_features(docs).collect()
    r1 = next(r for r in out if r["doc_id"] == 1)
    assert r1["n_tokens"] == 13
    assert r1["stopword_ratio"] > 0.1
    assert 0.0 <= r1["quality_score"] <= 1.0


def test_lang_id(spark, docs):
    out = {r["doc_id"]: r["g"] for r in docs.select("doc_id", T.lang_id(F.col("text")).alias("g")).collect()}
    assert out[1] == "en"
    assert out[5] == "de"


def test_fingerprint_stable(spark, docs):
    out = docs.select("doc_id", T.fingerprint(F.col("text")).alias("fp")).collect()
    fps = {r["doc_id"]: r["fp"] for r in out}
    assert fps[1] == fps[4]
    assert fps[1] != fps[3]


def test_multimodal_plumbing(spark):
    rows = [("m1", "image", "image/png", bytearray(b"fakepayload1"), None, None, None),
            ("m2", "image", "image/png", bytearray(b""), None, None, None)]
    df = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in M.extract_image_features(df).collect()}
    assert out["m1"]["n_bytes"] == 12
    assert out["m1"]["width"] is not None and len(out["m1"]["feat"]) == 8
    assert out["m2"]["width"] is None  # stub raises -> nulls, row survives


def test_frame_sample_plan(spark):
    rows = [("v1", "video", "video/mp4", None, None, None, 5500)]
    df = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    out = M.frame_sample_plan(df, every_ms=1000).collect()
    assert len(out) == 5
    assert {r["frame_ts_ms"] for r in out} == {0, 1000, 2000, 3000, 4000}


@pytest.mark.slow
def test_lsh_topk_join_matches_broadcast_path(spark):
    import math
    vecs = [(i, [math.cos(i * 0.37), math.sin(i * 0.37), 0.2 * (i % 7)]) for i in range(60)]
    df = spark.createDataFrame(vecs, "vec_id long, v array<float>")
    q = df.where(F.col("vec_id") < 10)
    kw = dict(corpus_id="vec_id", corpus_vec="v", query_id="vec_id",
              query_vec="v", k=3, planes=5, seed=7)
    bcast = S.lsh_topk(df, q, **kw).collect()
    joined = S.lsh_topk_join(df, q, **kw).collect()
    # same planes/seed -> identical candidate sets and (cos desc, id asc)
    # ranking; compare (query, neighbor, rank) triples
    assert sorted((r["query_id"], r["neighbor_id"], r["rank"]) for r in bcast) \
        == sorted((r["query_id"], r["neighbor_id"], r["rank"]) for r in joined)


def test_lsh_topk_join_portable_recall_on_identical(spark):
    import math
    vecs = [(i, [math.cos(i * 0.1), math.sin(i * 0.1), 0.5]) for i in range(50)]
    vecs.append((100, vecs[0][1]))  # identical to vec 0
    df = spark.createDataFrame(vecs, "vec_id long, v array<float>")
    out = S.lsh_topk_join(
        df, df.where(F.col("vec_id") == 0),
        corpus_id="vec_id", corpus_vec="v", query_id="vec_id", query_vec="v",
        k=3, planes=6, portable=True,
    ).collect()
    assert any(r["neighbor_id"] == 100 and r["rank"] == 1 for r in out)


def test_lsh_topk_join_plan_builds_without_driver_actions(spark, monkeypatch):
    # the scale contract: building the joined plan must not trigger any
    # driver-side action (no queries collect, no dim probe when dim given)
    from pyspark.sql import DataFrame

    df = spark.createDataFrame([(1, [1.0, 0.0])], "vec_id long, v array<float>")

    def boom(self, *a, **k):
        raise AssertionError("driver action during plan construction")

    monkeypatch.setattr(DataFrame, "collect", boom)
    monkeypatch.setattr(DataFrame, "first", boom)
    monkeypatch.setattr(DataFrame, "take", boom)
    out = S.lsh_topk_join(
        df, df, corpus_id="vec_id", corpus_vec="v", query_id="vec_id",
        query_vec="v", k=2, planes=4, portable=True, dim=2,
    )
    # schema access analyzes the plan without executing it
    assert set(["query_id", "neighbor_id", "cos", "rank"]) <= set(out.columns)


@pytest.mark.slow
def test_lsh_topk_portable_matches_join_sibling(spark):
    # the r8 portable arm: broadcast-queries lsh_topk(portable=True) is
    # the same md5-plane + JVM-fold computation as
    # lsh_topk_join(portable=True) — identical rows, cosines included
    import math
    vecs = [(i, [math.cos(i * 0.37), math.sin(i * 0.37), 0.2 * (i % 7)]) for i in range(60)]
    df = spark.createDataFrame(vecs, "vec_id long, v array<float>")
    q = df.where(F.col("vec_id") < 10)
    kw = dict(corpus_id="vec_id", corpus_vec="v", query_id="vec_id",
              query_vec="v", k=3, planes=5, seed=7, portable=True)
    bcast = S.lsh_topk(df, q, **kw).collect()
    joined = S.lsh_topk_join(df, q, **kw).collect()
    key = lambda r: (r["query_id"], r["neighbor_id"], r["cos"], r["rank"])
    assert sorted(map(key, bcast)) == sorted(map(key, joined))


def test_lsh_banded_portable_matches_join_sibling(spark):
    # OR-of-bands (r9): the banded portable arms of lsh_topk and
    # lsh_topk_join are the same md5-plane computation — identical rows
    # after the per-pair dedupe, cosines included
    import math
    vecs = [(i, [math.cos(i * 0.37), math.sin(i * 0.37), 0.2 * (i % 7)]) for i in range(60)]
    df = spark.createDataFrame(vecs, "vec_id long, v array<float>")
    q = df.where(F.col("vec_id") < 10)
    kw = dict(corpus_id="vec_id", corpus_vec="v", query_id="vec_id",
              query_vec="v", k=3, planes=5, seed=7, portable=True, bands=3)
    bcast = S.lsh_topk(df, q, **kw).collect()
    joined = S.lsh_topk_join(df, q, **kw).collect()
    key = lambda r: (r["query_id"], r["neighbor_id"], r["cos"], r["rank"])
    assert sorted(map(key, bcast)) == sorted(map(key, joined))
    # a pair never appears more than once per query (band dedupe)
    pairs = [(r["query_id"], r["neighbor_id"]) for r in joined]
    assert len(pairs) == len(set(pairs))


@pytest.mark.slow
def test_lsh_bands_1_is_exactly_the_legacy_single_table(spark):
    # explicit bands=1 must keep the legacy {seed}|{p}|{d} plane
    # derivation bit-identical (the correctness-gate oracles pin that
    # arm), while the OMITTED default is now bands=8 (r9 verdict #7:
    # recall-safe default) — the default's candidate set must be a
    # superset of the single band's (band 0 derives from the same seed)
    import math
    vecs = [(i, [math.cos(i * 0.29), math.sin(i * 0.29), 0.1 * (i % 5)]) for i in range(40)]
    df = spark.createDataFrame(vecs, "vec_id long, v array<float>")
    q = df.where(F.col("vec_id") < 5)
    for portable in (False, True):
        kw = dict(corpus_id="vec_id", corpus_vec="v", query_id="vec_id",
                  query_vec="v", k=3, planes=5, seed=7, portable=portable)
        key = lambda r: (r["query_id"], r["neighbor_id"], r["cos"], r["rank"])
        single = sorted(map(key, S.lsh_topk_join(df, q, bands=1, **kw).collect()))
        again = sorted(map(key, S.lsh_topk_join(df, q, bands=1, **kw).collect()))
        assert single == again  # deterministic legacy arm
        # the omitted default is the banded path: well-formed ranked rows,
        # no duplicate (query, neighbor) pairs after the band dedupe
        default = S.lsh_topk_join(df, q, **kw).collect()
        pairs = [(r["query_id"], r["neighbor_id"]) for r in default]
        assert len(pairs) == len(set(pairs))
        # (the default-path RECALL >= 0.6 pin lives in
        # test_ann_recall_on_real_testdata on the driver's real table)


def test_lsh_topk_portable_plan_builds_without_driver_actions(spark, monkeypatch):
    from pyspark.sql import DataFrame

    df = spark.createDataFrame([(1, [1.0, 0.0])], "vec_id long, v array<float>")

    def boom(self, *a, **k):
        raise AssertionError("driver action during plan construction")

    monkeypatch.setattr(DataFrame, "collect", boom)
    monkeypatch.setattr(DataFrame, "first", boom)
    monkeypatch.setattr(DataFrame, "take", boom)
    out = S.lsh_topk(
        df, df, corpus_id="vec_id", corpus_vec="v", query_id="vec_id",
        query_vec="v", k=2, planes=4, portable=True, dim=2,
    )
    assert set(["query_id", "neighbor_id", "cos", "rank"]) <= set(out.columns)


def test_multimodal_audio_and_resize(spark):
    from openmldb_spark.pipeline import multimodal as M

    rows = [
        ("m1", "audio/wav", b"payload-one"),
        ("m2", "audio/wav", b""),
        ("m3", "image/png", b"imagebytes"),
    ]
    df = spark.createDataFrame(rows, "media_id string, mime string, payload binary")
    audio = {r["media_id"]: r for r in M.extract_audio_features(df).collect()}
    assert audio["m1"]["duration_ms"] is not None and len(audio["m1"]["mfcc"]) == 13
    assert audio["m2"]["duration_ms"] is None  # empty payload -> stub declines
    # deterministic: same payload -> same features
    audio2 = {r["media_id"]: r for r in M.extract_audio_features(df).collect()}
    assert audio["m1"]["mfcc"] == audio2["m1"]["mfcc"]

    resized = {r["media_id"]: r for r in M.resize_images(df, 32, 16).collect()}
    assert resized["m3"]["width"] == 32 and resized["m3"]["height"] == 16
    assert len(resized["m3"]["payload"]) == 32 * 16 // 8
    assert resized["m2"]["payload"] is None


def test_jaccard_dedup_equals_all_pairs_bruteforce(spark):
    """The exactness contract: MinHash-LSH ∪ prefix-filter candidates +
    exact verification == brute-force all-pairs Jaccard dedup, on random
    corpora (prefix filtering guarantees recall, so no probabilistic
    argument is needed)."""
    import itertools
    import random

    rng = random.Random(7)
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    docs = []
    for i in range(40):
        base = [rng.choice(words) for _ in range(rng.randint(3, 12))]
        docs.append((i, " ".join(base)))
        if rng.random() < 0.4:  # near-dup with a small mutation
            mut = list(base)
            mut[rng.randrange(len(mut))] = rng.choice(words)
            docs.append((100 + i, " ".join(mut)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(
        r["doc_id"]
        for r in D.jaccard_dedup(
            df, "doc_id", "text", shingle_n=3, threshold=0.5, bands=4, num_hashes=16
        ).select("doc_id").collect()
    )

    def grams(t, n=3):
        toks = t.lower().split()
        if len(toks) >= n:
            return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
        return {" ".join(toks)}

    sets = {i: grams(t) for i, t in docs}
    losers = set()
    for a, b in itertools.combinations(sorted(sets), 2):
        j = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
        if j >= 0.5:
            losers.add(b)
    assert got == sorted(set(sets) - losers)


def test_jaccard_dedup_banding_path_equals_bruteforce(spark):
    """exact=False (MinHash-banding candidates only) with 1-row bands —
    every pair sharing any signature slot co-buckets, so on this small
    corpus the probabilistic path reproduces the exact answer too
    (deterministic: fixed hash seeds)."""
    import itertools
    import random

    rng = random.Random(11)
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    docs = []
    for i in range(30):
        base = [rng.choice(words) for _ in range(rng.randint(4, 10))]
        docs.append((i, " ".join(base)))
        if rng.random() < 0.5:
            mut = list(base)
            mut[rng.randrange(len(mut))] = rng.choice(words)
            docs.append((100 + i, " ".join(mut)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(
        r["doc_id"]
        for r in D.jaccard_dedup(
            df, "doc_id", "text", shingle_n=3, threshold=0.5,
            num_hashes=16, bands=16, exact=False,
        ).select("doc_id").collect()
    )

    def grams(t, n=3):
        toks = t.lower().split()
        if len(toks) >= n:
            return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
        return {" ".join(toks)}

    sets = {i: grams(t) for i, t in docs}
    losers = set()
    for a, b in itertools.combinations(sorted(sets), 2):
        j = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
        if j >= 0.5:
            losers.add(b)
    assert got == sorted(set(sets) - losers)


def test_jaccard_dedup_hot_token_df_cap(spark):
    """The boilerplate guard (DIVERGENCES #14): prefix tokens whose document
    frequency exceeds max_token_df are dropped from the index, bounding the
    self-join fan-out. Pure-boilerplate duplicates (whose only shared
    shingles are corpus-wide) produce NO candidates under a tiny cap —
    nothing is dropped; with the cap lifted the same corpus collapses."""
    docs = [(i, "lorem ipsum dolor sit amet") for i in range(10)]
    # plus a rare near-dup pair that shares a low-df shingle
    docs += [(100, "rare unique shingle text one"), (101, "rare unique shingle text two")]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    capped = sorted(
        r["doc_id"]
        for r in D.jaccard_dedup(
            df, "doc_id", "text", shingle_n=3, threshold=0.5, max_token_df=5
        ).select("doc_id").collect()
    )
    # boilerplate block survives whole (its shingles have df=10 > 5);
    # the rare pair shares df=2 shingles -> still deduped
    assert capped == list(range(10)) + [100]

    uncapped = sorted(
        r["doc_id"]
        for r in D.jaccard_dedup(
            df, "doc_id", "text", shingle_n=3, threshold=0.5
        ).select("doc_id").collect()
    )
    assert uncapped == [0, 100]


def test_ivf_topk_full_probe_equals_bruteforce(spark):
    """nprobe == n_centroids scores every bucket -> exact brute force."""
    import random

    from openmldb_spark.pipeline import similarity as S

    rng = random.Random(3)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(120)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.where(F.col("vec_id") < 5)
    kw = dict(corpus_id="vec_id", corpus_vec="embedding",
              query_id="vec_id", query_vec="embedding", k=4)
    exact = {(r["query_id"], r["rank"]): r["neighbor_id"]
             for r in S.brute_force_topk(df, q, **kw).collect()}
    ivf = {(r["query_id"], r["rank"]): r["neighbor_id"]
           for r in S.ivf_topk(df, q, n_centroids=6, nprobe=6, **kw).collect()}
    assert ivf == exact


def test_ivf_topk_clustered_recall(spark):
    """On well-separated clusters a single-probe IVF search still finds the
    exact in-cluster neighbors (the point of the bucket structure)."""
    import random

    from openmldb_spark.pipeline import similarity as S

    rng = random.Random(9)
    rows = []
    for c in range(4):                       # 4 orthogonal-ish clusters
        base = [0.0] * 8
        base[c * 2] = 1.0
        for i in range(25):
            rows.append(
                (c * 100 + i,
                 [b + rng.uniform(-0.05, 0.05) for b in base])
            )
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.where(F.col("vec_id").isin(0, 100, 200, 300))
    kw = dict(corpus_id="vec_id", corpus_vec="embedding",
              query_id="vec_id", query_vec="embedding", k=5)
    exact = {(r["query_id"], r["rank"]): r["neighbor_id"]
             for r in S.brute_force_topk(df, q, **kw).collect()}
    ivf = {(r["query_id"], r["rank"]): r["neighbor_id"]
           for r in S.ivf_topk(df, q, n_centroids=12, nprobe=3, **kw).collect()}
    # every exact neighbor is in the same cluster as its query, and a
    # 3-probe search over 12 hash-sampled centroids must recover them all
    hits = sum(1 for key, nb in exact.items() if ivf.get(key) == nb)
    assert hits / len(exact) >= 0.9, f"recall {hits}/{len(exact)}"


def test_ivf_topk_join_full_probe_equals_bruteforce(spark):
    """Join-variant IVF with nprobe == n_centroids probes every bucket —
    exact brute force, with zero driver-side collects in the plan."""
    import random

    from openmldb_spark.pipeline import similarity as S

    rng = random.Random(5)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(100)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.where(F.col("vec_id") < 5)
    kw = dict(corpus_id="vec_id", corpus_vec="embedding",
              query_id="vec_id", query_vec="embedding", k=4)
    exact = {(r["query_id"], r["rank"]): r["neighbor_id"]
             for r in S.brute_force_topk(df, q, **kw).collect()}
    ivf = {(r["query_id"], r["rank"]): r["neighbor_id"]
           for r in S.ivf_topk_join(df, q, n_centroids=5, nprobe=5, **kw).collect()}
    assert ivf == exact


def _tiny_png(pixels, width, height):
    """Synthesize a valid RGB PNG in pure Python (zlib+struct — no PIL),
    so the real-decoder path stops being dead code the moment PIL appears.
    ``pixels`` is a flat list of (r, g, b) tuples, row-major."""
    import struct
    import zlib

    def chunk(tag, data):
        raw = tag + data
        return struct.pack(">I", len(data)) + raw + struct.pack(
            ">I", zlib.crc32(raw) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raster = b""
    for y in range(height):
        raster += b"\x00"  # filter: none
        for x in range(width):
            raster += bytes(pixels[y * width + x])
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raster))
        + chunk(b"IEND", b"")
    )


def test_image_decode_contract_real_png(spark):
    """A real 2x1 PNG through extract_image_features: since r8 the PNG
    decoder is REAL in-sandbox (stdlib zlib + numpy unfilter), so the
    decoded dims and pixel stats are exact regardless of PIL."""
    png = _tiny_png([(255, 0, 0), (0, 0, 255)], width=2, height=1)
    rows = [("p1", "image", "image/png", bytearray(png), None, None, None)]
    df = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    (out,) = M.extract_image_features(df).collect()
    assert out["n_bytes"] == len(png)
    assert (out["width"], out["height"]) == (2, 1)
    assert len(out["feat"]) == 8
    # red+blue 2x1: grayscale mean strictly inside (0, 1), and the left
    # quadrant (red, luma .299) differs from the right (blue, luma .114)
    assert 0.0 < out["feat"][4] < 1.0
    assert abs(out["feat"][0] - 0.299) < 0.01
    assert abs(out["feat"][1] - 0.114) < 0.01


def test_image_resize_contract_real_png(spark):
    png = _tiny_png([(10, 20, 30)], width=1, height=1)
    rows = [("p1", "image", "image/png", bytearray(png), None, None, None)]
    df = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    (out,) = M.resize_images(df, 4, 4).collect()
    assert out["payload"] is not None
    assert (out["width"], out["height"]) == (4, 4)
    if M._PILImage is not None:  # real path re-encodes as PNG
        assert bytes(out["payload"][:8]) == b"\x89PNG\r\n\x1a\n"


def test_topk_no_exchange_when_source_parallel(spark):
    """The ANN scoring path must not shuffle the vector payload when the
    source scan already yields enough partitions (r6: conditional
    repartition in similarity._spread — at 100 TB that Exchange would be
    the plan's only non-scan cost)."""
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # a source that is ALREADY parallel without any Exchange in its plan
    df = spark.range(64, numPartitions=n_part).select(
        F.col("id").alias("vec_id"),
        F.array(
            F.col("id").cast("float"), F.lit(1.0).cast("float"),
            F.lit(0.0).cast("float"),
        ).alias("v"),
    )
    assert df.rdd.getNumPartitions() == n_part
    out = S.brute_force_topk(
        df, df.where(F.col("vec_id") == 1),
        corpus_id="vec_id", corpus_vec="v", query_id="vec_id", query_vec="v", k=2,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the only Exchange is the rank window's hash partitioning of the tiny
    # scored rows — everything below the mapInPandas scoring is shuffle-free
    scoring_side = plan.split("MapInPandas")[-1]
    assert "Exchange" not in scoring_side, scoring_side


def test_audio_wav_header_contract(spark):
    """The audio decode contract is REAL for PCM WAV (stdlib wave): a
    synthesized 44.1 kHz mono WAV of exactly 441 frames must report
    10 ms duration through the full Spark path — mirroring the PNG
    dimension contract on the image side (r5 verdict item 10)."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(44100)
        w.writeframes(struct.pack("<441h", *([1000] * 441)))
    payload = buf.getvalue()

    df = spark.createDataFrame(
        [("a1", "audio/wav", bytearray(payload)),
         ("a2", "application/octet-stream", bytearray(b"not-a-wav"))],
        "media_id string, mime string, payload binary",
    )
    out = {r["media_id"]: r for r in M.extract_audio_features(df).collect()}
    assert out["a1"]["duration_ms"] == 10  # 441 / 44100 s
    assert len(out["a1"]["mfcc"]) == 13
    # non-WAV payloads keep the deterministic stub (>= 1000 ms floor)
    assert out["a2"]["duration_ms"] >= 1000


def _tiny_bmp(pixel_rows, bpp=24, top_down=False):
    """Build an uncompressed BMP: pixel_rows in display (top-first) order,
    each pixel an (r, g, b) tuple."""
    import struct

    height = len(pixel_rows)
    width = len(pixel_rows[0])
    nch = bpp // 8
    stride = (bpp * width + 31) // 32 * 4
    raster = b""
    file_rows = pixel_rows if top_down else pixel_rows[::-1]
    for row in file_rows:
        line = b""
        for (r, g, b) in row:
            line += bytes([b, g, r] + ([255] if nch == 4 else []))
        raster += line + b"\x00" * (stride - len(line))
    h = -height if top_down else height
    info = struct.pack("<IiiHHIIiiII", 40, width, h, 1, bpp, 0,
                       len(raster), 2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(raster), 0, 0, 54)
    return header + info + raster


def test_image_decode_contract_real_bmp(spark):
    """BMP decode is REAL in-sandbox (pure numpy, no image libs): exact
    dims and exact quadrant grayscale values through the full Spark path —
    the r6 verdict's stretch item (one non-stub image decoder)."""
    W, K = (255, 255, 255), (0, 0, 0)
    bmp = _tiny_bmp([[W, K], [K, W]])  # checkerboard: TL/BR white
    bad = _tiny_bmp([[W]])[:20]  # truncated header
    rows = [
        ("b1", "image", "image/bmp", bytearray(bmp), None, None, None),
        ("b2", "image", "image/bmp", bytearray(bad), None, None, None),
    ]
    df = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in M.extract_image_features(df).collect()}
    ok = out["b1"]
    assert (ok["width"], ok["height"]) == (2, 2)
    # quadrants (TL, TR, BL, BR) then mean/max/min/range — exact values
    assert [round(v, 6) for v in ok["feat"]] == [1.0, 0.0, 0.0, 1.0,
                                                 0.5, 1.0, 0.0, 1.0]
    # malformed BMP nulls the decode columns like any real codec failure
    assert out["b2"]["width"] is None and out["b2"]["feat"] is None
    assert out["b2"]["n_bytes"] == 20  # metadata still real


def test_bmp_decoder_variants():
    """32-bpp, top-down, and odd-width BMPs decode exactly (driver-side:
    the decoder is plain Python/numpy)."""
    A, B = (255, 0, 0), (0, 255, 0)  # red, green
    w, h, feat = M._decode_bmp(_tiny_bmp([[A, B, A]], bpp=32, top_down=True))
    assert (w, h) == (3, 1)
    exp_r, exp_g = 0.299, 0.587
    # quadrants of a 1x3: left col vs cols 2-3 (both halves identical rows)
    assert abs(feat[0] - exp_r) < 1e-6
    assert abs(feat[1] - (exp_g + exp_r) / 2) < 1e-6
    import pytest as _pytest

    with _pytest.raises(OSError):
        M._decode_bmp(_tiny_bmp([[A]], bpp=24)[:40])  # truncated raster


def _png_chunks(ihdr_fields, idat_raster, palette=None):
    """Assemble a PNG from raw parts (driver-side test helper)."""
    import struct
    import zlib

    def chunk(tag, data):
        raw = tag + data
        return struct.pack(">I", len(data)) + raw + struct.pack(
            ">I", zlib.crc32(raw) & 0xFFFFFFFF
        )

    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", struct.pack(">IIBBBBB", *ihdr_fields))
    if palette is not None:
        out += chunk(b"PLTE", palette)
    return out + chunk(b"IDAT", zlib.compress(idat_raster)) + chunk(b"IEND", b"")


def test_png_decoder_filters_exact():
    """All five PNG scanline filters unfilter to the same pixels: a 3x4
    gray ramp encoded per-row with None/Sub/Up/Average/Paeth must decode
    identically (driver-side: the decoder is plain stdlib+numpy)."""
    import numpy as np

    ref = np.arange(12, dtype=np.uint8).reshape(4, 3) * 20  # gray ramp

    def encode(filters):
        raster = b""
        prev = np.zeros(3, dtype=np.int32)
        for y, ft in enumerate(filters):
            line = ref[y].astype(np.int32)
            if ft == 0:
                enc = line
            elif ft == 1:  # Sub
                enc = line - np.concatenate(([0], line[:-1]))
            elif ft == 2:  # Up
                enc = line - prev
            elif ft == 3:  # Average
                left = np.concatenate(([0], line[:-1]))
                enc = line - ((left + prev) >> 1)
            else:  # Paeth
                enc = np.empty(3, dtype=np.int32)
                for x in range(3):
                    a = int(line[x - 1]) if x else 0
                    b = int(prev[x])
                    c = int(prev[x - 1]) if x else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    enc[x] = line[x] - pr
            raster += bytes([ft]) + bytes((enc & 0xFF).astype(np.uint8))
            prev = line
        return raster

    base = None
    for filters in ([0, 0, 0, 0], [0, 1, 2, 3], [4, 4, 4, 4], [1, 4, 3, 2]):
        png = _png_chunks((3, 4, 8, 0, 0, 0, 0), encode(filters))
        w, h, feat = M._decode_png(png)
        assert (w, h) == (3, 4), filters
        if base is None:
            base = feat
        else:
            assert feat == base, filters


def test_png_decoder_color_types():
    """RGB, RGBA, gray+alpha, and palette PNGs decode with the same luma
    as the BMP path; unsupported shapes raise OSError."""
    import pytest as _pytest

    # 1x1 pure green in four color types -> luma 0.587 everywhere
    cases = [
        ((1, 1, 8, 2, 0, 0, 0), b"\x00\x00\xff\x00", None),          # RGB
        ((1, 1, 8, 6, 0, 0, 0), b"\x00\x00\xff\x00\xff", None),      # RGBA
        ((1, 1, 8, 3, 0, 0, 0), b"\x00\x01", b"\xff\x00\x00\x00\xff\x00"),  # palette idx1=green
    ]
    for ihdr, raster, plte in cases:
        w, h, feat = M._decode_png(_png_chunks(ihdr, raster, plte))
        assert (w, h) == (1, 1)
        assert abs(feat[4] - 0.587) < 1e-6, ihdr
    # gray+alpha: gray 128 -> 128/255
    w, h, feat = M._decode_png(_png_chunks((1, 1, 8, 4, 0, 0, 0), b"\x00\x80\xff"))
    assert abs(feat[4] - 128 / 255) < 1e-6
    # unsupported: 16-bit depth, interlaced, bad color type, truncated
    with _pytest.raises(OSError):
        M._decode_png(_png_chunks((1, 1, 16, 0, 0, 0, 0), b"\x00\x00\x80"))
    with _pytest.raises(OSError):
        M._decode_png(_png_chunks((1, 1, 8, 0, 0, 0, 1), b"\x00\x80"))
    with _pytest.raises(OSError):
        M._decode_png(_png_chunks((1, 1, 8, 5, 0, 0, 0), b"\x00\x80"))
    with _pytest.raises(OSError):
        M._decode_png(_png_chunks((2, 2, 8, 2, 0, 0, 0), b"\x00\x01\x02"))


def test_jaccard_dedup_lazy_materialize_same_result(spark, docs):
    # the 100 TB opt-out: eager_materialize=False must produce the same
    # survivors (the eager count is a bench-stability action, not logic)
    a = {r.doc_id for r in D.jaccard_dedup(docs, "doc_id", "text").collect()}
    b = {r.doc_id for r in D.jaccard_dedup(
        docs, "doc_id", "text", eager_materialize=False
    ).collect()}
    assert a == b


# ---------------------------------------------------------------------------
# JPEG decoder (r8): hermetic minimal encoder (custom Huffman tables are
# legal — DHT carries them) + analytic single-block check
# ---------------------------------------------------------------------------


def _jpeg_encode_gray(img, q, restart_interval=0):
    """Encode a grayscale uint8 image as a baseline JFIF JPEG (test-only
    encoder: canonical equal-length Huffman tables built from the symbols
    actually emitted). ``restart_interval`` > 0 emits a DRI segment and
    RSTn markers every that-many MCUs (DC predictor resets per segment,
    per-segment byte padding with 1 bits — so padding can land on 0xFF
    and be stuffed, the ADVICE-r8 align_restart case)."""
    import struct

    import numpy as np

    h, w = img.shape
    ZZ = [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
          12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
          35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
          58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63]
    k = np.arange(8)
    M = np.cos((2 * k[:, None] + 1) * k[None, :] * np.pi / 16)
    M[:, 0] *= 1 / np.sqrt(2)
    M *= 0.5
    # pad to block multiple by edge replication
    H, W = -(-h // 8) * 8, -(-w // 8) * 8
    pad = np.pad(img.astype(np.float64), ((0, H - h), (0, W - w)), mode="edge")

    def cat(v):
        a, t = abs(int(v)), 0
        while a:
            a >>= 1
            t += 1
        return t

    # pass 1: quantize blocks, gather symbols + the bit payloads
    blocks = []
    pred = 0
    mcu_idx = 0
    dc_syms, ac_syms = set(), set()
    for by in range(0, H, 8):
        for bx in range(0, W, 8):
            if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                pred = 0  # DC predictor resets at every restart
            mcu_idx += 1
            f = pad[by:by + 8, bx:bx + 8] - 128.0
            F = M.T @ f @ M  # forward DCT (M orthogonal-ish: f = M F M^T)
            zz = np.round(F.reshape(64)[ZZ] / q[np.arange(64)]).astype(int)
            diff = int(zz[0]) - pred
            pred = int(zz[0])
            t = cat(diff)
            dc_syms.add(t)
            parts = [("dc", t, diff)]
            run = 0
            for i in range(1, 64):
                v = int(zz[i])
                if v == 0:
                    run += 1
                    continue
                while run >= 16:
                    ac_syms.add(0xF0)
                    parts.append(("ac", 0xF0, 0))
                    run -= 16
                s = cat(v)
                sym = (run << 4) | s
                ac_syms.add(sym)
                parts.append(("ac", sym, v))
                run = 0
            if run:
                ac_syms.add(0x00)
                parts.append(("ac", 0x00, 0))
            blocks.append(parts)

    def make_table(syms):
        syms = sorted(syms)
        L = 1
        while (1 << L) <= len(syms):  # strict: keep the all-ones code free
            L += 1
        bits = [0] * 16
        bits[L - 1] = len(syms)
        codes = {s: (L, i) for i, s in enumerate(syms)}
        return bits, syms, codes

    dc_bits, dc_vals, dc_codes = make_table(dc_syms)
    ac_bits, ac_vals, ac_codes = make_table(ac_syms)

    def flush(bits_list):
        while len(bits_list) % 8:
            bits_list.append(1)  # pad with 1s per spec
        seg_raw = bytearray()
        for i in range(0, len(bits_list), 8):
            b = 0
            for bit in bits_list[i:i + 8]:
                b = (b << 1) | bit
            seg_raw.append(b)
            if b == 0xFF:
                seg_raw.append(0x00)
        return seg_raw

    ri = restart_interval or len(blocks)
    raw = bytearray()
    for g in range(0, len(blocks), ri):
        if g:
            raw += bytes([0xFF, 0xD0 + ((g // ri - 1) % 8)])
        out_bits = []

        def emit(ln, code):
            for i in range(ln - 1, -1, -1):
                out_bits.append((code >> i) & 1)

        for parts in blocks[g:g + ri]:
            for kind, sym, v in parts:
                ln, code = (dc_codes if kind == "dc" else ac_codes)[sym]
                emit(ln, code)
                if kind == "dc":
                    t = cat(v)
                    if t:
                        emit(t, v if v > 0 else v + (1 << t) - 1)
                elif sym not in (0x00, 0xF0):
                    s = sym & 0xF
                    emit(s, v if v > 0 else v + (1 << s) - 1)
        raw += flush(out_bits)

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    dqt = seg(0xDB, bytes([0x00]) + bytes(int(x) for x in q))
    sof = seg(0xC0, bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0]))
    dht = seg(0xC4, bytes([0x00] + dc_bits) + bytes(dc_vals)) + seg(
        0xC4, bytes([0x10] + ac_bits) + bytes(ac_vals)
    )
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    dri = (
        seg(0xDD, struct.pack(">H", restart_interval))
        if restart_interval
        else b""
    )
    return b"\xff\xd8" + dqt + sof + dht + dri + sos + bytes(raw) + b"\xff\xd9"


def test_jpeg_decoder_roundtrip_gray():
    import numpy as np

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (16, 24), dtype=np.uint8)
    q = np.ones(64, dtype=np.int32)  # near-lossless
    payload = _jpeg_encode_gray(img, q)
    w, h, feat = M._decode_jpeg(payload)
    assert (w, h) == (24, 16)
    # reconstruct the expected features from the ORIGINAL pixels; with an
    # all-ones quant table the DCT roundtrip is accurate to ~1/255
    exp = M._gray_features(img.astype(np.float64) / 255.0)
    for a, b in zip(feat, exp):
        assert abs(a - b) < 0.01, (feat, exp)


def test_jpeg_decoder_dri_restart_roundtrip():
    """ADVICE r8: the DRI/restart path had no coverage (the test encoder
    never emitted DRI). Round-trip restart-interval payloads, including
    ones whose pre-RST padding byte is 0xFF (stuffed as FF 00 — the seed
    search guarantees at least one payload contains `FF 00 FF D<n>`);
    align_restart now skips stuffed pairs while scanning for the marker.
    (_fill's lookahead usually consumes the stuffed pad before the scan
    runs, so the skip is defensive — the load-bearing assertion here is
    that DRI streams decode to the right pixels at all.)"""
    import re

    import numpy as np

    q = np.ones(64, dtype=np.int32)
    hit_stuffed_pad = False
    tested = 0
    for seed in range(40):
        rng = np.random.RandomState(seed)
        img = rng.randint(0, 256, (16, 32), dtype=np.uint8)
        payload = _jpeg_encode_gray(img, q, restart_interval=2)
        body = payload[2:-2]  # trim SOI/EOI so EOI's FF D9 can't match
        stuffed = re.search(b"\xff\x00\xff[\xd0-\xd7]", body) is not None
        if not stuffed and hit_stuffed_pad:
            continue  # already covered a plain payload implicitly
        hit_stuffed_pad |= stuffed
        tested += 1
        w, h, feat = M._decode_jpeg(payload)
        assert (w, h) == (32, 16), seed
        exp = M._gray_features(img.astype(np.float64) / 255.0)
        for a, b in zip(feat, exp):
            assert abs(a - b) < 0.01, (seed, feat, exp)
    assert hit_stuffed_pad, "no payload exercised the stuffed-FF pad case"
    assert tested >= 2


def test_jpeg_decoder_dc_only_analytic():
    # a single 8x8 block with only the DC coefficient set decodes to the
    # uniform value 128 + dc*q/8 (M has C(0)/2 entries in column 0)
    import numpy as np

    img = np.full((8, 8), 180, dtype=np.uint8)
    q = np.full(64, 16, dtype=np.int32)
    payload = _jpeg_encode_gray(img, q)
    w, h, feat = M._decode_jpeg(payload)
    assert (w, h) == (8, 8)
    # dc = round((180-128)*8/16) = 26 -> decoded = 128 + 26*16/8 = 180
    assert all(abs(v - 180 / 255) < 1e-9 for v in feat[:5])
    assert feat[7] == 0.0  # uniform image: zero range


def test_jpeg_decoder_error_contract(spark):
    # progressive marker (SOF2) raises; the Spark path nulls the columns
    bad = b"\xff\xd8" + b"\xff\xc2" + b"\x00\x08" + b"\x08\x00\x08\x00\x08\x01" + b"\xff\xd9"
    import pytest as _pytest

    with _pytest.raises(OSError):
        M._decode_jpeg(bad)
    rows = [("j1", "image", "image/jpeg", bytearray(bad), None, None, None)]
    df = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    (out,) = M.extract_image_features(df).collect()
    assert out["width"] is None and out["feat"] is None
    assert out["n_bytes"] == len(bad)


def test_resize_real_path_roundtrip(spark):
    # BMP in -> real nearest-neighbor resample -> PNG out whose pixels
    # decode back exactly (2x2 checkerboard upsampled to 4x4 blocks)
    import numpy as np

    W, K = (255, 255, 255), (0, 0, 0)
    bmp = _tiny_bmp([[W, K], [K, W]])
    rows = [("r1", "image", "image/bmp", bytearray(bmp), None, None, None)]
    df = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    (out,) = M.resize_images(df, 4, 4).collect()
    assert bytes(out["payload"][:8]) == b"\x89PNG\r\n\x1a\n"
    rgb = M._png_rgb(bytes(out["payload"]))
    assert rgb.shape == (4, 4, 3)
    # each source pixel becomes a 2x2 block
    exp = np.array([[1, 1, 0, 0], [1, 1, 0, 0], [0, 0, 1, 1], [0, 0, 1, 1]]) * 255
    assert (rgb[:, :, 0] == exp).all()
    # JPEG input also resizes for real (replicated-luma RGB)
    img = np.full((8, 8), 200, dtype=np.uint8)
    q = np.ones(64, dtype=np.int32)
    jpg = _jpeg_encode_gray(img, q)
    rows = [("r2", "image", "image/jpeg", bytearray(jpg), None, None, None)]
    (out2,) = M.resize_images(
        spark.createDataFrame(rows, M.MEDIA_SCHEMA), 2, 2
    ).collect()
    rgb2 = M._png_rgb(bytes(out2["payload"]))
    assert rgb2.shape == (2, 2, 3)
    assert abs(int(rgb2[0, 0, 0]) - 200) <= 2


def test_kmeans_centroids_separate_clusters(spark):
    # three tight clusters around orthogonal axes: trained centroids land
    # on the axes (cosine spherical k-means), and feeding them to
    # ivf_topk with nprobe=1 still finds each point's in-cluster
    # neighbors — tighter buckets than hash-sampled centroids guarantee
    import numpy as np

    rng = np.random.RandomState(5)
    rows = []
    axes = np.eye(3)
    for i in range(90):
        base = axes[i % 3]
        v = base + rng.randn(3) * 0.05
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, v array<float>")
    C = S.kmeans_centroids(df, vec_col="v", id_col="vec_id", k=3, iters=4)
    assert C.shape == (3, 3)
    # every trained centroid is ~an axis: max coordinate > 0.99 after
    # normalization (clusters are tight)
    assert (np.abs(C).max(axis=1) > 0.99).all()
    # and the three centroids claim three DIFFERENT axes
    assert sorted(np.abs(C).argmax(axis=1)) == [0, 1, 2]
    out = S.ivf_topk(
        df, df.where(F.col("vec_id") < 3),
        corpus_id="vec_id", corpus_vec="v", query_id="vec_id", query_vec="v",
        k=5, nprobe=1, centroids=C,
    ).collect()
    # each query's neighbors all come from its own cluster (same mod 3)
    for r in out:
        assert r["neighbor_id"] % 3 == r["query_id"] % 3


def test_kmeans_centroids_dim_robust_reduce(spark):
    """r8 verdict #2: the per-iteration final reduce must stay ONE sum
    aggregate regardless of vector dim (posexplode over (cid, pos)), not
    dim aggregate expressions — at production dims (768-1536) the latter
    bloats whole-stage codegen past hugeMethodLimit into interpreted
    fallback. Pin: a dim=512 training run converges to the planted axes
    (correct sums AND counts through the combined array reduce)."""
    import numpy as np

    rng = np.random.RandomState(11)
    dim, k = 512, 4
    rows = []
    for i in range(60):
        v = np.zeros(dim)
        v[i % k] = 1.0
        v += rng.randn(dim) * 0.01
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, v array<float>")
    C = S.kmeans_centroids(df, vec_col="v", id_col="vec_id", k=k, iters=3)
    assert C.shape == (k, dim)
    assert np.allclose(np.linalg.norm(C, axis=1), 1.0)
    # each centroid locks onto one of the four planted axes, all distinct
    assert (np.abs(C).max(axis=1) > 0.95).all()
    assert sorted(np.abs(C).argmax(axis=1)) == [0, 1, 2, 3]


def test_ivf_topk_join_with_trained_centroids(spark):
    import numpy as np

    rng = np.random.RandomState(9)
    rows = []
    axes = np.eye(4)
    for i in range(80):
        v = axes[i % 4] + rng.randn(4) * 0.05
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, v array<float>")
    C = S.kmeans_centroids(df, vec_col="v", id_col="vec_id", k=4, iters=3)
    out = S.ivf_topk_join(
        df, df.where(F.col("vec_id") < 4),
        corpus_id="vec_id", corpus_vec="v", query_id="vec_id", query_vec="v",
        k=5, nprobe=1, centroids=C,
    ).collect()
    assert out  # buckets are populated
    for r in out:
        assert r["neighbor_id"] % 4 == r["query_id"] % 4


@pytest.mark.slow
def test_ann_recall_on_real_testdata(spark):
    """Recall pins on the driver's embeddings table (sf0.001): LSH and
    IVF retrieval vs exact brute force — a bucketing regression (plane
    derivation, centroid assignment, candidate generation) shows up as a
    recall drop here before it reaches a bench round."""
    import os

    import pytest as _pytest

    path = "/root/testdata/sf0.001/embeddings.parquet"
    if not os.path.exists(path):
        _pytest.skip("driver testdata not present")
    emb = spark.read.parquet(path)
    q = emb.where(F.col("vec_id") < 10)
    kw = dict(corpus_id="vec_id", corpus_vec="embedding",
              query_id="vec_id", query_vec="embedding", k=5)
    exact = {(r["query_id"], r["neighbor_id"])
             for r in S.brute_force_topk(emb, q, **kw).collect()}

    # DEFAULT path (bands omitted -> 8 since r10): the recall-safe default
    lsh = {(r["query_id"], r["neighbor_id"])
           for r in S.lsh_topk(emb, q, planes=4, seed=42, **kw).collect()}
    lsh1 = {(r["query_id"], r["neighbor_id"])
            for r in S.lsh_topk(emb, q, planes=4, seed=42, bands=1,
                                **kw).collect()}
    ivf = {(r["query_id"], r["neighbor_id"])
           for r in S.ivf_topk(emb, q, n_centroids=8, nprobe=4, seed=42,
                               **kw).collect()}
    C = S.kmeans_centroids(emb, vec_col="embedding", id_col="vec_id",
                           k=8, iters=3)
    ivf_t = {(r["query_id"], r["neighbor_id"])
             for r in S.ivf_topk(emb, q, nprobe=4, centroids=C,
                                 **kw).collect()}
    n = len(exact)
    assert n == 50
    # pins are regression tripwires calibrated to MEASURED values on this
    # data, not quality SLAs. The testdata embeddings are ISOTROPIC
    # (no cluster structure), the worst case for hyperplane LSH — top-5
    # neighbors of a random point rarely share all 4 sign bits (measured
    # 0.14 for the explicit single-band arm). The DEFAULT path is the
    # r10 recall-safe bands=8 (measured 0.62; r9 verdict #7 — an unwarned
    # user must not get the 0.14 worst case). IVF with nprobe/n_centroids
    # = 4/8 scans ~half the corpus: measured 0.70 sampled / 0.74
    # k-means-trained.
    assert len(lsh & exact) / n >= 0.6, len(lsh & exact) / n
    assert len(lsh1 & exact) / n >= 0.05, len(lsh1 & exact) / n
    assert len(ivf & exact) / n >= 0.5, len(ivf & exact) / n
    assert len(ivf_t & exact) / n >= 0.5, len(ivf_t & exact) / n


@pytest.mark.slow
def test_lsh_band_amplified_recall_on_real_testdata(spark):
    """OR-of-bands amplification (r8 verdict item #2) on the driver's real
    (isotropic) embeddings: planes=4, bands=8 measures 0.62 recall@5 for
    BOTH serving shapes (vs 0.14 single-table) — deterministic given the
    fixed seed and data, pinned at the measured value. bands=12 measures
    0.78, bands=16 0.88: the documented dial. Candidate cost scales ~L×;
    each band's 2^4 buckets scan ~1/16 of the corpus, so bands=8 scores
    ~(1-(1-1/16)^8)≈40% of the corpus — the honest trade sign-bit LSH
    demands on isotropic data (IVF stays the cheaper path there)."""
    import os

    import pytest as _pytest

    path = "/root/testdata/sf0.001/embeddings.parquet"
    if not os.path.exists(path):
        _pytest.skip("driver testdata not present")
    emb = spark.read.parquet(path)
    q = emb.where(F.col("vec_id") < 10)
    kw = dict(corpus_id="vec_id", corpus_vec="embedding",
              query_id="vec_id", query_vec="embedding", k=5)
    exact = {(r["query_id"], r["neighbor_id"])
             for r in S.brute_force_topk(emb, q, **kw).collect()}
    n = len(exact)
    lsh = {(r["query_id"], r["neighbor_id"])
           for r in S.lsh_topk(emb, q, planes=4, bands=8, seed=42,
                               **kw).collect()}
    lshj = {(r["query_id"], r["neighbor_id"])
            for r in S.lsh_topk_join(emb, q, planes=4, bands=8, seed=42,
                                     **kw).collect()}
    assert len(lsh & exact) / n >= 0.6, len(lsh & exact) / n
    assert len(lshj & exact) / n >= 0.6, len(lshj & exact) / n


def test_native_decoders_contract_on_malformed_payloads(spark):
    """Review finding (r8): parser-level IndexError/struct.error/numpy
    ValueError from the native decoders must surface as OSError so one
    corrupt image nulls one row instead of failing the Spark task."""
    import struct
    import zlib

    import pytest as _pytest

    def png(ihdr, raster, plte=None):
        return _png_chunks(ihdr, raster, plte)

    bads = [
        # palette index past the PLTE table -> IndexError in numpy
        png((1, 1, 8, 3, 0, 0, 0), b"\x00\x07", b"\xff\x00\x00"),
        # truncated IHDR -> struct.error
        b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR" + b"\x00\x00",
        # JPEG with a DQT shorter than 64 entries -> numpy ValueError
        b"\xff\xd8" + b"\xff\xdb" + struct.pack(">H", 10) + b"\x00" * 8 + b"\xff\xd9",
        # JPEG with a short SOF segment -> struct.error
        b"\xff\xd8" + b"\xff\xc0" + struct.pack(">H", 4) + b"\x08\x00" + b"\xff\xd9",
    ]
    for b in bads:
        with _pytest.raises(OSError):
            M._decode_image(b)
        with _pytest.raises(OSError):
            M._decode_rgb(b)
    rows = [(f"m{i}", "image", "x", bytearray(b), None, None, None)
            for i, b in enumerate(bads)]
    df = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    out = M.extract_image_features(df).collect()
    assert len(out) == len(bads)
    assert all(r["width"] is None and r["feat"] is None for r in out)


def test_fuse_list_agg_join_api(spark):
    # the library-level fused join fold (SQL routes join-over-window_split
    # through the composite-scalar path instead; this pins the direct API)
    from openmldb_spark.functions import aggregates as A
    from openmldb_spark.operators.window import WindowDef, window_agg

    df = spark.createDataFrame(
        [(1, "A", "a,b", 10), (2, "A", "c", 20)],
        "id int, pk string, s string, ts long",
    )
    wd = WindowDef(partition_by=["pk"], order_by="ts", unbounded=True)
    spec = A.fuse_list_agg("join", A.window_split("s", ","), delim=" ")
    out = {r["id"]: r["j"] for r in window_agg(df, wd, {"j": spec}).collect()}
    assert out[2] == "c a b"  # rows ts-desc, pieces left-to-right


def test_overlap_jaccard_pairs_equals_bruteforce(spark):
    """The SSJoin/overlap-prefix formulation (r10, SCALE.md finding 4)
    must return exactly the brute-force pair set: pairs sharing >=
    min_overlap distinct rare shingles (df <= cap) with distinct-set
    Jaccard >= threshold — including docs with fewer rare shingles than
    the overlap gate (never candidates) and short docs (whole-text
    shingle)."""
    import itertools

    from openmldb_spark.pipeline import dedup as D

    words = ["w%d" % i for i in range(30)]
    rows = []
    # family of overlapping docs + short docs + a boilerplate block that
    # pushes some shingles over the df cap
    for i in range(40):
        base = words[i % 8: i % 8 + 12]
        if i % 3 == 0:
            base = base + ["common", "block", "of", "text"]
        rows.append((i, " ".join(base)))
    rows.append((100, "tiny"))
    rows.append((101, "tiny"))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    got = {
        (r["a"], r["b"])
        for r in D.overlap_jaccard_pairs(
            df, "doc_id", "text",
            shingle_n=3, min_overlap=3, threshold=0.3, max_token_df=10,
        ).collect()
    }

    # brute force over distinct string shingle sets
    sets = {
        r["doc_id"]: set(r["g"])
        for r in df.select(
            "doc_id", F.array_distinct(D.shingles(F.col("text"), 3)).alias("g")
        ).collect()
    }
    dfreq: dict = {}
    for s in sets.values():
        for g in s:
            dfreq[g] = dfreq.get(g, 0) + 1
    rare = {g for g, c in dfreq.items() if 1 < c <= 10}
    want = set()
    for a, b in itertools.combinations(sorted(sets), 2):
        if len(sets[a] & sets[b] & rare) < 3:
            continue
        j = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
        if j >= 0.3:
            want.add((a, b))
    assert got == want
