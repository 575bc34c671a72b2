"""Similarity search over embedding columns (array<float>).

- :func:`cosine` / :func:`dot` / :func:`l2_norm` — JVM-side vector math via
  ``zip_with`` / ``aggregate`` (for ad-hoc column expressions).
- :func:`brute_force_topk` — exact top-k neighbors. The query matrix is
  broadcast to every partition; each Arrow batch of the corpus is scored
  with one numpy matrix multiply and reduced to its local top-k, so the
  corpus×query cross product is never materialized and the corpus is
  scanned exactly once. The global top-k is the exact top-k of the
  per-batch top-k union (the (cos desc, id asc) order is total).
- :func:`lsh_topk` — random-hyperplane-bucketed approximate search: only
  candidates sharing a bucket are scored. Queries are broadcast — the
  request-serving shape (small query set, huge corpus).
- :func:`lsh_topk_join` — the corpus-vs-corpus scale path ("nearest
  neighbors for every document"): NO driver-side collect anywhere. Both
  sides get bucket ids, candidates come from an equi-join on bucket id,
  scoring/ranking happens JVM-side. Each side shuffles once on bucket;
  per-bucket size is the only quadratic term (``max_bucket`` caps it).

Determinism: hyperplanes derive from xxhash64(seed, plane, dim) — stable
across runs and cluster sizes; numpy float64 scoring is deterministic.
``lsh_topk_join(portable=True)`` switches to md5-derived planes and
sequential JVM folds, making bucket ids and scores bit-reproducible in any
SQL engine with md5 + IEEE doubles (the DuckDB correctness oracle).
"""

from __future__ import annotations

from typing import Iterator

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


def _id_sql_type(df: DataFrame, col: str) -> str:
    return dict(df.dtypes)[col]


def _spread(df: DataFrame, n_part: int) -> DataFrame:
    """Repartition for scoring parallelism ONLY when the source scan yields
    too few splits. At 100 TB the parquet scan already produces thousands
    of partitions (``spark.sql.files.maxPartitionBytes``), and an
    unconditional ``repartition`` would be a full all-to-all of the vector
    payload — the plan's only non-scan shuffle — purely to re-create
    parallelism it already has. (Round-6 adjudication of the embedding_topk
    bench drift: fresh-JVM reps with/without the repartition were
    [7.8, 1.1, 1.0]s vs [8.8, 1.2, 1.0]s on the 1-partition sf0.1 corpus —
    the shuffle is NOT the small-scale cost, cold-start is — but the
    conditional still removes the Exchange wherever the scan is already
    parallel, which is the case that matters at scale.)"""
    if df.rdd.getNumPartitions() >= n_part:
        return df
    return df.repartition(n_part)


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

    ``queries`` must be small (feature-serving shape): it is collected and
    broadcast as a normalized numpy matrix. The corpus streams through
    once; scoring is one BLAS matmul per Arrow batch (no per-element
    expression evaluation, no cross-join materialization).
    """
    import numpy as np

    spark = corpus.sparkSession
    qrows = queries.select(query_id, query_vec).collect()
    qids = [r[0] for r in qrows]
    Q = np.asarray([r[1] for r in qrows], dtype=np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((qids, Qn))

    id_t = _id_sql_type(corpus, corpus_id)
    out_schema = f"query_id {_id_sql_type(queries, query_id)}, neighbor_id {id_t}, cos double"

    def score(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        qids_l, Qn_l = bc.value
        qarr = np.asarray(qids_l)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = np.asarray(list(pdf[corpus_vec]), dtype=np.float64)
            cn = np.linalg.norm(C, axis=1, keepdims=True)
            cn[cn == 0.0] = 1.0
            S = (C / cn) @ Qn_l.T  # (batch, n_queries)
            cids = pdf[corpus_id].to_numpy()
            # local top-k per query: union of batch top-ks contains the
            # global top-k under the total (cos desc, cid asc) order
            kk = min(k + (1 if exclude_self else 0), S.shape[0])
            # argsort by (-cos, cid): lexsort keys are last-key-primary
            order = np.lexsort((np.broadcast_to(cids[:, None], S.shape).T, -S.T))
            top = order[:, :kk]  # (n_queries, kk) corpus row indices
            qi = np.repeat(np.arange(len(qarr)), kk)
            ci = top.ravel()
            yield pd.DataFrame(
                {
                    "query_id": qarr[qi],
                    "neighbor_id": cids[ci],
                    "cos": S[ci, qi],
                }
            )

    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    scored = _spread(corpus.select(corpus_id, corpus_vec), n_part).mapInPandas(
        score, out_schema
    )
    if exclude_self:
        scored = scored.filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _plane_matrix(spark, dim: int, planes: int, seed: int):
    """Hyperplane coefficients from xxhash64 — computed JVM-side once (tiny
    planes×dim grid) so Python and SQL paths see identical planes."""
    import numpy as np

    rows = (
        spark.range(planes * dim)
        .select(
            (F.col("id") / dim).cast("int").alias("p"),
            (F.col("id") % dim).cast("int").alias("d"),
            (
                F.xxhash64(F.concat_ws("|", F.lit(seed), (F.col("id") / dim).cast("int"), (F.col("id") % dim).cast("int")))
                .cast("double") / F.lit(float(2**63))
            ).alias("c"),
        )
        .collect()
    )
    P = np.zeros((planes, dim))
    for r in rows:
        P[r["p"], r["d"]] = r["c"]
    return P


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
    portable: bool = False,
    dim: int | None = None,
    bands: int = 8,
) -> DataFrame:
    """Approximate cosine top-k via shared random-hyperplane buckets.

    Recall/cost dial: fewer planes = bigger buckets = higher recall, more
    compute. ``bands`` adds OR-of-bands amplification — L independent
    plane sets; a candidate qualifies if it shares a bucket in ANY band
    (collision prob 1-(1-p^planes)^L vs p^planes) — the standard fix for
    sign-bit LSH's poor recall on isotropic embeddings. Cost scales ~L×
    candidates. The DEFAULT is ``bands=8`` (r9 verdict #7: measured 0.62
    recall@5 on the driver's real isotropic embeddings at planes=4, vs
    0.14 for a single band — an unwarned user must not get the worst
    case); pass ``bands=1`` explicitly for the single-band legacy arm
    (the correctness-gate oracles pin that arm bit-identical). Output
    schema matches :func:`brute_force_topk` (may return < k rows per
    query if its buckets are small — IVF-style behavior).

    ``portable=True`` keeps the broadcast-queries serving shape (the query
    side rides a broadcast hash join — no corpus shuffle) but derives
    planes from md5 and computes buckets/cosines with sequential JVM
    folds, bit-reproducible in any SQL engine with md5 + IEEE doubles —
    the same oracle contract as ``lsh_topk_join(portable=True)``.
    ``portable=False`` (default) collects+broadcasts the queries as a
    numpy matrix and scores one matmul per Arrow batch — the fast path.
    """
    import numpy as np

    spark = corpus.sparkSession
    if portable:
        if dim is None:
            dim = len(corpus.select(corpus_vec).first()[0])
        ca = _portable_bucket(
            corpus, corpus_id, corpus_vec, "neighbor_id", dim, planes, seed,
            bands,
        ).withColumnRenamed("__v", "__cv")
        qa = _portable_bucket(
            queries, query_id, query_vec, "query_id", dim, planes, seed,
            bands,
        ).withColumnRenamed("__v", "__qv")
        scored = ca.join(F.broadcast(qa), "__bucket").select(
            "query_id",
            "neighbor_id",
            cosine(F.col("__qv"), F.col("__cv")).alias("cos"),
        )
        if exclude_self:
            scored = scored.filter(F.col("query_id") != F.col("neighbor_id"))
        if bands > 1:
            # a pair colliding in several bands appears once per band —
            # dedupe before ranking (cos is identical across duplicates)
            scored = scored.groupBy("query_id", "neighbor_id").agg(
                F.max("cos").alias("cos")
            )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cos").desc(), F.col("neighbor_id").asc()
        )
        return scored.withColumn("rank", F.row_number().over(w)).filter(
            F.col("rank") <= k
        )
    first = corpus.select(corpus_vec).first()
    dim = len(first[0])
    # per-band plane blocks stacked to ONE (bands*planes, dim) matrix —
    # a single matmul per Arrow batch computes every band's bits
    P = np.vstack([
        _plane_matrix(spark, dim, planes, s) for s in _band_seeds(seed, bands)
    ])
    weights = (1 << np.arange(planes)).astype(np.int64)
    nb = max(1, int(bands))

    def _bucket_ids(V):
        bits = ((V @ P.T) >= 0).astype(np.int64).reshape(len(V), nb, planes)
        return bits @ weights  # (n, bands)

    qrows = queries.select(query_id, query_vec).collect()
    qids = [r[0] for r in qrows]
    Q = np.asarray([r[1] for r in qrows], dtype=np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    qbuckets = _bucket_ids(Q)
    bc = spark.sparkContext.broadcast((qids, Qn, qbuckets, P, weights))

    id_t = _id_sql_type(corpus, corpus_id)
    out_schema = f"query_id {_id_sql_type(queries, query_id)}, neighbor_id {id_t}, cos double"

    def score(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        qids_l, Qn_l, qb_l, P_l, w_l = bc.value
        qarr = np.asarray(qids_l)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = np.asarray(list(pdf[corpus_vec]), dtype=np.float64)
            bits = ((C @ P_l.T) >= 0).astype(np.int64)
            cb = bits.reshape(len(C), nb, planes) @ w_l  # (batch, bands)
            cids = pdf[corpus_id].to_numpy()
            cn = np.linalg.norm(C, axis=1, keepdims=True)
            cn[cn == 0.0] = 1.0
            Cn = C / cn
            outs = []
            for qi, qb in enumerate(qb_l):
                # OR of bands: candidate if ANY band's bucket matches
                mask = (cb == qb).any(axis=1)
                if not mask.any():
                    continue
                cos = Cn[mask] @ Qn_l[qi]
                outs.append(
                    pd.DataFrame(
                        {
                            "query_id": qarr[qi],
                            "neighbor_id": cids[mask],
                            "cos": cos,
                        }
                    )
                )
            if outs:
                yield pd.concat(outs)

    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    scored = _spread(corpus.select(corpus_id, corpus_vec), n_part).mapInPandas(
        score, out_schema
    )
    if exclude_self:
        scored = scored.filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _portable_planes(dim: int, planes: int, seed: int) -> list[list[float]]:
    """md5-derived hyperplane coefficients in [-1, 1): ``h / 2^59 - 1`` with
    h = first 15 md5 hex digits of ``"{seed}|{p}|{d}"``. Python's md5 +
    IEEE-754 division reproduce bit-exactly in any engine with md5 (DuckDB:
    ``('0x'||substr(md5(s),1,15))::BIGINT / power(2.0,59) - 1``)."""
    import hashlib

    return [
        [
            int(hashlib.md5(f"{seed}|{p}|{d}".encode()).hexdigest()[:15], 16)
            / 2**59
            - 1
            for d in range(dim)
        ]
        for p in range(planes)
    ]


def _band_seeds(seed, bands: int) -> list:
    """Per-band plane-derivation seeds. One band keeps the legacy
    ``{seed}|{p}|{d}`` hash keys (existing oracles unchanged); with L > 1
    bands every band t derives from ``{seed}|{t}|{p}|{d}`` — L independent
    plane sets, reproducible in any engine with the same hash."""
    return [seed] if bands <= 1 else [f"{seed}|{t}" for t in range(bands)]


def _lit_double_array(vals) -> Column:
    """One-parse array<double> literal. ``F.array(*[F.lit(v) ...])`` costs a
    py4j round-trip per element — at 8 planes x 64 dims x 2 join sides that
    is ~1000 driver calls per plan build, and plan BUILD (not execution)
    measured as the dominant cost of the portable LSH bench query (guide
    §1: 1.3-1.7s build vs 0.5-0.7s exec at sf0.1). A single ``F.expr``
    parse builds the same CreateArray(double literals) JVM-side.
    ``repr(float)`` is the shortest round-trip form and Spark parses
    double literals correctly rounded, so values are bit-identical."""
    return F.expr("array(" + ",".join(f"{float(v)!r}D" for v in vals) + ")")


def _portable_bucket(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    out_id: str,
    dim: int,
    planes: int,
    seed: int,
    bands: int = 1,
) -> DataFrame:
    """(id, __v, __bucket) with md5-derived planes and sequential JVM
    folds — the oracle-reproducible bucketizer shared by :func:`lsh_topk`
    (portable arm) and :func:`lsh_topk_join` (portable=True). With
    ``bands`` > 1 each row emits one bucket id PER BAND (exploded), band t
    offset by ``t * 2**planes`` so the downstream equi-join stays a single
    long-column join."""
    proj = df.select(F.col(id_col).alias(out_id), F.col(vec_col).alias("__v"))
    # each band's bucket id is ONE F.expr parse instead of a Column chain of
    # planes x (zip_with + aggregate + when) higher-order-function builders:
    # every pyspark HOF lambda costs a burst of py4j round-trips, and plan
    # BUILD (not execution) profiled as the dominant cost of the portable
    # bucketize (guide §1: ~3.5k driver round-trips, ~1.1s of a 1.5s build
    # at 8 planes). The SQL text analyzes to the identical expression tree
    # (CASE WHEN aggregate(zip_with(...)) >= 0, left-fold sum from 0.0D), so
    # bucket ids — and the DuckDB oracle contract — are bit-unchanged.
    band_cols = []
    for t, s in enumerate(_band_seeds(seed, bands)):
        coeffs = _portable_planes(dim, planes, s)
        terms = [f"CAST({t * (1 << planes)} AS BIGINT)"]
        for p in range(planes):
            arr = "array(" + ",".join(f"{float(c)!r}D" for c in coeffs[p]) + ")"
            d = (
                f"aggregate(zip_with(__v, {arr}, (x, y) -> "
                "CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0.0D, (acc, v) -> acc + v)"
            )
            terms.append(
                f"(CASE WHEN ({d}) >= 0 THEN CAST({1 << p} AS BIGINT) "
                "ELSE CAST(0 AS BIGINT) END)"
            )
        band_cols.append(F.expr(" + ".join(terms)))
    if bands <= 1:
        return proj.withColumn("__bucket", band_cols[0])
    return proj.withColumn("__bucket", F.explode(F.array(*band_cols)))


def lsh_topk_join(
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
    portable: bool = False,
    max_bucket: int | None = None,
    dim: int | None = None,
    bands: int = 8,
) -> DataFrame:
    """Approximate cosine top-k via a bucket-id equi-join — the scale path
    for large query sets (no driver-side collect; queries stay distributed;
    pass ``dim`` to skip the one-row dimension probe and build the plan
    with zero driver actions in portable mode).

    Both sides are assigned a random-hyperplane bucket id, then joined on
    it; candidate pairs are scored with the JVM-side sequential cosine and
    ranked per query. Wall-clock is bounded by bucket sizes: with b planes
    buckets split the corpus ~2^b ways, and ``max_bucket`` drops degenerate
    buckets (at 100 TB a giant bucket means degenerate vectors, not real
    neighbors). Output schema matches :func:`brute_force_topk`; like
    :func:`lsh_topk` a query may get < k rows if its bucket is small.

    ``portable=True`` derives planes from md5 and computes bucket bits with
    sequential JVM folds — bit-reproducible in external SQL engines, used
    by the correctness oracle. ``portable=False`` (default) derives planes
    from xxhash64 (identical to :func:`lsh_topk`) and computes bucket ids
    with one numpy matmul per Arrow batch — the fast path.

    ``bands`` (OR-of-bands amplification, same contract and DEFAULT —
    ``bands=8`` — as :func:`lsh_topk`): L independent plane sets, each row
    emits one band-offset bucket id per band — L× shuffle rows —
    candidates join on any shared band bucket and pairs dedupe before
    ranking. The recall fix for isotropic embeddings, where single-band
    sign-bit LSH measured 0.14 on the driver's real table (r8 verdict):
    planes=4/bands=8 measures ≥0.6 there (pinned in
    tests/test_pipeline.py). Pass ``bands=1`` explicitly for the
    single-band legacy arm (the gate oracles pin it bit-identical).
    """
    import numpy as np

    spark = corpus.sparkSession
    if dim is None:
        dim = len(corpus.select(corpus_vec).first()[0])
    nb = max(1, int(bands))

    def with_bucket(df: DataFrame, id_col: str, vec_col: str, out_id: str) -> DataFrame:
        if portable:
            return _portable_bucket(
                df, id_col, vec_col, out_id, dim, planes, seed, nb
            )
        proj = df.select(F.col(id_col).alias(out_id), F.col(vec_col).alias("__v"))
        P = np.vstack([
            _plane_matrix(spark, dim, planes, s)
            for s in _band_seeds(seed, nb)
        ])
        weights = (1 << np.arange(planes)).astype(np.int64)
        offsets = (np.arange(nb) << planes).astype(np.int64)
        bc = spark.sparkContext.broadcast((P, weights, offsets))
        id_t = _id_sql_type(proj, out_id)
        vec_t = dict(proj.dtypes)["__v"]

        def bucketize(batches):
            import pandas as pd

            P_l, w_l, off_l = bc.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                V = np.asarray(list(pdf["__v"]), dtype=np.float64)
                bits = ((V @ P_l.T) >= 0).astype(np.int64)
                bkt = bits.reshape(len(V), len(off_l), -1) @ w_l + off_l
                if len(off_l) == 1:
                    yield pd.DataFrame(
                        {out_id: pdf[out_id], "__v": pdf["__v"],
                         "__bucket": bkt[:, 0] - off_l[0]}
                    )
                    continue
                # one row per (input row, band): band t's id offset by
                # t*2^planes keeps the join a single long-column equi-join
                idx = np.repeat(np.arange(len(V)), len(off_l))
                yield pd.DataFrame(
                    {out_id: pdf[out_id].to_numpy()[idx],
                     "__v": pdf["__v"].to_numpy()[idx],
                     "__bucket": bkt.ravel()}
                )

        return proj.mapInPandas(bucketize, f"{out_id} {id_t}, __v {vec_t}, __bucket long")

    ca = with_bucket(corpus, corpus_id, corpus_vec, "neighbor_id").withColumnRenamed("__v", "__cv")
    qa = with_bucket(queries, query_id, query_vec, "query_id").withColumnRenamed("__v", "__qv")
    if max_bucket is not None:
        # oversized-bucket drop via groupBy+anti-join: the partial count
        # combines hot buckets MAP-SIDE (a Window.partitionBy count would
        # shuffle every member of the hottest bucket to one reducer before
        # the filter could drop it), and the >max_bucket survivors are a
        # tiny broadcast for the anti join
        big = (
            ca.groupBy("__bucket")
            .agg(F.count(F.lit(1)).alias("__bsize"))
            .filter(F.col("__bsize") > max_bucket)
            .select("__bucket")
        )
        ca = ca.join(F.broadcast(big), "__bucket", "left_anti")

    scored = qa.join(ca, "__bucket").select(
        "query_id", "neighbor_id", cosine(F.col("__qv"), F.col("__cv")).alias("cos")
    )
    if exclude_self:
        scored = scored.filter(F.col("query_id") != F.col("neighbor_id"))
    if nb > 1:
        # OR-of-bands duplicates: a pair colliding in several bands appears
        # once per band — one keyed dedupe (cos identical across bands)
        scored = scored.groupBy("query_id", "neighbor_id").agg(
            F.max("cos").alias("cos")
        )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def kmeans_centroids(
    corpus: DataFrame,
    *,
    vec_col: str,
    id_col: str,
    k: int = 16,
    iters: int = 5,
    seed: int = 42,
):
    """Spherical k-means (Lloyd's on cosine) centroid training for IVF —
    the "real scale" upgrade over hash-sampled centroids the docstrings
    below point at.

    100 TB shape: ONE corpus scan per iteration. Each Arrow batch assigns
    its vectors to the nearest centroid with a numpy matmul and emits the
    per-centroid partial (sum, count) — k rows per batch, reduced by a
    map-side-combining groupBy to k×dim driver state (collect of k tiny
    rows, never vectors). Initialization is the deterministic md5-hash
    sample used by :func:`ivf_topk_join` (stable across runs and cluster
    sizes); empty clusters keep their previous centroid. Returns a numpy
    (k, dim) float64 matrix of UNIT-NORM centroids, accepted by
    :func:`ivf_topk` / :func:`ivf_topk_join` via ``centroids=``.
    """
    import numpy as np

    spark = corpus.sparkSession
    h = F.conv(
        F.substring(F.md5(F.concat_ws("|", F.lit(seed), F.col("__i").cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    init_rows = (
        corpus.select(F.col(id_col).alias("__i"), F.col(vec_col).alias("__v"))
        .withColumn("__h", h)
        .orderBy("__h", "__i")
        .limit(int(k))
        .collect()
    )
    C = np.asarray([r["__v"] for r in init_rows], dtype=np.float64)
    nrm = np.linalg.norm(C, axis=1, keepdims=True)
    nrm[nrm == 0.0] = 1.0
    C = C / nrm
    dim = C.shape[1]
    vecs = corpus.select(F.col(vec_col).alias("__v"))

    for _ in range(int(iters)):
        bc = spark.sparkContext.broadcast(C)

        def partials(batches):
            import pandas as pd

            CN = bc.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                V = np.asarray(list(pdf["__v"]), dtype=np.float64)
                vn = np.linalg.norm(V, axis=1, keepdims=True)
                vn[vn == 0.0] = 1.0
                Vn = V / vn
                assign = np.argmax(Vn @ CN.T, axis=1)
                out = {"__cid": [], "__sum": []}
                for cid in np.unique(assign):
                    m = assign == cid
                    # the member count rides as element [dim] of the
                    # partial-sum array, so ONE action finishes the
                    # iteration (sums + counts in the same scan)
                    out["__cid"].append(int(cid))
                    out["__sum"].append(
                        Vn[m].sum(axis=0).tolist() + [float(m.sum())]
                    )
                yield pd.DataFrame(out)

        # dim-robust final reduce (r8 verdict #2): posexplode the partial
        # arrays and run ONE sum aggregate over (cid, pos) — k×(dim+1)
        # rows, regardless of dim. The previous per-dimension
        # F.sum(__sum[i]) array built dim aggregate expressions, which at
        # production embedding dims (768-1536) bloats whole-stage codegen
        # past hugeMethodLimit into interpreted fallback.
        agg = (
            vecs.mapInPandas(partials, "__cid int, __sum array<double>")
            .select("__cid", F.posexplode("__sum").alias("__pos", "__s"))
            .groupBy("__cid", "__pos")
            .agg(F.sum("__s").alias("__s"))
            .collect()
        )
        acc = np.zeros((C.shape[0], dim))
        cnts = np.zeros(C.shape[0])
        for r in agg:
            if r["__pos"] == dim:
                cnts[r["__cid"]] = r["__s"]
            else:
                acc[r["__cid"], r["__pos"]] = r["__s"]
        newC = C.copy()
        for cid in range(C.shape[0]):
            if cnts[cid] > 0:
                n = np.linalg.norm(acc[cid])
                if n > 0:
                    newC[cid] = acc[cid] / n
        C = newC
        bc.unpersist()
    return C


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    corpus_id: str,
    corpus_vec: str,
    query_id: str,
    query_vec: str,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    exclude_self: bool = True,
    centroids=None,
) -> DataFrame:
    """IVF-bucketed approximate cosine top-k — the inverted-file ANN scale
    path next to :func:`lsh_topk`'s hyperplane one.

    Every corpus vector belongs to the bucket of its nearest centroid
    (argmax cosine over a broadcast centroid matrix, computed inline per
    Arrow batch); each query probes its ``nprobe`` nearest centroids and
    exact-scores only those buckets' members. ``nprobe == n_centroids``
    degenerates to brute force; the dial trades recall for the fraction
    of the corpus scored (~nprobe/n_centroids on balanced buckets).

    Default centroids are hash-sampled corpus vectors — the
    ``n_centroids`` rows with smallest ``xxhash64(seed|id)``, a
    deterministic sampling that is stable across runs and cluster sizes
    (TakeOrdered: no full sort). Pass ``centroids=`` (a (k, dim) matrix,
    e.g. from :func:`kmeans_centroids`) for trained buckets — the
    plumbing (assign/probe/score) is identical.

    Queries are broadcast (the serving shape); the corpus streams through
    exactly once, one numpy matmul per batch, never materializing the
    corpus×query cross join. Output schema matches
    :func:`brute_force_topk`; fewer than k rows per query can return when
    the probed buckets are small.
    """
    import numpy as np

    spark = corpus.sparkSession
    if centroids is not None:
        Cen = np.asarray(centroids, dtype=np.float64)
    else:
        cent_rows = (
            corpus.select(corpus_id, corpus_vec)
            .withColumn("__h", F.xxhash64(F.concat_ws("|", F.lit(seed), F.col(corpus_id))))
            .orderBy("__h")
            .limit(int(n_centroids))
            .collect()
        )
        Cen = np.asarray([r[1] for r in cent_rows], dtype=np.float64)
    cen_n = np.linalg.norm(Cen, axis=1, keepdims=True)
    cen_n[cen_n == 0.0] = 1.0
    CenN = Cen / cen_n

    qrows = queries.select(query_id, query_vec).collect()
    qids = [r[0] for r in qrows]
    Q = np.asarray([r[1] for r in qrows], dtype=np.float64)
    q_n = np.linalg.norm(Q, axis=1, keepdims=True)
    q_n[q_n == 0.0] = 1.0  # all-zero query: cos 0 everywhere, not NaN ranks
    Qn = Q / q_n
    npb = min(int(nprobe), CenN.shape[0])
    # per-query probe set: nprobe nearest centroids by cosine
    qc = Qn @ CenN.T                       # (n_queries, n_centroids)
    probes = np.argsort(-qc, axis=1)[:, :npb]
    bc = spark.sparkContext.broadcast((qids, Qn, probes, CenN))

    id_t = _id_sql_type(corpus, corpus_id)
    out_schema = f"query_id {_id_sql_type(queries, query_id)}, neighbor_id {id_t}, cos double"

    def score(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        qids_l, Qn_l, probes_l, CenN_l = bc.value
        qarr = np.asarray(qids_l)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = np.asarray(list(pdf[corpus_vec]), dtype=np.float64)
            cn = np.linalg.norm(C, axis=1, keepdims=True)
            cn[cn == 0.0] = 1.0
            Cn = C / cn
            assign = np.argmax(Cn @ CenN_l.T, axis=1)  # (batch,) bucket ids
            cids = pdf[corpus_id].to_numpy()
            outs = []
            for qi in range(len(qarr)):
                mask = np.isin(assign, probes_l[qi])
                if not mask.any():
                    continue
                cos = Cn[mask] @ Qn_l[qi]
                outs.append(
                    pd.DataFrame(
                        {
                            "query_id": qarr[qi],
                            "neighbor_id": cids[mask],
                            "cos": cos,
                        }
                    )
                )
            if outs:
                yield pd.concat(outs)

    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    scored = _spread(corpus.select(corpus_id, corpus_vec), n_part).mapInPandas(
        score, out_schema
    )
    if exclude_self:
        scored = scored.filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _centroid_array(cent: DataFrame) -> DataFrame:
    """Collapse a ``(__cidx, __cent_v)`` centroid table to ONE row holding
    an array of (index, vector) structs. Broadcasting that row and picking
    each data row's centroids with a per-row array sort makes assignment
    zero-shuffle — no ×n_centroids crossJoin fan-out, no row_number window
    keyed by row id over the full (id, vector) payload (round-4's
    scale-killer). Shared by :func:`ivf_topk_join` and the persisted-index
    path (:mod:`openmldb_spark.pipeline.annindex`)."""
    return cent.agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("__cidx").alias("i"),
                    F.col("__cent_v").alias("v"),
                    # r13: centroid norm precomputed once per centroid —
                    # the same l2_norm fold the per-row cosine evaluated
                    # per (row, centroid), so scores stay bit-identical
                    l2_norm(F.col("__cent_v")).alias("n"),
                )
            )
        ).alias("__cents")
    )


def _assign_by_centroids(
    df: DataFrame, id_col: str, vec_col: str, out_id: str, keep: int,
    cent_arr: DataFrame,
) -> DataFrame:
    """``(out_id, __v, __vn, __cidx)`` — each row's ``keep`` nearest
    centroids by (cos desc, centroid index asc), the same total order the
    old row_number window used, so picks and ties are unchanged.

    r13 (guide §1.2 step 2): the row's own l2 norm is computed ONCE and
    bound as a lambda variable (it was re-folded per centroid — 16x per
    row), and each centroid's norm rides precomputed in the broadcast
    array; cos = dot / (row_norm * cent_norm) keeps the exact operand
    order of :func:`cosine`, so every score is bit-identical. ``__vn`` is
    returned so downstream pair scoring can reuse it instead of
    re-folding the norm per candidate pair."""
    proj = df.select(
        F.col(id_col).alias(out_id),
        F.col(vec_col).alias("__v"),
        l2_norm(F.col(vec_col)).alias("__vn"),
    )
    ranked = F.array_sort(
        F.transform(
            F.col("__cents"),
            lambda c: F.struct(
                (dot(F.col("__v"), c["v"]) / (F.col("__vn") * c["n"])).alias("c"),
                c["i"].alias("i"),
            ),
        ),
        lambda x, y: F.when(x["c"] > y["c"], F.lit(-1))
        .when(x["c"] < y["c"], F.lit(1))
        .otherwise(x["i"].cast("int") - y["i"].cast("int")),
    )
    return (
        proj.crossJoin(F.broadcast(cent_arr))
        .select(out_id, "__v", "__vn", F.explode(F.slice(ranked, 1, keep)).alias("__pick"))
        .select(out_id, "__v", "__vn", F.col("__pick.i").alias("__cidx"))
    )


def ivf_topk_join(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    corpus_id: str,
    corpus_vec: str,
    query_id: str,
    query_vec: str,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    exclude_self: bool = True,
    max_bucket: int | None = None,
    centroids=None,
) -> DataFrame:
    """IVF approximate top-k as a centroid-bucket equi-join — the
    corpus-vs-corpus scale path (no driver collect anywhere), and the
    oracle-checkable sibling of :func:`ivf_topk`.

    Default centroids are the ``n_centroids`` corpus rows with smallest
    portable md5 hash (computable identically in any SQL engine) — or
    pass a trained (k, dim) matrix via ``centroids=``
    (:func:`kmeans_centroids`), embedded as plan literals. Either way
    the centroid table collapses to a
    single broadcast row holding an array of (index, vector) structs;
    every row picks its centroids with a per-row ``array_sort`` over that
    array ((cos desc, centroid index asc) — same tie rule as numpy
    argmax), so assignment is zero-shuffle: no crossJoin fan-out, no
    row_number window keyed by row id (round-4's scale-killer). Cosines
    are sequential JVM folds (``F.aggregate``), so scores and ranks are
    bit-reproducible in the DuckDB oracle — the same portability contract
    as ``lsh_topk_join(portable=True)``.

    Shuffles: TakeOrdered + a ≤n_centroids-row sort/agg for the centroid
    array, broadcast of the query side of the centroid-index equi-join
    (the corpus never shuffles on bucket), one rank window on
    (query_id). Per-centroid bucket size is the only fan-out;
    ``max_bucket`` drops degenerate buckets via a tiny count-agg +
    broadcast join (never a window over the vector payload).
    """
    spark = corpus.sparkSession  # noqa: F841  (parallel with lsh_topk_join)

    if centroids is not None:
        cent = spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
            "__cidx int, __cent_v array<double>",
        )
    else:
        h = F.conv(
            F.substring(F.md5(F.concat_ws("|", F.lit(seed), F.col("__cent_src"))), 1, 15),
            16,
            10,
        ).cast("long")
        cent = (
            corpus.select(F.col(corpus_id).alias("__cent_src"), F.col(corpus_vec).alias("__cent_v"))
            .withColumn("__h", h)
            .orderBy("__h", "__cent_src")
            .limit(int(n_centroids))
        )
        cent = (
            cent.withColumn(
                "__cidx",
                F.row_number().over(Window.orderBy("__h", "__cent_src")) - 1,
            )
            .select("__cidx", "__cent_v")
        )

    cent_arr = _centroid_array(cent)

    def assign(df: DataFrame, id_col: str, vec_col: str, out_id: str, keep: int) -> DataFrame:
        return _assign_by_centroids(df, id_col, vec_col, out_id, keep, cent_arr)

    ca = (
        assign(corpus, corpus_id, corpus_vec, "neighbor_id", 1)
        .withColumnRenamed("__v", "__cv")
        .withColumnRenamed("__vn", "__cvn")
    )
    qa = assign(queries, query_id, query_vec, "query_id", min(int(nprobe), int(n_centroids)))
    qa = qa.withColumnRenamed("__v", "__qv").withColumnRenamed("__vn", "__qvn")
    if max_bucket is not None:
        # bucket sizes via partial-agg (map-side combine shuffles only
        # ≤ n_centroids count rows) + broadcast join back — not a window
        # over the full (id, vector) payload.
        bsize = ca.groupBy("__cidx").agg(F.count(F.lit(1)).alias("__bsize"))
        ca = (
            ca.join(F.broadcast(bsize), "__cidx")
            .filter(F.col("__bsize") <= max_bucket)
            .drop("__bsize")
        )

    # queries are the small side (serving shape) — broadcast them so the
    # corpus assignment never shuffles on __cidx either. Pair cosines
    # reuse the per-row norms the assignment already folded (operand
    # order of `cosine` preserved: dot / (q_norm * c_norm)).
    scored = ca.join(F.broadcast(qa), "__cidx").select(
        "query_id",
        "neighbor_id",
        (dot(F.col("__qv"), F.col("__cv")) / (F.col("__qvn") * F.col("__cvn"))).alias("cos"),
    )
    if exclude_self:
        scored = scored.filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
