"""OR-of-bands portability contract: `lsh_topk_join(portable=True,
bands=L)` must be reproducible in an external SQL engine, exactly like
the single-table gate oracle — band t's planes derive from
md5(f"{seed}|{t}|{p}|{d}"), candidates join on any shared band-offset
bucket, pairs dedupe, cosines are sequential IEEE folds. This test
recomputes the whole thing independently in DuckDB and compares rows,
ranks, and cosines."""

import math

import pytest

try:
    import duckdb
except ImportError:  # pragma: no cover
    duckdb = None

from pyspark.sql import functions as F

from openmldb_spark.pipeline import similarity as S

PLANES, BANDS, SEED, K, DIM = 4, 3, 42, 3, 3


@pytest.mark.skipif(duckdb is None, reason="duckdb not importable")
def test_banded_portable_join_matches_duckdb(spark, tmp_path):
    vecs = [
        (i, [math.cos(i * 0.37), math.sin(i * 0.37), 0.2 * (i % 7)])
        for i in range(60)
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = S.lsh_topk_join(
        df, df.where(F.col("vec_id") < 8),
        corpus_id="vec_id", corpus_vec="embedding",
        query_id="vec_id", query_vec="embedding",
        k=K, planes=PLANES, bands=BANDS, seed=SEED, portable=True, dim=DIM,
    )
    got = {
        (r["query_id"], r["neighbor_id"]): (r["cos"], r["rank"])
        for r in out.collect()
    }

    path = str(tmp_path / "emb.parquet")
    df.write.parquet(path)
    pd_block = PLANES * DIM
    sql = f"""
        WITH P AS (
          SELECT CAST(i // {pd_block} AS INT) AS t,
                 CAST((i % {pd_block}) // {DIM} AS INT) AS p,
                 CAST(i % {DIM} AS INT) AS d,
                 CAST(('0x' || substr(md5('{SEED}|' || (i // {pd_block}) || '|'
                        || ((i % {pd_block}) // {DIM}) || '|' || (i % {DIM})), 1, 15))::BIGINT
                      / power(2.0, 59) - 1 AS DOUBLE) AS c
          FROM range(0, {BANDS * pd_block}) r(i)
        ), coeff AS (
          SELECT t, p, list(CAST(c AS DOUBLE) ORDER BY d) AS cs
          FROM P GROUP BY t, p
        ), vb AS (
          SELECT vec_id, t,
                 CAST(t AS BIGINT) * {1 << PLANES} +
                 CAST(sum(CASE WHEN list_reduce(list_prepend(0.0,
                        list_transform(list_zip(CAST(embedding AS DOUBLE[]), cs),
                                       x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))),
                        (a, b) -> a + b) >= 0
                          THEN (1::BIGINT << p) ELSE 0 END) AS BIGINT) AS bucket
          FROM emb, coeff GROUP BY vec_id, t
        ), ev AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                 sqrt(list_reduce(list_prepend(0.0,
                      list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)),
                      (a, b) -> a + b)) AS nrm
          FROM emb
        ), cand AS (
          SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
          FROM vb q JOIN vb c USING (bucket)
          WHERE q.vec_id < 8 AND q.vec_id <> c.vec_id
        ), scored AS (
          SELECT query_id, neighbor_id,
                 list_reduce(list_prepend(0.0, list_transform(list_zip(eq.v, ec.v),
                     x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))), (a, b) -> a + b)
                   / (eq.nrm * ec.nrm) AS cos
          FROM cand
          JOIN ev eq ON eq.vec_id = query_id
          JOIN ev ec ON ec.vec_id = neighbor_id
        )
        SELECT query_id, neighbor_id, cos,
               CAST(row_number() OVER (PARTITION BY query_id
                    ORDER BY cos DESC, neighbor_id ASC) AS INT) AS rank
        FROM scored QUALIFY rank <= {K}
    """
    con = duckdb.connect()
    con.execute(f"CREATE VIEW emb AS SELECT * FROM '{path}/*.parquet'")
    want = {
        (qid, nid): (cos, rank)
        for qid, nid, cos, rank in con.execute(sql).fetchall()
    }
    assert set(got) == set(want), (set(got) ^ set(want))
    for key, (cos, rank) in want.items():
        gcos, grank = got[key]
        assert grank == rank, key
        assert abs(gcos - cos) < 1e-12, (key, gcos, cos)
    # amplification engaged on BOTH sides: the agreed pair set must
    # exceed what band 0 alone yields (the DuckDB side recomputes the
    # band-0-only candidates independently; if Spark's _band_seeds
    # regressed to a single plane set, the parity assert above would
    # already mismatch — this guards the test itself staying non-vacuous)
    band0_pairs = con.execute(f"""
        WITH P AS (
          SELECT CAST((i % {pd_block}) // {DIM} AS INT) AS p,
                 CAST(i % {DIM} AS INT) AS d,
                 CAST(('0x' || substr(md5('{SEED}|0|'
                        || ((i % {pd_block}) // {DIM}) || '|' || (i % {DIM})), 1, 15))::BIGINT
                      / power(2.0, 59) - 1 AS DOUBLE) AS c
          FROM range(0, {pd_block}) r(i)
        ), coeff AS (
          SELECT p, list(CAST(c AS DOUBLE) ORDER BY d) AS cs FROM P GROUP BY p
        ), vb AS (
          SELECT vec_id,
                 CAST(sum(CASE WHEN list_reduce(list_prepend(0.0,
                        list_transform(list_zip(CAST(embedding AS DOUBLE[]), cs),
                                       x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))),
                        (a, b) -> a + b) >= 0
                          THEN (1::BIGINT << p) ELSE 0 END) AS BIGINT) AS bucket
          FROM emb, coeff GROUP BY vec_id
        )
        SELECT count(DISTINCT (q.vec_id, c.vec_id))
        FROM vb q JOIN vb c USING (bucket)
        WHERE q.vec_id < 8 AND q.vec_id <> c.vec_id
    """).fetchone()[0]
    # total banded candidates (pre-top-k) vs band 0 alone
    total = con.execute(f"""
        WITH P AS (
          SELECT CAST(i // {pd_block} AS INT) AS t,
                 CAST((i % {pd_block}) // {DIM} AS INT) AS p,
                 CAST(i % {DIM} AS INT) AS d,
                 CAST(('0x' || substr(md5('{SEED}|' || (i // {pd_block}) || '|'
                        || ((i % {pd_block}) // {DIM}) || '|' || (i % {DIM})), 1, 15))::BIGINT
                      / power(2.0, 59) - 1 AS DOUBLE) AS c
          FROM range(0, {BANDS * pd_block}) r(i)
        ), coeff AS (
          SELECT t, p, list(CAST(c AS DOUBLE) ORDER BY d) AS cs
          FROM P GROUP BY t, p
        ), vb AS (
          SELECT vec_id, t,
                 CAST(t AS BIGINT) * {1 << PLANES} +
                 CAST(sum(CASE WHEN list_reduce(list_prepend(0.0,
                        list_transform(list_zip(CAST(embedding AS DOUBLE[]), cs),
                                       x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))),
                        (a, b) -> a + b) >= 0
                          THEN (1::BIGINT << p) ELSE 0 END) AS BIGINT) AS bucket
          FROM emb, coeff GROUP BY vec_id, t
        )
        SELECT count(DISTINCT (q.vec_id, c.vec_id))
        FROM vb q JOIN vb c USING (bucket)
        WHERE q.vec_id < 8 AND q.vec_id <> c.vec_id
    """).fetchone()[0]
    assert total > band0_pairs, (total, band0_pairs)
