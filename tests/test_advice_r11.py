"""Regression pins for the round-10 ADVICE findings (ADVICE.md r10)."""

import duckdb
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry
from openmldb_spark.pipeline.contamination import ngram_contamination


def test_contamination_oracle_matches_on_short_docs(spark):
    """ADVICE r10 #1: the DuckDB oracle dropped docs with <n tokens while
    shingles() falls back to the whole text as one shingle — a latent gate
    mismatch masked by the sf0.001 corpus's 10-token minimum. The oracle
    now mirrors the fallback; pin equality on a corpus that HAS short docs."""
    rows = [
        (0, "one two"),               # 2 tokens, benchmark member
        (20, "one two"),              # exact short-doc leak -> 1.0
        (40, "a b c d e f g h"),      # benchmark member
        (1, "a b c d e f g h x y z"), # partially contaminated
        (2, "zz"),                    # 1-token doc, uncontaminated
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    bench = docs.where(F.col("doc_id") % 20 == 0)
    got = sorted(
        tuple(r) for r in ngram_contamination(docs, bench, n=5).collect()
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        + ", ".join("(%d, %r)" % r for r in rows)
        + ") t(doc_id, text)"
    )
    want = sorted(con.execute(entry.oracle_sql()["contamination_ngram"]).fetchall())
    assert got == want
