"""Streaming NEAR-duplicate detection — MinHash band buckets as stateful
stream keys (``applyInPandasWithState``), completing the dedup matrix:
batch exact / batch fuzzy (pipeline/dedup.py) / stream exact
(streaming/eventtime.py) / stream fuzzy (here).

Shape, and why it scales:

- the signature is the PURE-PROJECTION MinHash form
  (``pipeline.dedup.minhash_signatures`` without ``id_col`` — per-row HOF
  expressions, no explode->groupBy, so it is legal on a streaming
  DataFrame and adds zero stream state of its own);
- each document fans out to ``bands`` bucket keys (one ``explode``, a
  narrow per-row op); the ONLY shuffle is the groupBy on the bucket key;
- per-bucket state holds the (id, signature) of previously seen docs,
  FIFO-capped at ``max_per_bucket`` — total state is bounded by
  occupied_buckets x max_per_bucket x num_hashes longs, independent of
  stream length for a corpus with bounded boilerplate (a hot bucket is a
  degenerate shingle, same stance as the batch LSH cap);
- an arriving doc compares its FULL signature against the bucket's state
  (estimated Jaccard = fraction of equal minhash slots, the standard
  unbiased estimator) and emits one row per match >= ``threshold``.

Output contract: ``(doc_id, match_id, est_jaccard)`` in APPEND mode.
``match_id`` is a doc from an EARLIER micro-batch (via state) — that
direction is guaranteed CROSS-batch only; for two matching docs arriving
in the SAME micro-batch, row order within the pandas group is not
deterministic, so either may play ``doc_id``. A duplicate delivery of an
id already in the bucket refreshes its stored signature rather than
appending a copy (state stays one entry per distinct id). A pair that
collides in several
bands is emitted once PER BAND with the same est_jaccard — dedupe
downstream with ``dropDuplicates(["doc_id", "match_id"])`` per
micro-batch (cross-bucket dedup inside the operator would need a second
stateful shuffle for no information gain).

Reference note: the reference has no streaming engine — its online path
stores rows in tablet skiplists and serves point lookups
(SURVEY §2.8); this operator is Spark-native surface beyond it.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from openmldb_spark.pipeline.dedup import minhash_signatures

#: unit separators for the string-encoded state (ids may hold commas)
_IDS_SEP = "\x1f"
_SIG_SEP = ";"


def stream_minhash_dedup(
    stream: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    shingle_n: int = 5,
    bands: int = 16,
    threshold: float = 0.5,
    max_per_bucket: int = 256,
) -> DataFrame:
    """Near-duplicate pairs over a streaming document source (see module
    docstring for the contract). ``num_hashes`` must divide by ``bands``;
    rows-per-band ``r = num_hashes // bands`` sets the usual S-curve: a
    pair of Jaccard j collides in at least one band w.p.
    ``1 - (1 - j^r)^bands``.
    """
    if num_hashes % bands:
        raise ValueError(
            f"stream_minhash_dedup: bands={bands} must divide num_hashes={num_hashes}"
        )
    r = num_hashes // bands

    sig = minhash_signatures(
        stream.select(
            F.col(id_col).cast("string").alias("__fd_id"), F.col(text_col)
        ),
        text_col,
        num_hashes=num_hashes,
        shingle_n=shingle_n,
        out_col="__fd_sig",
    )
    # band buckets: hash of the band's signature slice, salted by the band
    # index (F.slice accepts a Column start, so one transform builds all)
    buckets = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.xxhash64(
            F.concat_ws(",", F.slice(F.col("__fd_sig"), b * r + 1, r)), b
        ),
    )
    banded = sig.select(
        "__fd_id", "__fd_sig", F.explode(buckets).alias("__fd_bucket")
    )

    out_schema = StructType(
        [
            StructField("doc_id", StringType()),
            StructField("match_id", StringType()),
            StructField("est_jaccard", DoubleType()),
        ]
    )
    state_schema = StructType(
        [StructField("ids", StringType()), StructField("sigs", StringType())]
    )

    def fn(key, pdfs, state):
        ids: list[str] = []
        sigs: list[list[int]] = []
        if state.exists:
            s_ids, s_sigs = state.get
            if s_ids:
                ids = s_ids.split(_IDS_SEP)
                sigs = [
                    [int(x) for x in s.split(",")]
                    for s in s_sigs.split(_SIG_SEP)
                ]
        out = []
        for pdf in pdfs:
            for rid, rsig in zip(pdf["__fd_id"], pdf["__fd_sig"]):
                rsig = [int(x) for x in rsig]
                for oid, osig in zip(ids, sigs):
                    if oid == rid:
                        continue
                    est = sum(a == b for a, b in zip(rsig, osig)) / len(rsig)
                    if est >= threshold:
                        out.append(
                            {
                                "doc_id": rid,
                                "match_id": oid,
                                # HALF_UP like Spark's F.round, NOT Python's
                                # banker's round — the batch minhash_lsh_pairs
                                # estimate must compare equal (mode pin)
                                "est_jaccard": int(est * 10000 + 0.5) / 10000,
                            }
                        )
                if rid in ids:
                    # re-delivered / duplicate doc_id: refresh the stored
                    # signature in place instead of appending a copy —
                    # otherwise one hot id inflates state and, under the
                    # FIFO cap, evicts DISTINCT earlier docs (ADVICE r10)
                    sigs[ids.index(rid)] = rsig
                else:
                    ids.append(str(rid))
                    sigs.append(rsig)
                    if len(ids) > max_per_bucket:
                        ids = ids[-max_per_bucket:]
                        sigs = sigs[-max_per_bucket:]
        state.update(
            (
                _IDS_SEP.join(ids),
                _SIG_SEP.join(",".join(str(x) for x in s) for s in sigs),
            )
        )
        if out:
            yield pd.DataFrame(out)

    return banded.groupBy("__fd_bucket").applyInPandasWithState(
        fn,
        out_schema,
        state_schema,
        "append",
        GroupStateTimeout.NoTimeout,
    )
