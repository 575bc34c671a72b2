"""Streaming mode — continuous feature computation (Structured Streaming).

The reference has no streaming SQL surface (SURVEY §2.8): its "streaming" is
rows inserted into tablets + per-request window features computed as-of-now.
The equivalent here:

- :func:`request_mode_stream` — ``foreachBatch`` loop: each micro-batch of
  request rows is evaluated by a :class:`~openmldb_spark.plans.deploy.Deployment`
  against the history table (train/serve-consistent with ``run_batch``).
- TTL ≈ watermark + state timeout (see catalog.apply_ttl for the batch form).

Kafka/Pulsar connector parity = ``spark.readStream.format("kafka")`` — no
code needed beyond configuration; gated behind import so the package works
without streaming deps.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame


def request_mode_stream(
    request_stream: DataFrame,
    history: DataFrame,
    deployment,
    sink: Callable[[DataFrame, int], None],
    *,
    checkpoint_dir: Optional[str] = None,
    trigger_seconds: int = 10,
):
    """Continuously evaluate ``deployment`` for arriving request rows.

    request_stream : streaming DataFrame (e.g. readStream from Kafka/files)
    history        : static (or slowly-refreshed) history table
    sink           : callback(features_df, batch_id) — write wherever

    Returns the StreamingQuery (call ``.awaitTermination()``).
    """

    def run_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        feats = deployment.run_request(batch_df, history)
        sink(feats, batch_id)

    writer = request_stream.writeStream.foreachBatch(run_batch).trigger(
        processingTime=f"{trigger_seconds} seconds"
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def ann_serving_stream(
    query_stream: DataFrame,
    corpus: DataFrame,
    topk_fn: Callable[[DataFrame, DataFrame], DataFrame],
    sink: Callable[[DataFrame, int], None],
    *,
    checkpoint_dir: Optional[str] = None,
    trigger_seconds: int = 10,
):
    """Serve ANN top-k for arriving query vectors (the request-mode story
    for the similarity family): each micro-batch of query rows is evaluated
    by ``topk_fn(corpus, batch_df)`` against the static (or slowly-refreshed)
    corpus state table.

    ``topk_fn`` is a partial of :func:`~openmldb_spark.pipeline.similarity.
    ivf_topk` / ``lsh_topk`` / ``brute_force_topk`` with everything but
    (corpus, queries) bound — the BATCH plan runs per micro-batch, so
    stream results equal batch results by construction (the same
    broadcast-queries serving shape those functions already use).

    Returns the StreamingQuery (call ``.awaitTermination()``).
    """

    def run_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sink(topk_fn(corpus, batch_df), batch_id)

    writer = query_stream.writeStream.foreachBatch(run_batch).trigger(
        processingTime=f"{trigger_seconds} seconds"
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
