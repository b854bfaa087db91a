"""Structured Streaming ingestion: a stream of documents incrementally
indexed via batch upserts.

The reference is strictly batch (SURVEY.md §2.9) — its only stream-ish
behavior is the per-path re-index/commit loop.  At 100 TB the natural
extension is a continuous feed of new/changed files; this module maps it
to Structured Streaming with ``foreachBatch`` -> ``upsert`` so each
micro-batch is one atomic index generation (the same replace-by-fullpath
semantics, the same tombstone/dict-delta machinery, checkpointed by
Spark's streaming offset log + the index manifest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .upsert import upsert


def stream_upsert(spark: SparkSession, index_dir: str,
                  stream_df: DataFrame, checkpoint_dir: str,
                  available_now: bool = True):
    """Attach a streaming docs DataFrame (DOCS_SCHEMA columns; doc_id
    ignored) to an existing index.  Each micro-batch becomes one upsert
    generation.  ``available_now=True`` drains what's available and
    stops — the batch-friendly trigger used in tests; pass False for a
    continuous query."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        upsert(spark, index_dir, batch_df)

    writer = stream_df.writeStream.foreachBatch(handle) \
        .option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
