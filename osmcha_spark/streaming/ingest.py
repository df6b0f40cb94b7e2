"""Streaming ingest — continuous merge into partitioned storage.

The last mile of the replication pipeline: a stream of updates kept
flowing into a partitioned parquet snapshot, rewriting only touched
partitions per micro-batch. Reuses the batch-tested upsert path through
``foreachBatch`` rather than reimplementing MERGE semantics in a sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

def stream_upsert(
    stream: DataFrame,
    path: str,
    key: str,
    partition_col: str,
    checkpoint_dir: str,
    version_col: str | None = None,
):
    """Continuous merge: drive :func:`~osmcha_spark.operators.
    incremental.upsert_partitioned` from a stream via ``foreachBatch`` —
    the ingest loop that keeps a partitioned parquet snapshot current
    (the minutely-replication pattern of tools/job_incremental_pipeline
    .py, incrementalized: each micro-batch rewrites ONLY the partitions
    it touches).

    foreachBatch is the sanctioned bridge for sinks Structured
    Streaming lacks natively (MERGE-shaped writes): the batch frame is
    a plain DataFrame, so the whole batch-tested upsert path — literal
    partition pruning, anti-join + union, dynamic partition overwrite,
    bounded checkpoint — is reused verbatim, not reimplemented. The
    streaming checkpoint (offsets) makes delivery effectively
    exactly-once for this idempotent merge: a replayed batch re-merges
    the same keys to the same values (LWW with ``version_col`` makes
    replay idempotence unconditional). Restart-resume is pytest-gated
    (tests/test_streaming.py), same discipline as q37.
    """
    from osmcha_spark.operators.incremental import upsert_partitioned

    def _merge(batch: DataFrame, _batch_id: int) -> None:
        if batch.isEmpty():
            return
        upsert_partitioned(
            batch, path, key, partition_col, version_col=version_col
        )

    return (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )

