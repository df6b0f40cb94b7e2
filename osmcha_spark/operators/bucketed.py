"""Bucketed (pre-shuffled) table layout — the join that ships no bytes.

The standing cost of every fact⋈fact equi-join at 100 TB is the
exchange: both sides shuffle on the key before the SortMergeJoin can
run. Bucketing moves that shuffle to WRITE TIME, once: a table stored
with ``bucketBy(n, key)`` (+ ``sortBy`` for sort-free merges) is already
hash-partitioned on disk, and Spark's bucketed scan hands each task the
matching bucket files from both sides — the join plans with NO Exchange
and NO Sort (pinned by tests/test_plans.py). For tables joined daily
(snapshots ⋈ deltas, corpus ⋈ link-graph, events ⋈ user dims), paying
one shuffle at ingest and zero forever after is the difference between
a join that costs a full-network pass and one that streams from local
disk. The same layout also makes :func:`~osmcha_spark.operators.
incremental.snapshot_diff`'s full-outer join exchange-free.

Mechanics this module pins down (the parts that are easy to get wrong):

- bucketing requires the TABLE path (``saveAsTable`` — a catalog entry
  carrying the bucket spec); plain ``.parquet(path)`` writes silently
  drop the spec. The writer here always registers an external table at
  an explicit ``path``.
- co-location needs the SAME key and the SAME bucket count on both
  sides; mismatched counts re-shuffle the smaller side (Spark can
  coalesce 2n→n buckets with ``bucketing.coalesceBucketsInJoin``, but
  equal counts are the portable contract).
- one file per bucket per write: the writer repartitions on the key
  first (same Murmur3 hash as the bucket assignment, so partitions and
  buckets align 1:1), avoiding the files = tasks × buckets explosion
  the naive write produces.
- the Exchange elimination is unconditional, but since Spark 3.0 the
  SORT metadata is ignored by default (SPARK-28595 made it opt-in,
  because with several files per bucket the claimed order is false);
  the joins therefore keep a LOCAL per-bucket sort — linear, no
  shuffle. With this writer's one-file-per-bucket guarantee,
  ``spark.sql.legacy.bucketedTableScan.outputOrdering=true`` is sound
  and removes the Sort nodes too (both shapes pinned by
  tests/test_plans.py).
- Spark's bucket hash is ``Murmur3``-based and ENGINE-INTERNAL — the
  layout is a performance contract, never a correctness one, so q76's
  oracle is the plain join (results must be identical by construction).

Reference counterpart: none — osmcha holds everything in Python lists
(osmcha/changeset.py:186-189 ``ChangesetList`` "return a list with the
XML data"); engine-mandated (SURVEY §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    key: str,
    n_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as an external parquet table bucketed (and, by
    default, sorted) on ``key`` with ``n_buckets`` buckets."""
    if n_buckets <= 0:
        raise ValueError("n_buckets must be positive")
    w = (
        df.repartition(n_buckets, key)
        .write.format("parquet")
        .mode(mode)
        .option("path", path)
        .bucketBy(n_buckets, key)
    )
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str,
    how: str = "inner",
    prefer_merge: bool = True,
) -> DataFrame:
    """Join two same-key same-count bucketed tables — plans with no
    Exchange (and, when both are sorted with one file per bucket, no
    Sort).

    ``prefer_merge`` (default) hints SortMergeJoin: a broadcastable
    side would otherwise make the planner DISABLE the bucketed scan and
    broadcast instead — correct, but it ships the dim per-executor and
    abandons the co-located layout this operator exists for; with the
    hint both sides stream their matching bucket files shuffle- and
    sort-free. Pass ``prefer_merge=False`` to let the planner choose
    (e.g. when one side is genuinely tiny and the broadcast is cheaper
    than opening its bucket files)."""
    right = spark.table(right_table)
    if prefer_merge:
        right = right.hint("merge")
    return spark.table(left_table).join(right, key, how)
