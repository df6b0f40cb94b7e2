"""Incremental upsert: last-writer-wins merge of a re-analysis batch into
a prior snapshot — the reference's real update pattern (changesets get
re-fetched and re-scored as they are edited; osmcha-django overwrites the
stored verdict row) expressed as a set operation.

Scale shape (100 TB): ONE shuffle — the anti-join on the key — plus a
union that is a pure plan concatenation. On partitioned storage the same
merge runs per affected partition with dynamic partition overwrite
(`spark.sql.sources.partitionOverwriteMode=dynamic`), so a minutely
replication batch rewrites only the partitions it touches; table formats
(Iceberg/Delta MERGE INTO) compile to this exact join shape underneath.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def upsert(prior: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """Rows in ``updates`` replace same-``key`` rows in ``prior``; all
    other prior rows pass through. Schemas must match by name."""
    keep = prior.join(updates.select(key), key, "left_anti")
    return updates.unionByName(keep)
