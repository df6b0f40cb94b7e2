"""Cluster-sorted table layout — the third leg of the storage-layout
triad (partitioned upsert = bounded rewrites, bucketed tables =
shuffle-free joins, THIS = scan pruning for range predicates).

``write_clustered`` range-partitions the frame on the cluster column and
sorts within partitions before writing parquet. That makes every file
AND every parquet row group cover a narrow, disjoint slice of the
cluster key's domain, so the engine's ordinary min/max machinery prunes
at two levels with zero reader cooperation needed:

- file level: Spark's parquet scan evaluates pushed filters against
  footer stats (``PushedFilters: [GreaterThanOrEqual(...), ...]``);
- row-group level: parquet readers skip row groups whose [min, max]
  misses the predicate.

For SPATIAL locality use the Morton cell (geo/cells.py) as the cluster
column — a 1-D sort of the Z-order key is exactly "Z-order clustering":
a lon/lat box becomes a handful of cell ranges (covering_cells_col), and
each range hits few row groups. The pruning is MEASURED, not asserted
from folklore: tests/test_layout.py counts, via the parquet footers,
how many row groups a tight cell range intersects under the clustered
layout vs a hash-shuffled one.

At 100 TB this is the difference between "every query scans the table"
and "point/range queries touch O(result) bytes" — and unlike an index it
costs only one sort at ingest, amortized across every later scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_clustered(df: DataFrame, path: str, cluster_col: str,
                    partitions: int = 8) -> None:
    """Write ``df`` as parquet range-clustered on ``cluster_col``:
    repartitionByRange (disjoint per-file key slices) + in-partition
    sort (monotone row groups inside each file)."""
    (
        df.repartitionByRange(partitions, F.col(cluster_col))
        .sortWithinPartitions(cluster_col)
        .write.mode("overwrite")
        .parquet(path)
    )


def scan_cell_ranges(spark, path: str, cell_col_name: str,
                     ranges: list[tuple[int, int]]) -> DataFrame:
    """Range-scan a cluster-sorted parquet table: OR of
    ``cell BETWEEN lo AND hi`` literal predicates (from
    geo/cells.py:cell_ranges_for_rect), all of which push to the parquet
    scan and prune files + row groups via footer min/max stats — the
    layout triad's scan path composed with a real query
    (tests/test_layout.py measures the pruning; q102 gates the result
    against q30's unclustered oracle)."""
    if not ranges:
        raise ValueError("empty range list")
    c = F.col(cell_col_name)
    pred = None
    for lo, hi in ranges:
        term = (c >= lo) & (c <= hi)
        pred = term if pred is None else pred | term
    return spark.read.parquet(path).where(pred)


def row_groups_intersecting_any(
    path: str, column: str, ranges: list[tuple[int, int]]
) -> tuple[int, int]:
    """(intersecting, total) row groups whose [min, max] overlaps ANY of
    the ranges — the multi-range form of :func:`row_groups_intersecting`
    (what an AOI's Z-order range set actually touches)."""
    import glob
    import os

    import pyarrow.parquet as pq

    hit = total = 0
    for f in glob.glob(os.path.join(path, "part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = _leaf_index(md, column)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            total += 1
            if st is None or st.min is None:
                hit += 1
            elif any(not (st.max < lo or st.min > hi)
                     for lo, hi in ranges):
                hit += 1
    return hit, total


def _leaf_index(md, column: str) -> int:
    """Parquet LEAF-column index of a top-level primitive column — the
    arrow-schema field index diverges once nested columns (maps/structs)
    flatten into multiple leaves, so match by path instead."""
    rg = md.row_group(0)
    for i in range(rg.num_columns):
        if rg.column(i).path_in_schema == column:
            return i
    raise KeyError(column)


def row_groups_intersecting(path: str, column: str,
                            lo: int, hi: int) -> tuple[int, int]:
    """(intersecting, total) parquet row groups whose [min, max] stats
    for ``column`` overlap [lo, hi] — the footer-level measurement of
    what a stats-aware reader must actually read."""
    import glob
    import os

    import pyarrow.parquet as pq

    hit = total = 0
    for f in glob.glob(os.path.join(path, "part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = _leaf_index(md, column)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            total += 1
            if st is None or st.min is None:
                hit += 1  # no stats → must read
            elif not (st.max < lo or st.min > hi):
                hit += 1
    return hit, total
