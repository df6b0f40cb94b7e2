"""Measure manifest-level file skipping on the snapshot table format
(sources/tables.py) at a few hundred files — the evidence that the
metadata layer changes SCAN COST, not just file counts.

    python tools/table_pruning_bench.py [n_files] [rows]

Builds one table, range-clustered on event_id into ``n_files`` files
with per-file [min,max] stats and a Bloom filter on user_id, then
times, over several interleaved rounds (per-query min, the bench.py
burst discipline):

  full       read every file, filter event_id range in Spark
  stats      manifest stats-pruned file list, same filter
  full_eq    read every file, filter user_id = k
  bloom      manifest bloom-pruned file list, same filter

Equality of results is asserted on every round (pruning is lossless).
Writes BENCH/table_pruning.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000_000

    from pyspark.sql import functions as F

    from osmcha_spark.session import get_spark
    from osmcha_spark.sources import tables as T

    spark = get_spark(master="local[32]", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    path = "/tmp/table_pruning_bench"
    import shutil
    shutil.rmtree(path, ignore_errors=True)
    df = spark.range(rows).select(
        F.col("id").alias("event_id"),
        F.pmod(F.col("id") * 2654435761, F.lit(1_000_003)).alias("user_id"),
        (F.col("id") % 97).cast("long").alias("cents"),
    ).repartitionByRange(n_files, F.col("event_id"))
    T.snapshot_create(df, path, bloom_cols=["user_id"])

    lo, hi = rows // 2, rows // 2 + rows // (2 * n_files)  # ~1 file wide
    probe_user = 123_457

    def run_full():
        return (T.read_snapshot(spark, path)
                .where(F.col("event_id").between(lo, hi))
                .agg(F.sum("cents"), F.count("*")).collect()[0])

    def run_stats():
        return (T.read_snapshot(spark, path,
                                where=[("event_id", lo, hi)])
                .where(F.col("event_id").between(lo, hi))
                .agg(F.sum("cents"), F.count("*")).collect()[0])

    def run_full_eq():
        return (T.read_snapshot(spark, path)
                .where(F.col("user_id") == probe_user)
                .agg(F.sum("cents"), F.count("*")).collect()[0])

    def run_bloom():
        return (T.read_snapshot(spark, path,
                                where_eq=[("user_id", probe_user)])
                .where(F.col("user_id") == probe_user)
                .agg(F.sum("cents"), F.count("*")).collect()[0])

    variants = [("full", run_full), ("stats", run_stats),
                ("full_eq", run_full_eq), ("bloom", run_bloom)]
    # warm (JIT + footer caches), and check losslessness once up front
    base = {}
    for name, fn in variants:
        base[name] = tuple(fn())
    assert base["full"] == base["stats"], (base["full"], base["stats"])
    assert base["full_eq"] == base["bloom"], (base["full_eq"], base["bloom"])

    times: dict = {name: [] for name, _ in variants}
    for _round in range(3):  # suite-interleaved rounds, min-of-rounds
        for name, fn in variants:
            t0 = time.monotonic()
            got = tuple(fn())
            times[name].append(time.monotonic() - t0)
            assert got == base[name]

    n_stats = len(T.snapshot_files(path, where=[("event_id", lo, hi)]))
    n_bloom = len(T.snapshot_files(path, where_eq=[("user_id", probe_user)]))
    report = {
        "n_files": n_files,
        "rows": rows,
        "files_after_stats_prune": n_stats,
        "files_after_bloom_prune": n_bloom,
        "sec": {k: round(min(v), 4) for k, v in times.items()},
        "speedup_stats": round(min(times["full"]) / min(times["stats"]), 2),
        "speedup_bloom": round(min(times["full_eq"]) / min(times["bloom"]), 2),
    }
    print(json.dumps(report, indent=2))
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "table_pruning.json"), "w") as fh:
        json.dump(report, fh, indent=2)
    shutil.rmtree(path, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
