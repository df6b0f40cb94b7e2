"""Measure the round-5 snapshot-table additions at a few hundred files:
metadata-only aggregation vs the scan it replaces, and the
merge-on-read overhead of an equality-delete file on a full read.

    python tools/table_mor_bench.py [n_files] [rows] [n_del_keys]

Builds one partitioned table (16 partitions, ``n_files`` files total),
then times, over several interleaved rounds (per-query min — the
bench.py burst discipline; equality of results asserted every round):

  scan_agg   per-partition count/min/max via a full Spark scan
  meta_agg   the same answer from snapshot_metadata_agg (manifest only)
  read_plain full read of the PRE-delete snapshot (time travel)
  read_mor   full read of the CURRENT snapshot through an
             ``n_del_keys``-key equality delete (broadcast anti join)

Writes BENCH/table_mor.json. Expected shape: meta_agg is driver-side
O(files) JSON (milliseconds, independent of row count); read_mor pays
one broadcast left-anti join over the scan — single-digit percent at
bench scale, amortized to noise at 100 TB where the scan dominates.
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
    n_del = int(sys.argv[3]) if len(sys.argv) > 3 else 10_000

    from pyspark.sql import functions as F

    from osmcha_spark.session import get_spark
    from osmcha_spark.sources import tables as T

    spark = get_spark(master="local[32]", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    path = "/tmp/table_mor_bench"
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    df = spark.range(rows).select(
        F.col("id").alias("k"),
        (F.col("id") % 16).alias("part"),
        F.pmod(F.col("id") * 2654435761, F.lit(1_000_003)).alias("v"),
    ).repartition(max(1, n_files // 16), F.col("k"))
    s0 = T.snapshot_create(df, path, partition_col="part")
    # delete keys spread across every partition and most files
    T.snapshot_delete(path, "k", list(range(0, n_del * 97, 97)))
    man = T._load_manifest(path, T.current_snapshot(path))
    report: dict = {
        "n_files": len(man["files"]),
        "rows": rows,
        "n_del_keys": n_del,
    }

    def scan_agg():
        return sorted(
            (r.part, r.n, r.mn, r.mx)
            for r in T.read_snapshot(spark, path, snapshot=s0)
            .groupBy("part")
            .agg(F.count("*").alias("n"), F.min("v").alias("mn"),
                 F.max("v").alias("mx"))
            .collect()
        )

    def meta_agg():
        return sorted(
            (int(r.partition), r.n_rows, r.min_v, r.max_v)
            for r in T.snapshot_metadata_agg(
                spark, path, cols=["v"], snapshot=s0).collect()
        )

    def read_plain():
        return T.read_snapshot(spark, path, snapshot=s0).count()

    def read_mor():
        return T.read_snapshot(spark, path).count()

    queries = {
        "scan_agg": scan_agg,
        "meta_agg": meta_agg,
        "read_plain": read_plain,
        "read_mor": read_mor,
    }
    best: dict = {}
    expected: dict = {}
    for rnd in range(4):
        for name, fn in queries.items():
            t0 = time.monotonic()
            out = fn()
            dt = time.monotonic() - t0
            best[name] = min(best.get(name, dt), dt)
            if rnd == 0:
                expected[name] = out
            else:
                assert out == expected[name], f"{name} diverged"
    assert expected["scan_agg"] == expected["meta_agg"]
    assert expected["read_plain"] - expected["read_mor"] == n_del, (
        expected["read_plain"], expected["read_mor"])

    report["sec"] = {k: round(v, 4) for k, v in best.items()}
    report["meta_vs_scan_speedup"] = round(
        best["scan_agg"] / best["meta_agg"], 2)
    report["mor_overhead_pct"] = round(
        100.0 * (best["read_mor"] - best["read_plain"])
        / best["read_plain"], 1)
    print(json.dumps(report, indent=2))
    with open(os.path.join(REPO, "BENCH", "table_mor.json"), "w") as fh:
        json.dump(report, fh, indent=2)


if __name__ == "__main__":
    main()
