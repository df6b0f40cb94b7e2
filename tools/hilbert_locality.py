"""Measure the file-skipping advantage of Hilbert vs Morton vs unsorted
layout under IDENTICAL stats pruning -> BENCH/hilbert_locality.json.

Protocol (host-independent: counts, not timings): one synthetic point
table (hash-scattered integer grid coords), written three ways into
snapshot tables whose files are contiguous runs of the layout key
(repartitionByRange + sortWithinPartitions -> per-file [min, max] x/y
stats in the manifest). K deterministic square AOIs then prune files
via snapshot_files(where=[(x, lo, hi), (y, lo, hi)]) - the exact read
path q131 uses - and the metric is files touched per AOI. Hilbert's
unit-step adjacency keeps each file's bounding box tight, so the same
stats skip more files; Morton's curve jumps inflate file boxes at the
quadrant seams; unsorted is the floor.

Usage: python tools/hilbert_locality.py [n_rows] [n_files] [n_aois]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from osmcha_spark.geo.cells import _spread_col  # noqa: E402
from osmcha_spark.geo.hilbert import hilbert_col  # noqa: E402
from osmcha_spark.session import get_spark  # noqa: E402
from osmcha_spark.sources import tables as T  # noqa: E402

LEVEL = 10           # 1024 x 1024 grid
SIDE = 64            # AOI side length (1/16 of the domain)


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    n_aois = int(sys.argv[3]) if len(sys.argv) > 3 else 200
    lim = 1 << LEVEL
    spark = get_spark(master="local[8]",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    base = spark.range(n_rows).select(
        F.col("id"),
        F.expr("cast(conv(substring(md5(concat(cast(id as string), 'hx')),"
               " 1, 15), 16, 10) as bigint)").alias("h1"),
        F.expr("cast(conv(substring(md5(concat(cast(id as string), 'hy')),"
               " 1, 15), 16, 10) as bigint)").alias("h2"),
    ).select(
        "id", (F.col("h1") % lim).alias("x"), (F.col("h2") % lim).alias("y")
    )
    keys = {
        "unsorted": F.col("id"),
        "morton": _spread_col(F.col("x")).bitwiseOR(
            _spread_col(F.col("y")) * F.lit(2)),
        "hilbert": hilbert_col(F.col("x"), F.col("y"), LEVEL),
    }
    work = tempfile.mkdtemp(prefix="hilbert_loc_")
    results = {}
    try:
        paths = {}
        for name, key in keys.items():
            p = os.path.join(work, name)
            df = (base.withColumn("__k", key)
                  .repartitionByRange(n_files, F.col("__k"))
                  .sortWithinPartitions("__k").drop("__k"))
            T.snapshot_create(df, p)
            paths[name] = p
        # deterministic AOI corners from the same hash family
        aois = []
        for i in range(n_aois):
            import hashlib
            hx = int(hashlib.md5(f"ax{i}".encode()).hexdigest()[:15], 16)
            hy = int(hashlib.md5(f"ay{i}".encode()).hexdigest()[:15], 16)
            x0 = hx % (lim - SIDE)
            y0 = hy % (lim - SIDE)
            aois.append((x0, y0))
        for name, p in paths.items():
            total_files = len(T.snapshot_files(p))
            touched = [
                len(T.snapshot_files(
                    p, where=[("x", x0, x0 + SIDE - 1),
                              ("y", y0, y0 + SIDE - 1)]))
                for x0, y0 in aois
            ]
            results[name] = {
                "total_files": total_files,
                "mean_files_touched": sum(touched) / len(touched),
                "max_files_touched": max(touched),
            }
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()
    out = {
        "metric": "files_touched_per_aoi (lower is better; identical "
                  "stats pruning, identical data)",
        "n_rows": n_rows, "n_files": n_files, "n_aois": n_aois,
        "level": LEVEL, "aoi_side": SIDE,
        "layouts": results,
        "hilbert_vs_morton": round(
            results["morton"]["mean_files_touched"]
            / results["hilbert"]["mean_files_touched"], 3),
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/hilbert_locality.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
