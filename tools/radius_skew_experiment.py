"""radius_join hotspot-skew experiment (VERDICT r3 item 3).

q98's operator docstring names its inherent failure mode at 100 TB: a
dense urban cell makes the per-cell self-join quadratic IN ONE JOIN KEY —
join-key skew (one straggler task) on top of genuine output size. This
measures it the way tools/skew_experiment.py measured the tile join:

  - a Zipf-ish clustered point set: ``HOT_N`` points packed inside ONE
    grid cell at the join level (the "city center"), the rest uniform
    over a wide extent (~1 point per cell);
  - ``naive``  : AQE skew-join OFF — the hot cell's ~HOT_N² candidate
    pairs land in a single shuffle partition / single task;
  - ``aqe``    : AQE skew-join ON (the engine default) — runtime split
    of the oversized partition;
  - ``salted`` : explicit deterministic salting via
    ``radius_join(..., nsalt=32)`` — left side salt = hash(id) mod n,
    right side replicated ×n; output pinned ≡ unsalted by pytest and by
    construction shares q98's oracle semantics.

Deterministic input (id-hash jitter, no RNG state), so all modes count
the SAME pair set. Results table in BENCH/BASELINE.md ("radius_join
hotspot skew").

Usage: python tools/radius_skew_experiment.py {naive|aqe|salted} [n] [hot_n]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from osmcha_spark.session import get_spark  # noqa: E402

RADIUS = 0.01  # degrees -> join level 14 (cell edge ~0.011 deg)


def clustered_points(spark, n: int, hot_n: int):
    """Deterministic hotspot corpus: ids < hot_n jitter within ~0.8 of a
    cell edge around a fixed center (all in 1-4 adjacent level-14 cells);
    the rest spread uniformly over 20°x20° (~1.3M cells)."""
    u1 = (F.pmod(F.xxhash64(F.col("id") * 2 + 1), 1000000) / 1000000.0)
    u2 = (F.pmod(F.xxhash64(F.col("id") * 2 + 2), 1000000) / 1000000.0)
    hot = F.col("id") < hot_n
    # center chosen mid-cell so the 0.008-deg jitter square stays inside
    # one level-14 cell (edge 180/2^14 = 0.01098)
    cx, cy, spread = 13.0056, 47.0039, 0.008
    lon = F.when(hot, cx + (u1 - 0.5) * spread).otherwise((u1 - 0.5) * 20.0)
    lat = F.when(hot, cy + (u2 - 0.5) * spread).otherwise((u2 - 0.5) * 20.0)
    return spark.range(n).select(
        F.col("id"), lon.alias("lon"), lat.alias("lat")
    )


def run(mode: str, n: int, hot_n: int) -> None:
    conf = {
        "spark.ui.enabled": "false",
        "spark.ui.showConsoleProgress": "false",
        "spark.driver.memory": "24g",
        "spark.local.dir": "/dev/shm/spark-local",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force shuffle join
    }
    if mode == "naive":
        conf["spark.sql.adaptive.skewJoin.enabled"] = "false"
    spark = get_spark(
        master="local[32]", shuffle_partitions=64, extra_conf=conf
    )
    spark.sparkContext.setLogLevel("ERROR")
    from osmcha_spark.operators.knn import radius_join

    pts = clustered_points(spark, n, hot_n).persist()
    pts.count()
    nsalt = 32 if mode == "salted" else None
    j = radius_join(pts, RADIUS, nsalt=nsalt)
    ts = []
    rows = None
    for _ in range(2):
        t0 = time.time()
        rows = j.count()
        ts.append(time.time() - t0)
    print(
        f"RADIUS_SKEW mode={mode} n={n} hot_n={hot_n} "
        f"best={min(ts):.2f}s trials={[round(x, 2) for x in ts]} "
        f"pairs={rows}"
    )
    spark.stop()


if __name__ == "__main__":
    run(
        sys.argv[1],
        int(sys.argv[2]) if len(sys.argv) > 2 else 200_000,
        int(sys.argv[3]) if len(sys.argv) > 3 else 12_000,
    )
