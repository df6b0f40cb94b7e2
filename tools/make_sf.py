"""Mint a larger scale-factor dataset from a driver sf dir by
deterministic key-shifted replication — bench-evidence infrastructure
(VERDICT r4 item 8: the headline suite had only ever run at sf0.1; a 10x
point catches constant-vs-linear mispredictions the Amdahl fit implies).

Each fact table becomes `factor` copies with primary keys AND the
foreign keys that must join within a copy shifted by i * 10^ceil(log10
(max_key)+1) — so per-copy join fan-outs match the source exactly and
the result is a valid, self-consistent corpus `factor` times the rows.
Fixed dims (region, nation, part) copy once: scale factors grow facts,
not reference data. No RNG anywhere: the output is a pure function of
the input, reproducible run-to-run (the repo's synth discipline).

Usage: python tools/make_sf.py <src_sf_dir> <dest_dir> <factor>
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# table -> columns that shift together per copy, keyed by the id space
# they live in (primary keys and the FKs that join against them)
SHIFT_SPACES: dict[str, list[tuple[str, str]]] = {
    "orders": [("okey", "o_orderkey"), ("ckey", "o_custkey")],
    "customer": [("ckey", "c_custkey")],
    "supplier": [("skey", "s_suppkey")],
    "lineitem": [("okey", "l_orderkey"), ("skey", "l_suppkey")],
    "events": [("ekey", "event_id"), ("ukey", "user_id")],
    "documents": [("dkey", "doc_id")],
    "embeddings": [("vkey", "vec_id")],
}
COPY_ONCE = ("region", "nation", "part")


def _next_pow10(n: int) -> int:
    p = 1
    while p <= n:
        p *= 10
    return p


def make_sf(spark, src: str, dest: str, factor: int) -> None:
    from pyspark.sql import functions as F

    os.makedirs(dest, exist_ok=True)
    # one shift stride per id SPACE, shared by every table using it so
    # FK joins stay copy-local
    strides: dict[str, int] = {}
    loaded = {}
    for name, cols in SHIFT_SPACES.items():
        path = os.path.join(src, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = spark.read.parquet(path)
        loaded[name] = df
        for space, col in cols:
            mx = df.agg(F.max(F.col(col))).first()[0] or 0
            strides[space] = max(strides.get(space, 0), _next_pow10(mx))

    for name, df in loaded.items():
        out = None
        for i in range(factor):
            copy = df
            for space, col in SHIFT_SPACES[name]:
                copy = copy.withColumn(
                    col, F.col(col) + F.lit(i * strides[space])
                )
            out = copy if out is None else out.unionByName(copy)
        n_parts = max(8, 4 * factor)
        (out.repartition(n_parts)
            .write.mode("overwrite")
            .parquet(os.path.join(dest, f"{name}.parquet")))
        print(f"  {name}: x{factor}", flush=True)

    for name in COPY_ONCE:
        path = os.path.join(src, f"{name}.parquet")
        if os.path.exists(path):
            spark.read.parquet(path).write.mode("overwrite").parquet(
                os.path.join(dest, f"{name}.parquet")
            )
            print(f"  {name}: x1 (fixed dim)", flush=True)


def main() -> None:
    src, dest, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    from osmcha_spark.session import get_spark

    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        app_name="make-sf",
        extra_conf={"spark.ui.enabled": "false",
                    "spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    make_sf(spark, src, dest, factor)
    print(f"minted {dest} = {src} x {factor}")


if __name__ == "__main__":
    main()
