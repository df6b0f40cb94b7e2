"""ANN ladder recall evaluation — recall@k of every approximate tier
against ITS OWN metric's exact baseline, on the real embeddings table.

Dot-product tiers (IVF probes, sign-LSH) score against
:func:`brute_topk`; the L2 tier (PQ/ADC) against :func:`brute_topk_l2` —
comparing an L2 method to a dot baseline would conflate metric mismatch
with quantization loss.

Everything here is deterministic (integer quantization, id tiebreaks,
RNG-free codebooks), so the recalls are exact repeatable numbers, not
samples — tests/test_ann_recall.py pins them as floors.

Usage: python tools/ann_recall.py  → one JSON line + BENCH/ann_recall.json
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from osmcha_spark.operators.similarity import (  # noqa: E402
    brute_topk,
    brute_topk_l2,
    ivf_topk,
    lsh_topk,
    pq_topk,
)
from osmcha_spark.session import get_spark  # noqa: E402

K = 10
N_QUERIES = 50


def _topk_sets(df) -> dict[int, frozenset[int]]:
    out: dict[int, set[int]] = {}
    for r in df.select("query_id", "neighbor_id").collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return {q: frozenset(s) for q, s in out.items()}


def recall_at_k(approx, exact) -> float:
    """Mean |approx ∩ exact| / |exact| over queries (missing query → 0)."""
    a, e = _topk_sets(approx), _topk_sets(exact)
    total = sum(len(a.get(q, frozenset()) & nb) / len(nb)
                for q, nb in e.items())
    return total / len(e)


def run(spark, sf_dir: str) -> dict:
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    q = emb.where(F.col("vec_id") < N_QUERIES)

    dot_truth = brute_topk(emb, q, k=K)
    l2_truth = brute_topk_l2(emb, q, k=K)

    out = {"k": K, "n_queries": N_QUERIES, "sf_dir": sf_dir}
    for nprobe in (1, 2, 4, 8):
        out[f"ivf_nprobe{nprobe}"] = round(
            recall_at_k(ivf_topk(emb, q, k=K, nprobe=nprobe), dot_truth), 4
        )
    out["lsh_12bit"] = round(
        recall_at_k(lsh_topk(emb, q, k=K, n_bits=12), dot_truth), 4
    )
    out["pq_m8"] = round(
        recall_at_k(
            pq_topk(emb, q, k=K, m=8, dim=64, centroid_stride=50), l2_truth
        ),
        4,
    )
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        app_name="ann-recall",
        extra_conf={"spark.sql.shuffle.partitions": "32",
                    "spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    res = run(spark, sf_dir)
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "BENCH", "ann_recall.json"), "w") as f:
        f.write(json.dumps(res, indent=2) + "\n")
    print(json.dumps(res))


if __name__ == "__main__":
    main()
