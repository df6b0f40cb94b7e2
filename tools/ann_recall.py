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
    clustered_embeddings,
    ivf_topk,
    ivfpq_topk,
    lsh_topk,
    pq_refine_topk,
    pq_topk,
    train_centroids,
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


def _ladder(emb, q, label: str) -> dict:
    dot_truth = brute_topk(emb, q, k=K)
    l2_truth = brute_topk_l2(emb, q, k=K)

    out = {"k": K, "n_queries": N_QUERIES, "corpus": label}
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
    for shortlist in (25, 100):
        out[f"pq_m8_refine{shortlist}"] = round(
            recall_at_k(
                pq_refine_topk(emb, q, k=K, shortlist=shortlist, m=8,
                               dim=64, centroid_stride=50),
                l2_truth,
            ),
            4,
        )
    for nprobe in (2, 8):
        out[f"ivfpq_nprobe{nprobe}"] = round(
            recall_at_k(
                ivfpq_topk(emb, q, k=K, coarse_stride=25, nprobe=nprobe,
                           m=8, dim=64, pq_stride=50),
                l2_truth,
            ),
            4,
        )
        out[f"ivfpq_residual_nprobe{nprobe}"] = round(
            recall_at_k(
                ivfpq_topk(emb, q, k=K, coarse_stride=25, nprobe=nprobe,
                           m=8, dim=64, pq_stride=50, residual=True),
                l2_truth,
            ),
            4,
        )
    return out


def run(spark, sf_dir: str) -> dict:
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    q = emb.where(F.col("vec_id") < N_QUERIES)
    out = _ladder(emb, q, "driver embeddings.parquet (near-random)")
    out["sf_dir"] = sf_dir
    return out


def run_clustered(spark, n: int = 2000) -> dict:
    """The same ladder on the structured mixture-of-centers corpus
    (similarity.py:clustered_embeddings) — the regime real embedding
    corpora live in, where the coarse index actually helps and residual
    coding beats original-vector coding (VERDICT r3 item 6)."""
    emb = clustered_embeddings(spark, n=n).persist()
    emb.count()
    q = emb.where(F.col("vec_id") < N_QUERIES)
    out = _ladder(emb, q, f"clustered_embeddings(n={n}, 64 centers)")
    # trained-codebook regime (r5, VERDICT r4 item 5): Lloyd-train the
    # coarse quantizer (train_centroids) and re-run both IVF-PQ variants
    # against it — the deployment q101's docstring said residual coding
    # was FOR. Measured outcome (n=2000): residual 0.53-0.54 vs
    # original-vector 0.36-0.38 recall@10 — training the coarse stage
    # flips the r4 sampled-codebook negative result, exactly the
    # classical prediction (good centroids → residuals are small-range
    # jitter the shared codebook can finally cover).
    l2_truth = brute_topk_l2(emb, q, k=K)
    cents = train_centroids(emb, centroid_stride=25, iters=8)
    for nprobe in (2, 8):
        for res, lbl in ((False, ""), (True, "_residual")):
            out[f"ivfpq{lbl}_trained_nprobe{nprobe}"] = round(
                recall_at_k(
                    ivfpq_topk(emb, q, k=K, nprobe=nprobe, m=8, dim=64,
                               pq_stride=50, residual=res, cents=cents),
                    l2_truth,
                ),
                4,
            )
    emb.unpersist()
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
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res = run(spark, sf_dir)
    with open(os.path.join(here, "BENCH", "ann_recall.json"), "w") as f:
        f.write(json.dumps(res, indent=2) + "\n")
    print(json.dumps(res))
    resc = run_clustered(spark)
    with open(os.path.join(here, "BENCH",
                           "ann_recall_clustered.json"), "w") as f:
        f.write(json.dumps(resc, indent=2) + "\n")
    print(json.dumps(resc))


if __name__ == "__main__":
    main()
