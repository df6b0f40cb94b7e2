"""spark-submit entry point #2: the training-data dedup ladder as a
cluster job — the LLM-corpus side of the engine deployed the same way as
the tile pipeline.

    python tools/make_pyfiles_zip.py dist/osmcha_spark.zip
    spark-submit --master local[8] \
        --py-files dist/osmcha_spark.zip \
        tools/job_dedup_pipeline.py \
        --sf-dir /root/testdata/sf0.01 --checkpoint-root /tmp/dedupjob1

Stages (each checkpointed via StagedPipeline — a killed job resumed with
the same --checkpoint-root skips completed stages; per-stage row counts
land in <root>/_lineage/*.json):

    1. exact      — md5 group-by exact dedup (representatives + copies)
    2. simhash    — 64-bit SimHash signatures
    3. pairs      — banded near-dup pairs (exact Hamming ≤ 3)
    4. clusters   — connected components → keep-canonical decision

Imports resolve ONLY from the shipped zip (no repo on sys.path): this
file proves the --py-files packaging covers the whole dedup surface.
"""

from __future__ import annotations

import argparse
import json
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--checkpoint-root", required=True)
    args = ap.parse_args()

    spark = SparkSession.builder.appName("osmcha-dedup-pipeline").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from osmcha_spark.checkpoint import StagedPipeline, config_hash
    from osmcha_spark.operators.components import dedup_keep_canonical
    from osmcha_spark.operators.dedup import exact_dedup, simhash
    from osmcha_spark.operators.dedup_images import phash_near_dup_pairs

    cfg = {"sf": args.sf_dir, "job": "dedup-ladder"}
    pipe = StagedPipeline(
        spark, args.checkpoint_root, cfg_hash=config_hash(cfg)
    )

    docs_path = os.path.join(args.sf_dir, "documents.parquet")
    docs = spark.read.parquet(docs_path)

    exact = pipe.stage("exact", lambda: exact_dedup(docs))
    sims = pipe.stage("simhash", lambda: simhash(docs))
    pairs = pipe.stage(
        "pairs",
        lambda: phash_near_dup_pairs(
            sims, max_hamming=3, id_col="doc_id", phash_col="simhash"
        ).select("a", "b"),
        inputs=["simhash"],
    )
    clusters = pipe.stage(
        "clusters",
        lambda: dedup_keep_canonical(docs, pairs),
        inputs=["pairs"],
    )

    summary = {
        "docs": docs.count(),
        "exact_groups": exact.count(),
        "near_dup_pairs": pairs.count(),
        "kept_canonical": clusters.where(F.col("is_canonical")).count(),
        "lineage": pipe.report(),
    }
    print("JOB_RESULT " + json.dumps(summary, default=str))
    spark.stop()


if __name__ == "__main__":
    main()
