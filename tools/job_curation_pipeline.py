"""spark-submit entry point #5: the LLM-curation funnel as a cluster
job — quality gate, exact dedup, benchmark decontamination, and
domain-mix sampling over the documents corpus, shipped the same way as
the other four jobs.

    python tools/make_pyfiles_zip.py dist/osmcha_spark.zip
    spark-submit --master local[8] \
        --py-files dist/osmcha_spark.zip \
        tools/job_curation_pipeline.py \
        --sf-dir /root/testdata/sf0.01 --checkpoint-root /tmp/curjob1

Stages (each checkpointed via StagedPipeline — a killed job resumed
with the same --checkpoint-root skips completed stages; per-stage row
counts land in <root>/_lineage/*.json):

    1. flags   — curation_funnel per-doc stage flags (q130's shape)
    2. funnel  — per-domain survival report (docs in, survivors per
                 gate, final kept + kept tokens)
    3. corpus  — the cleaned corpus itself (kept = 1), written
                 partitioned by source

Imports resolve ONLY from the shipped zip (no repo on sys.path): this
file proves the --py-files packaging covers the curation surface.
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
    ap.add_argument("--n-buckets", type=int, default=4096)
    args = ap.parse_args()

    spark = SparkSession.builder.appName(
        "osmcha-curation-pipeline"
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from osmcha_spark.checkpoint import StagedPipeline, config_hash
    from osmcha_spark.operators.curation import curation_funnel
    from osmcha_spark.operators.dedup import md5_long_col

    cfg = {"sf": args.sf_dir, "job": "curation-funnel",
           "n_buckets": args.n_buckets}
    pipe = StagedPipeline(
        spark, args.checkpoint_root, cfg_hash=config_hash(cfg)
    )

    docs = spark.read.parquet(
        os.path.join(args.sf_dir, "documents.parquet")
    )
    weights = spark.range(args.n_buckets).select(
        F.col("id").alias("bucket"),
        (F.col("id") % 211 - 105).cast("long").alias("weight"),
    )
    eval_set = docs.where(F.col("doc_id") % 10 == 0).select(
        "doc_id", F.expr("substring(text, 1, 240)").alias("text")
    )
    rates = docs.select("source").distinct().select(
        "source",
        (F.lit(1000) + F.lit(2000) * (md5_long_col(F.col("source")) % 4))
        .cast("long").alias("rate_bp"),
    )

    flags = pipe.stage(
        "flags",
        lambda: curation_funnel(
            docs, weights, args.n_buckets, eval_set, rates
        ),
    )
    funnel = pipe.stage(
        "funnel",
        lambda: flags.join(
            docs.select("doc_id", F.length("text").alias("n_chars")),
            "doc_id",
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("docs_in"),
            F.sum("q_kept").alias("pass_quality"),
            F.sum("dup_kept").alias("pass_dedup"),
            F.sum("decon_kept").alias("pass_decon"),
            F.sum("mix_kept").alias("pass_mix"),
            F.sum("kept").alias("kept"),
            F.sum(F.col("kept") * F.col("n_chars")).alias("kept_chars"),
        ),
        inputs=["flags"],
    )
    corpus = pipe.stage(
        "corpus",
        lambda: docs.join(
            flags.where(F.col("kept") == 1).select("doc_id"), "doc_id"
        ),
        inputs=["flags"],
    )

    summary = {
        "docs": docs.count(),
        "kept": corpus.count(),
        "per_domain": [r.asDict() for r in
                       funnel.orderBy("source").collect()],
        "lineage": pipe.report(),
    }
    print("JOB_RESULT " + json.dumps(summary, default=str))
    spark.stop()


if __name__ == "__main__":
    main()
