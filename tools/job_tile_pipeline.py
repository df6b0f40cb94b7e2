"""spark-submit entry point: the flagship tile+analyse pipeline as a
cluster job (the deployment shape the engine is designed for).

    python tools/make_pyfiles_zip.py dist/osmcha_spark.zip
    spark-submit --master local[8] \
        --py-files dist/osmcha_spark.zip \
        tools/job_tile_pipeline.py \
        --sf-dir /root/testdata/sf0.01 --images 20000 \
        --checkpoint-root /tmp/tilejob1

Deliberately imports osmcha_spark ONLY from the shipped zip (no repo on
sys.path): this file proves the --py-files packaging is complete. Stages
run through the checkpointed StagedPipeline, so a killed job re-submitted
with the same --checkpoint-root resumes at the first incomplete stage, and
each stage's row counts land in <root>/_lineage/*.json.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--images", type=int, default=20000)
    ap.add_argument("--level", type=int, default=7)
    ap.add_argument("--checkpoint-root", required=True)
    args = ap.parse_args()

    spark = SparkSession.builder.appName("osmcha-tile-pipeline").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    # imports resolve from --py-files; no filesystem path games
    from osmcha_spark import synth
    from osmcha_spark.checkpoint import StagedPipeline, config_hash
    from osmcha_spark.geo.cells import cell_col
    from osmcha_spark.images.corpus import generate_images
    from osmcha_spark.operators.tiles import tile_changeset_join
    from osmcha_spark.plans.analyse import analyse

    cfg = {"images": args.images, "level": args.level, "sf": args.sf_dir}
    pipe = StagedPipeline(
        spark, args.checkpoint_root, cfg_hash=config_hash(cfg)
    )

    n_parts = max(4 * spark.sparkContext.defaultParallelism, 16)

    tiles = pipe.stage(
        "tiles",
        lambda: generate_images(
            spark, args.images, partitions=n_parts
        ).select(
            "image_id", "phash", "lon", "lat",
            cell_col(F.col("lon"), F.col("lat"), args.level).alias("cell"),
        ),
    )

    def build_assign():
        cs = synth.changesets_df(spark, args.sf_dir).where(
            F.col("min_lon").isNotNull()
        )
        return tile_changeset_join(
            tiles.select("cell", "image_id"), cs, args.level
        ).groupBy("changeset_id").agg(
            F.count(F.lit(1)).alias("n_tiles"),
            F.min("image_id").alias("min_tile"),
        )

    assign = pipe.stage("assignments", build_assign, inputs=["tiles"])

    def build_analysed():
        cs = synth.changesets_df(spark, args.sf_dir)
        counts = spark.sql(synth.actions_counts_sql(synth.SPARK))
        users = spark.sql(synth.users_sql(synth.SPARK))
        return analyse(cs, counts, users)

    analysed = pipe.stage("analysed", build_analysed)

    summary = {
        "assignments": assign.count(),
        "suspect": analysed.where(F.col("is_suspect")).count(),
        "lineage": pipe.report(),
    }
    print("JOB_RESULT " + json.dumps(summary, default=str))
    spark.stop()


if __name__ == "__main__":
    main()
