"""Table loaders.

Iceberg is the designed catalog (S10); the sandbox ships no Iceberg runtime
jar, so the loader falls back to plain parquet paths transparently. Either
way the read is schema-explicit and prune-friendly: always pass the columns
you need to ``load_table`` so the scan's ReadSchema stays minimal.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def load_table(
    spark: SparkSession,
    name: str,
    base: str,
    columns: list[str] | None = None,
) -> DataFrame:
    """Load ``name`` either from an Iceberg catalog table ``base.name``
    (when ``base`` has no path separator and the catalog resolves) or from
    ``{base}/{name}.parquet``."""
    if os.sep not in base and "/" not in base:
        try:
            df = spark.read.table(f"{base}.{name}")
            return df.select(*columns) if columns else df
        except Exception:
            pass
    df = spark.read.parquet(os.path.join(base, f"{name}.parquet"))
    return df.select(*columns) if columns else df
