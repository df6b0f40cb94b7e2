"""Checkpointed stage runner: resumable writes + lineage (SURVEY.md §2.1 S11).

engine-only (no reference counterpart — mandated by BASELINE.json
north_rule: "resumable from checkpoint with per-partition lineage + metrics").

Model: a pipeline is a DAG of named stages; each stage materializes one
parquet dataset under ``<root>/<stage>/`` and one lineage sidecar under
``<root>/_lineage/<stage>.json`` recording

- ``rows`` — exact output row count captured *during the write* via
  ``df.observe`` (an ``Observation`` accumulator: zero extra scan, exact
  even under task retries because Spark de-dupes accumulator updates per
  successful task),
- ``inputs`` — upstream stage names / paths (the lineage edge),
- ``config_hash`` — hash of the rule/engine config the stage ran under,
- ``app_id``, ``wall_s``, ``written_at`` — provenance.

Resume: a re-run skips any stage whose output has a ``_SUCCESS`` marker AND
whose lineage validates (sidecar present, config hash matches, upstream
lineage unchanged since it was written). A killed run therefore restarts
at the first incomplete stage. *Within* a stage, task-level atomicity is
Spark's file output committer (per-partition task attempts write to
``_temporary`` and commit atomically), so a stage is either absent or
complete — per-partition restart inside a stage is the committer's job,
cross-stage restart is ours.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

LINEAGE_DIR = "_lineage"


def config_hash(obj: object) -> str:
    """Stable hash of any JSON-serializable config object."""
    payload = json.dumps(obj, sort_keys=True, default=lambda o: vars(o))
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


class StagedPipeline:
    """Named-stage runner with skip-on-valid-checkpoint semantics.

    Usage::

        pipe = StagedPipeline(spark, "/data/run1", cfg_hash=config_hash(cfg))
        cs = pipe.stage("parse", lambda: read_replication(spark, in_dir))
        out = pipe.stage("analyse", lambda: analyse(cs, counts, users),
                         inputs=["parse"])

    Each ``stage`` call either *replays* (reads the committed parquet —
    build fn never invoked) or *runs* (builds, writes, records lineage).
    Either way the caller gets a DataFrame backed by the materialized
    parquet, so downstream stages cut lineage at the checkpoint — a failed
    downstream stage never recomputes an upstream one.
    """

    def __init__(
        self, spark: SparkSession, root: str, cfg_hash: str = ""
    ) -> None:
        self.spark = spark
        self.root = root
        self.cfg_hash = cfg_hash
        os.makedirs(os.path.join(root, LINEAGE_DIR), exist_ok=True)

    # -- paths ------------------------------------------------------------
    def _out(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _lineage_path(self, name: str) -> str:
        return os.path.join(self.root, LINEAGE_DIR, f"{name}.json")

    def lineage(self, name: str) -> dict | None:
        try:
            with open(self._lineage_path(name)) as f:
                return json.load(f)
        except (OSError, json.JSONDecodeError):
            return None

    # -- validity ---------------------------------------------------------
    def is_valid(self, name: str, inputs: list[str]) -> bool:
        """Committed output + matching lineage ⇒ stage can be replayed."""
        if not os.path.exists(os.path.join(self._out(name), "_SUCCESS")):
            return False
        lin = self.lineage(name)
        if lin is None or lin.get("config_hash") != self.cfg_hash:
            return False
        # Upstream must not have been re-run after this stage was written.
        for up in inputs:
            up_lin = self.lineage(up)
            if up_lin is None:
                continue  # external input (a path, not a stage)
            if up_lin.get("written_at", 0) > lin.get("written_at", 0):
                return False
        return True

    # -- run --------------------------------------------------------------
    def stage(
        self,
        name: str,
        build: Callable[[], DataFrame],
        inputs: list[str] | None = None,
        partition_by: list[str] | None = None,
    ) -> DataFrame:
        inputs = inputs or []
        out = self._out(name)
        if self.is_valid(name, inputs):
            return self.spark.read.parquet(out)

        t0 = time.monotonic()
        obs = Observation(f"stage_{name}")
        df = build().observe(obs, F.count(F.lit(1)).alias("rows"))
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(out)

        lin = {
            "stage": name,
            "rows": obs.get["rows"],
            "inputs": inputs,
            "output": out,
            "config_hash": self.cfg_hash,
            "app_id": self.spark.sparkContext.applicationId,
            "wall_s": round(time.monotonic() - t0, 3),
            "written_at": time.time(),
        }
        tmp = self._lineage_path(name) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(lin, f, indent=1)
        os.replace(tmp, self._lineage_path(name))
        return self.spark.read.parquet(out)

    def report(self) -> list[dict]:
        """All recorded lineage entries, stage-name sorted."""
        d = os.path.join(self.root, LINEAGE_DIR)
        out = []
        for fn in sorted(os.listdir(d)):
            if fn.endswith(".json"):
                with open(os.path.join(d, fn)) as f:
                    out.append(json.load(f))
        return out
