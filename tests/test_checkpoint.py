"""Checkpointed stage runner tests (SURVEY.md §2.1 S11, §7 step 8).

Key property: kill after stage k → rerun restarts at k+1 with identical
final output; lineage sidecars carry exact observed row counts.
"""

import json
import os

import pytest

from osmcha_spark.checkpoint import StagedPipeline, config_hash


@pytest.fixture()
def df10(spark):
    return spark.range(10).withColumnRenamed("id", "n")


def test_stage_writes_output_and_lineage(spark, df10, tmp_path):
    pipe = StagedPipeline(spark, str(tmp_path), cfg_hash="h1")
    out = pipe.stage("base", lambda: df10)
    assert out.count() == 10
    lin = pipe.lineage("base")
    assert lin["rows"] == 10
    assert lin["config_hash"] == "h1"
    assert os.path.exists(tmp_path / "base" / "_SUCCESS")


def test_resume_skips_valid_stage(spark, df10, tmp_path):
    pipe = StagedPipeline(spark, str(tmp_path), cfg_hash="h1")
    pipe.stage("base", lambda: df10)

    def boom():
        raise AssertionError("stage must be replayed, not rebuilt")

    out = StagedPipeline(spark, str(tmp_path), cfg_hash="h1").stage(
        "base", boom
    )
    assert out.count() == 10


def test_config_change_invalidates(spark, df10, tmp_path):
    StagedPipeline(spark, str(tmp_path), cfg_hash="h1").stage(
        "base", lambda: df10
    )
    calls = []

    def rebuild():
        calls.append(1)
        return df10

    StagedPipeline(spark, str(tmp_path), cfg_hash="h2").stage("base", rebuild)
    assert calls == [1]


def test_kill_after_stage_k_resumes(spark, df10, tmp_path):
    """Run dies in stage 2 → rerun replays stage 1, completes stage 2,
    and the output matches a fresh end-to-end run."""
    root_killed = str(tmp_path / "killed")
    root_fresh = str(tmp_path / "fresh")

    def stage2_of(base_df):
        return base_df.selectExpr("n", "n * n as sq")

    pipe = StagedPipeline(spark, root_killed, cfg_hash="h")
    base = pipe.stage("s1", lambda: df10)
    with pytest.raises(RuntimeError):
        pipe.stage("s2", lambda: (_ for _ in ()).throw(RuntimeError("kill")),
                   inputs=["s1"])

    # restart
    pipe2 = StagedPipeline(spark, root_killed, cfg_hash="h")
    s1_calls = []
    base2 = pipe2.stage("s1", lambda: s1_calls.append(1) or df10)
    out = pipe2.stage("s2", lambda: stage2_of(base2), inputs=["s1"])
    assert s1_calls == []  # stage 1 replayed from checkpoint

    fresh = StagedPipeline(spark, root_fresh, cfg_hash="h")
    want = fresh.stage(
        "s2", lambda: stage2_of(fresh.stage("s1", lambda: df10)),
        inputs=["s1"],
    )
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_upstream_rerun_invalidates_downstream(spark, df10, tmp_path):
    pipe = StagedPipeline(spark, str(tmp_path), cfg_hash="h")
    base = pipe.stage("s1", lambda: df10)
    pipe.stage("s2", lambda: base.selectExpr("n + 1 as m"), inputs=["s1"])

    # Force s1 to re-run (e.g. new input data): bump its lineage timestamp.
    lin_path = os.path.join(str(tmp_path), "_lineage", "s1.json")
    with open(lin_path) as f:
        lin = json.load(f)
    lin["written_at"] = lin["written_at"] + 10_000
    with open(lin_path, "w") as f:
        json.dump(lin, f)

    calls = []
    pipe.stage(
        "s2",
        lambda: calls.append(1) or base.selectExpr("n + 1 as m"),
        inputs=["s1"],
    )
    assert calls == [1]


def test_config_hash_stable():
    assert config_hash({"a": 1, "b": [2, 3]}) == config_hash(
        {"b": [2, 3], "a": 1}
    )
    assert config_hash({"a": 1}) != config_hash({"a": 2})
