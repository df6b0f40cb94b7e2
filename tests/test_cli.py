"""CLI sink golden tests — reference tests/test_cli.py:7-18 re-stated
offline (counts come from the fixture actions table instead of the live
API; same documented values)."""

from osmcha_spark.cli import run


def test_cli_not_suspect(spark, data_dir):
    lines = run(31984168, data_dir, spark)
    assert lines[0] == "Created: 0. Modified: 5. Deleted: 0"
    assert lines[1] == "The changeset 31984168 is not suspect!"


def test_cli_suspect(spark, data_dir):
    lines = run(45632780, data_dir, spark)
    assert lines[0] == "Created: 47. Modified: 0. Deleted: 0"
    assert lines[1].startswith("The changeset 45632780 is suspect! Reasons:")
    assert "suspect_word" in lines[1]
