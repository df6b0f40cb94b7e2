"""End-to-end parity: engine analyse() vs the pure-Python oracle over every
fixture changeset, plus the reference's own pinned assertions."""

import datetime

import pytest
from pyspark.sql import functions as F

from osmcha_spark.config import OUTPUT_COLUMNS, RulesConfig
from osmcha_spark.fixtures import ACTION_COUNTS, USERS, changesets_rows
from osmcha_spark.plans.analyse import action_counts, analyse
from tests import oracle_py

COUNTS = {cid: (c, m, d) for cid, c, m, d in ACTION_COUNTS}
USERMAP = {u: (c, b) for u, c, b in USERS}


@pytest.fixture(scope="module")
def result(spark, tables):
    df = analyse(
        tables["changesets"].select(
            "id", "user", "uid", "created_at", "comments_count",
            "min_lon", "min_lat", "max_lon", "max_lat", "tags",
        ),
        action_counts(tables["actions"]),
        tables["users"],
    )
    return {r["id"]: r.asDict() for r in df.collect()}


def test_output_schema(result):
    row = next(iter(result.values()))
    assert list(row.keys()) == OUTPUT_COLUMNS
    assert len(row) == 17


def test_full_parity_vs_python_oracle(result):
    rows = changesets_rows()
    assert len(result) == len(rows)
    for raw in rows:
        exp = oracle_py.expected_output(raw, COUNTS, USERMAP)
        got = result[raw["id"]]
        for key in OUTPUT_COLUMNS:
            g, e = got[key], exp[key]
            if key == "suspicion_reasons":
                assert sorted(g) == sorted(e), (raw["id"], g, e)
            elif key == "date":
                assert g.replace(tzinfo=None) == e, (raw["id"], g, e)
            elif key == "bbox":
                assert _norm_wkt(g) == _norm_wkt(e), (raw["id"], g, e)
            else:
                assert g == e, (raw["id"], key, g, e)


def _norm_wkt(wkt: str):
    if wkt == "POLYGON EMPTY":
        return wkt
    inner = wkt[len("POLYGON (("):-2]
    return [
        tuple(round(float(v), 9) for v in p.split(" "))
        for p in inner.split(", ")
    ]


# --- pinned reference assertions (tests/test_mod.py) -----------------------

def test_first_fixture_row(result):
    r = result[31982803]
    assert r["user"] == "GarrettB"
    assert r["uid"] == "352373"
    assert r["comment"] == "Added Emerald Pool Waterfall"
    assert r["comments_count"] == 0
    assert r["editor"] == "Potlatch 2"
    assert _norm_wkt(r["bbox"]) == _norm_wkt(
        "POLYGON ((-71.0646843 44.2371354, -71.0048652 44.2371354, "
        "-71.0048652 44.2430624, -71.0646843 44.2430624, "
        "-71.0646843 44.2371354))"
    )


def test_word_scenarios(result):
    assert "suspect_word" in result[1001]["suspicion_reasons"]
    assert "suspect_word" in result[1002]["suspicion_reasons"]
    assert "suspect_word" in result[1003]["suspicion_reasons"]
    assert result[1004]["is_suspect"] is False
    assert result[1005]["is_suspect"] is False
    assert result[1006]["is_suspect"] is False
    assert result[1007]["is_suspect"] is False


def test_editor_matrix(result):
    for cid in (1010, 1011, 1012, 1013):
        assert result[cid]["powerfull_editor"] is True
    for cid in (1014, 1015, 1016):
        assert result[cid]["powerfull_editor"] is False
        assert result[cid]["is_suspect"] is False
    assert result[1017]["powerfull_editor"] is True
    assert "Software editor was not declared" in result[1017][
        "suspicion_reasons"
    ]


def test_count_rules(result):
    assert result[32663070]["create"] == 8
    assert result[32663070]["modify"] == 3
    assert result[32663070]["delete"] == 2
    assert result[32663070]["is_suspect"] is False
    assert "possible import" in result[10013029]["suspicion_reasons"]
    assert "mass modification" in result[19863853]["suspicion_reasons"]
    assert "mass deletion" in result[31450443]["suspicion_reasons"]
    assert "mass deletion" in result[45901540]["suspicion_reasons"]
    assert result[45082154]["is_suspect"] is False
    assert "possible import" in result[45862717]["suspicion_reasons"]
    assert result[34495147]["is_suspect"] is False  # redacted
    assert result[45632780]["suspicion_reasons"] == ["suspect_word"]
    assert result[31984168]["is_suspect"] is False


def test_user_rules(result):
    assert "User has multiple blocks" in result[1030]["suspicion_reasons"]
    assert result[1031]["suspicion_reasons"] == ["New mapper"]
    assert result[1032]["is_suspect"] is False
    assert "New mapper" in result[10013029]["suspicion_reasons"]


def test_warning_tags(result):
    r = result[1021]["suspicion_reasons"]
    for reason in ("Almost junction", "Missing role", "Missing tag",
                   "Private information", "Mismatched geometry",
                   "Unsquare corners"):
        assert reason in r
    assert "Very close points" in result[1022]["suspicion_reasons"]
    assert "Crossing ways" in result[1023]["suspicion_reasons"]
    r = result[1024]["suspicion_reasons"]
    for reason in ("Disconnected way", "Generic name", "Impossible oneway",
                   "suspect_word", "Outdated tags"):
        assert reason in r
    assert result[1025]["is_suspect"] is False
    assert result[1026]["is_suspect"] is False


def test_review_requested(result):
    assert "Review requested" in result[1020]["suspicion_reasons"]


def test_metadata(result):
    assert result[1041]["metadata"] == {
        "build": "2.3-650-gad99430", "version": "2.3",
    }
    assert result[1021]["metadata"]["host"] == (
        "https://www.openstreetmap.org/edit"
    )
    assert "warnings:missing_role" in result[1021]["metadata"]
    assert "host" not in result[1027]["metadata"]  # empty host dropped
    assert result[1040]["bbox"] == "POLYGON EMPTY"


def test_custom_thresholds(spark, tables):
    """Threshold-override variants (tests/test_mod.py:523-588)."""
    def run(cfg):
        df = analyse(
            tables["changesets"], action_counts(tables["actions"]),
            tables["users"], cfg,
        )
        return {r["id"]: r.asDict() for r in df.collect()}

    r = run(RulesConfig(create_threshold=2000))
    assert r[10013029]["suspicion_reasons"] == ["New mapper"]

    r = run(RulesConfig(modify_threshold=1200))
    assert r[19863853]["is_suspect"] is False

    r = run(RulesConfig(delete_threshold=100))
    assert r[45901540]["is_suspect"] is False

    r = run(RulesConfig(percentage=0.5))
    assert "mass modification" in r[45082154]["suspicion_reasons"]

    r = run(RulesConfig(top_threshold=1100))
    assert r[45862717]["is_suspect"] is False


def test_parity_words_path(spark, tables):
    """The pandas-UDF comment rule agrees with the fast Column path."""
    fast = analyse(
        tables["changesets"], action_counts(tables["actions"]),
        tables["users"], parity_words=False,
    ).select("id", "is_suspect", F.array_sort("suspicion_reasons").alias("r"))
    slow = analyse(
        tables["changesets"], action_counts(tables["actions"]),
        tables["users"], parity_words=True,
    ).select("id", "is_suspect", F.array_sort("suspicion_reasons").alias("r"))
    assert fast.exceptAll(slow).count() == 0
    assert slow.exceptAll(fast).count() == 0
