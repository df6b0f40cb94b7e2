"""Driver-contract tests: entry() smoke + Spark-vs-DuckDB oracle compare
for every queries() entry at sf0.001 (the tools/check_oracles.py comparator
is the same logic the driver's gate applies)."""

import os

import duckdb
import pytest

import __spark_entry__ as entry_mod
from tools.check_oracles import rows_to_multiset

SF_DIR = "/root/testdata/sf0.001"


def _duck():
    con = duckdb.connect()
    for name in ("region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "documents", "embeddings"):
        path = os.path.join(SF_DIR, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert len(df.columns) == 17


def test_queries_have_oracles():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    # Since r4 EVERY query has an oracle: q24 (the last sanctioned
    # oracle-less entry) gained a mirrored-candidate oracle via the
    # engine-pinned Python xxhash64 mirror (VERDICT r3 item 2). A
    # regression dropping any oracle must fail here (ADVICE r1).
    assert set(qs) - set(oracles) == set()
    assert len(qs) >= 100


@pytest.mark.parametrize(
    "name",
    ["q01_analyse", "q06_knn", "q12_ann", "q16_fingerprint",
     "q19_phash_neardup", "q20_analyse_fixture", "q21_aoi_fixture",
     "q25_decode_phash", "q27_salted_tile_join", "q28_aoi_polygon",
     "q29_ivf_ann"],
)
def test_oracle_match(spark, name):
    """Subset of the full sweep (tools/check_oracles.py covers every
    entry); these are the semantically riskiest queries."""
    fn = entry_mod.queries()[name]
    sdf = fn(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    con = _duck()
    res = con.execute(entry_mod.oracle_sql()[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols)
    assert len(srows) == len(drows)
    assert rows_to_multiset(scols, srows) == rows_to_multiset(dcols, drows)
