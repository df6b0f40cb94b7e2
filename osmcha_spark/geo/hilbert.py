"""Hilbert-curve cell keys — the locality-better alternative to the
Morton/Z-order key (geo/cells.py) for LAYOUT clustering.

Morton interleaving is the right key for PREDICATE math (a coarse
cell's descendants are one contiguous range — cells.py's
cell_ranges_for_rect lives on that), but its curve jumps: two
lon-adjacent cells can sit 2^level apart in key order, so a square AOI
over a Morton-clustered table touches more files than it has to. The
Hilbert curve visits every cell of the 2^level × 2^level grid in
UNIT-STEP adjacency (each consecutive key is a grid neighbor — no
jumps), which is why Iceberg/Delta offer hilbert clustering next to
zorder for file layout. The tradeoff is honest: Hilbert keys buy
file-stat locality (min/max boxes per file are tighter), Morton keys
buy closed-form range enumeration; this module provides the former,
cells.py keeps the latter, and BENCH/hilbert_locality.json measures
the difference on equal terms (files touched per random AOI under
identical stats pruning).

Algorithm: the standard xy→d bit fold (Wikipedia "Hilbert curve",
public domain): per bit plane s = 2^(L−1)..1, accumulate
``s²·((3·rx) xor ry)`` and rotate/flip the remaining coordinates.
The fold is a Catalyst ``aggregate`` over the bit planes — one JVM
expression tree, no UDF — and the DuckDB mirror folds the identical
lambda via ``list_reduce`` (q134's fold discipline), so the q193
oracle checks VALUES. A pure-Python reference (pytest) pins
bijectivity and unit-step adjacency on the full grid.

Reference counterpart: none (osmcha has no layout layer); engine-
mandated, same as the rest of the storage-layout family (SURVEY §2.11
layout rungs R66/R120).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hilbert_py(level: int, x: int, y: int) -> int:
    """Driver-side / test reference — the same fold, plain Python."""
    d = 0
    s = 1 << (int(level) - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def hilbert_col(x: Column, y: Column, level: int) -> Column:
    """Hilbert key of integer grid coords in [0, 2^level) — a Catalyst
    ``aggregate`` over the bit planes (accumulator struct (d, x, y);
    the rotation makes each plane depend on the last, hence a fold,
    not a per-bit map)."""
    lvl = int(level)
    planes = F.expr(
        f"transform(sequence({lvl - 1}, 0, -1), i -> shiftleft(1L, i))"
    )
    init = F.struct(
        F.lit(0).cast("long").alias("d"),
        x.cast("long").alias("x"),
        y.cast("long").alias("y"),
    )

    def step(acc, s):
        rx = F.when(acc["x"].bitwiseAND(s) > 0, F.lit(1)) \
            .otherwise(F.lit(0)).cast("long")
        ry = F.when(acc["y"].bitwiseAND(s) > 0, F.lit(1)) \
            .otherwise(F.lit(0)).cast("long")
        d2 = acc["d"] + s * s * (rx * 3).bitwiseXOR(ry)
        nx = F.when(
            ry == 0,
            F.when(rx == 1, s - 1 - acc["y"]).otherwise(acc["y"]),
        ).otherwise(acc["x"])
        ny = F.when(
            ry == 0,
            F.when(rx == 1, s - 1 - acc["x"]).otherwise(acc["x"]),
        ).otherwise(acc["y"])
        return F.struct(d2.alias("d"), nx.alias("x"), ny.alias("y"))

    return F.aggregate(planes, init, step).getField("d")


def hilbert_steps_sql(source: str, x_col: str, y_col: str, level: int,
                      carry_cols: list[str]) -> str:
    """DuckDB mirror of :func:`hilbert_col` — the fold UNROLLED into
    one nested subquery per bit plane (unique column names per step,
    so each plane reads the previous plane's columns). Returns a full
    SELECT producing ``carry_cols`` + ``h``.

    Why not ``list_reduce`` (the q134 fold idiom): DuckDB 1.0's
    list_reduce mis-lanes ROW-DEPENDENT accumulators at vector width —
    on a 256-row input every other row folds its NEIGHBOR's init
    struct (measured: single rows and 2-row batches are correct, the
    full grid shifts lanes). The unrolled form is plain column algebra
    per step, immune by construction — and is also exactly what the
    engine's ``aggregate`` compiles to, so the mirror stays
    expression-for-expression."""
    lvl = int(level)
    carry = ", ".join(carry_cols)
    sep = ", " if carry else ""
    inner = (
        f"SELECT {carry}{sep}CAST({x_col} AS BIGINT) AS hx{lvl}, "
        f"CAST({y_col} AS BIGINT) AS hy{lvl}, "
        f"CAST(0 AS BIGINT) AS hd{lvl} FROM {source}"
    )
    for i in range(lvl - 1, -1, -1):
        s = 1 << i
        p = i + 1
        rx = f"(CASE WHEN (hx{p} & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (hy{p} & {s}) > 0 THEN 1 ELSE 0 END)"
        inner = f"""SELECT {carry}{sep}
  hd{p} + {s * s} * CAST(xor(3 * {rx}, {ry}) AS BIGINT) AS hd{i},
  CASE WHEN {ry} = 0
       THEN (CASE WHEN {rx} = 1 THEN {s - 1} - hy{p} ELSE hy{p} END)
       ELSE hx{p} END AS hx{i},
  CASE WHEN {ry} = 0
       THEN (CASE WHEN {rx} = 1 THEN {s - 1} - hx{p} ELSE hx{p} END)
       ELSE hy{p} END AS hy{i}
FROM ({inner})"""
    return f"SELECT {carry}{sep}hd0 AS h FROM ({inner})"
