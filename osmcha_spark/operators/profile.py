"""One-pass table profiling — the data-quality panel every ingest runs
before anything else: per column, row/null/distinct counts and typed
min/max, computed in a SINGLE aggregation over the table and emitted
long-format ``(col_name, metric, value)`` so downstream checks are
row-wise rules, not schema-wise code.

All metrics are int64 (strings profile by LENGTH, timestamps by epoch
micros), so the q100 oracle checks every value. Distinct counts are
EXACT ``count(distinct)`` — Spark plans multiple distinct aggregates in
one pass via Expand (each input row fans out once per distinct-agg);
that is the documented cost knob: at 100 TB swap the exact distincts for
the KMV sketch (operators/sketches.py) column-by-column when the Expand
fan-out dominates, keeping this exact panel for dims and samples.

Reference counterpart: none; SURVEY §2.11 engine inventory (the profile
is what decides which dedup/curation operator to run next).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: column kinds → how the typed min/max is derived
KINDS = ("long", "string", "ts")


def table_profile(df: DataFrame, spec: dict[str, str]) -> DataFrame:
    """Profile the columns in ``spec`` (name → kind in :data:`KINDS`).

    Emits, per column: ``n_rows`` (table-constant, repeated per column
    so each column's row group is self-contained), ``n_null``,
    ``n_distinct`` (exact; null excluded), ``min``/``max`` — value for
    longs, LENGTH for strings, epoch micros for timestamps.
    """
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c, kind in spec.items():
        if kind not in KINDS:
            raise ValueError(f"unknown kind {kind!r} for column {c!r}")
        col = F.col(c)
        if kind == "ts":
            col = F.unix_micros(col.cast("timestamp"))
        elif kind == "string":
            col = F.length(col)
        else:
            col = col.cast("long")
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"__null_{c}"),
            F.count_distinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(col).alias(f"__min_{c}"),
            F.max(col).alias(f"__max_{c}"),
        ]
    one = df.agg(*aggs)
    stacked = []
    for c in spec:
        stacked += [
            (c, "n_rows", "__rows"),
            (c, "n_null", f"__null_{c}"),
            (c, "n_distinct", f"__nd_{c}"),
            (c, "min", f"__min_{c}"),
            (c, "max", f"__max_{c}"),
        ]
    pairs = ", ".join(
        f"'{c}', '{m}', CAST({src} AS LONG)" for c, m, src in stacked
    )
    return one.selectExpr(
        f"stack({len(stacked)}, {pairs}) AS (col_name, metric, value)"
    )


def table_profile_kmv(
    df: DataFrame, spec: dict[str, str], k: int = 256, bits: int = 40
) -> DataFrame:
    """The sketch variant of :func:`table_profile` for the regime where
    exact multi-distinct's Expand fan-out dominates (the cost knob the
    exact panel's docstring names — measured, not prose:
    tools/profile_crossover.py → BENCH/profile_crossover.md).

    Same long format; ``n_rows``/``n_null``/``min``/``max`` stay EXACT
    from ONE Expand-free aggregation, and the exact ``n_distinct`` is
    replaced by ``n_distinct_est`` — the KMV estimate
    (operators/sketches.py:kmv_distinct), a pure deterministic function
    of each column's value set, so the panel remains oracle-checkable
    value-for-value (q103) unlike ``approx_count_distinct``'s
    engine-internal HLL.

    Plan shape vs exact: the melt (one in-row explode to
    (col_name, value-string)) fans out rows like Expand does, but the
    very next operator is groupBy(col_name, hash) whose map-side
    combiner collapses in-partition duplicates — the shuffle carries at
    most the per-column distinct HASH sets (40-bit longs), never the
    values, and per-group state downstream is O(k) via the
    WindowGroupLimit rank pushdown. Exact multi-distinct instead
    shuffles every distinct VALUE per column through the Expand.
    Distinctness keys are injective per kind: longs/strings as strings,
    timestamps by epoch micros (a timestamp's string form is
    dialect-dependent; its micros are not).
    """
    aggs = [F.count(F.lit(1)).alias("__rows")]
    melts = []
    for c, kind in spec.items():
        if kind not in KINDS:
            raise ValueError(f"unknown kind {kind!r} for column {c!r}")
        col = F.col(c)
        if kind == "ts":
            col = F.unix_micros(col.cast("timestamp"))
        elif kind == "string":
            col = F.length(col)
        else:
            col = col.cast("long")
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"__null_{c}"),
            F.min(col).alias(f"__min_{c}"),
            F.max(col).alias(f"__max_{c}"),
        ]
        vcol = (
            F.unix_micros(F.col(c).cast("timestamp")).cast("string")
            if kind == "ts"
            else F.col(c).cast("string")
        )
        melts.append(
            F.struct(F.lit(c).alias("col_name"), vcol.alias("v"))
        )
    one = df.agg(*aggs)
    stacked = []
    for c in spec:
        stacked += [
            (c, "n_rows", "__rows"),
            (c, "n_null", f"__null_{c}"),
            (c, "min", f"__min_{c}"),
            (c, "max", f"__max_{c}"),
        ]
    pairs = ", ".join(
        f"'{c}', '{m}', CAST({src} AS LONG)" for c, m, src in stacked
    )
    exact = one.selectExpr(
        f"stack({len(stacked)}, {pairs}) AS (col_name, metric, value)"
    )

    from osmcha_spark.operators.sketches import kmv_distinct

    melted = (
        df.select(F.explode(F.array(*melts)).alias("e"))
        .select("e.col_name", "e.v")
        .where(F.col("v").isNotNull())
    )
    est = kmv_distinct(melted, ["col_name"], "v", k=k, bits=bits).select(
        "col_name",
        F.lit("n_distinct_est").alias("metric"),
        F.col("est_distinct").alias("value"),
    )
    return exact.unionByName(est)


def constraint_audit(
    df: DataFrame,
    key: list[str],
    not_null: list[str] = (),
    ranges: dict[str, tuple] | None = None,
    accepted: dict[str, list] | None = None,
    fks: list[tuple] | None = None,
) -> DataFrame:
    """Data-quality constraint audit in ONE scan + ONE shuffle: per
    constraint a ``(check_name, violations, total_rows)`` row.

    Checks: ``unique:<key>`` (extra rows beyond one per key group —
    GROUP-BY null semantics, i.e. all-null keys form ONE group, matching
    ``SELECT DISTINCT``), ``not_null:<col>`` (null count),
    ``range:<col>`` (non-null values outside the closed [lo, hi]),
    ``accepted:<col>`` (non-null values outside the allow-list), and
    ``fk:<name>`` for each ``(name, child_col, dim_df, dim_key)`` in
    ``fks`` (non-null child values with no parent — orphans).

    Scale shape: every row-level check is a boolean flag in the initial
    projection, so it rides the SAME ``groupBy(key)`` the uniqueness
    check needs — flags are additive, so they survive the map-side
    partial agg, and the shuffle carries one row per DISTINCT key, never
    the table. FK dims join as broadcast left joins before the groupBy
    (zero extra shuffles); null children are the not_null check's job,
    not an orphan. The final reduction runs over per-key rows only.
    Nothing here crosses into Python.
    """
    ranges = ranges or {}
    accepted = accepted or {}
    fks = fks or []

    flags: list[tuple[str, F.Column]] = []
    for c in not_null:
        flags.append((f"not_null:{c}", F.col(c).isNull()))
    for c, (lo, hi) in ranges.items():
        flags.append(
            (f"range:{c}", F.col(c).isNotNull() & ~F.col(c).between(lo, hi))
        )
    for c, vals in accepted.items():
        flags.append(
            (f"accepted:{c}", F.col(c).isNotNull() & ~F.col(c).isin(*vals))
        )
    work = df
    for name, child, dim, dim_key in fks:
        kcol, marker = f"__fk_key_{name}", f"__fk_hit_{name}"
        d = (
            dim.select(F.col(dim_key).alias(kcol))
            .distinct()
            .withColumn(marker, F.lit(1))
        )
        work = work.join(
            F.broadcast(d), work[child] == F.col(kcol), "left"
        ).drop(kcol)
        flags.append(
            (f"fk:{name}", F.col(child).isNotNull() & F.col(marker).isNull())
        )

    aggs = [F.count(F.lit(1)).alias("__cnt")] + [
        F.sum(flag.cast("long")).alias(f"__f{i}")
        for i, (_, flag) in enumerate(flags)
    ]
    grouped = work.groupBy(*[F.col(c) for c in key]).agg(*aggs)
    one = grouped.agg(
        F.sum("__cnt").alias("__total"),
        (F.sum("__cnt") - F.count(F.lit(1))).alias("__dups"),
        *[F.sum(f"__f{i}").alias(f"__v{i}") for i in range(len(flags))],
    )
    names = [f"unique:{','.join(key)}"] + [n for n, _ in flags]
    srcs = ["__dups"] + [f"__v{i}" for i in range(len(flags))]
    pairs = ", ".join(
        f"'{n}', CAST({s} AS LONG)" for n, s in zip(names, srcs)
    )
    return one.selectExpr(
        f"stack({len(names)}, {pairs}) AS (check_name, violations)",
        "CAST(__total AS LONG) AS total_rows",
    )
