"""Deterministic distinct-count sketching — KMV (k-minimum-values).

At corpus scale the question "how many distinct users / URLs / shingles
per group" is a sketch problem: exact distinct is a full shuffle of every
distinct value, while `approx_count_distinct` (HLL) is cheap but its
estimate is engine-internal — it cannot be oracle-gated value-for-value.
KMV sits in between and is the one cardinality sketch whose output is a
*pure deterministic function of the input set*: keep the k smallest
values of a fixed hash; the estimator ``(k-1) * H / h_k`` (h_k = k-th
smallest hash, H = hash-space size) is then an exact integer both
engines reproduce bit-for-bit (Bar-Yossef et al. 2002, "Counting
distinct elements in a data stream"; Beyer et al. SIGMOD'07 give the
unbiased (k-1) form).

Scale shape (100 TB):
- stage 1 dedupes ``(group, h)`` — ONE shuffle with map-side partial
  aggregation (the combiner collapses in-partition duplicates, so the
  shuffle carries at most the distinct set, not the rows);
- stage 2 is a rank-k window per group: Spark's ``InferWindowGroupLimit``
  (3.5+) pushes ``rank <= k`` into the sort as a per-partition top-k
  (``WindowGroupLimit`` node, pinned by tests/test_plans.py), so
  per-group state is O(k), never O(distinct);
- sketches MERGE: union the surviving hash lists and re-take the k
  smallest — exactly the same operator over the union, which is how a
  1000-executor rollup combines per-partition sketches without ever
  re-scanning raw data (demonstrated in tests/test_sketches.py).

Hash width: 40-bit md5 prefix by default. The estimator's integer
numerator is ``(k-1) << 40`` — safe under the < 2^62 oracle-portability
bound (osmcha_spark/synth.py) for any k < 2^21. A production run at
trillions of distincts would widen to the 60-bit hash and decimal(38)
arithmetic; the 40-bit gate keeps engine ≡ oracle exactly, and a 2^-40
pairwise collision shifts the estimate by at most one rank — the same
order as the sketch's own error (~1/sqrt(k)).

Reference counterpart: none — osmcha has no aggregation beyond
list.count() (osmcha/changeset.py:392-396). Engine-only, mandated by the
training-pipeline inventory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def kmv_hash_col(c, bits: int = 40) -> F.Column:
    """md5-hex-prefix integer hash of ``bits`` width (bits % 4 == 0).

    DuckDB twin: ``CAST('0x' || substring(md5(x), 1, bits//4) AS
    BIGINT)`` — the synth.py md5long convention at reduced width.
    """
    if bits % 4 or not 0 < bits <= 60:
        raise ValueError("bits must be a multiple of 4 in (0, 60]")
    return F.conv(F.substring(F.md5(c), 1, bits // 4), 16, 10).cast("long")


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 256,
    bits: int = 40,
) -> DataFrame:
    """Per-group KMV distinct-count sketch.

    Emits one row per group::

        (<group_cols...>, n_kept, kth_min, est_distinct)

    - ``n_kept``  = min(k, |distinct|) — the surviving sketch size;
    - ``kth_min`` = the largest surviving hash (the sketch threshold);
    - ``est_distinct`` = |distinct| exactly when the group has fewer
      than k distinct values (the sketch IS the set), else the integer
      estimator ``((k-1) << bits) div kth_min``.

    Deterministic: no RNG, no engine-internal state — rerun, engine and
    cluster-size stable, so the DuckDB oracle (q67) checks values, not
    just plausibility.
    """
    if not 1 < k < (1 << (62 - bits)):
        raise ValueError(f"k must be in (1, 2^{62 - bits}) for {bits}-bit hashes")
    h = kmv_hash_col(F.col(value_col).cast("string"), bits)
    distinct = (
        df.select(*group_cols, h.alias("h"))
        .groupBy(*group_cols, "h")
        .agg(F.lit(1).alias("_one"))
        .drop("_one")
    )
    w = Window.partitionBy(*group_cols).orderBy(F.col("h").asc())
    kept = (
        distinct.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= F.lit(int(k)))
    )
    numer = (k - 1) * (1 << bits)
    return (
        kept.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.max("h").cast("long").alias("kth_min"),
        )
        .select(
            *group_cols,
            "n_kept",
            "kth_min",
            F.when(F.col("n_kept") < F.lit(int(k)), F.col("n_kept"))
            .otherwise(F.expr(f"{numer}L div kth_min"))
            .cast("long")
            .alias("est_distinct"),
        )
    )
