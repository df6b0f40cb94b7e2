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


def _cm_cell(value: F.Column, i: F.Column, w: int, salt: str) -> F.Column:
    """Row-i cell index for a value — md5-prefix integer mod width (the
    synth.py portable hash at full 60-bit width, reduced mod w)."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(value, F.lit(salt), i.cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        % F.lit(int(w))
    )


def countmin_build(
    df: DataFrame,
    value_col: str,
    d: int = 3,
    w: int = 1024,
    salt: str = "cm",
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan, J.Algorithms 2005) of
    the ``value_col`` occurrence counts: a d×w integer grid stored as
    rows ``(i, cell, cnt)`` (≤ d·w rows regardless of input size).

    Like KMV above — and unlike engine-internal sketches — the grid is
    a pure DETERMINISTIC function of the input multiset (md5 row
    hashes, no RNG), so the q77 oracle reproduces it cell-for-cell.
    Guarantees: estimates never undercount; overcount ≤ 2·N/w with
    probability 1-(1/2)^d.

    Scale shape: one shuffle of (i, cell) partials with map-side
    combine — the shuffle carries at most d·w rows per map task, NOT
    the token stream; grids MERGE by cell-wise addition (same groupBy
    over a union), the executor-rollup property every distributed
    heavy-hitter pipeline needs. d·w stays driver-broadcastable by
    construction.
    """
    if d <= 0 or w <= 0:
        raise ValueError("d and w must be positive")
    probes = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(int(d) - 1)),
            lambda i: F.struct(
                i.cast("int").alias("i"),
                _cm_cell(F.col(value_col).cast("string"), i, w, salt)
                .alias("cell"),
            ),
        )
    )
    return (
        df.select(probes.alias("p"))
        .select("p.i", "p.cell")
        .groupBy("i", "cell")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def countmin_estimate(
    cms: DataFrame,
    items: DataFrame,
    value_col: str,
    d: int = 3,
    w: int = 1024,
    salt: str = "cm",
) -> DataFrame:
    """Point-query the sketch: for each distinct value in ``items``,
    ``est = min over rows i of cnt[i][cell_i(value)]`` (0 for a cell
    never hit). The d probes are a broadcast join against the ≤ d·w-row
    grid — queries never touch the original stream."""
    probes = items.select(
        F.col(value_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(int(d) - 1)),
                lambda i: F.struct(
                    i.cast("int").alias("i"),
                    _cm_cell(F.col(value_col).cast("string"), i, w, salt)
                    .alias("cell"),
                ),
            )
        ).alias("p"),
    ).select(value_col, "p.i", "p.cell")
    return (
        probes.join(F.broadcast(cms), ["i", "cell"], "left")
        .groupBy(value_col)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("long")
            .alias("est")
        )
    )


def kmv_set_ops(
    df: DataFrame,
    key_col: str,
    value_col: str,
    k: int = 128,
    bits: int = 40,
) -> DataFrame:
    """Pairwise set-operation estimates between every two groups from
    their KMV sketches (Beyer et al., "On Synopses for Distinct-Value
    Estimation Under Multiset Operations", SIGMOD'07) — the sketch
    algebra that lets a 100 TB pipeline answer "how much does corpus A
    overlap corpus B" from two k-row synopses instead of a fact×fact
    join.

    Emits one row per key pair (key_a < key_b)::

        (key_a, key_b, union_kept, rho, est_union, est_inter,
         jaccard_ppm)

    - the union sketch is the k smallest hashes of the MERGED kept
      sets (closure property: K_k(A ∪ B) = K_k(K_k(A) ∪ K_k(B)));
    - ``rho`` = how many of those union-sketch hashes appear in BOTH
      sides' sketches — the unbiased intersection indicator;
    - ``est_union`` = exact count when the union kept < k (the sketch
      IS the set), else ``(k-1)·2^bits div greatest(tau, 1)``. The
      k-th smallest ``bits``-bit hash is zero only when union_kept == k
      AND a value hashes to exactly 0 (P ≈ 2^-bits per pair) — the
      ``greatest(tau, 1)`` guard (mirrored in the q84 oracle, pinned by
      a planted-zero-hash pytest) keeps that 2^-40 event finite and
      cross-engine identical instead of Spark-NULL-vs-DuckDB-raise
      (closes ADVICE r3/r4);
    - ``est_inter`` = ``rho`` exactly in the exact regime, else
      ``rho·est_union div k``;
    - ``jaccard_ppm`` = ``rho·10^6 div union_kept`` (exact in the
      exact regime, the ρ/k estimator otherwise).

    All integer md5-prefix arithmetic (synth.py discipline): no RNG, no
    engine-private hash — the q84 oracle mirrors every step in SQL and
    checks VALUES, which published sketch libraries never allow.

    Scale shape: one distinct-shuffle + one windowed top-k per key
    builds the sketches (fact-sized work happens once); everything
    after operates on ≤ k rows per key — the pair join is dim×dim.
    The key-pair frame is a broadcast non-equi self-join of the DISTINCT
    key list: key cardinality is assumed dim-sized (sources, shards,
    days); for millions of keys, pass an explicit pair list upstream
    instead of all-pairs.
    """
    if not 1 < k < (1 << (62 - bits)):
        raise ValueError(f"k must be in (1, 2^{62 - bits})")
    h = kmv_hash_col(F.col(value_col).cast("string"), bits)
    distinct = (
        df.select(F.col(key_col).alias("key"), h.alias("h"))
        .groupBy("key", "h")
        .agg(F.lit(1).alias("_one"))
        .drop("_one")
    )
    wk = Window.partitionBy("key").orderBy(F.col("h").asc())
    kept = (
        distinct.withColumn("_rn", F.row_number().over(wk))
        .where(F.col("_rn") <= F.lit(int(k)))
        .select("key", "h")
    )
    keys = kept.select("key").distinct()
    pairs = (
        keys.select(F.col("key").alias("key_a"))
        .join(
            F.broadcast(keys.select(F.col("key").alias("key_b"))),
            F.col("key_a") < F.col("key_b"),
        )
    )
    side_a = (
        pairs.join(kept.select(F.col("key").alias("key_a"), "h"), "key_a")
        .select("key_a", "key_b", "h", F.lit(1).alias("in_a"),
                F.lit(0).alias("in_b"))
    )
    side_b = (
        pairs.join(kept.select(F.col("key").alias("key_b"), "h"), "key_b")
        .select("key_a", "key_b", "h", F.lit(0).alias("in_a"),
                F.lit(1).alias("in_b"))
    )
    merged = (
        side_a.unionByName(side_b)
        .groupBy("key_a", "key_b", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    wp = Window.partitionBy("key_a", "key_b").orderBy(F.col("h").asc())
    union_kept = (
        merged.withColumn("_rn", F.row_number().over(wp))
        .where(F.col("_rn") <= F.lit(int(k)))
    )
    aggd = union_kept.groupBy("key_a", "key_b").agg(
        F.count(F.lit(1)).cast("long").alias("union_kept"),
        F.max("h").alias("tau"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("rho"),
    )
    return _kmv_estimates(aggd, k, bits)


def _kmv_estimates(aggd: DataFrame, k: int, bits: int) -> DataFrame:
    """Estimator tail of :func:`kmv_set_ops`, split out so the 2^-bits
    tau == 0 branch (a value hashing to exactly zero while the union
    sketch is full) is directly testable with a planted row — the
    ``greatest(tau, 1)`` guard must agree with the q84 oracle's
    ``GREATEST(tau, 1)`` cross-engine (ADVICE r3/r4 closure).

    Input: one row per key pair ``(key_a, key_b, union_kept, tau, rho)``.
    """
    numer = (k - 1) * (1 << bits)
    est_union = (
        F.when(F.col("union_kept") < F.lit(int(k)), F.col("union_kept"))
        .otherwise(F.expr(f"{numer}L div greatest(tau, 1L)"))
        .cast("long")
    )
    return aggd.select(
        "key_a", "key_b", "union_kept", "rho",
        est_union.alias("est_union"),
    ).select(
        "key_a", "key_b", "union_kept", "rho", "est_union",
        F.when(F.col("union_kept") < F.lit(int(k)), F.col("rho"))
        .otherwise(F.expr(f"(rho * est_union) div {int(k)}L"))
        .cast("long")
        .alias("est_inter"),
        F.expr("(rho * 1000000L) div union_kept").cast("long")
        .alias("jaccard_ppm"),
    )
