"""KMV distinct-count sketch: exactness below k, estimator accuracy and
determinism above k, merge law, and the per-partition top-k plan shape."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from osmcha_spark.operators.sketches import kmv_distinct


def _docs(spark, n_distinct, copies=3):
    return (
        spark.range(n_distinct * copies)
        .select(
            F.lit("g").alias("grp"),
            (F.col("id") % n_distinct).cast("string").alias("v"),
        )
    )


def test_exact_below_k(spark):
    out = kmv_distinct(_docs(spark, 37), ["grp"], "v", k=64).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_kept == 37 and r.est_distinct == 37


def test_estimator_above_k_within_tolerance(spark):
    # 5000 distinct, k=256 → relative std error ~1/sqrt(254) ≈ 6.3%
    r = kmv_distinct(_docs(spark, 5000), ["grp"], "v", k=256).collect()[0]
    assert r.n_kept == 256
    assert abs(r.est_distinct - 5000) / 5000 < 0.25, r.est_distinct


def test_deterministic_under_repartition(spark):
    docs = _docs(spark, 1000)
    a = kmv_distinct(docs, ["grp"], "v", k=128).collect()[0]
    b = kmv_distinct(docs.repartition(13), ["grp"], "v", k=128).collect()[0]
    assert (a.n_kept, a.kth_min, a.est_distinct) == (
        b.n_kept, b.kth_min, b.est_distinct
    )


def test_merge_law(spark):
    """Sketch(A ∪ B) == sketch over the union of the two surviving hash
    sets — the property that lets a rollup combine per-partition
    sketches without rescanning raw data."""
    left = _docs(spark, 800).where(F.col("v").cast("long") % 2 == 0)
    right = _docs(spark, 800).where(F.col("v").cast("long") % 3 == 0)
    k = 64
    whole = kmv_distinct(left.unionByName(right), ["grp"], "v", k=k).collect()[0]

    # merge: union the kept (grp, h) rows of each side's stage-2 output,
    # re-take the k smallest distinct hashes
    from osmcha_spark.operators.sketches import kmv_hash_col

    def kept_hashes(df):
        return (
            df.select("grp", kmv_hash_col(F.col("v"), 40).alias("h"))
            .distinct()
            .withColumn(
                "_rn",
                F.row_number().over(
                    Window.partitionBy("grp").orderBy("h")
                ),
            )
            .where(F.col("_rn") <= k)
            .drop("_rn")
        )

    merged = (
        kept_hashes(left).unionByName(kept_hashes(right))
        .distinct()
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("grp").orderBy("h")
            ),
        )
        .where(F.col("_rn") <= k)
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n_kept"), F.max("h").alias("kth_min"))
        .collect()[0]
    )
    assert (whole.n_kept, whole.kth_min) == (merged.n_kept, merged.kth_min)


def test_rank_filter_becomes_window_group_limit(spark):
    """The scale claim: rank<=k folds into a per-partition top-k
    (WindowGroupLimit), so per-group state is O(k) not O(distinct)."""
    multi = (
        _docs(spark, 500)
        .withColumn("grp", (F.col("v").cast("long") % 5).cast("string"))
    )
    plan = kmv_distinct(
        multi, ["grp"], "v", k=32
    )._jdf.queryExecution().executedPlan().toString()
    # Partial limit runs BEFORE the per-group exchange: the second
    # shuffle carries at most k rows per group per input partition
    assert plan.count("WindowGroupLimit") == 2, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_parameter_guards(spark):
    docs = _docs(spark, 10)
    with pytest.raises(ValueError):
        kmv_distinct(docs, ["grp"], "v", k=1)
    with pytest.raises(ValueError):
        kmv_distinct(docs, ["grp"], "v", k=1 << 23, bits=40)
    from osmcha_spark.operators.sketches import kmv_hash_col
    with pytest.raises(ValueError):
        kmv_hash_col(F.col("v"), bits=13)


def test_countmin_never_undercounts_and_merges(spark):
    """CMS guarantees, pinned: (1) est >= true for every queried item,
    (2) with w >> distinct values the sketch is exact, (3) two shards'
    grids merged by cell-wise addition equal the whole-stream grid —
    the executor-rollup property."""
    from pyspark.sql import functions as F

    from osmcha_spark.operators.sketches import (
        countmin_build,
        countmin_estimate,
    )

    vals = spark.range(3000).select(
        (F.col("id") % 97).cast("string").alias("v")
    )
    items = vals.distinct()
    truth = {
        r.v: r.c for r in
        vals.groupBy("v").agg(F.count(F.lit(1)).alias("c")).collect()
    }

    # narrow sketch: collisions likely, but never an undercount
    cms_narrow = countmin_build(vals, "v", d=3, w=64)
    est_n = {r.v: r.est
             for r in countmin_estimate(cms_narrow, items, "v", d=3, w=64)
             .collect()}
    assert est_n.keys() == truth.keys()
    assert all(est_n[k] >= truth[k] for k in truth)

    # wide sketch: exact (97 distinct values, 4096 cells per row)
    cms_wide = countmin_build(vals, "v", d=3, w=4096)
    est_w = {r.v: r.est
             for r in countmin_estimate(cms_wide, items, "v", d=3, w=4096)
             .collect()}
    assert est_w == truth

    # mergeability: shard grids add cell-wise to the full grid
    a = vals.where(F.col("id") % 2 == 0)
    b = vals.where(F.col("id") % 2 == 1)
    merged = (
        countmin_build(a, "v", d=3, w=64)
        .unionByName(countmin_build(b, "v", d=3, w=64))
        .groupBy("i", "cell")
        .agg(F.sum("cnt").alias("cnt"))
    )
    full = {(r.i, r.cell): r.cnt for r in cms_narrow.collect()}
    got = {(r.i, r.cell): r.cnt for r in merged.collect()}
    assert got == full

    # missing item estimates 0 unless its cells collide (still >= 0)
    ghost = spark.createDataFrame([("zzz-never-seen",)], "v string")
    g = countmin_estimate(cms_wide, ghost, "v", d=3, w=4096).collect()[0]
    assert g.est == 0


def test_kmv_estimates_zero_tau_guard_matches_oracle(spark):
    """ADVICE r3/r4 closure: when the union sketch is full AND the k-th
    smallest hash is exactly 0 (P ~ 2^-40 per pair — planted here, since
    no feasible input hashes there), the greatest(tau, 1) guard yields
    the same finite values as the q84 oracle's GREATEST(tau, 1), instead
    of the old Spark-NULL-vs-DuckDB-raise divergence."""
    import duckdb

    from osmcha_spark.operators.sketches import _kmv_estimates

    k, bits = 128, 40
    aggd = spark.createDataFrame(
        [("a", "b", k, 0, 10),      # full sketch, planted zero tau
         ("a", "c", k, 1, 10),      # guard is identity for tau >= 1
         ("b", "c", 5, 0, 3)],      # exact regime ignores tau entirely
        "key_a string, key_b string, union_kept long, tau long, rho long",
    )
    got = {(r.key_a, r.key_b): (r.est_union, r.est_inter, r.jaccard_ppm)
           for r in _kmv_estimates(aggd, k=k, bits=bits).collect()}
    oracle = duckdb.sql(f"""
        WITH agg(key_a, key_b, union_kept, tau, rho) AS (
          VALUES ('a', 'b', {k}, 0, 10),
                 ('a', 'c', {k}, 1, 10),
                 ('b', 'c', 5, 0, 3)
        ), est AS (
          SELECT key_a, key_b, union_kept, rho,
                 CASE WHEN union_kept < {k} THEN union_kept
                      ELSE ({k - 1} * {1 << bits}) // GREATEST(tau, 1)
                 END AS est_union
          FROM agg)
        SELECT key_a, key_b, est_union,
               CASE WHEN union_kept < {k} THEN rho
                    ELSE (rho * est_union) // {k} END AS est_inter,
               (rho * 1000000) // union_kept AS jaccard_ppm
        FROM est
    """).fetchall()
    for key_a, key_b, eu, ei, jp in oracle:
        assert got[(key_a, key_b)] == (eu, ei, jp)
    # the planted-zero pair is finite (not NULL) and equals the tau=1 arm
    assert got[("a", "b")][0] == (k - 1) * (1 << bits)
