"""Deterministic splitting & sampling for training-data pipelines.

`randomSplit`/`sample` are seed- and partitioning-dependent: re-running
on a repartitioned table reassigns rows, which silently leaks validation
examples into training sets. The production-grade alternative is
CONTENT-ADDRESSED assignment — a stable hash of the row's identity picks
the split, so membership is a pure function of the data: reproducible
across runs, engines, partitionings, and cluster sizes, and new rows
never move old rows between splits.

Hash: md5 of the stringified id (the repo's one portable string hash —
see synth.py's oracle-portability rules), top 60 bits as int64, bucketed
mod 10_000 for 0.01% split granularity. Pure Column projection — no
shuffle, no UDF, and the identical expression runs in DuckDB, which is
what makes q50 oracle-exact rather than rows-only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 10_000


def _hash_bucket_col(id_col: Column, salt: str) -> Column:
    # the repo's single sanctioned portable string hash — one
    # implementation site (operators/dedup.py), not a re-derivation
    from osmcha_spark.operators.dedup import md5_long_col

    return (
        md5_long_col(F.concat(id_col.cast("string"), F.lit(salt))) % _BUCKETS
    )


def hash_bucket_sql(id_expr: str, salt: str) -> str:
    """DuckDB twin of the bucket expression (oracle side)."""
    return (
        f"CAST('0x' || substring(md5(concat(CAST({id_expr} AS VARCHAR), "
        f"'{salt}')), 1, 15) AS BIGINT) % {_BUCKETS}"
    )


def split_assign(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    salt: str = "split",
) -> DataFrame:
    """Add a ``split`` column assigning each row to a named split with the
    given weights (must sum to ≤ 1; any remainder is an implicit 'rest').

    Assignment is by hash-bucket ranges, so every engine/run/partitioning
    agrees row-for-row and ratios hold to 1/10000.
    """
    total = sum(weights.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"weights sum to {total} > 1")
    bucket = _hash_bucket_col(F.col(id_col), salt)
    expr: Column | None = None
    edge = 0
    for name, w in weights.items():
        edge += int(round(w * _BUCKETS))
        cond = bucket < F.lit(edge)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    out = expr.otherwise(F.lit("rest")) if expr is not None else F.lit("rest")
    return df.withColumn("split", out)


def deterministic_sample(
    df: DataFrame,
    id_col: str,
    rate: float,
    salt: str = "sample",
) -> DataFrame:
    """Content-addressed Bernoulli sample: keeps rows whose hash bucket
    falls under ``rate`` — stable under reruns and repartitioning, and a
    sub-sample at a lower rate is always a subset of a higher-rate one
    (nested samples, the property iterative data ablations rely on)."""
    return df.where(
        _hash_bucket_col(F.col(id_col), salt) < F.lit(int(round(rate * _BUCKETS)))
    )


def priority_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    salt: str = "prio",
    max_weight: int = 1 << 20,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement by priority
    sampling (Duffield, Lund & Thorup, JACM 2007): each row gets priority
    ``q = w / u`` for a uniform ``u``, the k highest-priority rows are
    the sample, and the estimator ``ŵ = max(w, τ)`` (τ = the (k+1)-th
    priority, 0 if the population is ≤ k) makes ``sum(ŵ)`` an unbiased
    estimate of the population's total weight from just the sample —
    the subset-sum primitive behind weighted corpus subsampling
    ("keep 100k docs, longer docs proportionally more likely, but
    token-count totals still estimable").

    Determinism (the repo's content-addressed discipline, same as
    :func:`deterministic_sample`): ``u`` is not RNG but the row's 40-bit
    md5 hash, so ``q = (w << 40) div (h + 1)`` is a pure INTEGER function
    of row identity — rerun/engine/cluster-size stable, and the DuckDB
    oracle (q68) checks values, not plausibility. ``w`` is clamped to
    [1, 2^20] to keep ``w << 40 < 2^62`` (synth.py's integer-portability
    bound).

    Plan shape (100 TB): the priority is a pure Column projection; the
    global top-(k+1) is ``orderBy().limit()``, which Spark plans as
    ``TakeOrderedAndProject`` — each partition keeps only its local
    top-(k+1) in a bounded heap and the driver merges k+1-sized lists,
    so there is NO global sort and NO full shuffle (pinned by
    tests/test_plans.py). The (k+1)-row frame then computes τ with a
    single-partition window — safe because the frame is k+1 rows by
    construction, not data-sized.

    Reference counterpart: none (osmcha never samples); mandated by the
    training-pipeline inventory (SURVEY §2.11).
    """
    from pyspark.sql import Window

    if not 0 < k < 1_000_000:
        raise ValueError("k must be a positive, driver-mergeable size")
    w = F.greatest(
        F.least(F.col(weight_col).cast("long"), F.lit(int(max_weight))),
        F.lit(1),
    )
    # integer division (`div`, truncating) so the priority matches
    # DuckDB's `//` bit-for-bit — hence the expr form.
    prio = df.select(
        F.col(id_col),
        w.alias("w"),
        F.expr(
            f"(greatest(least(cast({weight_col} as long), "
            f"{int(max_weight)}L), 1L) * {1 << 40}L) div "
            f"(cast(conv(substring(md5(concat(cast({id_col} as string), "
            f"'{salt}')), 1, 10), 16, 10) as long) + 1L)"
        ).cast("long").alias("priority"),
    )
    top = prio.orderBy(F.desc("priority"), F.asc(id_col)).limit(k + 1)
    win = Window.partitionBy()  # k+1 rows max — bounded by construction
    ranked = top.select(
        "*",
        F.row_number()
        .over(win.orderBy(F.desc("priority"), F.asc(id_col)))
        .alias("_rn"),
        F.count(F.lit(1)).over(win).alias("_n"),
        F.min("priority").over(win).alias("_minp"),
    )
    tau = F.when(F.col("_n") == k + 1, F.col("_minp")).otherwise(F.lit(0))
    return (
        ranked.where(F.col("_rn") <= k)
        .select(
            id_col,
            "w",
            "priority",
            F.greatest(F.col("w"), tau).cast("long").alias("est_w"),
        )
    )


def stratified_take(
    df: DataFrame,
    strata_cols: list[str],
    n: int,
    id_col: str,
    salt: str = "strat",
) -> DataFrame:
    """Exactly ``min(n, |stratum|)`` rows per stratum, chosen by
    content-addressed hash order — the balanced-sampling primitive
    (class-balanced eval sets, per-language calibration corpora) that
    ``sampleBy`` can't give you: fraction-based sampling only hits n in
    expectation, and its membership moves when the table is
    repartitioned or appended to. Here the per-stratum ranking key is
    ``(md5-hash(id, salt), id)`` — a pure function of row identity — so
    reruns, engines, and cluster sizes agree row-for-row, and a stratum
    gaining new rows only ever displaces the highest-hash survivors.

    Plan: one shuffle on the strata (window partition), row_number, and
    the rank filter folds into the Window node — no join, no second
    pass. Skewed strata are the classic window hot-key; at 100 TB cap
    pathological strata first (this is a top-n, so a per-partition
    map-side pre-rank + re-rank would bound them; Spark's windowed
    top-n already stops at the limit within each partition's sort).

    Output: the input columns plus ``strat_rank`` (1-based within the
    stratum), so callers can tighten n later without resampling.
    """
    from pyspark.sql import Window

    from osmcha_spark.operators.dedup import md5_long_col

    key = md5_long_col(
        F.concat(F.col(id_col).cast("string"), F.lit(salt))
    )
    w = Window.partitionBy(*[F.col(c) for c in strata_cols]).orderBy(
        key.asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("strat_rank", F.row_number().over(w))
        .where(F.col("strat_rank") <= F.lit(int(n)))
    )


def mix_sample(
    df: DataFrame,
    rates: DataFrame,
    domain_col: str = "source",
    id_col: str = "doc_id",
    rate_col: str = "rate_bp",
    salt: str = "mix",
) -> DataFrame:
    """Deterministic domain-mix resampling — the APPLY side of static
    data mixing (DoReMi, Xie et al. 2023, arXiv:2305.10429 §2: weights
    come from offline optimization or DSIR-style importance estimates;
    this operator materializes a corpus at those per-domain rates).

    One output row per input row: ``(id, domain, bucket, kept)`` with
    ``kept = 1`` iff the row's content-addressed bucket (md5 of the id
    + salt, mod 10_000 — :func:`split_assign`'s hash, same
    implementation site) falls below the domain's ``rate_bp`` (basis
    points out of 10_000). A domain ABSENT from ``rates`` is an
    explicit empty allocation — every row dropped (pinned by pytest);
    rates above 10_000 keep everything (a rate is a cap, not a
    multiplier — this operator never duplicates rows; upsample by
    unioning salted epochs: ``salt="mix-epoch2"`` draws an independent
    subset).

    Scale shape: the rates dim broadcasts (domain cardinality is tiny
    by definition); assignment is a pure projection — the fact table
    NEVER shuffles. Membership is a pure function of (id, salt,
    rates): re-running on a repartitioned or appended corpus never
    flips old rows, so incremental ingest composes (new rows sample
    themselves, old rows stand — split_assign's contract applied to
    mixing).
    """
    bucket = _hash_bucket_col(F.col(id_col), salt)
    r = F.broadcast(
        rates.select(
            F.col(domain_col).alias("__dom"),
            F.col(rate_col).cast("long").alias("__rate_bp"),
        )
    )
    return (
        df.select(
            F.col(id_col),
            F.col(domain_col),
            bucket.alias("bucket"),
        )
        .join(r, F.col(domain_col) == F.col("__dom"), "left")
        .select(
            id_col,
            domain_col,
            "bucket",
            (F.col("bucket") < F.coalesce(F.col("__rate_bp"), F.lit(0)))
            .cast("int")
            .alias("kept"),
        )
    )


def sample_radius_pairs(
    pts: DataFrame,
    level: int,
    m: int,
    salt: str = "srj",
    id_col: str = "id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    radius: float | None = None,
) -> DataFrame:
    """(sample_pos, left_id, right_id, dist) — a uniform random sample
    of ``m`` pair-slots from the SAME-CELL spatial self-join, drawn
    WITHOUT enumerating the join ("Random Sampling over Spatial Range
    Joins", ICDE 2025, the two-level index-decode scheme, made
    deterministic/content-addressed). Pass ``radius`` to apply the
    paper's rejection step: exact-distance filtering of a uniform
    candidate sample leaves a uniform (binomial-sized) sample of the
    TRUE join output — candidates only ever over-cover.

    Candidate space (mirrored in the q138 oracle, the q36/q38 rule):
    unordered pairs sharing a level-``level`` cell, ordered globally by
    (cell, left_rank, right_rank) with rank = row_number by id within
    the cell. Slot j's index is md5("salt:j") mod total — a pure
    function of the corpus, so repartitioning never changes the
    sample; duplicate indices collapse (DISTINCT slots ≈ without-
    replacement for m ≪ total).

    Scale shape: per-cell counts are ONE map-side-combined groupBy;
    the prefix-sum window runs over DISTINCT CELLS (metadata-scale
    next to points); the m sampled slots BROADCAST into two interval
    joins (slot → cell, then slot → left row among ONLY the sampled
    cells' rows); coordinates fetch by (cell, rank) equi-joins. Total
    work O(#cells + m + points-in-sampled-cells) — the pair space,
    which can be quadrillions at 10^12 points, is never materialized.
    """
    from pyspark.sql import Window

    from osmcha_spark.geo.cells import cell_col
    from osmcha_spark.operators.dedup import md5_long_col

    spark = pts.sparkSession
    pid, lon, lat = F.col(id_col), F.col(lon_col), F.col(lat_col)
    ranked = pts.select(
        pid.alias("pid"), lon.alias("plon"), lat.alias("plat"),
        cell_col(lon, lat, level).alias("cell"),
    ).withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("cell").orderBy("pid")) - 1,
    )
    cells = (
        ranked.groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 2)
        .withColumn(
            "pairs", (F.col("n") * (F.col("n") - 1) / 2).cast("long"))
    )
    w = Window.orderBy("cell").rowsBetween(
        Window.unboundedPreceding, -1)
    cells = cells.withColumn(
        "off", F.coalesce(F.sum("pairs").over(w), F.lit(0)))
    tot = cells.agg(F.sum("pairs").alias("__tot"))
    slots = (
        spark.range(int(m)).crossJoin(F.broadcast(tot))
        .select(
            F.pmod(
                md5_long_col(
                    F.concat(F.lit(f"{salt}:"),
                             F.col("id").cast("string"))),
                F.col("__tot"),
            ).alias("pos")
        )
        .distinct()
    )
    s2c = cells.join(
        F.broadcast(slots),
        (F.col("pos") >= F.col("off"))
        & (F.col("pos") < F.col("off") + F.col("pairs")),
    ).select("cell", "n", (F.col("pos") - F.col("off")).alias("p"),
             "pos")
    rows_in = ranked.join(
        F.broadcast(s2c.select("cell").distinct()), "cell")
    # left-rank intervals: rank i owns pairs [i*n - i*(i+1)/2, +n-1-i)
    lefts = rows_in.join(
        F.broadcast(s2c), "cell").where(
        (F.col("p") >= F.col("rk") * F.col("n")
         - (F.col("rk") * (F.col("rk") + 1) / 2).cast("long"))
        & (F.col("p") < (F.col("rk") + 1) * F.col("n")
           - ((F.col("rk") + 1) * (F.col("rk") + 2) / 2).cast("long"))
    ).select(
        "pos", "cell", "n", "p",
        F.col("rk").alias("lrk"),
        F.col("pid").alias("left_id"),
        F.col("plon").alias("llon"), F.col("plat").alias("llat"),
        (F.col("rk") + 1 + F.col("p")
         - (F.col("rk") * F.col("n")
            - (F.col("rk") * (F.col("rk") + 1) / 2).cast("long"))
         ).alias("rrk"),
    )
    out = lefts.join(
        rows_in.select(
            "cell", F.col("rk").alias("rrk"),
            F.col("pid").alias("right_id"),
            F.col("plon").alias("rlon"), F.col("plat").alias("rlat"),
        ),
        ["cell", "rrk"],
    ).select(
        "pos", "left_id", "right_id",
        F.sqrt(
            (F.col("llon") - F.col("rlon"))
            * (F.col("llon") - F.col("rlon"))
            + (F.col("llat") - F.col("rlat"))
            * (F.col("llat") - F.col("rlat"))
        ).alias("dist"),
    )
    if radius is not None:
        out = out.where(F.col("dist") <= float(radius))
    return out


def dsir_weights(
    docs: DataFrame,
    target: DataFrame,
    raw: DataFrame,
    n_buckets: int,
    min_logw: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Data Selection via Importance Resampling — DSIR (Xie et al.
    2023, arXiv:2302.03169 §3: hashed n-gram bag features; importance
    weight = product over features of p_target(b)/p_raw(b) estimated
    from a trusted target sample and a raw-pool sample), with the
    log-weight QUANTIZED to exact integers (text.py:flog2_col — the
    q128/q140 fixed-point move, so engine and oracle agree
    bit-for-bit). No reference counterpart (engine-only, the
    LLM-pipeline brief's data-selection leg).

    Per feature occurrence in bucket ``b``::

        qlw(b) = flog2(Ct(b) + 1) - flog2(Cr(b) + 1)

    with ``Ct``/``Cr`` bag counts over the target/raw samples, and the
    add-one-smoothed corpus-size normalizer folded in per doc::

        logw_q = sum(qlw) - n_features * (flog2(Tt + 1) - flog2(Tr + 1))

    (``Tt``/``Tr`` = total feature occurrences in each sample — the
    quantized log of the p = C/T denominators). ``kept = 1`` iff
    ``logw_q >= min_logw`` — DSIR proper then samples ∝ exp(logw);
    the deterministic gate is the reproducible variant (pair with
    :func:`deterministic_sample` for the stochastic step). Docs with
    no tokens emit ``(0, 0, 0)`` and are kept iff ``0 >= min_logw``.

    Scale shape: the feature space is BOUNDED at ``n_buckets`` (DSIR's
    own trick — 2^20 hash buckets regardless of corpus size), so BOTH
    count tables broadcast by construction, unlike q140's
    vocabulary-sized LM tables; features hash map-side (md5-prefix);
    the only shuffle is the per-doc sum, map-side combined; the
    normalizer is a broadcast 1-row scalar. No UDF anywhere.
    """
    from osmcha_spark.operators.text import flog2_col, hashed_features

    tc = (
        hashed_features(target, n_buckets, text_col, id_col)
        .groupBy("bucket").agg(F.count(F.lit(1)).alias("tc"))
    )
    rc = (
        hashed_features(raw, n_buckets, text_col, id_col)
        .groupBy("bucket").agg(F.count(F.lit(1)).alias("rc"))
    )
    norm = F.broadcast(
        tc.agg(F.sum("tc").alias("tt"))
        .crossJoin(rc.agg(F.sum("rc").alias("tr")))
        .select(
            (flog2_col(F.col("tt") + 1) - flog2_col(F.col("tr") + 1))
            .alias("__norm_q")
        )
    )
    scored = (
        hashed_features(docs, n_buckets, text_col, id_col)
        .join(F.broadcast(tc), "bucket", "left")
        .join(F.broadcast(rc), "bucket", "left")
        .select(
            "doc_id",
            (
                flog2_col(F.coalesce(F.col("tc"), F.lit(0)) + 1)
                - flog2_col(F.coalesce(F.col("rc"), F.lit(0)) + 1)
            ).alias("qlw"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_features"),
            F.sum("qlw").alias("s"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(scored, "doc_id", "left")
        .crossJoin(norm)
        .select(
            "doc_id",
            F.coalesce(F.col("n_features"), F.lit(0).cast("long"))
            .alias("n_features"),
            (
                F.coalesce(F.col("s"), F.lit(0).cast("long"))
                - F.coalesce(F.col("n_features"), F.lit(0).cast("long"))
                * F.col("__norm_q")
            ).alias("logw_q"),
        )
        .select(
            "doc_id", "n_features", "logw_q",
            (F.col("logw_q") >= F.lit(int(min_logw))).cast("int")
            .alias("kept"),
        )
    )
