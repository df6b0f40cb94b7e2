"""Event-stream batch operators: session windows and as-of joins.

The reference models changeset review as one-shot scoring; a production
corpus pipeline also needs the classic event-table operators Spark either
ships natively (session windows) or lacks entirely (as-of join). Both are
expressed as single-shuffle plans.

- :func:`sessionize` — native ``F.session_window`` gap sessions: the
  Spark-first form (one shuffle on the grouping key; in Structured
  Streaming the same expression is incrementally maintained with
  watermark-based state eviction).
- :func:`as_of_join` — each left row picks the most recent right row
  strictly before it (by (ts, tiebreak) lexicographic order) with the same
  key. Spark has no ASOF JOIN; the scalable formulation is union-tag +
  one window pass: tag both sides, sort each key's rows once, and carry
  the last-seen right payload forward with ``last(..., ignorenulls)``.
  ONE shuffle on the key — no range join, no per-row subquery, no
  broadcast of either side — which is the shape that survives 100 TB
  (a theta/range join here would be quadratic per key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _floordiv(num: str, den: str) -> str:
    """FLOOR division in int64 as a SQL-expr fragment: Spark's `div`
    truncates toward zero while every oracle uses DuckDB `//`, which
    floors — divergent for negative numerators (ADVICE r3). The idiom
    (x - pmod(x, d)) div d is exact floor for d > 0 (pmod ∈ [0, d)),
    same one skyline_2d/order_statistics already use."""
    return f"((({num}) - pmod(({num}), ({den}))) div ({den}))"


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    gap: str = "10 minutes",
    value_col: str = "value",
) -> DataFrame:
    """Gap-based sessions per key: consecutive events ``gap`` or closer
    merge; only a STRICTLY larger gap starts a new session (measured:
    Spark merges an exact-gap pair — session windows [ts, ts+gap) close at
    ``last+gap`` and an event AT that instant still joins; the oracle's
    lag-and-cumsum formulation uses ``>`` to match, pinned by
    tests/test_operators.py::test_sessionize_exact_gap_boundary).

    Output: (key, session_start, session_last, n_events, value_cents) —
    value summed in integer cents so the oracle hash is order-independent.
    """
    return (
        events.groupBy(
            F.col(key), F.session_window(F.col(ts_col), gap)
        )
        .agg(*session_aggs(ts_col, value_col))
        .drop("session_window")
    )


def session_aggs(ts_col: str = "ts", value_col: str = "value"):
    """The session output aggregates, shared by the batch operator above
    and the streaming twin (streaming/sessions.py) so both emit the same
    schema: start/last timestamps, event count, value in integer cents.

    Cents are rounded PER ROW and summed as integers (the q49 pattern,
    ADVICE r2) — ``round(sum(double)·100)`` is reduction-order-dependent
    in the last ulp, so at large scale two engines (or two shuffles) can
    round a .5-boundary sum to different integers; an integer sum is
    associative and exact. The q41/q45/q47/q57 oracles state the same
    per-row form."""
    return [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_last"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col(value_col) * 100).cast("long"))
        .alias("value_cents"),
    ]


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    tiebreak: str = "event_id",
    right_payload: tuple[str, ...] = ("event_id", "value"),
    prefix: str = "asof_",
) -> DataFrame:
    """For every left row, the most recent right row with the same ``key``
    that is STRICTLY before it in ((ts, tiebreak)) order; left rows with no
    prior right row keep NULL payload (left-outer as-of).

    Union-tag + single window pass (see module docstring). Right rows at
    the exact same (ts, tiebreak) sort position are ordered after left
    rows, so "strictly before" holds even under full ties.
    """
    # The payload travels as ONE struct: the struct is non-null for every
    # right row even when individual fields are null, so last(ignorenulls)
    # always picks the whole most-recent right row. Carrying fields
    # independently would let a genuinely-NULL field fall through to an
    # OLDER right row's value — a torn row mixing two right rows.
    payload = F.struct(
        *[right[c].alias(c) for c in right_payload]
    )
    r_tagged = right.select(
        F.col(key), F.col(ts_col), F.col(tiebreak), F.lit(1).alias("_side"),
        payload.alias("_payload"),
    )
    l_tagged = left.select(
        "*", F.lit(0).alias("_side"),
        F.lit(None).cast(
            r_tagged.schema["_payload"].dataType
        ).alias("_payload"),
    )
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    w = (
        Window.partitionBy(key)
        .orderBy(ts_col, tiebreak, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *[c for c in left.columns],
        F.col("_side"),
        F.last("_payload", ignorenulls=True).over(w).alias("_payload"),
    )
    return (
        carried.where(F.col("_side") == 0)
        .select(
            *[c for c in left.columns],
            *[
                F.col(f"_payload.{c}").alias(f"{prefix}{c}")
                for c in right_payload
            ],
        )
    )


def scd2_history(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Collapse a change log into SCD type-2 validity intervals — the
    dimension-history primitive (Kimball's slowly-changing-dimension
    type 2) that turns "every observation of (key, value)" into
    "each value's [valid_from, valid_to) reign per key".

    Semantics (gaps-and-islands): order each key's rows by
    ``(ts_col, tiebreak_col)``; a row OPENS a new interval iff its value
    differs from the previous row's (or it is the key's first row);
    ``valid_from`` = the opening row's ts, ``valid_to`` = the next
    opening row's ts (exclusive), NULL for the key's current value.
    Re-observations of an unchanged value extend the current interval —
    they do not fragment it.

    Plan shape (100 TB): ONE shuffle on the key. Both windows — the
    ``lag`` that finds change points and the ``lead`` that closes
    intervals — share the same ``PARTITION BY key ORDER BY ts``
    partitioning, so Catalyst plans a single Exchange and sorts once
    (pinned by tests/test_plans.py). No join, no subquery — the classic
    self-join spelling of SCD2 is quadratic per key and is exactly what
    this avoids.

    Ties: ``tiebreak_col`` (default the value itself) makes the order
    total when one key has several rows at the same ts — required for
    run-for-run determinism, same discipline as as_of_join above.

    Reference counterpart: none — osmcha re-scores snapshots statefully
    (osmcha/changeset.py:360-380 keeps only the latest metadata);
    engine-side requirement for incremental corpora (SURVEY §2.11).

    Output: (key_col, value_col, valid_from, valid_to, n_obs) — n_obs =
    number of observations the interval collapsed.
    """
    tb = tiebreak_col or value_col
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(tb).asc()
    )
    opens = (
        df.withColumn("_prev", F.lag(F.col(value_col)).over(w))
        .withColumn(
            "_open",
            F.when(
                F.col("_prev").isNull()
                | (F.col(value_col) != F.col("_prev")),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn("_island", F.sum("_open").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ))
    )
    islands = opens.groupBy(key_col, "_island").agg(
        # all rows in an island share the value by construction; min is
        # the order-insensitive way to say "the value"
        F.min(F.col(value_col)).alias(value_col),
        F.min(F.col(ts_col)).alias("valid_from"),
        F.count(F.lit(1)).alias("n_obs"),
    )
    iw = Window.partitionBy(key_col).orderBy(F.col("valid_from").asc())
    return islands.withColumn(
        "valid_to", F.lead("valid_from").over(iw)
    ).select(key_col, value_col, "valid_from", "valid_to", "n_obs")


def gap_fill(events: DataFrame, bucket_s: int, ts_col: str = "ts",
             key_col: str = "user_id", value_col: str = "value",
             tiebreak_col: str = "event_id") -> DataFrame:
    """Regular-grid resampling with forward fill — the time-series
    "densify" every feature pipeline needs before window models: one row
    per (key, bucket) on a ``bucket_s``-second grid spanning each key's
    first..last event bucket, carrying the key's last observation
    at-or-before the bucket's end.

    Output: (key, bucket_ts [epoch seconds, long], cents [long],
    observed [int 0/1]). Values convert per-row to integer cents BEFORE
    any aggregation (repo cents convention; float fills can't be
    oracle-hashed), timestamps compare in epoch MICROS (int64 in both
    engines; epoch-seconds would truncate differently than DuckDB's
    fractional epoch()).

    Semantics: within a bucket the winning observation is the max
    (ts_us, tiebreak) event; buckets with no event inherit the previous
    bucket's fill (``last(..., ignorenulls=True)`` running window). The
    first bucket of every key is observed by construction (the grid
    starts at the key's min event), so no fill is ever NULL.

    Scale shape: one groupBy(key) for the span, one ``sequence`` +
    ``explode`` to mint the grid (rows ≈ span/bucket_s per key — choose
    bucket_s so this is O(events), the usual densify contract), one
    per-(key,bucket) reduce for the winner, one left join grid⋈obs on
    (key, bucket), one running window per key. All shuffles are on the
    key; no UDF. Skewed keys (one user with a year of events) cost one
    window partition — bound bucket count per key upstream if a key's
    span/bucket_s can exceed executor memory.
    """
    # parquet timestamps arrive NTZ; the UTC-session cast is the repo's
    # established micros conversion (matches the oracle's epoch_us)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    bucket_us = int(bucket_s) * 1_000_000
    ev = events.select(
        F.col(key_col).alias("key"),
        us.alias("ts_us"),
        F.col(tiebreak_col).alias("tb"),
        F.round(F.col(value_col) * 100).cast("long").alias("cents"),
    ).withColumn(
        # true int64 FLOOR div — double division could round a
        # near-boundary micros value across the bucket edge, and floor
        # (not truncate) keeps pre-1970 timestamps oracle-exact
        "bucket", F.expr(_floordiv("ts_us", f"{bucket_us}L"))
    )
    wlast = Window.partitionBy("key", "bucket").orderBy(
        F.col("ts_us").desc(), F.col("tb").desc()
    )
    obs = (
        ev.withColumn("rn", F.row_number().over(wlast))
        .where(F.col("rn") == 1)
        .select("key", "bucket", "cents")
    )
    grid = (
        ev.groupBy("key")
        .agg(F.min("bucket").alias("b0"), F.max("bucket").alias("b1"))
        .select(
            "key",
            F.explode(F.sequence(F.col("b0"), F.col("b1"))).alias("bucket"),
        )
    )
    wfill = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(obs, ["key", "bucket"], "left")
        .select(
            F.col("key").alias(key_col),
            (F.col("bucket") * F.lit(bucket_s)).alias("bucket_ts"),
            F.last("cents", ignorenulls=True).over(wfill).alias("cents"),
            F.col("cents").isNotNull().cast("int").alias("observed"),
        )
    )


def concurrency_curve(intervals: DataFrame, start_col: str = "start_us",
                      end_col: str = "end_us",
                      bucket_s: int = 86400) -> DataFrame:
    """(t, conc) — the number of concurrently-active intervals at every
    boundary instant, for half-open intervals [start, end) in epoch
    micros. The classic sweep-line, re-expressed as a DISTRIBUTED
    hierarchical prefix sum so no stage ever sorts the whole fact table
    on one partition:

    1. boundaries → per-instant NET delta (+1 starts, −1 ends, one
       groupBy). Netting first makes every later step tie-free: conc at
       t is "starts ≤ t minus ends ≤ t" exactly, the [s, e) semantics.
    2. LOCAL running sum within a coarse time bucket (window partitioned
       by ``t div bucket_s`` — parallel across buckets).
    3. bucket TOTALS → exclusive running offsets. This level-2 window is
       deliberately unpartitioned: its input is one row per bucket
       (days), bounded and tiny — the single-partition sort everyone
       writes for level 1 happens here on ~O(span/bucket_s) rows
       instead of O(boundaries). Broadcast back, add to the local sums.

    Scale: level 1 shuffles once on the bucket key and parallelizes per
    bucket; a 100 TB sweep is bottlenecked only by its widest single
    bucket — pick bucket_s so one bucket's boundaries fit an executor
    (same contract as any keyed window). No UDF, no global sort.
    """
    bucket_us = int(bucket_s) * 1_000_000
    bounds = intervals.select(
        F.col(start_col).alias("t"), F.lit(1).alias("d")
    ).unionAll(
        intervals.select(F.col(end_col).alias("t"), F.lit(-1).alias("d"))
    )
    net = (
        bounds.groupBy("t")
        .agg(F.sum("d").alias("net"))
        .withColumn("bucket", F.expr(_floordiv("t", f"{bucket_us}L")))
    )
    wloc = (
        Window.partitionBy("bucket")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    loc = net.withColumn("loc", F.sum("net").over(wloc))
    woff = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = (
        net.groupBy("bucket")
        .agg(F.sum("net").alias("btot"))
        .withColumn(
            "off", F.coalesce(F.sum("btot").over(woff), F.lit(0))
        )
        .select("bucket", "off")
    )
    return loc.join(F.broadcast(offs), "bucket").select(
        "t", (F.col("loc") + F.col("off")).cast("long").alias("conc")
    )


def funnel(events: DataFrame, steps: tuple[str, ...],
           key_col: str = "user_id", ts_col: str = "ts",
           type_col: str = "event_type",
           tiebreak_col: str = "event_id") -> DataFrame:
    """First-touch funnel per key: the earliest time each ordered step
    completes, where step i+1 only counts STRICTLY AFTER step i in
    (ts, tiebreak) order — the conversion primitive (view → click →
    purchase) every event pipeline reports.

    Output: (key, steps_completed, t1_us..tN_us nullable epoch micros).
    Semantics = the order-k state machine: scan the key's step events
    in (ts, tiebreak) order; the first ``steps[0]`` sets t1, the first
    ``steps[1]`` seen after t1 sets t2, and so on. Equivalently (how
    the oracle states it relationally): t1 = lexicographic-min view,
    t2 = min click with order key > t1's, … — the fold and the chained
    mins provably agree because each ti is the order-minimum of its
    candidates.

    Scale shape: ONE shuffle (groupBy key) + an in-row ``array_sort`` +
    ``aggregate`` fold — no self-join per step (the textbook k-step
    funnel as k chained joins is k fact shuffles and quadratic under
    ties). The per-key event array must fit in a row — same contract
    as any collect_list sessionization; pre-filter to step types keeps
    it to funnel traffic only.
    """
    n = len(steps)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    ev = events.where(F.col(type_col).isin(*steps)).select(
        F.col(key_col).alias("key"),
        F.struct(
            us.alias("us"),
            F.col(tiebreak_col).alias("tb"),
            F.col(type_col).alias("typ"),
        ).alias("e"),
    )
    per = ev.groupBy("key").agg(
        F.array_sort(F.collect_list("e")).alias("es")
    )
    init = F.struct(
        *[F.lit(None).cast("long").alias(f"t{i + 1}") for i in range(n)]
    )

    def fold(acc, e):
        fields = []
        for i in range(n):
            t = f"t{i + 1}"
            cond = acc[t].isNull() & (e["typ"] == steps[i])
            if i > 0:
                cond = cond & acc[f"t{i}"].isNotNull()
            fields.append(
                F.when(cond, e["us"]).otherwise(acc[t]).alias(t)
            )
        return F.struct(*fields)

    state = F.aggregate(F.col("es"), init, fold)
    # deepest completed step: later whens overwrite, so iterate shallow→deep
    done = F.lit(0)
    for i in range(1, n + 1):
        done = F.when(state[f"t{i}"].isNotNull(), i).otherwise(done)
    return per.select(
        F.col("key").alias(key_col),
        done.cast("int").alias("steps_completed"),
        *[state[f"t{i + 1}"].alias(f"t{i + 1}_us") for i in range(n)],
    )


def retention_cohorts(events: DataFrame, bucket_s: int = 604800,
                      key_col: str = "user_id",
                      ts_col: str = "ts") -> DataFrame:
    """(cohort, age, n_users) — the retention matrix: users grouped by
    the time bucket of their FIRST event (the cohort), counted once per
    bucket-age at which they were active again. The classic growth
    analytics query, and the canonical "self-join on first-touch" trap:
    the naive spelling joins the fact to a first-event subquery per row.

    Shape here: distinct (key, bucket) activity (one groupBy — dedup
    before anything fans out), min-bucket cohort per key (same key
    shuffle, Catalyst reuses the partitioning), one join on the key,
    final (cohort, age) count — map-side combinable. No window, no
    fact self-join.

    Buckets are epoch-micros ``div`` (true int64, q81 discipline);
    ``age`` = activity bucket − cohort bucket, 0 for the signup bucket.
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    bucket_us = int(bucket_s) * 1_000_000
    act = (
        events.select(F.col(key_col).alias("key"), us.alias("ts_us"))
        .withColumn("wk", F.expr(_floordiv("ts_us", f"{bucket_us}L")))
        .select("key", "wk")
        .distinct()
    )
    cohorts = act.groupBy("key").agg(F.min("wk").alias("cohort"))
    return (
        act.join(cohorts, "key")
        .select("cohort", (F.col("wk") - F.col("cohort")).alias("age"))
        .groupBy("cohort", "age")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def time_weighted_avg(events: DataFrame, key_col: str = "user_id",
                      ts_col: str = "ts", value_col: str = "value",
                      tiebreak_col: str = "event_id") -> DataFrame:
    """(key, span_us, integral, twap_cents) — the time-weighted average
    of an irregularly-observed value: each observation holds until the
    next one (the step function gap_fill materializes on a grid,
    integrated here EXACTLY instead — no grid, no resolution error).

    ``integral`` = Σ cents_i · (t_{i+1} − t_i) in int64 cents·µs over
    the key's [first, last] observation window;
    ``twap_cents`` = floor(integral / span) (exact integer — floor, not
    truncate, so negative-value integrals match DuckDB `//`; a plain AVG
    over-weights bursts of observations — TWAP is what "average price/
    load/score over time" actually means). Keys with ONE observation
    (span 0) emit that observation as their twap (pinned by pytest).

    Overflow: |cents| · span_us must stay < 2^63 — cents ~3×10^4 times
    a month of micros (2.6×10^12) is ~10^17; switch to millis upstream
    past a ~100-year × 10^6-cent product.

    Scale: ONE shuffle (the per-key window); lead + sum share the
    partitioning. The q95 oracle states the identical lead-and-sum.
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    ev = events.select(
        F.col(key_col).alias("key"),
        us.alias("ts_us"),
        F.col(tiebreak_col).alias("tb"),
        F.round(F.col(value_col) * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("key").orderBy("ts_us", "tb")
    stepped = ev.withColumn(
        "dt", F.lead("ts_us").over(w) - F.col("ts_us")
    )
    agg = stepped.groupBy("key").agg(
        (F.max("ts_us") - F.min("ts_us")).alias("span_us"),
        F.sum(F.col("cents") * F.col("dt")).alias("integral"),
        F.min(F.struct("ts_us", "tb", "cents"))["cents"].alias("_first"),
    )
    return agg.select(
        F.col("key").alias(key_col),
        "span_us",
        F.coalesce("integral", F.lit(0)).cast("long").alias("integral"),
        F.when(F.col("span_us") == 0, F.col("_first"))
        .otherwise(F.expr(_floordiv("integral", "span_us")))
        .cast("long")
        .alias("twap_cents"),
    )


def revert_events(
    edits: DataFrame,
    object_col: str = "object_id",
    state_col: str = "state",
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Revert (edit-war) detection over an object edit history — the
    vandalism signal at the heart of the reference's mission
    (osmcha/changeset.py flags SUSPICIOUS changesets from per-changeset
    heuristics; reverts are the corpus-level cross-changeset signal its
    row-at-a-time architecture cannot see: an object restored to a
    previous state right after someone changed it).

    An edit is a REVERT iff, in the object's (ts, tiebreak)-ordered
    history,

        state_i == state_{i-2}  AND  state_{i-1} != state_i

    — the object came BACK to what it was before the intervening edit.
    Output: one row per revert — ``(object, event_id, ts_us, reverter,
    reverted_user, state)`` where ``reverted_user`` authored the
    intervening (undone) edit. Self-reverts (same user undoing
    themselves) are included; filter ``reverter != reverted_user``
    for the edit-WAR subset.

    Scale shape: both lags and the user lag share ONE window
    partitioning (object hash) and one sort — a single Exchange, state
    per task bounded by one object's history (the q144
    gaps-and-islands discipline); no join, no second pass."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    ev = edits.select(
        F.col(object_col).alias("object"),
        F.col(tiebreak_col).alias("event_id"),
        us.alias("ts_us"),
        F.col(user_col).alias("reverter"),
        F.col(state_col).alias("state"),
    )
    w = Window.partitionBy("object").orderBy("ts_us", "event_id")
    lagged = ev.select(
        "object", "event_id", "ts_us", "reverter", "state",
        F.lag("state", 1).over(w).alias("__s1"),
        F.lag("state", 2).over(w).alias("__s2"),
        F.lag("reverter", 1).over(w).alias("reverted_user"),
    )
    return (
        lagged.where(
            (F.col("state") == F.col("__s2"))
            & (F.col("__s1") != F.col("state"))
        )
        .select("object", "event_id", "ts_us", "reverter",
                "reverted_user", "state")
    )


def gap_histogram(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str | None = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Dyadic inter-arrival-time histogram — the latency/burstiness
    profile an ops pipeline reads before sizing watermarks, session
    gaps and TTLs: per key, the gap between consecutive events, bucketed
    by ``flog2(gap_us + 1)`` (exact integer floor-log2, text.py's
    bit-length idiom — bucket 0 = same-microsecond, each bucket doubles)
    and counted per ``type_col`` of the LATER event (None = one global
    histogram). First event per key has no gap and is excluded.

    Order within a key is ``(ts, id_col)`` — the q144 deterministic
    tiebreak, so equal-timestamp events produce stable zero-gap
    buckets in both engines.

    Output: ``(event_type?, bucket, n, min_gap_us, max_gap_us)`` —
    the min/max per bucket ride along so the dyadic envelope can be
    sanity-checked (min >= 2^bucket − 1, max < 2^(bucket+1) − 1).

    Scale shape: ONE key-hash window (lag) then a map-side-combined
    groupBy of the RESULT — the histogram is ≤ types × 64 rows no
    matter the corpus; nothing after the window touches event rows
    twice.
    """
    from osmcha_spark.operators.text import flog2_col

    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(key_col).orderBy(ts_us, F.col(id_col))
    gap = ts_us - F.lag(ts_us).over(w)
    base = events.withColumn("__gap", gap).where(F.col("__gap").isNotNull())
    bucket = flog2_col(F.col("__gap") + 1).cast("long")
    keys = ([F.col(type_col).alias("event_type")] if type_col else []) \
        + [bucket.alias("bucket")]
    return (
        base.select(*keys, "__gap")
        .groupBy(*[c for c in (["event_type"] if type_col else [])],
                 "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n"),
             F.min("__gap").alias("min_gap_us"),
             F.max("__gap").alias("max_gap_us"))
    )
