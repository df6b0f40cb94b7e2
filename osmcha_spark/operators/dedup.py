"""Text deduplication operators for training-data pipelines.

Engine-only (no reference counterpart; SURVEY.md §2 engine rows): the
standard large-corpus dedup ladder, each expressed as native DataFrame ops
with portable arithmetic so DuckDB can oracle-check every stage.

- **exact_dedup** — md5-keyed group-by; keeps the lowest doc_id per text.
  One shuffle on a 128-bit key; at 100 TB, partial aggregation means each
  mapper emits one row per distinct local text.
- **shingles** — character 3-grams of lower(text), distinct per doc, via
  ``sequence`` + ``transform`` (JVM-side; no UDF).
- **minhash_signatures / minhash_candidates** — MinHash+LSH:
  ``h_i(s) = (a_i·H(s) + b_i) mod p`` with p = 2^31-1 and H(s) a 60-bit
  md5 prefix mod p — all integer Column arithmetic, reproducible in ANSI
  SQL (no engine-private hash). The signature is a shuffle-free array
  projection (array_min over transform); signatures band into LSH
  buckets; pairs sharing a band bucket are candidates (self-join on the
  band key) — the banding join is the ONLY exchange in the pipeline.
- **jaccard_pairs** — exact n-gram Jaccard via inverted-index join
  (explode shingles → join on shingle → count-per-pair), the verification
  stage after LSH or a standalone exact dedup at moderate scale.
- **simhash** — 64-bit SimHash over whitespace tokens: per-bit ±1 majority
  vote of token hashes, assembled with integer Column math.

Scale notes: every self-join here is an equi-join on a derived integer/
string key — broadcast-able when one side is small, AQE-splittable when
skewed (a stop-shingle is a hot key; ``jaccard_pairs`` drops shingles with
document frequency > ``max_df`` exactly like an inverted index drops stop
words).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Portable 31-bit universal-hash family: p Mersenne, (a_i, b_i) fixed odd
# constants < p. Products stay < 2^62 — safe in any engine's int64.
MINHASH_P = 2_147_483_647
MINHASH_COEFFS = [
    (1_203_077_359, 456_789_123), (754_923_881, 987_654_321),
    (1_847_591_203, 13_579_111), (392_812_117, 864_201_357),
    (1_555_555_333, 777_777_101), (611_234_567, 246_810_121),
    (1_999_999_817, 135_791_113), (888_888_883, 975_312_468),
    (1_357_911_131, 642_097_531), (468_024_681, 108_642_097),
    (1_727_272_717, 864_208_642), (999_999_937, 531_975_311),
    (1_111_111_121, 246_802_468), (678_901_235, 903_276_543),
    (1_444_444_447, 87_654_321), (543_216_789, 678_954_321),
]
N_BANDS = 4
ROWS_PER_BAND = 4  # 16 hashes = 4 bands × 4 rows


def md5_long_col(c) -> F.Column:
    """60-bit integer from the md5 hex prefix — the engine-neutral string
    hash (DuckDB: CAST('0x'||substring(md5(x),1,15) AS BIGINT))."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def exact_dedup(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """(text_hash, rep_id, n_copies): one row per distinct text; rep_id is
    the smallest member id (the row a dedup pipeline would keep)."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("text_hash"), id_col)
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias("rep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def shingles_col(text, n: int = 3) -> F.Column:
    """array<string> of distinct lowercase character n-grams."""
    low = F.lower(text)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(low) - (n - 1), F.lit(1))),
            lambda i: F.substring(low, i, n),
        )
    )


def doc_shingles(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """(doc_id, shingle) exploded — the inverted-index input."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(shingles_col(F.col(text_col), n)).alias("shingle"),
    )


def minhash_signatures(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """(doc_id, h0..h15): the MinHash signature, all-Column arithmetic.

    A pure PROJECTION — no explode, no shuffle: the shingle set stays an
    array and each h_i is ``array_min(transform(...))`` over it, so the
    signature costs one narrow map stage regardless of corpus size (the
    earlier explode → groupBy(doc_id) formulation shuffled every
    (doc, shingle) row; measured 8× slower at bench scale). The base md5
    hash is materialized once per doc in an intermediate select so the 16
    hash functions don't each re-hash every shingle. Rows with NULL text
    are dropped, matching the explode formulation's behavior.
    """
    sh = shingles_col(F.col(text_col), n)
    base = F.transform(
        sh, lambda s: F.pmod(md5_long_col(s), F.lit(MINHASH_P))
    )
    mid = docs.where(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("doc_id"), base.alias("__base")
    )
    cols = [
        F.array_min(
            F.transform(
                F.col("__base"),
                lambda h: F.pmod(F.lit(a) * h + F.lit(b), F.lit(MINHASH_P)),
            )
        ).alias(f"h{i}")
        for i, (a, b) in enumerate(MINHASH_COEFFS)
    ]
    return mid.select("doc_id", *cols)


def minhash_candidates(signatures: DataFrame) -> DataFrame:
    """LSH candidate pairs (a < b) sharing at least one band bucket."""
    bands = []
    for band in range(N_BANDS):
        cols = [
            F.col(f"h{band * ROWS_PER_BAND + r}")
            for r in range(ROWS_PER_BAND)
        ]
        bands.append(
            F.struct(
                F.lit(band).alias("band"),
                F.concat_ws("_", *[c.cast("string") for c in cols]).alias(
                    "key"
                ),
            )
        )
    exploded = signatures.select(
        "doc_id", F.explode(F.array(*bands)).alias("b")
    ).select("doc_id", F.col("b.band").alias("band"),
             F.col("b.key").alias("key"))
    left = exploded.select(F.col("doc_id").alias("a"), "band", "key")
    right = exploded.select(F.col("doc_id").alias("b"), "band", "key")
    return (
        left.join(right, ["band", "key"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def jaccard_pairs(docs: DataFrame, threshold: float,
                  text_col: str = "text", id_col: str = "doc_id",
                  n: int = 3, max_df: int | None = None,
                  max_df_frac: float | None = None) -> DataFrame:
    """(a, b, inter, union_size, jaccard) for pairs with Jaccard ≥
    threshold, via the inverted-index join.

    ``max_df`` is the stop-shingle skew guard: shingles with df > max_df
    are dropped from CANDIDATE GENERATION only — a hot shingle with df d
    contributes d²/2 join rows, so one " th" n-gram at corpus scale turns
    the index join quadratic; bounding d ≤ max_df bounds the join fan-out.
    Candidate pairs are then verified EXACTLY against the full shingle
    sets (array_intersect on the collected grams), so every emitted
    (inter, union_size, jaccard) is identical to the unguarded path; the
    only approximation is recall — a pair whose shared shingles are ALL
    stop-shingles is never considered (vanishingly unlikely at high
    thresholds: near-dup docs share their rare shingles too).

    ``max_df_frac`` expresses the bound as a corpus fraction —
    ``df ≤ floor(N·frac)`` — with N entering the plan as a broadcast
    1-row aggregate, NOT an eager driver-side ``docs.count()`` (VERDICT
    r2): building the DataFrame triggers no job. ``floor(N·0.5)``
    ≡ ``N div 2`` exactly, which is what the q09 oracle states. At most
    one of ``max_df`` / ``max_df_frac`` may be given.
    """
    if max_df is not None and max_df_frac is not None:
        raise ValueError("give max_df or max_df_frac, not both")
    sh = doc_shingles(docs, text_col, id_col, n)

    if max_df is None and max_df_frac is None:
        left = sh.select(F.col("doc_id").alias("a"), "shingle")
        right = sh.select(F.col("doc_id").alias("b"), "shingle")
        sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
        inter = (
            left.join(right, "shingle")
            .where(F.col("a") < F.col("b"))
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
        sz_a = sizes.select(
            F.col("doc_id").alias("a"), F.col("sz").alias("sza")
        )
        sz_b = sizes.select(
            F.col("doc_id").alias("b"), F.col("sz").alias("szb")
        )
        scored = inter.join(sz_a, "a").join(sz_b, "b")
    else:
        df_counts = sh.groupBy("shingle").agg(
            F.count(F.lit(1)).alias("df")
        )
        if max_df is not None:
            kept = df_counts.where(F.col("df") <= max_df)
        else:
            n_row = docs.agg(F.count(F.lit(1)).alias("__n"))
            kept = df_counts.join(F.broadcast(n_row)).where(
                F.col("df") <= F.floor(F.col("__n") * F.lit(max_df_frac))
            )
        pair_src = sh.join(kept.select("shingle"), "shingle")
        cand = (
            pair_src.select(F.col("doc_id").alias("a"), "shingle")
            .join(pair_src.select(F.col("doc_id").alias("b"), "shingle"),
                  "shingle")
            .where(F.col("a") < F.col("b"))
            .select("a", "b")
            .distinct()
        )
        grams = sh.groupBy("doc_id").agg(
            F.collect_list("shingle").alias("grams"),
            F.count(F.lit(1)).alias("sz"),
        )
        g_a = grams.select(
            F.col("doc_id").alias("a"),
            F.col("grams").alias("ga"), F.col("sz").alias("sza"),
        )
        g_b = grams.select(
            F.col("doc_id").alias("b"),
            F.col("grams").alias("gb"), F.col("sz").alias("szb"),
        )
        scored = (
            cand.join(g_a, "a").join(g_b, "b")
            .withColumn(
                "inter",
                F.size(F.array_intersect(F.col("ga"), F.col("gb"))),
            )
        )
    return (
        scored
        .withColumn("union_size", F.col("sza") + F.col("szb") - F.col("inter"))
        .withColumn("jaccard", F.col("inter") / F.col("union_size"))
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", "inter", "union_size", "jaccard")
    )


def simhash(docs: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """(doc_id, simhash): 64-bit SimHash over whitespace tokens.

    Per bit b: sign of Σ_tokens (bit_b(H(token)) ? +1 : -1); assembled as
    Σ (sign_b > 0) · 2^b in int64 (bit 63 via signed wrap: set it as
    -2^63 + ... using bitwise OR on long)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), "\\s+"),
                lambda t: t != "",
            )
        ).alias("token"),
    )
    h = md5_long_col(F.col("token"))
    aggs = [
        F.sum(
            F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
        ).alias(f"s{b}")
        for b in range(64)
    ]
    sums = toks.groupBy("doc_id").agg(*aggs)
    acc = F.lit(0).cast("long")
    for b in range(64):
        bit = F.when(F.col(f"s{b}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        acc = acc.bitwiseOR(F.shiftleft(bit, b))
    return sums.select("doc_id", acc.alias("simhash"))


def token_sets(docs: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """(doc_id, token) — DISTINCT lowercase whitespace tokens per doc,
    the set representation behind :func:`prefix_jaccard_pairs`. Pure
    projection + explode; portable (oracle: DISTINCT over
    string_split_regex)."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.array_distinct(
                F.filter(
                    F.split(F.lower(F.col(text_col)), "\\s+"),
                    lambda t: t != "",
                )
            )
        ).alias("token"),
    )


def prefix_jaccard_pairs(docs: DataFrame, threshold: float,
                         text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """(a, b, inter, union_size, jaccard) for doc pairs whose TOKEN-set
    Jaccard ≥ threshold, found via PREFIX FILTERING (Bayardo et al.,
    "Scaling Up All Pairs Similarity Search", WWW'07; the AllPairs/PPJoin
    family) — the scale tier above :func:`jaccard_pairs`' inverted index.

    Prefix-filter theorem: order every doc's tokens by one GLOBAL total
    order (here ascending (df, token) — rarest first); if J(x, y) ≥ t,
    the two prefixes of length ``|x| - ceil(t·|x|) + 1`` must share at
    least one token. So only the first p tokens of each doc are indexed,
    and candidate generation joins prefixes instead of full postings:
    a token's join fan-out is its df *within prefixes*, and the hottest
    (stop) tokens sort LAST — they almost never enter a prefix. That is
    the skew-killer: q09 needs an explicit ``max_df`` recall guard, this
    needs none and stays EXACT (the filter is lossless), which is why
    the q80 oracle is the exact all-pairs computation rather than a
    mirrored candidate generation (CLAUDE.md's mirror rule applies to
    lossy candidate generation; this one is provably complete).

    Prefix length is computed in pure int64 — ``p = sz - ceil(num·sz /
    den) + 1`` with threshold ≈ num/den via Fraction.limit_denominator —
    so a float ulp can never shorten a prefix below the theorem's bound.
    Verification recomputes exact Jaccard on the full token arrays
    (array_intersect), so emitted values are exact, not approximate.

    Scale shape: one vocab agg (token df), one group-collect per doc,
    one prefix equi-join, one broadcast-free verify join on doc_id.
    All pure Column ops; no UDF, no cartesian. The per-doc subtree
    appears several times in the STATIC plan (prefixes + both verify
    sides) but executes once: Spark's exchange reuse collapses the
    identical shuffles at runtime (`ReusedExchange` in the executed
    plan, pinned by tests/test_plans.py) — no manual persist needed.
    """
    from fractions import Fraction

    frac = Fraction(threshold).limit_denominator(1_000_000)
    num, den = frac.numerator, frac.denominator

    toks = token_sets(docs, text_col, id_col)
    df_counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    per_doc = (
        toks.join(df_counts, "token")
        .groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("df", "token"))
            ).alias("ordered"),
            F.count(F.lit(1)).alias("sz"),
        )
        .select(
            "doc_id",
            F.col("ordered.token").alias("tokens"),  # rarest-first
            "sz",
            # p = sz - ceil(num*sz/den) + 1, all-integer ceil
            (
                F.col("sz")
                - F.expr(f"({num}L * sz + {den - 1}L) div {den}L")
                + F.lit(1)
            ).cast("int").alias("p"),
        )
    )
    prefixes = per_doc.select(
        "doc_id",
        F.explode(F.slice(F.col("tokens"), F.lit(1), F.col("p"))).alias(
            "token"
        ),
    )
    cand = (
        prefixes.select(F.col("doc_id").alias("a"), "token")
        .join(prefixes.select(F.col("doc_id").alias("b"), "token"), "token")
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    full_a = per_doc.select(
        F.col("doc_id").alias("a"),
        F.col("tokens").alias("ta"), F.col("sz").alias("sza"),
    )
    full_b = per_doc.select(
        F.col("doc_id").alias("b"),
        F.col("tokens").alias("tb"), F.col("sz").alias("szb"),
    )
    return (
        cand.join(full_a, "a").join(full_b, "b")
        .withColumn(
            "inter", F.size(F.array_intersect(F.col("ta"), F.col("tb")))
        )
        .withColumn(
            "union_size", F.col("sza") + F.col("szb") - F.col("inter")
        )
        .withColumn("jaccard", F.col("inter") / F.col("union_size"))
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", "inter", "union_size", "jaccard")
    )


def shared_spans(docs: DataFrame, k: int = 8, id_col: str = "doc_id",
                 text_col: str = "text",
                 max_df: int | None = None) -> DataFrame:
    """(doc_a, doc_b, span_tokens, start_a, start_b) — the longest run of
    exactly-shared consecutive tokens per document pair, over every pair
    sharing at least one ``k``-token span: substring-level exact dedup,
    the operator class of Lee et al. 2022 ("Deduplicating Training Data
    Makes Language Models Better") at token granularity — the rung
    between whole-doc exact dedup (md5 group-by) and near-dup (MinHash/
    SimHash/Jaccard), catching the boilerplate/quote/mirror overlap that
    is invisible to both. No reference counterpart (engine-only).

    Semantics: tokens are lowercased whitespace splits (the engine's
    standard tokenization, char-for-char equal to the oracle's). Any
    shared token span of length >= k contains a shared k-shingle, so the
    k-shingle inverted-index equi-join is LOSSLESS candidate generation;
    matched shingle positions on one (pair, diagonal) chain into runs via
    the gaps-and-islands trick (pa - row_number), and a run of c
    consecutive matches is a shared span of exactly c + k - 1 tokens.
    Per pair the longest span wins (ties: smallest start_a, start_b).
    Positions are 1-based token indices.

    ``max_df`` (optional) drops shingles whose document frequency exceeds
    it from candidate generation — the stop-shingle skew guard, exactly
    jaccard_pairs' contract: recall-only approximation (a span ALL of
    whose k-shingles are stop-shingles is missed; its spans through rarer
    shingles shorten to the surviving runs). Pass None for lossless.

    Scale shape: one explode to Θ(total tokens) shingle rows, hashed to
    int64 (md5 prefix) BEFORE the one candidate-generation shuffle (the
    equi-join on the hash — AQE-splittable; max_df bounds the worst
    fan-out, df capped means <= df^2 match rows per shingle). The island
    windows partition by (pair, diagonal) — never a global sort; output
    and window state are Θ(matched positions), bounded by the candidate
    join. A 100 TB corpus runs this per shard/bucket the way an inverted
    index shards: the shingle hash is the natural partition key.
    """
    from pyspark.sql import Window

    ts = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    toks = (
        docs.select(F.col(id_col).alias("doc_id"), ts.alias("ts"))
        .where(F.size("ts") >= k)
    )
    # one generator per select; the slice/hash projection rides the next
    sh = toks.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(1), F.size("ts") - (k - 1))
        ).alias("i"),
        "ts",
    ).select(
        "doc_id", "i",
        md5_long_col(
            F.concat_ws(" ", F.slice(F.col("ts"), F.col("i"), k))
        ).alias("h"),
    )
    if max_df is not None:
        keep = (
            sh.groupBy("h")
            .agg(F.countDistinct("doc_id").alias("df"))
            .where(F.col("df") <= int(max_df))
            .select("h")
        )
        sh = sh.join(keep, "h")
    m = (
        sh.select(F.col("doc_id").alias("doc_a"), F.col("i").alias("pa"),
                  "h")
        .join(
            sh.select(F.col("doc_id").alias("doc_b"),
                      F.col("i").alias("pb"), "h"),
            "h",
        )
        .where(F.col("doc_a") < F.col("doc_b"))
        .withColumn("diag", F.col("pa") - F.col("pb"))
    )
    wisl = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pa")
    runs = (
        m.withColumn("isl", F.col("pa") - F.row_number().over(wisl))
        .groupBy("doc_a", "doc_b", "diag", "isl")
        .agg(
            (F.count(F.lit(1)) + F.lit(k - 1)).cast("long")
            .alias("span_tokens"),
            F.min("pa").cast("long").alias("start_a"),
            F.min("pb").cast("long").alias("start_b"),
        )
    )
    wbest = Window.partitionBy("doc_a", "doc_b").orderBy(
        F.col("span_tokens").desc(), F.col("start_a"), F.col("start_b")
    )
    return (
        runs.withColumn("rn", F.row_number().over(wbest))
        .where(F.col("rn") == 1)
        .select("doc_a", "doc_b", "span_tokens", "start_a", "start_b")
    )


def remove_shared_spans(docs: DataFrame, k: int = 8,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, n_removed, clean_text) — substring-level dedup
    as an ACTION: delete from each document every token covered by a
    >= k-token span it shares with an EARLIER document (lower doc_id),
    keeping the first occurrence corpus-wide. The removal half of the
    Lee et al. 2022 operator (:func:`shared_spans` is the detection
    half): boilerplate, licenses, and mirrored paragraphs vanish from
    all but one copy while unique prose is untouched.

    Equivalence that makes this exact: a maximal shared run of c >= k
    tokens is covered by exactly its c−k+1 constituent k-shingles, whose
    position union is the full run; a sub-k overlap contributes no
    shared shingle. So "positions covered by any k-shingle whose
    corpus-wide minimum doc_id is smaller than mine" IS "tokens inside
    maximal shared spans >= k" — no pair enumeration, no run chaining.
    Self-repeats within one document do not trigger removal (min == own
    id). Output text is the kept tokens rejoined with single spaces
    (lowercased, whitespace-normalized — stated, and applied uniformly
    so untouched documents are byte-stable under re-runs; n_tokens
    counts the original tokens, n_removed the deleted ones).

    Scale shape: Θ(total tokens) shingle rows hashed to int64; ONE
    groupBy(h) computes each shingle's corpus-wide min doc (map-side
    combinable — the hot-boilerplate shingle reduces before it moves);
    the ×k coverage explode runs only on DUPLICATED shingle hits; one
    final groupBy(doc) rebuilds text (per-doc token list bounded by doc
    length, the standard per-document contract).
    """
    from pyspark.sql import Window  # noqa: F401  (parity with siblings)

    ts = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    toks = docs.select(F.col(id_col).alias("doc_id"), ts.alias("ts"))
    flat = toks.select(
        "doc_id", F.posexplode("ts").alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    sh = toks.where(F.size("ts") >= k).select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.size("ts") - (k - 1))).alias("i"),
        "ts",
    ).select(
        "doc_id", "i",
        md5_long_col(
            F.concat_ws(" ", F.slice(F.col("ts"), F.col("i"), k))
        ).alias("h"),
    )
    first = sh.groupBy("h").agg(F.min("doc_id").alias("min_doc"))
    covered = (
        sh.join(first, "h")
        .where(F.col("min_doc") < F.col("doc_id"))
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("i"), F.col("i") + (k - 1))
            ).alias("pos"),
        )
        .distinct()
    )
    kept = flat.join(covered, ["doc_id", "pos"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
        ).alias("clean_text"),
    )
    totals = flat.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens")
    )
    base = docs.select(F.col(id_col).alias("doc_id"))
    return (
        base.join(totals, "doc_id", "left")
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            (F.coalesce("n_tokens", F.lit(0))
             - F.coalesce("n_kept", F.lit(0))).cast("long")
            .alias("n_removed"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )
