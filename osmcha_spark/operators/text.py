"""Text-analysis operators for training-data pipelines (engine-only).

All pure Column expressions (JVM, codegen, oracle-expressible):

- **token_count** — whitespace tokens and a BPE-ish subword proxy
  (alnum runs + punctuation as separate tokens via regexp counting).
- **quality_score** — length / punctuation-ratio / stopword-ratio /
  mean-token-length features + a composite score.
- **lang_id** — deterministic stopword-hit heuristic over a fixed
  5-language table; argmax with fixed tie order. A plumbing-grade
  classifier (documented as such), not a model.
- **fingerprint** — 64-bit polynomial rolling hash of the normalized text
  (whitespace-collapsed lowercase), the cheap near-exact dedup key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

STOPWORDS = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "und", "ist", "nicht"],
    "fr": ["le", "les", "et", "une", "est"],
    "es": ["los", "las", "el", "una", "es"],
    "pt": ["os", "as", "um", "uma", "não"],
}
_LANG_ORDER = ["en", "de", "fr", "es", "pt"]


def tokens_col(text: Column) -> Column:
    """Lowercased ``\\s+``-split tokens (any whitespace run is one
    separator). NOTE: :func:`tfidf_topk` deliberately uses a DIFFERENT
    tokenizer (single-space split, case-preserving) to stay character-
    for-character equal to its SQL oracle's ``string_split(text, ' ')``
    — do not "unify" one onto the other without updating the oracles."""
    return F.filter(F.split(F.lower(text), "\\s+"), lambda t: t != "")


def token_count(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    text = F.col(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens_col(text)).alias("n_ws_tokens"),
        # BPE-ish proxy: every alphanumeric run + every non-space symbol
        (
            F.regexp_count(text, F.lit("[A-Za-z0-9]+"))
            + F.regexp_count(text, F.lit("[^A-Za-z0-9\\s]"))
        ).alias("n_subword_tokens"),
        F.length(text).alias("n_chars"),
    )


def quality_score(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    text = F.col(text_col)
    toks = tokens_col(text)
    n_chars = F.length(text)
    n_punct = F.regexp_count(text, F.lit("[.,;:!?]"))
    n_tokens = F.size(toks)
    en_stop = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(en_stop, t)))
    mean_tok = F.when(n_tokens > 0, n_chars / n_tokens).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, n_stop / n_tokens).otherwise(F.lit(0.0))
    score = (
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.4
        + stop_ratio * 0.4
        + (F.lit(1.0) - F.least(punct_ratio * 10, F.lit(1.0))) * 0.2
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_tokens.alias("n_tokens"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        mean_tok.alias("mean_token_len"),
        score.alias("quality"),
    )


def lang_id(docs: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    toks = tokens_col(F.col(text_col))
    scores = {}
    for lang in _LANG_ORDER:
        stop = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        scores[lang] = F.size(
            F.filter(toks, lambda t: F.array_contains(stop, t))
        )
    # argmax with deterministic first-wins tie order (_LANG_ORDER)
    expr = F.lit("und")
    max_all = F.greatest(*[scores[lang] for lang in _LANG_ORDER])
    for lang in reversed(_LANG_ORDER):
        expr = F.when(
            (scores[lang] == max_all) & (max_all > 0), F.lit(lang)
        ).otherwise(expr)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        *[scores[lang].alias(f"hits_{lang}") for lang in _LANG_ORDER],
        expr.alias("predicted_lang"),
    )


# 31-bit modulus keeps every intermediate (acc·B + code) < 2^52 — no int64
# overflow in any engine (DuckDB raises on overflow; Spark silently wraps).
FP_MOD = 2_147_483_647
FP_BASE = 1_000_003


def fingerprint(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """(doc_id, fingerprint): polynomial hash Σ code(c_i)·B^i mod M over
    the normalized text, computed as a fold — O(len) integer Column ops.

    Normalization: lowercase, runs of whitespace collapsed to one space,
    trimmed. code(c) = 60-bit md5 prefix of the character (portable;
    ``ascii()`` codepoints differ in signedness across engines for
    multibyte chars)."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), "\\s+", " "))
    chars = F.split(norm, "")
    fp = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: F.pmod(
            acc * F.lit(FP_BASE)
            + F.pmod(
                F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long"),
                F.lit(FP_MOD),
            ),
            F.lit(FP_MOD),
        ),
    )
    return docs.select(F.col(id_col).alias("doc_id"), fp.alias("fingerprint"))


def tfidf_topk(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k characteristic terms per document by tf·idf — the relevance
    staple of corpus analytics.

    idf is the INTEGER form ``(N·1000) div df`` (milli-scaled reciprocal
    document frequency) rather than ``ln(N/df)``: monotone in the same
    direction, and integer-exact across engines — two libm ``ln``
    implementations can differ in the last ulp, which a value-hashed
    oracle would surface as flaky mismatches at floor() boundaries.

    Plan: explode(split) → (doc, term) counts (one shuffle, partial agg)
    → df per term (second agg on the already-reduced tf table, NOT the
    raw token stream) → join tf⋈df on term (vocabulary-sized right side;
    AQE picks broadcast when it fits) → per-doc top-k window. Ties break
    by ascending term for determinism.

    N (the corpus size) enters the plan as a broadcast 1-row aggregate
    cross-joined into the scoring projection — NOT an eager
    ``docs.count()`` on the driver (VERDICT r2): building this DataFrame
    triggers no job, so the operator composes under caching and costs one
    logical pass; tokenization note — terms come from a single-space,
    case-preserving split, deliberately DIFFERENT from :func:`tokens_col`
    (``\\s+`` + lower) to stay equal to the oracle's
    ``string_split(text, ' ')``.
    """
    terms = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("term")
    ).where(F.col("term") != "")
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("__n_docs"))
    scored = (
        tf.join(df, "term")
        .join(F.broadcast(n_docs))
        .select(
            id_col, "term", "tf",
            (F.col("tf") * F.expr("(__n_docs * 1000) div df"))
            .alias("score_milli"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("score_milli"), F.asc("term")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
    )


def banded_edit_pairs(docs: DataFrame, str_col: str, length: int,
                      segments: int = 3, max_dist: int = 2,
                      id_col: str = "doc_id") -> DataFrame:
    """(a, b, dist) — fuzzy self-join: pairs of fixed-length strings
    within levenshtein distance ``max_dist``, found via POSITIONAL
    SEGMENT BANDING (the PartEnum/pigeonhole family): split each string
    into ``segments`` aligned substrings; two strings with at most
    ``segments − 1`` SUBSTITUTIONS must agree on at least one whole
    segment (pigeonhole), so candidates come from ``segments``
    equi-joins instead of an all-pairs edit-distance matrix, and the
    exact ``levenshtein`` verifies each candidate.

    Honest recall contract: completeness is guaranteed for HAMMING
    distance ≤ segments − 1 (substitution-only edits). A pair within
    levenshtein ``max_dist`` via INSERT+DELETE (a shift) can disagree
    on every aligned segment and is missed — so the q86 oracle mirrors
    THIS candidate generation (the q36/q38 approximate-op rule), never
    an exact all-pairs oracle. Choose ``segments ≥ max_dist + 1``.

    Scale shape: the segment join's fan-out per key is that segment
    value's frequency — for near-uniform content (hashes, normalized
    names) this is the |pairs-within-distance| + hash-collision noise,
    not |corpus|²; a hot segment (constant prefix) is an ordinary
    skewed equi-join key, AQE-splittable, and worth salting or
    excluding upstream exactly like a stop shingle. Verify is
    O(candidates) `levenshtein`, JVM-side.
    """
    if segments < max_dist + 1:
        raise ValueError("need segments >= max_dist + 1 for the "
                         "pigeonhole guarantee")
    seg_len = -(-length // segments)  # ceil
    s = df_s = docs.select(F.col(id_col).alias("id"),
                           F.col(str_col).alias("s"))
    segs = df_s.select(
        "id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("i"),
                    F.col("s").substr(
                        i * seg_len + 1, min(seg_len, length - i * seg_len)
                    ).alias("seg"),
                )
                for i in range(segments)
            ])
        ).alias("e"),
    ).select("id", F.col("e.i").alias("i"), F.col("e.seg").alias("seg"))
    cand = (
        segs.select(F.col("id").alias("a"), "i", "seg")
        .join(segs.select(F.col("id").alias("b"), "i", "seg"), ["i", "seg"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    return (
        cand.join(s.select(F.col("id").alias("a"), F.col("s").alias("sa")),
                  "a")
        .join(s.select(F.col("id").alias("b"), F.col("s").alias("sb")), "b")
        .withColumn("dist", F.levenshtein(F.col("sa"), F.col("sb")))
        .where(F.col("dist") <= max_dist)
        .select("a", "b", "dist")
    )


def bigram_novelty(docs: DataFrame, reference: DataFrame,
                   text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_bigrams, n_unseen, novelty_ppm) — how much of each
    document is NOT covered by a reference corpus's bigram vocabulary:
    the curation-side novelty/contamination dial (novelty 0 = the doc
    is phrase-level boilerplate of the reference; high novelty = new
    content — or noise, which quality_score separates).

    Bigrams are adjacent lowercase-token pairs, DISTINCT per doc, built
    JVM-side by zipping the token array with its own tail (two slices +
    ``zip_with`` — no explode until the vocabulary membership join).
    Membership = one left join against the reference's distinct bigram
    vocabulary; ``novelty_ppm = n_unseen·10^6 div n_bigrams`` in pure
    int64. Docs with < 2 tokens have no bigrams and are emitted with
    (0, 0, 0) — boilerplate by convention, pinned by pytest.

    Scale: vocab is a distinct-agg of the reference (map-side
    combined); the membership join is an equi-join on the bigram
    string — broadcastable while the vocab fits, an ordinary shuffle
    join past that. No UDF anywhere.
    """
    def bigrams(col):
        toks = F.filter(
            F.split(F.lower(col), "\\s+"), lambda t: t != ""
        )
        n = F.size(toks)
        return F.array_distinct(
            F.zip_with(
                F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
                F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        )

    vocab = (
        reference.select(
            F.explode(bigrams(F.col(text_col))).alias("bg")
        )
        .distinct()
        .withColumn("_seen", F.lit(1))
    )
    per_doc = docs.select(
        F.col(id_col).alias("doc_id"), bigrams(F.col(text_col)).alias("bgs")
    )
    exploded = per_doc.select(
        "doc_id", F.explode_outer(F.col("bgs")).alias("bg")
    )
    joined = exploded.join(vocab, "bg", "left")
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count(F.col("bg")).alias("n_bigrams"),
            F.count(
                F.when(F.col("bg").isNotNull() & F.col("_seen").isNull(), 1)
            ).alias("n_unseen"),
        )
        .select(
            "doc_id", "n_bigrams", "n_unseen",
            F.when(F.col("n_bigrams") == 0, F.lit(0).cast("long"))
            .otherwise(
                F.expr("(n_unseen * 1000000L) div n_bigrams")
            ).alias("novelty_ppm"),
        )
    )


def hashed_features(
    docs: DataFrame,
    n_buckets: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """``(doc_id, bucket)`` hashed uni+bigram BAG features — the shared
    feature space of the fastText-shape classifier
    (:func:`hashed_ngram_score`, q128) and DSIR importance weights
    (sampling.py:dsir_weights, q141). Features are lowercase
    whitespace tokens plus adjacent-pair bigrams, one output row per
    OCCURRENCE (bag, not set); ``bucket = md5-hash(feature) mod
    n_buckets`` computed map-side before any shuffle."""
    from osmcha_spark.operators.dedup import md5_long_col

    toks = tokens_col(F.col(text_col))
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.concat(toks, bigrams)).alias("f"),
    ).select(
        "doc_id",
        (md5_long_col(F.col("f")) % F.lit(int(n_buckets))).alias("bucket"),
    )


def hashed_ngram_score(
    docs: DataFrame,
    weights: DataFrame,
    n_buckets: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket_col: str = "bucket",
    weight_col: str = "weight",
) -> DataFrame:
    """Hashed bag-of-ngrams linear classifier — the fastText / CCNet
    quality-filter shape (Joulin et al. 2017, arXiv:1607.01759 §2:
    hashed uni+bigram features, a linear layer; CCNet and most
    LLM-corpus quality filters deploy exactly this) with the trained
    weight vector supplied as a ``(bucket, weight)`` table of INTEGER
    weights (fixed-point: quantize trained floats offline — integer
    scores are what make the oracle exact and the engine bit-stable).

    Features are lowercase whitespace tokens (``tokens_col``) plus
    adjacent-pair bigrams, BAG semantics — a repeated feature scores
    once per occurrence, matching the fastText mean-of-embeddings
    numerator, not the distinct-set semantics of dedup shingles.
    ``bucket = md5-hash(feature) mod n_buckets`` (the repo's one
    portable string hash); buckets missing from ``weights`` score 0.

    Output: ``(doc_id, n_features, score, kept)`` with ``kept = 1`` iff
    ``score > 0``; docs with no tokens emit ``(0, 0, 0)``.

    Scale shape: Θ(tokens) exploded feature rows, hashed map-side; the
    weight table broadcasts (2^20 buckets ≈ a few MB — fastText's own
    default); the only shuffle is the per-doc sum, map-side combined.
    The final left join back to docs (to resurrect empty docs) is
    doc-keyed and co-partitioned with the agg output. No UDF anywhere.
    """
    feats = hashed_features(docs, n_buckets, text_col, id_col) \
        .withColumnRenamed("bucket", "__bucket")
    w = F.broadcast(
        weights.select(
            F.col(bucket_col).alias("__bucket"),
            F.col(weight_col).cast("long").alias("__w"),
        )
    )
    scored = (
        feats.join(w, "__bucket", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_features"),
            F.sum(F.coalesce(F.col("__w"), F.lit(0).cast("long")))
            .alias("score"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_features"), F.lit(0).cast("long"))
            .alias("n_features"),
            F.coalesce(F.col("score"), F.lit(0).cast("long"))
            .alias("score"),
            (F.coalesce(F.col("score"), F.lit(0).cast("long")) > 0)
            .cast("int")
            .alias("kept"),
        )
    )


# ----------------------------------------------------------------
# BPE tokenizer training (Sennrich et al. 2016) — the missing rung
# between token_count's BPE-ish regex proxy and a real trained
# subword vocabulary. No reference counterpart (engine-only, the
# LLM-pipeline brief's tokenizer leg).
# ----------------------------------------------------------------

def _word_chars(col: Column) -> Column:
    """Initial BPE symbols of one word: its characters. Split on the
    between-every-char lookahead (no leading empty element), keep the
    empty-filter anyway as a belt against odd inputs."""
    return F.filter(F.split(col, "(?!^)"), lambda c: c != "")


def _collapse_merge(syms: Column, a: str, b: str) -> Column:
    """Apply ONE merge (a, b) -> a||b to a symbol array, left-greedy
    (the BPE application rule: "aaa" under (a,a) is [aa, a]): a fold
    that either fuses the incoming symbol into the accumulator's last
    element or appends it. Pure Catalyst ``aggregate`` — no Python."""
    fused = F.lit(a + b)
    return F.aggregate(
        syms,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(fused)
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _word_symbols(col: Column, merges: list) -> Column:
    syms = _word_chars(col)
    for a, b in merges:
        syms = _collapse_merge(syms, a, b)
    return syms


def word_freq(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(w, f) — distinct lowercased whitespace words with corpus
    frequencies. THE scale trick of corpus BPE: every later step runs
    over the vocabulary (≪ corpus tokens), carrying multiplicity as a
    weight; one token-explode + one map-side-combined groupBy, ever."""
    return (
        docs.select(
            F.explode(tokens_col(F.col(text_col))).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
    )


def bpe_pair_counts(
    wf: DataFrame,
    merges: list | None = None,
    k: int = 30,
) -> DataFrame:
    """(left_sym, right_sym, cnt) — the ``k`` most frequent adjacent
    symbol pairs over a (w, f) vocabulary, after applying ``merges`` in
    order: ONE step of BPE training. Pairs never span words (the
    standard word-boundary rule). Deterministic total order
    (cnt DESC, left_sym, right_sym) so the top-k — and therefore the
    whole training run — is reproducible.

    Scale: symbols/pairs are built JVM-side on the VOCABULARY (arrays
    of a word's length); the pair aggregation is weighted by word
    frequency and map-side combined; the final sort ranks only the
    distinct-pair table (bounded by |alphabet ∪ merges|², metadata-
    scale next to the corpus). Each merge is one Catalyst fold over a
    word's symbols — fine for the tens-to-hundreds of merges a
    training loop holds in flight; a production run with thousands of
    frozen merges applies them once via :func:`apply_bpe` and
    checkpoints the symbolized vocabulary instead of re-folding."""
    from pyspark.sql import Window

    syms = wf.select(
        "f", _word_symbols(F.col("w"), list(merges or [])).alias("s")
    ).where(F.size("s") >= 2)
    pairs = syms.select(
        "f",
        F.explode(
            F.zip_with(
                F.slice(F.col("s"), 1, F.size("s") - 1),
                F.slice(F.col("s"), 2, F.size("s") - 1),
                lambda a, b: F.struct(
                    a.alias("left_sym"), b.alias("right_sym")
                ),
            )
        ).alias("p"),
    )
    counts = (
        pairs.groupBy(
            F.col("p.left_sym").alias("left_sym"),
            F.col("p.right_sym").alias("right_sym"),
        )
        .agg(F.sum("f").cast("long").alias("cnt"))
    )
    w = Window.orderBy(
        F.col("cnt").desc(), F.col("left_sym"), F.col("right_sym")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= int(k))
        .drop("rn")
    )


def train_bpe(docs: DataFrame, n_merges: int,
              text_col: str = "text") -> list:
    """Greedy BPE training: ``n_merges`` rounds of "count pairs, fuse
    the argmax" over the corpus vocabulary. Returns the ordered merge
    list. The (w, f) vocabulary is computed ONCE and cached — each
    round is a vocabulary-sized job (pair fold + weighted groupBy +
    top-1), so the corpus is scanned exactly once no matter how many
    merges are trained. Ties break (left_sym, right_sym) lexicographic,
    making the whole run a pure function of the corpus."""
    wf = word_freq(docs, text_col)
    wf = wf.persist()
    try:
        merges: list = []
        for _ in range(int(n_merges)):
            top = bpe_pair_counts(wf, merges, k=1).collect()
            if not top:
                break
            merges.append((top[0]["left_sym"], top[0]["right_sym"]))
        return merges
    finally:
        wf.unpersist()


def apply_bpe(docs: DataFrame, merges: list, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_tokens, tokens) — encode each document with a frozen
    merge list: per word, fold the merges over its characters; the
    document's tokens are the concatenation across words. The fold
    runs per DISTINCT word via an in-document array transform (words
    repeat heavily; Catalyst dedups nothing here, but the expression is
    all JVM — no Python boundary, no shuffle at all: encoding is a pure
    projection)."""
    toks = tokens_col(F.col(text_col))
    symbols = F.flatten(
        F.transform(toks, lambda t: _word_symbols(t, list(merges)))
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(symbols).alias("n_tokens"),
        symbols.alias("tokens"),
    )


# ----------------------------------------------------------------
# n-gram language-model quality scoring (the CCNet / Wenzek et al.
# 2020 perplexity-filter rung, arXiv:1911.00359 §3: score every
# document with an LM trained on a trusted reference corpus; keep the
# head of the perplexity distribution). No reference counterpart
# (engine-only, the LLM-pipeline brief's quality leg).
# ----------------------------------------------------------------

def flog2_col(x: Column) -> Column:
    """Exact ``floor(log2(x))`` for an int64 column with x >= 1, with
    no floating point anywhere: the bit length of the binary string
    minus one (Spark ``bin``; the DuckDB mirror is
    ``length(format('{:b}', x)) - 1``). The integer-log primitive that
    makes LM scores a pure function of integer counts — the same
    exactness move as hashed_ngram_score's integer weights."""
    return F.length(F.bin(x)) - F.lit(1)


def ngram_lm_score(
    docs: DataFrame,
    train: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Quantized add-one bigram language model: train on ``train``'s
    text, score every ``docs`` row — the CCNet quality-filter shape
    (KenLM perplexity against a trusted corpus) with the log-prob
    QUANTIZED to exact integers so engine and oracle agree bit-for-bit.

    Per scored bigram ``(a, b)``::

        qlp(b | a) = flog2(C(a b) + 1) - flog2(C(a) + 1)   (<= 0)

    where ``C`` are training counts — floor-log2 is the fixed-point
    log (deploying a real KenLM would swap ``flog2`` for the float
    log-prob table; everything else is unchanged). Documents score

        ``loglik_q = sum(qlp)``, ``n_oov`` = bigrams with C(a b) = 0.

    Lower (more negative) loglik_q per bigram = less reference-like;
    thresholding is the caller's policy (CCNet keeps head/middle of
    the distribution). Docs with < 2 tokens emit ``(0, 0, 0)``.

    Scale shape: training is ONE token explode + two map-side-combined
    count groupBys (unigram, bigram); n-grams hash to int64 map-side
    (md5-prefix, the sanctioned hash) BEFORE any shuffle, so count
    tables shuffle 8-byte keys. Scoring is one explode + two equi-joins
    against the count tables (ordinary shuffle joins — a trained count
    table is vocabulary-sized, worst-case corpus-sized; never blindly
    broadcast) + one map-side-combined per-doc sum. The final doc-keyed
    left join resurrects sub-2-token docs (q128's pattern). No UDF.
    """
    from osmcha_spark.operators.dedup import md5_long_col

    def _grams(df: DataFrame) -> DataFrame:
        toks = tokens_col(F.col(text_col))
        n = F.size(toks)
        pairs = F.zip_with(
            F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
            F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
        return df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(pairs).alias("g"),
        ).select(
            "doc_id",
            md5_long_col(F.col("g")).alias("bg_h"),
            md5_long_col(F.split(F.col("g"), " ")[0]).alias("un_h"),
        )

    tg = _grams(train)
    bg_cnt = tg.groupBy("bg_h").agg(F.count(F.lit(1)).alias("bg_c"))
    un_cnt = tg.groupBy("un_h").agg(F.count(F.lit(1)).alias("un_c"))

    scored = (
        _grams(docs)
        .join(bg_cnt, "bg_h", "left")
        .join(un_cnt, "un_h", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("bg_c"), F.lit(0).cast("long")).alias("bc"),
            F.coalesce(F.col("un_c"), F.lit(0).cast("long")).alias("uc"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum((F.col("bc") == 0).cast("long")).alias("n_oov"),
            F.sum(
                flog2_col(F.col("bc") + 1) - flog2_col(F.col("uc") + 1)
            ).alias("loglik_q"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_bigrams"), F.lit(0).cast("long"))
            .alias("n_bigrams"),
            F.coalesce(F.col("n_oov"), F.lit(0).cast("long"))
            .alias("n_oov"),
            F.coalesce(F.col("loglik_q"), F.lit(0).cast("long"))
            .alias("loglik_q"),
        )
    )


def perceptron_step(
    docs: DataFrame,
    weights: DataFrame,
    n_buckets: int,
    label_col: str = "label",
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket_col: str = "bucket",
    weight_col: str = "weight",
) -> DataFrame:
    """One BATCH perceptron training round over the hashed uni+bigram
    feature space — the TRAINING side of the fastText-shape quality
    classifier :func:`hashed_ngram_score` deploys (Joulin et al. 2017;
    CCNet trains exactly such a linear filter over its corpus). The
    q62/kmeans_step move applied to classification: one
    order-independent batch step is expressible as joins + aggregates
    and therefore oracle-exact, while a full training run is the
    driver-side loop over this step (like train_bpe over
    bpe_pair_counts).

        score_d   = Σ_b count(d, b) · w_b            (bag semantics)
        misclassified: label_d · score_d <= 0        (labels ±1)
        grad_b    = Σ_{d misclassified} label_d · count(d, b)
        w'_b      = w_b + grad_b

    Everything stays integer (labels ±1, integer weights, integer
    counts), so engine and oracle agree bit-for-bit and iterating the
    step is bit-stable. Docs with no features score 0 and count as
    misclassified but contribute nothing to any gradient — they drop
    out identically in both engines.

    Output: ``(bucket, weight, grad)`` for the UNION of buckets with a
    prior weight or a nonzero-support gradient (weight = new weight;
    buckets untouched this round carry through unchanged).

    Scale shape: the weight table is BOUNDED at n_buckets (the feature-
    hashing trick), so both weight joins broadcast by construction;
    feature rows are Θ(tokens), hashed map-side; the two shuffles are
    the per-doc score sum and the per-bucket gradient sum, both
    map-side combined. The feature explode runs twice (score pass +
    gradient pass) — cache the feature frame across many steps of a
    training loop if the corpus scan dominates."""
    feats = hashed_features(docs, n_buckets, text_col, id_col) \
        .withColumnRenamed("bucket", "__bucket")
    w = weights.select(
        F.col(bucket_col).alias("__bucket"),
        F.col(weight_col).cast("long").alias("__w"),
    )
    scored = (
        feats.join(F.broadcast(w), "__bucket", "left")
        .groupBy("doc_id")
        .agg(F.sum(F.coalesce(F.col("__w"), F.lit(0).cast("long")))
             .alias("__score"))
    )
    mis = (
        docs.select(F.col(id_col).alias("doc_id"),
                    F.col(label_col).cast("long").alias("__y"))
        .join(scored, "doc_id", "left")
        .where(F.col("__y") * F.coalesce(F.col("__score"),
                                         F.lit(0).cast("long")) <= 0)
        .select("doc_id", "__y")
    )
    grad = (
        feats.join(mis, "doc_id")
        .groupBy("__bucket")
        .agg(F.sum("__y").alias("__g"))
    )
    return (
        w.join(grad, "__bucket", "full_outer")
        .select(
            F.col("__bucket").alias("bucket"),
            (F.coalesce(F.col("__w"), F.lit(0).cast("long"))
             + F.coalesce(F.col("__g"), F.lit(0).cast("long")))
            .alias("weight"),
            F.coalesce(F.col("__g"), F.lit(0).cast("long")).alias("grad"),
        )
    )


def vocab_growth(
    docs: DataFrame,
    bucket: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 1,
) -> DataFrame:
    """Vocabulary-growth curve (Heaps'-law evidence) over a corpus in
    doc-id order: per bucket of ``bucket`` consecutive doc ids, how
    many token TYPES appear for the first time, the cumulative type
    count, the bucket's token occurrences, and the cumulative token
    count. The corpus-statistics rung of the text family — the curve a
    data-mixing decision reads before adding a source (slope ≈ Heaps
    β; a flattening curve means the source stops contributing new
    vocabulary).

    Tokenizer: :func:`tokens_col` (lowercased ``\\s+`` split — the
    q128 tokenizer, NOT q66's single-space split; the oracles mirror
    whichever their stage uses, never unify). ``ngram=2`` counts
    space-joined adjacent-pair bigram TYPES instead (the q128 bigram
    construction) — the right unit when the unigram vocabulary is tiny
    relative to the corpus and the unigram curve saturates in the
    first bucket.

    first_seen(type) = min doc_id containing it — an exact, order-
    free definition, so the whole curve is two map-side-combined
    groupBys (token → first bucket; bucket → counts) plus one
    raster-scale window for the running sums. No window ever touches
    token-occurrence rows.

    Output: ``(bucket, new_types, cum_types, toks, cum_toks)`` per
    non-empty bucket, bucket = floor(doc_id / bucket) (ids are
    nonnegative in every fixture; floor == truncate here)."""
    if ngram not in (1, 2):
        raise ValueError("ngram must be 1 or 2")
    ts = tokens_col(F.col(text_col))
    if ngram == 2:
        n = F.size(ts)
        ts = F.zip_with(
            F.slice(ts, 1, F.greatest(n - 1, F.lit(0))),
            F.slice(ts, 2, F.greatest(n - 1, F.lit(0))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(ts).alias("tok"),
    )
    b = (F.col("doc_id") / F.lit(bucket)).cast("long")
    first = (
        toks.groupBy("tok")
        .agg(F.min("doc_id").alias("fd"))
        .select(((F.col("fd") / F.lit(bucket)).cast("long")).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("new_types"))
    )
    occ = (
        toks.select(b.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("toks"))
    )
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    return (
        occ.join(first, ["bucket"], "left")
        .select(
            "bucket",
            F.coalesce("new_types", F.lit(0)).cast("long")
            .alias("new_types"),
            "toks",
        )
        .select(
            "bucket", "new_types",
            F.sum("new_types").over(w).cast("long").alias("cum_types"),
            "toks",
            F.sum("toks").over(w).cast("long").alias("cum_toks"),
        )
    )


def pmi_collocations(
    docs: DataFrame,
    min_pair: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Collocation extraction by pointwise mutual information over
    adjacent token pairs (Church & Hanks 1990) — the phrase-mining
    rung of the text family: which word pairs co-occur far more often
    than their marginals predict ("new york", "machine learning"),
    feeding tokenizer vocab curation and boilerplate phrase lists.

    Tokenizer: :func:`tokens_col` (the q128 lowercased ``\\s+`` split).
    Counts are corpus-wide token OCCURRENCES (not doc-distinct —
    PMI's probability model wants occurrence frequencies):
    ``n_pair`` = times (w1, w2) appear adjacent, ``n1``/``n2`` = the
    words' unigram counts, ``total`` = corpus token count. The exact
    rational parts ship in the output (callers divide at the edge,
    the q174/q177 pattern) plus the integer-quantized score

        qpmi = flog2(n_pair) + flog2(total) - flog2(n1) - flog2(n2)

    — floor-log2 of each FACTOR separately, never of a product, so
    there is NO overflow at any corpus size (n_pair·total would pass
    2^62 near 2^31 tokens; the factored form never multiplies). It is
    within 2 of floor(log2 PMI) and a pure integer function of
    counts, so engine and oracle agree bit-for-bit (the q128/q140
    integer-quantization move; rank ties broken by the exact
    rationals when callers need them).

    ``min_pair`` prunes hapax pairs BEFORE the marginal joins — the
    Zipf tail is most of the pair vocabulary, and dropping it early is
    what keeps the joins pair-VOCABULARY-scale.

    Scale shape: one pass over token occurrences builds pairs (array
    zip JVM-side, explode, map-side-combined groupBy) and one builds
    unigrams; the two marginal equi-joins run on the pruned pair
    vocabulary (≪ occurrences); ``total`` is a one-row broadcast. No
    UDF, no all-pairs, nothing quadratic anywhere.
    """
    ts = tokens_col(F.col(text_col))
    n = F.size(ts)
    pair_arr = F.zip_with(
        F.slice(ts, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(ts, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    pairs = (
        docs.select(F.explode(pair_arr).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pair"))
        .where(F.col("n_pair") >= int(min_pair))
    )
    uni = (
        docs.select(F.explode(ts).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    tot = uni.agg(F.sum("n").cast("long").alias("total"))
    return (
        pairs.join(uni.withColumnsRenamed({"tok": "w1", "n": "n1"}), "w1")
        .join(uni.withColumnsRenamed({"tok": "w2", "n": "n2"}), "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1", "w2", "n_pair", "n1", "n2", "total",
            (flog2_col(F.col("n_pair")) + flog2_col(F.col("total"))
             - flog2_col(F.col("n1")) - flog2_col(F.col("n2")))
            .cast("long").alias("qpmi"),
        )
    )
