"""Suspect-word detection as Spark Column expressions.

Reference semantics (re-derived, not ported):

- ``make_regex`` (osmcha/changeset.py:142-151) joins words into the
  alternation ``^{w}\\.*|\\.* {w}\\.*`` per word. Words are intentionally NOT
  regex-escaped: ``goo.gl``'s dot is a wildcard, and we must keep that.
- ``find_words`` (osmcha/changeset.py:154-183) lowercases the text, counts
  non-overlapping matches of the suspect pattern and (when exclusions are
  given) of the excluded pattern, and returns ``suspect > excluded`` (or
  ``suspect > 0`` with no exclusions). Quirk kept: YAML words containing
  uppercase (``Импортировать``) can never match the lowered text.

Two implementations, golden-tested equal:

1. **fast path (default)** — pure ``regexp_count(lower(text), pattern)``
   Columns. JVM-side, whole-stage-codegen friendly, no Python boundary.
2. **parity path** — an Arrow-vectorized ``pandas_udf`` running CPython's
   ``re`` and ``str.lower``, for byte-for-byte parity on edge unicode where
   Java and Python regex/casefold semantics could diverge.

At 100 TB the fast path is the hot path; the parity UDF exists for audit
runs and the golden suite.
"""

from __future__ import annotations

import re
from functools import lru_cache

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType

from osmcha_spark.config import RulesConfig


def make_pattern(words: list[str]) -> str:
    """Alternation identical to the reference's make_regex output
    (osmcha/changeset.py:149-151): no escaping, ``^w\\.*|\\.* w\\.*`` per word."""
    return r"|".join(
        r"^{word}\.*|\.* {word}\.*".format(word=word) for word in words
    )


# Factoring-safety guards (see make_pattern_fast):
# - first char must not be '.'/' ' (or a metachar that could match them),
#   or the ^-branches and the "\.* "-branches stop being disjoint;
# - NO word may contain '|' (it would split into extra TOP-LEVEL
#   alternatives in the reference form but stay inside the group in the
#   factored form — different anchoring, different counts), a backslash
#   (a trailing one would escape the factored group's ')'), grouping/
#   anchor metachars whose scope changes inside "(?:...)", or a
#   quantifier (*, +, ?): a quantifier in position 2 makes the word's
#   FIRST char optional (e.g. 'a* b', 'a*.x'), so the word can match text
#   starting with space/dot and the ^-set vs '\.* '-set disjointness the
#   factoring relies on breaks at position 0 (ADVICE r2).
_UNSAFE_FIRST = set(". \\^$*+?()[]{}|")
_UNSAFE_ANYWHERE = set("|\\()[]{}^$*+?")


def make_pattern_fast(words: list[str]) -> str:
    """Count-equivalent factored form of :func:`make_pattern`:
    ``^(?:w1|w2|…)\\.*|\\.* (?:w1|w2|…)\\.*``.

    Why it's safe: the reference's ``^w``-branches can only match where the
    text position holds a word's first character, and its ``\\.* w``-branches
    only where it holds ``.`` or a space — disjoint sets as long as no word
    begins with ``.``/space (or a metachar that could match them). Within
    each set, the factored inner alternation preserves the original word
    order, so the winning branch — and therefore every non-overlapping match
    span and the final count — is identical (pinned by a randomized
    cross-check in tests/test_words.py). Java tries the cheap ``\\.* ``
    prefix ONCE per position instead of once per word: ~12× fewer branch
    attempts on word-free text, which is what the 100 TB corpus mostly is.

    Falls back to the reference-shaped pattern when any word starts with an
    unsafe character.
    """
    if not words or any(
        not w
        or w[0] in _UNSAFE_FIRST
        or any(ch in _UNSAFE_ANYWHERE for ch in w)
        for w in words
    ):
        return make_pattern(words)
    inner = "|".join(words)
    return r"^(?:{0})\.*|\.* (?:{0})\.*".format(inner)


def find_words_col(
    text: Column,
    suspect_words: list[str],
    excluded_words: list[str] | None = None,
) -> Column:
    """Fast-path Column: True iff find_words(text, ...) is True.

    NULL text yields NULL (callers guard with the reference's
    ``if self.comment:`` truthiness check, osmcha/changeset.py:348).
    """
    lowered = F.lower(text)
    suspect_n = F.regexp_count(lowered, F.lit(make_pattern_fast(suspect_words)))
    if excluded_words:
        excluded_n = F.regexp_count(
            lowered, F.lit(make_pattern_fast(excluded_words))
        )
        # lazy guard: whole-stage codegen only evaluates the otherwise
        # branch when suspect_n > 0, so the excluded-words regex never runs
        # on the (overwhelmingly common) no-hit rows. NULL text flows to
        # the otherwise branch and stays NULL, as before.
        return F.when(suspect_n == 0, F.lit(False)).otherwise(
            suspect_n > excluded_n
        )
    return suspect_n > F.lit(0)


@lru_cache(maxsize=32)
def _compiled(words: tuple[str, ...]) -> re.Pattern:
    return re.compile(make_pattern(list(words)))


def find_words_py(
    suspect_words: list[str], excluded_words: list[str] | None = None
):
    """Parity-path pandas UDF: CPython ``re`` + ``str.lower`` semantics.

    Arrow-batched; the regexes compile once per executor (lru_cache) and the
    loop runs per batch, never per task dispatch.
    """
    sw = tuple(suspect_words)
    ew = tuple(excluded_words) if excluded_words else ()

    @pandas_udf(BooleanType())
    def _find(texts: pd.Series) -> pd.Series:
        spat = _compiled(sw)
        epat = _compiled(ew) if ew else None

        def one(t):
            if t is None:
                return None
            t = t.lower()
            suspect = sum(1 for _ in spat.finditer(t))
            if epat is not None:
                excluded = sum(1 for _ in epat.finditer(t))
                return suspect > excluded
            return suspect > 0

        return texts.map(one)

    return _find


def suspect_comment_col(comment: Column, cfg: RulesConfig) -> Column:
    """True iff the comment triggers 'suspect_word'
    (osmcha/changeset.py:348-350). Falsy comment (NULL or '') → no flag."""
    hit = find_words_col(comment, cfg.suspect_words, cfg.excluded_words)
    return comment.isNotNull() & (comment != "") & F.coalesce(hit, F.lit(False))


def illegal_source_col(source: Column, cfg: RulesConfig) -> Column:
    """True iff any illegal-sources word is a substring of lower(source),
    with the Yandex-Panorama carve-outs (osmcha/changeset.py:352-361).

    The reference breaks on the first *flagging* hit; a pure existence test
    over the word list is equivalent for the boolean outcome.
    """
    low = F.lower(source)
    words = F.array(*[F.lit(w) for w in cfg.illegal_sources])

    def word_hits(w: Column) -> Column:
        base = low.contains(w)
        yandex_ok = (w == "yandex") & low.contains("yandex panorama")
        yandex_ru_ok = (w == "яндекс") & (
            low.contains("яндекс панорам") | low.contains("яндекс.панорам")
        )
        return base & ~yandex_ok & ~yandex_ru_ok

    return (
        source.isNotNull()
        & (source != "")
        & F.exists(words, word_hits)
    )


def illegal_imagery_col(imagery: Column, cfg: RulesConfig) -> Column:
    """True iff any illegal-sources word is a substring of
    lower(imagery_used) — deliberately NO carve-outs, mirroring the asymmetry
    at osmcha/changeset.py:363-367."""
    low = F.lower(imagery)
    words = F.array(*[F.lit(w) for w in cfg.illegal_sources])
    return (
        imagery.isNotNull()
        & (imagery != "")
        & F.exists(words, lambda w: low.contains(w))
    )
