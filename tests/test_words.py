"""Word-rule semantics: the 14 find_words cases of the reference
(tests/test_mod.py:15-33) re-asserted against BOTH engine paths (fast
Column regexp and parity pandas UDF) plus the pure-Python oracle."""

import pytest
from pyspark.sql import functions as F

from osmcha_spark.config import (
    COMMON_SUSPECT_WORDS,
    EXCLUDED_WORDS,
    ILLEGAL_SOURCES,
)
from osmcha_spark.functions.words import (
    find_words_col,
    find_words_py,
    make_pattern,
)
from tests import oracle_py

SUSPECT = ILLEGAL_SOURCES + COMMON_SUSPECT_WORDS

CASES = [
    ("import buildings", None, True),
    ("imported Importação unimportant", EXCLUDED_WORDS, True),
    ("important edit", EXCLUDED_WORDS, False),
    ("Where is here?", EXCLUDED_WORDS, False),
    ("GooGle is not important", EXCLUDED_WORDS, True),
    ("somewhere in the world", EXCLUDED_WORDS, False),
    ("дані по імпорту", EXCLUDED_WORDS, True),
    ("places from яндекс", EXCLUDED_WORDS, True),
    ("places from 2gis", EXCLUDED_WORDS, True),
    ("places from 2гис", EXCLUDED_WORDS, True),
    ("places from yandex", EXCLUDED_WORDS, True),
    ("Yandex Panorama", EXCLUDED_WORDS, False),
    ("Яндекс Панорамы", EXCLUDED_WORDS, False),
    ("Яндекс.Панорамы", EXCLUDED_WORDS, False),
]


def test_make_pattern_no_escaping():
    pat = make_pattern(["goo.gl"])
    assert pat == r"^goo.gl\.*|\.* goo.gl\.*"


@pytest.mark.parametrize("text,excluded,expected", CASES)
def test_oracle_py_matches_reference_asserts(text, excluded, expected):
    assert oracle_py.find_words(text, SUSPECT, excluded or ()) is expected


def test_fast_column_path(spark):
    df = spark.createDataFrame([(t,) for t, _, _ in CASES], "text string")
    got = df.select(
        "text",
        find_words_col(F.col("text"), SUSPECT, EXCLUDED_WORDS).alias("hit"),
        find_words_col(F.col("text"), SUSPECT).alias("hit_noexcl"),
    ).collect()
    by_text = {r["text"]: r for r in got}
    for text, excluded, expected in CASES:
        col = "hit" if excluded else "hit_noexcl"
        assert by_text[text][col] is expected, text


def test_parity_udf_path(spark):
    df = spark.createDataFrame([(t,) for t, _, _ in CASES], "text string")
    udf_excl = find_words_py(SUSPECT, EXCLUDED_WORDS)
    udf_plain = find_words_py(SUSPECT)
    got = df.select(
        "text",
        udf_excl(F.col("text")).alias("hit"),
        udf_plain(F.col("text")).alias("hit_noexcl"),
    ).collect()
    by_text = {r["text"]: r for r in got}
    for text, excluded, expected in CASES:
        col = "hit" if excluded else "hit_noexcl"
        assert by_text[text][col] is expected, text


def test_factored_pattern_count_equivalence():
    """make_pattern_fast must produce the SAME non-overlapping match count
    as the reference-shaped make_pattern on every input — 20k randomized
    texts (word-free, word-embedded, dot/space-decorated) cross-checked
    through CPython re, plus the fixture cases."""
    import random
    import re

    from osmcha_spark.functions.words import make_pattern_fast

    words = SUSPECT + list(EXCLUDED_WORDS)
    ref = re.compile(make_pattern(words))
    fast = re.compile(make_pattern_fast(words))
    assert fast.pattern != ref.pattern  # the factored form actually engaged

    rng = random.Random(1234)
    alpha = "abcdefgh .xyzGOO"
    for trial in range(20000):
        t = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 40)))
        if trial % 3 == 0:
            w = rng.choice(words)
            pos = rng.randint(0, len(t))
            t = (t[:pos] + w + t[pos:]).lower()
        a = sum(1 for _ in ref.finditer(t))
        b = sum(1 for _ in fast.finditer(t))
        assert a == b, (t, a, b)
    for text, _, _ in CASES:
        low = text.lower()
        assert (
            sum(1 for _ in ref.finditer(low))
            == sum(1 for _ in fast.finditer(low))
        ), text


def test_factored_pattern_falls_back_on_unsafe_words():
    from osmcha_spark.functions.words import make_pattern_fast

    unsafe = ["ok", ".leading-dot"]
    assert make_pattern_fast(unsafe) == make_pattern(unsafe)


def test_factored_pattern_falls_back_on_quantified_words():
    """ADVICE r2: a quantifier can make a word's first literal char
    optional ('a* b' matches text starting with a space), voiding the
    position-0 disjointness argument the factoring's safety proof rests
    on. The guard now enforces its own invariant: any word containing
    *, + or ? (anywhere) forces the reference-shaped fallback, which is
    exact by construction."""
    from osmcha_spark.functions.words import make_pattern_fast

    for words in (["a* b", "ok"], ["a*.x"], ["w+ord"], ["ma?ybe", "zz"]):
        assert make_pattern_fast(words) == make_pattern(words), words


def test_fast_column_path_vs_python_oracle_randomized(spark):
    """The JAVA regex with the factored pattern must agree with the
    CPython oracle running the reference-shaped pattern on randomized
    texts — guards the factoring against engine-level alternation
    differences, not just CPython-vs-CPython equivalence."""
    import random

    rng = random.Random(99)
    words = SUSPECT
    texts = []
    alpha = "abcdefgh .xyz"
    for trial in range(300):
        t = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 30)))
        if trial % 2 == 0:
            w = rng.choice(words + list(EXCLUDED_WORDS))
            pos = rng.randint(0, len(t))
            t = t[:pos] + w + t[pos:]
        texts.append(t)
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = {
        r["text"]: r["hit"]
        for r in df.select(
            "text",
            find_words_col(F.col("text"), words, EXCLUDED_WORDS).alias("hit"),
        ).collect()
    }
    for t in texts:
        want = oracle_py.find_words(t, words, EXCLUDED_WORDS)
        assert got[t] is want, t
