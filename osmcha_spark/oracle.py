"""DuckDB oracle-SQL generators for the rule pipeline.

The driver's correctness gate runs each engine query AND an ANSI-SQL twin
in DuckDB, then hash-compares results. This module re-states the reference
rule semantics (same citations as functions/) a THIRD time, as portable
SQL, so the oracle is independent of the engine code paths.

Key trick: suspicion reasons are emitted as a semicolon-joined CSV of
flags in canonical sorted order — plain scalar string logic, no array
functions, so the same text works against any engine and the comparison is
order-insensitive by construction.
"""

from __future__ import annotations

from osmcha_spark.config import (
    COMMON_SUSPECT_WORDS,
    EXCLUDED_WORDS,
    ILLEGAL_SOURCES,
    POWERFUL_EDITORS,
    WARNING_EXACT,
    WARNING_PREFIX,
)
from osmcha_spark.functions.words import make_pattern

SPARK = "spark"
DUCKDB = "duckdb"


def _lit(s: str, dialect: str) -> str:
    """String literal with dialect-correct backslash handling: Spark SQL
    treats backslash as an escape inside literals, DuckDB does not."""
    body = s.replace("'", "''")
    if dialect == SPARK:
        body = body.replace("\\", "\\\\")
    return f"'{body}'"


def regexp_count_sql(text_expr: str, pattern: str, dialect: str) -> str:
    lit = _lit(pattern, dialect)
    if dialect == SPARK:
        return f"regexp_count({text_expr}, {lit})"
    return f"len(regexp_extract_all({text_expr}, {lit}))"


def startswith_sql(expr: str, prefix: str, dialect: str) -> str:
    fn = "startswith" if dialect == SPARK else "starts_with"
    return f"{fn}({expr}, {_lit(prefix, dialect)})"


SUSPECT_PATTERN = make_pattern(COMMON_SUSPECT_WORDS + ILLEGAL_SOURCES)
EXCLUDED_PATTERN = make_pattern(EXCLUDED_WORDS)


def find_words_sql(text_expr: str, dialect: str) -> str:
    """find_words(text, suspect, excluded) (osmcha/changeset.py:154-183) as
    a boolean SQL expression over a non-null text."""
    s = regexp_count_sql(f"lower({text_expr})", SUSPECT_PATTERN, dialect)
    e = regexp_count_sql(f"lower({text_expr})", EXCLUDED_PATTERN, dialect)
    return f"({s} > {e})"


def illegal_source_sql(expr: str, dialect: str) -> str:
    """Source branch of verify_words (osmcha/changeset.py:352-361) with the
    Yandex-Panorama carve-outs."""
    low = f"lower({expr})"
    terms = []
    for w in ILLEGAL_SOURCES:
        base = f"contains({low}, {_lit(w, dialect)})"
        if w == "yandex":
            base = f"({base} AND NOT contains({low}, 'yandex panorama'))"
        elif w == "яндекс":
            base = (
                f"({base} AND NOT (contains({low}, 'яндекс панорам')"
                f" OR contains({low}, 'яндекс.панорам')))"
            )
        terms.append(base)
    return "(" + " OR ".join(terms) + ")"


def illegal_imagery_sql(expr: str, dialect: str) -> str:
    """Imagery branch (osmcha/changeset.py:363-367) — no carve-outs."""
    low = f"lower({expr})"
    terms = [f"contains({low}, {_lit(w, dialect)})" for w in ILLEGAL_SOURCES]
    return "(" + " OR ".join(terms) + ")"


def powerful_editor_sql(expr: str, dialect: str) -> str:
    """verify_editor (osmcha/changeset.py:371-385): NULL → powerful."""
    low = f"lower({expr})"
    terms = [f"contains({low}, {_lit(e, dialect)})" for e in POWERFUL_EDITORS]
    return f"(({expr}) IS NULL OR " + " OR ".join(terms) + ")"


def warning_reason_sql(key_expr: str, dialect: str) -> str:
    """Warnings.is_enabled (osmcha/warnings.py:25-31) over one tag key:
    exact table first, then ordered prefix rules; NULL if no match."""
    branches = [
        f"WHEN {key_expr} = {_lit(k, dialect)} THEN {_lit(v, dialect)}"
        for k, v in WARNING_EXACT.items()
    ] + [
        f"WHEN {startswith_sql(key_expr, pref, dialect)} "
        f"THEN {_lit(reason, dialect)}"
        for pref, reason in WARNING_PREFIX
    ]
    return "(CASE " + " ".join(branches) + " ELSE NULL END)"


def count_flags_sql(create: str, modify: str, delete: str, powerful: str,
                    *, create_threshold=200, modify_threshold=200,
                    delete_threshold=30, percentage=0.7,
                    top_threshold=1000) -> dict[str, str]:
    """The elif chain (osmcha/changeset.py:399-412) as three mutually
    exclusive boolean expressions (total==0 → all false)."""
    total = f"({create} + {modify} + {delete})"
    imp = (
        f"({total} > 0 AND cast({create} as double) / {total} > {percentage}"
        f" AND {create} > {create_threshold}"
        f" AND ({powerful} OR {create} > {top_threshold}))"
    )
    mod = (
        f"({total} > 0 AND NOT {imp}"
        f" AND cast({modify} as double) / {total} > {percentage}"
        f" AND {modify} > {modify_threshold})"
    )
    dele = (
        f"({total} > 0 AND NOT {imp} AND NOT {mod}"
        f" AND ((cast({delete} as double) / {total} > {percentage}"
        f" AND {delete} > {delete_threshold})"
        f" OR {delete} > {top_threshold}))"
    )
    return {"possible import": imp, "mass modification": mod,
            "mass deletion": dele}


def reasons_csv_sql(flag_exprs: dict[str, str], dialect: str) -> str:
    """Semicolon-joined reason CSV in canonical sorted order: each flag
    contributes its reason once — the portable stand-in for
    sort(distinct(reasons))."""
    parts = [
        f"(CASE WHEN {flag_exprs[r]} THEN {_lit(r + ';', dialect)} "
        f"ELSE '' END)"
        for r in sorted(flag_exprs)
    ]
    return "rtrim(concat(" + ", ".join(parts) + "), ';')"
