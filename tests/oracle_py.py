"""Independent pure-Python reimplementation of the reference's rule
semantics, used ONLY to compute expected outputs for golden tests.

Written from the documented behavior in SURVEY.md §2 (each rule cited to
osmcha/changeset.py there); the reference repo itself is never imported.
Deliberately structured differently from both the reference (no classes,
no mutation) and the engine (no Spark) so a bug must be reproduced three
times to slip through.
"""

from __future__ import annotations

import re
from datetime import datetime

from osmcha_spark.config import (
    EXCLUDED_WORDS,
    FIELDS_TO_REMOVE,
    ILLEGAL_SOURCES,
    MANDATORY_TAGS,
    COMMON_SUSPECT_WORDS,
    POWERFUL_EDITORS,
    WARNING_EXACT,
    WARNING_PREFIX,
)

SUSPECT_WORDS = COMMON_SUSPECT_WORDS + ILLEGAL_SOURCES


def _pattern(words):
    return "|".join(rf"^{w}\.*|\.* {w}\.*" for w in words)


def find_words(text, suspect, excluded=()):
    low = text.lower()
    n_suspect = len(re.findall(_pattern(suspect), low))
    if excluded:
        n_excluded = len(re.findall(_pattern(list(excluded)), low))
        return n_suspect > n_excluded
    return n_suspect > 0


def warning_reason(tag):
    for k, v in WARNING_EXACT.items():
        if tag == k:
            return v
    for prefix, reason in WARNING_PREFIX:
        if tag.startswith(prefix):
            return reason
    return None


def expected_output(row, counts, users, *, create_threshold=200,
                    modify_threshold=200, delete_threshold=30,
                    percentage=0.7, top_threshold=1000):
    """Expected 17-field output for one raw changeset row (the fixture dict
    shape of osmcha_spark.fixtures) given the action-counts and users maps."""
    tags = dict(row["tags"]) if not isinstance(row["tags"], dict) else row["tags"]
    editor = tags.get("created_by")
    comment = tags.get("comment", "Not reported")
    source = tags.get("source", "Not reported")
    imagery = tags.get("imagery_used", "Not reported")
    review = tags.get("review_requested")
    host = tags.get("host", "Not reported")

    if row["min_lon"] is None:
        bbox = "POLYGON EMPTY"
    else:
        a, b, c, d = (row["min_lon"], row["min_lat"], row["max_lon"],
                      row["max_lat"])
        pts = [(a, b), (c, b), (c, d), (a, d), (a, b)]
        bbox = "POLYGON ((" + ", ".join(f"{x!r} {y!r}" for x, y in pts) + "))"

    reasons = []
    powerful = False

    # count stage (verify_editor then elif chain)
    if editor is None:
        powerful = True
        reasons.append("Software editor was not declared")
    else:
        powerful = any(e in editor.lower() for e in POWERFUL_EDITORS)

    create, modify, delete = counts.get(row["id"], (0, 0, 0))
    total = create + modify + delete
    if total > 0:
        if (create / total > percentage and create > create_threshold
                and (powerful or create > top_threshold)):
            reasons.append("possible import")
        elif modify / total > percentage and modify > modify_threshold:
            reasons.append("mass modification")
        elif ((delete / total > percentage and delete > delete_threshold)
              or delete > top_threshold):
            reasons.append("mass deletion")

    # words stage
    if comment and find_words(comment, SUSPECT_WORDS, EXCLUDED_WORDS):
        reasons.append("suspect_word")
    if source:
        for w in ILLEGAL_SOURCES:
            if w in source.lower():
                if w == "yandex" and "yandex panorama" in source.lower():
                    continue
                if w == "яндекс" and ("яндекс панорам" in source.lower()
                                      or "яндекс.панорам" in source.lower()):
                    continue
                reasons.append("suspect_word")
                break
    if imagery:
        for w in ILLEGAL_SOURCES:
            if w in imagery.lower():
                reasons.append("suspect_word")
                break

    # verify_words ends with dedup of everything so far (order-preserving
    # stand-in for list(set()); comparisons sort anyway)
    deduped = list(dict.fromkeys(reasons))

    # user stage
    u = users.get(row["uid"])
    if u is not None:
        changeset_count, block_count = u
        if changeset_count <= 50:
            deduped.append("New mapper")
        if block_count > 1:
            deduped.append("User has multiple blocks")

    # warning tags stage (map key order)
    for tag in tags:
        if tag.startswith("warnings:"):
            r = warning_reason(tag)
            if r is not None:
                deduped.append(r)

    if review == "yes":
        deduped.append("Review requested")

    # metadata
    attrs = {
        "id", "user", "uid", "editor", "review_requested", "host", "bbox",
        "comment", "comments_count", "source", "imagery_used", "date",
        "suspicion_reasons", "is_suspect", "powerfull_editor",
        "warning_tags", "metadata",
    }
    excluded_keys = attrs | set(MANDATORY_TAGS) | {"created_by"} | set(
        FIELDS_TO_REMOVE
    )
    metadata = {}
    if tags.get("host"):
        metadata["host"] = tags["host"]
    for k, v in tags.items():
        if k not in excluded_keys:
            metadata[k] = v

    return {
        "id": row["id"],
        "user": row["user"],
        "uid": row["uid"],
        "editor": editor,
        "bbox": bbox,
        "date": datetime.strptime(row["created_at"], "%Y-%m-%dT%H:%M:%SZ"),
        "comment": comment if comment != "" else None,
        "comments_count": int(row["comments_count"] or 0),
        "source": source if source != "" else None,
        "imagery_used": imagery if imagery != "" else None,
        "is_suspect": len(deduped) > 0,
        "powerfull_editor": powerful,
        "suspicion_reasons": deduped,
        "create": create,
        "modify": modify,
        "delete": delete,
        "metadata": metadata,
    }
