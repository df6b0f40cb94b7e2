"""The full suspicion-analysis pipeline: the Spark re-expression of
``Analyse.full_analysis()`` + ``get_dict()`` (osmcha/changeset.py:320-425).

One wide Catalyst plan replaces the reference's per-changeset object
mutation and its 2-3 HTTP round-trips per row:

    changesets ⋈(left) action_counts ⋈(left, broadcast) users
        → Project(normalization + every rule column)
        → Project(17-column output)

All rule predicates are native Columns (functions/words.py, functions/rules.py)
so the whole pipeline is a single whole-stage-codegen projection after the
two joins; the only optional Python boundary is the find_words parity UDF.

Scale notes (100 TB): the users dimension is broadcast (J3); the actions
side is pre-aggregated *before* the join (A1 partial aggregation means the
shuffle carries one row per changeset, not one per element); everything
else is embarrassingly parallel projection work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osmcha_spark.config import (
    FIELDS_TO_REMOVE,
    MANDATORY_TAGS,
    OUTPUT_COLUMNS,
    RulesConfig,
)
from osmcha_spark.functions.rules import (
    count_rule_reason_col,
    editor_missing_reason_col,
    powerful_editor_col,
    review_requested_reason_col,
    user_reasons_col,
    warning_reasons_col,
)
from osmcha_spark.functions.words import (
    find_words_py,
    illegal_imagery_col,
    illegal_source_col,
    suspect_comment_col,
)

# Keys excluded from the metadata map: the reference excludes any tag key
# that is already an instance attribute at set_fields time, a mandatory
# attribute, 'created_by', or a FIELDS_TO_REMOVE entry
# (osmcha/changeset.py:303-308). 'host' is special-cased back in when
# present and non-empty (:301-302).
_ATTRS_AT_SET_FIELDS = [
    "id", "user", "uid", "editor", "review_requested", "host", "bbox",
    "comment", "comments_count", "source", "imagery_used", "date",
    "suspicion_reasons", "is_suspect", "powerfull_editor", "warning_tags",
    "metadata",
]
METADATA_EXCLUDED_KEYS = sorted(
    set(_ATTRS_AT_SET_FIELDS) | set(MANDATORY_TAGS) | {"created_by"}
    | set(FIELDS_TO_REMOVE)
)


def wkt_bbox_col(
    min_lon, min_lat, max_lon, max_lat,
):
    """bbox as WKT at the output edge only (the reference stores
    ``Polygon(...).wkt``, osmcha/changeset.py:284): the closed 5-point
    rectangle of get_bounds (:122-139), 'POLYGON EMPTY' when coords are
    missing. Ring order matches the reference constructor: (min,min),
    (max,min), (max,max), (min,max), (min,min)."""
    def pt(x, y):
        return F.concat(x.cast("string"), F.lit(" "), y.cast("string"))

    ring = F.concat_ws(
        ", ",
        pt(min_lon, min_lat), pt(max_lon, min_lat), pt(max_lon, max_lat),
        pt(min_lon, max_lat), pt(min_lon, min_lat),
    )
    return F.when(
        min_lon.isNull() | min_lat.isNull() | max_lon.isNull() | max_lat.isNull(),
        F.lit("POLYGON EMPTY"),
    ).otherwise(F.concat(F.lit("POLYGON (("), ring, F.lit("))")))


def normalize_changesets(changesets: DataFrame) -> DataFrame:
    """Field normalization (``set_fields``, osmcha/changeset.py:274-313) as a
    single projection over the raw changesets table
    (id, user, uid, created_at, comments_count, min/max lon/lat, tags map).

    'Not reported' defaults apply only when the tag is absent (map lookup is
    NULL); a present-but-empty value stays '' — that distinction feeds the
    get_dict empty-string drop, which in a fixed relational schema becomes
    NULL-ing the field out (documented deviation: columns can't vanish
    per-row).
    """
    t = F.col("tags")
    host = t.getItem("host")
    return changesets.select(
        F.col("id").cast("long").alias("id"),
        F.col("user"),
        F.col("uid"),
        t.getItem("created_by").alias("editor"),
        t.getItem("review_requested").alias("review_requested"),
        F.coalesce(host, F.lit("Not reported")).alias("host"),
        wkt_bbox_col(
            F.col("min_lon"), F.col("min_lat"),
            F.col("max_lon"), F.col("max_lat"),
        ).alias("bbox"),
        F.col("min_lon"), F.col("min_lat"), F.col("max_lon"), F.col("max_lat"),
        F.coalesce(t.getItem("comment"), F.lit("Not reported")).alias("comment"),
        F.coalesce(
            F.col("comments_count").try_cast("int"), F.lit(0)
        ).alias("comments_count"),
        F.coalesce(t.getItem("source"), F.lit("Not reported")).alias("source"),
        F.coalesce(
            t.getItem("imagery_used"), F.lit("Not reported")
        ).alias("imagery_used"),
        F.to_timestamp(
            F.col("created_at"), "yyyy-MM-dd'T'HH:mm:ss'Z'"
        ).alias("date"),
        F.filter(
            F.map_keys(t), lambda k: k.startswith("warnings:")
        ).alias("warning_tags"),
        # int-cast parity: the reference int()-casts every metadata value
        # when parseable (osmcha/changeset.py:310-313); the map stays
        # string-typed, so a parseable value is normalized to its canonical
        # decimal rendering ('05' → '5', ' 7 ' → '7'). The cast is gated
        # behind a strict integer regex because engines disagree at the
        # edges (DuckDB TRY_CAST rounds '1.5' and accepts '1_0'; Python
        # int() rejects both '1.5' and — modulo PEP 515 — real-world tag
        # values with separators); the regex pins one accept-set
        # everywhere. int64 overflow falls back to the original string.
        F.transform_values(
            F.map_filter(
                t,
                lambda k, v: (
                    ((k == "host") & (v != ""))
                    | (~k.isin(METADATA_EXCLUDED_KEYS))
                ),
            ),
            lambda k, v: F.coalesce(
                F.when(
                    v.rlike(r"^\s*[+-]?[0-9]+\s*$"),
                    v.try_cast("bigint").cast("string"),
                ),
                v,
            ),
        ).alias("metadata"),
    )


def action_counts(actions: DataFrame) -> DataFrame:
    """A1 (osmcha/changeset.py:392-396): per-changeset create/modify/delete
    counts. Conditional count-aggregation — partial (map-side) combine makes
    the shuffle O(#changesets), not O(#elements)."""
    return actions.groupBy("changeset_id").agg(
        F.count(F.when(F.col("action") == "create", 1)).alias("create"),
        F.count(F.when(F.col("action") == "modify", 1)).alias("modify"),
        F.count(F.when(F.col("action") == "delete", 1)).alias("delete"),
    )


def analyse(
    changesets: DataFrame,
    counts: DataFrame,
    users: DataFrame,
    cfg: RulesConfig | None = None,
    parity_words: bool = False,
) -> DataFrame:
    """full_analysis (osmcha/changeset.py:320-328) over whole tables.

    ``counts`` is the pre-aggregated (changeset_id, create, modify, delete)
    table (see :func:`action_counts`); ``users`` is
    (uid, changeset_count, block_count). Both joined left — a changeset with
    no actions row behaves like the reference's redacted-changeset path
    (counts 0, no count flag), a missing user row like the API-failure path
    (no user flags).

    Reason-list assembly preserves the reference's observable semantics:
    ``verify_words`` deduplicates the reasons accumulated so far
    (count-stage + word-stage, osmcha/changeset.py:369) and *later* stages
    append without dedup — so user/warning/review reasons can duplicate
    earlier ones, exactly as in the reference.

    ``parity_words=True`` swaps the comment word-rule to the CPython-regex
    pandas UDF for byte-parity audit runs.
    """
    cfg = cfg or RulesConfig()

    df = normalize_changesets(changesets)
    df = df.join(counts, df["id"] == counts["changeset_id"], "left").drop(
        "changeset_id"
    )
    df = df.join(F.broadcast(users), "uid", "left")

    create = F.coalesce(F.col("create"), F.lit(0)).cast("long")
    modify = F.coalesce(F.col("modify"), F.lit(0)).cast("long")
    delete = F.coalesce(F.col("delete"), F.lit(0)).cast("long")

    powerful = powerful_editor_col(F.col("editor"))

    if parity_words:
        comment_hit = (
            F.col("comment").isNotNull()
            & (F.col("comment") != "")
            & F.coalesce(
                find_words_py(cfg.suspect_words, cfg.excluded_words)(
                    F.col("comment")
                ),
                F.lit(False),
            )
        )
    else:
        comment_hit = suspect_comment_col(F.col("comment"), cfg)

    word_reasons = F.array_compact(
        F.array(
            F.when(comment_hit, F.lit("suspect_word")),
            F.when(
                illegal_source_col(F.col("source"), cfg), F.lit("suspect_word")
            ),
            F.when(
                illegal_imagery_col(F.col("imagery_used"), cfg),
                F.lit("suspect_word"),
            ),
        )
    )

    count_reasons = F.concat(
        editor_missing_reason_col(F.col("editor")),
        count_rule_reason_col(create, modify, delete, powerful, cfg),
    )

    reasons = F.concat(
        F.array_distinct(F.concat(count_reasons, word_reasons)),
        user_reasons_col(F.col("changeset_count"), F.col("block_count")),
        warning_reasons_col(F.col("warning_tags")),
        review_requested_reason_col(F.col("review_requested")),
    )

    return df.select(
        "id", "user", "uid", "editor", "bbox", "date",
        # get_dict drops empty-string fields (osmcha/changeset.py:416-418);
        # fixed schema → NULL them instead.
        F.when(F.col("comment") == "", None)
        .otherwise(F.col("comment")).alias("comment"),
        "comments_count",
        F.when(F.col("source") == "", None)
        .otherwise(F.col("source")).alias("source"),
        F.when(F.col("imagery_used") == "", None)
        .otherwise(F.col("imagery_used")).alias("imagery_used"),
        (F.size(reasons) > 0).alias("is_suspect"),
        powerful.alias("powerfull_editor"),
        reasons.alias("suspicion_reasons"),
        create.alias("create"),
        modify.alias("modify"),
        delete.alias("delete"),
        F.col("metadata"),
    ).select(*OUTPUT_COLUMNS)
