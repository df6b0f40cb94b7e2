"""Portable derived-input synthesis: turn the driver's TPC-H-ish tables
into the engine's geospatial/changeset inputs with arithmetic that is
IDENTICAL in Spark SQL and DuckDB.

Why: the correctness gate runs every engine query against a DuckDB oracle
on the same parquet. Synthesizing inputs inside the query — from
``orders``/``customer`` rows via integer hashing — means both engines see
byte-identical inputs with no fixture files in the loop, and every
derivation stays inside the ANSI subset both dialects share.

Portability rules used throughout:
- the only string hash is the md5-hex-prefix→int64 trick (the one construct
  with dialect-specific spelling, isolated in :func:`md5long`),
- integer mod/multiply stays < 2^62 (DuckDB raises on int64 overflow,
  Spark wraps — avoid the divergence entirely),
- array indexing differs (0- vs 1-based) → pool selection uses CASE chains,
- double arithmetic is identical IEEE expression trees on both sides,
- integer division TRUNCATES toward zero in BOTH dialects (Spark ``div``
  and DuckDB ``//`` — measured: ``SELECT -7 // 2`` is −3 in DuckDB 1.0);
  when the engine needs FLOOR semantics (time bucketing, TWAP) it uses
  events.py:_floordiv and the oracle must mirror with
  ``(x - ((x % d) + d) % d) // d`` — never bare ``//``.
"""

from __future__ import annotations

SPARK = "spark"
DUCKDB = "duckdb"


def md5long(expr: str, dialect: str) -> str:
    """60-bit int64 from md5 hex prefix of a string expression."""
    if dialect == SPARK:
        return f"cast(conv(substring(md5({expr}), 1, 15), 16, 10) as bigint)"
    return f"CAST('0x' || substring(md5({expr}), 1, 15) AS BIGINT)"


def idiv(expr: str, n: int, dialect: str) -> str:
    """Integer division — ``/`` is FLOAT division in both dialects; the
    integer operator differs (Spark ``div``, DuckDB ``//``)."""
    op = "div" if dialect == SPARK else "//"
    return f"(({expr}) {op} {n})"


def hash_of(expr: str, salt: str, dialect: str) -> str:
    """Salted integer hash of any expression, via its string form."""
    return md5long(f"concat(cast({expr} as string), '{salt}')", dialect)


def _pool_case(sel_expr: str, pool: list[str]) -> str:
    """CASE chain selecting pool[sel % len] — dialect-free array indexing."""
    n = len(pool)
    branches = " ".join(
        f"WHEN {i} THEN '" + p.replace("'", "''") + "'"
        for i, p in enumerate(pool)
    )
    return f"(CASE ({sel_expr}) % {n} {branches} END)"


COMMENT_POOL = [
    "Added a building near the park",
    "import buildings",
    "fix road names",
    "google maps used as reference",
    "survey of local shops",
    "mass edit of the area",
    "added pois from survey",
    "test upload please ignore",
]
SOURCE_POOL = [
    "Bing", "survey", "Waze", "local knowledge", "Yandex Panorama",
    "GPS traces", "google earth", "taginfo",
]
IMAGERY_POOL = [
    "Bing", "Esri World Imagery", "Mapbox",
    "Custom (googlemaps tiles)", "IBGE",
]
EDITOR_POOL = [
    "JOSM/1.5 (8339 en)", "iD 2.20.2", "Potlatch 2", "Level0 v1.1",
    "StreetComplete 40.2", "Merkaartor 0.18", "QGIS plugin", "Vespucci 16",
]
WARNING_POOL = [
    "warnings:crossing_ways:building-building",
    "warnings:missing_tag:any",
    "warnings:disconnected_way:highway",
    "warnings:suspicious_name:generic_name",
    "warnings:fix_me",
]


def changesets_sql(dialect: str, orders: str = "orders") -> str:
    """Changeset-shaped rows derived from ``orders``: one changeset per
    order, flat tag columns (the Spark wrapper rebuilds the tags map).

    Bboxes: 5% NULL (relation-only changesets); 30% clustered into 5 urban
    hotspots (skew by construction); widths up to ~0.1°.
    """
    h1 = hash_of("o_orderkey", "g1", dialect)
    h2 = hash_of("o_orderkey", "g2", dialect)
    h3 = hash_of("o_orderkey", "g3", dialect)

    # center in micro-degrees
    hot = f"(({h2}) % 10)"
    hotspots_lon = (
        f"(CASE (({h2}) % 5) WHEN 0 THEN -74006000 WHEN 1 THEN 139691700 "
        f"WHEN 2 THEN -127600 WHEN 3 THEN 2352200 ELSE 77209000 END)"
    )
    hotspots_lat = (
        f"(CASE (({h2}) % 5) WHEN 0 THEN 40712800 WHEN 1 THEN 35689500 "
        f"WHEN 2 THEN 51507400 WHEN 3 THEN 48856600 ELSE 28613900 END)"
    )
    clon = (
        f"(CASE WHEN {hot} < 3 THEN {hotspots_lon} + (({h1}) % 100001) - 50000 "
        f"ELSE (({h1}) % 340000000) - 170000000 END)"
    )
    clat = (
        f"(CASE WHEN {hot} < 3 THEN {hotspots_lat} + (({h1}) % 80001) - 40000 "
        f"ELSE ({idiv(h1, 7, dialect)} % 160000000) - 80000000 END)"
    )
    wdt = f"((({h3}) % 50000) + 10)"
    hgt = f"(({idiv(h3, 11, dialect)} % 50000) + 10)"
    null_bbox = f"((({h3}) % 20) = 7)"

    comment = _pool_case(h1, COMMENT_POOL)
    source = _pool_case(idiv(h1, 13, dialect), SOURCE_POOL)
    imagery = _pool_case(idiv(h1, 17, dialect), IMAGERY_POOL)
    editor = _pool_case(idiv(h2, 13, dialect), EDITOR_POOL)
    warning = _pool_case(idiv(h3, 13, dialect), WARNING_POOL)

    return f"""
SELECT
  o_orderkey AS id,
  concat('user', cast(o_custkey % 997 as string)) AS user,
  cast(o_custkey % 997 as string) AS uid,
  '2023-05-17T12:00:00Z' AS created_at,
  cast(({h1}) % 7 as string) AS comments_count,
  CASE WHEN {null_bbox} THEN NULL
       ELSE cast({clon} - {wdt} as double) / 1000000.0 END AS min_lon,
  CASE WHEN {null_bbox} THEN NULL
       ELSE cast({clat} - {hgt} as double) / 1000000.0 END AS min_lat,
  CASE WHEN {null_bbox} THEN NULL
       ELSE cast({clon} + {wdt} as double) / 1000000.0 END AS max_lon,
  CASE WHEN {null_bbox} THEN NULL
       ELSE cast({clat} + {hgt} as double) / 1000000.0 END AS max_lat,
  CASE WHEN (({h2}) % 11) = 3 THEN NULL ELSE {comment} END AS comment,
  CASE WHEN (({h2}) % 13) = 5 THEN NULL ELSE {source} END AS source,
  CASE WHEN (({h2}) % 17) = 7 THEN NULL ELSE {imagery} END AS imagery_used,
  CASE WHEN (({h2}) % 19) = 11 THEN NULL ELSE {editor} END AS created_by,
  CASE WHEN (({h3}) % 23) = 13 THEN 'yes' ELSE NULL END AS review_requested,
  CASE WHEN (({h3}) % 7) = 2 THEN {warning} ELSE NULL END AS warning_key
FROM {orders}
"""


def actions_counts_sql(dialect: str, orders: str = "orders") -> str:
    """Pre-aggregated action counts per derived changeset, hash-distributed
    with heavy-tailed create/modify/delete so every count-rule branch
    fires."""
    h = hash_of("o_orderkey", "a1", dialect)
    return f"""
SELECT
  o_orderkey AS changeset_id,
  CASE WHEN (({h}) % 31) = 0 THEN {idiv(h, 7, dialect)} % 4000
       ELSE ({h}) % 40 END AS create,
  CASE WHEN (({h}) % 37) = 1 THEN {idiv(h, 11, dialect)} % 3000
       ELSE {idiv(h, 13, dialect)} % 40 END AS modify,
  CASE WHEN (({h}) % 41) = 2 THEN {idiv(h, 17, dialect)} % 2000
       ELSE {idiv(h, 19, dialect)} % 20 END AS delete
FROM {orders}
"""


def users_sql(dialect: str, customer: str = "customer") -> str:
    h = hash_of("c_custkey", "u1", dialect)
    return f"""
SELECT
  cast(c_custkey % 997 as string) AS uid,
  CASE WHEN (({h}) % 5) = 0 THEN ({h}) % 49
       ELSE 100 + (({h}) % 9000) END AS changeset_count,
  CASE WHEN (({h}) % 11) = 3 THEN 2 ELSE ({h}) % 2 END AS block_count
FROM (SELECT DISTINCT c_custkey % 997 AS c_custkey FROM {customer}) t
"""


def points_sql(dialect: str, customer: str = "customer") -> str:
    """One point per customer row — the kNN / cell-encode input. Clustered:
    60% of points land in 8 tight clusters."""
    h1 = hash_of("c_custkey", "p1", dialect)
    h2 = hash_of("c_custkey", "p2", dialect)
    cluster_lon = f"((({h2}) % 8) * 40000000 - 160000000 + (({h1}) % 200001) - 100000)"
    cluster_lat = (
        f"((({h2}) % 8) * 18000000 - 72000000"
        f" + ({idiv(h1, 7, dialect)} % 200001) - 100000)"
    )
    return f"""
SELECT
  c_custkey AS id,
  CASE WHEN (({h2}) % 10) < 6
       THEN cast({cluster_lon} as double) / 1000000.0
       ELSE cast((({h1}) % 340000000) - 170000000 as double) / 1000000.0
  END AS lon,
  CASE WHEN (({h2}) % 10) < 6
       THEN cast({cluster_lat} as double) / 1000000.0
       ELSE cast(({idiv(h1, 7, dialect)} % 160000000) - 80000000 as double) / 1000000.0
  END AS lat
FROM {customer}
"""


def register_synth_views(spark, sf_dir: str) -> None:
    """Register the base parquet tables as Spark temp views so the Spark
    side can run the same synthesis SQL the oracle runs in DuckDB."""
    import os

    for name in ("orders", "customer", "supplier", "lineitem", "events",
                 "documents", "embeddings", "part", "region", "nation"):
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            spark.read.parquet(path).createOrReplaceTempView(name)


def changesets_df(spark, sf_dir: str):
    """The derived changesets as a DataFrame with the engine's ``tags`` map
    rebuilt from the flat columns (NULL values omitted from the map)."""
    from pyspark.sql import functions as F

    register_synth_views(spark, sf_dir)
    flat = spark.sql(changesets_sql(SPARK))
    tag_cols = {
        "created_by": "created_by", "comment": "comment",
        "source": "source", "imagery_used": "imagery_used",
        "review_requested": "review_requested",
    }
    entries = [
        F.when(
            F.col(c).isNotNull(),
            F.struct(F.lit(k).alias("key"), F.col(c).alias("value")),
        )
        for k, c in tag_cols.items()
    ] + [
        F.when(
            F.col("warning_key").isNotNull(),
            F.struct(
                F.col("warning_key").alias("key"), F.lit("1").alias("value")
            ),
        )
    ]
    tags = F.map_from_entries(F.array_compact(F.array(*entries)))
    return flat.select(
        "id", "user", "uid", "created_at", "comments_count",
        "min_lon", "min_lat", "max_lon", "max_lat",
        tags.alias("tags"),
    )
