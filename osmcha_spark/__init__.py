"""osmcha_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Re-expresses the semantic dataflow of OSMCha/osmcha (reference at
/root/reference, GPLv3, studied for behavior only — no code reused) as
columnar Spark plans: scan → cell-indexed spatial join → vectorized rule
evaluation → flag-set aggregation, scaled to 10^12-row image+caption
corpora with explicit partitioning, skew salting, and checkpointed stages.

Layout:
    config      RulesConfig + suspect-word config data (behavioral parity)
    functions   pure Column builders: words, rules, warnings
    geo         cell index (Morton quadtree), PIP, rect-poly intersects
    operators   spatial joins, kNN, raster<->vector, dedup, similarity, text
    sources     replication gzip-XML scan, GeoJSON AOI, table loaders
    images      from-scratch PPM/BMP/PNG/QNT codecs, phash, PSNR
    plans       end-to-end analyse pipeline (the reference's full_analysis)
    streaming   structured-streaming replication source
"""

__version__ = "0.1.0"
