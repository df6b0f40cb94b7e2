"""Replication-file source: gzipped changeset-XML batches → changesets rows.

Re-expresses ``ChangesetList.read_file`` + ``changeset_info``
(osmcha/changeset.py:213-228, 77-93) as a distributed scan: one replication
file ≈ one minute of edits, files are independent → ``binaryFile`` scan +
``mapInPandas`` doing gunzip + ElementTree per file. Embarrassingly parallel
(one task per file; at planet scale, millions of small files → coalesce by
``spark.sql.files.maxPartitionBytes`` or compact upstream).

The tag pivot keeps the reference's dict-zip last-wins override
(osmcha/changeset.py:84-93): an XML ``<tag k>`` literally named ``id``/
``user``/``uid``/``created_at``/``comments_count`` is silently overridden by
the attribute-derived value, because the attribute columns are written after
the tag map is built and the map never holds mandatory keys.
"""

from __future__ import annotations

import gzip
import xml.etree.ElementTree as ET
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

CHANGESETS_SCHEMA = (
    "id long, user string, uid string, created_at string, "
    "comments_count string, min_lon double, min_lat double, "
    "max_lon double, max_lat double, tags map<string,string>"
)


def _parse_file(content: bytes) -> list[dict]:
    root = ET.fromstring(gzip.decompress(content))
    rows = []
    for ch in root:
        # Tag pivot (changeset_info): tags first, attributes override.
        tags = {t.attrib.get("k"): t.attrib.get("v") for t in ch}
        for k in ("id", "user", "uid", "created_at", "comments_count"):
            tags.pop(k, None)  # attribute wins (dict-zip last-wins parity)

        def fattr(name: str) -> float | None:
            v = ch.get(name)
            return float(v) if v is not None else None

        rows.append(
            {
                "id": int(ch.get("id")),
                "user": ch.get("user"),
                "uid": ch.get("uid"),
                "created_at": ch.get("created_at"),
                "comments_count": ch.get("comments_count"),
                "min_lon": fattr("min_lon"),
                "min_lat": fattr("min_lat"),
                "max_lon": fattr("max_lon"),
                "max_lat": fattr("max_lat"),
                "tags": tags,
            }
        )
    return rows


def parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: Arrow batches of file ``content`` → changeset
    rows. Shared by the batch scan and the streaming source."""
    for pdf in batches:
        out: list[dict] = []
        for content in pdf["content"]:
            out.extend(_parse_file(bytes(content)))
        yield pd.DataFrame(
            out,
            columns=[
                "id", "user", "uid", "created_at", "comments_count",
                "min_lon", "min_lat", "max_lon", "max_lat", "tags",
            ],
        )


def read_replication(spark: SparkSession, path: str) -> DataFrame:
    """Scan ``*.osm.gz`` replication files under ``path`` into the
    changesets schema.

    Strict (reference-parity) error behavior: a corrupt file fails the
    scan, exactly as the reference's ``gzip.open`` + ElementTree would
    crash (osmcha/changeset.py:213-228). For the planet-scale pipeline
    where one bad minutely file must not poison a million-file scan,
    use :func:`read_replication_robust`."""
    binary = spark.read.format("binaryFile").load(path).select("content")
    return binary.mapInPandas(parse_batches, CHANGESETS_SCHEMA)


ROBUST_SCHEMA = (
    CHANGESETS_SCHEMA + ", src_file string, parse_error string"
)


def parse_batches_robust(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Fault-contained variant of :func:`parse_batches` (the q53
    decode_safe discipline applied to the source): each file parses
    inside its own try — good files yield their rows with
    ``parse_error`` NULL, a corrupt file yields exactly ONE quarantine
    row (all data columns NULL, ``src_file`` + ``parse_error`` set)
    instead of killing the task. One scan, no second pass; the
    quarantine is an ordinary filter (``parse_error IS NOT NULL``)
    downstream operators can route to a dead-letter sink."""
    cols = [
        "id", "user", "uid", "created_at", "comments_count",
        "min_lon", "min_lat", "max_lon", "max_lat", "tags",
        "src_file", "parse_error",
    ]
    for pdf in batches:
        out: list[dict] = []
        for content, src in zip(pdf["content"], pdf["path"]):
            try:
                rows = _parse_file(bytes(content))
            except Exception as exc:  # noqa: BLE001 — quarantine, not mask
                out.append({
                    "id": None, "user": None, "uid": None,
                    "created_at": None, "comments_count": None,
                    "min_lon": None, "min_lat": None,
                    "max_lon": None, "max_lat": None, "tags": None,
                    "src_file": src,
                    "parse_error": f"{type(exc).__name__}: {exc}",
                })
                continue
            for r in rows:
                r["src_file"] = src
                r["parse_error"] = None
            out.extend(rows)
        yield pd.DataFrame(out, columns=cols)


def read_replication_robust(spark: SparkSession, path: str) -> DataFrame:
    """Planet-scale replication scan with per-file fault containment:
    same rows as :func:`read_replication` for parseable files, plus one
    quarantine row per corrupt file (see :func:`parse_batches_robust`).
    Schema adds ``(src_file, parse_error)``; good-row set equality with
    the strict scan and quarantine behavior are pytest-gated."""
    binary = spark.read.format("binaryFile").load(path).select(
        "content", "path"
    )
    return binary.mapInPandas(parse_batches_robust, ROBUST_SCHEMA)


# Public replication endpoint the reference reads from (the docstring of
# ChangesetList.process_changeset_list, osmcha/changeset.py:197-200).
OSM_REPLICATION_BASE = (
    "https://planet.openstreetmap.org/replication/changesets"
)


def replication_base() -> str:
    """Default replication endpoint, honoring the ``OSM_SERVER_URL`` env
    override the same way the reference does for its API base
    (osmcha/changeset.py:34-38: ``environ.get('OSM_SERVER_URL', ...)``
    resolved at import; here resolved per call so tests can monkeypatch).
    With the var set, replication lives under
    ``$OSM_SERVER_URL/replication/changesets``."""
    import os

    server = os.environ.get("OSM_SERVER_URL")
    if server:
        return f"{server.rstrip('/')}/replication/changesets"
    return OSM_REPLICATION_BASE


def replication_url(seq: int, base: str | None = None) -> str:
    """Sequence number → replication file URL: seq 2703456 lives at
    ``<base>/002/703/456.osm.gz`` (three zero-padded path segments of the
    9-digit sequence). ``base`` defaults to :func:`replication_base`
    (env-overridable)."""
    base = base if base is not None else replication_base()
    s = f"{seq:09d}"
    return f"{base}/{s[0:3]}/{s[3:6]}/{s[6:9]}.osm.gz"


def fetch_replication(
    seqs: "int | tuple[int, int] | list[int]",
    dest_dir: str,
    base: str | None = None,
) -> list[str]:
    """Driver-side download of replication files (SURVEY §2.1 S2) —
    mirrors ``ChangesetList.read_file``'s urlretrieve-to-tmpdir path
    (osmcha/changeset.py:220-228), but into a caller-owned ``dest_dir``
    that ``read_replication`` / the streaming source then scan. Stdlib
    urllib only; ``seqs`` is a single sequence, an inclusive (lo, hi)
    range, or an explicit list. Returns the local paths, in seq order.

    Deliberately driver-side: the download is an ingest step (~1 file per
    minute of planet edits), not a distributed compute step — at backfill
    scale you parallelize by splitting the seq range across *jobs*, each
    landing files where its executors' scan can see them.
    """
    import os
    from urllib.request import urlretrieve

    if isinstance(seqs, int):
        seq_list = [seqs]
    elif isinstance(seqs, tuple):
        lo, hi = seqs
        seq_list = list(range(lo, hi + 1))
    else:
        seq_list = list(seqs)
    os.makedirs(dest_dir, exist_ok=True)
    out = []
    for seq in seq_list:
        local = os.path.join(dest_dir, f"{seq:09d}.osm.gz")
        urlretrieve(replication_url(seq, base), local)
        out.append(local)
    return out


def write_replication_gz(rows: "list[dict]", path: str) -> None:
    """Serialize changeset rows back to the replication wire format
    (gzipped ``<osm><changeset …><tag …/></changeset></osm>``) — the
    inverse of :func:`_parse_file`, for harnesses and tests that need
    scenario rows to ARRIVE as a replication batch. ``rows`` follow the
    CHANGESETS_SCHEMA field names; bbox attrs are omitted when None/NaN
    (the relation-only changeset shape)."""
    import math
    import xml.etree.ElementTree as ET

    root = ET.Element("osm")
    for r in rows:
        attrs = {
            "id": str(r["id"]),
            "user": r["user"] or "",
            "uid": r["uid"] or "",
            "created_at": r["created_at"] or "",
            "comments_count": str(r["comments_count"]),
        }
        for a in ("min_lon", "min_lat", "max_lon", "max_lat"):
            v = r.get(a)
            if v is not None and not (
                isinstance(v, float) and math.isnan(v)
            ):
                attrs[a] = repr(float(v))
        ch = ET.SubElement(root, "changeset", attrs)
        for k, v in (r.get("tags") or {}).items():
            ET.SubElement(ch, "tag", {"k": k, "v": v})
    with gzip.open(path, "wb") as f:
        f.write(ET.tostring(root, encoding="utf-8"))
