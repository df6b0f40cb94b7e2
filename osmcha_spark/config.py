"""Engine configuration: rule thresholds and suspect-word lists.

Behavioral parity with the reference's config surface:
- word lists mirror ``osmcha/suspect_words.yaml:1-62`` (config *data*, not
  code; the three lists are the published rule vocabulary the engine must
  reproduce verbatim to match flag sets),
- threshold defaults mirror ``osmcha/changeset.py:251-254``,
- the ``SUSPECT_WORDS`` env-var override mirrors ``osmcha/changeset.py:23-33``
  (points at a YAML file with keys sources/common/exclude),
- ``Analyse``'s default ``suspect_words = common + sources`` ordering is kept
  (``osmcha/changeset.py:253``) because alternation order is observable in
  regex match counting.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


ILLEGAL_SOURCES = [
    "google", "nokia", "waze", "apple", "tomtom", "wikimapia", "goo.gl",
    "navteq", "teleatlas", "yelp", "yandex", "яндекс", "2gis", "2гис",
]

COMMON_SUSPECT_WORDS = [
    "pokemon", "import", "reimport", "re-import", "einführen",
    "Импортировать", "импорт", "インポート", "進口", "导入", "імпорт",
    "bad", "mess", "rubish", "shit", "crap", "broken", "haha", "jaja",
    "political", "mischief", "nuisance", "nonsense", "vandal", "newbie",
    "dirty", "monster", "xxx", "sex", "escort", "destroy", "harm", "drag",
    "damn", "fuck", "geofiction", "test",
]

EXCLUDED_WORDS = [
    "important", "importante", "yandex panorama", "яндекс панорам",
    "яндекс.панорам",
]

# Substring editor classifiers, lowered once: the reference compares each
# list entry against lower(created_by) (osmcha/changeset.py:374-381), so the
# mixed-case 'Services_OpenStreetMap' entry can only ever match in lowered
# form — we store it pre-lowered, which is behavior-identical.
POWERFUL_EDITORS = [
    "josm", "level0", "merkaartor", "qgis", "arcgis", "upload.py",
    "osmapi", "services_openstreetmap",
]

# Warning-tag rule table (osmcha/warnings.py:3-17): one exact-match rule,
# twelve prefix rules. Checked exact-first (osmcha/warnings.py:25-31).
WARNING_EXACT = {
    "warnings:suspicious_name:generic_name": "Generic name",
}
WARNING_PREFIX = [
    ("warnings:almost_junction", "Almost junction"),
    ("warnings:close_nodes", "Very close points"),
    ("warnings:crossing_ways", "Crossing ways"),
    ("warnings:disconnected_way", "Disconnected way"),
    ("warnings:impossible_oneway", "Impossible oneway"),
    ("warnings:incompatible_source", "suspect_word"),
    ("warnings:mismatched_geometry", "Mismatched geometry"),
    ("warnings:missing_role", "Missing role"),
    ("warnings:missing_tag", "Missing tag"),
    ("warnings:outdated_tags", "Outdated tags"),
    ("warnings:private_data", "Private information"),
    ("warnings:unsquare_way", "Unsquare corners"),
]

# Output-edge column drop list (osmcha/changeset.py:43-47): fields removed by
# get_dict(); in a fixed-schema DataFrame these simply never become columns.
FIELDS_TO_REMOVE = [
    "create_threshold", "modify_threshold", "illegal_sources",
    "delete_threshold", "percentage", "top_threshold", "suspect_words",
    "excluded_words", "warning_tags", "host", "review_requested",
]

MANDATORY_TAGS = ["id", "user", "uid", "bbox", "created_at", "comments_count"]

# The 17 output columns of get_dict() (tests assert len==17,
# osmcha reference tests test_mod.py:633,660,683).
OUTPUT_COLUMNS = [
    "id", "user", "uid", "editor", "bbox", "date", "comment",
    "comments_count", "source", "imagery_used", "is_suspect",
    "powerfull_editor", "suspicion_reasons", "create", "modify", "delete",
    "metadata",
]


def _load_words_override() -> dict | None:
    """Honor the SUSPECT_WORDS env var (osmcha/changeset.py:23-33): a YAML
    file with keys sources/common/exclude replacing the built-in lists."""
    path = os.environ.get("SUSPECT_WORDS")
    if not path:
        return None
    import yaml  # available transitively; gate anyway

    with open(path) as fh:
        return yaml.safe_load(fh.read())


@dataclass
class RulesConfig:
    """All rule knobs of the reference's ``Analyse`` ctor
    (osmcha/changeset.py:251-254), defaults identical."""

    create_threshold: int = 200
    modify_threshold: int = 200
    delete_threshold: int = 30
    percentage: float = 0.7
    top_threshold: int = 1000
    suspect_words: list[str] = field(default_factory=list)
    illegal_sources: list[str] = field(default_factory=list)
    excluded_words: list[str] = field(default_factory=list)

    def __post_init__(self) -> None:
        override = _load_words_override()
        sources = override["sources"] if override else ILLEGAL_SOURCES
        common = override["common"] if override else COMMON_SUSPECT_WORDS
        exclude = override["exclude"] if override else EXCLUDED_WORDS
        if not self.suspect_words:
            # ctor default order: common + sources (osmcha/changeset.py:253)
            self.suspect_words = list(common) + list(sources)
        if not self.illegal_sources:
            self.illegal_sources = list(sources)
        if not self.excluded_words:
            self.excluded_words = list(exclude)


DEFAULT_CONFIG = RulesConfig()
