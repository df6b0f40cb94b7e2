"""Stateful streaming operators (engine-only; SURVEY.md §2.8 extension).

The reference has no stateful streaming — but it does have a per-user
side lookup: every changeset triggers an HTTP fetch of the author's
lifetime stats (``get_user_details``, osmcha/changeset.py:230-248) whose
``changesets_count ≤ 50`` feeds the *new mapper* rule. At stream scale
that lookup inverts naturally into a **stateful streaming aggregate**:
keep per-uid running totals in Spark's keyed state store and emit the
updated row each micro-batch — no external service on the hot path, state
checkpointed with the query (a restart resumes the totals, exactly like
the file-source offsets).

``applyInPandasWithState`` is the right tool (not ``agg``): the update is
a custom merge (counts + min-first-seen + suspect tally), the emitted row
must carry derived rule columns (``is_new_mapper``), and state needs an
explicit schema + optional TTL — none of which a built-in windowed agg
expresses.

Scale shape: state is partitioned by uid across executors (one shuffle per
micro-batch on uid — unavoidable for keyed state), each key holds one
fixed-width row, and batches arrive Arrow-vectorized per key group.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# Running per-user totals; NEW_MAPPER_MAX mirrors the reference's
# ``changesets_count <= 50`` threshold (osmcha/changeset.py:373-375).
NEW_MAPPER_MAX = 50

USER_STATS_STATE_SCHEMA = (
    "changesets_count long, suspect_count long, first_seen string"
)
USER_STATS_OUTPUT_SCHEMA = (
    "uid string, changesets_count long, suspect_count long, "
    "first_seen string, is_new_mapper boolean"
)


def _update_user_stats(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Merge this micro-batch's rows for one uid into its running state.

    Pure driver-free kernel: receives Arrow batches for the key, reads the
    previous (count, suspect, first_seen) tuple, emits ONE updated row.
    """
    n = 0
    suspects = 0
    first_seen: str | None = None
    for pdf in pdfs:
        n += len(pdf)
        if "is_suspect" in pdf.columns:
            suspects += int(pdf["is_suspect"].fillna(False).sum())
        if "created_at" in pdf.columns and len(pdf):
            vals = pdf["created_at"].dropna()
            # emptiness check, not `is not None`: pandas min() over an
            # empty series returns float NaN, which would poison the
            # string-typed state field (str < float TypeError later)
            if len(vals):
                batch_min = vals.min()
                if first_seen is None or batch_min < first_seen:
                    first_seen = batch_min

    if state.exists:
        prev_n, prev_suspects, prev_first = state.get
        n += prev_n
        suspects += prev_suspects
        if prev_first is not None and (
            first_seen is None or prev_first < first_seen
        ):
            first_seen = prev_first
    state.update((n, suspects, first_seen))

    yield pd.DataFrame(
        {
            "uid": [key[0]],
            "changesets_count": [n],
            "suspect_count": [suspects],
            "first_seen": [first_seen],
            "is_new_mapper": [n <= NEW_MAPPER_MAX],
        }
    )


def user_stats_stream(changesets: DataFrame) -> DataFrame:
    """(uid, changesets_count, suspect_count, first_seen, is_new_mapper)
    per micro-batch — the streaming-stateful replacement for the
    reference's per-changeset HTTP user lookup (S5).

    Input: a streaming changesets frame (``read_replication_stream``
    output, optionally post-``analyse`` so ``is_suspect`` is present).
    Output mode "update": one refreshed row per uid seen in the batch;
    state survives restarts via the query checkpoint.
    """
    cols = ["uid", "created_at"]
    if "is_suspect" in changesets.columns:
        cols.append("is_suspect")
    return (
        changesets.select(*[F.col(c) for c in cols])
        .groupBy("uid")
        .applyInPandasWithState(
            _update_user_stats,
            outputStructType=USER_STATS_OUTPUT_SCHEMA,
            stateStructType=USER_STATS_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
