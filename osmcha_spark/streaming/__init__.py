"""Structured Streaming surface (SURVEY.md §2.8).

The reference's streaming story is the replication sequence: numbered
gzipped changeset files plus a cursor file (``tests/state.yaml`` —
``sequence: 1392226``). Here the Structured Streaming file source tracks
file offsets in its checkpoint directory, replacing ``state.yaml``; each
replication file is an independent micro-batch and analysis is stateless
per changeset, so no watermarks or stateful operators are needed.
"""

from osmcha_spark.streaming.replication import (
    analysed_stream,
    read_replication_stream,
    run_replication_stream,
)

__all__ = [
    "read_replication_stream",
    "analysed_stream",
    "run_replication_stream",
]
