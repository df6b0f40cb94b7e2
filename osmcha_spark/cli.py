"""CLI sink: single-changeset verdict (SURVEY.md §2.1 S9, §3 E3).

Reference: ``osmcha <changeset_id>`` (osmcha/scripts/cli.py:7-23) fetches
one changeset over HTTP, runs ``full_analysis`` and echoes counts + a
suspect/not-suspect verdict. The engine twin filters the analysed *table*
to one id — the N+1 HTTP fetch becomes a pushed-down point lookup
(``WHERE id = ?`` prunes partitions/row groups via parquet min/max stats).

Output text matches the reference byte-for-byte:

    Created: N. Modified: N. Deleted: N
    The changeset ID is suspect! Reasons: a, b
    The changeset ID is not suspect!

Usage::

    python -m osmcha_spark.cli <changeset_id> --data-dir <dir with
        changesets/actions/users parquet>
"""

from __future__ import annotations

import argparse
import os
import sys

from pyspark.sql import SparkSession

from osmcha_spark.plans.analyse import action_counts, analyse


def verdict_lines(row) -> list[str]:
    """Render one analysed row exactly as osmcha/scripts/cli.py:13-22."""
    lines = [
        "Created: %s. Modified: %s. Deleted: %s"
        % (row["create"], row["modify"], row["delete"])
    ]
    if row["is_suspect"]:
        lines.append(
            "The changeset {} is suspect! Reasons: {}".format(
                row["id"], ", ".join(row["suspicion_reasons"])
            )
        )
    else:
        lines.append("The changeset %s is not suspect!" % row["id"])
    return lines


def run(changeset_id: int, data_dir: str, spark: SparkSession) -> list[str]:
    cs = spark.read.parquet(os.path.join(data_dir, "changesets.parquet"))
    acts = spark.read.parquet(os.path.join(data_dir, "actions.parquet"))
    users = spark.read.parquet(os.path.join(data_dir, "users.parquet"))
    # Point-lookup pushdown: filter BEFORE analyse so the scan prunes.
    cs = cs.where(cs["id"] == changeset_id)
    out = analyse(cs, action_counts(acts), users).select(
        "id", "create", "modify", "delete", "is_suspect", "suspicion_reasons"
    )
    rows = out.collect()
    if not rows:
        raise SystemExit(f"changeset {changeset_id} not found")
    return verdict_lines(rows[0].asDict())


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser("osmcha-spark", description=__doc__)
    p.add_argument("changeset_id", type=int)
    p.add_argument("--data-dir", required=True)
    p.add_argument("--master", default="local[4]")
    args = p.parse_args(argv)

    from osmcha_spark.session import get_spark

    spark = get_spark(master=args.master, app_name="osmcha-cli")
    for line in run(args.changeset_id, args.data_dir, spark):
        print(line)


if __name__ == "__main__":
    main(sys.argv[1:])
