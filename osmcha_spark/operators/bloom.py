"""Bloom-filter-pruned semi-join: shrink the fact side BEFORE the shuffle.

The 100-TB join problem this solves: ``fact SEMI JOIN dim ON key`` where
``dim`` is itself too large to broadcast. Spark then plans a shuffled
semi-join — BOTH sides pay a full exchange, and the fact side's exchange
dominates (at 10^12 rows the shuffle write IS the job). But if only a
small fraction of fact keys survive, almost all of that shuffle is
wasted motion. The classic fix — what Spark's own runtime row-level
filtering (``spark.sql.optimizer.runtime.bloomFilter.enabled``) does for
equi-joins it can see through — is to build a tiny Bloom bitmap over the
dim keys, broadcast it, and drop fact rows at the SCAN, so the shuffle
carries survivors only. This operator spells that rewrite explicitly as
DataFrame ops (no Catalyst internals, no JVM sketch classes), which
makes it available to composed plans the optimizer can't infer through
(checkpointed stages, unions, UDF-derived keys).

Layout: the bitmap is ``m_bits`` bits stored as ``m_bits/64`` longs —
rows ``(word_idx, bits)`` built by ONE tiny aggregation over the dim
keys (map-side partial ``bit_or``, at most m/64 result rows regardless
of dim size). Each key sets ``k`` bits at positions
``md5_60(key, salt_i) mod m_bits``. The fact side probes by ``k``
BroadcastHashJoins on ``word_idx`` (each against the ≤ m/64-row bitmap
table — effectively free) and keeps rows with all k bits set.

EXACTNESS: Bloom filters have no false negatives, so the probe pass is
a superset of the true semi-join; the final shuffled ``leftsemi`` join
against dim removes the false positives. The result therefore equals
the plain semi-join BIT-FOR-BIT regardless of m/k — which is why the
q71 oracle is the plain ``IN`` subquery, with no sketch mirroring
needed (contrast q36/q38, where the APPROXIMATE result is the output
and the oracle must mirror candidate generation).

Sizing: false-positive rate ≈ (1 - e^{-k·n/m})^k; m = 16n bits at k=3
gives ~1.6%, i.e. a 10^9-key dim fits in a 2 GB bitmap — too big for
this rows-based encoding (the agg output is fine; the broadcast is
not). The practical envelope for THIS operator is dims up to ~10^8
keys (m ≈ 200 MB broadcast); past that, partition the dim and bloom
per partition, or fall back to the shuffled semi-join.

Reference counterpart: none (osmcha joins nothing at scale);
engine-side requirement (SURVEY §2.11). Spark's native counterpart:
InjectRuntimeFilter — cited above — which this re-expresses as an
explicit, composable operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _probe_exprs(key_expr: str, i: int, m_bits: int, salt: str):
    """(word_idx, bit_pos) SQL exprs for probe i of the key."""
    h = (
        f"cast(conv(substring(md5(concat(cast({key_expr} as string), "
        f"'{salt}{i}')), 1, 15), 16, 10) as long)"
    )
    p = f"({h} % {int(m_bits)}L)"
    return f"{p} div 64L", f"cast({p} % 64L as int)"


def bloom_build(
    dim: DataFrame,
    key_col: str,
    m_bits: int = 1 << 16,
    k: int = 3,
    salt: str = "bloom",
) -> DataFrame:
    """Aggregate the dim keys into a Bloom bitmap table
    ``(word_idx:long, bits:long)`` with ≤ m_bits/64 rows. One shuffle of
    at most k·m/64-sized partials (map-side combined)."""
    if m_bits % 64 or m_bits <= 0:
        raise ValueError("m_bits must be a positive multiple of 64")
    probes = []
    for i in range(k):
        w, b = _probe_exprs(key_col, i, m_bits, salt)
        probes.append(f"struct({w} as word_idx, shiftleft(1L, {b}) as bit)")
    return (
        dim.select(
            F.explode(F.expr(f"array({', '.join(probes)})")).alias("p")
        )
        .select("p.word_idx", "p.bit")
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("bits"))
    )


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    key_col: str,
    m_bits: int = 1 << 16,
    k: int = 3,
    salt: str = "bloom",
) -> DataFrame:
    """``fact`` rows whose ``key_col`` appears in ``dim`` — exactly the
    plain leftsemi join, but with the fact side Bloom-pruned before its
    exchange. k broadcast probes against the bitmap table, then the
    exact semi-join over survivors."""
    bloom = bloom_build(dim, key_col, m_bits=m_bits, k=k, salt=salt)
    pruned = fact
    for i in range(k):
        w, b = _probe_exprs(key_col, i, m_bits, salt)
        wcol, bitscol = f"_bw{i}", f"_bbits{i}"
        bl = bloom.select(
            F.col("word_idx").alias(wcol), F.col("bits").alias(bitscol)
        )
        pruned = (
            pruned.withColumn(wcol, F.expr(w))
            .join(F.broadcast(bl), wcol, "left")
            .where(
                F.expr(f"(shiftright(coalesce({bitscol}, 0L), {b}) & 1L)")
                == 1
            )
            .drop(wcol, bitscol)
        )
    return pruned.join(
        dim.select(key_col), [key_col], "leftsemi"
    )
