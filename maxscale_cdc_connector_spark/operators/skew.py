"""Skew mitigation: salted joins and two-stage salted aggregation.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized shuffle partitions. These operators are
the *explicit* mitigation for the cases AQE can't fix:

* a shuffled join where one key's rows exceed a single task's memory —
  ``salted_join`` spreads each hot key over ``n_salts`` tasks by
  replicating the small side (salt ⨯ R replication ⇒ R-way parallelism
  per key, at the cost of R× the small side's shuffle volume);
* a groupBy where one group dominates — ``salted_agg`` pre-aggregates
  per (key, salt) so the hot group collapses in parallel before the
  final per-key merge (this generalizes what map-side partial
  aggregation already does when the hot key spans many partitions of a
  *wide* shuffle).

Both are result-identical to their unsalted forms (the salt is an
internal rendezvous column, dropped before returning) — which is what
makes them oracle-checkable against plain SQL.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 8


def _fact_salt(n_salts: int, cols: Sequence[str]) -> Column:
    """Deterministic per-row salt derived from non-join columns — stable
    across retries (no rand(), which would break task re-execution)."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salts))


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    on: str,
    salt_source_cols: Sequence[str],
    n_salts: int = DEFAULT_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the fact side's hot keys spread over n_salts tasks.

    The dim side is exploded ×n_salts (every key appears once per salt
    value) and the join key becomes (key, salt) — each hot key's rows
    now hash to n_salts different shuffle partitions instead of one.
    """
    salted_facts = facts.withColumn("_salt", _fact_salt(n_salts, salt_source_cols))
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted_facts.join(salted_dim, [on, "_salt"], how)
    return out.drop("_salt")


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    salt_source_cols: Sequence[str],
    partials: Sequence[tuple[Column, str]],
    finals: Sequence[tuple[Column, str]],
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Two-stage aggregation: groupBy(keys + salt) → groupBy(keys).

    ``partials`` are (aggregate expression, alias) computed per
    (key, salt); ``finals`` are (merge expression over the partial
    aliases, alias) producing the per-key result. The caller supplies
    both halves because the merge of an aggregate is aggregate-specific
    (count → sum of counts, sum → sum of sums, max → max of maxes, avg →
    sum/sum — which is why avg needs sum+count partials).
    """
    salted = df.withColumn("_salt", _fact_salt(n_salts, salt_source_cols))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[expr.alias(name) for expr, name in partials]
    )
    return partial.groupBy(*keys).agg(*[expr.alias(name) for expr, name in finals])
