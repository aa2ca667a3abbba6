"""Distributed exact ranking: global row_number / ntile without a
single-partition window.

``F.ntile(k).over(Window.orderBy(...))`` (no partitionBy) funnels the
whole input through ONE reducer — fine for a 1.5k-row aggregate, fatal
for a 100M-row one. The distributed form here is the classic
range-partitioned prefix sum:

1. ``repartitionByRange`` on the order columns — the range partitioner
   is order-preserving across partition ids, so partition *i* holds
   ranks strictly below partition *i+1*;
2. per-partition row counts (one tiny aggregate, rows = #partitions)
   turned into cumulative offsets by a window over that tiny frame —
   the ONLY unpartitioned step, size-independent of the data;
3. global rank = partition offset + within-partition ``row_number``;
4. tile from rank by the exact NTILE split (the first ``n mod k`` tiles
   get ``n div k + 1`` rows), so results are bit-identical to the
   window form — pinned by test.

The order columns must define a TOTAL order (include a unique
tie-breaker) or ranks — like window ntile's — would be nondeterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def exact_ntile(
    df: DataFrame, order_by: list[Column], k: int, out: str = "tile"
) -> DataFrame:
    """``df`` plus column ``out`` = NTILE(k) over the given total order."""
    pid = "_ent_pid"
    # The pid column embeds spark_partition_id over a SAMPLED range
    # partitioning — nondeterministic across physical evaluations. Both
    # the offsets aggregate and the join left side consume it, so the
    # frame must have exactly ONE physical evaluation: checkpoint it
    # eagerly (lineage truncated ⇒ re-evaluation impossible) rather than
    # trusting exchange reuse to unify the two plan branches. The
    # checkpointed blocks are the (pre-aggregated) ranking input, not
    # the fact table, and are released by the ContextCleaner.
    ranged = (
        df.repartitionByRange(*order_by)
        .withColumn(pid, F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    # Tiny frame: one row per partition. Cumulative count of the
    # preceding partitions = this partition's global rank offset.
    w_off = W.orderBy(pid).rowsBetween(W.unboundedPreceding, -1)
    w_all = W.orderBy(pid).rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    offsets = (
        ranged.groupBy(pid)
        .agg(F.count(F.lit(1)).alias("_ent_cnt"))
        .select(
            pid,
            F.coalesce(F.sum("_ent_cnt").over(w_off), F.lit(0)).alias("_ent_off"),
            F.sum("_ent_cnt").over(w_all).alias("_ent_n"),
        )
    )
    w_in = W.partitionBy(pid).orderBy(*order_by)
    ranked = (
        ranged.join(F.broadcast(offsets), pid)
        .withColumn("_ent_rank", F.col("_ent_off") + F.row_number().over(w_in))
    )
    # Exact NTILE split, all integer arithmetic (DIV) so the tile is
    # bit-identical to the window form on both engines.
    q = f"(_ent_n DIV {k})"
    r = f"(_ent_n % {k})"
    big = f"({r} * ({q} + 1))"
    tile = (
        f"CAST(CASE WHEN _ent_rank <= {big} "
        f"THEN (_ent_rank - 1) DIV ({q} + 1) "
        f"ELSE {r} + (_ent_rank - {big} - 1) DIV {q} "
        f"END + 1 AS BIGINT)"
    )
    return ranked.withColumn(out, F.expr(tile)).drop(
        pid, "_ent_off", "_ent_n", "_ent_rank"
    )


def exact_running_sum(
    df: DataFrame, order_by: list[Column], value_col: str, out: str = "running"
) -> DataFrame:
    """``df`` plus column ``out`` = SUM(value) OVER (ORDER BY ...) —
    the distributed form of a global cumulative sum.

    Same range-partitioned prefix-sum machinery as :func:`exact_ntile`
    (see module docstring): the only unpartitioned step is the
    #partitions-row offset aggregate, so no single reducer ever sees the
    data. The order columns must define a TOTAL order (unique
    tie-breaker), which also makes the window's default RANGE frame
    equal to a ROWS frame — no peer rows exist — so the result is
    bit-identical to the single-reducer window form (pinned by test).
    Keep ``value_col`` integral (e.g. exact cents) for cross-engine
    parity: a float running sum is order-sensitive in the last ulp.
    """
    pid = "_ers_pid"
    ranged = (
        df.repartitionByRange(*order_by)
        .withColumn(pid, F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    w_off = W.orderBy(pid).rowsBetween(W.unboundedPreceding, -1)
    offsets = (
        ranged.groupBy(pid)
        .agg(F.sum(value_col).alias("_ers_s"))
        .select(pid, F.coalesce(F.sum("_ers_s").over(w_off), F.lit(0)).alias("_ers_off"))
    )
    w_in = W.partitionBy(pid).orderBy(*order_by)
    return (
        ranged.join(F.broadcast(offsets), pid)
        .withColumn(out, F.col("_ers_off") + F.sum(value_col).over(w_in))
        .drop(pid, "_ers_off")
    )


def exact_rank(
    df: DataFrame, order_by: list[Column], out: str = "rank"
) -> DataFrame:
    """``df`` plus column ``out`` = ROW_NUMBER() OVER (ORDER BY ...) —
    the distributed global rank (1-based, gap-free).

    Same range-partitioned offset machinery as :func:`exact_ntile`; the
    order columns must define a TOTAL order (unique tie-breaker) for the
    rank to be deterministic. No single reducer at any input size.
    """
    pid = "_erk_pid"
    ranged = (
        df.repartitionByRange(*order_by)
        .withColumn(pid, F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    w_off = W.orderBy(pid).rowsBetween(W.unboundedPreceding, -1)
    offsets = (
        ranged.groupBy(pid)
        .agg(F.count(F.lit(1)).alias("_erk_cnt"))
        .select(
            pid,
            F.coalesce(F.sum("_erk_cnt").over(w_off), F.lit(0)).alias("_erk_off"),
        )
    )
    w_in = W.partitionBy(pid).orderBy(*order_by)
    return (
        ranged.join(F.broadcast(offsets), pid)
        .withColumn(out, (F.col("_erk_off") + F.row_number().over(w_in)).cast("bigint"))
        .drop(pid, "_erk_off")
    )
