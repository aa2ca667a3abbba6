"""Bucketed co-located join: the shuffle-elimination path for repeated
big-big joins (SURVEY.md scale notes).

At 100 TB the fact tables are written bucketed by their join key once;
every subsequent join on that key then reads co-located buckets and
skips both shuffles entirely. This test pins that the engine's tables
actually get that plan: same results as the shuffled join, zero
Exchange operators in the physical plan.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from maxscale_cdc_connector_spark.session import load_table

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_orderpriority")
    (
        li.write.bucketBy(N_BUCKETS, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(base / "li"))
        .mode("overwrite")
        .saveAsTable("bkt_lineitem")
    )
    (
        orders.write.bucketBy(N_BUCKETS, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", str(base / "orders"))
        .mode("overwrite")
        .saveAsTable("bkt_orders")
    )
    yield "bkt_lineitem", "bkt_orders"
    spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
    spark.sql("DROP TABLE IF EXISTS bkt_orders")


def test_bucketed_join_is_shuffle_free_and_correct(spark, sf_dir, bucketed_tables) -> None:
    li_t, o_t = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table(li_t)
            .join(spark.table(o_t), F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"), F.round(F.sum("l_extendedprice"), 2).alias("total"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # Both sides bucketed by the join key with equal bucket counts ⇒
        # the join itself needs no Exchange (the only exchange allowed is
        # the one feeding the final aggregation).
        join_part = plan.split("HashAggregate")[-1]
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange" not in join_part, f"join still shuffles:\n{join_part}"

        # And it computes exactly what the plain shuffled join computes.
        li = load_table(spark, "lineitem", sf_dir)
        orders = load_table(spark, "orders", sf_dir)
        want = {
            r["o_orderpriority"]: (r["n"], r["total"])
            for r in (
                li.join(orders, li.l_orderkey == orders.o_orderkey)
                .groupBy("o_orderpriority")
                .agg(
                    F.count("*").alias("n"),
                    F.round(F.sum("l_extendedprice"), 2).alias("total"),
                )
                .collect()
            )
        }
        got = {r["o_orderpriority"]: (r["n"], r["total"]) for r in joined.collect()}
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
