"""SparkSession factory and test-table loaders.

Local-mode settings follow the public Spark tuning guidance: shuffle
partitions ≈ cores (not the 200 default), AQE on for runtime re-planning
(skew joins, partition coalescing), UTC session timezone so timestamp
semantics line up with the DuckDB oracle, and Arrow enabled for any
pandas-UDF path.

At cluster scale these same settings remain correct except
``shuffle.partitions`` which should track total cores (AQE's
``coalescePartitions`` makes the initial number forgiving — it splits
and merges post-shuffle partitions at runtime).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def get_session(app_name: str = "maxscale-cdc-spark") -> SparkSession:
    """Build (or reuse) a local SparkSession tuned for this engine."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Read one of the test tables as a DataFrame (columnar parquet scan).

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark rejects unless
    ``nanosAsLong`` is on — set it here (runtime-settable) so queries work
    under any caller's session, not just ours. The column then reads as
    epoch-nanos LongType; queries convert as needed (DuckDB truncates the
    same column to microseconds, so parity outputs use ``ts DIV 1000``).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Read all test tables; also registers each as a temp view."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = load_table(spark, name, sf_dir)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
