"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship frontier-scheduling dataflow on sf0.001;
``queries``/``oracle_sql`` expose the operator surface of
``adavnceseo_crawler_spark`` (SURVEY.md §2) with DuckDB oracles.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: URL priority scoring + salted per-host politeness top-k +
    global priority cut (the frontier dequeue, U9+F4+W1) over a URL table
    synthesized from sf0.001 orders."""
    from pyspark.sql import functions as F

    from adavnceseo_crawler_spark.functions.scoring import (
        depth_damping,
        pattern_weight,
    )
    from adavnceseo_crawler_spark.functions.urls import path_depth
    from adavnceseo_crawler_spark.operators.politeness import schedule_batch

    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    pat = (
        F.when(F.col("o_orderkey") % 4 == 0, "/article/")
        .when(F.col("o_orderkey") % 4 == 1, "/news/")
        .when(F.col("o_orderkey") % 4 == 2, "/tag/")
        .otherwise("/")
    )
    urls = o.select(
        F.concat(
            F.lit("https://host"),
            (F.col("o_custkey") % 25).cast("string"),
            F.lit(".example.com"),
            F.repeat(F.lit("/x"), (F.col("o_orderkey") % 5).cast("int")),
            pat,
            F.col("o_orderkey").cast("string"),
        ).alias("url"),
        F.concat(F.lit("host"), (F.col("o_custkey") % 25).cast("string")).alias("host"),
    ).withColumn("path", F.parse_url("url", F.lit("PATH")))
    scored = urls.withColumn(
        "score",
        pattern_weight(F.col("path")) * depth_damping(path_depth(F.col("path"))),
    )
    return schedule_batch(scored, budget=10, batch_size=200, salt_buckets=4).select(
        "host", "url", "score"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from adavnceseo_crawler_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from adavnceseo_crawler_spark.queries import ORACLES

    return dict(ORACLES)
