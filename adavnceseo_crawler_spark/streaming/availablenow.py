"""Structured Streaming wrapper (SURVEY.md §2.9 stretch goal).

The engine's core is iterative batch rounds (BSP supersteps) — the reference
has no true stream semantics (no watermarks/event-time windows; SURVEY.md §2.9).
This wrapper exposes the committed ``crawl_log`` parquet dirs as a file stream
with ``Trigger.AvailableNow`` so downstream consumers (e.g. a metrics
dashboard) can incrementally process new rounds with exactly-once file-source
semantics, including a watermarked per-host windowed count as the example
stateful op.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..schemas import CRAWL_LOG


def stream_crawl_log(
    spark: SparkSession,
    crawl_log_glob: str,
    out_dir: str,
    checkpoint_dir: str,
):
    """Incrementally aggregate fetches per host per 1h event-time window.

    Returns the StreamingQuery (AvailableNow: drains what exists, then stops).
    """
    src = (
        spark.readStream.schema(CRAWL_LOG)
        .option("maxFilesPerTrigger", 64)
        .parquet(crawl_log_glob)
    )
    agg = (
        src.withWatermark("fetched_ts", "2 hours")
        .groupBy(F.window("fetched_ts", "1 hour").alias("w"), F.col("host"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("success").cast("long")).alias("n_ok"),
        )
        .select(F.col("w.start").alias("window_start"), "host", "n", "n_ok")
    )
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
