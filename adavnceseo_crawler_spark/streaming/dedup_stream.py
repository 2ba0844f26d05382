"""Streaming exact dedup: the incremental counterpart of q22 for a
continuously arriving document corpus (crawl output, firehose ingestion).

A document stream is deduplicated on its text hash across triggers: the
first arrival of a hash is emitted, every later copy is dropped — state
lives in the streaming state store, so a drained-and-resumed job
(AvailableNow, the engine's round cadence) keeps suppressing duplicates it
saw in earlier drains.  Built on ``dropDuplicates`` over the aggregation
state store; an optional event-time watermark bounds state for true
firehoses (duplicates further apart than the watermark are then only
best-effort suppressed — the batch MinHash/exact jobs remain the
ground-truth pass, this stream is the cheap front filter).

Scale shape: state is hash-partitioned by the dedup key across executors
(the same shuffle key the batch exact_dedup uses), size = one row per
DISTINCT hash (bounded by the watermark when set), lookups are state-store
point reads — no corpus rescan per trigger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOC_STREAM = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("event_ts", T.TimestampType()),
    ]
)


def dedup_docs_stream(
    src: DataFrame,
    watermark: str | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Transform a streaming documents frame into its first-arrival-only
    stream, keyed by md5(text) (the batch exact_dedup key)."""
    out = src.withColumn("text_hash", F.md5(F.col(text_col)))
    if watermark:
        out = out.withWatermark("event_ts", watermark)
        return out.dropDuplicatesWithinWatermark(["text_hash"])
    return out.dropDuplicates(["text_hash"])


def stream_dedup_documents(
    spark: SparkSession,
    docs_glob: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str | None = None,
):
    """AvailableNow drain: read document parquet files as a stream, emit
    only first-seen texts to ``out_dir``; the seen-hash state persists in
    ``checkpoint_dir`` across drains (exactly-once file source)."""
    src = (
        spark.readStream.schema(DOC_STREAM)
        .option("maxFilesPerTrigger", 64)
        .parquet(docs_glob)
    )
    deduped = dedup_docs_stream(src, watermark=watermark)
    return (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
