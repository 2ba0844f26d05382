"""Custom stateful streaming operator: per-host crawl accounting via
``applyInPandasWithState`` (SURVEY.md §2.9 stretch surface).

The batch engine derives per-host stats by incremental table merges
(scoring.domain_stats_update); this is the equivalent for a continuously
arriving crawl_log stream: state = running (total, ok, bytes) per host,
persisted in the streaming state store across triggers, emitting the updated
row for every host seen in a batch.  The reference's nearest analog is the
in-process domain dict it mutates per completion (url_frontier.py:188-196).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..schemas import CRAWL_LOG

OUTPUT = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("total_count", T.LongType(), False),
        T.StructField("success_count", T.LongType(), False),
        T.StructField("bytes", T.LongType(), False),
    ]
)

STATE = T.StructType(
    [
        T.StructField("total_count", T.LongType(), False),
        T.StructField("success_count", T.LongType(), False),
        T.StructField("bytes", T.LongType(), False),
    ]
)


def _update(
    key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    total, ok, nbytes = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        total += len(pdf)
        ok += int(pdf["success"].sum())
        nbytes += int(pdf["content_length"].fillna(0).sum())
    state.update((total, ok, nbytes))
    yield pd.DataFrame(
        [{"host": key[0], "total_count": total, "success_count": ok, "bytes": nbytes}]
    )


def stream_host_stats(
    spark: SparkSession,
    crawl_log_glob: str,
    out_dir: str,
    checkpoint_dir: str,
):
    """AvailableNow drain of crawl_log parquet into per-host running stats;
    state survives across drains via the checkpoint (exactly-once source)."""
    src = (
        spark.readStream.schema(CRAWL_LOG)
        .option("maxFilesPerTrigger", 64)
        .parquet(crawl_log_glob)
        .select("host", "success", "content_length")
    )
    stats = src.groupBy("host").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT,
        stateStructType=STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    def _sink(batch_df, batch_id):  # parquet has no update mode: append the
        batch_df.write.mode("append").parquet(out_dir)  # updated rows per batch

    return (
        stats.writeStream.outputMode("update")
        .foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
