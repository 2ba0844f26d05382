"""Freshness-driven re-crawl scheduling — change-rate estimation.

A crawler that revisits pages must decide WHICH pages to refetch first.
The classic answer (Cho & Garcia-Molina 2003, "Effective page refresh
policies for web crawlers") estimates each page's change rate from its
observation history and prioritizes pages by the expected number of
changes missed since the last visit: ``priority = change_rate * age``.

The reference tracks per-domain crawl recency (crawler.py domain-tracking
sink) but never models per-page change rates; this operator is the
training-data-pipeline extension of that surface: given an observation log
``(entity, ts, observed_value)`` — here the driver's ``events`` table,
where ``user_id`` stands for the page and ``value`` for the content
fingerprint observed at ``ts`` — it emits one row per entity with its
estimated change rate, staleness age, and re-crawl priority.

Scale shape (100 TB of fetch logs): ONE shuffle.  The lag window and the
per-entity aggregate share the same key, so Catalyst plans a single
Exchange on ``id_col`` and runs the window sort and the partial aggregate
inside the same stage.  The corpus-wide "now" (max ts) rides the plan as a
broadcast 1-row aggregate — no separate count/collect job (the q53/q64
convention).  All arithmetic stays in exact integer microseconds until the
final division, so Spark and the SQL oracle agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_US_PER_DAY = 86_400_000_000.0


def change_rate_priority(
    events: DataFrame,
    id_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_col: str = "event_id",
    now_ts=None,
) -> DataFrame:
    """Per-entity change statistics and re-crawl priority.

    An entity's history is its events ordered by ``(ts, order_col)``; a
    *change* is an observation whose ``value_col`` differs from the
    previous observation's.  With ``n_obs`` observations and ``n_changes``
    changes, ``change_rate = n_changes / max(n_obs - 1, 1)`` (changes per
    revisit opportunity), ``age_days`` is the time from the entity's last
    observation to the corpus-wide latest timestamp, and
    ``priority = change_rate * age_days`` — the expected number of missed
    changes, the Cho–Garcia-Molina refresh ordering.

    ``now_ts`` (datetime): explicit "now" for the age computation.  The
    default (max observed ts) is the offline-analysis convention (q78's
    oracle); the crawl scheduler passes the CURRENT round's timestamp so
    pages observed in the latest logged round still age (plans/round.py's
    re-enqueue trigger).
    """
    obs = events.select(
        F.col(id_col),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_ts_us"),
        F.col(value_col).alias("_v"),
        F.col(order_col).alias("_ord"),
    )
    lagged = obs.withColumn(
        "_changed",
        F.when(
            F.lag("_v").over(
                Window.partitionBy(id_col).orderBy("_ts_us", "_ord")
            ).isNotNull()
            & (
                F.col("_v")
                != F.lag("_v").over(
                    Window.partitionBy(id_col).orderBy("_ts_us", "_ord")
                )
            ),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    per_entity = lagged.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        F.sum("_changed").cast("long").alias("n_changes"),
        F.max("_ts_us").alias("_last_us"),
    )
    if now_ts is not None:
        now = events.sparkSession.range(1).select(
            F.unix_micros(F.lit(now_ts).cast("timestamp")).alias("_now_us")
        )
    else:
        now = events.agg(
            F.max(F.unix_micros(F.col(ts_col).cast("timestamp"))).alias("_now_us")
        )
    rate = F.col("n_changes") / F.greatest(F.col("n_obs") - 1, F.lit(1))
    age_days = (F.col("_now_us") - F.col("_last_us")) / F.lit(_US_PER_DAY)
    return (
        per_entity.crossJoin(F.broadcast(now))
        .select(
            F.col(id_col),
            "n_obs",
            "n_changes",
            F.round(rate, 6).alias("change_rate"),
            F.round(age_days, 6).alias("age_days"),
            F.round(rate * age_days, 6).alias("priority"),
        )
    )
