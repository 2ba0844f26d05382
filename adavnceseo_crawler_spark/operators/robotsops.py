"""robots.txt filtering (F5/J2): broadcast join + vectorized longest-prefix match.

The reference fetches and caches robots per domain and asks a parser whether
the URL path is allowed (url_frontier.py:139-163), permissive when robots is
missing or the fetch fails (url_frontier.py:153-158).  Here the rules live in
a small ``robots(host, rules: array<struct<allow,path_prefix>>)`` table that
is broadcast-joined onto candidates; the longest-prefix rule decides, default
allow.  Everything is JVM-side higher-order-function expressions — no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def allowed_by_robots(path_col, rules_col) -> "F.Column":
    matching = F.filter(
        rules_col, lambda r: path_col.startswith(r["path_prefix"])
    )
    best = F.array_max(
        F.transform(
            matching,
            lambda r: F.struct(
                F.length(r["path_prefix"]).alias("l"), r["allow"].alias("allow")
            ),
        )
    )
    return F.when(
        rules_col.isNull() | (F.size(matching) == 0), F.lit(True)
    ).otherwise(best["allow"])


def apply_robots(candidates: DataFrame, robots: DataFrame) -> DataFrame:
    """Adds boolean ``robots_allowed``.  ``candidates`` needs host + path."""
    joined = candidates.join(
        F.broadcast(robots.select("host", "rules")), "host", "left"
    )
    return joined.withColumn(
        "robots_allowed", allowed_by_robots(F.col("path"), F.col("rules"))
    ).drop("rules")
