"""URL-template mining — crawler-trap detection over the frontier/seen set.

Production crawlers bound per-template URL counts because generated URL
spaces (calendars, faceted search, session ids) otherwise absorb the whole
politeness budget of a host (reference analog: the hygiene filter F6 rejects
binary extensions, html_parser.py:140-155, but the reference has no
template-level guard — this is the scale extension a 10^10-URL frontier
needs).  A template is the URL path with every digit run collapsed to ``N``
and every long hex run to ``H``; a (host, template) cell holding more than
``threshold`` distinct URLs is flagged as a trap.

Scale shape: pure JVM regexp work + ONE aggregation keyed by
(host, template) — the same key the politeness stage already shuffles on
(host-prefixed), so at scale the mine can ride the frontier's existing
partitioning; count_distinct(url) is map-side partially aggregated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.urls import host_col, path_col

_HEX_RUN = "[0-9a-f]{8,}"  # session ids / hashes
_DIGIT_RUN = "[0-9]+"


def url_template(url_col) -> "F.Column":
    """Template of a URL's path: hex runs (>=8 chars) -> 'H', then digit
    runs -> 'N'.  Hex first, or its digits would be split by the digit
    pass."""
    p = path_col(url_col)
    return F.regexp_replace(
        F.regexp_replace(p, _HEX_RUN, "H"), _DIGIT_RUN, "N"
    )


def mine_url_templates(
    df: DataFrame, threshold: int = 50, url: str = "url"
) -> DataFrame:
    """(host, template, n_urls, trap) per URL-template cell."""
    u = F.col(url)
    return (
        df.select(
            host_col(u).alias("host"),
            url_template(u).alias("template"),
            u.alias("_u"),
        )
        .groupBy("host", "template")
        .agg(F.count_distinct("_u").cast("long").alias("n_urls"))
        .withColumn("trap", F.col("n_urls") >= threshold)
    )
