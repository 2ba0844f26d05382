"""Full-text search surface (T1/T2): the ES multi_match approximation.

The reference delegates search to Elasticsearch: ``multi_match(query,
[title^3, description^2, text_content], type=best_fields)`` sorted by score
(elasticsearch_storage.py:89-111), with a ``domain:``-prefix special case in
the JS proxy (server.js:115-131).  Documented approximation (SURVEY.md §2.8):
per-field term-frequency of the query terms, field weights 3/2/1,
``best_fields`` = greatest across fields, score-desc ordering with url
tie-break.  Pure JVM expressions — regexp_count per term per field.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FIELD_WEIGHTS = (("title", 3.0), ("description", 2.0), ("text", 1.0))


def _tf(col: Column, term: str) -> Column:
    return F.regexp_count(F.lower(col), F.lit(re.escape(term.lower()))).cast("double")


def search_score(df_cols: dict[str, Column], query: str) -> Column:
    """best_fields: max over fields of (weight × Σ term tf)."""
    terms = [t for t in query.split() if t]
    per_field = []
    for field, w in FIELD_WEIGHTS:
        if field not in df_cols:
            continue
        tf_sum = None
        for t in terms:
            tf = _tf(df_cols[field], t)
            tf_sum = tf if tf_sum is None else tf_sum + tf
        per_field.append(F.lit(w) * F.coalesce(tf_sum, F.lit(0.0)))
    return F.greatest(*per_field) if len(per_field) > 1 else per_field[0]


def search_pages(parsed: DataFrame, query: str, size: int = 10) -> DataFrame:
    """T1: search the parsed table (title/description/text fields)."""
    score = search_score(
        {"title": F.col("title"), "description": F.col("description"),
         "text": F.col("text")},
        query,
    )
    return (
        parsed.withColumn("score", score)
        .filter(F.col("score") > 0)
        .orderBy(F.desc("score"), F.asc("url"))
        .limit(size)
        .select("url", "title", "description", "score")
    )


def search_with_domain_filter(
    parsed: DataFrame, query: str, size: int = 10
) -> DataFrame:
    """T2: ``domain:foo.com`` prefix filters by host instead (server.js:115-131)."""
    if query.startswith("domain:"):
        host = query.split(":", 1)[1].strip()
        return (
            parsed.withColumn(
                "host", F.lower(F.parse_url("url", F.lit("HOST")))
            )
            .filter(F.col("host") == host.lower())
            .orderBy(F.asc("url"))
            .limit(size)
            .select("url", "title", "description")
        )
    return search_pages(parsed, query, size).drop("score")
