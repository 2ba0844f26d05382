"""adavnceseo_crawler_spark — a from-scratch PySpark-native analytics + crawl-frontier engine.

Re-expresses the query and data-processing capabilities of the reference
``tanzil7890/AdavnceSEO_CRAWLER`` (an asyncio/Redis/Kafka web crawler) as an
iterative-batch Spark engine over snapshot-committed Parquet tables
(Iceberg-compatible semantics).  See /root/repo/SURVEY.md for the full
operator inventory and the adopted deterministic semantics.

Subpackages
-----------
functions   column-level functions: URL canonicalization, priority scoring,
            HTML parsing (vectorized pandas/Arrow UDFs), text statistics.
operators   DataFrame->DataFrame operators: dedup (exact/minhash/simhash),
            bloom URL-seen shards, politeness top-k, robots filtering,
            fetch-join, full-text search scoring, similarity search.
plans       the crawl round (BSP superstep) and the multi-round loop with
            checkpoint/resume.
jobs        spark-submit entry points.
"""

__version__ = "0.1.0"
