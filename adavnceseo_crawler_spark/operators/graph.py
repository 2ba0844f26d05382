"""Host-graph link analysis — distributed PageRank power iteration.

The reference's priority score carries a host-level authority proxy
(incremental domain quality, functions/scoring.py A9; reference
url_prioritizer.py domain-score weighting).  This module adds the real
thing: PageRank over the host→host link graph, the standard crawl-ordering
signal (Page et al. 1999; used host-level by every production crawler).

    r_{t+1}(v) = (1-d)/N + d * Σ_{(u,v) ∈ E} r_t(u) / outdeg(u)

(the classic Spark-example formulation; dangling mass is not redistributed
— documented, and irrelevant for *ranking* hosts by authority).

Scale shape: each iteration is one join (edges ⋈ ranks on src — both sides
partitioned by the join key, so successive iterations reuse the exchange)
and one groupBy(dst) sum — map-side-combinable.  ``N`` rides the plan as a
broadcast 1-row aggregate (the q53 pattern, no separate count job).  Ranks
are persisted per iteration and the previous iteration unpersisted, so the
lineage stays one-iteration deep (at 10^8 hosts a checkpoint every ~5
iterations bounds the DAG; 3-5 iterations already separate authority tiers
for crawl scheduling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def host_pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    persist: bool = True,
) -> DataFrame:
    """PageRank over distinct ``(src, dst)`` host edges; returns
    ``(host, rank)`` with rank rounded to 6 dp (hash-parity convention).
    Nodes are the union of both endpoint sets; initial rank 1/N."""
    e = edges.select(src, dst).distinct()
    nodes = (
        e.select(F.col(src).alias("host"))
        .union(e.select(F.col(dst).alias("host")))
        .distinct()
    )
    if persist:
        e = e.persist()
        nodes = nodes.persist()
    n1 = nodes.agg(F.count(F.lit(1)).alias("_n"))
    deg = e.groupBy(src).agg(F.count(F.lit(1)).alias("_deg"))
    d = float(damping)

    ranks = nodes.join(F.broadcast(n1)).select(
        "host", (F.lit(1.0) / F.col("_n")).alias("_r")
    )
    prev = None
    for _ in range(iters):
        contribs = (
            e.join(deg, src)
            .join(ranks, F.col(src) == F.col("host"))
            .select(
                F.col(dst).alias("host"),
                (F.col("_r") / F.col("_deg")).alias("_c"),
            )
            .groupBy("host")
            .agg(F.sum("_c").alias("_sum"))
        )
        ranks = (
            nodes.join(contribs, "host", "left")
            .join(F.broadcast(n1))
            .select(
                "host",
                (
                    (1.0 - d) / F.col("_n")
                    + d * F.coalesce(F.col("_sum"), F.lit(0.0))
                ).alias("_r"),
            )
        )
        if persist:
            ranks = ranks.persist()
            ranks.count()  # materialize before dropping the parent
            if prev is not None:
                prev.unpersist()
            prev = ranks
    return ranks.select("host", F.round("_r", 6).alias("rank"))
