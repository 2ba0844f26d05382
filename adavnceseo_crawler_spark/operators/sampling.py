"""Stratified quota sampling — training-data mix rebalancing.

A corpus assembled from many sources is rebalanced by capping each stratum
(domain, source, language) at a fixed quota, keeping a DETERMINISTIC
pseudo-random subset: rows are ranked within their stratum by a stable
content hash (md5 of the id — identical in Spark and the DuckDB oracle) and
the first ``quota`` survive.  Deterministic sampling matters operationally:
re-running the pipeline over the same snapshot reproduces the training set
bit-for-bit, and incremental additions never reshuffle previously-selected
rows of untouched strata.

Scale shape (100 TB): the naive plan sorts EVERY row of a stratum under a
row_number window — a full shuffle + per-stratum sort where giant strata
(the head of the web's Zipf) dominate.  ``prefilter_factor`` enables the
two-stage plan: broadcast the per-stratum counts, drop rows whose hash
fraction exceeds ``factor * quota / n_stratum`` (a map-side filter that
needs no shuffle), then rank only the ~factor*quota survivors per stratum.
The top-``quota`` rows by hash order all survive the prefilter whenever at
least ``quota`` rows do; P[Binomial(n, factor*q/n) < q] ≤ exp(-q(factor-1)²/
(2·factor)) by Chernoff — at factor 4, under 1e-13 for q ≥ 50 — and the
guard below VERIFIES the per-stratum survivor count instead of trusting the
bound, falling back to the exact plan for any stratum that tripped it (the
check rides the same aggregation that ranking needs anyway).

No reference analog (the reference crawler stores everything it fetches);
task-mandated LLM-data-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_FRAC_DEN = float(0xFFFFFFFF)


def _hash_key(id_col: str):
    return F.md5(F.col(id_col).cast("string"))


def quota_sample(
    df: DataFrame,
    strata_col: str,
    quota: int,
    id_col: str,
    prefilter_factor: float | None = 4.0,
) -> DataFrame:
    """Keep the ``quota`` rows with smallest md5(id) per stratum, with the
    in-stratum rank as ``rk`` (1-based).  ``prefilter_factor=None`` is the
    exact single-stage plan (small data / oracle baseline); a float enables
    the two-stage prefilter described in the module docstring — identical
    output, verified per stratum."""
    key = _hash_key(id_col)
    w = Window.partitionBy(strata_col).orderBy(key, F.col(id_col))
    ranked = (
        df.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= quota)
        .select(strata_col, id_col, "rk")
    )
    if prefilter_factor is None:
        return ranked

    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("_n"))
    frac = F.conv(F.substring(key, 1, 8), 16, 10).cast("double") / _FRAC_DEN
    keep_p = F.least(
        F.lit(1.0), F.lit(float(prefilter_factor)) * quota / F.col("_n")
    )
    survivors = (
        df.join(F.broadcast(counts), strata_col)
        .filter(frac <= keep_p)
        .drop("_n")
    )
    # a stratum is PROVEN exact when its survivor count reaches what the
    # exact plan would return for it (quota, or the whole stratum).  The
    # verdict joins from the FULL stratum list, not from survivors — a
    # starved stratum can have zero survivors and must still fall back.
    surv_counts = survivors.groupBy(strata_col).agg(
        F.count(F.lit(1)).alias("_nsurv")
    )
    status = (
        counts.join(surv_counts, strata_col, "left")
        .withColumn("_nsurv", F.coalesce("_nsurv", F.lit(0)))
        .withColumn("_need", F.least(F.lit(quota), F.col("_n")))
    )
    ok = survivors.join(
        F.broadcast(
            status.filter(F.col("_nsurv") >= F.col("_need")).select(strata_col)
        ),
        strata_col,
    ).withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= quota)
    tripped = status.filter(F.col("_nsurv") < F.col("_need")).select(
        strata_col
    )
    # exact fallback, restricted to tripped strata (empty w.h.p. — the join
    # prunes to nothing and AQE skips the subtree)
    fallback = (
        df.join(F.broadcast(tripped), strata_col)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= quota)
    )
    return ok.select(strata_col, id_col, "rk").unionByName(
        fallback.select(strata_col, id_col, "rk")
    )


def importance_sample(
    df: DataFrame,
    p_col,
    id_col: str,
) -> DataFrame:
    """Quality-weighted deterministic corpus sampling (the CCNet/GPT-3 move:
    documents enter the training set with probability proportional to a
    quality score).  ``p_col`` is a Column in [0, 1]; a row is kept when its
    deterministic md5-uniform draw ``u = int(md5(id)[:8]) / 2^32`` falls
    below ``p``, and carries the Horvitz–Thompson correction ``weight =
    1/p`` so downstream token counts stay unbiased.  Deterministic draws
    (same convention as :func:`quota_sample`) make reruns and incremental
    snapshots reproduce the same training set bit-for-bit.

    Scale shape: pure map-side — no shuffle, no state; the filter sits
    directly on the scan and survives any partitioning.
    """
    key = _hash_key(id_col)
    u = F.conv(F.substring(key, 1, 8), 16, 10).cast("double") / _FRAC_DEN
    return (
        df.withColumn("_p", p_col)
        .withColumn("_u", u)
        .filter(F.col("_u") < F.col("_p"))
        .withColumn("weight", F.round(F.lit(1.0) / F.col("_p"), 6))
        .withColumn("p_keep", F.round("_p", 6))
        .withColumn("u_draw", F.round("_u", 6))
        .drop("_p", "_u")
    )
