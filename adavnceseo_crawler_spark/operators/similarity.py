"""Similarity search over embedding columns (array<float>).

* ``cosine_topk``   — brute-force baseline: JVM-side ``zip_with``/``aggregate``
  dot products (whole-stage codegen, no Python), TakeOrderedAndProject top-k.
* ``cosine_pairs``  — thresholded near-dup pair scan (small n / oracle path).
* ``lsh_topk``      — the scale path: random-hyperplane LSH (sign bits from
  deterministic hyperplanes) buckets vectors so only same-bucket candidates
  are scored; recall traded via n_planes.

All float math is promoted to double element-wise in a fixed left-to-right
fold so results are bit-stable and match the DuckDB oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_col(a, b):
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def cosine_topk(
    df: DataFrame, query: DataFrame, k: int = 10, id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k by cosine to a single query vector (query: 1-row df, column q)."""
    joined = df.crossJoin(F.broadcast(query))
    scored = joined.select(
        id_col, F.round(cosine_col(F.col(vec_col), F.col("q")), 6).alias("cos")
    )
    return scored.orderBy(F.desc("cos"), F.asc(id_col)).limit(k)


def cosine_pairs(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    threshold: float = 0.8,
) -> DataFrame:
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    cos = cosine_col(F.col("va"), F.col("vb"))
    return (
        pairs.withColumn("_c", cos)
        .filter(F.col("_c") >= threshold)
        .select("id_a", "id_b", F.round("_c", 6).alias("cos"))
    )


# ---------------------------------------------------------------------------
# LSH-bucketed ANN (scale path)
# ---------------------------------------------------------------------------
def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float64)


def make_lsh_bucket_udf(dim: int, n_planes: int = 12, seed: int = 42):
    planes = _hyperplanes(dim, n_planes, seed)

    @F.pandas_udf(T.LongType())
    def lsh_bucket(vs: pd.Series) -> pd.Series:
        out = np.zeros(len(vs), dtype=np.int64)
        for i, v in enumerate(vs):
            arr = np.asarray(v, dtype=np.float64)
            signs = (planes @ arr) > 0
            out[i] = int(sum(1 << j for j, s in enumerate(signs) if s))
        return pd.Series(out)

    return lsh_bucket


def lsh_topk(
    df: DataFrame,
    query: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN: score only vectors in the query's hyperplane-sign bucket.

    At 100 TB the bucket column is precomputed/persisted and the scan is
    partition-pruned on it; here it is computed inline."""
    udf = make_lsh_bucket_udf(dim, n_planes)
    bucketed = df.withColumn("_bucket", udf(F.col(vec_col)))
    qb = query.withColumn("_bucket", udf(F.col("q")))
    cand = bucketed.join(F.broadcast(qb), "_bucket")
    scored = cand.select(
        id_col, F.round(cosine_col(F.col(vec_col), F.col("q")), 6).alias("cos")
    )
    return scored.orderBy(F.desc("cos"), F.asc(id_col)).limit(k)
