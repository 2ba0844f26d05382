"""Benchmark harness (driver contract).

Runs the headline operator queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] plus a multi-round crawl
throughput bench on the deterministic synthetic web, and prints ONE JSON line:

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "crawl": {...}}

Each query is forced end-to-end with a noop-format write (computes every
column, no driver collect).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# headline subset: one per operator family (full surface lives in queries.py)
HEADLINE = [
    "q01_pricing_summary",
    "q03_revenue_by_nation",
    "q04_topk_orders_per_customer",
    "q05_events_daily",
    "q08_url_hash_host_depth",
    "q09_base_score",
    "q11_politeness_budget",
    "q12_priority_topk",
    "q14_word_freq",
    "q15_keyword_topk",
    "q16_content_classify",
    "q18_search_score",
    "q19_lang_id",
    "q21_token_count",
    "q22_dedup_exact",
    "q24_cosine_topk",
    "q26_minhash_lsh_neardup",
    "q27_simhash_candidates",
    "q29_lsh_ann_topk",
    "q42_ml_blended_rank",
    "q46_bm25_search",
    "q47_batch_ann_join",
    "q48_centroid_classifier",
]

CRAWL_PAGES = int(os.environ.get("BENCH_CRAWL_PAGES", "60000"))
CRAWL_HOSTS = int(os.environ.get("BENCH_CRAWL_HOSTS", "400"))
CRAWL_ROUNDS = int(os.environ.get("BENCH_CRAWL_ROUNDS", "3"))
# seed wide: the metric is per-round throughput on a warm frontier
# (BASELINE.json: "per round on a 10^10-URL synthetic frontier"), not BFS
# warm-up from a handful of seeds
CRAWL_SEEDS = int(os.environ.get("BENCH_CRAWL_SEEDS", "40000"))


def crawl_bench(spark, cpus: int) -> dict:
    from adavnceseo_crawler_spark import synth
    from adavnceseo_crawler_spark.catalog import SnapshotCatalog
    from adavnceseo_crawler_spark.config import CrawlConfig
    from adavnceseo_crawler_spark.plans import loop

    wh = tempfile.mkdtemp(prefix="benchwh_")
    try:
        cfg = CrawlConfig(
            politeness_budget=50,
            batch_size=20000,
            max_rounds=CRAWL_ROUNDS,
            use_bloom=os.environ.get("BENCH_USE_BLOOM", "0") == "1",
        )
        cat = SnapshotCatalog(spark, wh)
        parts = max(2 * cpus, CRAWL_PAGES // 20000)
        t0 = time.monotonic()
        web = synth.gen_pages(spark, CRAWL_PAGES, CRAWL_HOSTS, partitions=parts)
        loop.bootstrap(
            spark, cat, cfg,
            synth.gen_seeds(spark, CRAWL_PAGES, CRAWL_HOSTS, n_seeds=CRAWL_SEEDS),
            web,
            synth.gen_robots(spark, CRAWL_HOSTS),
        )
        t_boot = time.monotonic() - t0
        t1 = time.monotonic()
        stats = loop.run_crawl(spark, cat, cfg)
        wall = time.monotonic() - t1
        fetched = sum(s["fetched"] for s in stats)
        deduped = sum(s["links"] for s in stats)
        return {
            "pages": CRAWL_PAGES,
            "rounds": len(stats),
            "fetched": fetched,
            "links_deduped": deduped,
            "bootstrap_sec": round(t_boot, 2),
            "wall_sec": round(wall, 2),
            "urls_per_sec": round((fetched + deduped) / wall, 1),
        }
    finally:
        shutil.rmtree(wh, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from adavnceseo_crawler_spark.queries import QUERIES
    from adavnceseo_crawler_spark.session import get_spark

    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=cpus)

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.monotonic()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        timings[name] = round(time.monotonic() - t0, 3)

    crawl = crawl_bench(spark, cpus)
    timings["crawl_3rounds"] = crawl["wall_sec"]

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "urls_fetched+deduped_per_sec_round",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
                "crawl": crawl,
            }
        )
    )


if __name__ == "__main__":
    main()
