"""Plan audit: structural statistics of every registered query's physical
plan at a given sf.  Catches scale anti-patterns mechanically:

* cartesian products (flagged unless the query documents a labeled
  small-n oracle baseline),
* row-at-a-time Python UDFs (BatchEvalPython) in any plan,
* scans with no column pruning when the output needs few columns,
* exchange counts (shuffle pressure) and broadcast usage.

Writes BENCH/plan_audit.json: {query: {exchanges, broadcasts, sortmerge,
cartesian, python_udf_rowwise, arrow_udf, scans, inmemory, wscg_spans,
pushed_filters}}.

Reading note: for queries with persisted barriers (q72) or lazily-persisted
iteration frames (q65), the textual plan embeds the CACHE-BUILD subplan
under every InMemoryRelation reference, so ``scans`` over-counts what runs —
``inmemory`` is the number of references that read cached blocks instead.

Usage: python BENCH/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

# documented small-n oracle baselines where a bounded crossJoin IS the spec
CARTESIAN_OK = {
    "q23_ngram_jaccard_pairs",
    "q24_cosine_topk",
    "q25_neardup_cosine_pairs",
    "q27_simhash_candidates",
    "q29_lsh_ann_topk",  # broadcast single-query row
    "q49_ivf_ann_topk",
    "q53_ols_embedding_rank",  # broadcast 1-row aggregates ride the plan
    "q64_lm_perplexity",  # V as broadcast 1-row aggregate
    "q65_host_pagerank",  # N as broadcast 1-row aggregate
}


def audit(sf_dir: str) -> dict:
    from adavnceseo_crawler_spark.queries import QUERIES
    from adavnceseo_crawler_spark.session import get_spark

    spark = get_spark("plan_audit", master="local[8]", shuffle_partitions=8)
    out = {}
    for name, fn in QUERIES.items():
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            out[name] = {"error": str(e)[:200]}
            continue
        out[name] = {
            "exchanges": plan.count("Exchange"),
            "reused_exchanges": plan.count("ReusedExchange"),
            "broadcasts": plan.count("BroadcastHashJoin")
            + plan.count("BroadcastNestedLoopJoin"),
            "sortmerge": plan.count("SortMergeJoin"),
            "cartesian": plan.count("CartesianProduct"),
            "cartesian_documented": name in CARTESIAN_OK,
            "python_udf_rowwise": plan.count("BatchEvalPython"),
            "arrow_udf": plan.count("ArrowEvalPython")
            + plan.count("FlatMapGroupsInPandas")
            + plan.count("MapInPandas"),
            "scans": plan.count("FileScan"),
            "inmemory": plan.count("InMemoryTableScan"),
            "wscg_spans": plan.count("WholeStageCodegen"),
            "pushed_filters": plan.count("PushedFilters: ["),
        }
    spark.stop()
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    res = audit(sf_dir)
    flags = []
    for name, st in res.items():
        if "error" in st:
            flags.append((name, "ERROR " + st["error"]))
            continue
        if st["cartesian"] and not st["cartesian_documented"]:
            flags.append((name, "undocumented cartesian product"))
        if st["python_udf_rowwise"]:
            flags.append((name, "row-at-a-time Python UDF"))
    payload = {"sf_dir": sf_dir, "plans": res, "flags": flags}
    with open(os.path.join(HERE, "plan_audit.json"), "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps({"queries": len(res), "flags": flags}))


if __name__ == "__main__":
    main()
