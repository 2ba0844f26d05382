"""Scaling-efficiency evidence (north_rule): same crawl job at two
parallelism levels — local[8] (N) vs local[32] (4N) on identical input —
reporting throughput at both and efficiency tp_4N / (4 × tp_N).

Protocol notes:
* each measurement runs in a fresh subprocess (own JVM), bootstrap excluded;
* levels are run in interleaved repeats and the MIN wall per level is taken —
  this sandbox VM shows time-varying CPU steal (raw-CPU probes range
  0.6-0.8 efficiency 8→32 across minutes), and min-of-repeats estimates the
  uncontended cost;
* the config is sized so rounds are compute/shuffle-bound (parse + link
  canonicalization + dedup of ~3·10^5 URLs/round), the regime the metric
  names (a warm 10^10-URL frontier on 1000 executors) — NOT Spark's per-job
  fixed launch latency, which is constant in core count and dominates at toy
  scale.  BENCH/BASELINE.md records the raw numbers either way.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import json, os, sys, tempfile, time, shutil
sys.path.insert(0, %(repo)r)
cpus = int(sys.argv[1])
from adavnceseo_crawler_spark.session import get_spark
from adavnceseo_crawler_spark.catalog import SnapshotCatalog
from adavnceseo_crawler_spark.config import CrawlConfig
from adavnceseo_crawler_spark.plans import loop
from adavnceseo_crawler_spark import synth

N_PAGES, N_HOSTS, ROUNDS = %(pages)d, %(hosts)d, %(rounds)d
spark = get_spark("scalebench", master=f"local[{cpus}]", shuffle_partitions=2*cpus,
  extra_conf={
    # straggler mitigation: on this shared VM a stolen vCPU stalls whole
    # stage barriers at full width; speculation re-launches slow tasks
    "spark.speculation": "true",
    "spark.speculation.multiplier": "1.5",
    "spark.speculation.quantile": "0.75",
  })
cfg = CrawlConfig(politeness_budget=%(budget)d, batch_size=N_PAGES,
                  max_rounds=ROUNDS, store_parsed=False)
wh = tempfile.mkdtemp(prefix=f"scale{cpus}_")
cat = SnapshotCatalog(spark, wh)
loop.bootstrap(spark, cat, cfg,
    synth.gen_seeds(spark, N_PAGES, N_HOSTS, n_seeds=%(seeds)d),
    synth.gen_pages(spark, N_PAGES, N_HOSTS, partitions=max(128, 4*cpus)),
    synth.gen_robots(spark, N_HOSTS))
t0 = time.monotonic()
stats = loop.run_crawl(spark, cat, cfg)
wall = time.monotonic() - t0
fetched = sum(s["fetched"] for s in stats)
deduped = sum(s["links"] for s in stats)
print("RESULT " + json.dumps({"cpus": cpus, "wall_sec": round(wall,2),
      "fetched": fetched, "deduped": deduped,
      "round_times": [s["times"] for s in stats],
      "urls_per_sec": round((fetched+deduped)/wall, 1)}))
shutil.rmtree(wh, ignore_errors=True)
"""


def run_level(cpus: int, pages: int, hosts: int, rounds: int, seeds: int, budget: int) -> dict:
    code = RUNNER % {
        "repo": REPO, "pages": pages, "hosts": hosts, "rounds": rounds,
        "seeds": seeds, "budget": budget,
    }
    out = subprocess.run(
        [sys.executable, "-c", code, str(cpus)],
        capture_output=True, text=True, timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"no RESULT for cpus={cpus}:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def main() -> None:
    pages = int(os.environ.get("SCALE_PAGES", "800000"))
    hosts = int(os.environ.get("SCALE_HOSTS", "3000"))
    rounds = int(os.environ.get("SCALE_ROUNDS", "2"))
    seeds = int(os.environ.get("SCALE_SEEDS", "600000"))
    budget = int(os.environ.get("SCALE_BUDGET", "300"))
    repeats = int(os.environ.get("SCALE_REPEATS", "2"))

    runs: dict[int, list[dict]] = {8: [], 32: []}
    for _ in range(repeats):
        for cpus in (8, 32):
            runs[cpus].append(run_level(cpus, pages, hosts, rounds, seeds, budget))
            print(json.dumps(runs[cpus][-1]), flush=True)

    lo = min(runs[8], key=lambda r: r["wall_sec"])
    hi = min(runs[32], key=lambda r: r["wall_sec"])
    eff = hi["urls_per_sec"] / (4.0 * lo["urls_per_sec"])
    result = {
        "N8": lo, "N32": hi, "scaling_efficiency": round(eff, 3),
        "all_walls": {c: [r["wall_sec"] for r in rs] for c, rs in runs.items()},
    }
    print(json.dumps(result))
    # raw result lands in a JSON next to the hand-authored analysis
    # (BENCH/BASELINE.md) rather than overwriting it
    with open(os.path.join(REPO, "BENCH", "scaling_result.json"), "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
