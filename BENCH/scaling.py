"""Scaling-efficiency evidence (north_rule): same crawl job at two
parallelism levels — local[8] vs local[32] on identical input — reporting
throughput at both and efficiency tp_32 / (4 × tp_8).

Each level runs in a fresh subprocess (own JVM) so nothing is shared.
Writes BENCH/BASELINE.md and prints one JSON line.
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
spark = get_spark("scalebench", master=f"local[{cpus}]", shuffle_partitions=cpus)
cfg = CrawlConfig(politeness_budget=50, batch_size=20000, max_rounds=ROUNDS)
wh = tempfile.mkdtemp(prefix=f"scale{cpus}_")
cat = SnapshotCatalog(spark, wh)
loop.bootstrap(spark, cat, cfg,
    synth.gen_seeds(spark, N_PAGES, N_HOSTS, n_seeds=64),
    synth.gen_pages(spark, N_PAGES, N_HOSTS, partitions=max(64, 2*cpus)),
    synth.gen_robots(spark, N_HOSTS))
t0 = time.monotonic()
stats = loop.run_crawl(spark, cat, cfg)
wall = time.monotonic() - t0
fetched = sum(s["fetched"] for s in stats)
deduped = sum(s["links"] for s in stats)
print("RESULT " + json.dumps({"cpus": cpus, "wall_sec": round(wall,2),
      "fetched": fetched, "deduped": deduped,
      "urls_per_sec": round((fetched+deduped)/wall, 1)}))
shutil.rmtree(wh, ignore_errors=True)
"""


def run_level(cpus: int, pages: int, hosts: int, rounds: int) -> dict:
    code = RUNNER % {"repo": REPO, "pages": pages, "hosts": hosts, "rounds": rounds}
    out = subprocess.run(
        [sys.executable, "-c", code, str(cpus)],
        capture_output=True, text=True, timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT for cpus={cpus}:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    pages = int(os.environ.get("SCALE_PAGES", "60000"))
    hosts = int(os.environ.get("SCALE_HOSTS", "400"))
    rounds = int(os.environ.get("SCALE_ROUNDS", "3"))
    lo = run_level(8, pages, hosts, rounds)
    hi = run_level(32, pages, hosts, rounds)
    eff = hi["urls_per_sec"] / (4.0 * lo["urls_per_sec"])
    result = {"N8": lo, "N32": hi, "scaling_efficiency": round(eff, 3)}
    print(json.dumps(result))
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(
            "# Scaling evidence (north_rule: efficiency >= 0.8 between N and 4N)\n\n"
            f"Same crawl job ({rounds} rounds, {pages} synthetic pages, {hosts} Zipf hosts),\n"
            "identical input, fresh JVM per level (local[8] vs local[32] on a 32-core box).\n\n"
            "| parallelism | wall_sec | urls fetched | links deduped | urls/sec |\n"
            "|---|---|---|---|---|\n"
            f"| local[8]  (N)  | {lo['wall_sec']} | {lo['fetched']} | {lo['deduped']} | {lo['urls_per_sec']} |\n"
            f"| local[32] (4N) | {hi['wall_sec']} | {hi['fetched']} | {hi['deduped']} | {hi['urls_per_sec']} |\n\n"
            f"**Scaling efficiency tp_4N / (4 x tp_N) = {eff:.3f}**\n\n"
            "Caveats: single-JVM local mode shares one driver and page-generation\n"
            "python workers; on a real multi-executor cluster the same job runs via\n"
            "`spark-submit --py-files` (jobs/crawl.py) with executor counts N / 4N.\n"
        )


if __name__ == "__main__":
    main()
