"""Round-4 gated measurement pipeline: every timing-sensitive artifact the
round needs, executed one task at a time, each task fired only when a STREAM
probe clears the quiet gate and marked clean only when the post-probe (after
a settle sleep — Spark teardown itself depresses the probe for ~10 s) also
clears it.  Results accumulate in BENCH/r4_gated.json; every attempt is
preserved with its probes.

Tasks:
  crawlprof — 3-round crawl at the bench.py sf0.1 shape (60k pages), stage
              times per round.  Adjudicates the r2->r3 crawl_3rounds delta
              on the round-4 engine (bootstrap fast path included).
  schedbench — schedule_batch_counted vs naive schedule+anti-join wall at
              the same shape (VERDICT r3 #8), row-set equality asserted.
  n16 / n4  — the scaling levels at the 4M-page shape (VERDICT r3 #1).
  bench     — full driver bench.py at sf0.1/local[32].

Usage: python BENCH/r4_gated.py  (env: GATE_GBPS, GATE_HOURS, SCALE_*)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, HERE)
import memprobe  # noqa: E402
from scaling import ensure_shared_web, run_level  # noqa: E402

OUT = os.path.join(HERE, "r4_gated.json")
GBPS = float(os.environ.get("GATE_GBPS", "20"))
DEADLINE = time.monotonic() + float(os.environ.get("GATE_HOURS", "4.5")) * 3600
SETTLE = float(os.environ.get("GATE_SETTLE", "15"))
PAGES = int(os.environ.get("SCALE_PAGES", "4000000"))
HOSTS = int(os.environ.get("SCALE_HOSTS", "8000"))
ROUNDS = int(os.environ.get("SCALE_ROUNDS", "2"))
SEEDS = int(os.environ.get("SCALE_SEEDS", "3000000"))
BUDGET = int(os.environ.get("SCALE_BUDGET", "1500"))

CRAWLPROF = r"""
import json, sys, time, tempfile, shutil
sys.path.insert(0, %(repo)r)
from adavnceseo_crawler_spark.session import get_spark
from adavnceseo_crawler_spark import synth
from adavnceseo_crawler_spark.catalog import SnapshotCatalog
from adavnceseo_crawler_spark.config import CrawlConfig
from adavnceseo_crawler_spark.plans import loop
spark = get_spark("crawlprof", master="local[32]", shuffle_partitions=32)
wh = tempfile.mkdtemp(prefix="profwh_")
cfg = CrawlConfig(politeness_budget=50, batch_size=20000, max_rounds=3)
cat = SnapshotCatalog(spark, wh)
web = synth.gen_pages(spark, 60000, 400, partitions=64)
loop.bootstrap(spark, cat, cfg,
    synth.gen_seeds(spark, 60000, 400, n_seeds=40000), web,
    synth.gen_robots(spark, 400))
t0 = time.monotonic()
stats = loop.run_crawl(spark, cat, cfg)
wall = round(time.monotonic() - t0, 2)
print("RESULT " + json.dumps({
    "wall_sec": wall,
    "fetched": sum(s["fetched"] for s in stats),
    "links": sum(s["links"] for s in stats),
    "times": [s["times"] for s in stats]}))
shutil.rmtree(wh, ignore_errors=True)
"""

SCHEDBENCH = r"""
import json, sys, time
sys.path.insert(0, %(repo)r)
from pyspark.sql import functions as F
from adavnceseo_crawler_spark.session import get_spark
from adavnceseo_crawler_spark import synth
from adavnceseo_crawler_spark.operators.politeness import (
    schedule_batch, schedule_batch_counted)
spark = get_spark("schedbench", master="local[32]", shuffle_partitions=32)
# frontier-shaped input: Zipf hosts via the synthetic page generator
web = synth.gen_pages(spark, 200000, 400, partitions=64)
front = web.select(
    "url",
    F.regexp_extract("url", r"https?://([^/]+)", 1).alias("host"),
    (F.xxhash64("url") % 1000 / 1000.0).alias("score"),
    F.monotonically_increasing_id().alias("seq"),
).cache()
n = front.count()
BUDGET, BATCH = 50, 20000
t0 = time.monotonic()
naive = schedule_batch(front, BUDGET, BATCH, 8)
n_naive = naive.count()
# the naive caller ALSO needs the politeness complement (frontier rewrite)
leftover = front.join(naive.select("url"), "url", "left_anti")
n_left = leftover.count()
wall_naive = round(time.monotonic() - t0, 2)
t1 = time.monotonic()
sched, n_counted, _, caches = schedule_batch_counted(
    front, BUDGET, BATCH, 8, want_rejected=False)
wall_counted = round(time.monotonic() - t1, 2)
rows_naive = set(r["url"] for r in naive.collect())
rows_counted = set(r["url"] for r in sched.collect())
print("RESULT " + json.dumps({
    "rows": n, "n_naive": n_naive, "n_counted": n_counted,
    "rowsets_equal": rows_naive == rows_counted,
    "wall_naive_with_complement": wall_naive,
    "wall_counted": wall_counted}))
"""


def run_snippet(code: str) -> dict:
    out = subprocess.run(
        # plain placeholder replace: the snippets contain literal '%' (modulo
        # exprs), so printf-style interpolation would throw
        [sys.executable, "-c", code.replace("%(repo)r", repr(REPO))],
        capture_output=True, text=True, timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    return {"error": out.stdout[-800:] + out.stderr[-800:]}


def run_bench() -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=3600, cwd=REPO,
        env={**os.environ, "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.1",
             "SPARK_GRAFT_CPUS": "32"},
    )
    for line in out.stdout.splitlines():
        s = line.strip()
        i = s.find('{"metric"')
        if i >= 0:
            try:
                return json.loads(s[i:])
            except json.JSONDecodeError:
                continue
    return {"error": out.stdout[-800:] + out.stderr[-800:]}


def main() -> None:
    state: dict = {"config": {"pages": PAGES, "hosts": HOSTS, "rounds": ROUNDS,
                              "seeds": SEEDS, "budget": BUDGET,
                              "gbps_gate": GBPS},
                   "attempts": []}
    for t in ("crawlprof", "schedbench", "n16", "n4", "bench"):
        state[t] = None

    def save() -> None:
        json.dump(state, open(OUT, "w"), indent=1)

    os.environ["SCALE_SHARED_WEB"] = ensure_shared_web(
        PAGES, HOSTS, os.environ.get("SCALE_SHARED_WEB_BASE", "/tmp"))
    print("shared web ready", flush=True)

    todo = [
        t.strip()
        for t in os.environ.get(
            "GATE_TASKS", "crawlprof,schedbench,n16,n4,bench"
        ).split(",")
        if t.strip()
    ]
    while todo and time.monotonic() < DEADLINE:
        task = todo[0]
        pre = memprobe.run(16)
        print(json.dumps({"task": task, "mem_pre": pre}), flush=True)
        if pre < GBPS:
            time.sleep(40)
            continue
        if task == "crawlprof":
            r = run_snippet(CRAWLPROF)
        elif task == "schedbench":
            r = run_snippet(SCHEDBENCH)
        elif task == "n16":
            r = run_level(16, PAGES, HOSTS, ROUNDS, SEEDS, BUDGET)
        elif task == "n4":
            r = run_level(4, PAGES, HOSTS, ROUNDS, SEEDS, BUDGET)
        else:
            r = run_bench()
        time.sleep(SETTLE)  # Spark teardown depresses the probe briefly
        post = memprobe.run(16)
        r["mem_pre"], r["mem_post"] = pre, post
        wall = r.get("wall_sec") or r.get("value")
        state["attempts"].append({"task": task, "mem_pre": pre,
                                  "mem_post": post, "wall": wall})
        clean = post >= GBPS and "error" not in r
        r["clean"] = clean
        prev = state[task]
        if prev is None or (clean and not prev.get("clean")) or (
            clean == bool(prev.get("clean"))
            and (wall or 1e18) < (prev.get("wall_sec") or prev.get("value") or 1e18)
        ):
            state[task] = r
        save()
        print(json.dumps({"task": task, "clean": clean, "wall": wall}),
              flush=True)
        if clean:
            todo.pop(0)
    if state["n16"] and state["n4"]:
        tp4 = state["n4"]["fetched"] / state["n4"]["wall_sec"]
        tp16 = state["n16"]["fetched"] / state["n16"]["wall_sec"]
        state["efficiency_4v16"] = round(tp16 / (4 * tp4), 3)
        # steady-state round pairing (north_rule is per-round throughput on a
        # warm frontier): last round's wall ratio, excluding the round-0
        # cold-scan/warmup that amortizes at the 10^7-URL-round regime
        r4s, r16s = state["n4"].get("rounds"), state["n16"].get("rounds")
        if r4s and r16s and len(r4s) == len(r16s) and len(r4s) > 1:
            state["efficiency_4v16_steady"] = round(
                (r4s[-1]["wall_ms"] / r16s[-1]["wall_ms"]) / 4, 3
            )
    save()
    print("gated pipeline done", flush=True)


if __name__ == "__main__":
    main()
