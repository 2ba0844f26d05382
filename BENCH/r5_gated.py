"""Round-5 gated measurement pipeline.

Spends quiet host windows on this round's scarcest artifacts, in priority
order (VERDICT r4 Next-round #1/#3):

1. corpus16/corpus4 — the q72-shaped LLM curation pipeline over the 1M-doc
   synthetic corpus at local[16] vs local[4] with per-stage walls
   (BENCH/corpus_scaling.py) — the round-5 authoritative scaling artifact;
2. bench — `python bench.py` at sf0.1 in a quiet window (adjudicates the
   r4 q08/q19 loud-window regressions);
3. crawlprof — the 3-round sf0.1 crawl profile (target ≤ ~30 s quiet);
4. n16 — one more quiet crawl-scaling level to extend the r4 pair.

Gate discipline is r4_gated2's: per-task pre-probe thresholds (50 GB/s for
scaling levels, 35 for bench/crawlprof), 30 s settle before the post-probe,
post gate = pre/2, corpus16/corpus4 interleave once each has a clean run.
The 1M-doc corpus parquet is generated upfront (untimed) so quiet windows
are never spent on generation.

State accumulates in BENCH/r5_gated.json; every attempt is preserved.
Usage: python BENCH/r5_gated.py    (env: GATE_HOURS, GATE_TASKS,
       CORPUS_DOCS, SCALE_* for the n16 task)
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, HERE)
import memprobe  # noqa: E402
from corpus_scaling import ensure_corpus, run_level as run_corpus  # noqa: E402
from r4_gated import CRAWLPROF, run_snippet, run_bench  # noqa: E402
from scaling import ensure_shared_web, run_level as run_crawl  # noqa: E402

OUT = os.path.join(HERE, "r5_gated.json")
DEADLINE = time.monotonic() + float(os.environ.get("GATE_HOURS", "5.0")) * 3600
SETTLE = float(os.environ.get("GATE_SETTLE", "30"))
N_DOCS = int(os.environ.get("CORPUS_DOCS", "1000000"))
PAGES = int(os.environ.get("SCALE_PAGES", "4000000"))
HOSTS = int(os.environ.get("SCALE_HOSTS", "8000"))
ROUNDS = int(os.environ.get("SCALE_ROUNDS", "2"))
SEEDS = int(os.environ.get("SCALE_SEEDS", "3000000"))
BUDGET = int(os.environ.get("SCALE_BUDGET", "1500"))
REPEATS = int(os.environ.get("GATE_REPEATS", "2"))

GATES = {"corpus16": 50.0, "corpus4": 50.0, "bench": 35.0,
         "crawlprof": 35.0, "n16": 50.0}
WANT = {"corpus16": REPEATS, "corpus4": REPEATS, "bench": 1,
        "crawlprof": 1, "n16": 1}


def log(obj) -> None:
    obj = dict(obj)
    obj["t"] = time.strftime("%H:%M:%S")
    print(json.dumps(obj), flush=True)


def main() -> None:
    tasks = os.environ.get(
        "GATE_TASKS", "corpus16,corpus4,bench,crawlprof,n16").split(",")
    state: dict = {
        "config": {"docs": N_DOCS, "gates": GATES, "tasks": tasks},
        "attempts": [],
        "clean_runs": {t: 0 for t in GATES},
    }
    for t in GATES:
        state[t] = None

    def save() -> None:
        json.dump(state, open(OUT, "w"), indent=1)

    corpus = ensure_corpus(N_DOCS)
    log({"msg": "corpus ready", "path": corpus})
    if "n16" in tasks:
        os.environ["SCALE_SHARED_WEB"] = ensure_shared_web(
            PAGES, HOSTS, os.environ.get("SCALE_SHARED_WEB_BASE", "/tmp"))
        log({"msg": "shared web ready"})

    def next_task() -> str | None:
        c16 = state["clean_runs"]["corpus16"]
        c4 = state["clean_runs"]["corpus4"]
        if ("corpus16" in tasks and c16 < WANT["corpus16"]) or (
                "corpus4" in tasks and c4 < WANT["corpus4"]):
            if "corpus16" in tasks and c16 == 0:
                return "corpus16"
            if "corpus4" in tasks and c4 == 0:
                return "corpus4"
            if "corpus16" in tasks and c16 <= c4 and c16 < WANT["corpus16"]:
                return "corpus16"
            if "corpus4" in tasks and c4 < WANT["corpus4"]:
                return "corpus4"
        for t in ("bench", "crawlprof", "n16"):
            if t in tasks and state["clean_runs"][t] < WANT[t]:
                return t
        return None

    while time.monotonic() < DEADLINE:
        task = next_task()
        if task is None:
            break
        pre = memprobe.run(16)
        if pre < GATES[task]:
            log({"task": task, "mem_pre": pre})
            time.sleep(35)
            continue
        log({"task": task, "mem_pre": pre, "firing": True})
        try:
            if task == "corpus16":
                r = run_corpus(16, corpus)
            elif task == "corpus4":
                r = run_corpus(4, corpus)
            elif task == "crawlprof":
                r = run_snippet(CRAWLPROF)
            elif task == "n16":
                r = run_crawl(16, PAGES, HOSTS, ROUNDS, SEEDS, BUDGET)
            else:
                r = run_bench()
        except Exception as e:  # a failed run must not kill the pipeline
            r = {"error": str(e)[:500]}
        time.sleep(SETTLE)
        post = memprobe.run(16)
        r["mem_pre"], r["mem_post"] = pre, post
        wall = (r.get("walls") or {}).get("total") or r.get("wall_sec") \
            or r.get("value")
        clean = post >= GATES[task] / 2 and "error" not in r
        r["clean"] = clean
        state["attempts"].append({"task": task, "mem_pre": pre,
                                  "mem_post": post, "wall": wall,
                                  "clean": clean})
        if clean:
            state["clean_runs"][task] += 1
        prev = state[task]
        prev_wall = (prev or {}).get("walls", {}).get("total") if prev else None
        prev_wall = prev_wall or (prev or {}).get("wall_sec") \
            or (prev or {}).get("value") or 1e18
        if prev is None or (clean and not prev.get("clean")) or (
                clean == bool(prev.get("clean")) and (wall or 1e18) < prev_wall):
            state[task] = r
        c16, c4 = state["corpus16"], state["corpus4"]
        if c16 and c4 and c16.get("clean") and c4.get("clean"):
            w16, w4 = c16["walls"], c4["walls"]
            state["corpus_efficiency"] = {
                k: round(w4[k] / (4 * w16[k]), 3)
                for k in w16 if w16.get(k) and w4.get(k)
            }
            state["corpus_counts_match"] = c16["counts"] == c4["counts"]
        save()
        log({"task": task, "clean": clean, "wall": wall, "post": post})
    save()
    log({"msg": "gated pipeline done", "clean_runs": state["clean_runs"]})


if __name__ == "__main__":
    main()
