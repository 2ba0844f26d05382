"""Round-4 gated measurement pipeline, revision 2.

Differences vs r4_gated.py (whose 20 GB/s gate admitted a 27 GB/s window in
which the N16 job ran 365 s vs the 175 s the identical job runs when the bus
is truly quiet — the morning-of-round-4 capture, r4_quiet_capture.json):

* per-task gates: the scaling levels (n16/n4) demand >= 50 GB/s pre-probe
  (truly-quiet readings on this box are 65-97; the loud regime is 0.1-35),
  the sf0.1 bench/crawlprof tasks 35.
* priority order n16 -> n4 -> bench -> crawlprof: the scaling levels ARE the
  authoritative-criterion artifact; if only one quiet window arrives this
  round it must go to them.  n16 and n4 interleave (protocol: interleaved
  repeats, min per level) once each has one clean run, up to REPEATS.
* settle 30 s before the post-probe (Spark teardown depressed the post-probe
  to ~0.4 GB/s for the three morning bench attempts at settle 15), and the
  post gate is half the pre gate — the post-probe guards against the
  neighbor returning mid-run, not against our own teardown tail.
* wall-clock timestamps on every log line.

State accumulates in BENCH/r4_gated2.json; every attempt is preserved.

Usage: python BENCH/r4_gated2.py   (env: GATE_HOURS, SCALE_*)
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
from r4_gated import CRAWLPROF, run_snippet, run_bench  # noqa: E402

OUT = os.path.join(HERE, "r4_gated2.json")
DEADLINE = time.monotonic() + float(os.environ.get("GATE_HOURS", "2.6")) * 3600
SETTLE = float(os.environ.get("GATE_SETTLE", "30"))
PAGES = int(os.environ.get("SCALE_PAGES", "4000000"))
HOSTS = int(os.environ.get("SCALE_HOSTS", "8000"))
ROUNDS = int(os.environ.get("SCALE_ROUNDS", "2"))
SEEDS = int(os.environ.get("SCALE_SEEDS", "3000000"))
BUDGET = int(os.environ.get("SCALE_BUDGET", "1500"))
REPEATS = int(os.environ.get("GATE_REPEATS", "2"))

GATES = {"n16": 50.0, "n4": 50.0, "bench": 35.0, "crawlprof": 35.0}
WANT = {"n16": REPEATS, "n4": REPEATS, "bench": 1, "crawlprof": 1}


def log(obj) -> None:
    obj = dict(obj)
    obj["t"] = time.strftime("%H:%M:%S")
    print(json.dumps(obj), flush=True)


def main() -> None:
    state: dict = {
        "config": {"pages": PAGES, "hosts": HOSTS, "rounds": ROUNDS,
                   "seeds": SEEDS, "budget": BUDGET, "gates": GATES},
        "attempts": [],
        "clean_runs": {t: 0 for t in GATES},
    }
    for t in GATES:
        state[t] = None

    def save() -> None:
        json.dump(state, open(OUT, "w"), indent=1)

    os.environ["SCALE_SHARED_WEB"] = ensure_shared_web(
        PAGES, HOSTS, os.environ.get("SCALE_SHARED_WEB_BASE", "/tmp"))
    log({"msg": "shared web ready"})

    def next_task() -> str | None:
        # scaling levels first; interleave n16/n4 once each has one clean run
        c16, c4 = state["clean_runs"]["n16"], state["clean_runs"]["n4"]
        if c16 < WANT["n16"] or c4 < WANT["n4"]:
            if c16 == 0:
                return "n16"
            if c4 == 0:
                return "n4"
            return "n16" if c16 <= c4 and c16 < WANT["n16"] else "n4"
        for t in ("bench", "crawlprof"):
            if state["clean_runs"][t] < WANT[t]:
                return t
        return None

    while time.monotonic() < DEADLINE:
        task = next_task()
        if task is None:
            break
        pre = memprobe.run(16)
        if pre < GATES[task]:
            log({"task": task, "mem_pre": pre, "skip": True})
            time.sleep(35)
            continue
        log({"task": task, "mem_pre": pre, "firing": True})
        if task == "crawlprof":
            r = run_snippet(CRAWLPROF)
        elif task == "n16":
            r = run_level(16, PAGES, HOSTS, ROUNDS, SEEDS, BUDGET)
        elif task == "n4":
            r = run_level(4, PAGES, HOSTS, ROUNDS, SEEDS, BUDGET)
        else:
            r = run_bench()
        time.sleep(SETTLE)
        post = memprobe.run(16)
        r["mem_pre"], r["mem_post"] = pre, post
        wall = r.get("wall_sec") or r.get("value")
        clean = post >= GATES[task] / 2 and "error" not in r
        r["clean"] = clean
        state["attempts"].append({"task": task, "mem_pre": pre,
                                  "mem_post": post, "wall": wall,
                                  "clean": clean})
        if clean:
            state["clean_runs"][task] += 1
        prev = state[task]
        if prev is None or (clean and not prev.get("clean")) or (
            clean == bool(prev.get("clean"))
            and (wall or 1e18) < (prev.get("wall_sec") or prev.get("value") or 1e18)
        ):
            state[task] = r
        if state["n16"] and state["n4"] and state["n16"].get("clean") \
                and state["n4"].get("clean"):
            w4 = state["n4"]["wall_sec"]
            w16 = state["n16"]["wall_sec"]
            state["efficiency_4v16"] = round(w4 / (4 * w16), 3)
        save()
        log({"task": task, "clean": clean, "wall": wall, "post": post})
    save()
    log({"msg": "gated pipeline done", "clean_runs": state["clean_runs"]})


if __name__ == "__main__":
    main()
