"""Round-4 quiet-window capture (VERDICT r3 Next-round #1 and #4).

One background process that produces every host-gated measurement the round
needs, saving incrementally to BENCH/r4_quiet_capture.json:

1. ``n4``    — 4-core wall of the CURRENT engine at the 4M-page scaling
   shape.  Runs immediately and ungated: the 4-core level is insensitive to
   the neighbor's memory-bus bursts (walls 470-527 s across every recorded
   window), so a loud N4 is still a valid N4.
2. ``n16``   — the sniped measurement.  Gated on a STREAM probe >= GBPS
   (default 20 GB/s at 16 procs; quiet windows measure 65-97); probes are
   recorded on both sides of the run so the window quality is attached to
   the number, not asserted.
3. ``bench`` — ``python bench.py`` at sf0.1/local[32] in the same quiet
   window, to adjudicate the r2->r3 crawl_3rounds delta (26.7 -> 42.4 s)
   that round 3 could not attribute (bus was loud for its entire endgame).

Each task is retried until clean (probe >= GBPS on BOTH sides for the gated
ones) or the deadline passes; every attempt is preserved.

Usage: python BENCH/r4_capture.py   (env: CAP_GBPS, CAP_HOURS, SCALE_*)
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

OUT = os.path.join(HERE, "r4_quiet_capture.json")
GBPS = float(os.environ.get("CAP_GBPS", "20"))
DEADLINE = time.monotonic() + float(os.environ.get("CAP_HOURS", "5.0")) * 3600
PAGES = int(os.environ.get("SCALE_PAGES", "4000000"))
HOSTS = int(os.environ.get("SCALE_HOSTS", "8000"))
ROUNDS = int(os.environ.get("SCALE_ROUNDS", "2"))
SEEDS = int(os.environ.get("SCALE_SEEDS", "3000000"))
BUDGET = int(os.environ.get("SCALE_BUDGET", "1500"))

state: dict = {"config": {"pages": PAGES, "hosts": HOSTS, "rounds": ROUNDS,
                          "seeds": SEEDS, "budget": BUDGET, "gbps_gate": GBPS},
               "attempts": [], "n4": None, "n16": None, "bench": None}


def save() -> None:
    json.dump(state, open(OUT, "w"), indent=1)


def run_bench() -> dict:
    t0 = time.monotonic()
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=3600, cwd=REPO,
        env={**os.environ, "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.1",
             "SPARK_GRAFT_CPUS": "32"},
    )
    for line in reversed(out.stdout.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                r = json.loads(line)
                r["capture_wall"] = round(time.monotonic() - t0, 1)
                return r
            except json.JSONDecodeError:
                continue
    return {"error": out.stdout[-1000:] + out.stderr[-500:]}


def main() -> None:
    os.environ["SCALE_SHARED_WEB"] = ensure_shared_web(
        PAGES, HOSTS, os.environ.get("SCALE_SHARED_WEB_BASE", "/tmp"))
    print("shared web ready", flush=True)

    # -- task 1: fresh N4 of the current engine, ungated ---------------------
    pre = memprobe.run(16)
    r = run_level(4, PAGES, HOSTS, ROUNDS, SEEDS, BUDGET)
    r["mem_pre"], r["mem_post"] = pre, memprobe.run(16)
    state["n4"] = r
    state["attempts"].append({"task": "n4", **{k: r[k] for k in ("wall_sec", "mem_pre", "mem_post")}})
    save()
    print(json.dumps({"n4_wall": r["wall_sec"], "pre": pre, "post": r["mem_post"]}), flush=True)

    # -- tasks 2+3: quiet-gated n16, then bench ------------------------------
    todo = ["n16", "bench"]
    while todo and time.monotonic() < DEADLINE:
        task = todo[0]
        pre = memprobe.run(16)
        print(json.dumps({"task": task, "mem_pre": pre}), flush=True)
        if pre < GBPS:
            time.sleep(40)
            continue
        if task == "n16":
            r = run_level(16, PAGES, HOSTS, ROUNDS, SEEDS, BUDGET)
        else:
            r = run_bench()
        r["mem_pre"], r["mem_post"] = pre, memprobe.run(16)
        state["attempts"].append({"task": task, "mem_pre": pre,
                                  "mem_post": r["mem_post"],
                                  "wall": r.get("wall_sec") or r.get("value")})
        clean = r["mem_post"] >= GBPS
        # keep the best clean result; overwrite a dirty one with a clean one
        prev = state[task]
        if prev is None or (clean and not prev.get("clean")) or (
            clean == bool(prev.get("clean"))
            and (r.get("wall_sec") or r.get("value") or 1e9)
            < (prev.get("wall_sec") or prev.get("value") or 1e9)
        ):
            r["clean"] = clean
            state[task] = r
        save()
        print(json.dumps({"task": task, "clean": clean,
                          "wall": r.get("wall_sec") or r.get("value")}), flush=True)
        if clean:
            todo.pop(0)
    save()
    if state["n16"] and state["n4"]:
        tp4 = state["n4"]["fetched"] / state["n4"]["wall_sec"]
        tp16 = state["n16"]["fetched"] / state["n16"]["wall_sec"]
        eff = round(tp16 / (4 * tp4), 3)
        state["efficiency_4v16"] = eff
        save()
        print(json.dumps({"efficiency_4v16": eff}), flush=True)
    print("capture done", flush=True)


if __name__ == "__main__":
    main()
