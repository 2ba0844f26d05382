"""Round-4 alternating scaling capture, revision 3.

r4_gated2's scheduler never reaches the n4 level while n16 lacks a
post-probe-clean run — and in the current bursty-neighbor regime (quiet
95-145 GB/s stretches of 1-4 min punctured by sub-minute loud bursts) a
fully post-clean 3-minute window is rare, so it hammered n16 forever.
This revision encodes what the noise model actually licenses:

* bus noise can only INFLATE a wall, so any gated run is an upper bound on
  the quiet wall — min-of-attempts per level converges to the quiet wall
  from above (the BASELINE.md protocol);
* n16 already has a 171.47 s upper bound (pre 91.26, r4_gated2.json), so
  the scarce quiet windows should go to n4 — the level the round-4 engine
  has NO usable measurement of (the morning 791 s run fired at pre 0.25);
* fixed alternating plan n4, n16, n4, n16, n4 — each task fires when a
  pre-probe clears its own gate (n4 40, n16 50 GB/s), with a per-task
  wait budget so one starved task cannot eat the session.

Every attempt appends to BENCH/r4_alt.json with pre/post probes.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
import memprobe  # noqa: E402
from scaling import ensure_shared_web, run_level  # noqa: E402

OUT = os.path.join(HERE, "r4_alt.json")
PAGES = int(os.environ.get("SCALE_PAGES", "4000000"))
HOSTS = int(os.environ.get("SCALE_HOSTS", "8000"))
ROUNDS = int(os.environ.get("SCALE_ROUNDS", "2"))
SEEDS = int(os.environ.get("SCALE_SEEDS", "3000000"))
BUDGET = int(os.environ.get("SCALE_BUDGET", "1500"))
SETTLE = float(os.environ.get("GATE_SETTLE", "30"))
GATES = {"n4": 40.0, "n16": 50.0}
PLAN = os.environ.get("ALT_PLAN", "n4,n16,n4,n16,n4").split(",")
WAIT_MIN = float(os.environ.get("ALT_WAIT_MIN", "18"))


def log(obj) -> None:
    obj = dict(obj)
    obj["t"] = time.strftime("%H:%M:%S")
    print(json.dumps(obj), flush=True)


def main() -> None:
    state = {"config": {"pages": PAGES, "hosts": HOSTS, "rounds": ROUNDS,
                        "seeds": SEEDS, "budget": BUDGET, "gates": GATES,
                        "plan": PLAN},
             "attempts": []}
    os.environ["SCALE_SHARED_WEB"] = ensure_shared_web(
        PAGES, HOSTS, os.environ.get("SCALE_SHARED_WEB_BASE", "/tmp"))
    log({"msg": "shared web ready"})

    for task in PLAN:
        cpus = int(task[1:])
        t_end = time.monotonic() + WAIT_MIN * 60
        fired = False
        while time.monotonic() < t_end:
            pre = memprobe.run(16)
            if pre < GATES[task]:
                log({"task": task, "mem_pre": pre, "skip": True})
                time.sleep(30)
                continue
            log({"task": task, "mem_pre": pre, "firing": True})
            r = run_level(cpus, PAGES, HOSTS, ROUNDS, SEEDS, BUDGET)
            time.sleep(SETTLE)
            post = memprobe.run(16)
            r["task"], r["mem_pre"], r["mem_post"] = task, pre, post
            state["attempts"].append(r)
            json.dump(state, open(OUT, "w"), indent=1)
            log({"task": task, "wall": r.get("wall_sec"), "pre": pre,
                 "post": post})
            fired = True
            break
        if not fired:
            log({"task": task, "starved": True})

    # summary: min wall per level across THIS file's attempts
    best = {}
    for a in state["attempts"]:
        t = a["task"]
        if t not in best or a["wall_sec"] < best[t]["wall_sec"]:
            best[t] = a
    state["best"] = {t: {"wall_sec": a["wall_sec"], "mem_pre": a["mem_pre"],
                         "mem_post": a["mem_post"]} for t, a in best.items()}
    if "n4" in best and "n16" in best:
        state["efficiency_4v16"] = round(
            best["n4"]["wall_sec"] / (4 * best["n16"]["wall_sec"]), 3)
    json.dump(state, open(OUT, "w"), indent=1)
    log({"msg": "done", "best": state.get("best"),
         "eff": state.get("efficiency_4v16")})


if __name__ == "__main__":
    main()
