"""Opportunistic single-level re-measurement for the loud-host problem.

The 4-core level is nearly insensitive to the neighbor's memory-bus bursts
(walls 470-527 s across every window today) while the 16-core level swings
199 -> 342 s with them, so the efficiency estimate is gated entirely on
catching ONE quiet 16-core window.  This fires run_level(hi) only when a
STREAM probe clears --gbps, records probes on both sides of each run, and
keeps every attempt in BENCH/n16_sniper.json — min-of-repeats across the
session, same estimator as scaling.py's interleaved repeats, every sample
preserved."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import memprobe
from scaling import ensure_shared_web, run_level


def main() -> None:
    hi = int(os.environ.get("SNIPE_LEVEL", "16"))
    gbps = float(os.environ.get("SNIPE_GBPS", "20"))
    attempts = int(os.environ.get("SNIPE_ATTEMPTS", "10"))
    pages = int(os.environ.get("SCALE_PAGES", "4000000"))
    hosts = int(os.environ.get("SCALE_HOSTS", "8000"))
    rounds = int(os.environ.get("SCALE_ROUNDS", "2"))
    seeds = int(os.environ.get("SCALE_SEEDS", "3000000"))
    budget = int(os.environ.get("SCALE_BUDGET", "1500"))
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "n16_sniper.json")

    if os.environ.get("SCALE_SHARED_WEB_BASE"):
        os.environ["SCALE_SHARED_WEB"] = ensure_shared_web(
            pages, hosts, os.environ["SCALE_SHARED_WEB_BASE"]
        )

    results = []
    for i in range(attempts):
        pre = memprobe.run(hi)
        print(json.dumps({"attempt": i, "mem_pre": pre}), flush=True)
        if pre < gbps:
            time.sleep(40)
            continue
        r = run_level(hi, pages, hosts, rounds, seeds, budget)
        r["mem_pre"] = pre
        r["mem_post"] = memprobe.run(hi)
        results.append(r)
        json.dump(results, open(out, "w"), indent=1)
        print(json.dumps({"wall": r["wall_sec"], "pre": pre,
                          "post": r["mem_post"]}), flush=True)
        if pre >= gbps and r["mem_post"] >= gbps:
            break  # clean on both sides — done
    json.dump(results, open(out, "w"), indent=1)


if __name__ == "__main__":
    main()
