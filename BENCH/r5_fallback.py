"""Round-5 LOUD-window fallback for the corpus-pipeline scaling pair.

The r5_gated.py pipeline spends quiet host windows (probe >= 50 GB/s) on
the corpus16/corpus4 pair; on days when the host never goes quiet (the
whole of round 5 so far: probes 0.1-0.5 GB/s for hours), this fallback
produces the next-best evidence: ALTERNATING levels back-to-back
(16, 4, 16, 4) so both sides of each adjacent pair see the same ambient
load, with a memprobe before every run.  Per-stage walls and counts come
from BENCH/corpus_scaling.run_level unchanged; the cross-level count
equality check still applies.  Results are labeled loud — BASELINE.md
reports them with their probes so a later quiet pair supersedes them.

Usage: python BENCH/r5_fallback.py         (env: CORPUS_DOCS, FB_REPEATS)
Writes BENCH/r5_fallback.json after every run.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
import memprobe  # noqa: E402
from corpus_scaling import ensure_corpus, run_level  # noqa: E402

OUT = os.path.join(HERE, "r5_fallback.json")
N_DOCS = int(os.environ.get("CORPUS_DOCS", "1000000"))
REPEATS = int(os.environ.get("FB_REPEATS", "2"))


def main() -> None:
    corpus = ensure_corpus(N_DOCS)
    state: dict = {"docs": N_DOCS, "mode": "loud_fallback_alternating",
                   "runs": []}

    def save() -> None:
        json.dump(state, open(OUT, "w"), indent=1)

    for rep in range(REPEATS):
        for cpus in (16, 4):
            pre = memprobe.run(16)
            t0 = time.monotonic()
            try:
                r = run_level(cpus, corpus)
            except Exception as e:  # keep going; a failed run is recorded
                r = {"error": str(e)[:800]}
            r.update({"cpus": cpus, "rep": rep, "mem_pre": pre,
                      "mem_post": memprobe.run(16),
                      "run_wall": round(time.monotonic() - t0, 2)})
            state["runs"].append(r)
            save()
            print(json.dumps({k: r.get(k) for k in
                              ("cpus", "rep", "mem_pre", "mem_post",
                               "run_wall", "error")}), flush=True)

    # adjacent-pair efficiencies (each 16-run vs the 4-run that follows it)
    pairs = []
    runs = [r for r in state["runs"] if "walls" in r]
    for i in range(len(runs) - 1):
        a, b = runs[i], runs[i + 1]
        if a["cpus"] == 16 and b["cpus"] == 4:
            eff = {k: round(b["walls"][k] / (4 * a["walls"][k]), 3)
                   for k in a["walls"] if a["walls"].get(k) and b["walls"].get(k)}
            pairs.append({"rep": a["rep"], "efficiency": eff,
                          "counts_match": a["counts"] == b["counts"],
                          "probes": [a["mem_pre"], b["mem_pre"]]})
    state["pairs"] = pairs
    save()
    print(json.dumps({"done": OUT, "pairs": pairs}), flush=True)


if __name__ == "__main__":
    main()
