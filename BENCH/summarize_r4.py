"""Summarize round-4 gated measurements into markdown rows for
BENCH/BASELINE.md.  Reads r4_gated.json (the gated pipeline) and
r4_quiet_capture.json (the earlier capture), prints the rows + the
efficiency computation with the probe evidence attached."""

from __future__ import annotations

import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))


def load(name: str) -> dict | None:
    p = os.path.join(HERE, name)
    return json.load(open(p)) if os.path.exists(p) else None


def fmt(task: str, r: dict | None) -> str:
    if not r:
        return f"| {task} | — | — | — | not captured |"
    wall = r.get("wall_sec") or r.get("value")
    return (
        f"| {task} | {wall} | {r.get('mem_pre')} / {r.get('mem_post')} | "
        f"{'yes' if r.get('clean') else 'no'} | "
        f"fetched={r.get('fetched', '—')} |"
    )


def main() -> None:
    g = load("r4_gated.json") or {}
    c = load("r4_quiet_capture.json") or {}
    print("| task | wall_sec | probe pre/post (GB/s) | clean | notes |")
    print("|---|---|---|---|---|")
    for t in ("crawlprof", "schedbench", "n16", "n4", "bench"):
        print(fmt(t, g.get(t)))
    print()
    n16, n4 = g.get("n16"), g.get("n4")
    if not (n16 and n4):
        n16 = n16 or c.get("n16")
        n4 = n4 or c.get("n4")
    if n16 and n4:
        tp4 = n4["fetched"] / n4["wall_sec"]
        tp16 = n16["fetched"] / n16["wall_sec"]
        print(f"throughput N4  = {tp4:,.0f} urls/s  (wall {n4['wall_sec']}s, "
              f"probes {n4.get('mem_pre')}/{n4.get('mem_post')})")
        print(f"throughput N16 = {tp16:,.0f} urls/s  (wall {n16['wall_sec']}s, "
              f"probes {n16.get('mem_pre')}/{n16.get('mem_post')})")
        print(f"efficiency 4v16 = {tp16 / (4 * tp4):.3f}")
    if g.get("crawlprof"):
        cp = g["crawlprof"]
        print(f"\ncrawlprof: wall {cp['wall_sec']}s "
              f"(r2 baseline 26.74s, ratio {cp['wall_sec'] / 26.74:.2f})")
        for t in cp.get("times", []):
            print("  ", json.dumps(t))
    if g.get("schedbench"):
        print("\nschedbench:", json.dumps(
            {k: v for k, v in g["schedbench"].items()
             if k not in ("mem_pre", "mem_post", "clean")}))


if __name__ == "__main__":
    main()
