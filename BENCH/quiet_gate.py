"""Gate a measurement on a quiet host window.

The box shares its memory bus with noisy neighbors: STREAM bandwidth at 16
processes swings 0.3-97 GB/s minute-to-minute (mem_probes in
scaling_result.json).  Walls measured in a loud window say nothing about the
engine, so this gate polls the bandwidth probe and exits 0 only after
``--need`` consecutive probes at or above ``--gbps`` at the hi level —
compose as:

    python BENCH/quiet_gate.py --gbps 20 && python BENCH/scaling.py

Exits 1 if the window never arrives within --max-minutes (measure anyway and
lean on the interleaved probes to document the conditions).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 1)[0])
import memprobe


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lo", type=int, default=4)
    ap.add_argument("--hi", type=int, default=16)
    ap.add_argument("--gbps", type=float, default=20.0)
    ap.add_argument("--need", type=int, default=2)
    ap.add_argument("--max-minutes", type=float, default=45.0)
    ap.add_argument("--poll-seconds", type=float, default=45.0)
    args = ap.parse_args()

    t_end = time.monotonic() + args.max_minutes * 60
    streak = 0
    while time.monotonic() < t_end:
        bw = memprobe.run(args.hi)
        print(json.dumps({"hi_gbps": bw, "streak": streak}), flush=True)
        streak = streak + 1 if bw >= args.gbps else 0
        if streak >= args.need:
            print(json.dumps({"quiet": True, "hi_gbps": bw}), flush=True)
            return 0
        time.sleep(args.poll_seconds)
    print(json.dumps({"quiet": False}), flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
