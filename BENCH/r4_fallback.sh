#!/bin/bash
# Phase A: loud full pass after the gated run's deadline; Phase B: long sniper.
cd /root/repo
# wait for PID 619 (gated run) to exit
while kill -0 619 2>/dev/null; do sleep 30; done
[ -f BENCH/r4_gated.json ] && cp BENCH/r4_gated.json BENCH/r4_gated_predeadline.json
# Phase A: one unconditional pass, probes recorded per task
GATE_GBPS=0 GATE_HOURS=1.5 python BENCH/r4_gated.py > BENCH/r4_loud_pass.log 2>&1
cp BENCH/r4_gated.json BENCH/r4_loud.json
# Phase B: quiet-gated retry for the rest of the night
nohup env GATE_GBPS=20 GATE_HOURS=8 python BENCH/r4_gated.py > BENCH/r4_gated2.log 2>&1 &
echo "fallback done; phase B pid $!"
