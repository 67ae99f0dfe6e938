#!/bin/bash
# r5 phase 2: int4 traffic-reduction A/B (the roofline lever), the full
# production-pipeline bench, and the final flagship pair. Waits for phase 1.
cd /root/repo
LOG=benchmarks/r5/phase2.log
: > $LOG
while ! grep -q "PHASE1 DONE" benchmarks/r5/phase1.log 2>/dev/null; do sleep 30; done
echo "=== int4 KV only (cross+self+reorder traffic -50%) ===" >> $LOG
timeout 7200 python benchmarks/ab_knobs.py kv-int4 >> $LOG 2>&1
echo "rc=$?" >> $LOG
echo "=== int4 weights + int4 KV (all streams -50%) ===" >> $LOG
timeout 7200 python benchmarks/ab_knobs.py int4-combo >> $LOG 2>&1
echo "rc=$?" >> $LOG
echo "=== full production pipeline (BENCH_PIPELINE) ===" >> $LOG
timeout 7200 python benchmarks/ab_knobs.py pipeline-full >> $LOG 2>&1
echo "rc=$?" >> $LOG
echo "=== PHASE2 DONE ===" >> $LOG
