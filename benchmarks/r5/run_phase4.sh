#!/bin/bash
# r5 phase 4 (best-effort): retry the int4 KV bench once after the final
# pair — the first attempt died to a relay remote_compile disconnect.
cd /root/repo
LOG=benchmarks/r5/phase4.log
: > $LOG
while ! grep -q "PHASE3 DONE" benchmarks/r5/phase3.log 2>/dev/null; do sleep 30; done
echo "=== kv-int4 retry ===" >> $LOG
timeout 7200 python benchmarks/ab_knobs.py kv-int4 >> $LOG 2>&1
echo "rc=$?" >> $LOG
echo "=== PHASE4 DONE ===" >> $LOG
