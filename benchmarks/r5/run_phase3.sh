#!/bin/bash
# r5 phase 3: final flagship pair at end-of-round defaults.
cd /root/repo
LOG=benchmarks/r5/phase3.log
: > $LOG
while ! grep -q "PHASE2 DONE" benchmarks/r5/phase2.log 2>/dev/null; do sleep 30; done
echo "=== final combined (decode + deferred align) ===" >> $LOG
timeout 5400 env BENCH_ALIGN=1 python bench.py >> $LOG 2>&1
echo "rc=$?" >> $LOG
echo "=== final decode-only (paired) ===" >> $LOG
timeout 5400 env BENCH_ALIGN=0 python bench.py >> $LOG 2>&1
echo "rc=$?" >> $LOG
echo "=== PHASE3 DONE ===" >> $LOG
