#!/bin/bash
# r5 phase 1: wait for the reorder A/B to drain, then step/hbm probes and
# the prefix-reorder paired A/B. One chip owner at a time.
cd /root/repo
LOG=benchmarks/r5/phase1.log
: > $LOG
while pgrep -f "ab_knobs.py base reorder-nocond" > /dev/null; do sleep 30; done
echo "=== step_probe (HEAD: nocond + prefix32) ===" >> $LOG
timeout 5400 python benchmarks/step_probe.py >> $LOG 2>&1
echo "rc=$?" >> $LOG
echo "=== hbm_probe ===" >> $LOG
timeout 3600 python benchmarks/hbm_probe.py >> $LOG 2>&1
echo "rc=$?" >> $LOG
echo "=== prefix paired A/B ===" >> $LOG
timeout 14400 python benchmarks/ab_knobs.py base prefix-off base prefix-off >> $LOG 2>&1
echo "rc=$?" >> $LOG
echo "=== PHASE1 DONE ===" >> $LOG
