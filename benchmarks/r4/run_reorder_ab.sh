#!/bin/bash
cd /root/repo
LOG=benchmarks/r4/reorder_ab.log
: > $LOG
echo "=== step_probe onehot ===" >> $LOG
timeout 5400 env WHISPERX_REORDER=onehot python benchmarks/step_probe.py >> $LOG 2>&1
echo "rc=$?" >> $LOG
echo "=== bench noalign onehot cond1 ===" >> $LOG
timeout 5400 env WHISPERX_REORDER=onehot BENCH_ALIGN=0 python bench.py >> $LOG 2>&1
echo "rc=$?" >> $LOG
echo "=== bench noalign onehot cond0 ===" >> $LOG
timeout 5400 env WHISPERX_REORDER=onehot WHISPERX_REORDER_COND=0 BENCH_ALIGN=0 python bench.py >> $LOG 2>&1
echo "rc=$?" >> $LOG
echo "=== bench align-on onehot (best cond assumed 1) ===" >> $LOG
timeout 5400 env WHISPERX_REORDER=onehot python bench.py >> $LOG 2>&1
echo "rc=$?" >> $LOG
echo "=== DONE ===" >> $LOG
