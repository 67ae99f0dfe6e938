#!/bin/bash
cd /root/repo
LOG=benchmarks/r4/perlayer.log
: > $LOG
echo "=== step_probe per-layer take ===" >> $LOG
timeout 5400 python benchmarks/step_probe.py >> $LOG 2>&1
echo "rc=$?" >> $LOG
echo "=== bench noalign ===" >> $LOG
timeout 5400 env BENCH_ALIGN=0 python bench.py >> $LOG 2>&1
echo "rc=$?" >> $LOG
echo "=== bench align-on ===" >> $LOG
timeout 5400 python bench.py >> $LOG 2>&1
echo "rc=$?" >> $LOG
echo "=== bench noalign kv-int4 ===" >> $LOG
timeout 5400 env BENCH_ALIGN=0 BENCH_KV=int4 python bench.py >> $LOG 2>&1
echo "rc=$?" >> $LOG
echo "=== bench noalign quant-int4 ===" >> $LOG
timeout 5400 env BENCH_ALIGN=0 BENCH_QUANT=int4 python bench.py >> $LOG 2>&1
echo "rc=$?" >> $LOG
echo "=== bench noalign int4-combo ===" >> $LOG
timeout 5400 env BENCH_ALIGN=0 BENCH_QUANT=int4 BENCH_KV=int4 python bench.py >> $LOG 2>&1
echo "rc=$?" >> $LOG
echo "=== DONE ===" >> $LOG
