#!/bin/bash
# Sequential TPU runs: one process owns the chip at a time.
cd /root/repo
echo "=== step_probe (stacked cache) ===" > benchmarks/r4/flagship.log
timeout 5400 python benchmarks/step_probe.py >> benchmarks/r4/flagship.log 2>&1
echo "rc=$?" >> benchmarks/r4/flagship.log
echo "=== bench default (align on) ===" >> benchmarks/r4/flagship.log
timeout 5400 python bench.py >> benchmarks/r4/flagship.log 2>&1
echo "rc=$?" >> benchmarks/r4/flagship.log
echo "=== bench transcribe-only (BENCH_ALIGN=0) ===" >> benchmarks/r4/flagship.log
timeout 5400 env BENCH_ALIGN=0 python bench.py >> benchmarks/r4/flagship.log 2>&1
echo "rc=$?" >> benchmarks/r4/flagship.log
echo "=== DONE ===" >> benchmarks/r4/flagship.log
