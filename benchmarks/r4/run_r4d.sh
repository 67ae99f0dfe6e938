#!/bin/bash
# Final r4 headline pair at the settled defaults:
# gather beam history + deferred align + int16 waveform uploads.
cd /root/repo
LOG=benchmarks/r4/r4d.log
{
  echo "=== bench default (combined, final defaults) ==="
  timeout 3000 python bench.py; echo "rc=$?"
  echo "=== bench noalign (final defaults) ==="
  BENCH_ALIGN=0 timeout 3000 python bench.py; echo "rc=$?"
  echo "=== DONE ==="
} >>"$LOG" 2>&1
