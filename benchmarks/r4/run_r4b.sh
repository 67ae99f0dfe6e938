#!/bin/bash
# r4 second chip schedule, serialized (one owner of the chip at a time):
#   1. bench default        — combined metric WITH the deferred-align overlap
#   2. bench BENCH_ALIGN=0  — decode-only at the same HEAD (pairs with 148.74)
#   3. ab_knobs history-gather — paired run quantifying the backptr win
#   4. ab_knobs fallback-worst — worst-case temperature-fallback ladder cost
#   5. conv_probe           — per-layer wav2vec2 feature-extractor timings
# Each step under timeout; all output appended to this log.
cd /root/repo
LOG=benchmarks/r4/r4b.log
{
  echo "=== bench default (deferred align) ==="
  timeout 3000 python bench.py; echo "rc=$?"
  echo "=== bench noalign ==="
  BENCH_ALIGN=0 timeout 3000 python bench.py; echo "rc=$?"
  echo "=== ab history-gather ==="
  timeout 3600 python benchmarks/ab_knobs.py history-gather; echo "rc=$?"
  echo "=== ab fallback-worst ==="
  timeout 3600 python benchmarks/ab_knobs.py fallback-worst; echo "rc=$?"
  echo "=== conv_probe ==="
  timeout 3000 python benchmarks/conv_probe.py; echo "rc=$?"
  echo "=== DONE ==="
} >>"$LOG" 2>&1
