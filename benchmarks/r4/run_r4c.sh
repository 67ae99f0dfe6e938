#!/bin/bash
# r4 third chip schedule: clean paired A/B of the beam-history impls at the
# SAME build (the r4b pairing was confounded by the int16-upload commit
# landing mid-schedule), then a fresh step probe at HEAD.
cd /root/repo
LOG=benchmarks/r4/r4c.log
{
  echo "=== ab history-backptr vs history-gather (paired, same build) ==="
  timeout 3600 python benchmarks/ab_knobs.py history-backptr history-gather; echo "rc=$?"
  echo "=== step_probe at HEAD ==="
  timeout 3000 python benchmarks/step_probe.py; echo "rc=$?"
  echo "=== ab reorder-nocond (unconditional cache reorder) ==="
  timeout 3600 python benchmarks/ab_knobs.py reorder-nocond; echo "rc=$?"
  echo "=== DONE ==="
} >>"$LOG" 2>&1
