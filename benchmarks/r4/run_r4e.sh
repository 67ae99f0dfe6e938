#!/bin/bash
cd /root/repo
{
  echo "=== ab reorder-nocond (at final defaults: gather history) ==="
  timeout 3500 python benchmarks/ab_knobs.py reorder-nocond; echo "rc=$?"
  echo "=== DONE ==="
} >>benchmarks/r4/r4e.log 2>&1
