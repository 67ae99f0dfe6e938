"""On-chip A/B driver for the dormant decode knobs (VERDICT r1 item 5).

Runs bench.py (decode-only: BENCH_ALIGN=0) sequentially under each knob
configuration and appends one JSON record per run to benchmarks/AB_RESULTS.json.
Each new knob mints a fresh jit signature (minutes of compile through the
relay, persisted to the compile cache); run under `timeout` in the background.

Usage: python benchmarks/ab_knobs.py [config ...]
  configs: base approx-topk int8-mm-pallas fused-qkv  (default: all)
"""

import json
import os
import subprocess
import sys
import time

CONFIGS = {
    # decode-only knobs (BENCH_ALIGN=0 is applied to all of these)
    "base": {},
    "approx-topk": {"WHISPERX_TOPK": "approx"},
    "int8-mm-pallas": {"WHISPERX_INT8_MM": "pallas"},
    "fused-qkv": {"BENCH_FUSED_QKV": "1"},
    "batch16": {"BENCH_BATCH": "16"},
    "combo": {
        "WHISPERX_TOPK": "approx",
        "WHISPERX_INT8_MM": "pallas",
        "BENCH_FUSED_QKV": "1",
    },
    "combo-batch16": {
        "WHISPERX_TOPK": "approx",
        "WHISPERX_INT8_MM": "pallas",
        "BENCH_FUSED_QKV": "1",
        "BENCH_BATCH": "16",
    },
    # align-path knobs (override BENCH_ALIGN back on)
    "align-base": {"BENCH_ALIGN": "1"},
    "align-attn-flash": {"BENCH_ALIGN": "1", "WHISPERX_ATTN": "flash"},
}

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "AB_RESULTS.json")


def main():
    names = sys.argv[1:] or list(CONFIGS)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name in names:
        env = {**os.environ, "BENCH_ALIGN": "0", **CONFIGS[name]}
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, "bench.py"], cwd=root, env=env,
            capture_output=True, text=True, timeout=3600,
        )
        line = next(
            (l for l in proc.stdout.splitlines() if l.startswith("{")), None
        )
        record = {
            "config": name,
            "env": CONFIGS[name],
            "wall_s": round(time.time() - t0, 1),
            "result": json.loads(line) if line else None,
            "rc": proc.returncode,
        }
        if proc.returncode != 0:
            record["stderr_tail"] = proc.stderr[-800:]
        with open(RESULTS, "a") as f:
            f.write(json.dumps(record) + "\n")
        print(json.dumps(record), flush=True)


if __name__ == "__main__":
    main()
