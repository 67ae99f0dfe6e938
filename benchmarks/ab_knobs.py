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
    # cross-attention impl (decode-only; substantiates the XLA default flip)
    "cross-attn-xla": {"WHISPERX_CROSS_ATTN": "xla"},
    "cross-attn-pallas": {"WHISPERX_CROSS_ATTN": "pallas"},
    # align-path knobs (override BENCH_ALIGN back on)
    "align-base": {"BENCH_ALIGN": "1"},
    # r3 transfer A/B: int16 PCM uploads (default) vs float32 — measures the
    # relay host→device bandwidth saving on the combined metric.
    "align-upload-f32": {"BENCH_ALIGN": "1", "WHISPERX_WAV_INT16": "0"},
    "align-attn-flash": {"BENCH_ALIGN": "1", "WHISPERX_ATTN": "flash"},
    # r3: alignment-tax knobs (BASELINE metric includes alignment; these
    # attack the ~19% it costs on top of decode-only)
    "align-w2v-int8": {"BENCH_ALIGN": "1", "BENCH_ALIGN_QUANT": "int8"},
    # batch 16 must widen BOTH stages (8 segments padded to 16 align rows
    # would be pure waste).
    "align-batch16": {"BENCH_ALIGN": "1", "BENCH_BATCH": "16", "BENCH_ALIGN_BATCH": "16"},
    "align-bucket2s": {"BENCH_ALIGN": "1", "WHISPERX_ALIGN_BUCKET_S": "2"},
    "align-combo": {
        "BENCH_ALIGN": "1",
        "BENCH_ALIGN_QUANT": "int8",
        "BENCH_BATCH": "16",
        "BENCH_ALIGN_BATCH": "16",
    },
    # r4: cache-reorder impls on the per-layer tree (stacked layouts were
    # probed and rejected — see models/whisper.py MultiHeadAttention).
    "reorder-take": {"WHISPERX_REORDER": "take"},
    "reorder-onehot": {"WHISPERX_REORDER": "onehot"},
    "reorder-nocond": {"WHISPERX_REORDER_COND": "0"},
    # r5: bucketed prefix-only cache reorder (default granule 32 since r5;
    # "base" measures it). prefix-off restores the full-buffer gather,
    # prefix-16 halves the bucket granule.
    "prefix-off": {"WHISPERX_REORDER_PREFIX": "0"},
    "prefix-16": {"WHISPERX_REORDER_PREFIX": "16"},
    # r5: full production pipeline (VAD + host loop + align) — BENCH_PIPELINE
    # mode; config name carries it so records are self-describing.
    "pipeline-full": {"BENCH_PIPELINE": "1", "BENCH_PIPE_MINUTES": "10", "BENCH_ALIGN": "1"},
    # r4: experimental half-width storage (weights / KV).
    "quant-int4": {"BENCH_QUANT": "int4"},
    "kv-int4": {"BENCH_KV": "int4"},
    "int4-combo": {"BENCH_QUANT": "int4", "BENCH_KV": "int4"},
    # r4: worst-case fallback ladder cost (all chunks re-decoded once).
    "fallback-worst": {"BENCH_FALLBACK": "1"},
    # r4: beam token-history bookkeeping (search._history_impl). The r4 "base"
    # run predates the backptr default and measured gather; "history-backptr"
    # is its paired decode-only run.
    "history-backptr": {"WHISPERX_BEAM_HISTORY": "backptr"},
    "history-gather": {"WHISPERX_BEAM_HISTORY": "gather"},
}

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "AB_RESULTS.json")


def main():
    names = sys.argv[1:] or list(CONFIGS)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name in names:
        env = {**os.environ, "BENCH_ALIGN": "0", **CONFIGS[name]}
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, "bench.py"], cwd=root, env=env,
                capture_output=True, text=True, timeout=3600,
            )
            stdout, stderr, rc = proc.stdout, proc.stderr, proc.returncode
        except subprocess.TimeoutExpired as e:
            # Record the timeout and keep going — a hung config must not
            # silently drop every remaining config's record.
            stdout = (e.stdout or b"").decode() if isinstance(e.stdout, bytes) else (e.stdout or "")
            stderr = (e.stderr or b"").decode() if isinstance(e.stderr, bytes) else (e.stderr or "")
            rc = -1
        line = next((l for l in stdout.splitlines() if l.startswith("{")), None)
        record = {
            "config": name,
            "env": CONFIGS[name],
            "wall_s": round(time.time() - t0, 1),
            "result": json.loads(line) if line else None,
            "rc": rc,
        }
        if rc != 0:
            record["stderr_tail"] = ("TIMEOUT\n" if rc == -1 else "") + stderr[-800:]
        with open(RESULTS, "a") as f:
            f.write(json.dumps(record) + "\n")
        print(json.dumps(record), flush=True)


if __name__ == "__main__":
    main()

