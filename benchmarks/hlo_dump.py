"""Inspect the optimized HLO of one decoder step (the beam-decode hot loop).

Compiles just step_fn (tokens (B*K,1) → logits) for the bench configuration
and reports instruction counts by opcode, standalone int8→bf16 converts
(weight dequants that failed to fuse into their matmul = 3x HBM traffic),
and the cost analysis byte/FLOP totals. Compilation runs on the backend's
compiler but executes nothing, so it is safe to run while long benches own
the chip only if WHISPERX_HLO_CPU=1 is not needed; set it to force CPU.

Usage: BENCH_QUANT=int8 BENCH_KV=int8 python benchmarks/hlo_dump.py
"""

import collections
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    if os.environ.get("WHISPERX_HLO_CPU") == "1":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    # A persistent-cache hit returns an executable whose as_text() is a stub
    # (no optimized HLO to parse) — force a real compile for this dump.
    jax.config.update("jax_enable_compilation_cache", False)

    from bench import build_bench_engine

    engine, params, opts, cfg, knobs = build_bench_engine()
    B, K = knobs["batch"], knobs["beam"]
    kv_int8 = knobs["kv"] == "int8"

    cache_len = engine._cache_len(4, opts)
    cache_dtype = jnp.int8 if kv_int8 else engine.model.dtype
    self_cache = engine.model.empty_cache(B * K, cache_dtype=cache_dtype, cache_len=cache_len)[
        "self"
    ]
    # Cross KV shapes as the engine builds them (per batch element, int8 +
    # scales when kv=int8).
    D = cfg.n_text_state
    H = cfg.n_text_head
    S = cfg.n_audio_ctx
    kshape = (B, S, H, D // H)
    if kv_int8:
        cross = [
            (
                jnp.zeros(kshape, jnp.int8),
                jnp.ones(kshape[:-1] + (1,), jnp.float32),
                jnp.zeros(kshape, jnp.int8),
                jnp.ones(kshape[:-1] + (1,), jnp.float32),
            )
            for _ in range(cfg.n_text_layer)
        ]
    else:
        cross = [
            (jnp.zeros(kshape, engine.model.dtype), jnp.zeros(kshape, engine.model.dtype))
            for _ in range(cfg.n_text_layer)
        ]

    tokens = jnp.zeros((B * K, 1), jnp.int32)
    pos = jnp.int32(4)

    # params/cross as jit ARGUMENTS: closing over them bakes the weights into
    # the HLO as constants, which exceeds the remote-compile relay's request
    # body limit (HTTP 413) on large models.
    def step(params, cross, tokens, cache, pos):
        return engine._step_fn(params, cross)(tokens, cache, pos)

    lowered = jax.jit(step).lower(params, cross, tokens, self_cache, pos)
    compiled = lowered.compile()
    text = compiled.as_text()

    ops = collections.Counter()
    # Output-buffer bytes by opcode + the largest single instructions: with a
    # bandwidth-bound step, whichever opcodes WRITE the most bytes are the
    # traffic (reads show up as some earlier op's writes or parameters).
    DT_BYTES = {
        "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "s8": 1, "u8": 1,
        "pred": 1, "s16": 2, "u16": 2, "f64": 8, "s64": 8, "u64": 8, "s4": 0.5,
    }

    def shape_bytes(sh: str) -> float:
        total = 0.0
        for m in re.finditer(r"(\w+)\[([\d,]*)\]", sh):
            dt, dims = m.group(1), m.group(2)
            if dt not in DT_BYTES:
                continue
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            total += n * DT_BYTES[dt]
        return total

    op_bytes = collections.Counter()
    insts = []
    for line in text.splitlines():
        m = re.match(r"\s*(?:ROOT )?%?([\w.\-]+) = (\(?[\w\[\],{}\s/#*]*?\)?) ([a-z0-9\-]+)\(", line)
        if m:
            name, sh, op = m.groups()
            ops[op] += 1
            b = shape_bytes(sh)
            op_bytes[op] += b
            if op not in ("parameter", "constant", "get-tuple-element", "bitcast", "tuple"):
                insts.append((b, op, name))
    insts.sort(reverse=True)
    # Standalone converts of large int8 operands (dequants that did not fuse).
    big_converts = [
        ln.strip()[:140]
        for ln in text.splitlines()
        if re.search(r"= bf16\[\d{4,}[^)]*convert\(", ln) and "s8" in ln
    ]
    try:
        cost = compiled.cost_analysis()
        cost = {k: v for k, v in (cost or {}).items() if k in ("flops", "bytes accessed")}
    except Exception:
        cost = {}
    print(
        json.dumps(
            {
                "backend": jax.default_backend(),
                "fusion_count": ops.get("fusion", 0),
                "top_ops": ops.most_common(12),
                "bytes_by_op_gb": {
                    k: round(v / 1e9, 3) for k, v in op_bytes.most_common(12)
                },
                "top_insts_mb": [
                    [round(b / 1e6, 1), op, name] for b, op, name in insts[:15]
                ],
                "standalone_big_dequants": len(big_converts),
                "cost": cost,
            },
            default=str,
        )
    )
    for ln in big_converts[:5]:
        print("DEQUANT:", ln)


if __name__ == "__main__":
    main()
