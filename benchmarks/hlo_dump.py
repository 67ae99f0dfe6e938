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

    step = engine._step_fn(params, cross)
    tokens = jnp.zeros((B * K, 1), jnp.int32)
    pos = jnp.int32(4)

    lowered = jax.jit(step).lower(tokens, self_cache, pos)
    compiled = lowered.compile()
    text = compiled.as_text()

    ops = collections.Counter()
    for line in text.splitlines():
        m = re.match(r"\s*(?:ROOT )?%?[\w.\-]+ = \S+ ([a-z0-9\-]+)\(", line)
        if m:
            ops[m.group(1)] += 1
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
