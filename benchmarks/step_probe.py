"""Isolate the beam-decode step cost: model forward vs beam bookkeeping.

The decompose probe showed the 112-step beam loop dominates the flagship
program (~16 ms/step at B=8, K=5 — ~4x the ~4 ms/step HBM speed-of-light for
the step's logical traffic: ~0.77 GB weights + ~1.04 GB cross KV + ~0.5 GB
self cache). This probe times, on the same bench configuration:

  fwd       — lax.scan over N pure decoder-step forwards (token embed →
              32 layers → logits), cache updated, NO beam bookkeeping
  fwd+gather— same, plus an unconditional full self-cache gather per step
              (the beam-reorder cost that lax.cond skips when beams hold)

Comparing ms/step here against decompose.py's full-loop number splits the
per-step cost three ways: model forward / cache reorder / beam selection
(softmax + top-2K + finished-merge). Usage: same BENCH_* knobs as bench.py.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, iters=3):
    import jax

    def sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf.ravel()[0])

    sync(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_bench_engine

    engine, params, opts, cfg, knobs = build_bench_engine()
    B, K = knobs["batch"], knobs["beam"]
    steps = int(os.environ.get("STEP_PROBE_N", "56"))
    kv_int8 = knobs["kv"] == "int8"

    cache_len = engine._cache_len(4, opts)
    cache_dtype = jnp.int8 if kv_int8 else engine.model.dtype
    self_cache = engine.model.empty_cache(B * K, cache_dtype=cache_dtype, cache_len=cache_len)[
        "self"
    ]
    D, H, S = cfg.n_text_state, cfg.n_text_head, cfg.n_audio_ctx
    kshape = (B, S, H, D // H)
    rng = np.random.default_rng(0)
    if kv_int8:
        cross = [
            (
                jnp.asarray(rng.integers(-127, 127, kshape), jnp.int8),
                jnp.ones(kshape[:-1] + (1,), jnp.float32) * 0.01,
                jnp.asarray(rng.integers(-127, 127, kshape), jnp.int8),
                jnp.ones(kshape[:-1] + (1,), jnp.float32) * 0.01,
            )
            for _ in range(cfg.n_text_layer)
        ]
    else:
        cross = [
            (
                jnp.asarray(rng.standard_normal(kshape) * 0.1, engine.model.dtype),
                jnp.asarray(rng.standard_normal(kshape) * 0.1, engine.model.dtype),
            )
            for _ in range(cfg.n_text_layer)
        ]

    tok0 = jnp.zeros((B * K,), jnp.int32)

    # params/cross must be jit ARGUMENTS, not closure constants — baked-in
    # weights inflate the HLO past the remote-compile relay's request limit
    # (HTTP 413) and would be re-uploaded per compile.
    def fwd_loop(params, cross, tok, cache):
        step = engine._step_fn(params, cross)

        def body(carry, pos):
            tok, cache = carry
            logits, cache = step(tok[:, None], cache, pos)
            tok = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            return (tok, cache), ()

        (tok, cache), _ = jax.lax.scan(
            body, (tok, cache), jnp.arange(4, 4 + steps, dtype=jnp.int32)
        )
        return tok

    def fwd_gather_loop(params, cross, tok, cache):
        from whisperx_tpu.decode.search import _gather_cache

        step = engine._step_fn(params, cross)
        # Rotating beam permutation per step: forces the same cache reorder
        # the beam loop pays whenever beams reorder (random-weight regime).
        # Routed through search._gather_cache so WHISPERX_REORDER applies.
        perm = (jnp.arange(B * K) + 1) % (B * K)

        def body(carry, pos):
            tok, cache = carry
            logits, cache = step(tok[:, None], cache, pos)
            cache = _gather_cache(cache, perm)
            tok = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            return (tok, cache), ()

        (tok, cache), _ = jax.lax.scan(
            body, (tok, cache), jnp.arange(4, 4 + steps, dtype=jnp.int32)
        )
        return tok

    def fwd_gather_prefix_loop(params, cross, tok, cache):
        from whisperx_tpu.decode.search import _gather_cache

        step = engine._step_fn(params, cross)
        perm = (jnp.arange(B * K) + 1) % (B * K)

        def body(carry, pos):
            tok, cache = carry
            logits, cache = step(tok[:, None], cache, pos)
            # valid_len = pos + 1 written rows → the bucketed prefix gather
            # (WHISPERX_REORDER_PREFIX) instead of the full-buffer reorder.
            cache = _gather_cache(cache, perm, pos + 1)
            tok = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            return (tok, cache), ()

        (tok, cache), _ = jax.lax.scan(
            body, (tok, cache), jnp.arange(4, 4 + steps, dtype=jnp.int32)
        )
        return tok

    t_fwd = timed(jax.jit(fwd_loop), params, cross, tok0, self_cache)
    t_fwd_gather = timed(jax.jit(fwd_gather_loop), params, cross, tok0, self_cache)
    t_fwd_gather_prefix = timed(
        jax.jit(fwd_gather_prefix_loop), params, cross, tok0, self_cache
    )

    print(
        json.dumps(
            {
                "backend": jax.default_backend(),
                "batch": B,
                "beam": K,
                "steps": steps,
                "kv": knobs["kv"],
                "quant": knobs["quant"] or "bf16",
                "fwd_ms_per_step": round(1e3 * t_fwd / steps, 3),
                "fwd_gather_ms_per_step": round(1e3 * t_fwd_gather / steps, 3),
                "gather_ms_per_step": round(1e3 * (t_fwd_gather - t_fwd) / steps, 3),
                "fwd_gather_prefix_ms_per_step": round(1e3 * t_fwd_gather_prefix / steps, 3),
                "gather_prefix_ms_per_step": round(
                    1e3 * (t_fwd_gather_prefix - t_fwd) / steps, 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
