"""On-chip A/B of the beam-search candidate selection op in isolation.

The hot selection in decode/search.py is top-2K over the flattened
(B, K*V) candidate scores every decode step. This probes lax.top_k vs
lax.approx_max_k(recall_target=1.0) (exact; TPU PartialReduce lowering) at
the flagship shape, looped inside one jit program so relay dispatch noise
amortizes away.

Usage: python benchmarks/topk_probe.py  (knobs: BENCH_BATCH BENCH_BEAM, V, ITERS)
Prints one JSON object with per-call microseconds for both impls.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from whisperx_tpu.utils import enable_compile_cache

    enable_compile_cache()

    B = int(os.environ.get("BENCH_BATCH", "8"))
    K = int(os.environ.get("BENCH_BEAM", "5"))
    V = int(os.environ.get("V", "51865"))
    inner = int(os.environ.get("ITERS", "200"))

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, K * V)).astype(np.float32))

    def looped(select):
        # Data-dependent carry: each iteration's input is perturbed by the
        # previous top scores so XLA cannot hoist or dedupe the selection.
        def body(_, carry):
            scores, vals = carry
            s, i = select(scores, 2 * K)
            bump = jnp.zeros_like(scores).at[:, :1].add(s[:, :1] * 1e-6)
            return scores + bump, vals + jnp.sum(s) + jnp.sum(i)

        def run(x0):
            return jax.lax.fori_loop(0, inner, body, (x0, jnp.float32(0)))[1]

        return jax.jit(run)

    import functools

    impls = {
        "top_k": jax.lax.top_k,
        "approx_max_k": functools.partial(
            jax.lax.approx_max_k, recall_target=1.0, aggregate_to_topk=True
        ),
    }
    out = {"shape": [B, K * V], "k": 2 * K, "inner_iters": inner}
    for name, select in impls.items():
        fn = looped(select)
        jax.block_until_ready(fn(x))  # compile
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            r = fn(x)
        jax.block_until_ready(r)
        per_call_us = (time.perf_counter() - t0) / (reps * inner) * 1e6
        out[name + "_us"] = round(per_call_us, 2)
    out["speedup"] = round(out["top_k_us"] / out["approx_max_k_us"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
