"""A/B the beam-reorder (cache gather) implementation on chip.

r3 measured the per-layer axis-0 gather at ~5.0 ms/step; r4's stacked
layouts regressed it (L-leading axis-1: 16.5 ms, batch-leading axis-0:
28.1 ms) — XLA's gather lowering is shape-sensitive in ways worth measuring,
not guessing. This probe times candidate reorder strategies on the exact
flagship decode shapes (B=8, K=5, L=32, T=128, H=20, Dh=64, int8 KV +
f32 scales), each as a data-dependent chain inside one jit so steady-state
HBM behavior is what's measured. Speed-of-light for the full cache
(2x int8 209.7 MB + 2x f32 13.1 MB, read+write) is ~1.1 ms on v5e.

Usage: python benchmarks/gather_probe.py   (BENCH_* knobs set the shapes)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 24


def timed(fn, *args):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / ITERS


def main():
    import jax
    import jax.numpy as jnp

    from whisperx_tpu.utils import enable_compile_cache

    enable_compile_cache()

    B = int(os.environ.get("BENCH_BATCH", "8"))
    K = int(os.environ.get("BENCH_BEAM", "5"))
    L = int(os.environ.get("PROBE_LAYERS", "32"))
    T = int(os.environ.get("PROBE_T", "128"))
    H = int(os.environ.get("PROBE_HEADS", "20"))
    Dh = int(os.environ.get("PROBE_DH", "64"))
    R = B * K

    rng = np.random.default_rng(0)
    perm = jnp.asarray((np.arange(R) + 1) % R, jnp.int32)

    def chain(gather_fn, tree):
        """Apply gather ITERS times with a data dependency (steady state)."""

        def body(i, t):
            return gather_fn(t, perm)

        return jax.lax.fori_loop(0, ITERS, body, tree)

    results = {}

    def bench(name, gather_fn, tree):
        fn = jax.jit(lambda tr: chain(gather_fn, tr))
        ms = timed(fn, tree) * 1e3
        results[name] = round(ms, 3)

    # --- candidate layouts of the same logical cache -----------------------
    k5 = jnp.asarray(rng.integers(-127, 127, (R, L, T, H, Dh)), jnp.int8)
    v5 = jnp.asarray(rng.integers(-127, 127, (R, L, T, H, Dh)), jnp.int8)
    ks5 = jnp.asarray(rng.standard_normal((R, L, T, H, 1)), jnp.float32)
    vs5 = jnp.asarray(rng.standard_normal((R, L, T, H, 1)), jnp.float32)
    stacked = {"k": k5, "v": v5, "k_scale": ks5, "v_scale": vs5}

    bench(
        "stacked5d_take_axis0",
        lambda t, p: jax.tree_util.tree_map(lambda a: jnp.take(a, p, axis=0), t),
        stacked,
    )

    flat = jax.tree_util.tree_map(lambda a: a.reshape(R, -1), stacked)
    bench(
        "stacked2d_take_axis0",
        lambda t, p: jax.tree_util.tree_map(lambda a: jnp.take(a, p, axis=0), t),
        flat,
    )

    # One-hot matmul reorder: permutation as an int8 0/1 matrix; the copy
    # rides the MXU's streaming datapath instead of the gather unit.
    def onehot_mm(t, p):
        P = jax.nn.one_hot(p, R, dtype=jnp.int8)  # (R, R)
        Pf = P.astype(jnp.float32)

        def one(a):
            if a.dtype == jnp.int8:
                y = jax.lax.dot(
                    P, a.reshape(R, -1), preferred_element_type=jnp.int32
                )
                return y.astype(jnp.int8).reshape(a.shape)
            y = jax.lax.dot(Pf, a.reshape(R, -1))
            return y.reshape(a.shape)

        return jax.tree_util.tree_map(one, t)

    bench("stacked_onehot_matmul", onehot_mm, flat)

    # Per-layer r3 layout: L separate (R, T, H, Dh) buffers per kind.
    perlayer = [
        {
            "k": k5[:, i],
            "v": v5[:, i],
            "k_scale": ks5[:, i],
            "v_scale": vs5[:, i],
        }
        for i in range(L)
    ]
    bench(
        "perlayer_take_axis0",
        lambda t, p: jax.tree_util.tree_map(lambda a: jnp.take(a, p, axis=0), t),
        perlayer,
    )

    # dynamic_slice loop: one row at a time (lower bound on slice-based copy).
    def ds_rows(t, p):
        def one(a):
            def body(i, out):
                row = jax.lax.dynamic_index_in_dim(a, p[i], axis=0)
                return jax.lax.dynamic_update_index_in_dim(out, row, i, axis=0)

            return jax.lax.fori_loop(0, R, body, jnp.empty_like(a))

        return jax.tree_util.tree_map(one, t)

    bench("stacked2d_dynslice_rows", ds_rows, flat)

    # bf16 cache variant of the winner shapes (kv_cache_dtype="model").
    kb = jnp.asarray(rng.standard_normal((R, L * T * H * Dh // 2)), jnp.bfloat16)
    bench(
        "bf16_stacked2d_take_axis0",
        lambda t, p: jnp.take(t, p, axis=0),
        kb,
    )

    logical_mb = (2 * R * L * T * H * Dh + 2 * 4 * R * L * T * H) / 1e6
    print(
        json.dumps(
            {
                "backend": jax.default_backend(),
                "shape": {"R": R, "L": L, "T": T, "H": H, "Dh": Dh},
                "logical_mb_per_reorder": round(logical_mb, 1),
                "sol_ms_rw": round(2 * logical_mb / 819e3 * 1e3, 2),
                "ms_per_reorder": results,
            }
        )
    )


if __name__ == "__main__":
    main()
