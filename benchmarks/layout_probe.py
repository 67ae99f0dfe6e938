"""Probe XLA/TPU physical layouts of the decode-step's dominant buffers.

TPU arrays are tiled (sublane x lane = e.g. 32x128 for int8); a trailing
(heads=20, head_dim=64) pair can physically pad to (32, 128) — up to 3.2x
HBM inflation on exactly the buffers the beam decode step streams every
token (cross K/V, self cache). This compiles tiny programs (no meaningful
chip time) and prints allocation sizes vs logical bytes for candidate
layouts, plus the per-step cost analysis of the real step function.

Usage: BENCH_QUANT=int8 BENCH_KV=int8 python benchmarks/layout_probe.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def alloc_bytes(shape, dtype):
    import jax
    import jax.numpy as jnp

    # Compile a trivial consumer so the array is a real buffer with the
    # backend's default layout; read the executable's memory analysis.
    fn = jax.jit(lambda x: x + jnp.zeros((), dtype))
    compiled = fn.lower(jax.ShapeDtypeStruct(shape, dtype)).compile()
    ma = compiled.memory_analysis()
    logical = 1
    for s in shape:
        logical *= s
    logical *= jnp.dtype(dtype).itemsize
    return {
        "shape": list(shape),
        "dtype": str(jnp.dtype(dtype).name),
        "logical_mb": round(logical / 1e6, 2),
        "argument_mb": round(getattr(ma, "argument_size_in_bytes", 0) / 1e6, 2),
        "output_mb": round(getattr(ma, "output_size_in_bytes", 0) / 1e6, 2),
    }


def main():
    import jax
    import jax.numpy as jnp

    from whisperx_tpu.utils import enable_compile_cache

    enable_compile_cache()

    B, S, H, Dh = 8, 1500, 20, 64
    out = {"backend": jax.default_backend(), "probes": []}
    for shape, dt in [
        ((B, S, H, Dh), jnp.int8),     # cross K/V as stored today
        ((B, S, H, Dh), jnp.bfloat16),
        ((B, S, H * Dh), jnp.int8),    # flattened head dims
        ((B * 5, 128, H, Dh), jnp.int8),  # self cache rows
        ((B, S, H, 1), jnp.float32),   # scale planes
    ]:
        out["probes"].append(alloc_bytes(shape, dt))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
