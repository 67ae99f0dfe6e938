"""Per-layer probe of the wav2vec2 conv feature extractor on the chip.

The r3 align decomposition (benchmarks/align_decompose.py, AB_RESULTS
conv-impl-*) put the conv stack at ~73 ms of the ~128 ms fused align forward
for a batch of 8x30 s — an order of magnitude above its HBM/FLOP roofline
(~6-10 ms). This probe breaks the stack down so the slow stage is visible:

  - full ConvFeatureExtractor forward (native conv vs framed matmul)
  - each conv layer alone (geometry (dim, kernel, stride) from the config)
  - the first-layer GroupNorm alone (f32 stats over 96k frames)
  - gelu over the layer-0 output shape

Timing: median of ITERS calls with one batch in flight (same discipline as
bench.py — through the TPU relay, per-call blocking would measure round
trips). Prints one JSON line per entry.

Usage: python benchmarks/conv_probe.py  [env: PROBE_BATCH, PROBE_SECONDS,
PROBE_ITERS, BENCH_ALIGN_QUANT]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=9):
    out = fn(*args)  # compile
    np.asarray(jax_block(out))
    stamps = [time.perf_counter()]
    prev = None
    for _ in range(iters):
        out = fn(*args)
        if prev is not None:
            np.asarray(jax_block(prev))
            stamps.append(time.perf_counter())
        prev = out
    np.asarray(jax_block(prev))
    stamps.append(time.perf_counter())
    dts = [b - a for a, b in zip(stamps[:-1], stamps[1:])]
    return float(np.median(dts))


def jax_block(out):
    import jax

    leaves = jax.tree_util.tree_leaves(out)
    return leaves[0].ravel()[:1] if leaves else np.zeros(())


def main():
    from whisperx_tpu.utils import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from whisperx_tpu.models.configs import WAV2VEC2_BASE
    from whisperx_tpu.models.wav2vec2 import (
        ConvFeatureExtractor,
        StridedConv1D,
        Wav2Vec2ForCTC,
        init_wav2vec2_params,
    )

    B = int(os.environ.get("PROBE_BATCH", "8"))
    secs = float(os.environ.get("PROBE_SECONDS", "30"))
    iters = int(os.environ.get("PROBE_ITERS", "9"))
    T = int(secs * 16000)
    dtype = jnp.bfloat16
    cfg = WAV2VEC2_BASE

    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((B, T)) * 0.1, jnp.float32)

    records = []

    def rec(name, seconds, **kw):
        row = {"probe": name, "ms": round(seconds * 1e3, 2), **kw}
        records.append(row)
        print(json.dumps(row), flush=True)

    # --- full model forward (context: the whole emission path) -------------
    model, params = init_wav2vec2_params(cfg, seed=0, dtype=dtype)
    fwd = jax.jit(lambda p, a: model.apply({"params": p}, a))
    rec("w2v_full_fwd", timeit(fwd, params, audio, iters=iters), batch=B, secs=secs)

    # --- conv stack, both impls -------------------------------------------
    for impl in ("conv", "matmul", "s2d"):
        os.environ["WHISPERX_CONV_IMPL"] = impl
        fe = ConvFeatureExtractor(cfg, dtype=dtype)
        fe_params = fe.init(jax.random.PRNGKey(0), audio[:1, :400])["params"]
        f = jax.jit(lambda p, a, _fe=fe: _fe.apply({"params": p}, a))
        rec(f"conv_stack_{impl}", timeit(f, fe_params, audio, iters=iters))
    os.environ.pop("WHISPERX_CONV_IMPL", None)

    # --- each layer alone, both impls -------------------------------------
    t_in = T
    x_in = audio[:, :, None]
    for i, (dim, kernel, stride) in enumerate(cfg.conv_layers):
        for impl in ("conv", "matmul", "s2d"):
            layer = StridedConv1D(
                dim, kernel, stride, use_bias=cfg.conv_bias, dtype=dtype, impl=impl
            )
            lp = layer.init(jax.random.PRNGKey(i), x_in[:1, :512])
            f = jax.jit(lambda p, a, _l=layer: _l.apply(p, a))
            rec(
                f"conv{i}_{impl}",
                timeit(f, lp, x_in.astype(dtype), iters=iters),
                t_in=int(x_in.shape[1]),
                cin=int(x_in.shape[2]),
                cout=dim,
                kernel=kernel,
                stride=stride,
            )
        t_out = (t_in - kernel) // stride + 1
        x_in = jnp.zeros((B, t_out, dim), dtype)
        t_in = t_out

    # --- norm0 + gelu at the layer-0 output shape --------------------------
    import flax.linen as nn

    t0 = (T - cfg.conv_layers[0][1]) // cfg.conv_layers[0][2] + 1
    y0 = jnp.zeros((B, t0, cfg.conv_layers[0][0]), dtype)
    gn = nn.GroupNorm(num_groups=cfg.conv_layers[0][0], epsilon=1e-5, dtype=jnp.float32)
    gp = gn.init(jax.random.PRNGKey(0), y0[:1, :64])
    f = jax.jit(lambda p, a: gn.apply(p, a))
    rec("norm0_f32", timeit(f, gp, y0, iters=iters), shape=list(y0.shape))
    f = jax.jit(lambda a: nn.gelu(a, approximate=False))
    rec("gelu0", timeit(f, y0, iters=iters))

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "CONV_PROBE.json")
    with open(out, "w") as fh:
        for row in records:
            fh.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
