"""Stage-timing decomposition for the alignment path (wav2vec2 + CTC).

Times, on the available accelerator, for the bench.py align configuration
(wav2vec2-base bf16, batch 8 × 30 s):
  conv     — conv feature extractor alone
  w2v      — full wav2vec2 forward (conv + transformer + lm head + log_softmax)
  ctc      — trellis + device backtrack from precomputed emissions
  fused    — the production one-jit path (w2v + ctc, emissions stay in HBM)

Prints one JSON object. Knobs: ALIGN_BATCH, ALIGN_TOKENS.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, iters=3):
    # Through the axon relay block_until_ready does not reliably wait; a
    # device->host fetch of one element is the only dependable sync.
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
    from whisperx_tpu.utils import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from whisperx_tpu.align.alignment import _fused_align_fwd, test_align_model
    from whisperx_tpu.models.configs import WAV2VEC2_BASE

    B = int(os.environ.get("ALIGN_BATCH", "8"))
    n_tok = int(os.environ.get("ALIGN_TOKENS", "384"))
    backend = os.environ.get("WHISPERX_CTC_BACKEND", "scan")
    T = 480000

    m = test_align_model("en", config=WAV2VEC2_BASE, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    wavs = jnp.asarray((rng.standard_normal((B, T)) * 0.1), jnp.float32)
    lens = jnp.full((B,), T - 640, jnp.int32)
    N = max(64, -(-n_tok // 64) * 64)
    tokens = jnp.asarray(rng.integers(1, 28, (B, N)).astype(np.int32))
    n_len = jnp.full((B,), n_tok, jnp.int32)

    from whisperx_tpu.models.wav2vec2 import ConvFeatureExtractor

    conv_mod = ConvFeatureExtractor(WAV2VEC2_BASE, dtype=jnp.bfloat16)
    conv_fn = jax.jit(lambda p, a: conv_mod.apply({"params": p["feature_extractor"]}, a))
    t_conv = timed(conv_fn, m.params, wavs)

    w2v_fn = jax.jit(
        lambda p, a, sl: jax.nn.log_softmax(
            m.model.apply({"params": p}, a, sample_lengths=sl), axis=-1
        )
    )
    t_w2v = timed(w2v_fn, m.params, wavs, lens)
    logp = w2v_fn(m.params, wavs, lens)

    from whisperx_tpu.ops.ctc import ctc_align_batch_device

    t_lens = m.model.feature_lengths(lens)
    ctc_fn = jax.jit(
        lambda lp: ctc_align_batch_device(lp, tokens, t_lens, n_len, blank=0, backend=backend)
    )
    t_ctc = timed(ctc_fn, logp)

    # The fused path takes ONE packed (B, N+2) int32 side input:
    # [tokens | sample_len | n_len] (see _fused_align_fwd).
    tok_pack = jnp.concatenate([tokens, lens[:, None], n_len[:, None]], axis=1)
    fused = _fused_align_fwd(m.model, 0, backend)
    t_fused = timed(fused, m.params, wavs, tok_pack)

    print(
        json.dumps(
            {
                "batch": B,
                "backend": backend,
                "t_conv_s": round(t_conv, 4),
                "t_w2v_s": round(t_w2v, 4),
                "t_transformer_s": round(t_w2v - t_conv, 4),
                "t_ctc_s": round(t_ctc, 4),
                "t_fused_s": round(t_fused, 4),
                "align_x_realtime": round(B * 30.0 / t_fused, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
