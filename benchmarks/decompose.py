"""Stage-timing decomposition for the flagship decode path.

Times, separately and end-to-end on the available accelerator:
  mel      — log-mel front-end
  encode   — audio encoder forward
  prompt   — cross-KV precompute + prompt ingestion
  full     — the whole jit'd beam decode program (bench.py's measurement)

Deriving per-decode-step cost as (full - encode-ish fixed work) / steps.
Prints one JSON object. Uses the same knobs as bench.py (BENCH_MODEL,
BENCH_BATCH, BENCH_BEAM, BENCH_MAX_NEW, BENCH_KV, BENCH_QUANT).

Each timed fn is its own jit program; first call (compile) excluded.
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
    import jax
    import jax.numpy as jnp

    from bench import build_bench_engine
    from whisperx_tpu.audio import N_SAMPLES, log_mel_spectrogram
    from whisperx_tpu.models.whisper import Whisper

    engine, params, opts, cfg, knobs = build_bench_engine()
    model = engine.model
    model_name, batch = knobs["model_name"], knobs["batch"]
    beam, max_new, kv, quant = knobs["beam"], knobs["max_new"], knobs["kv"], knobs["quant"]

    rng = np.random.default_rng(0)
    audio = jnp.asarray((rng.standard_normal((batch, N_SAMPLES)) * 0.1), jnp.float32)

    mel_fn = jax.jit(lambda a: log_mel_spectrogram(a, n_mels=cfg.n_mels).astype(jnp.bfloat16))
    t_mel = timed(mel_fn, audio)
    mel = mel_fn(audio)

    enc_fn = jax.jit(lambda p, m: model.apply({"params": p}, m, method=Whisper.encode))
    t_enc = timed(enc_fn, params, mel)

    prompt = engine.build_prompt(batch)

    def prompt_fn(p, m, pt):
        states = model.apply({"params": p}, m, method=Whisper.encode)
        logits, cache, nsp = engine._prompt_cache(
            p, states, pt, engine._cache_len(pt.shape[1], opts), kv_int8=kv == "int8"
        )
        return logits

    t_enc_prompt = timed(jax.jit(prompt_fn), params, mel, prompt)

    def full_fn(p, m, pt):
        return engine.decode_beam(p, m, pt, opts)

    t_full = timed(full_fn, params, mel, prompt)

    steps = max_new
    decode_total = t_full - t_enc_prompt
    out = {
        "model": model_name,
        "batch": batch,
        "beam": beam,
        "max_new": max_new,
        "kv": kv,
        "quant": quant or "bf16",
        "t_mel_s": round(t_mel, 4),
        "t_encode_s": round(t_enc, 4),
        "t_encode_plus_prompt_s": round(t_enc_prompt, 4),
        "t_full_s": round(t_full, 4),
        "decode_loop_s": round(decode_total, 4),
        "ms_per_step": round(1e3 * decode_total / steps, 3),
        "audio_x_realtime": round(batch * 30.0 / t_full, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
