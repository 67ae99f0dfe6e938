"""Parity tests for the fused Pallas decode cross-attention kernel.

Runs the kernel in interpret mode on CPU against the exact math of the XLA
einsum path (models/whisper.py MultiHeadAttention): int8 K/V with
per-(token, head) scales commuted into the logits/weights epilogues, and
the bf16 path with unit scales.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from whisperx_tpu.models.whisper import flat_cross_kv, quantize_kv
from whisperx_tpu.ops.pallas_cross_attn import cross_attention_decode


def _reference(q, k, v, ks, vs):
    """q (B,G,H,Dh) fp32 pre-scaled by 1/sqrt(Dh); k/v int8-or-fp (B,S,H,Dh);
    ks/vs (B,S,H,1) fp32."""
    logits = np.einsum("bghd,bshd->bhgs", q, k.astype(np.float32))
    logits = logits * ks[..., 0].transpose(0, 2, 1)[:, :, None, :]
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    w = w * vs[..., 0].transpose(0, 2, 1)[:, :, None, :]
    return np.einsum("bhgs,bshd->bghd", w, v.astype(np.float32))


@pytest.mark.parametrize("kv_int8", [True, False])
def test_kernel_matches_einsum_math(kv_int8):
    B, S, H, Dh, G = 2, 96, 4, 64, 5
    D = H * Dh
    rng = np.random.default_rng(0)
    q = (rng.standard_normal((B, G, H, Dh)) * 0.4).astype(np.float32) * (Dh**-0.5)
    k = (rng.standard_normal((B, S, H, Dh)) * 0.8).astype(np.float32)
    v = rng.standard_normal((B, S, H, Dh)).astype(np.float32)

    kb = jnp.asarray(k, jnp.bfloat16)
    vb = jnp.asarray(v, jnp.bfloat16)
    if kv_int8:
        qk, ks = quantize_kv(kb)
        qv, vs = quantize_kv(vb)
        want = _reference(q, np.asarray(qk), np.asarray(qv), np.asarray(ks), np.asarray(vs))
    else:
        ones = np.ones((B, S, H, 1), np.float32)
        want = _reference(
            q, np.asarray(kb, np.float32), np.asarray(vb, np.float32), ones, ones
        )

    fkv = flat_cross_kv(kb, vb, kv_int8)
    got = cross_attention_decode(
        jnp.asarray(q.reshape(B, G, D), jnp.bfloat16),
        fkv.k,
        fkv.v,
        fkv.k_scale,
        fkv.v_scale,
        interpret=True,
    )
    got = np.asarray(got).reshape(B, G, H, Dh)
    # bf16 inputs (q and, in the fp path, K/V) bound the tolerance.
    np.testing.assert_allclose(got, want, atol=0.04, rtol=0.04)


def test_flat_cross_kv_layouts():
    B, S, H, Dh = 2, 16, 4, 64
    rng = np.random.default_rng(1)
    k = jnp.asarray(rng.standard_normal((B, S, H, Dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, H, Dh)), jnp.float32)
    fkv = flat_cross_kv(k, v, kv_int8=True)
    assert fkv.k.shape == (B, S, H * Dh) and fkv.k.dtype == jnp.int8
    assert fkv.k_scale.shape == (B, H, S) and fkv.k_scale.dtype == jnp.float32
    # Dequantized flat values must reproduce the (B,S,H,Dh) originals.
    deq = np.asarray(fkv.k, np.float32).reshape(B, S, H, Dh) * np.asarray(
        fkv.k_scale
    ).transpose(0, 2, 1)[:, :, :, None]
    np.testing.assert_allclose(deq, np.asarray(k), atol=0.02)


def test_engine_pallas_cross_matches_xla(monkeypatch):
    """Full beam decode with the fused cross kernel (interpret mode on CPU)
    must reproduce the XLA einsum path token-for-token."""
    import dataclasses

    import jax.numpy as jnp

    from whisperx_tpu.decode.engine import WhisperEngine
    from whisperx_tpu.decode.tokenizer import WhisperTokenizer
    from whisperx_tpu.models.configs import TEST_CONFIG
    from whisperx_tpu.models.whisper import init_whisper_params

    cfg = dataclasses.replace(TEST_CONFIG, n_text_state=128, n_audio_state=128, n_text_head=2, n_audio_head=2)
    model, params = init_whisper_params(cfg, seed=0, dtype=jnp.float32)
    tok = WhisperTokenizer.dummy(cfg.n_vocab, language="en")
    engine = WhisperEngine(model, tok)
    rng = np.random.default_rng(2)
    mel = jnp.asarray(rng.standard_normal((2, cfg.n_mels, 3000)) * 0.1, jnp.float32)

    opts = engine.build_options(beam_size=2, max_new_tokens=6, kv_cache_dtype="int8")
    monkeypatch.setenv("WHISPERX_CROSS_ATTN", "xla")
    res_xla = engine.generate(params, mel, options=opts)
    monkeypatch.setenv("WHISPERX_CROSS_ATTN", "pallas")
    res_pl = engine.generate(
        params, mel, options=dataclasses.replace(opts, cross_attn="pallas")
    )
    np.testing.assert_array_equal(res_xla.tokens, res_pl.tokens)
    np.testing.assert_allclose(res_xla.sum_logprobs, res_pl.sum_logprobs, atol=2e-2)
