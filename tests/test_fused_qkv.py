"""Fused-QKV parity: one (D,3D) projection must match separate q/k/v exactly.

Covers fp and int8 weight-only trees, teacher-forced forward and the full
beam decode (token-level equality), since the fusion only reorders matmul
columns — any numeric drift means the slicing/concat order is wrong.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from whisperx_tpu.decode.engine import WhisperEngine
from whisperx_tpu.decode.tokenizer import WhisperTokenizer
from whisperx_tpu.models.configs import TEST_CONFIG
from whisperx_tpu.models.whisper import (
    Whisper,
    fuse_whisper_qkv,
    init_whisper_params,
    quantize_whisper,
)


@pytest.fixture(scope="module")
def base():
    model, params = init_whisper_params(TEST_CONFIG, seed=0, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((2, TEST_CONFIG.n_mels, 3000)) * 0.1, jnp.float32)
    tokens = jnp.asarray(rng.integers(0, 1000, (2, 6)), jnp.int32)
    return model, params, mel, tokens


def test_fused_forward_matches(base):
    model, params, mel, tokens = base
    want = model.apply({"params": params}, mel, tokens)
    fmodel, fparams = fuse_whisper_qkv(model, params)
    got = fmodel.apply({"params": fparams}, mel, tokens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4)


def test_fused_int8_beam_decode_matches(base):
    model, params, mel, _ = base
    qmodel, qparams = quantize_whisper(model, params)
    fmodel, fparams = fuse_whisper_qkv(qmodel, qparams)

    tok = WhisperTokenizer.dummy(TEST_CONFIG.n_vocab, language="en")
    opts_kw = dict(beam_size=2, max_new_tokens=8, kv_cache_dtype="int8")

    eng_a = WhisperEngine(qmodel, tok)
    res_a = eng_a.generate(qparams, mel, options=eng_a.build_options(**opts_kw))
    eng_b = WhisperEngine(fmodel, tok)
    res_b = eng_b.generate(fparams, mel, options=eng_b.build_options(**opts_kw))

    np.testing.assert_array_equal(res_a.tokens, res_b.tokens)
    np.testing.assert_allclose(res_a.sum_logprobs, res_b.sum_logprobs, atol=1e-3)
