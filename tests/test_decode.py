"""Decode-loop tests on a miniature random-weight Whisper.

A random model can't transcribe, but the search machinery is fully checkable:
shape/dtype contracts, EOT padding, suppression masks, determinism, beam
score dominance over greedy, and language-ID restriction to the language
token block.
"""

import numpy as np
import pytest

from whisperx_tpu.decode.engine import WhisperEngine
from whisperx_tpu.decode.search import SearchOptions
from whisperx_tpu.decode.tokenizer import WhisperTokenizer, token_layout
from whisperx_tpu.models.configs import TEST_CONFIG
from whisperx_tpu.models.whisper import init_whisper_params


@pytest.fixture(scope="module")
def engine_and_params():
    model, params = init_whisper_params(TEST_CONFIG, seed=0)
    tokenizer = WhisperTokenizer.dummy(TEST_CONFIG.n_vocab, language="en")
    return WhisperEngine(model, tokenizer), params


def _mel(batch, rng=None):
    rng = rng or np.random.default_rng(1)
    return rng.standard_normal((batch, 80, 3000)).astype(np.float32) * 0.5


def test_token_layout_multilingual():
    layout = token_layout(51865)
    assert layout.eot == 50257
    assert layout.sot == 50258
    assert layout.language_token("en") == 50259
    assert layout.transcribe == 50359
    assert layout.translate == 50358
    assert layout.sot_prev == 50361
    assert layout.no_speech == 50362
    assert layout.no_timestamps == 50363
    assert layout.timestamp_begin == 50364
    assert layout.timestamp_begin + 1500 == 51864  # 30s of 20ms steps


def test_token_layout_v3():
    layout = token_layout(51866)
    assert layout.num_languages == 100
    assert layout.timestamp_begin == 50365


def test_token_layout_english():
    layout = token_layout(51864)
    assert layout.eot == 50256
    assert layout.timestamp_begin == 50363


def test_sot_sequence():
    tok = WhisperTokenizer.dummy(51865, language="fr", task="translate")
    layout = tok.layout
    assert tok.sot_sequence() == [
        layout.sot,
        layout.language_token("fr"),
        layout.translate,
        layout.no_timestamps,
    ]
    tok_en_only = WhisperTokenizer.dummy(51864)
    assert tok_en_only.sot_sequence() == [50257, tok_en_only.layout.no_timestamps]


def test_greedy_decode_shapes(engine_and_params):
    engine, params = engine_and_params
    opts = engine.build_options(beam_size=1, max_new_tokens=8)
    result = engine.generate(params, _mel(2), options=opts)
    assert result.tokens.shape == (2, 8)
    assert result.sum_logprobs.shape == (2,)
    assert (result.lengths >= 1).all()
    # Suppressed/banned tokens never appear.
    layout = engine.tokenizer.layout
    assert not np.isin(result.tokens, [layout.sot, layout.no_timestamps]).any()
    assert (result.tokens < layout.timestamp_begin).all()


def test_greedy_deterministic(engine_and_params):
    engine, params = engine_and_params
    opts = engine.build_options(beam_size=1, max_new_tokens=8)
    mel = _mel(2)
    a = engine.generate(params, mel, options=opts)
    b = engine.generate(params, mel, options=opts)
    np.testing.assert_array_equal(a.tokens, b.tokens)


def test_beam_decode_runs_and_dominates_greedy(engine_and_params):
    engine, params = engine_and_params
    mel = _mel(2)
    greedy = engine.generate(params, mel, options=engine.build_options(beam_size=1, max_new_tokens=8))
    beam = engine.generate(params, mel, options=engine.build_options(beam_size=3, max_new_tokens=8))
    assert beam.tokens.shape == (2, 8)
    # Beam search maximizes cumulative logprob: it can only match or beat
    # greedy's sequence score (same suppression, same length cap).
    assert (beam.sum_logprobs >= greedy.sum_logprobs - 1e-3).all()


def test_beam_topk_approx_matches_exact(engine_and_params):
    # approx_max_k at recall_target=1.0 is exact — the beam must pick the
    # identical candidates (tokens AND scores) as lax.top_k.
    import dataclasses

    engine, params = engine_and_params
    mel = _mel(2)
    opts = engine.build_options(beam_size=3, max_new_tokens=8)
    exact = engine.generate(params, mel, options=dataclasses.replace(opts, topk="exact"))
    approx = engine.generate(params, mel, options=dataclasses.replace(opts, topk="approx"))
    assert (np.asarray(exact.tokens) == np.asarray(approx.tokens)).all()
    np.testing.assert_allclose(
        np.asarray(exact.sum_logprobs), np.asarray(approx.sum_logprobs), rtol=1e-6
    )


def test_eot_padding_after_finish(engine_and_params):
    engine, params = engine_and_params
    opts = engine.build_options(beam_size=1, max_new_tokens=8)
    result = engine.generate(params, _mel(1), options=opts)
    eot = engine.tokenizer.eot
    row = result.tokens[0]
    seen_eot = False
    for t in row:
        if seen_eot:
            assert t == eot
        if t == eot:
            seen_eot = True


def test_detect_language(engine_and_params):
    engine, params = engine_and_params
    langs = engine.detect_language(params, _mel(2))
    assert len(langs) == 2
    for code, prob in langs:
        assert isinstance(code, str) and len(code) >= 2
        assert 0.0 <= prob <= 1.0


def test_sampling_with_temperature(engine_and_params):
    import jax

    engine, params = engine_and_params
    opts = engine.build_options(beam_size=1, max_new_tokens=8, temperature=0.8)
    mel = _mel(1)
    a = engine.generate(params, mel, options=opts, rng=jax.random.PRNGKey(0))
    b = engine.generate(params, mel, options=opts, rng=jax.random.PRNGKey(1))
    # Different seeds should (overwhelmingly) sample different sequences.
    assert a.tokens.shape == b.tokens.shape


def test_int8_kv_cache_close_to_bf16(engine_and_params):
    """int8-quantized KV cache must track the full-precision decode."""
    engine, params = engine_and_params
    mel = _mel(2)
    full = engine.generate(
        params, mel, options=engine.build_options(beam_size=1, max_new_tokens=8)
    )
    quant = engine.generate(
        params, mel,
        options=engine.build_options(beam_size=1, max_new_tokens=8, kv_cache_dtype="int8"),
    )
    assert quant.tokens.shape == full.tokens.shape
    # Random tiny models have near-flat logits, so exact token agreement is
    # not guaranteed — but scores must stay close.
    assert np.all(np.isfinite(quant.sum_logprobs))
    agree = (quant.tokens == full.tokens).mean()
    assert agree > 0.5


def test_int8_kv_beam_runs(engine_and_params):
    engine, params = engine_and_params
    mel = _mel(2)
    out = engine.generate(
        params, mel,
        options=engine.build_options(beam_size=3, max_new_tokens=6, kv_cache_dtype="int8"),
    )
    assert out.tokens.shape == (2, 6)


def test_engine_jit_cache_shared_across_instances(engine_and_params):
    """A fresh engine with the same model + token layout must HIT the jit
    cache (the pipeline builds a new engine per transcribe call; identity
    hashing would recompile — minutes each through a TPU relay)."""
    from whisperx_tpu.decode.engine import WhisperEngine
    from whisperx_tpu.decode.tokenizer import WhisperTokenizer

    engine, params = engine_and_params
    mel = _mel(2)
    opts = engine.build_options(beam_size=2, max_new_tokens=4)
    engine.generate(params, mel, options=opts)
    size_before = WhisperEngine.decode_beam._cache_size()

    fresh_tok = WhisperTokenizer.dummy(engine.config.n_vocab, language="en")
    fresh = WhisperEngine(engine.model, fresh_tok)
    assert fresh == engine and hash(fresh) == hash(engine)
    fresh.generate(params, mel, options=opts)
    assert WhisperEngine.decode_beam._cache_size() == size_before


def test_beam_reorder_impls_agree(monkeypatch):
    """WHISPERX_REORDER=onehot (MXU permutation matmul) and =take (gather)
    must produce identical beam decodes, with and without the lax.cond
    identity bypass (WHISPERX_REORDER_COND)."""
    import jax.numpy as jnp
    import numpy as np

    from whisperx_tpu.decode.engine import WhisperEngine
    from whisperx_tpu.decode.tokenizer import WhisperTokenizer
    from whisperx_tpu.models.configs import TEST_CONFIG
    from whisperx_tpu.models.whisper import init_whisper_params

    model, params = init_whisper_params(TEST_CONFIG, seed=0)
    tok = WhisperTokenizer.dummy(TEST_CONFIG.n_vocab, language="en")

    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((2, TEST_CONFIG.n_mels, 3000)), jnp.float32)

    outs = {}
    for reorder, cond in (("take", "1"), ("take", "0"), ("onehot", "0"), ("onehot", "1")):
        monkeypatch.setenv("WHISPERX_REORDER", reorder)
        monkeypatch.setenv("WHISPERX_REORDER_COND", cond)
        engine = WhisperEngine(model, tok)  # fresh engine: fresh jit cache key
        opts = engine.build_options(beam_size=3, max_new_tokens=6)
        import dataclasses

        # distinct static opts per variant so the jit cache cannot alias
        opts = dataclasses.replace(opts, patience=1.0 + 0.0001 * len(outs))
        res = engine.generate(params, mel, options=opts)
        outs[(reorder, cond)] = np.asarray(res.tokens)

    base = outs[("take", "1")]
    for key, toks in outs.items():
        np.testing.assert_array_equal(base, toks, err_msg=str(key))


def test_beam_history_impls_agree(monkeypatch):
    """WHISPERX_BEAM_HISTORY=backptr (parent-pointer tables + one
    end-of-decode reconstruction scan) must decode identically to =gather
    (full per-step token-buffer reorders) across patience and length-penalty
    regimes — including the alive-fallback path (EOT banned)."""
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from whisperx_tpu.decode.engine import WhisperEngine
    from whisperx_tpu.decode.tokenizer import WhisperTokenizer
    from whisperx_tpu.models.configs import TEST_CONFIG
    from whisperx_tpu.models.whisper import init_whisper_params

    model, params = init_whisper_params(TEST_CONFIG, seed=0)
    tok = WhisperTokenizer.dummy(TEST_CONFIG.n_vocab, language="en")

    rng = np.random.default_rng(1)
    mel = jnp.asarray(rng.standard_normal((2, TEST_CONFIG.n_mels, 3000)), jnp.float32)

    scenarios = [
        {"patience": 1.0, "length_penalty": 1.0},
        {"patience": 2.0, "length_penalty": 0.5},
    ]
    for sc_idx, sc in enumerate(scenarios):
        outs = {}
        for impl in ("gather", "backptr"):
            monkeypatch.setenv("WHISPERX_BEAM_HISTORY", impl)
            engine = WhisperEngine(model, tok)
            opts = engine.build_options(beam_size=3, max_new_tokens=6, **sc)
            # distinct static opts per impl so the jit cache cannot alias
            opts = dataclasses.replace(
                opts, patience=sc["patience"] + 0.0001 * (len(outs) + 2 * sc_idx)
            )
            res = engine.generate(params, mel, options=opts)
            outs[impl] = (np.asarray(res.tokens), np.asarray(res.sum_logprobs))
        np.testing.assert_array_equal(outs["gather"][0], outs["backptr"][0], err_msg=str(sc))
        np.testing.assert_allclose(outs["gather"][1], outs["backptr"][1], rtol=1e-6)

    # Alive-fallback regime: EOT banned, nothing ever finishes.
    outs = {}
    for impl in ("gather", "backptr"):
        monkeypatch.setenv("WHISPERX_BEAM_HISTORY", impl)
        engine = WhisperEngine(model, tok)
        opts = engine.build_options(beam_size=3, max_new_tokens=6)
        opts = dataclasses.replace(
            opts,
            banned_tokens=opts.banned_tokens + (opts.eot,),
            patience=1.0 + 0.0001 * (len(outs) + 10),
        )
        res = engine.generate(params, mel, options=opts)
        outs[impl] = np.asarray(res.tokens)
    np.testing.assert_array_equal(outs["gather"], outs["backptr"])


def test_prefix_reorder_matches_full_gather(monkeypatch):
    """The prefix-bounded cache reorder (WHISPERX_REORDER_PREFIX buckets)
    must produce bit-identical beam output to the full-buffer gather —
    unwritten rows are zero in every lane, so skipping them is exact."""
    import jax.numpy as jnp

    from whisperx_tpu.decode.engine import WhisperEngine
    from whisperx_tpu.decode.tokenizer import WhisperTokenizer
    from whisperx_tpu.models.configs import TEST_CONFIG
    from whisperx_tpu.models.whisper import init_whisper_params

    model, params = init_whisper_params(TEST_CONFIG, seed=0)
    rng = np.random.default_rng(7)
    mel = rng.standard_normal((3, 80, 3000)).astype(np.float32) * 0.5

    def run():
        # Fresh engine per run: the env knob is read at TRACE time, and the
        # jit cache keys on the engine instance — reusing one engine would
        # silently reuse the first compile and make the A/B vacuous.
        engine = WhisperEngine(
            model, WhisperTokenizer.dummy(TEST_CONFIG.n_vocab, language="en")
        )
        opts = engine.build_options(beam_size=3, max_new_tokens=8)
        return engine.generate(params, mel, options=opts)

    monkeypatch.setenv("WHISPERX_REORDER_PREFIX", "0")  # full gather
    full = run()
    monkeypatch.setenv("WHISPERX_REORDER_PREFIX", "32")
    bucketed = run()
    monkeypatch.setenv("WHISPERX_REORDER_PREFIX", "16")
    fine = run()
    np.testing.assert_array_equal(full.tokens, bucketed.tokens)
    np.testing.assert_array_equal(full.tokens, fine.tokens)
    np.testing.assert_allclose(full.sum_logprobs, bucketed.sum_logprobs, atol=1e-5)
    np.testing.assert_allclose(full.sum_logprobs, fine.sum_logprobs, atol=1e-5)
