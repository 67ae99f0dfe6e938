"""End-to-end pipeline tests on the miniature random-weight model.

A random model produces garbage text, but the full path — VAD chunking,
fixed-batch packing, feature extraction, jit'd decode, segment assembly, lazy
tokenizer semantics — is exercised and contract-checked.
"""

import numpy as np
import pytest

from whisperx_tpu.pipeline.asr import load_test_pipeline

SR = 16000


def _speechy_audio(seconds=4.0, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * SR)) / SR
    am = 1 + 0.5 * np.sin(2 * np.pi * 3.1 * t)
    audio = 0.3 * np.sin(2 * np.pi * 210 * t) * am
    audio += 0.05 * rng.standard_normal(len(t))
    # surround with silence
    pad = np.zeros(SR // 2, np.float32)
    return np.concatenate([pad, audio.astype(np.float32), pad])


def test_transcribe_end_to_end():
    pipeline = load_test_pipeline(language="en")
    audio = _speechy_audio()
    result = pipeline.transcribe(audio, batch_size=2)
    assert result["language"] == "en"
    assert len(result["segments"]) >= 1
    for seg in result["segments"]:
        assert 0.0 <= seg["start"] < seg["end"] <= len(audio) / SR + 0.1
        assert isinstance(seg["text"], str)


def test_transcribe_empty_audio():
    pipeline = load_test_pipeline(language="en")
    result = pipeline.transcribe(np.zeros(SR, np.float32), batch_size=2)
    assert result["segments"] == []


def test_transcribe_batch_padding_consistency():
    """3 chunks at batch_size 2 → padded final batch must not distort output."""
    pipeline = load_test_pipeline(language="en")
    # three separate speech islands → three VAD chunks
    islands = [_speechy_audio(2.0, seed=s) for s in range(3)]
    gap = np.zeros(3 * SR, np.float32)
    audio = np.concatenate([islands[0], gap, islands[1], gap, islands[2]])
    # chunk_size=5 keeps each island in its own chunk (at 30 they'd all pack
    # into one window — the merge contract).
    r2 = pipeline.transcribe(audio, batch_size=2, chunk_size=5)
    r4 = pipeline.transcribe(audio, batch_size=4, chunk_size=5)
    texts2 = [(s["text"], s["start"]) for s in r2["segments"]]
    texts4 = [(s["text"], s["start"]) for s in r4["segments"]]
    assert texts2 == texts4
    assert len(texts2) >= 2


def test_multilingual_language_detection_resets():
    pipeline = load_test_pipeline(language=None)
    audio = _speechy_audio(2.0)
    result = pipeline.transcribe(audio, batch_size=2)
    assert isinstance(result["language"], str)
    # multilingual mode resets tokenizer after each call (reference parity)
    assert pipeline.tokenizer is None


def test_language_override():
    pipeline = load_test_pipeline(language=None)
    audio = _speechy_audio(2.0)
    result = pipeline.transcribe(audio, batch_size=2, language="fr", task="transcribe")
    assert result["language"] == "fr"


def test_detect_language_returns_code():
    pipeline = load_test_pipeline(language="en")
    lang = pipeline.detect_language(_speechy_audio(1.0))
    from whisperx_tpu.io.languages import LANGUAGES

    assert lang in LANGUAGES


def test_public_api_surface():
    import whisperx_tpu

    for name in [
        "load_model",
        "load_audio",
        "align",
        "load_align_model",
        "assign_word_speakers",
        "DiarizationPipeline",
    ]:
        assert hasattr(whisperx_tpu, name)


def test_suppress_numerals_masks_digit_tokens():
    """suppress_numerals adds digit/currency tokens to the static suppress
    mask (reference asr.py:207-213, find_numeral_symbol_tokens asr.py:16-23)."""
    from whisperx_tpu.pipeline.asr import load_test_pipeline, numeral_symbol_tokens

    p = load_test_pipeline(language="en", beam_size=1)
    p.suppress_numerals = True
    tok = p._make_tokenizer("en", "transcribe")
    opts, _ = p._search_options(tok)
    numerals = numeral_symbol_tokens(tok)
    assert numerals, "dummy tokenizer should expose numeral pieces"
    assert set(numerals) <= set(opts.suppress_tokens)
    # And without the flag they are absent.
    p.suppress_numerals = False
    opts2, _ = p._search_options(tok)
    assert not (set(numerals) & set(opts2.suppress_tokens))


def test_unimplemented_decode_knobs_raise():
    """repetition_penalty / no_repeat_ngram_size are accepted by the options
    surface (reference flag parity) but not implemented in the batched path —
    they must raise, not silently no-op (the reference's batched path ignores
    them too, whisperx/asr.py:53-62)."""
    import dataclasses

    import pytest

    audio = np.zeros(16000, np.float32)
    p = load_test_pipeline(language="en", beam_size=1)
    p.options = dataclasses.replace(p.options, repetition_penalty=1.2)
    with pytest.raises(NotImplementedError, match="repetition_penalty"):
        p.transcribe(audio, batch_size=2)
    p.options = dataclasses.replace(p.options, repetition_penalty=1.0, no_repeat_ngram_size=3)
    with pytest.raises(NotImplementedError, match="no_repeat_ngram_size"):
        p.transcribe(audio, batch_size=2)


def test_prefix_option_reaches_engine(monkeypatch):
    """options.prefix must thread into engine.generate (reference asr.py:44);
    r4 accepted the field and silently dropped it."""
    import dataclasses

    p = load_test_pipeline(language="en", beam_size=1)
    p.options = dataclasses.replace(p.options, prefix="the quick")
    seen = {}
    rng = np.random.default_rng(0)
    audio = (0.3 * np.sin(np.arange(3 * 16000) / 16000 * 2 * np.pi * 220)).astype(np.float32)
    audio += 0.01 * rng.standard_normal(len(audio)).astype(np.float32)

    from whisperx_tpu.decode.engine import WhisperEngine

    orig = WhisperEngine.generate

    def spy(self, params, mel, **kw):
        seen["prefix"] = kw.get("prefix")
        return orig(self, params, mel, **kw)

    monkeypatch.setattr(WhisperEngine, "generate", spy)
    p.transcribe(audio, batch_size=2)
    assert seen.get("prefix") == "the quick"


def test_pipeline_kv_cache_dtype_threads_to_search_options():
    """WhisperPipeline(kv_cache_dtype=...) must reach the decode SearchOptions
    (load_model 'auto' pairs int8 weights with the int8 KV cache); the r4
    production path silently ran bf16 KV regardless of compute_type."""
    p = load_test_pipeline(language="en", beam_size=2)
    p.kv_cache_dtype = "int8"
    opts, _ = p._search_options(p.tokenizer)
    assert opts.kv_cache_dtype == "int8"
    # Burst audio so VAD yields chunks and the int8-KV decode actually runs.
    sr = 16000
    t = np.arange(3 * sr) / sr
    audio = np.zeros(6 * sr, np.float32)
    audio[sr : 4 * sr] = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    out = p.transcribe(audio, batch_size=2)
    assert len(out["segments"]) >= 1
