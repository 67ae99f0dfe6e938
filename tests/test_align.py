"""Aligner tests: rigged-emission timestamp recovery + fallback contracts."""

import numpy as np
import pytest

from whisperx_tpu.align.alignment import AlignModel, align, test_align_model

SR = 16000

CHARS = ["[pad]", "|", "'"] + [chr(c) for c in range(ord("a"), ord("z") + 1)]
DICT = {c: i for i, c in enumerate(CHARS)}
V = len(CHARS)


class RiggedW2V:
    """Fake wav2vec2 producing emissions peaked on a planted char sequence.

    The planted alignment spreads the segment's tokens uniformly over frames
    with blanks in between, so recovered word times are proportional spans.
    """

    def __init__(self, token_plan):
        self.token_plan = token_plan  # list per batch row: list[int] tokens

    def apply(self, variables, audio, sample_lengths=None):
        import jax.numpy as jnp

        B, T = audio.shape
        frames = (T - 400) // 320 + 1
        out = np.full((B, frames, V), -10.0, np.float32)
        for b in range(B):
            # Rows beyond the plan are batch padding (fixed-shape batches):
            # pure blank emissions.
            toks = self.token_plan[b] if b < len(self.token_plan) else []
            n = len(toks)
            if n == 0:
                out[b, :, 0] = -0.01
                continue
            # token k peaked at frame round((k+0.5)/n * frames), blank elsewhere
            out[b, :, 0] = -0.01
            for k, tok in enumerate(toks):
                f = int((k + 0.5) / n * (frames - 1))
                out[b, f, 0] = -10.0
                out[b, f, tok] = -0.01
        return jnp.asarray(out)

    def feature_lengths(self, sample_lengths):
        return (sample_lengths - 400) // 320 + 1


def _metadata(dictionary=DICT, lang="en"):
    return {"language": lang, "dictionary": dictionary, "type": "jax"}


def test_align_recovers_planted_times():
    text = " hello world"
    clean = "hello|world"
    tokens = [DICT[c] for c in clean]
    model = AlignModel(RiggedW2V([tokens]), {}, DICT, "en", blank_id=0)

    audio = np.zeros(4 * SR, np.float32)
    transcript = [{"start": 0.5, "end": 3.5, "text": text}]
    result = align(transcript, model, _metadata(), audio)

    assert len(result["segments"]) == 1
    seg = result["segments"][0]
    words = seg["words"]
    assert [w["word"] for w in words] == ["hello", "world"]
    w0, w1 = words
    # planted: "hello" in the first half of [0.5, 3.5], "world" second half
    assert 0.4 <= w0["start"] < w0["end"] <= 2.2
    assert 1.8 <= w1["start"] < w1["end"] <= 3.6
    assert w0["end"] <= w1["start"] + 0.2
    assert result["word_segments"] == words


def test_align_sentences_split():
    text = " Good day. Nice cat."
    clean_chars = [c.lower().replace(" ", "|") for c in text.strip()]
    tokens = [DICT[c] for c in clean_chars if c in DICT]
    model = AlignModel(RiggedW2V([tokens]), {}, DICT, "en", blank_id=0)
    audio = np.zeros(4 * SR, np.float32)
    result = align([{"start": 0.0, "end": 4.0, "text": text}], model, _metadata(), audio)
    # Punkt splits into two sentences → two aligned subsegments
    assert len(result["segments"]) == 2
    assert result["segments"][0]["text"].strip().startswith("Good")
    assert result["segments"][1]["text"].strip().startswith("Nice")
    assert result["segments"][0]["end"] <= result["segments"][1]["start"] + 0.5


def test_align_fallback_no_dictionary_chars():
    model = AlignModel(RiggedW2V([[1]]), {}, DICT, "en", blank_id=0)
    audio = np.zeros(SR, np.float32)
    # no spaces either: nothing maps into the model dictionary
    transcript = [{"start": 0.0, "end": 0.9, "text": "123456"}]
    result = align(transcript, model, _metadata(), audio)
    seg = result["segments"][0]
    assert seg["words"] == []
    assert seg["start"] == 0.0 and seg["end"] == 0.9


def test_align_fallback_start_beyond_audio():
    model = AlignModel(RiggedW2V([[1]]), {}, DICT, "en", blank_id=0)
    audio = np.zeros(SR, np.float32)  # 1s
    transcript = [{"start": 5.0, "end": 6.0, "text": " hello"}]
    result = align(transcript, model, _metadata(), audio)
    assert result["segments"][0]["words"] == []


def test_align_char_level_output():
    text = " hi"
    tokens = [DICT["h"], DICT["i"]]
    model = AlignModel(RiggedW2V([tokens]), {}, DICT, "en", blank_id=0)
    audio = np.zeros(2 * SR, np.float32)
    result = align(
        [{"start": 0.0, "end": 2.0, "text": text}],
        model,
        _metadata(),
        audio,
        return_char_alignments=True,
    )
    seg = result["segments"][0]
    assert "chars" in seg
    timed = [c for c in seg["chars"] if "start" in c]
    assert len(timed) == 2


def test_align_with_random_wav2vec2_smoke():
    """Full plumbing through the real (random-weight) JAX wav2vec2."""
    model = test_align_model("en")
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(3 * SR) * 0.1).astype(np.float32)
    transcript = [
        {"start": 0.1, "end": 1.4, "text": " hello there"},
        {"start": 1.5, "end": 2.8, "text": " general kenobi"},
    ]
    meta = {"language": "en", "dictionary": model.dictionary, "type": "jax"}
    result = align(transcript, model, meta, audio)
    assert len(result["segments"]) >= 2
    for seg in result["segments"]:
        for w in seg["words"]:
            if "start" in w and "end" in w:
                assert 0.0 <= w["start"] <= w["end"] <= 3.0 + 0.1


def test_align_begin_deferred_matches_sync():
    """align_begin + interleaved device work + finish() == synchronous align.

    The deferred handle exists so callers overlap align host post-processing
    with the next decode dispatch (no reference counterpart; the reference
    aligns serially, whisperx/alignment.py:174). finish() must be idempotent
    and the result identical to align()'s."""
    import jax.numpy as jnp

    from whisperx_tpu.align.alignment import align_begin

    model = test_align_model("en")
    rng = np.random.default_rng(1)
    audio = (rng.standard_normal(3 * SR) * 0.1).astype(np.float32)
    transcript = [
        {"start": 0.1, "end": 1.4, "text": " hello there"},
        {"start": 1.5, "end": 2.8, "text": " general kenobi"},
    ]
    meta = {"language": "en", "dictionary": model.dictionary, "type": "jax"}
    sync = align([dict(s) for s in transcript], model, meta, audio)

    job = align_begin([dict(s) for s in transcript], model, meta, audio)
    # Unrelated device work dispatched between begin and finish (the overlap
    # the handle is for) must not perturb the result.
    _ = jnp.dot(jnp.ones((64, 64)), jnp.ones((64, 64))).block_until_ready()
    deferred = job.finish()
    assert deferred == sync
    assert job.finish() is deferred  # idempotent


def test_align_begin_multibatch_deferred():
    """Deferred path with more segments than max_batch: every pending batch
    must be consumed in dispatch order at finish() and match sync align."""
    from whisperx_tpu.align.alignment import align_begin

    model = test_align_model("en")
    model.max_batch = 2  # 5 alignable segments -> 3 dispatched batches
    rng = np.random.default_rng(2)
    audio = (rng.standard_normal(10 * SR) * 0.1).astype(np.float32)
    words = ["hello there", "general kenobi", "you are bold", "as expected",
             "the archives are complete"]
    transcript = [
        {"start": 2.0 * i + 0.1, "end": 2.0 * i + 1.9, "text": " " + w}
        for i, w in enumerate(words)
    ]
    meta = {"language": "en", "dictionary": model.dictionary, "type": "jax"}
    sync = align([dict(s) for s in transcript], model, meta, audio)
    deferred = align_begin([dict(s) for s in transcript], model, meta, audio).finish()
    assert deferred == sync


def test_align_bf16_compute_dtype():
    """bf16 wav2vec2 compute (TPU default) preserves alignment structure —
    emissions cast to fp32 before log-softmax (models/wav2vec2.py lm_head)."""
    import dataclasses

    import jax.numpy as jnp

    from whisperx_tpu.models.configs import WAV2VEC2_TEST
    from whisperx_tpu.models.wav2vec2 import Wav2Vec2ForCTC, init_wav2vec2_params

    fp_model, params = init_wav2vec2_params(WAV2VEC2_TEST, seed=0)
    bf_model = Wav2Vec2ForCTC(WAV2VEC2_TEST, dtype=jnp.bfloat16)
    chars = ["[pad]", "|", "'"] + [chr(c) for c in range(ord("a"), ord("z") + 1)]
    dictionary = {c: i for i, c in enumerate(chars)}
    model = AlignModel(bf_model, params, dictionary, "en", blank_id=0)

    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(2 * SR) * 0.1).astype(np.float32)
    transcript = [{"start": 0.1, "end": 1.8, "text": " hello world"}]
    result = align(transcript, model, _metadata(dictionary), audio)
    assert len(result["segments"]) == 1
    # Emissions must be fp32 at the head regardless of compute dtype.
    emissions = bf_model.apply({"params": params}, jnp.zeros((1, 4000), jnp.float32))
    assert emissions.dtype == jnp.float32


def test_sentence_spans_match_punkt_oracle():
    """Host splitter (align/sentences.py) vs nltk punkt — oracle only.

    nltk is a test dependency here, never a runtime one: the library path
    uses the pure-re splitter.
    """
    pytest.importorskip("nltk")
    from nltk.tokenize.punkt import PunktParameters, PunktSentenceTokenizer

    from whisperx_tpu.align.sentences import PUNKT_ABBREVIATIONS, sentence_spans

    params = PunktParameters()
    params.abbrev_types = set(PUNKT_ABBREVIATIONS)
    oracle = PunktSentenceTokenizer(params)

    cases = [
        "Hello world. How are you?",
        " Mr. Smith went to Washington. He was late.",
        "Dr. Jones said hi! Really? Yes.",
        "Wait... what happened next",
        "The value is 4.5 and rising. Done.",
        'He said "Stop." Then he left.',
        "J. Smith arrived. Prof. X too.",
        "no punctuation at all",
        "One sentence.",
        "Multiple!!! Exclamations?! Here.",
        "Ends mid ",
        "",
        "  leading spaces. And more.  ",
        "A vs. B was close. Final score 3.",
        "(Parens here.) [Also these.] Done!",
        "self-driving cars vs. humans. round two.",
        "lowercase after period. next one",
        "Number 5. follows.",
        "Number 5. Follows.",
        "U.S. troops moved. Then stopped.",
        "Done. ",
        "Done.  Next one here.",
        "It cost 3.50. Then more.",
        "He arrived at 5. Then left.",
        "Chapter 7. the end",
        "Mr. and Mrs. Smith. Done.",
        "stop.) Next.",
        "Hmm.. okay then.",
        "What?! Seriously?? yes.",
        "etc. and so on. Fine.",
        "price was 1,000. Cheap.",
        "room 101. next door",
        "the dog. 'quoted start' here.",
        "he said 'done.' then left.",
    ]
    for text in cases:
        assert sentence_spans(text) == list(oracle.span_tokenize(text)), text


def test_align_char_alignments_and_sentence_merge():
    """return_char_alignments emits per-char dicts; NaN-keyed sentences heal."""
    text = " hello world. more text."
    clean = "hello|world.|more|text."
    # '.' is not in DICT so it is skipped during cleaning.
    tokens = [DICT[c] for c in clean if c in DICT]
    model = AlignModel(RiggedW2V([tokens]), {}, DICT, "en", blank_id=0)
    out = align(
        [{"start": 0.0, "end": 2.0, "text": text}],
        model,
        _metadata(),
        np.zeros(2 * SR, np.float32),
        return_char_alignments=True,
    )
    assert out["segments"], "expected aligned output"
    for seg in out["segments"]:
        assert "chars" in seg
        for ch in seg["chars"]:
            assert "char" in ch
            for key in ("start", "end", "score"):
                if key in ch:
                    assert not np.isnan(ch[key])
        assert seg["start"] <= seg["end"]
    words = out["word_segments"]
    assert [w["word"] for w in words] == ["hello", "world.", "more", "text."]
    starts = [w["start"] for w in words if "start" in w]
    assert starts == sorted(starts)


def test_align_fused_device_matches_host_backtrack(monkeypatch):
    """The fused emissions+trellis+backtrack jit must reproduce the two-stage
    host-backtrack path exactly (same words, same timestamps)."""
    text = " hello world again"
    tokens = [DICT[c] for c in "hello|world|again"]
    segs = [{"start": 0.0, "end": 2.0, "text": text}]
    audio = np.zeros(2 * SR, np.float32)

    def run():
        model = AlignModel(RiggedW2V([tokens]), {}, DICT, "en", blank_id=0)
        return align([dict(s) for s in segs], model, _metadata(), audio)

    monkeypatch.setenv("WHISPERX_CTC_BACKTRACK", "host")
    host = run()
    monkeypatch.delenv("WHISPERX_CTC_BACKTRACK")
    fused = run()
    assert host["word_segments"] == fused["word_segments"]
    assert [s["text"] for s in host["segments"]] == [s["text"] for s in fused["segments"]]


def test_align_charwise_language():
    """ja/zh path: every character is its own word, no space→| mapping
    (reference alignment.py:22,142-145 semantics)."""
    text = "hello"
    tokens = [DICT[c] for c in text]
    model = AlignModel(RiggedW2V([tokens]), {}, DICT, "ja", blank_id=0)
    out = align(
        [{"start": 0.0, "end": 2.0, "text": text}],
        model,
        _metadata(lang="ja"),
        np.zeros(2 * SR, np.float32),
    )
    words = out["word_segments"]
    assert [w["word"] for w in words] == list(text)
    starts = [w["start"] for w in words if "start" in w]
    assert starts == sorted(starts) and len(starts) == 5
    # Segment text joins without spaces for charwise languages.
    assert all(" " not in seg["text"] for seg in out["segments"])


def test_align_int16_uploads_match_f32(monkeypatch):
    """The int16 upload path (default) and WHISPERX_WAV_INT16=0 produce the
    same word timestamps on int16-grid audio (exact round-trip)."""
    from whisperx_tpu.align.alignment import align, test_align_model

    m = test_align_model("en")
    meta = {"language": "en", "dictionary": m.dictionary, "type": "jax"}
    rng = np.random.default_rng(3)
    audio = (rng.integers(-3277, 3277, 32000).astype(np.float32) / 32768.0)
    transcript = [{"start": 0.0, "end": 2.0, "text": "ab cd"}]

    monkeypatch.setenv("WHISPERX_WAV_INT16", "1")
    out16 = align([dict(s) for s in transcript], m, meta, audio, None)
    monkeypatch.setenv("WHISPERX_WAV_INT16", "0")
    out32 = align([dict(s) for s in transcript], m, meta, audio, None)
    assert out16["word_segments"] == out32["word_segments"]


def test_strided_conv_matmul_matches_conv_lowering():
    """The framed-matmul feature-extractor path (opt-in probe via
    WHISPERX_CONV_IMPL=matmul; the default stays the native conv lowering —
    see models/wav2vec2.StridedConv1D and benchmarks/AB_RESULTS.json) is
    numerically the same conv — both impls must agree on every layer
    geometry of the wav2vec2 stack (kernel 10/3/2, stride 5/2/2, Cin 1/512)."""
    import jax
    import jax.numpy as jnp

    from whisperx_tpu.models.wav2vec2 import StridedConv1D

    rng = np.random.default_rng(0)
    for cin, k, s, t in [(1, 10, 5, 1600), (512, 3, 2, 99), (512, 2, 2, 100)]:
        x = jnp.asarray(rng.standard_normal((2, t, cin)), jnp.float32)
        conv = StridedConv1D(32, k, s, use_bias=True, dtype=jnp.float32, impl="conv")
        params = conv.init(jax.random.PRNGKey(0), x)
        y_conv = conv.apply(params, x)
        y_mm = StridedConv1D(32, k, s, use_bias=True, dtype=jnp.float32, impl="matmul").apply(
            params, x
        )
        assert y_conv.shape == y_mm.shape == (2, (t - k) // s + 1, 32)
        np.testing.assert_allclose(np.asarray(y_conv), np.asarray(y_mm), rtol=2e-5, atol=2e-5)
        y_s2d = StridedConv1D(32, k, s, use_bias=True, dtype=jnp.float32, impl="s2d").apply(
            params, x
        )
        assert y_s2d.shape == y_conv.shape
        np.testing.assert_allclose(np.asarray(y_conv), np.asarray(y_s2d), rtol=2e-5, atol=2e-5)
        # Odd tail: T not a multiple of the stride must still agree.
        x_odd = x[:, : t - 1]
        y_conv_o = conv.apply(params, x_odd)
        y_s2d_o = StridedConv1D(32, k, s, use_bias=True, dtype=jnp.float32, impl="s2d").apply(
            params, x_odd
        )
        np.testing.assert_allclose(np.asarray(y_conv_o), np.asarray(y_s2d_o), rtol=2e-5, atol=2e-5)


def test_host_backtrack_real_model_int16_parity(monkeypatch):
    """Regression for the host-mode dequantization bug: under the default
    WHISPERX_WAV_INT16=1 the audio slices handed to _batched_emissions are
    int16 PCM, and the batch buffer must keep that dtype so _wav_f32 rescales
    (/32768) on device. A rigged emission model cannot catch this (its output
    ignores input scale), so this test runs a REAL tiny wav2vec2 with random
    weights and asserts host-mode int16 output equals host-mode float32
    output, and matches the fused device path."""
    import jax

    from whisperx_tpu.models.configs import Wav2Vec2Config
    from whisperx_tpu.models.wav2vec2 import Wav2Vec2ForCTC

    # Large-style config on purpose: conv_bias=True makes the feature
    # extractor affine (not linear), so a 32768x input-scale bug actually
    # changes the output — base-style (conv_bias=False + group norm) is
    # exactly scale-invariant and cannot detect missed dequantization.
    cfg = Wav2Vec2Config(
        name="test-tiny",
        vocab_size=V,
        hidden_size=32,
        num_layers=1,
        num_heads=2,
        intermediate_size=64,
        conv_layers=((16, 10, 5), (16, 3, 2), (16, 2, 2)),
        conv_bias=True,
        do_stable_layer_norm=True,
        feat_extract_norm="layer",
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
    )
    w2v = Wav2Vec2ForCTC(cfg)
    params = w2v.init(jax.random.PRNGKey(0), np.zeros((1, 4000), np.float32))["params"]
    m = AlignModel(w2v, params, DICT, "en", blank_id=0, max_batch=4)

    # Audio exactly on the int16 grid so pcm16 round-trips bit-exactly and
    # int16 vs float32 must agree to the bit.
    rng = np.random.default_rng(7)
    audio = (rng.integers(-32768, 32768, 2 * SR).astype(np.float32)) / 32768.0
    transcript = [{"start": 0.0, "end": 2.0, "text": " hello world"}]

    def run(int16, backtrack):
        monkeypatch.setenv("WHISPERX_WAV_INT16", "1" if int16 else "0")
        monkeypatch.setenv("WHISPERX_CTC_BACKTRACK", backtrack)
        return align([dict(s) for s in transcript], m, _metadata(), audio)

    host16 = run(True, "host")
    host32 = run(False, "host")
    fused16 = run(True, "device")

    def words(out):
        return [
            (w["word"], round(w.get("start", -1.0), 3), round(w.get("end", -1.0), 3))
            for w in out["word_segments"]
        ]

    assert words(host16) == words(host32)
    assert words(host16) == words(fused16)


def test_host_backtrack_dequantizes_int16_slices(monkeypatch):
    """Pin the device-visible audio scale in host-backtrack mode. wav2vec2's
    normalization layers make its output nearly scale-invariant, so an
    end-to-end check cannot see a missed /32768; this probe model folds
    max|audio| into its emissions so the word score collapses (exp(-32768))
    if _batched_emissions ever feeds unscaled int16 values."""
    import jax.numpy as jnp

    class ScaleProbeW2V:
        def apply(self, variables, audio, sample_lengths=None):
            B, T = audio.shape
            frames = (T - 400) // 320 + 1
            scale = jnp.max(jnp.abs(audio))
            out = jnp.full((B, frames, V), -30.0, jnp.float32)
            out = out.at[:, :, 0].set(0.0)
            # plant token 'a' at the middle frame with logit -scale: near 0
            # for dequantized audio in [-1,1], catastrophic for raw int16.
            mid = frames // 2
            out = out.at[:, mid, 0].set(-30.0)
            out = out.at[:, mid, DICT["a"]].set(-scale)
            return out

        def feature_lengths(self, sample_lengths):
            return (sample_lengths - 400) // 320 + 1

    m = AlignModel(ScaleProbeW2V(), {}, DICT, "en", blank_id=0, max_batch=4)
    rng = np.random.default_rng(3)
    audio = (rng.integers(-32768, 32768, SR).astype(np.float32)) / 32768.0
    monkeypatch.setenv("WHISPERX_WAV_INT16", "1")
    monkeypatch.setenv("WHISPERX_CTC_BACKTRACK", "host")
    out = align([{"start": 0.0, "end": 1.0, "text": " a"}], m, _metadata(), audio)
    words = out["word_segments"]
    assert words and words[0]["word"] == "a"
    # exp(-scale) with scale<=1 keeps the planted-frame probability high;
    # unscaled int16 audio would drive it to ~exp(-32768)=0.
    assert words[0]["score"] > 0.2, words[0]


def test_align_inflight_window_matches_sync(monkeypatch):
    """With the dispatch window clamped to 1 the begin loop consumes pending
    batches eagerly; the result must equal the unbounded deferred path and
    synchronous align()."""
    from whisperx_tpu.align.alignment import align_begin

    model = test_align_model("en")
    model.max_batch = 2  # 5 alignable segments -> 3 dispatched batches
    rng = np.random.default_rng(4)
    audio = (rng.standard_normal(10 * SR) * 0.1).astype(np.float32)
    words = ["hello there", "general kenobi", "you are bold", "as expected",
             "the archives are complete"]
    transcript = [
        {"start": 2.0 * i + 0.1, "end": 2.0 * i + 1.9, "text": " " + w}
        for i, w in enumerate(words)
    ]
    meta = {"language": "en", "dictionary": model.dictionary, "type": "jax"}
    sync = align([dict(s) for s in transcript], model, meta, audio)
    monkeypatch.setenv("WHISPERX_ALIGN_INFLIGHT", "1")
    windowed = align_begin([dict(s) for s in transcript], model, meta, audio).finish()
    assert windowed == sync
