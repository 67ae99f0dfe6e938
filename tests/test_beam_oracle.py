"""Beam-search semantics vs an independent oracle: HF torch `generate`.

The reference's beam decode is CTranslate2's battle-tested C++
(whisperx/asr.py:53-62). This repo's beam (decode/search.py) was previously
tested only self-consistently; here its decoded token sequences are compared
against `WhisperForConditionalGeneration.generate(num_beams=5)` running on
the SAME weights (tiny random HF model, converted through models/convert.py)
— the strongest accuracy evidence available offline.

Known, intentional semantic divergences (none observed to flip outcomes at
this scale, all asserted over the regimes below):

1. **Length-penalty form.** We use the GNMT/CT2 normalization
   ``score / (((5+L)/6)**alpha)`` (decode/search.py:length_penalized) —
   matching the reference's CT2 backend. HF divides by
   ``len(hypothesis)**alpha`` (including the decoder prompt). At alpha=0
   both reduce to the raw cumulative logprob and must agree exactly; at
   alpha=1 the rankings can differ in principle when finished hypotheses
   have different lengths, but agreement held 24/24 in the finish-heavy
   regime tested here (the chosen hypothesis usually dominates under both
   norms).
2. **Finished-candidate admission.** HF only admits an EOS candidate to the
   finished set if it ranks in the top-K of the 2K per-step candidates; we
   admit EOS candidates from all 2K (closer to CT2). A lower-ranked EOS can
   therefore enter our finished buffer but not HF's; it can only win if it
   beats every HF-admissible hypothesis, in which case HF's answer was
   suboptimal under its own objective.
3. **Early termination.** We stop when `patience*K` hypotheses have finished
   AND no alive beam can beat the worst kept finished score even with a
   perfect (0 logprob) future — CT2's patience semantics
   (arXiv 2204.05424). HF's `early_stopping=False` heuristic is the same
   bound at alpha=0.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

MAX_NEW = 12
K = 5


def _build(vocab: int, seed: int, eos_bias: float = 0.0):
    """Tiny random HF whisper + its converted JAX twin and engine."""
    from transformers import WhisperConfig as HFWhisperConfig
    from transformers import WhisperForConditionalGeneration

    from whisperx_tpu.decode.engine import WhisperEngine
    from whisperx_tpu.decode.tokenizer import WhisperTokenizer
    from whisperx_tpu.models.configs import WhisperConfig
    from whisperx_tpu.models.convert import convert_whisper
    from whisperx_tpu.models.whisper import Whisper

    hf_cfg = HFWhisperConfig(
        vocab_size=vocab, num_mel_bins=80, d_model=64,
        encoder_layers=2, encoder_attention_heads=2,
        decoder_layers=2, decoder_attention_heads=2,
        decoder_ffn_dim=256, encoder_ffn_dim=256,
        max_source_positions=32, max_target_positions=48,
        pad_token_id=0, bos_token_id=0, eos_token_id=1, decoder_start_token_id=2,
    )
    torch.manual_seed(seed)
    hf_model = WhisperForConditionalGeneration(hf_cfg).eval()
    if eos_bias:
        # Point the tied EOS embedding row at the typical decoder hidden
        # state so beams actually finish mid-horizon (random models would
        # otherwise never emit EOS and the finish path would go untested).
        with torch.no_grad():
            h = hf_model.model(
                input_features=torch.randn(2, 80, 64),
                decoder_input_ids=torch.randint(0, vocab, (2, 8)),
            ).last_hidden_state.mean(dim=(0, 1))
            hf_model.model.decoder.embed_tokens.weight[1] = eos_bias * h / h.norm()

    cfg = WhisperConfig(
        name="test", n_mels=80, n_vocab=vocab, n_audio_ctx=32, n_audio_state=64,
        n_audio_head=2, n_audio_layer=2, n_text_ctx=48, n_text_state=64,
        n_text_head=2, n_text_layer=2,
    )
    sd = {k: v.numpy() for k, v in hf_model.state_dict().items()}
    params = convert_whisper(sd, cfg)
    engine = WhisperEngine(Whisper(cfg), WhisperTokenizer.dummy(vocab, language="en"))
    return hf_model, engine, params


def _compare(hf_model, engine, params, *, length_penalty: float, batch: int,
             trials: int, seed: int):
    """Run both beams on identical inputs; return (agreements, finished)."""
    import jax.numpy as jnp

    from whisperx_tpu.decode.search import SearchOptions

    opts = SearchOptions(
        beam_size=K, patience=1.0, length_penalty=length_penalty,
        max_new_tokens=MAX_NEW, temperature=0.0, suppress_tokens=(),
        suppress_blank=False, blank_tokens=(), eot=1, banned_tokens=(),
    )
    rng = np.random.default_rng(seed)
    agree = finished = total = 0
    for _ in range(trials):
        mel = rng.standard_normal((batch, 80, 64)).astype(np.float32) * 2.0
        prompt = np.full((batch, 1), 2, np.int32)
        with torch.no_grad():
            hf_seqs = hf_model.generate(
                input_features=torch.from_numpy(mel),
                decoder_input_ids=torch.from_numpy(prompt.astype(np.int64)),
                num_beams=K, max_length=1 + MAX_NEW,
                length_penalty=length_penalty, early_stopping=False,
                do_sample=False, begin_suppress_tokens=None, suppress_tokens=None,
            ).numpy()  # (B, <=MAX_NEW): decoder prompt already stripped
        tokens, _, _, _ = engine.decode_beam(
            params, jnp.asarray(mel), jnp.asarray(prompt), opts
        )
        tokens = np.asarray(tokens)
        for b in range(batch):
            hf_gen = hf_seqs[b].tolist()
            ours = tokens[b].tolist()
            # Compare content up to (excluding) the first EOS: HF right-pads
            # with pad_token_id, ours pads with EOT.
            if 1 in hf_gen:
                hf_gen = hf_gen[: hf_gen.index(1)]
            if 1 in ours:
                ours = ours[: ours.index(1)]
            total += 1
            finished += len(ours) < MAX_NEW
            agree += hf_gen == ours
    return agree, finished, total


def test_beam_matches_hf_generate_unfinished_regime():
    """Vocab 100: EOS essentially never fires — pins the per-step candidate
    selection and alive-beam bookkeeping over the full horizon. alpha=0 so
    both implementations rank by raw cumulative logprob (divergence #1 is
    out of play by construction)."""
    hf_model, engine, params = _build(vocab=100, seed=0)
    agree, _, total = _compare(
        hf_model, engine, params, length_penalty=0.0, batch=4, trials=6, seed=0
    )
    assert total == 24
    assert agree == total, f"beam mismatch vs HF generate: {agree}/{total}"


def test_beam_matches_hf_generate_finish_regime():
    """EOS-biased model: every sequence finishes mid-horizon, exercising the
    finished-merge and early-termination paths (divergences #2/#3)."""
    hf_model, engine, params = _build(vocab=32, seed=0, eos_bias=0.45)
    agree, finished, total = _compare(
        hf_model, engine, params, length_penalty=0.0, batch=4, trials=5, seed=1
    )
    assert total == 20
    assert finished >= total // 2, "EOS bias failed to produce finished beams"
    assert agree == total, f"beam mismatch vs HF generate: {agree}/{total}"


def test_beam_matches_hf_generate_length_penalty_one():
    """alpha=1.0 — GNMT vs HF normalization (divergence #1) live. Agreement
    still expected at this scale: the winning hypothesis dominates under
    both norms (see module docstring)."""
    hf_model, engine, params = _build(vocab=32, seed=2, eos_bias=0.45)
    agree, finished, total = _compare(
        hf_model, engine, params, length_penalty=1.0, batch=4, trials=5, seed=2
    )
    assert total == 20
    assert finished >= total // 2
    assert agree == total, f"beam mismatch vs HF generate: {agree}/{total}"


def test_beam_matches_hf_generate_with_suppression():
    """Token suppression semantics vs HF's SuppressTokensLogitsProcessor:
    the same banned ids, applied as our static -inf mask, must yield the
    same sequences (the reference suppresses via CT2's suppress_sequences,
    whisperx/asr.py:58-61)."""
    import jax.numpy as jnp

    from whisperx_tpu.decode.search import SearchOptions

    hf_model, engine, params = _build(vocab=100, seed=1)
    banned = [7, 11, 49, 50, 51, 52, 53]  # 49 is the favorite token of seed-0
    opts = SearchOptions(
        beam_size=K, patience=1.0, length_penalty=0.0, max_new_tokens=MAX_NEW,
        temperature=0.0, suppress_tokens=tuple(banned), suppress_blank=False,
        blank_tokens=(), eot=1, banned_tokens=(),
    )
    rng = np.random.default_rng(5)
    agree = total = 0
    for _ in range(4):
        mel = rng.standard_normal((3, 80, 64)).astype(np.float32) * 2.0
        prompt = np.full((3, 1), 2, np.int32)
        with torch.no_grad():
            hf_seqs = hf_model.generate(
                input_features=torch.from_numpy(mel),
                decoder_input_ids=torch.from_numpy(prompt.astype(np.int64)),
                num_beams=K, max_length=1 + MAX_NEW, length_penalty=0.0,
                early_stopping=False, do_sample=False,
                begin_suppress_tokens=None, suppress_tokens=banned,
            ).numpy()
        tokens = np.asarray(
            engine.decode_beam(params, jnp.asarray(mel), jnp.asarray(prompt), opts)[0]
        )
        for b in range(3):
            hf_gen = hf_seqs[b].tolist()
            ours = tokens[b].tolist()
            if 1 in hf_gen:
                hf_gen = hf_gen[: hf_gen.index(1)]
            if 1 in ours:
                ours = ours[: ours.index(1)]
            assert not set(ours) & set(banned)
            total += 1
            agree += hf_gen == ours
    assert agree == total, f"{agree}/{total}"


def test_beam_matches_hf_generate_with_prefix():
    """`prefix` semantics (reference asr.py:44 passes options.prefix into
    prompt construction): prefix tokens join the decoder prompt after the
    sot sequence, condition the beam as forced context, and are excluded
    from the emitted tokens. Pinned against HF generate with the same
    multi-token decoder_input_ids."""
    import jax.numpy as jnp

    from whisperx_tpu.decode.search import SearchOptions

    hf_model, engine, params = _build(vocab=100, seed=3)
    opts = SearchOptions(
        beam_size=K, patience=1.0, length_penalty=0.0, max_new_tokens=MAX_NEW,
        temperature=0.0, suppress_tokens=(), suppress_blank=False,
        blank_tokens=(), eot=1, banned_tokens=(),
    )
    rng = np.random.default_rng(11)
    agree = total = 0
    for trial in range(4):
        mel = rng.standard_normal((3, 80, 64)).astype(np.float32) * 2.0
        # decoder start token + a 3-token "prefix" (forced continuation)
        prefix = rng.integers(3, 100, 3).tolist()
        prompt = np.tile(np.asarray([[2] + prefix], np.int32), (3, 1))
        prompt_len = prompt.shape[1]
        with torch.no_grad():
            hf_seqs = hf_model.generate(
                input_features=torch.from_numpy(mel),
                decoder_input_ids=torch.from_numpy(prompt.astype(np.int64)),
                num_beams=K, max_length=prompt_len + MAX_NEW,
                length_penalty=0.0, early_stopping=False, do_sample=False,
                begin_suppress_tokens=None, suppress_tokens=None,
            ).numpy()
        tokens = np.asarray(
            engine.decode_beam(params, jnp.asarray(mel), jnp.asarray(prompt), opts)[0]
        )
        for b in range(3):
            hf_gen = hf_seqs[b].tolist()
            # HF returns the full sequence including decoder_input_ids when
            # they exceed one token; strip the echoed prompt if present.
            if hf_gen[:prompt_len] == prompt[b].tolist():
                hf_gen = hf_gen[prompt_len:]
            ours = tokens[b].tolist()
            if 1 in hf_gen:
                hf_gen = hf_gen[: hf_gen.index(1)]
            if 1 in ours:
                ours = ours[: ours.index(1)]
            total += 1
            agree += hf_gen == ours
    assert total == 12
    assert agree == total, f"beam mismatch vs HF generate with prefix: {agree}/{total}"


def test_engine_prefix_threading():
    """engine.generate(prefix=...) appends the encoded prefix to every prompt
    row after the sot sequence, truncated to the last n_text_ctx//2 - 1
    tokens; pipeline options.prefix reaches the engine (the reference
    accepts-and-forwards it at asr.py:44 — silently dropping it was the r4
    parity gap)."""
    _, engine, _ = _build(vocab=100, seed=0)
    tok = engine.tokenizer
    pt = engine.prefix_tokens("hello")
    assert pt == tuple(tok.encode(" hello"))
    # truncation: keep the LAST n_text_ctx//2 - 1 tokens
    long_prefix = "x" * 200
    pt_long = engine.prefix_tokens(long_prefix)
    limit = engine.config.n_text_ctx // 2 - 1
    assert len(pt_long) == limit
    assert pt_long == tuple(tok.encode(" " + long_prefix)[-limit:])
    prompt = engine.build_prompt(2, prefix_tokens=pt)
    base = engine.build_prompt(2, prefix_tokens=())
    assert prompt.shape == (2, base.shape[1] + len(pt))
    assert prompt[0, -len(pt):].tolist() == list(pt)
    assert prompt[0, : base.shape[1]].tolist() == base[0].tolist()


def test_engine_initial_prompt_structure():
    """build_prompt(initial_prompt=...) follows the reference contract
    (asr.py:40-45 via faster-whisper get_prompt): sot_prev + the LAST
    n_text_ctx//2 - 1 tokens of the encoded prompt, then the sot sequence;
    the prefix (if any) comes after the sot sequence."""
    _, engine, _ = _build(vocab=100, seed=0)
    tok = engine.tokenizer
    limit = engine.config.n_text_ctx // 2 - 1

    prompt = engine.build_prompt(1, initial_prompt="hello world")
    row = prompt[0].tolist()
    assert row[0] == tok.sot_prev
    enc = tok.encode(" hello world")[-limit:]
    assert row[1 : 1 + len(enc)] == list(enc)
    sot_seq = tok.sot_sequence(without_timestamps=True)
    assert row[1 + len(enc) :] == list(sot_seq)

    # long prompt truncates keeping the LAST tokens
    long_text = "x" * 300
    row = engine.build_prompt(1, initial_prompt=long_text)[0].tolist()
    enc_long = tok.encode(" " + long_text)[-limit:]
    assert len(enc_long) == limit
    assert row[1 : 1 + limit] == list(enc_long)

    # initial_prompt + prefix compose: [sot_prev, prompt..., sot_seq..., prefix...]
    pt = engine.prefix_tokens("ok")
    row = engine.build_prompt(1, initial_prompt="hello", prefix_tokens=pt)[0].tolist()
    assert row[-len(pt):] == list(pt)
    assert row[-len(pt) - len(sot_seq) : -len(pt)] == list(sot_seq)
