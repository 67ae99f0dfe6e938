"""Decode engine: binds the Flax Whisper model to the jit'd search loops.

The whole transcription step — mel features → encoder → cross-KV precompute →
prompt ingestion → greedy/beam token loop — is one jit'd XLA program per
(batch, prompt_len, beam) signature, so HBM traffic and collectives are
scheduled globally by the compiler. This is the TPU replacement for the
reference's encode+generate round trips into CTranslate2
(whisperx/asr.py:53-86).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, replace
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.whisper import Whisper
from .search import SearchOptions, beam_decode, greedy_decode
from .tokenizer import WhisperTokenizer


class DecodeResult:
    """Decode outputs with relay-friendly host access.

    ``tokens`` is one buffer; the scalar-per-row statistics (sum_logprobs,
    lengths, no_speech_probs) travel as ONE packed (3, B) float32 buffer and
    are fetched lazily in a single device→host transfer — each separate
    fetch through a remote TPU relay costs a full round trip (~27 ms
    measured), which would otherwise rival the decode itself.
    """

    def __init__(self, tokens, stats):
        self.tokens = tokens  # (B, max_new) int32 (device or host)
        self._stats = stats  # (3, B) f32: [sum_logprobs, lengths, no_speech]
        self._stats_host: Optional[np.ndarray] = None

    def _fetch(self) -> np.ndarray:
        if self._stats_host is None:
            self._stats_host = np.asarray(self._stats)
        return self._stats_host

    @property
    def sum_logprobs(self) -> np.ndarray:
        return self._fetch()[0]

    @property
    def lengths(self) -> np.ndarray:
        return self._fetch()[1].astype(np.int32)

    @property
    def no_speech_probs(self) -> Optional[np.ndarray]:
        return self._fetch()[2]

    @property
    def avg_logprobs(self) -> np.ndarray:
        return self.sum_logprobs / np.maximum(self.lengths, 1)


class WhisperEngine:
    """Stateless-weight engine: params are passed per call (pjit-shardable)."""

    def __init__(self, model: Whisper, tokenizer: WhisperTokenizer):
        self.model = model
        self.tokenizer = tokenizer
        self.config = model.config

    # The jitted methods take `self` as a static argument; identity-based
    # hashing would retrace (minutes per signature through a TPU relay) for
    # every new engine instance — and the pipeline builds one per transcribe
    # call. Trace output depends only on the model (frozen flax dataclass)
    # and the tokenizer's token *layout* (the text backend is host-only), so
    # equality is defined on exactly that pair (tests/test_decode.py pins the
    # cache-hit behavior).
    def __hash__(self):
        return hash((self.model, self.tokenizer.layout))

    def __eq__(self, other):
        return (
            isinstance(other, WhisperEngine)
            and self.model == other.model
            and self.tokenizer.layout == other.tokenizer.layout
        )

    # ---- building blocks ---------------------------------------------------

    def _encode(self, params, mel):
        return self.model.apply({"params": params}, mel, method=Whisper.encode)

    def _cross_impl(self, opts: Optional[SearchOptions]) -> str:
        """Resolve the decode cross-attention impl (see SearchOptions)."""
        import os

        import jax

        env = os.environ.get("WHISPERX_CROSS_ATTN", "")
        if env in ("pallas", "xla"):
            return env
        pref = opts.cross_attn if opts is not None else "auto"
        if pref != "auto":
            return pref
        # "auto" → XLA: lost 3/3 paired A/B runs to the einsum path at the
        # flagship shape (see SearchOptions.cross_attn).
        return "xla"

    def _prompt_cache(
        self,
        params,
        audio_states,
        prompt_tokens,
        cache_len: int = 0,
        kv_bits: int = 0,
        cross_impl: str = "xla",
    ):
        """Run the prompt through the decoder.

        Returns (last-position logits, cache, no_speech_prob), where
        no_speech_prob is softmax(logits at the SOT position)[<|nospeech|>] —
        the whisper-standard silence signal consumed by the fallback logic.
        """
        import jax.numpy as jnp

        from ..models.whisper import flat_cross_kv, quantize_kv

        B = audio_states.shape[0]
        cache_dtype = {8: jnp.int8, 4: jnp.int4}.get(kv_bits, self.model.dtype)
        cache = self.model.empty_cache(B, cache_dtype=cache_dtype, cache_len=cache_len)
        cross = self.model.apply(
            {"params": params}, audio_states, method=Whisper.compute_cross_kv
        )
        if cross_impl == "pallas":
            # The fused Pallas kernel is int8-only; int4 requests fall back
            # to int8 cross KV under it (self cache stays int4).
            cross = [flat_cross_kv(k, v, kv_bits in (4, 8)) for (k, v) in cross]
        elif kv_bits:
            cross = [
                (lambda qk, ks, qv, vs: (qk, ks, qv, vs))(
                    *quantize_kv(k, bits=kv_bits), *quantize_kv(v, bits=kv_bits)
                )
                for (k, v) in cross
            ]
        cache["cross"] = cross
        logits, cache = self.model.apply(
            {"params": params}, prompt_tokens, cache, jnp.int32(0), method=Whisper.decode_step
        )
        layout = self.tokenizer.layout
        sot_pos = jnp.argmax((prompt_tokens[0] == layout.sot).astype(jnp.int32))
        sot_logits = jax.lax.dynamic_index_in_dim(logits, sot_pos, axis=1, keepdims=False)
        no_speech_prob = jax.nn.softmax(sot_logits, axis=-1)[:, layout.no_speech]
        return logits[:, -1], cache, no_speech_prob

    def _step_fn(self, params, cross):
        """Step closure over the loop-invariant cross K/V: the while loop
        carries only the (mutable) self cache; cross buffers enter the loop
        as constants so XLA never copies them per step."""

        def step(tokens, self_cache, pos):
            logits, new_cache = self.model.apply(
                {"params": params},
                tokens,
                {"self": self_cache, "cross": cross},
                pos,
                method=Whisper.decode_step,
            )
            return logits, new_cache["self"]

        return step

    # ---- jitted end-to-end decode -----------------------------------------

    @staticmethod
    def _cache_len(prompt_len: int, opts: SearchOptions) -> int:
        # Static cache sized to the actual horizon, rounded up to the TPU
        # lane-friendly multiple of 64 — far smaller than n_text_ctx at K=5.
        need = prompt_len + opts.max_new_tokens
        return min(448, -(-need // 64) * 64)

    @functools.partial(jax.jit, static_argnames=("self", "opts"))
    def decode_greedy(self, params, mel, prompt_tokens, opts: SearchOptions, rng=None):
        """(B, n_mels, 3000) features + (B, P) prompt → greedy tokens."""
        audio_states = self._encode(params, mel)
        init_logits, cache, no_speech = self._prompt_cache(
            params, audio_states, prompt_tokens,
            self._cache_len(prompt_tokens.shape[1], opts),
            kv_bits={"int8": 8, "int4": 4}.get(opts.kv_cache_dtype, 0),
            cross_impl=self._cross_impl(opts),
        )
        tokens, sum_lp, lengths = greedy_decode(
            self._step_fn(params, cache["cross"]),
            init_logits,
            cache["self"],
            prompt_tokens.shape[1],
            opts,
            rng,
        )
        return tokens, sum_lp, lengths, no_speech

    @functools.partial(jax.jit, static_argnames=("self", "opts"))
    def decode_beam(self, params, mel, prompt_tokens, opts: SearchOptions):
        """(B, n_mels, 3000) features + (B, P) prompt → beam-searched tokens."""
        K = opts.beam_size
        audio_states = self._encode(params, mel)
        init_logits, cache, no_speech = self._prompt_cache(
            params, audio_states, prompt_tokens,
            self._cache_len(prompt_tokens.shape[1], opts),
            kv_bits={"int8": 8, "int4": 4}.get(opts.kv_cache_dtype, 0),
            cross_impl=self._cross_impl(opts),
        )
        # Replicate only the prompt-filled *self* cache per beam:
        # (B, ...) -> (B*K, ...). Cross K/V stay per batch element and are
        # bound into the step closure (loop constants, not carried state).
        expanded_self = jax.tree_util.tree_map(lambda a: jnp.repeat(a, K, axis=0), cache["self"])
        tokens, sum_lp, lengths = beam_decode(
            self._step_fn(params, cache["cross"]),
            init_logits,
            expanded_self,
            prompt_tokens.shape[1],
            opts,
        )
        return tokens, sum_lp, lengths, no_speech

    @functools.partial(jax.jit, static_argnames=("self",))
    def language_logits(self, params, mel):
        """Logits over the language-token block at the SOT position."""
        layout = self.tokenizer.layout
        audio_states = self._encode(params, mel)
        sot = jnp.full((mel.shape[0], 1), layout.sot, jnp.int32)
        logits, _, _ = self._prompt_cache(params, audio_states, sot)
        lang_ids = jnp.arange(layout.sot + 1, layout.sot + 1 + layout.num_languages)
        return logits[:, lang_ids], lang_ids

    # ---- host-level API ----------------------------------------------------

    def detect_language(self, params, mel) -> list[tuple[str, float]]:
        """Per sample: (language code, probability of the argmax language)."""
        logits, lang_ids = self.language_logits(params, mel)
        probs = jax.nn.softmax(logits, axis=-1)
        best = np.asarray(jnp.argmax(probs, axis=-1))
        best_p = np.asarray(jnp.max(probs, axis=-1))
        layout = self.tokenizer.layout
        return [
            (layout.language_of(int(lang_ids[i])), float(p)) for i, p in zip(best, best_p)
        ]

    def build_options(
        self,
        *,
        beam_size: Optional[int] = 5,
        patience: float = 1.0,
        length_penalty: float = 1.0,
        temperature: float = 0.0,
        max_new_tokens: Optional[int] = None,
        suppress_tokens: Sequence[int] = (-1,),
        suppress_blank: bool = True,
        without_timestamps: bool = True,
        kv_cache_dtype: str = "model",
    ) -> SearchOptions:
        """Resolve reference-style options into a static SearchOptions.

        ``suppress_tokens=[-1]`` expands to the default non-speech set, the
        same convention the reference inherits from CT2
        (whisperx/asr.py:313,336).
        """
        tok = self.tokenizer
        layout = tok.layout
        resolved: list[int] = []
        for t in suppress_tokens:
            if t == -1:
                resolved.extend(tok.non_speech_tokens)
            elif t >= 0:
                resolved.append(t)
        # Task/control tokens are always suppressed during generation.
        resolved.extend(
            [
                layout.sot,
                layout.sot_prev,
                layout.sot_lm,
                layout.translate,
                layout.transcribe,
                layout.no_speech,
            ]
        )
        resolved.extend(layout.language_tokens)

        banned: list[int] = []
        if without_timestamps:
            banned.extend(range(layout.timestamp_begin, layout.n_vocab))
            banned.append(layout.no_timestamps)

        max_new = max_new_tokens or (self.config.n_text_ctx // 2)
        blank = tuple(tok.encode(" "))
        return SearchOptions(
            beam_size=beam_size or 1,
            patience=patience,
            length_penalty=length_penalty,
            max_new_tokens=max_new,
            temperature=temperature,
            suppress_tokens=tuple(sorted(set(resolved))),
            suppress_blank=suppress_blank,
            blank_tokens=blank,
            eot=layout.eot,
            banned_tokens=tuple(banned),
            kv_cache_dtype=kv_cache_dtype,
        )

    def build_prompt(
        self,
        batch: int,
        *,
        initial_prompt: Optional[str] = None,
        without_timestamps: bool = True,
        prefix_tokens: Sequence[int] = (),
    ) -> jnp.ndarray:
        """Shared prompt for the whole batch (reference asr.py:40-45 contract)."""
        tok = self.tokenizer
        prompt: list[int] = []
        if initial_prompt:
            prompt.append(tok.sot_prev)
            prompt.extend(tok.encode(" " + initial_prompt.strip())[-(self.config.n_text_ctx // 2 - 1):])
        prompt.extend(tok.sot_sequence(without_timestamps=without_timestamps))
        prompt.extend(prefix_tokens)
        arr = jnp.asarray(prompt, jnp.int32)
        return jnp.tile(arr[None, :], (batch, 1))

    def prefix_tokens(self, prefix: Optional[str]) -> tuple:
        """Encode a decode ``prefix`` (reference asr.py:44 passes it into
        prompt construction). Whisper semantics: the prefix conditions the
        decoder as forced continuation context — it joins the prompt after
        the sot sequence and is NOT part of the emitted text — truncated to
        the LAST ``n_text_ctx // 2 - 1`` tokens like initial_prompt."""
        if not prefix:
            return ()
        toks = self.tokenizer.encode(" " + prefix.strip())
        return tuple(toks[-(self.config.n_text_ctx // 2 - 1):])

    def generate(
        self,
        params,
        mel,
        *,
        options: Optional[SearchOptions] = None,
        initial_prompt: Optional[str] = None,
        prefix: Optional[str] = None,
        rng=None,
        sync: bool = True,
    ) -> DecodeResult:
        """Transcribe a feature batch; dispatches greedy vs beam.

        ``sync=False`` returns the result holding *device* arrays without
        blocking: JAX async dispatch lets the caller enqueue the next batch
        (and its mel front-end) while this one executes; the arrays convert
        (and synchronize) transparently on first host use.
        """
        opts = options or self.build_options()
        prompt = self.build_prompt(
            mel.shape[0],
            initial_prompt=initial_prompt,
            prefix_tokens=self.prefix_tokens(prefix),
        )
        if opts.beam_size > 1 and opts.temperature == 0.0:
            tokens, sum_lp, lengths, no_speech = self.decode_beam(params, mel, prompt, opts)
        else:
            tokens, sum_lp, lengths, no_speech = self.decode_greedy(params, mel, prompt, opts, rng)
        # Pack the per-row scalars into one buffer (one host fetch later);
        # lengths < n_text_ctx are exact in float32.
        stats = jnp.stack(
            [
                sum_lp.astype(jnp.float32),
                lengths.astype(jnp.float32),
                no_speech.astype(jnp.float32),
            ]
        )
        if sync:
            return DecodeResult(np.asarray(tokens), np.asarray(stats))
        return DecodeResult(tokens, stats)

    def decode_text(self, result: DecodeResult) -> list[str]:
        # One transfer for the whole token batch — iterating a device array
        # row-wise would fetch per row (a relay round trip each).
        tokens = np.asarray(result.tokens)
        return self.tokenizer.decode_batch([row.tolist() for row in tokens])
