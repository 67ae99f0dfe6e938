"""The ASR pipeline: VAD cut&merge → batched on-device transcription.

API parity with the reference pipeline (whisperx/asr.py:88-357): same
``load_model(...)`` surface, same ``transcribe(audio, batch_size, ...)``
contract returning ``{"segments": [{text,start,end}], "language"}``, same
lazy per-language tokenizer semantics, numeral suppression, and VAD
onset/offset defaults.

TPU-first differences:
- Chunks are packed into *fixed-size* batches (the final partial batch is
  padded and the padding rows discarded) so one compiled program serves the
  whole file — no recompiles, no DataLoader.
- log-mel, encoder, and the full beam loop run as one jit per batch; the host
  only slices waveforms and strings tokens back into text.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Any, List, Optional, Sequence, Union

import numpy as np

from ..audio.constants import N_SAMPLES, SAMPLE_RATE
from ..audio.io import load_audio
from ..decode.engine import WhisperEngine
from ..decode.search import SearchOptions
from ..decode.tokenizer import WhisperTokenizer
from ..io.types import SingleSegment, TranscriptionResult
from ..vad.model import VadPipeline, load_vad_model


@dataclass
class TranscriptionOptions:
    """Reference-compatible decode options (whisperx/asr.py:300-326 defaults).

    The batched path honors beam_size/patience/length_penalty/suppression and
    max_new_tokens. The temperature/threshold/best_of fields drive the
    opt-in quality gate (``enable_fallback``): failed chunks re-decode at the
    next temperature with ``best_of`` sampled candidates each, best avg
    logprob wins. The reference's batched path parses all of these but never
    implements them (whisperx/asr.py:53-62 does a single beam pass).
    """

    beam_size: int = 5
    best_of: int = 5
    patience: float = 1.0
    length_penalty: float = 1.0
    repetition_penalty: float = 1.0
    no_repeat_ngram_size: int = 0
    temperatures: Sequence[float] = (0.0, 0.2, 0.4, 0.6, 0.8, 1.0)
    compression_ratio_threshold: Optional[float] = 2.4
    log_prob_threshold: Optional[float] = -1.0
    no_speech_threshold: Optional[float] = 0.6
    condition_on_previous_text: bool = False
    prompt_reset_on_temperature: float = 0.5
    initial_prompt: Optional[str] = None
    prefix: Optional[str] = None
    suppress_blank: bool = True
    suppress_tokens: Sequence[int] = (-1,)
    without_timestamps: bool = True
    max_initial_timestamp: float = 0.0
    word_timestamps: bool = False
    prepend_punctuations: str = "\"'“¿([{-"
    append_punctuations: str = "\"'.。,，!！?？:：”)]}、"
    max_new_tokens: Optional[int] = None
    clip_timestamps: Optional[str] = None
    hallucination_silence_threshold: Optional[float] = None
    # Extension over the reference: the reference's batched path *ignores* its
    # temperature/threshold options (whisperx/asr.py:53-62 does a single beam
    # pass). With enable_fallback=True this pipeline actually implements the
    # whisper-style quality gate — failed chunks are re-decoded at the next
    # temperature, batched; silent chunks (<|nospeech|> + low logprob) are
    # dropped. Default False for reference-parity output.
    enable_fallback: bool = False


class WhisperPipeline:
    """End-to-end transcriber bound to one Whisper model + VAD scorer."""

    def __init__(
        self,
        engine: WhisperEngine,
        params: Any,
        vad: VadPipeline,
        vad_params: dict,
        options: TranscriptionOptions,
        tokenizer: Optional[WhisperTokenizer] = None,
        language: Optional[str] = None,
        suppress_numerals: bool = False,
        mesh: Any = None,
        kv_cache_dtype: str = "model",
    ):
        self.engine = engine
        self.vad_model = vad
        self._vad_params = vad_params
        self.options = options
        self.tokenizer = tokenizer
        self.preset_language = language
        self.suppress_numerals = suppress_numerals
        # "model" keeps decode KV in the compute dtype; "int8"/"int4"
        # quantize the cache (the on-chip flagship default is int8 — see
        # bench.py / AB_RESULTS.json; token-parity tested in test_decode.py).
        self.kv_cache_dtype = kv_cache_dtype
        self.model = engine.model
        # In-process multi-chip data parallelism: with a mesh, params are
        # placed once (replicated for DP, tensor-sharded where the partition
        # rules apply) and every chunk batch is sharded on the "data" axis —
        # the scaling answer the reference never had (whisperx/asr.py:78-80
        # just moves encoder output to CPU).
        self.mesh = mesh
        if mesh is not None:
            from ..parallel import shard_params

            params = shard_params(params, mesh)
        self.params = params
        from ..utils.telemetry import PipelineTelemetry

        self.telemetry = PipelineTelemetry()

    def _mesh_scope(self):
        import contextlib

        import jax

        return jax.set_mesh(self.mesh) if self.mesh is not None else contextlib.nullcontext()

    def _data_granule(self) -> int:
        return int(self.mesh.devices.shape[0]) if self.mesh is not None else 1

    # -- helpers -------------------------------------------------------------

    def _make_tokenizer(self, language: str, task: str) -> WhisperTokenizer:
        base = self.engine.tokenizer  # carries the text backend
        return WhisperTokenizer(
            base.backend,
            base.layout.n_vocab,
            base.layout.num_languages,
            language=language,
            task=task,
        )

    def _search_options(self, tokenizer: WhisperTokenizer) -> tuple[SearchOptions, WhisperEngine]:
        opts = self.options
        # A knob that quietly does nothing is worse than one that raises
        # (ops/ctc.py standard). These two are accepted-but-unused by the
        # reference's batched path too (whisperx/asr.py:53-62 never passes
        # them to CT2.generate), so raising on non-defaults is honest parity.
        if opts.repetition_penalty != 1.0:
            raise NotImplementedError(
                "repetition_penalty is not implemented in the batched decode "
                "path (the reference's batched path ignores it too); leave it "
                "at 1.0"
            )
        if opts.no_repeat_ngram_size:
            raise NotImplementedError(
                "no_repeat_ngram_size is not implemented in the batched decode "
                "path (the reference's batched path ignores it too); leave it "
                "at 0"
            )
        suppress = list(opts.suppress_tokens)
        if self.suppress_numerals:
            print("Suppressing numeral and symbol tokens")
            suppress = sorted(set(list(suppress) + list(numeral_symbol_tokens(tokenizer))))
        engine = WhisperEngine(self.engine.model, tokenizer)
        return engine.build_options(
            beam_size=opts.beam_size,
            patience=opts.patience,
            length_penalty=opts.length_penalty,
            temperature=float(opts.temperatures[0]) if opts.temperatures else 0.0,
            max_new_tokens=opts.max_new_tokens,
            suppress_tokens=suppress,
            suppress_blank=opts.suppress_blank,
            without_timestamps=opts.without_timestamps,
            kv_cache_dtype=self.kv_cache_dtype,
        ), engine

    def _feature_batches(self, audio: np.ndarray, chunks: List[dict], batch_size: int):
        """Yield (mel_batch (B, n_mels, 3000), n_valid) fixed-shape batches.

        ``audio`` may be float32 or int16 PCM (see ``_device_audio``): the
        waveform batch is uploaded in the audio's dtype — int16 halves the
        dominant host→device transfer through a TPU relay — and the mel
        front-end converts integers back to float32/32768 on device.
        """
        import jax.numpy as jnp

        from ..audio.mel import log_mel_spectrogram

        n_mels = self.engine.config.n_mels
        for i in range(0, len(chunks), batch_size):
            batch = chunks[i : i + batch_size]
            wavs = np.zeros((batch_size, N_SAMPLES), audio.dtype)
            for row, seg in enumerate(batch):
                f1 = int(seg["start"] * SAMPLE_RATE)
                f2 = int(seg["end"] * SAMPLE_RATE)
                clip = audio[f1:f2][:N_SAMPLES]
                wavs[row, : len(clip)] = clip
            if self.mesh is not None:
                # Shard the waveform batch on "data" so the mel front-end and
                # decode both run data-parallel across the mesh.
                from ..parallel import shard_batch

                wav_arr = shard_batch(self.mesh, wavs)
            else:
                wav_arr = jnp.asarray(wavs)
            with self._mesh_scope():
                mel = log_mel_spectrogram(wav_arr, n_mels=n_mels)
            yield mel.astype(self.engine.model.dtype), len(batch)

    # -- public API ------------------------------------------------------------

    def transcribe(
        self,
        audio: Union[str, np.ndarray],
        batch_size: Optional[int] = None,
        num_workers: int = 0,
        language: Optional[str] = None,
        task: Optional[str] = None,
        chunk_size: int = 30,
        print_progress: bool = False,
        combined_progress: bool = False,
        verbose: bool = False,
    ) -> TranscriptionResult:
        if isinstance(audio, str):
            audio = load_audio(audio)
        audio = np.asarray(audio, dtype=np.float32).reshape(-1)
        batch_size = batch_size or 8
        # Batch rows must tile the mesh's data axis exactly (fixed shapes).
        granule = self._data_granule()
        batch_size = -(-batch_size // granule) * granule
        total_audio = len(audio) / SAMPLE_RATE

        with self.telemetry.stage("vad", audio_seconds=total_audio):
            vad_segments = self.vad_model(audio, chunk_size=chunk_size)

        # Device uploads in int16 PCM (half the relay bytes; exact for
        # s16le-decoded audio). WHISPERX_WAV_INT16=0 keeps float32 uploads.
        audio_dev = _device_audio(audio)

        # Lazy tokenizer (re)build — reference semantics (asr.py:193-205).
        if self.tokenizer is None:
            language = language or self.detect_language(audio)
            task = task or "transcribe"
            self.tokenizer = self._make_tokenizer(language, task)
        else:
            language = language or self.tokenizer.language
            task = task or self.tokenizer.task
            if task != self.tokenizer.task or language != self.tokenizer.language:
                self.tokenizer = self._make_tokenizer(language, task)

        search_opts, engine = self._search_options(self.tokenizer)

        total = len(vad_segments)
        texts: List[str] = [""] * total
        avg_lps = np.zeros(total)
        no_speech = np.zeros(total)
        done = 0

        def consume(result, n_valid, at):
            # First host read of the device arrays synchronizes here.
            batch_texts = engine.decode_text(result)[:n_valid]
            avg = np.asarray(result.avg_logprobs)
            nsp = result.no_speech_probs
            for j, text in enumerate(batch_texts):
                texts[at + j] = text
                avg_lps[at + j] = avg[j]
                if nsp is not None:
                    no_speech[at + j] = float(nsp[j])
            if print_progress:
                pct = ((at + n_valid) / total) * 100
                print(f"Progress: {(pct / 2 if combined_progress else pct):.2f}%...")

        # One batch kept in flight: batch i+1 (mel front-end + decode) is
        # enqueued before blocking on batch i's tokens, so host-side
        # detokenization and chunk prep overlap device compute — the TPU
        # replacement for the reference's DataLoader worker overlap
        # (whisperx/asr.py:158-171).
        total_audio_s = sum(s["end"] - s["start"] for s in vad_segments)
        with self.telemetry.stage("asr_decode", audio_seconds=total_audio_s):
            in_flight = None
            for mel, n_valid in self._feature_batches(audio_dev, vad_segments, batch_size):
                with self._mesh_scope():
                    result = engine.generate(
                        self.params, mel, options=search_opts,
                        initial_prompt=self.options.initial_prompt,
                        prefix=self.options.prefix,
                        sync=False,
                    )
                if in_flight is not None:
                    consume(*in_flight)
                    done += in_flight[1]
                in_flight = (result, n_valid, done)
            if in_flight is not None:
                consume(*in_flight)
                done += in_flight[1]

        if self.options.enable_fallback:
            texts = self._temperature_fallback(
                engine, search_opts, audio_dev, vad_segments, texts, avg_lps, no_speech, batch_size
            )

        segments: List[SingleSegment] = []
        for idx, seg in enumerate(vad_segments):
            if verbose:
                print(
                    f"Transcript: [{seg['start']:.3f} --> {seg['end']:.3f}] {texts[idx].strip()}"
                )
            segments.append(
                {
                    "text": texts[idx],
                    "start": round(seg["start"], 3),
                    "end": round(seg["end"], 3),
                }
            )

        # Multilingual mode: drop the tokenizer so the next file re-detects.
        if self.preset_language is None:
            self.tokenizer = None

        return {"segments": segments, "language": language}

    def _temperature_fallback(
        self, engine, search_opts, audio, vad_segments, texts, avg_lps, no_speech, batch_size
    ):
        """Whisper-style quality gate over the batched results.

        Chunks failing the compression-ratio or avg-logprob thresholds are
        re-decoded at the next temperature with ``best_of`` independent
        sampled candidates per chunk — drawn as ONE widened batch, not a loop
        — keeping the candidate with the highest avg logprob (whisper
        semantics the reference parses but never implements in its batched
        path, whisperx/asr.py:301,53-62). Chunks flagged silent (<|nospeech|>
        prob above threshold AND low logprob) end up with empty text.
        """
        import jax

        from ..utils import compression_ratio

        opts = self.options
        cr_thr = opts.compression_ratio_threshold
        lp_thr = opts.log_prob_threshold
        ns_thr = opts.no_speech_threshold
        n_cand = max(1, int(opts.best_of or 1))

        def failed(idx: int) -> bool:
            if cr_thr is not None and texts[idx].strip() and compression_ratio(texts[idx]) > cr_thr:
                return True
            if lp_thr is not None and avg_lps[idx] < lp_thr:
                return True
            return False

        pending = [i for i in range(len(texts)) if failed(i)]
        temperatures = [t for t in opts.temperatures if t > 0]
        for t_i, temp in enumerate(temperatures):
            if not pending:
                break
            import dataclasses

            fb_opts = dataclasses.replace(search_opts, beam_size=1, temperature=float(temp))
            # Each failed chunk appears best_of times in the retry batch;
            # jax.random.categorical draws independently per row, so the
            # replicated rows are distinct samples of the same chunk.
            retry_segments = [vad_segments[i] for i in pending for _ in range(n_cand)]
            new_texts: List[str] = []
            new_lps: List[float] = []
            done = 0
            for mel, n_valid in self._feature_batches(audio, retry_segments, batch_size):
                with self._mesh_scope():
                    result = engine.generate(
                        self.params, mel, options=fb_opts,
                        initial_prompt=opts.initial_prompt,
                        prefix=opts.prefix,
                        rng=jax.random.PRNGKey(hash((t_i, done)) & 0x7FFFFFFF),
                    )
                new_texts.extend(engine.decode_text(result)[:n_valid])
                new_lps.extend(result.avg_logprobs[:n_valid].tolist())
                done += n_valid
            for row, idx in enumerate(pending):
                lo = row * n_cand
                best = lo + int(np.argmax(new_lps[lo : lo + n_cand]))
                texts[idx] = new_texts[best]
                avg_lps[idx] = new_lps[best]
            pending = [i for i in pending if failed(i)]

        # Silence gate: no-speech prob high AND decode confidence low → empty.
        if ns_thr is not None and lp_thr is not None:
            for i in range(len(texts)):
                if no_speech[i] > ns_thr and avg_lps[i] < lp_thr:
                    texts[i] = ""
        return texts

    def detect_language(self, audio: np.ndarray) -> str:
        import jax.numpy as jnp

        from ..audio.io import pad_or_trim
        from ..audio.mel import log_mel_spectrogram

        if audio.shape[0] < N_SAMPLES:
            print("Warning: audio is shorter than 30s, language detection may be inaccurate.")
        clip = pad_or_trim(_device_audio(np.asarray(audio, np.float32))[:N_SAMPLES])
        # Tile the single clip over the mesh's data axis (fixed shapes).
        rows = np.tile(clip[None], (self._data_granule(), 1))
        if self.mesh is not None:
            from ..parallel import shard_batch

            rows = shard_batch(self.mesh, rows)
        else:
            rows = jnp.asarray(rows)
        with self._mesh_scope():
            mel = log_mel_spectrogram(rows, n_mels=self.engine.config.n_mels).astype(
                self.engine.model.dtype
            )
            (language, prob) = self.engine.detect_language(self.params, mel)[0]
        print(f"Detected language: {language} ({prob:.2f}) in first 30s of audio...")
        return language


def _device_audio(audio: np.ndarray) -> np.ndarray:
    """Waveform as uploaded to the device: int16 PCM by default.

    Halves the host→device bytes of every chunk batch (the single largest
    relay transfer: ~15 MB f32 per batch of 8×30 s, ~180 ms measured);
    bit-exact for s16le-decoded audio (the reference's own decode contract,
    whisperx/audio.py:44-61). WHISPERX_WAV_INT16=0 restores float32 uploads.
    """
    import os

    from ..audio.io import pcm16

    if os.environ.get("WHISPERX_WAV_INT16", "1") == "1":
        return pcm16(audio)
    return audio



def numeral_symbol_tokens(tokenizer: WhisperTokenizer) -> list[int]:
    """Token ids containing digits or currency symbols (asr.py:16-23 parity)."""
    out = []
    for i in range(tokenizer.eot):
        piece = tokenizer.backend.id_to_piece(i)
        if piece and any(c in "0123456789%$£" for c in piece):
            out.append(i)
    return out


def load_model(
    whisper_arch: str,
    device: Optional[str] = None,
    device_index: int = 0,
    compute_type: str = "bfloat16",
    asr_options: Optional[dict] = None,
    language: Optional[str] = None,
    vad_model: Optional[VadPipeline] = None,
    vad_options: Optional[dict] = None,
    model: Optional[Any] = None,
    task: str = "transcribe",
    download_root: Optional[str] = None,
    threads: int = 0,
    checkpoint: Optional[str] = None,
    vad_checkpoint: Optional[str] = None,
    mesh: Any = "auto",
    kv_cache_dtype: str = "auto",
) -> WhisperPipeline:
    """Build the transcription pipeline (reference load_model API, asr.py:259).

    ``whisper_arch`` may be a size name ("large-v2") resolved against the
    local HF cache / ``download_root``, or ``checkpoint`` may point directly
    at a local HF checkpoint directory. ``compute_type`` maps to the on-device
    dtype (bfloat16 is the TPU-native choice; "float16"/"float32" accepted).

    ``mesh``: a ``jax.sharding.Mesh`` to run data/tensor-parallel over, or
    "auto" — build a pure-DP mesh over all local accelerator devices when
    more than one is present (None disables). Chunk batches are then sharded
    on the "data" axis inside ``transcribe`` (the reference's multi-GPU story
    is a host round-trip, whisperx/asr.py:78-80).
    """
    import jax
    import jax.numpy as jnp

    if mesh == "auto":
        mesh = None
        local = jax.local_devices()
        if len(local) > 1 and local[0].platform != "cpu":
            from ..parallel import make_mesh

            mesh = make_mesh(devices=local)

    from ..models.configs import get_whisper_config

    if whisper_arch.endswith(".en"):
        language = "en"

    dtype = {
        "bfloat16": jnp.bfloat16,
        "float16": jnp.bfloat16,  # TPUs prefer bf16; fp16 requests map there
        "int8": jnp.bfloat16,
        "int4": jnp.bfloat16,
        "float32": jnp.float32,
        "default": jnp.bfloat16,
    }.get(compute_type, jnp.bfloat16)

    from ..models.convert import load_whisper, resolve_checkpoint_dir

    path = checkpoint
    if path is None:
        for candidate in (
            whisper_arch,
            f"openai/whisper-{whisper_arch}",
            f"distil-whisper/{whisper_arch}",
        ):
            try:
                path = resolve_checkpoint_dir(candidate, download_root)
                break
            except FileNotFoundError:
                continue
    if path is None:
        raise FileNotFoundError(
            f"No local checkpoint for {whisper_arch!r}. Place an HF whisper "
            "checkpoint dir on disk and pass checkpoint=<dir> (offline loader)."
        )

    whisper_model, params, config = load_whisper(path, dtype=dtype)
    if compute_type in ("int8", "int4"):
        # Weight-only int8/int4 (per-output-channel scales): the TPU analogue
        # of the reference's CT2 compute_type="int8" (whisperx/asr.py:262,288);
        # int4 is the experimental half-width variant (Dense.quant_bits).
        from ..models.whisper import quantize_whisper

        whisper_model, params = quantize_whisper(
            whisper_model, params, bits=4 if compute_type == "int4" else 8
        )

    # Fuse q/k/v into one projection for the per-token decode path (on-chip
    # A/B winner, benchmarks/AB_RESULTS.json r2: 135.6x vs 130.3x). Skipped
    # under tensor-parallel meshes (partition rules target the unfused
    # layout); opt out with WHISPERX_FUSED_QKV=0.
    import os

    tp_size = 1
    if mesh is not None:
        tp_size = dict(zip(mesh.axis_names, mesh.devices.shape)).get("model", 1)
    if os.environ.get("WHISPERX_FUSED_QKV", "1") != "0" and tp_size == 1:
        from ..models.whisper import fuse_whisper_qkv

        whisper_model, params = fuse_whisper_qkv(whisper_model, params)
    tokenizer_backend = WhisperTokenizer.from_pretrained(path, language=language, task=task)
    engine = WhisperEngine(whisper_model, tokenizer_backend)

    tokenizer = None
    if language is not None:
        tokenizer = WhisperTokenizer(
            tokenizer_backend.backend,
            config.n_vocab,
            config.num_languages,
            language=language,
            task=task,
        )

    default_asr = TranscriptionOptions()
    suppress_numerals = False
    if asr_options:
        asr_options = dict(asr_options)
        suppress_numerals = asr_options.pop("suppress_numerals", False)
        default_asr = replace(default_asr, **asr_options)

    default_vad_options = {"vad_onset": 0.500, "vad_offset": 0.363}
    if vad_options:
        default_vad_options.update(vad_options)
    if vad_model is None:
        vad_model = load_vad_model(
            device,
            checkpoint=vad_checkpoint,
            **default_vad_options,
        )

    if kv_cache_dtype == "auto":
        # Quantized weights pair with the int8 KV cache (the A/B'd flagship
        # default — halves decode's dominant HBM stream, token-parity
        # tested); full-precision weights keep the model-dtype cache.
        kv_cache_dtype = "int8" if compute_type in ("int8", "int4") else "model"
    return WhisperPipeline(
        engine=engine,
        params=params,
        vad=vad_model,
        vad_params=default_vad_options,
        options=default_asr,
        tokenizer=tokenizer,
        language=language,
        suppress_numerals=suppress_numerals,
        mesh=mesh,
        kv_cache_dtype=kv_cache_dtype,
    )


def load_test_pipeline(
    *,
    language: Optional[str] = "en",
    seed: int = 0,
    beam_size: int = 1,
    config=None,
    mesh: Any = None,
) -> WhisperPipeline:
    """Random-weight pipeline on the miniature config (tests/benchmarks)."""
    from ..models.configs import TEST_CONFIG
    from ..models.whisper import init_whisper_params
    from ..vad.model import EnergyVAD

    cfg = config or TEST_CONFIG
    model, params = init_whisper_params(cfg, seed=seed)
    backend_tok = WhisperTokenizer.dummy(cfg.n_vocab, language=language or "en")
    engine = WhisperEngine(model, backend_tok)
    tokenizer = (
        WhisperTokenizer.dummy(cfg.n_vocab, language=language) if language else None
    )
    return WhisperPipeline(
        engine=engine,
        params=params,
        vad=VadPipeline(EnergyVAD()),
        vad_params={"vad_onset": 0.5, "vad_offset": 0.363},
        options=TranscriptionOptions(beam_size=beam_size, max_new_tokens=8),
        tokenizer=tokenizer,
        language=language,
        mesh=mesh,
    )
