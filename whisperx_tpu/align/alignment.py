"""Forced alignment: transcript + audio → char/word/sentence timestamps.

Behavioral parity with the reference aligner (whisperx/alignment.py:100-354):
same char cleaning (lowercase, space→``|``, charwise ja/zh), same Punkt
sentence spans with the abbreviation list, same trellis/backtrack semantics,
same pandas-style word/sentence aggregation, NaN interpolation and
same-timestamp sentence merging, same degraded-output fallbacks.

TPU-first difference: the reference runs wav2vec2 and the trellis segment by
segment (its own TODO, alignment.py:215). Here alignable segments are sorted
by length, packed into padded batches, and emissions + trellises for a whole
batch run as single device programs; only the O(T) backtrack walks on host.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any, Iterable, List, Optional, Union

import numpy as np

from ..audio.constants import SAMPLE_RATE
from ..io.languages import LANGUAGES_WITHOUT_SPACES
from ..io.types import AlignedTranscriptionResult, SingleAlignedSegment, SingleSegment
from ..models.configs import WAV2VEC2_BASE, WAV2VEC2_LARGE, WAV2VEC2_TEST
from ..ops.ctc import PathPoint, align_tokens_batch, merge_repeats
from ..utils import interpolate_nans
from .registry import (
    DEFAULT_ALIGN_MODELS_HF,
    DEFAULT_ALIGN_MODELS_TORCH,
    TORCH_BUNDLE_TO_HF,
    default_align_model,
)

from .sentences import PUNKT_ABBREVIATIONS, sentence_spans


@dataclass
class AlignModel:
    """Bundle of the JAX wav2vec2 and its char vocabulary."""

    model: Any  # Wav2Vec2ForCTC (flax module)
    params: Any
    dictionary: dict  # lowercase char -> token id
    language: str
    blank_id: int = 0
    max_batch: int = 8
    # Optional jax.sharding.Mesh: align batches run data-parallel over the
    # "data" axis (rows sharded, params placed by W2V2 partition rules). The
    # reference has no distributed alignment at all (whisperx/alignment.py
    # runs segment-by-segment on one device, its TODO at alignment.py:215).
    mesh: Any = None


def shard_align_model(align_model: AlignModel, mesh) -> AlignModel:
    """Return a copy of the align model placed on a (data, model) mesh.

    Params shard by the wav2vec2 tensor-parallel rules (replicated wherever
    a dim does not divide the "model" axis); align() then shards each fixed
    batch's rows over "data" and runs the fused program under the mesh, so
    pjit emits the collectives.
    """
    from dataclasses import replace as _replace

    from ..parallel import W2V2_RULES, shard_params

    params = shard_params(align_model.params, mesh, rules=W2V2_RULES)
    # Round the batch up to a data-axis multiple so rows tile the mesh.
    n_data = int(mesh.devices.shape[0])
    max_batch = -(-align_model.max_batch // n_data) * n_data
    return _replace(align_model, params=params, mesh=mesh, max_batch=max_batch)


def _find_blank_id(dictionary: dict) -> int:
    for char, code in dictionary.items():
        if char in ("[pad]", "<pad>"):
            return code
    return 0


def load_align_model(
    language_code: str,
    device=None,
    model_name: Optional[str] = None,
    model_dir: Optional[str] = None,
    compute_type: Optional[str] = None,
):
    """Build the alignment model + metadata (reference alignment.py:64-97 API).

    ``model_name`` may be a local HF checkpoint directory (offline), an HF hub
    id (resolved through the local cache), or a torchaudio bundle name (mapped
    to its HF twin). ``compute_type="int8"`` weight-only quantizes the
    wav2vec2 transformer (emissions head stays fp — see quantize_wav2vec2).
    Returns (AlignModel, {"language", "dictionary", "type"}).
    """
    if model_name is None:
        model_name = default_align_model(language_code)
    model_name = TORCH_BUNDLE_TO_HF.get(model_name, model_name)

    from ..models.convert import load_wav2vec2

    model, params, dictionary = load_wav2vec2(model_name, cache_dir=model_dir)
    if compute_type == "int8":
        from ..models.wav2vec2 import quantize_wav2vec2

        model, params = quantize_wav2vec2(model, params)
    align_model = AlignModel(
        model=model,
        params=params,
        dictionary={c.lower(): i for c, i in dictionary.items()},
        language=language_code,
        blank_id=_find_blank_id(dictionary),
    )
    metadata = {
        "language": language_code,
        "dictionary": align_model.dictionary,
        "type": "jax",
    }
    return align_model, metadata


def test_align_model(
    language: str = "en", seed: int = 0, config=None, dtype=None
) -> AlignModel:
    """Random-weight align model with an a-z dictionary (tests/benchmarks).

    ``config`` defaults to the miniature test architecture; pass
    WAV2VEC2_BASE for realistic benchmark cost. ``dtype`` sets the compute
    dtype (e.g. bf16 on TPU)."""
    from ..models.wav2vec2 import Wav2Vec2ForCTC, init_wav2vec2_params

    cfg = config or WAV2VEC2_TEST
    model, params = init_wav2vec2_params(cfg, seed=seed)
    if dtype is not None:
        model = Wav2Vec2ForCTC(cfg, dtype=dtype)
    chars = ["[pad]", "|", "'"] + [chr(c) for c in range(ord("a"), ord("z") + 1)]
    dictionary = {c: i for i, c in enumerate(chars)}
    return AlignModel(model, params, dictionary, language, blank_id=0)


# Not a pytest test — keep pytest from collecting this factory when imported
# into test modules.
test_align_model.__test__ = False


def _sentence_spans(text: str):
    # Host splitter replacing nltk punkt (align/sentences.py; parity-tested
    # against PunktSentenceTokenizer in tests/test_align.py).
    return sentence_spans(text, PUNKT_ABBREVIATIONS)


def _preprocess_segment(text: str, dictionary: dict, charwise: bool):
    """Clean chars to the model vocabulary, tracking original indices."""
    num_leading = len(text) - len(text.lstrip())
    num_trailing = len(text) - len(text.rstrip())

    clean_char, clean_cdx = [], []
    for cdx, char in enumerate(text):
        c = char.lower()
        if not charwise:
            c = c.replace(" ", "|")
        if cdx < num_leading or cdx > len(text) - num_trailing - 1:
            continue
        if c in dictionary:
            clean_char.append(c)
            clean_cdx.append(cdx)

    per_word = text if charwise else text.split(" ")
    clean_wdx = [
        wdx for wdx, wrd in enumerate(per_word) if any(c.lower() in dictionary for c in wrd)
    ]
    return clean_char, clean_cdx, clean_wdx


_EMISSION_FWD_CACHE: dict = {}


def _emission_fwd(model):
    """Per-module jitted emission forward, cached so repeated align() calls
    (one per file in the CLI loop) reuse compiled programs instead of
    retracing — compiles cost minutes on a remote TPU relay."""
    import jax

    fwd = _EMISSION_FWD_CACHE.get(model)
    if fwd is None:
        fwd = jax.jit(
            lambda p, a, sl: jax.nn.log_softmax(
                model.apply({"params": p}, _wav_f32(a), sample_lengths=sl), axis=-1
            )
        )
        _EMISSION_FWD_CACHE[model] = fwd
    return fwd


def _wav_f32(wavs):
    """int16 device uploads → float32/32768 (trace-time dtype branch)."""
    import jax.numpy as jnp

    if jnp.issubdtype(wavs.dtype, jnp.integer):
        return wavs.astype(jnp.float32) / 32768.0
    return wavs


_FUSED_ALIGN_CACHE: dict = {}


def _fused_align_fwd(model, blank: int, backend: str):
    """One jit: waveforms → wav2vec2 emissions → CTC trellis → device
    backtrack. Only the small path arrays ((B, T') ints/floats) ever reach
    the host — the (B, T', V) emissions stay in HBM, which removes a
    device→host→device round trip per batch (expensive through a TPU relay).
    Cached per (module, blank, backend) like _emission_fwd."""
    import jax

    from ..ops.ctc import ctc_align_batch_device

    key = (model, blank, backend)
    fwd = _FUSED_ALIGN_CACHE.get(key)
    if fwd is None:

        @jax.jit
        def fwd(params, wavs, tok_pack):
            import jax.numpy as jnp

            # tok_pack (B, N+2) int32 = [tokens | sample_len | n_len] — the
            # three small inputs travel as ONE upload (each separate
            # host→device transfer through a remote TPU relay pays a full
            # ~25 ms round trip).
            tokens = tok_pack[:, :-2]
            sample_lens = tok_pack[:, -2]
            n_len = tok_pack[:, -1]
            logits = model.apply(
                {"params": params}, _wav_f32(wavs), sample_lengths=sample_lens
            )
            logp = jax.nn.log_softmax(logits, axis=-1)
            t_len = model.feature_lengths(sample_lens)
            tok_idx, probs, active, success, _t_start = ctc_align_batch_device(
                logp, tokens, t_len, n_len, blank=blank, backend=backend
            )
            # ONE output buffer (3, B, T'+1): plane 0 = token path index,
            # plane 1 = probs, plane 2 = active mask, and the extra trailing
            # column carries [success, t_len] — a single device→host fetch.
            # tok_idx < N, active ∈ {0,1}, t_len ≤ T' are exact in float32.
            pack = jnp.stack(
                [tok_idx.astype(jnp.float32), probs, active.astype(jnp.float32)]
            )  # (3, B, T')
            tail = jnp.stack(
                [
                    success.astype(jnp.float32),
                    t_len.astype(jnp.float32),
                    jnp.zeros_like(t_len, jnp.float32),
                ]
            )  # (3, B)
            return jnp.concatenate([pack, tail[:, :, None]], axis=2)

        _FUSED_ALIGN_CACHE[key] = fwd
    return fwd


def _ladder_rows(n: int, max_batch: int, mesh=None) -> int:
    """Round a tail batch up on the halving ladder {B, B/2, B/4}.

    Bounds compile signatures (≤3 row counts per length bucket) while
    cutting the padding FLOPs of partial batches. Under a mesh, rows stay a
    multiple of the data axis so batches tile it.
    """
    floor = 1
    if mesh is not None:
        floor = int(mesh.devices.shape[0])
    for rows in (max_batch // 4, max_batch // 2, max_batch):
        if rows >= max(n, floor, 1) and rows % max(floor, 1) == 0:
            return rows
    return max_batch


def _batched_emissions(align_model: AlignModel, slices: List[np.ndarray]):
    """Run wav2vec2 over length-sorted padded batches → per-segment
    (log_probs (T', V), T') on host."""
    import jax.numpy as jnp

    model, params = align_model.model, align_model.params

    order = sorted(range(len(slices)), key=lambda i: len(slices[i]))
    results: List[Any] = [None] * len(slices)

    def bucket_len(n: int) -> int:
        # Pad to the next multiple of WHISPERX_ALIGN_BUCKET_S seconds
        # (default 1 s): bounds distinct compile shapes; coarser buckets
        # trade padding FLOPs for fewer compile signatures.
        b = int(float(os.environ.get("WHISPERX_ALIGN_BUCKET_S", "1")) * 16000)
        return max(b, -(-n // b) * b)

    fwd = _emission_fwd(model)

    B = align_model.max_batch
    i = 0
    while i < len(order):
        batch_idx = order[i : i + B]
        max_len = bucket_len(max(len(slices[j]) for j in batch_idx))
        # Tail batches round up on a halving ladder (B, B/2, B/4) instead of
        # always padding to max_batch: ≤3 row signatures per length bucket,
        # and a half-full tail pays half the wav2vec2 FLOPs (the r3
        # align-batch16 A/B regression was exactly this padding tax).
        rows = _ladder_rows(len(batch_idx), B, align_model.mesh)
        # Keep the slices' dtype: under WHISPERX_WAV_INT16=1 they are int16
        # PCM and _wav_f32 rescales (/32768) on device — copying into a
        # float32 buffer here would skip the dequantization and feed
        # 32768x-scaled audio to wav2vec2.
        wavs = np.zeros((rows, max_len), slices[batch_idx[0]].dtype)
        lens = np.zeros((rows,), np.int32)
        for row, j in enumerate(batch_idx):
            wavs[row, : len(slices[j])] = slices[j]
            lens[row] = len(slices[j])
        lens = np.maximum(lens, 400)  # avoid zero-length conv edge on pad rows
        if align_model.mesh is not None:
            import jax

            from ..parallel import shard_batch

            with jax.set_mesh(align_model.mesh):
                logp = np.asarray(
                    fwd(params, shard_batch(align_model.mesh, wavs), shard_batch(align_model.mesh, lens))
                )
        else:
            logp = np.asarray(fwd(params, jnp.asarray(wavs), jnp.asarray(lens)))
        frame_lens = np.asarray(model.feature_lengths(jnp.asarray(lens)))
        for row, j in enumerate(batch_idx):
            results[j] = (logp[row], int(frame_lens[row]))
        i += B
    return results


class AlignJob:
    """Deferred alignment handle (no reference counterpart).

    ``align_begin`` dispatches all device work (wav2vec2 emissions + CTC
    trellis + backtrack, one program per batch) WITHOUT blocking on results;
    ``finish()`` fetches them and runs the host aggregation passes. Callers
    that have more device work to enqueue (the next file's decode batches,
    the next align batch) dispatch it between the two so host post-processing
    overlaps accelerator compute — the reference aligns strictly serially
    (whisperx/alignment.py:174, segment loop on one device).
    """

    def __init__(self, finish_fn):
        self._finish_fn = finish_fn
        self._result = None

    def finish(self) -> AlignedTranscriptionResult:
        if self._finish_fn is not None:
            self._result = self._finish_fn()
            self._finish_fn = None
        return self._result


def align(
    transcript: Iterable[SingleSegment],
    model: AlignModel,
    align_model_metadata: dict,
    audio: Union[str, np.ndarray],
    device=None,
    interpolate_method: str = "nearest",
    return_char_alignments: bool = False,
    print_progress: bool = False,
    combined_progress: bool = False,
) -> AlignedTranscriptionResult:
    """Align transcription segments to the audio (reference align() API)."""
    return align_begin(
        transcript,
        model,
        align_model_metadata,
        audio,
        device,
        interpolate_method=interpolate_method,
        return_char_alignments=return_char_alignments,
        print_progress=print_progress,
        combined_progress=combined_progress,
    ).finish()


def align_begin(
    transcript: Iterable[SingleSegment],
    model: AlignModel,
    align_model_metadata: dict,
    audio: Union[str, np.ndarray],
    device=None,
    interpolate_method: str = "nearest",
    return_char_alignments: bool = False,
    print_progress: bool = False,
    combined_progress: bool = False,
) -> AlignJob:
    """Dispatch alignment device work; see AlignJob for the overlap contract."""
    from ..audio.io import load_audio

    import time as _time

    _t0 = _time.perf_counter()
    if isinstance(audio, str):
        audio = load_audio(audio)
    audio = np.asarray(audio, dtype=np.float32).reshape(-1)
    max_duration = len(audio) / SAMPLE_RATE

    # Device uploads in int16 PCM: half the relay bytes per align batch
    # (bit-exact for s16le-decoded audio; WHISPERX_WAV_INT16=0 opts out).
    audio_up = audio
    if os.environ.get("WHISPERX_WAV_INT16", "1") == "1":
        from ..audio.io import pcm16

        audio_up = pcm16(audio)

    dictionary = align_model_metadata["dictionary"]
    lang = align_model_metadata["language"]
    charwise = lang in LANGUAGES_WITHOUT_SPACES

    transcript = list(transcript)
    total = len(transcript)

    # ---- pass 1: clean text + sentence spans -------------------------------
    for sdx, segment in enumerate(transcript):
        if print_progress:
            base = ((sdx + 1) / total) * 100
            pct = (50 + base / 2) if combined_progress else base
            print(f"Progress: {pct:.2f}%...")
        clean_char, clean_cdx, clean_wdx = _preprocess_segment(
            segment["text"], dictionary, charwise
        )
        segment["clean_char"] = clean_char
        segment["clean_cdx"] = clean_cdx
        segment["clean_wdx"] = clean_wdx
        segment["sentence_spans"] = _sentence_spans(segment["text"])

    # ---- pass 2: batched emissions + trellis for alignable segments -------
    alignable: List[int] = []
    slices: List[np.ndarray] = []
    token_lists: List[List[int]] = []
    for sdx, segment in enumerate(transcript):
        if len(segment["clean_char"]) == 0 or segment["start"] >= max_duration:
            continue
        f1 = int(segment["start"] * SAMPLE_RATE)
        f2 = int(segment["end"] * SAMPLE_RATE)
        wav = audio_up[f1:f2]
        if len(wav) < 400:  # wav2vec2 minimum receptive field
            wav = np.pad(wav, (0, 400 - len(wav)))
        alignable.append(sdx)
        slices.append(wav)
        token_lists.append([dictionary[c] for c in segment["clean_char"]])

    paths_by_sdx = {}
    frames_by_sdx = {}
    pendings: List[tuple] = []
    consume = None
    host_backtrack = None
    if alignable and os.environ.get("WHISPERX_CTC_BACKTRACK", "device") == "host":
        # Two-stage escape hatch: emissions to host, numpy reference walk.
        # Runs entirely at finish() time — it blocks on device results by
        # construction, so there is nothing useful to dispatch early.
        def host_backtrack():
            emissions = _batched_emissions(model, slices)
            B = model.max_batch
            for i in range(0, len(alignable), B):
                idx = list(range(i, min(i + B, len(alignable))))
                T_max = max(emissions[j][0].shape[0] for j in idx)
                logp = np.stack(
                    [
                        np.pad(
                            emissions[j][0],
                            ((0, T_max - emissions[j][0].shape[0]), (0, 0)),
                        )
                        for j in idx
                    ]
                )
                n_real = len(idx)
                if n_real < B:
                    logp = np.pad(logp, ((0, B - n_real), (0, 0), (0, 0)))
                group_tokens = [token_lists[j] for j in idx] + [
                    [model.blank_id or 1]
                ] * (B - n_real)
                group_tlens = [emissions[j][1] for j in idx] + [1] * (B - n_real)
                paths = align_tokens_batch(
                    logp,
                    group_tokens,
                    group_tlens,
                    blank=model.blank_id,
                )
                for row, j in enumerate(idx):
                    paths_by_sdx[alignable[j]] = paths[row]
                    frames_by_sdx[alignable[j]] = emissions[j][1]
    elif alignable:
        # Fused device path: audio → emissions → trellis → backtrack in ONE
        # jit per (batch, bucket, token) signature. Every batch is dispatched
        # up front (JAX dispatch is non-blocking; each pending output is a
        # small (3, B, T'+1) pack) and consumed at finish() time, so host
        # path-decoding overlaps device compute — including any decode work
        # the caller enqueues between begin and finish. The reference aligns
        # segment-by-segment on CPU (its TODO at alignment.py:215).
        import jax.numpy as jnp

        backend = os.environ.get("WHISPERX_CTC_BACKEND", "scan")
        fwd = _fused_align_fwd(model.model, model.blank_id, backend)
        B = model.max_batch
        order = sorted(range(len(alignable)), key=lambda k: len(slices[k]))

        def bucket_len(n: int) -> int:
            # Pad to the next multiple of WHISPERX_ALIGN_BUCKET_S seconds
            # (default 1 s): bounds distinct compile shapes; coarser buckets
            # trade padding FLOPs for fewer compile signatures.
            b = int(float(os.environ.get("WHISPERX_ALIGN_BUCKET_S", "1")) * 16000)
            return max(b, -(-n // b) * b)

        def consume(pending):
            idx, out = pending
            pack = np.asarray(out)  # (3, B, T'+1) — ONE device→host fetch
            tok_idx = pack[0, :, :-1].astype(np.int32)
            probs = pack[1, :, :-1]
            active = pack[2, :, :-1] != 0.0
            success = pack[0, :, -1] != 0.0
            t_len = pack[1, :, -1].astype(np.int32)
            T = tok_idx.shape[1]
            times = T - 1 - np.arange(T)
            for row, k in enumerate(idx):
                sdx = alignable[k]
                frames_by_sdx[sdx] = int(t_len[row])
                if not success[row]:
                    paths_by_sdx[sdx] = None
                    continue
                ks = np.nonzero(active[row])[0]
                paths_by_sdx[sdx] = [
                    PathPoint(int(tok_idx[row, x]), int(times[x]), float(probs[row, x]))
                    for x in ks
                ][::-1]

        for i in range(0, len(order), B):
            idx = order[i : i + B]
            max_len = bucket_len(max(len(slices[k]) for k in idx))
            N_true = max(len(token_lists[k]) for k in idx)
            N = max(64, -(-N_true // 64) * 64)
            # Tail batches shrink on the halving ladder (see _ladder_rows).
            rows = _ladder_rows(len(idx), B, model.mesh)
            wavs = np.zeros((rows, max_len), audio_up.dtype)
            # tok_pack = [tokens | sample_len | n_len]: one small upload.
            tok_pack = np.zeros((rows, N + 2), np.int32)
            tok_pack[:, 0] = model.blank_id or 1
            tok_pack[:, N + 1] = 1  # padding rows: 1 dummy token
            for row, k in enumerate(idx):
                wavs[row, : len(slices[k])] = slices[k]
                tok_pack[row, : len(token_lists[k])] = token_lists[k]
                tok_pack[row, N] = len(slices[k])
                tok_pack[row, N + 1] = len(token_lists[k])
            # avoid zero-length conv edge on pad rows
            tok_pack[:, N] = np.maximum(tok_pack[:, N], 400)
            if model.mesh is not None:
                import jax

                from ..parallel import shard_batch

                with jax.set_mesh(model.mesh):
                    out = fwd(
                        model.params,
                        shard_batch(model.mesh, wavs),
                        shard_batch(model.mesh, tok_pack),
                    )
            else:
                out = fwd(model.params, jnp.asarray(wavs), jnp.asarray(tok_pack))
            pendings.append((idx, out))
            # Bound the dispatch window: each pending batch keeps its padded
            # waveform upload alive on device, so unlimited in-flight batches
            # would scale peak HBM + transfer-queue depth with file length
            # (multi-hour inputs). Consuming the oldest blocks on a result
            # that was dispatched WHISPERX_ALIGN_INFLIGHT batches ago — by
            # then it is normally already done, so overlap is preserved.
            max_inflight = int(os.environ.get("WHISPERX_ALIGN_INFLIGHT", "8"))
            while len(pendings) > max(1, max_inflight):
                consume(pendings.pop(0))

    # Telemetry counts only time spent inside align's own phases: the begin
    # span plus the finish span — not the overlap window in between, where
    # the caller's decode work runs.
    begin_s = _time.perf_counter() - _t0

    def _finish() -> AlignedTranscriptionResult:
        _tf = _time.perf_counter()
        if host_backtrack is not None:
            host_backtrack()
        for pending in pendings:
            consume(pending)
        return _aggregate_result(
            transcript,
            paths_by_sdx,
            frames_by_sdx,
            max_duration,
            charwise,
            interpolate_method,
            return_char_alignments,
            begin_s,
            _tf,
        )

    return AlignJob(_finish)


def _aggregate_result(
    transcript,
    paths_by_sdx,
    frames_by_sdx,
    max_duration,
    charwise,
    interpolate_method,
    return_char_alignments,
    begin_s,
    _tf,
) -> AlignedTranscriptionResult:
    """Pass 3: char → word → sentence aggregation (host-only, numpy)."""
    import time as _time

    from ..utils import telemetry

    # ---- pass 3: char → word → sentence aggregation ------------------------
    aligned_segments: List[SingleAlignedSegment] = []
    for sdx, segment in enumerate(transcript):
        t1, t2, text = segment["start"], segment["end"], segment["text"]
        fallback: SingleAlignedSegment = {"start": t1, "end": t2, "text": text, "words": []}
        if return_char_alignments:
            fallback["chars"] = []

        if len(segment["clean_char"]) == 0:
            print(
                f'Failed to align segment ("{text}"): no characters in this '
                "segment found in model dictionary, resorting to original..."
            )
            aligned_segments.append(fallback)
            continue
        if t1 >= max_duration:
            print(
                f'Failed to align segment ("{text}"): original start time '
                "longer than audio duration, skipping..."
            )
            aligned_segments.append(fallback)
            continue

        path = paths_by_sdx.get(sdx)
        if path is None:
            print(f'Failed to align segment ("{text}"): backtrack failed, resorting to original...')
            aligned_segments.append(fallback)
            continue

        text_clean = "".join(segment["clean_char"])
        char_spans = merge_repeats(path, text_clean)
        duration = t2 - t1
        ratio = duration / frames_by_sdx[sdx]

        # Per-char timestamp arrays over the ORIGINAL text (NaN = unaligned),
        # plus the word index of every character. Plain numpy — this replaces
        # the reference's pandas DataFrame aggregation
        # (whisperx/alignment.py:284-347) with the same semantics.
        n_chars = len(text)
        starts = np.full(n_chars, np.nan)
        ends = np.full(n_chars, np.nan)
        scores = np.full(n_chars, np.nan)
        word_of_char = np.zeros(n_chars, np.int64)
        word_idx = 0
        for cdx, char in enumerate(text):
            word_of_char[cdx] = word_idx
            if charwise:
                word_idx += 1
            elif cdx == n_chars - 1 or text[cdx + 1] == " ":
                word_idx += 1
        for k, cdx in enumerate(segment["clean_cdx"]):
            span = char_spans[k]
            starts[cdx] = round(span.start * ratio + t1, 3)
            ends[cdx] = round(span.end * ratio + t1, 3)
            scores[cdx] = round(span.score, 3)

        def _nanreduce(fn, a):
            a = a[~np.isnan(a)]
            return fn(a) if a.size else np.nan

        subsegments = []
        for sstart, send in segment["sentence_spans"]:
            # Reference quirk: the sentence selection is index <= send —
            # inclusive of the char AT the span end (usually the following
            # space) — so keep it.
            sel = slice(sstart, min(send, n_chars - 1) + 1)
            sel_chars = text[sel]
            non_space = np.array([c != " " for c in sel_chars], bool)
            sentence_start = _nanreduce(np.min, starts[sel])
            sentence_end = _nanreduce(np.max, ends[sel][non_space])

            sentence_words = []
            for w_idx in np.unique(word_of_char[sel]):  # ascending == appearance order
                in_word = word_of_char[sel] == w_idx
                word_text = "".join(c for c, m in zip(sel_chars, in_word) if m).strip()
                if not word_text:
                    continue
                keep = in_word & non_space
                word_start = _nanreduce(np.min, starts[sel][keep])
                word_end = _nanreduce(np.max, ends[sel][keep])
                word_score = round(_nanreduce(np.mean, scores[sel][keep]), 3)

                word_seg = {"word": word_text}
                if not np.isnan(word_start):
                    word_seg["start"] = word_start
                if not np.isnan(word_end):
                    word_seg["end"] = word_end
                if not np.isnan(word_score):
                    word_seg["score"] = word_score
                sentence_words.append(word_seg)

            sub = {
                "text": text[sstart:send],
                "start": sentence_start,
                "end": sentence_end,
                "words": sentence_words,
            }
            if return_char_alignments:
                sub["chars"] = [
                    {
                        k: v
                        for k, v in (
                            ("char", c),
                            ("start", starts[cdx]),
                            ("end", ends[cdx]),
                            ("score", scores[cdx]),
                        )
                        if not (isinstance(v, float) and np.isnan(v))
                    }
                    for cdx, c in zip(range(sstart, min(send, n_chars - 1) + 1), sel_chars)
                ]
            subsegments.append(sub)

        # Heal missing sentence times, then merge sentences that landed on
        # identical (start, end) — value-grouped and key-sorted, and NaN-keyed
        # rows dropped, exactly like the reference's pandas groupby
        # (whisperx/alignment.py:336-347).
        sub_starts = interpolate_nans([s["start"] for s in subsegments], method=interpolate_method)
        sub_ends = interpolate_nans([s["end"] for s in subsegments], method=interpolate_method)
        joiner = "" if charwise else " "
        groups: dict = {}
        for sub, g_start, g_end in zip(subsegments, sub_starts, sub_ends):
            if np.isnan(g_start) or np.isnan(g_end):
                continue
            key = (float(g_start), float(g_end))
            grp = groups.get(key)
            if grp is None:
                grp = groups[key] = {
                    "start": key[0], "end": key[1], "text": [], "words": [],
                }
                if return_char_alignments:
                    grp["chars"] = []
            grp["text"].append(sub["text"])
            grp["words"].extend(sub["words"])
            if return_char_alignments:
                grp["chars"].extend(sub["chars"])
        for key in sorted(groups):
            grp = groups[key]
            grp["text"] = joiner.join(grp["text"])
            aligned_segments.append(grp)

    word_segments = []
    for segment in aligned_segments:
        word_segments += segment["words"]

    telemetry.GLOBAL.record(
        "align",
        seconds=begin_s + (_time.perf_counter() - _tf),
        audio_seconds=sum(
            max(0.0, float(s["end"]) - float(s["start"])) for s in transcript
        ),
    )
    return {"segments": aligned_segments, "word_segments": word_segments}
