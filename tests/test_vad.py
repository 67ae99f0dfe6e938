"""VAD binarize/min-cut/merge tests over synthetic score arrays (SURVEY §4)."""

import numpy as np
import pytest

from whisperx_tpu.vad import (
    EnergyVAD,
    VadPipeline,
    binarize,
    binarize_and_merge,
    merge_chunks,
    SpeechTurn,
)


def grid(n, step=0.1):
    return np.arange(n) * step + step / 2


def test_binarize_simple_hysteresis():
    # active frames 10..19 (score .9), rest 0.1
    scores = np.full(30, 0.1)
    scores[10:20] = 0.9
    turns = binarize(scores, grid(30), onset=0.5, offset=0.4)
    assert len(turns) == 1
    t = turns[0]
    assert abs(t.start - grid(30)[10]) < 1e-9
    assert abs(t.end - grid(30)[20]) < 1e-9


def test_binarize_hysteresis_band():
    # dips to 0.45 shouldn't deactivate when offset=0.4 but should with 0.5
    scores = np.full(30, 0.1)
    scores[5:25] = 0.9
    scores[15] = 0.45
    turns = binarize(scores, grid(30), onset=0.5, offset=0.4)
    assert len(turns) == 1
    turns2 = binarize(scores, grid(30), onset=0.5, offset=0.5)
    assert len(turns2) == 2


def test_binarize_min_cut():
    """A long active region must be split at the min score in the 2nd half."""
    n = 100
    scores = np.full(n, 0.9)
    scores[70] = 0.55  # the min, in the second half of the running window
    ts = grid(n, 0.1)
    turns = binarize(scores, ts, onset=0.5, offset=0.4, max_duration=8.0)
    assert len(turns) >= 2
    # First cut lands exactly at frame 70's timestamp.
    assert any(abs(t.end - ts[70]) < 1e-9 for t in turns)
    # no piece exceeds max_duration (with half-window guarantee)
    for t in turns:
        assert t.duration <= 8.0 + 0.2


def test_min_cut_pieces_at_least_half_window():
    n = 400
    rng = np.random.default_rng(0)
    scores = 0.6 + 0.35 * rng.random(n)
    ts = grid(n, 0.1)
    turns = binarize(scores, ts, onset=0.5, offset=0.4, max_duration=10.0)
    assert len(turns) > 1
    for t in turns[:-1]:
        assert t.duration >= 5.0 - 0.2


def test_min_duration_on():
    scores = np.full(30, 0.1)
    scores[5:7] = 0.9  # 0.2s blip
    scores[15:25] = 0.9
    turns = binarize(scores, grid(30), onset=0.5, offset=0.4, min_duration_on=0.5)
    assert len(turns) == 1


def test_merge_chunks_packing():
    turns = [SpeechTurn(0.0, 10.0), SpeechTurn(11.0, 20.0), SpeechTurn(21.0, 29.0), SpeechTurn(35.0, 40.0)]
    chunks = merge_chunks(turns, 30.0)
    assert len(chunks) == 2
    assert chunks[0]["start"] == 0.0 and chunks[0]["end"] == 29.0
    assert len(chunks[0]["segments"]) == 3
    assert chunks[1]["start"] == 35.0 and chunks[1]["end"] == 40.0


def test_merge_chunks_never_exceeds_chunk_size():
    rng = np.random.default_rng(1)
    t = 0.0
    turns = []
    for _ in range(50):
        t += rng.uniform(0.2, 2.0)
        dur = rng.uniform(0.5, 12.0)
        turns.append(SpeechTurn(t, t + dur))
        t += dur
    # pre-cut by binarize contract: all turns <= 30s already
    chunks = merge_chunks(turns, 30.0)
    for c in chunks:
        assert c["end"] - c["start"] <= 30.0 + 1e-6
    # every turn appears exactly once
    total = sum(len(c["segments"]) for c in chunks)
    assert total == len(turns)


def test_binarize_and_merge_empty():
    scores = np.full(50, 0.1)
    assert binarize_and_merge(scores, grid(50)) == []


def test_energy_vad_finds_speech():
    sr = 16000
    rng = np.random.default_rng(2)
    quiet = rng.standard_normal(sr) * 1e-4
    loud = np.sin(2 * np.pi * 220 * np.arange(2 * sr) / sr).astype(np.float64) * 0.5
    loud *= 1 + 0.3 * np.sin(2 * np.pi * 3 * np.arange(2 * sr) / sr)  # AM, speech-ish
    audio = np.concatenate([quiet, loud, quiet]).astype(np.float32)

    pipeline = VadPipeline(EnergyVAD())
    chunks = pipeline(audio, chunk_size=30.0)
    assert len(chunks) >= 1
    s, e = chunks[0]["start"], chunks[-1]["end"]
    assert 0.5 < s < 1.5  # speech starts ~1.0s
    assert 2.4 < e < 3.6  # ends ~3.0s


def test_neural_vad_shapes():
    """Random-weight PyanNet: correct frame grid + [0,1] scores."""
    from whisperx_tpu.models.vad_net import init_vad_params
    from whisperx_tpu.vad.model import NeuralVAD

    model, params = init_vad_params(seed=0)
    vad = NeuralVAD(model, params, window=5.0, step=2.5)
    audio = np.random.default_rng(3).standard_normal(7 * 16000).astype(np.float32) * 0.1
    vs = vad(audio)
    assert vs.scores.ndim == 1
    assert vs.scores.shape == vs.timestamps.shape
    assert (vs.scores >= 0).all() and (vs.scores <= 1).all()
    assert abs(vs.timestamps[1] - vs.timestamps[0] - 270 / 16000) < 1e-6


def test_merge_vad_pads_and_fills_gaps():
    """merge_vad (reference vad.py:243-262): pad, gap-fill, min-duration."""
    from whisperx_tpu.vad import merge_vad

    segs = [(1.0, 2.0), (2.3, 3.0), (5.0, 5.05)]
    turns = merge_vad(segs, pad_onset=0.1, pad_offset=0.1, min_duration_off=0.5)
    # First two merge (gap 0.3-0.2 padding < 0.5); third stays.
    assert len(turns) == 2
    assert abs(turns[0].start - 0.9) < 1e-9 and abs(turns[0].end - 3.1) < 1e-9
    # min_duration_on filters the short tail turn.
    turns = merge_vad(segs, pad_onset=0.1, pad_offset=0.1, min_duration_off=0.5,
                      min_duration_on=0.5)
    assert len(turns) == 1


def test_merge_vad_no_options_passthrough():
    from whisperx_tpu.vad import merge_vad

    segs = [(3.0, 4.0), (1.0, 2.0)]
    turns = merge_vad(segs)
    assert [(t.start, t.end) for t in turns] == [(1.0, 2.0), (3.0, 4.0)]


def test_vad_checkpoint_sha256_verification(tmp_path):
    """SHA256 gate mirrors the reference's pinned-checkpoint check
    (whisperx/vad.py:46-49): strict with an expectation, warning otherwise."""
    import hashlib
    import warnings

    import pytest

    from whisperx_tpu.vad.model import verify_checkpoint_sha256

    ckpt = tmp_path / "weights.bin"
    ckpt.write_bytes(b"definitely not the pinned checkpoint")
    digest = hashlib.sha256(ckpt.read_bytes()).hexdigest()

    assert verify_checkpoint_sha256(str(ckpt), digest) == digest
    with pytest.raises(RuntimeError, match="SHA256 mismatch"):
        verify_checkpoint_sha256(str(ckpt), "0" * 64)
    with pytest.warns(UserWarning, match="pinned reference"):
        verify_checkpoint_sha256(str(ckpt), None)


def test_speechband_vad_rejects_music_keeps_speech():
    """SpeechBandVAD (the weight-free default for real runs,
    vad/model.py:load_vad_model): syllabic-modulated speech-band audio
    scores high; sustained music and noise beds gate toward zero —
    EnergyVAD's classic false positives (benchmarks/vad_eval.py)."""
    import numpy as np

    from benchmarks.vad_eval import build_corpus, eval_scorer
    from whisperx_tpu.vad.model import EnergyVAD, SpeechBandVAD

    rng = np.random.default_rng(0)
    audio, truth = build_corpus(rng, 60.0)
    sb = eval_scorer("speechband", SpeechBandVAD(), audio, truth)
    en = eval_scorer("energy", EnergyVAD(), audio, truth)
    assert sb["frame"]["f1"] > 0.85
    assert sb["frame"]["f1"] > en["frame"]["f1"]
    assert sb["frame"]["precision"] > 0.85  # music/noise rejected


def test_vad_pipeline_honors_scorer_min_duration():
    from whisperx_tpu.vad.model import EnergyVAD, SpeechBandVAD, VadPipeline

    assert VadPipeline(SpeechBandVAD()).min_duration_on == 0.5
    assert VadPipeline(EnergyVAD()).min_duration_on == 0.0
    assert VadPipeline(SpeechBandVAD(), min_duration_on=0.1).min_duration_on == 0.1


def test_frame_sq_sums_matches_bruteforce():
    """_frame_sq_sums (reduceat segment sums + float64 frame cumsum) must
    match the brute-force per-window float64 sum — it replaced the O(n)
    per-sample float64 cumsum that dominated the host VAD tax."""
    from whisperx_tpu.vad.model import FRAME_SIZE, FRAME_STEP, _frame_sq_sums

    rng = np.random.default_rng(0)
    for n in (FRAME_SIZE, FRAME_SIZE + 1, FRAME_SIZE + FRAME_STEP * 7 + 3, 16000 * 5):
        x = rng.standard_normal(n).astype(np.float32) * 0.3
        total_frames = (n - FRAME_SIZE) // FRAME_STEP + 1
        starts = np.arange(total_frames) * FRAME_STEP
        got = _frame_sq_sums(x, starts, FRAME_SIZE)
        want = np.array(
            [np.sum(x[s : s + FRAME_SIZE].astype(np.float64) ** 2) for s in starts]
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
