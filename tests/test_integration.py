"""Full-pipeline integration: transcribe → align → diarize → write.

Random weights (no network), synthetic two-speaker audio; asserts the
structural contracts of every stage composing through the public API —
the CPU-runnable analogue of BASELINE config 1/5 plumbing.
"""

import json

import numpy as np
import pytest

SR = 16000


def _two_speaker_speechish():
    t1 = np.arange(2 * SR) / SR
    sp1 = 0.4 * np.sin(2 * np.pi * 180 * t1) * (1 + 0.5 * np.sin(2 * np.pi * 3 * t1))
    t2 = np.arange(2 * SR) / SR
    sp2 = 0.4 * np.sin(2 * np.pi * 1100 * t2) * (1 + 0.5 * np.sin(2 * np.pi * 4 * t2))
    gap = np.zeros(SR)
    pad = np.zeros(SR // 2)
    return np.concatenate([pad, sp1, gap, sp2, pad]).astype(np.float32)


def test_full_pipeline_integration(tmp_path):
    from whisperx_tpu import DiarizationPipeline, assign_word_speakers
    from whisperx_tpu.align.alignment import align, test_align_model
    from whisperx_tpu.io import get_writer
    from whisperx_tpu.pipeline.asr import load_test_pipeline

    audio = _two_speaker_speechish()

    # 1) transcribe
    pipeline = load_test_pipeline(language="en")
    result = pipeline.transcribe(audio, batch_size=2, chunk_size=5)
    assert len(result["segments"]) >= 1
    assert result["language"] == "en"

    # Inject plausible text (random weights emit junk) while keeping the
    # VAD-derived timings — alignment and diarization operate on these.
    for seg in result["segments"]:
        seg["text"] = " hello there friend"

    # 2) align
    align_model = test_align_model("en")
    meta = {"language": "en", "dictionary": align_model.dictionary, "type": "jax"}
    aligned = align(result["segments"], align_model, meta, audio, None)
    assert "word_segments" in aligned
    for seg in aligned["segments"]:
        assert set(seg) >= {"start", "end", "text", "words"}

    # 3) diarize + assign
    diarize = DiarizationPipeline()
    diarize_df = diarize(audio, num_speakers=2)
    assert len(diarize_df) >= 1
    final = assign_word_speakers(diarize_df, aligned)
    assert any("speaker" in seg for seg in final["segments"])

    # 4) write all formats
    final["language"] = "en"
    writer = get_writer("all", str(tmp_path))
    writer(final, "meeting.wav", {"max_line_width": None, "max_line_count": None, "highlight_words": False})
    for ext in ["srt", "vtt", "txt", "tsv", "json"]:
        assert (tmp_path / f"meeting.{ext}").exists()

    parsed = json.loads((tmp_path / "meeting.json").read_text())
    assert "segments" in parsed and "word_segments" in parsed


def test_pipeline_telemetry_populated():
    from whisperx_tpu.pipeline.asr import load_test_pipeline

    pipeline = load_test_pipeline(language="en")
    audio = _two_speaker_speechish()
    pipeline.transcribe(audio, batch_size=2)
    report = pipeline.telemetry.report()
    assert "vad" in report and "asr_decode" in report
    assert report["asr_decode"]["x_realtime"] > 0
