"""Diarization tests: clustering, assignment tables, synthetic two-speaker audio."""

import numpy as np
import pandas as pd
import pytest

from whisperx_tpu.diarize import (
    DiarizationPipeline,
    assign_word_speakers,
    cluster_speakers,
)

SR = 16000


def test_cluster_fixed_num():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((10, 8)) * 0.05 + np.array([1.0] + [0.0] * 7)
    b = rng.standard_normal((10, 8)) * 0.05 + np.array([0.0, 1.0] + [0.0] * 6)
    emb = np.concatenate([a, b])
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    labels = cluster_speakers(emb, num_speakers=2)
    assert set(labels[:10]) != set(labels[10:])
    assert len(set(labels.tolist())) == 2


def test_cluster_max_speakers_clamp():
    rng = np.random.default_rng(1)
    emb = rng.standard_normal((12, 6))
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    labels = cluster_speakers(emb, max_speakers=3, threshold=0.01)
    assert len(set(labels.tolist())) <= 3


def test_assign_word_speakers_by_intersection():
    diarize_df = pd.DataFrame(
        {
            "start": [0.0, 5.0],
            "end": [5.0, 10.0],
            "speaker": ["SPEAKER_00", "SPEAKER_01"],
        }
    )
    result = {
        "segments": [
            {
                "start": 1.0,
                "end": 4.0,
                "text": "hi",
                "words": [
                    {"word": "hi", "start": 1.0, "end": 2.0, "score": 0.9},
                    {"word": "there", "start": 6.0, "end": 7.0, "score": 0.9},
                ],
            },
            {"start": 6.0, "end": 9.0, "text": "yo", "words": []},
        ]
    }
    out = assign_word_speakers(diarize_df, result)
    assert out["segments"][0]["speaker"] == "SPEAKER_00"
    assert out["segments"][1]["speaker"] == "SPEAKER_01"
    words = out["segments"][0]["words"]
    assert words[0]["speaker"] == "SPEAKER_00"
    assert words[1]["speaker"] == "SPEAKER_01"


def test_assign_no_overlap_and_fill_nearest():
    diarize_df = pd.DataFrame({"start": [0.0], "end": [1.0], "speaker": ["SPEAKER_00"]})
    result = {"segments": [{"start": 5.0, "end": 6.0, "text": "x", "words": []}]}
    out = assign_word_speakers(diarize_df, result)
    assert "speaker" not in out["segments"][0]
    out2 = assign_word_speakers(diarize_df, result, fill_nearest=True)
    assert out2["segments"][0]["speaker"] == "SPEAKER_00"


def test_assign_straddling_word_max_sum():
    """A word overlapping two speakers goes to the larger summed overlap."""
    diarize_df = pd.DataFrame(
        {
            "start": [0.0, 2.0],
            "end": [2.0, 5.0],
            "speaker": ["SPEAKER_00", "SPEAKER_01"],
        }
    )
    result = {
        "segments": [
            {
                "start": 1.0,
                "end": 4.0,
                "text": "w",
                "words": [{"word": "w", "start": 1.5, "end": 4.0, "score": 1.0}],
            }
        ]
    }
    out = assign_word_speakers(diarize_df, result)
    # overlap: SPEAKER_00 gets 0.5s, SPEAKER_01 gets 2.0s
    assert out["segments"][0]["words"][0]["speaker"] == "SPEAKER_01"


def _two_speaker_audio():
    """Two synthetic 'speakers': AM tones with very different spectra."""
    t1 = np.arange(3 * SR) / SR
    sp1 = 0.5 * np.sin(2 * np.pi * 160 * t1) * (1 + 0.4 * np.sin(2 * np.pi * 4 * t1))
    sp1 += 0.2 * np.sin(2 * np.pi * 320 * t1)
    t2 = np.arange(3 * SR) / SR
    sp2 = 0.5 * np.sin(2 * np.pi * 1200 * t2) * (1 + 0.4 * np.sin(2 * np.pi * 5 * t2))
    sp2 += 0.2 * np.sin(2 * np.pi * 2400 * t2)
    silence = np.zeros(SR)
    return np.concatenate([sp1, silence, sp2]).astype(np.float32)


def test_diarization_pipeline_two_speakers():
    audio = _two_speaker_audio()
    pipeline = DiarizationPipeline()
    df = pipeline(audio, num_speakers=2)
    assert set(df.columns) >= {"segment", "label", "speaker", "start", "end"}
    assert df["speaker"].nunique() == 2
    # First speaker's region is in the first 3 seconds, second in the last 3.
    first = df.iloc[0]
    last = df.iloc[-1]
    assert first["start"] < 3.0
    assert last["end"] > 4.0
    assert first["speaker"] != last["speaker"]


def test_diarization_empty_audio():
    pipeline = DiarizationPipeline()
    df = pipeline(np.zeros(SR, np.float32))
    assert len(df) == 0
