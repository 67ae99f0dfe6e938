"""End-to-end accuracy-harness self-run (VERDICT r1 item 8): transcribe +
align synthetic audio with planted word timings, score with benchmarks/eval.

The ASR engine runs random weights, so transcription text is rigged at the
segment level (the aligner consumes segments, not the decoder); the point is
that the *harness itself* — align() → word_segments → evaluate() — is
exercised and regression-guarded with real WER / timestamp-F1 numbers.
"""

import numpy as np

from benchmarks.eval import evaluate, wer, word_timestamp_f1

SR = 16000


def test_wer_and_f1_primitives():
    assert wer("the quick brown fox", "the quick brown fox") == 0.0
    assert wer("a b c d", "a x c") == 0.5  # 1 sub + 1 del over 4

    ref = [{"word": "hi", "start": 1.0, "end": 1.4}, {"word": "there", "start": 2.0, "end": 2.4}]
    hyp = [{"word": "hi", "start": 1.1, "end": 1.5}, {"word": "there", "start": 5.0, "end": 5.4}]
    out = word_timestamp_f1(ref, hyp, tol=0.2)
    assert out["matches"] == 1
    assert out["f1"] == 0.5


def test_eval_harness_on_aligned_pipeline_output():
    from tests.test_align import DICT, RiggedW2V, _metadata
    from whisperx_tpu.align.alignment import AlignModel, align

    # Planted ground truth: two words per segment, uniformly spread.
    text = " hello world"
    tokens = [DICT[c] for c in "hello|world"]
    model = AlignModel(RiggedW2V([tokens, tokens]), {}, DICT, "en", blank_id=0)
    segments = [
        {"start": 0.0, "end": 2.0, "text": text},
        {"start": 3.0, "end": 5.0, "text": text},
    ]
    audio = np.zeros(5 * SR, np.float32)
    hyp = align([dict(s) for s in segments], model, _metadata(), audio)

    # Reference result: same text, word times from the planted spread.
    ref = {
        "segments": [dict(s, words=[]) for s in segments],
        "word_segments": [],
    }
    for seg in segments:
        dur = seg["end"] - seg["start"]
        for k, word in enumerate(("hello", "world")):
            w = {
                "word": word,
                "start": seg["start"] + dur * k / 2,
                "end": seg["start"] + dur * (k + 1) / 2,
            }
            ref["word_segments"].append(w)

    out = evaluate(ref, hyp, tol=0.4)
    assert out["wer"] == 0.0
    assert out["timestamp_f1"]["recall"] > 0.7, out
    assert len(hyp["word_segments"]) == 4


def test_global_telemetry_covers_align_and_diarize():
    from whisperx_tpu.utils import telemetry

    telemetry.GLOBAL.stages.clear()

    from tests.test_align import DICT, RiggedW2V, _metadata
    from whisperx_tpu.align.alignment import AlignModel, align
    from whisperx_tpu.diarize.pipeline import DiarizationPipeline

    tokens = [DICT[c] for c in "hello|world"]
    model = AlignModel(RiggedW2V([tokens]), {}, DICT, "en", blank_id=0)
    align(
        [{"start": 0.0, "end": 2.0, "text": " hello world"}],
        model,
        _metadata(),
        np.zeros(2 * SR, np.float32),
    )
    from tests.test_diarize import _two_speaker_audio

    audio = _two_speaker_audio()  # 7 s: bursts + silence (VAD finds turns)
    DiarizationPipeline()(audio)

    report = telemetry.GLOBAL.report()
    assert report["align"]["calls"] == 1 and report["align"]["audio_seconds"] == 2.0
    assert report["diarize"]["calls"] == 1 and report["diarize"]["audio_seconds"] == 7.0


def test_roofline_traffic_model():
    """benchmarks/roofline.py arithmetic: flagship int8 numbers match the
    hand-derived accounting cited in AB_RESULTS (0.8 weights / 0.98 cross /
    0.42 self GB per step), and int4 halves every stream."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from benchmarks.roofline import flagship_traffic

    t8 = flagship_traffic(model_name="large-v2", batch=8, beam=5, max_new=112,
                          quant="int8", kv="int8")
    assert t8["cache_T"] == 128
    assert abs(t8["weights_gb_per_step"] - 0.80) < 0.02
    assert abs(t8["cross_kv_gb_per_step"] - 0.98) < 0.02
    assert abs(t8["self_kv_gb_per_step"] - 0.42) < 0.02

    t4 = flagship_traffic(model_name="large-v2", batch=8, beam=5, max_new=112,
                          quant="int4", kv="int4")
    for k in ("weights_gb_per_step", "cross_kv_gb_per_step", "self_kv_gb_per_step"):
        assert abs(t4[k] - t8[k] / 2) < 1e-3, k  # rounded to 3dp in the report
