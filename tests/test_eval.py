"""WER / timestamp-F1 harness self-tests."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from benchmarks.eval import edit_distance, evaluate, normalize_text, wer, word_timestamp_f1


def test_normalize():
    assert normalize_text("Hello, World!") == ["hello", "world"]
    assert normalize_text("  Café   au-lait. ") == ["cafe", "au", "lait"]
    assert normalize_text("") == []


def test_wer_identity():
    assert wer("the quick brown fox", "The quick, brown fox!") == 0.0


def test_wer_counts():
    # 1 sub + 1 del + 1 ins over 4 ref words = 0.75
    assert abs(wer("a b c d", "a x c d e") - 0.5) < 1e-9  # sub + ins = 2/4
    assert abs(wer("a b c d", "a c d") - 0.25) < 1e-9  # del
    assert wer("", "") == 0.0
    assert wer("", "x") == 1.0


def test_edit_distance_ops():
    subs, dels, ins, hits = edit_distance(list("abcd"), list("axcde"))
    assert (subs, dels, ins, hits) == (1, 0, 1, 3)


def test_timestamp_f1_perfect():
    words = [{"word": "hi", "start": 0.0, "end": 0.5}, {"word": "yo", "start": 1.0, "end": 1.5}]
    out = word_timestamp_f1(words, [dict(w) for w in words], tol=0.2)
    assert out["f1"] == 1.0


def test_timestamp_f1_tolerance():
    ref = [{"word": "hi", "start": 0.0, "end": 0.5}]
    hyp_close = [{"word": "hi", "start": 0.15, "end": 0.6}]
    hyp_far = [{"word": "hi", "start": 0.5, "end": 1.0}]
    assert word_timestamp_f1(ref, hyp_close, tol=0.2)["f1"] == 1.0
    assert word_timestamp_f1(ref, hyp_far, tol=0.2)["f1"] == 0.0


def test_evaluate_bundle():
    result = {
        "segments": [{"text": " hello world", "start": 0.0, "end": 1.0}],
        "word_segments": [
            {"word": "hello", "start": 0.0, "end": 0.4},
            {"word": "world", "start": 0.5, "end": 0.9},
        ],
    }
    out = evaluate(result, result)
    assert out["wer"] == 0.0
    assert out["timestamp_f1"]["f1"] == 1.0
