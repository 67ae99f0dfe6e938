"""Accuracy harness: WER and word-timestamp F1 (the benchmarking the
reference never shipped — its README TODO at reference README.md:260).

Pure-python metrics over result dicts:
- `wer(ref, hyp)`: word error rate via Levenshtein alignment after Whisper-ish
  text normalization.
- `word_timestamp_f1(ref_words, hyp_words, tol)`: greedy time-windowed
  matching of identical words; F1 at a tolerance (BASELINE.md: 200 ms).

Usage: `python -m benchmarks.eval ref.json hyp.json [--tol 0.2]` where each
json is an (Aligned)TranscriptionResult.
"""

from __future__ import annotations

import json
import re
import unicodedata
from typing import List, Sequence


def normalize_text(text: str) -> List[str]:
    """Lowercase, strip punctuation/diacritics, collapse whitespace → words."""
    text = unicodedata.normalize("NFKD", text.lower())
    text = "".join(c for c in text if not unicodedata.combining(c))
    text = re.sub(r"[^\w\s']", " ", text)
    text = re.sub(r"\s+", " ", text).strip()
    return text.split() if text else []


def edit_distance(ref: Sequence[str], hyp: Sequence[str]) -> tuple[int, int, int, int]:
    """Levenshtein with op counts → (substitutions, deletions, insertions, hits)."""
    m, n = len(ref), len(hyp)
    # dp[i][j] = (cost, subs, dels, ins)
    prev = [(j, 0, 0, j) for j in range(n + 1)]
    for i in range(1, m + 1):
        cur = [(i, 0, i, 0)] + [None] * n
        for j in range(1, n + 1):
            if ref[i - 1] == hyp[j - 1]:
                cur[j] = prev[j - 1]
            else:
                sub = (prev[j - 1][0] + 1, prev[j - 1][1] + 1, prev[j - 1][2], prev[j - 1][3])
                dele = (prev[j][0] + 1, prev[j][1], prev[j][2] + 1, prev[j][3])
                ins = (cur[j - 1][0] + 1, cur[j - 1][1], cur[j - 1][2], cur[j - 1][3] + 1)
                cur[j] = min(sub, dele, ins)
        prev = cur
    cost, subs, dels, ins = prev[n]
    hits = len(ref) - subs - dels
    return subs, dels, ins, hits


def wer(ref_text: str, hyp_text: str) -> float:
    ref = normalize_text(ref_text)
    hyp = normalize_text(hyp_text)
    if not ref:
        return 0.0 if not hyp else 1.0
    subs, dels, ins, _ = edit_distance(ref, hyp)
    return (subs + dels + ins) / len(ref)


def result_text(result: dict) -> str:
    return " ".join(seg["text"].strip() for seg in result["segments"])


def word_timestamp_f1(
    ref_words: List[dict], hyp_words: List[dict], tol: float = 0.2
) -> dict:
    """Greedy matching: same normalized word, |Δstart| ≤ tol and |Δend| ≤ tol."""

    def norm(w):
        toks = normalize_text(w["word"])
        return toks[0] if toks else ""

    used = [False] * len(hyp_words)
    matches = 0
    for rw in ref_words:
        if "start" not in rw:
            continue
        target = norm(rw)
        best, best_d = None, None
        for j, hw in enumerate(hyp_words):
            if used[j] or "start" not in hw or norm(hw) != target:
                continue
            d = abs(hw["start"] - rw["start"])
            if d <= tol and abs(hw.get("end", hw["start"]) - rw.get("end", rw["start"])) <= tol:
                if best_d is None or d < best_d:
                    best, best_d = j, d
        if best is not None:
            used[best] = True
            matches += 1

    n_ref = sum(1 for w in ref_words if "start" in w)
    n_hyp = sum(1 for w in hyp_words if "start" in w)
    precision = matches / n_hyp if n_hyp else 0.0
    recall = matches / n_ref if n_ref else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {"precision": precision, "recall": recall, "f1": f1, "matches": matches}


def evaluate(ref_result: dict, hyp_result: dict, tol: float = 0.2) -> dict:
    out = {"wer": wer(result_text(ref_result), result_text(hyp_result))}
    if "word_segments" in ref_result and "word_segments" in hyp_result:
        out["timestamp_f1"] = word_timestamp_f1(
            ref_result["word_segments"], hyp_result["word_segments"], tol
        )
    return out


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("ref")
    p.add_argument("hyp")
    p.add_argument("--tol", type=float, default=0.2)
    args = p.parse_args()
    with open(args.ref) as f:
        ref = json.load(f)
    with open(args.hyp) as f:
        hyp = json.load(f)
    print(json.dumps(evaluate(ref, hyp, args.tol), indent=2))


if __name__ == "__main__":
    main()
