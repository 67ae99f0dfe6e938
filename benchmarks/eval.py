"""Accuracy harness: WER, word-timestamp F1 and diarization DER (the
benchmarking the reference never shipped — its README TODO at reference
README.md:260).

Pure-python metrics over result dicts:
- `wer(ref, hyp)`: word error rate via Levenshtein alignment after Whisper-ish
  text normalization.
- `word_timestamp_f1(ref_words, hyp_words, tol)`: greedy time-windowed
  matching of identical words; F1 at a tolerance (BASELINE.md: 200 ms).
- `der(ref_turns, hyp_turns, collar)`: diarization error rate with optimal
  speaker mapping and overlap handling (NIST md-eval semantics), over
  (start, end, speaker) turn lists (`turns_from_dataframe` adapts the
  DiarizationPipeline output).

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


def turns_from_dataframe(df) -> List[tuple]:
    """DiarizationPipeline DataFrame → [(start, end, speaker), ...]."""
    return [
        (float(r["start"]), float(r["end"]), str(r["speaker"]))
        for _, r in df.iterrows()
    ]


def der(
    ref_turns: List[tuple],  # (start, end, speaker)
    hyp_turns: List[tuple],
    collar: float = 0.0,
) -> dict:
    """Diarization error rate with overlap and optimal speaker mapping.

    NIST md-eval semantics: the timeline is split at every turn boundary; in
    each elementary interval with R active reference speakers and H active
    hypothesis speakers, miss += max(0, R-H), false alarm += max(0, H-R) and
    confusion += min(R, H) - (matched pairs), all weighted by duration. The
    ref↔hyp speaker mapping maximizes total attributed time (Hungarian over
    the pairwise-overlap matrix). ``collar`` excludes ±collar seconds around
    every reference boundary. Returns components + ``der`` (relative to total
    reference speech time).
    """
    from scipy.optimize import linear_sum_assignment

    ref_turns = [(s, e, spk) for s, e, spk in ref_turns if e > s]
    hyp_turns = [(s, e, spk) for s, e, spk in hyp_turns if e > s]
    ref_speakers = sorted({spk for _, _, spk in ref_turns})
    hyp_speakers = sorted({spk for _, _, spk in hyp_turns})
    r_idx = {s: i for i, s in enumerate(ref_speakers)}
    h_idx = {s: i for i, s in enumerate(hyp_speakers)}

    points = sorted(
        {t for s, e, _ in ref_turns for t in (s, e)}
        | {t for s, e, _ in hyp_turns for t in (s, e)}
        | {b for s, e, _ in ref_turns for b in (s - collar, s + collar, e - collar, e + collar)}
    )
    scored: List[tuple] = []  # (duration, ref-set, hyp-set) per elementary interval
    for a, b in zip(points[:-1], points[1:]):
        if b <= a:
            continue
        if collar > 0.0 and any(
            boundary - collar < (a + b) / 2 < boundary + collar
            for s, e, _ in ref_turns
            for boundary in (s, e)
        ):
            continue
        mid = (a + b) / 2
        active_r = frozenset(r_idx[spk] for s, e, spk in ref_turns if s < mid < e)
        active_h = frozenset(h_idx[spk] for s, e, spk in hyp_turns if s < mid < e)
        if active_r or active_h:
            scored.append((b - a, active_r, active_h))

    # Global optimal speaker mapping over pairwise overlap time.
    import numpy as np

    overlap = np.zeros((max(len(ref_speakers), 1), max(len(hyp_speakers), 1)))
    for d, rs, hs in scored:
        for i in rs:
            for j in hs:
                overlap[i, j] += d
    rows, cols = linear_sum_assignment(-overlap)
    mapped = {(i, j) for i, j in zip(rows, cols) if overlap[i, j] > 0}

    total = miss = fa = conf = 0.0
    for d, rs, hs in scored:
        total += d * len(rs)
        matched = sum(1 for i in rs for j in hs if (i, j) in mapped)
        miss += d * max(0, len(rs) - len(hs))
        fa += d * max(0, len(hs) - len(rs))
        conf += d * (min(len(rs), len(hs)) - matched)
    return {
        "der": (miss + fa + conf) / total if total else 0.0,
        "miss": miss,
        "false_alarm": fa,
        "confusion": conf,
        "total_speech": total,
    }


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
