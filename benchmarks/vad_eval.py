"""VAD quality eval on synthetic-but-adversarial audio (VERDICT r3 item 6).

The reference leans on pyannote's tuned segmentation scorer
(whisperx/vad.py:51,238); this build's default real-bench scorer is the
weight-free EnergyVAD. This harness measures how the available scorers cut
speech against *known* ground truth on audio engineered to break naive
energy detectors:

- speech: harmonic stacks (f0 ~90-200 Hz) with formant band-pass shaping and
  4 Hz syllabic amplitude modulation + babble noise;
- music: sustained triads with slow vibrato — steady energy, no syllabic
  modulation (the classic energy-VAD false positive);
- stationary noise beds at several SNRs (pink + white);
- impulsive clicks (door slams) — short high-energy transients.

Metrics per scorer: frame-level precision/recall/F1 against the true speech
mask, and boundary F1 (onset+offset within ±0.2 s). Output: one JSON object.

Usage: python benchmarks/vad_eval.py          (CPU-safe; pass --seed/--dur)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR = 16000
TOL = 0.2


def _am(t, rate=4.0, depth=0.85, phase=0.0):
    """Syllabic-rate amplitude modulation envelope in [1-depth, 1]."""
    return 1.0 - depth * 0.5 * (1 + np.sin(2 * np.pi * rate * t + phase))


def synth_speech(dur, rng, f0=120.0):
    """Speech-like: harmonics shaped by formant-ish resonances, 4 Hz AM."""
    t = np.arange(int(dur * SR)) / SR
    f0 = f0 * (1 + 0.05 * np.sin(2 * np.pi * 2.3 * t))  # pitch wobble
    phase = 2 * np.pi * np.cumsum(f0) / SR
    x = np.zeros_like(t)
    for h, w in ((1, 1.0), (2, 0.6), (3, 0.9), (4, 0.5), (5, 0.7), (8, 0.3), (12, 0.2)):
        x += w * np.sin(h * phase + rng.uniform(0, 2 * np.pi))
    x *= _am(t, rate=rng.uniform(3.0, 5.0), phase=rng.uniform(0, 2 * np.pi))
    x += 0.05 * rng.standard_normal(len(t))  # aspiration noise
    return 0.25 * x / np.max(np.abs(x))


def synth_music(dur, rng, root=220.0):
    """Sustained triad, slow vibrato, constant energy — no syllabic AM."""
    t = np.arange(int(dur * SR)) / SR
    x = np.zeros_like(t)
    for ratio in (1.0, 1.25, 1.5, 2.0):
        vib = 1 + 0.003 * np.sin(2 * np.pi * 5.5 * t + rng.uniform(0, 6))
        x += np.sin(2 * np.pi * root * ratio * vib * t)
    return 0.22 * x / np.max(np.abs(x))


def synth_noise(dur, rng, kind="pink", level=0.05):
    n = int(dur * SR)
    white = rng.standard_normal(n)
    if kind == "white":
        return level * white
    # Pink-ish: cumulative-filtered white, flattened.
    spec = np.fft.rfft(white)
    freqs = np.maximum(np.fft.rfftfreq(n, 1 / SR), 1.0)
    pink = np.fft.irfft(spec / np.sqrt(freqs), n)
    return level * pink / np.std(pink)


def synth_click(dur, rng):
    n = int(dur * SR)
    x = np.zeros(n)
    x[: int(0.02 * SR)] = rng.standard_normal(int(0.02 * SR)) * np.exp(
        -np.arange(int(0.02 * SR)) / (0.004 * SR)
    )
    return 0.8 * x


def build_corpus(rng, total_s=120.0):
    """Alternating segments; returns (audio, [(start, end)] true speech)."""
    events = []
    # (kind, duration sampler)
    menu = [
        ("speech", lambda: rng.uniform(1.5, 6.0)),
        ("silence", lambda: rng.uniform(0.8, 3.0)),
        ("music", lambda: rng.uniform(2.0, 6.0)),
        ("noise", lambda: rng.uniform(1.0, 4.0)),
        ("click", lambda: 0.5),
        ("speech", lambda: rng.uniform(1.5, 6.0)),  # speech twice as likely
    ]
    t = 0.0
    chunks = []
    truth = []
    noise_bed = synth_noise(total_s + 10, rng, "pink", level=0.012)
    while t < total_s:
        kind, sampler = menu[rng.integers(len(menu))]
        dur = float(sampler())
        n = int(dur * SR)
        if kind == "speech":
            seg = synth_speech(dur, rng, f0=rng.uniform(90, 210))
            truth.append((t, t + dur))
        elif kind == "music":
            seg = synth_music(dur, rng, root=rng.uniform(150, 400))
        elif kind == "noise":
            seg = synth_noise(dur, rng, "white", level=rng.uniform(0.02, 0.08))
        elif kind == "click":
            seg = synth_click(dur, rng)
        else:
            seg = np.zeros(n)
        chunks.append(seg[:n])
        t += dur
    audio = np.concatenate(chunks)
    audio = audio + noise_bed[: len(audio)]
    return audio.astype(np.float32), truth


def frame_mask(truth, times):
    mask = np.zeros(len(times), bool)
    for s, e in truth:
        mask |= (times >= s) & (times <= e)
    return mask


def boundary_f1(truth, turns, tol=TOL):
    """Onset/offset matching within ±tol seconds (greedy one-to-one)."""
    hits = 0
    total_pred = 2 * len(turns)
    total_true = 2 * len(truth)
    for idx in (0, 1):  # onsets, then offsets
        pred = sorted(t[idx] for t in turns)
        true = sorted(s[idx] for s in truth)
        used = [False] * len(pred)
        for tv in true:
            best, best_d = -1, tol
            for i, pv in enumerate(pred):
                if not used[i] and abs(pv - tv) <= best_d:
                    best, best_d = i, abs(pv - tv)
            if best >= 0:
                used[best] = True
                hits += 1
    precision = hits / max(total_pred, 1)
    recall = hits / max(total_true, 1)
    f1 = 2 * precision * recall / max(precision + recall, 1e-9)
    return {"precision": round(precision, 4), "recall": round(recall, 4), "f1": round(f1, 4)}


def eval_scorer(name, scorer, audio, truth, onset=0.5, offset=0.363, min_duration_on=None):
    from whisperx_tpu.vad.binarize import binarize

    if min_duration_on is None:
        # Honor the scorer's recommended floor (VadPipeline does the same).
        min_duration_on = float(getattr(scorer, "min_duration_on", 0.1))
    vs = scorer(audio)
    mask_true = frame_mask(truth, vs.timestamps)
    turns = binarize(
        vs.scores, vs.timestamps, onset=onset, offset=offset,
        min_duration_on=min_duration_on, min_duration_off=0.1,
    )
    spans = [(t.start, t.end) for t in turns]
    mask_pred = frame_mask(spans, vs.timestamps)
    tp = int(np.sum(mask_pred & mask_true))
    fp = int(np.sum(mask_pred & ~mask_true))
    fn = int(np.sum(~mask_pred & mask_true))
    p = tp / max(tp + fp, 1)
    r = tp / max(tp + fn, 1)
    return {
        "scorer": name,
        "frame": {
            "precision": round(p, 4),
            "recall": round(r, 4),
            "f1": round(2 * p * r / max(p + r, 1e-9), 4),
        },
        "boundary": boundary_f1(truth, spans),
        "turns": len(spans),
        "true_spans": len(truth),
    }


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--dur", type=float, default=120.0)
    ap.add_argument("--neural-random", action="store_true",
                    help="also run NeuralVAD with random weights (path check only)")
    args = ap.parse_args(argv)

    import jax

    if jax.default_backend() != "tpu":
        jax.config.update("jax_platforms", "cpu")

    from whisperx_tpu.vad.model import EnergyVAD

    rng = np.random.default_rng(args.seed)
    audio, truth = build_corpus(rng, args.dur)

    results = [eval_scorer("energy", EnergyVAD(), audio, truth)]

    from whisperx_tpu.vad.model import SpeechBandVAD

    results.append(eval_scorer("speechband", SpeechBandVAD(), audio, truth))

    if args.neural_random:
        from whisperx_tpu.models.vad_net import init_pyannet_params
        from whisperx_tpu.vad.model import NeuralVAD

        model, params = init_pyannet_params(seed=0)
        results.append(eval_scorer("neural-random-weights", NeuralVAD(model, params), audio, truth))

    out = {"seed": args.seed, "duration_s": args.dur, "results": results}
    print(json.dumps(out, indent=2))
    return out


if __name__ == "__main__":
    main()
