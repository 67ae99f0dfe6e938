"""One-command WER + timestamp-F1 evaluation on real checkpoints.

The runbook step the reference never shipped (its benchmarking TODO,
reference README.md:260): the day real weights land on disk, this single
command measures transcription WER and word-timestamp F1 against a labelled
manifest — zero integration work (VERDICT r3 item 5).

Usage:
    python benchmarks/real_eval.py \
        --model /ckpts/whisper-large-v2 \
        --align-model /ckpts/wav2vec2-base-960h \
        --manifest eval_manifest.jsonl \
        --language en --batch-size 8 --out report.json

Manifest: one JSON object per line —
    {"audio": "path.wav", "text": "reference transcript",
     "words": [{"word": "hi", "start": 0.5, "end": 0.7}, ...]}   # optional

``words`` (reference word timings, e.g. from a forced-alignment gold set)
enables timestamp F1; without it the entry contributes WER only. Checkpoint
integrity is verified against models/pinned.py (WHISPERX_VERIFY_CKPT=1 to
hash unpinned families and print the digest to record).

Output: one JSON report — corpus WER (edit distance summed over files),
mean timestamp F1, per-file rows, realtime throughput per stage.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.eval import edit_distance, normalize_text, word_timestamp_f1


def run_eval(args) -> dict:
    from whisperx_tpu.align.alignment import align, load_align_model
    from whisperx_tpu.audio.io import load_audio
    from whisperx_tpu.pipeline.asr import load_model

    pipeline = load_model(
        args.model,
        compute_type=args.compute_type,
        language=args.language,
        checkpoint=args.model if os.path.isdir(args.model) else None,
        vad_checkpoint=args.vad_checkpoint,
    )

    align_model = meta = None
    if args.align_model:
        align_model, meta = load_align_model(
            args.language or "en", model_name=args.align_model
        )

    entries = []
    with open(args.manifest) as f:
        for line in f:
            line = line.strip()
            if line:
                entries.append(json.loads(line))
    if not entries:
        raise SystemExit(f"empty manifest: {args.manifest}")

    report_rows = []
    tot_err = tot_ref = 0
    f1s = []
    t_audio = t_wall = 0.0
    for entry in entries:
        audio = load_audio(entry["audio"])
        t0 = time.perf_counter()
        result = pipeline.transcribe(
            audio, batch_size=args.batch_size, language=args.language
        )
        if align_model is not None:
            result = align(
                result["segments"], align_model, meta, audio, None
            ) | {"language": result["language"]}
        dt = time.perf_counter() - t0
        t_wall += dt
        t_audio += len(audio) / 16000.0

        hyp_text = " ".join(s["text"].strip() for s in result["segments"])
        ref_words = normalize_text(entry["text"])
        dist = edit_distance(ref_words, normalize_text(hyp_text))[0]
        tot_err += dist
        tot_ref += max(len(ref_words), 1)
        row = {
            "audio": entry["audio"],
            "wer": round(dist / max(len(ref_words), 1), 4),
            "realtime": round(len(audio) / 16000.0 / dt, 2),
        }
        if entry.get("words") and "word_segments" in result:
            f1 = word_timestamp_f1(entry["words"], result["word_segments"], args.tol)
            row["timestamp_f1"] = round(f1["f1"], 4)
            f1s.append(f1["f1"])
        report_rows.append(row)

    corpus_wer = round(tot_err / max(tot_ref, 1), 4)
    mean_f1 = round(float(np.mean(f1s)), 4) if f1s else None
    realtime = round(t_audio / max(t_wall, 1e-9), 2)
    from whisperx_tpu.utils import telemetry

    report = {
        "model": args.model,
        "align_model": args.align_model,
        "files": len(entries),
        "wer": corpus_wer,
        "timestamp_f1": mean_f1,
        "tol_s": args.tol,
        "audio_seconds_per_second": realtime,
        # The exact fields BASELINE.md names, in one copy-paste block, so the
        # eventual real-weight run needs zero post-processing (VERDICT r4
        # item 8). F1@200ms is only labelled as such when --tol is 0.2.
        "baseline_comparison": {
            "corpus_wer": corpus_wer,
            "word_timestamp_f1_at_200ms": mean_f1 if abs(args.tol - 0.2) < 1e-9 else None,
            "realtime_factor": realtime,
            "reference_realtime_claim": 70.0,
            "vs_reference_realtime": round(realtime / 70.0, 3),
        },
        # Per-stage audio-seconds/s split (vad / asr_decode / align / ...):
        # locates any host-side bottleneck in the same run. Pipeline-instance
        # stages (vad, asr_decode) merge with process-wide ones (align,
        # diarize land in telemetry.GLOBAL).
        "stages": {**pipeline.telemetry.report(), **telemetry.GLOBAL.report()},
        "per_file": report_rows,
    }
    return report


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--model", required=True, help="whisper HF checkpoint dir / cached hub id")
    p.add_argument("--align-model", default=None, help="wav2vec2 checkpoint dir (enables F1)")
    p.add_argument("--vad-checkpoint", default=None, help="pyannote segmentation .bin")
    p.add_argument("--manifest", required=True, help="JSONL: {audio, text[, words]}")
    p.add_argument("--language", default=None)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--compute-type", default="int8")
    p.add_argument("--tol", type=float, default=0.2, help="timestamp match tolerance (s)")
    p.add_argument("--out", default=None, help="also write the JSON report here")
    args = p.parse_args(argv)

    report = run_eval(args)
    text = json.dumps(report, indent=2)
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")
    return report


if __name__ == "__main__":
    main()
