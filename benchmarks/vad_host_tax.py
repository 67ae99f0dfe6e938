"""Host-side VAD cost at scale (VERDICT r4 item 7).

SpeechBandVAD scores on the host (full-file rFFT + framed RMS + gates,
vad/model.py:203-270). At 140x+ realtime the host must score >140 audio-s/s
or the scorer becomes the pipeline ceiling. This probe times scorer +
binarize + merge_chunks on 1 h of synthetic speech-like audio and prints the
per-stage realtime factors — pure host numpy, no accelerator needed.

Usage: python benchmarks/vad_host_tax.py [hours]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(hours: float = 1.0) -> dict:
    from whisperx_tpu.vad.model import SpeechBandVAD, VadPipeline

    sr = 16000
    n = int(hours * 3600 * sr)
    rng = np.random.default_rng(0)
    # Speech-like: 220 Hz carrier with 4 Hz syllabic AM in bursts + noise
    # floor, so the scorer's gates and the binarizer actually fire.
    audio = np.zeros(n, np.float32)
    tb = np.arange(5 * sr) / sr
    burst = (
        0.3 * np.sin(2 * np.pi * 220 * tb) * (0.75 + 0.25 * np.sin(2 * np.pi * 3 * tb))
        + 0.01 * rng.standard_normal(5 * sr)
    ).astype(np.float32)
    for start_s in range(0, int(hours * 3600) - 5, 12):  # 5 s bursts every 12 s
        audio[start_s * sr : (start_s + 5) * sr] = burst
    audio_s = n / sr

    scorer = SpeechBandVAD()
    scorer(audio[: 10 * sr])  # warm FFT plans / allocator before timing
    t0 = time.perf_counter()
    scores = scorer(audio)
    t_score = time.perf_counter() - t0

    del scores
    # Full pipeline call (score + binarize + merge); binarize+merge share is
    # the total minus the separately-timed scoring pass.
    pipe = VadPipeline(scorer)
    t0 = time.perf_counter()
    chunks = pipe(audio, chunk_size=30)
    t_full = time.perf_counter() - t0
    t_bin = max(t_full - t_score, 0.0)

    out = {
        "audio_hours": round(hours, 3),
        "chunks": len(chunks),
        "score_s": round(t_score, 3),
        "binarize_merge_s": round(t_bin, 3),
        "total_s": round(t_full, 3),
        "score_x_realtime": round(audio_s / t_score, 1),
        "total_x_realtime": round(audio_s / t_full, 1),
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 1.0)
