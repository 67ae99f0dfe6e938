"""Speaker diarization pipeline: VAD → windows → embeddings → clustering.

API parity with the reference wrapper (whisperx/diarize.py:10-32): callable
on audio (path or waveform), honors num/min/max_speakers, and returns a
pandas DataFrame with ``segment``/``label``/``speaker``/``start``/``end``
columns — drop-in for ``assign_word_speakers``.

Pipeline (classical embedding-clustering diarization, device-batched):
1. speech turns from the VAD scorer,
2. sliding 1.5 s / 0.75 s embedding windows inside each turn,
3. ONE batched on-device embedding forward for all windows,
4. agglomerative cosine clustering on the host,
5. merge adjacent same-speaker windows into turns.
"""

from __future__ import annotations

from typing import Optional, Union

import numpy as np

from ..audio.constants import SAMPLE_RATE
from ..audio.io import load_audio
from ..vad.model import EnergyVAD, VadPipeline
from .assign import Segment
from .cluster import cluster_speakers
from .embed import MelStatsEmbedding


class DiarizationPipeline:
    def __init__(
        self,
        model_name: str = "resnet34",
        use_auth_token=None,
        device=None,
        *,
        embedder=None,
        vad: Optional[VadPipeline] = None,
        window: float = 1.5,
        step: float = 0.75,
        checkpoint: Optional[str] = None,
    ):
        if embedder is None:
            if checkpoint:
                # WeSpeaker ResNet34 (the embedding model inside the
                # reference's pyannote/speaker-diarization-3.1,
                # whisperx/diarize.py:19) converted to Flax.
                from ..models.convert import load_wespeaker_resnet34
                from .embed import NeuralSpeakerEmbedding

                net, variables, n_mels = load_wespeaker_resnet34(checkpoint)
                embedder = NeuralSpeakerEmbedding(net, variables, n_mels=n_mels)
            else:
                embedder = MelStatsEmbedding()
        self.embedder = embedder
        self.vad = vad or VadPipeline(EnergyVAD())
        self.window = window
        self.step = step

    def _windows(self, audio: np.ndarray):
        win = int(self.window * SAMPLE_RATE)
        hop = int(self.step * SAMPLE_RATE)
        spans = []
        for turn in self.vad.speech_turns(audio):
            s = max(0, int(turn.start * SAMPLE_RATE))
            e = min(len(audio), int(turn.end * SAMPLE_RATE))
            if e - s < win // 3:  # skip sub-0.5s slivers
                continue
            pos = s
            while pos < e:
                spans.append((pos, min(pos + win, e)))
                if pos + win >= e:
                    break
                pos += hop
        return spans, win

    def __call__(
        self,
        audio: Union[str, np.ndarray],
        num_speakers: Optional[int] = None,
        min_speakers: Optional[int] = None,
        max_speakers: Optional[int] = None,
    ):
        import time as _time

        import pandas as pd

        from ..utils import telemetry

        _t0 = _time.perf_counter()
        if isinstance(audio, str):
            audio = load_audio(audio)
        audio = np.asarray(audio, dtype=np.float32).reshape(-1)

        spans, win = self._windows(audio)
        if not spans:
            telemetry.GLOBAL.record(
                "diarize",
                seconds=_time.perf_counter() - _t0,
                audio_seconds=len(audio) / SAMPLE_RATE,
            )
            return pd.DataFrame(columns=["segment", "label", "speaker", "start", "end"])

        wavs = np.zeros((len(spans), win), np.float32)
        for i, (s, e) in enumerate(spans):
            wavs[i, : e - s] = audio[s:e]
        embeddings = self.embedder(wavs)
        labels = cluster_speakers(
            embeddings,
            num_speakers=num_speakers,
            min_speakers=min_speakers,
            max_speakers=max_speakers,
        )

        # Merge adjacent same-speaker windows into speaker turns.
        rows = []
        cur_label, cur_start, cur_end = None, None, None
        for (s, e), lab in zip(spans, labels):
            t0, t1 = s / SAMPLE_RATE, e / SAMPLE_RATE
            if lab == cur_label and t0 <= cur_end + self.step:
                cur_end = max(cur_end, t1)
            else:
                if cur_label is not None:
                    rows.append((cur_start, cur_end, int(cur_label)))
                cur_label, cur_start, cur_end = lab, t0, t1
        if cur_label is not None:
            rows.append((cur_start, cur_end, int(cur_label)))

        df = pd.DataFrame(
            {
                "segment": [Segment(s, e) for s, e, _ in rows],
                "label": [f"SPEAKER_{l:02d}" for _, _, l in rows],
                "speaker": [f"SPEAKER_{l:02d}" for _, _, l in rows],
                "start": [s for s, _, _ in rows],
                "end": [e for _, e, _ in rows],
            }
        )
        telemetry.GLOBAL.record(
            "diarize",
            seconds=_time.perf_counter() - _t0,
            audio_seconds=len(audio) / SAMPLE_RATE,
        )
        return df
