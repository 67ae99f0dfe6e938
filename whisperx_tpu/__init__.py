"""whisperx_tpu — a TPU-native speech transcription framework.

The public API mirrors the reference package surface
(reference: whisperx/__init__.py:1-4) so existing users can switch imports:

    import whisperx_tpu as whisperx
    model = whisperx.load_model("large-v2")
    audio = whisperx.load_audio("audio.wav")
    result = model.transcribe(audio, batch_size=16)
    align_model, metadata = whisperx.load_align_model(result["language"])
    result = whisperx.align(result["segments"], align_model, metadata, audio, None)
    diarize = whisperx.DiarizationPipeline()
    result = whisperx.assign_word_speakers(diarize(audio), result)

Under the hood everything device-side is JAX/XLA on a (data, model) mesh:
log-mel as a strided-conv MXU matmul, a Flax Whisper with fixed-shape batched
beam search, batched wav2vec2 CTC forced alignment via a lax.scan trellis,
on-device VAD scoring, and speaker-embedding diarization.
"""

from .align.alignment import AlignJob, align, align_begin, load_align_model
from .audio.io import load_audio
from .diarize.assign import assign_word_speakers
from .diarize.pipeline import DiarizationPipeline
from .pipeline.asr import load_model

__version__ = "0.1.0"

__all__ = [
    "align",
    "load_align_model",
    "load_audio",
    "assign_word_speakers",
    "DiarizationPipeline",
    "load_model",
    "__version__",
]
