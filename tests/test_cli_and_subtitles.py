"""CLI wiring and subtitle post-processor tests."""

import numpy as np
import pytest


def test_cli_parser_flags():
    from whisperx_tpu.cli import build_parser

    parser = build_parser()
    args = parser.parse_args(
        ["a.wav", "--model", "tiny", "--batch_size", "4", "--diarize",
         "--vad_onset", "0.4", "--suppress_tokens=-1,5", "--language", "fr",
         "--max_line_width", "40", "--highlight_words", "True"]
    )
    assert args.audio == ["a.wav"]
    assert args.model == "tiny"
    assert args.batch_size == 4
    assert args.diarize is True
    assert args.vad_onset == 0.4
    assert args.language == "fr"
    assert args.max_line_width == 40
    assert args.highlight_words is True


def test_cli_end_to_end_with_stub_model(tmp_path, monkeypatch):
    """Full CLI flow (transcribe→align→write) on the random-weight pipeline."""
    import whisperx_tpu.cli as cli_mod
    from whisperx_tpu.align.alignment import test_align_model
    from whisperx_tpu.audio.io import write_wav
    from whisperx_tpu.pipeline.asr import load_test_pipeline

    SR = 16000
    t = np.arange(2 * SR) / SR
    audio = (0.4 * np.sin(2 * np.pi * 210 * t) * (1 + 0.4 * np.sin(2 * np.pi * 3 * t))).astype(
        np.float32
    )
    wav_path = str(tmp_path / "speech.wav")
    write_wav(wav_path, audio)

    monkeypatch.setattr(cli_mod, "load_model", lambda *a, **k: load_test_pipeline(language="en"))

    def fake_load_align_model(language, device, model_name=None, **kw):
        m = test_align_model(language or "en")
        return m, {"language": language or "en", "dictionary": m.dictionary, "type": "jax"}

    monkeypatch.setattr(cli_mod, "load_align_model", fake_load_align_model)

    cli_mod.cli([wav_path, "--model", "tiny", "--output_dir", str(tmp_path),
                 "--output_format", "srt", "--language", "en", "--batch_size", "2",
                 "--verbose", "False"])
    assert (tmp_path / "speech.srt").exists()


def test_cli_multifile_align_overlap(tmp_path, monkeypatch):
    """Multi-file CLI run: the align stage keeps one file's AlignJob in
    flight (cli._align_stage), so file f's result must not leak into file
    f+1's — every output file gets its own aligned transcript."""
    import whisperx_tpu.cli as cli_mod
    from whisperx_tpu.align.alignment import test_align_model
    from whisperx_tpu.audio.io import write_wav
    from whisperx_tpu.pipeline.asr import load_test_pipeline

    SR = 16000
    t = np.arange(2 * SR) / SR
    paths = []
    for i, freq in enumerate((210, 330)):
        audio = (
            0.4 * np.sin(2 * np.pi * freq * t) * (1 + 0.4 * np.sin(2 * np.pi * 3 * t))
        ).astype(np.float32)
        p = str(tmp_path / f"clip{i}.wav")
        write_wav(p, audio)
        paths.append(p)

    pipeline = load_test_pipeline(language="en")
    monkeypatch.setattr(cli_mod, "load_model", lambda *a, **k: pipeline)

    def fake_load_align_model(language, device, model_name=None, **kw):
        m = test_align_model(language or "en")
        return m, {"language": language or "en", "dictionary": m.dictionary, "type": "jax"}

    monkeypatch.setattr(cli_mod, "load_align_model", fake_load_align_model)

    cli_mod.cli(paths + ["--model", "tiny", "--output_dir", str(tmp_path),
                         "--output_format", "json", "--language", "en",
                         "--batch_size", "2", "--verbose", "False"])
    import json as _json

    for i in range(2):
        out = tmp_path / f"clip{i}.json"
        assert out.exists()
        data = _json.loads(out.read_text())
        assert "segments" in data and "word_segments" in data


def test_subtitles_processor_splits_long_segment(tmp_path):
    from whisperx_tpu.io.subtitles import SubtitlesProcessor

    words = []
    t = 0.0
    text_words = ("the quick brown fox jumps over the lazy dog and runs far away "
                  "because it saw a hunter near the old barn").split()
    for w in text_words:
        words.append({"word": w, "start": round(t, 2), "end": round(t + 0.3, 2)})
        t += 0.35
    segments = [{"start": 0.0, "end": t, "text": " ".join(text_words), "words": words}]

    proc = SubtitlesProcessor(segments, "en", max_line_length=30)
    subs = proc.process_segments(advanced_splitting=True)
    assert len(subs) >= 2
    for sub in subs:
        assert sub["start"] <= sub["end"]

    out = tmp_path / "out.srt"
    n = proc.save(str(out))
    content = out.read_text()
    assert content.count("-->") == n


def test_subtitles_estimates_missing_times():
    from whisperx_tpu.io.subtitles import SubtitlesProcessor

    words = [
        {"word": "hello", "start": 0.0, "end": 0.4},
        {"word": "123"},  # unaligned (numeral)
        {"word": "world", "start": 1.0, "end": 1.4},
    ]
    segments = [{"start": 0.0, "end": 1.4, "text": "hello 123 world", "words": words}]
    proc = SubtitlesProcessor(segments, "en")
    proc.process_segments(advanced_splitting=True)
    assert words[1]["start"] == 0.4
    assert words[1]["end"] == 1.0


def test_subtitles_vtt_header(tmp_path):
    from whisperx_tpu.io.subtitles import SubtitlesProcessor

    segments = [{"start": 0.0, "end": 1.0, "text": "hi", "words": [
        {"word": "hi", "start": 0.0, "end": 1.0}]}]
    proc = SubtitlesProcessor(segments, "en", is_vtt=True)
    out = tmp_path / "o.vtt"
    proc.save(str(out))
    assert out.read_text().startswith("WEBVTT")

def test_cli_align_hot_swap_finishes_in_flight_first(monkeypatch):
    """On a detected-language switch, _align_stage must drain the previous
    file's in-flight AlignJob (built on the old model) BEFORE loading the
    replacement align model — no transient double model residency, warnings
    ordered before the next file's header (r4 advisor finding)."""
    import whisperx_tpu.cli as cli_mod
    from whisperx_tpu.cli import CliConfig, FileJob

    events = []

    def fake_load_align_model(language, device, model_name=None, **kw):
        events.append(("load", language))
        return object(), {"language": language, "dictionary": {"a": 1}, "type": "jax"}

    class FakeJob:
        def __init__(self, path):
            self.path = path

        def finish(self):
            events.append(("finish", self.path))
            return {"segments": [], "word_segments": []}

    def fake_align_begin(segments, model, meta, audio, device, **kw):
        events.append(("begin", meta["language"]))
        return FakeJob(meta["language"])

    monkeypatch.setattr(cli_mod, "load_align_model", fake_load_align_model)
    monkeypatch.setattr(cli_mod, "align_begin", fake_align_begin)

    cfg = CliConfig(
        files=["a.wav", "b.wav"], model_name="tiny", checkpoint=None,
        model_dir=None, device="tpu", device_index=0, compute_type="int8",
        batch_size=2, task="transcribe", language=None, align_language="en",
        verbose=False, print_progress=False, threads=0, chunk_size=30,
    )
    jobs = [
        FileJob("a.wav", result={"segments": [{"start": 0, "end": 1, "text": "x"}],
                                 "language": "en"}, audio=np.zeros(16000, np.float32)),
        FileJob("b.wav", result={"segments": [{"start": 0, "end": 1, "text": "x"}],
                                 "language": "fr"}, audio=np.zeros(16000, np.float32)),
    ]
    cli_mod._align_stage(cfg, jobs)

    assert events[0] == ("load", "en")
    assert events[1] == ("begin", "en")
    # The language switch must finish file a BEFORE loading the fr model.
    assert events[2] == ("finish", "en"), events
    assert events[3] == ("load", "fr"), events
    assert events[4] == ("begin", "fr")
    assert events[5] == ("finish", "fr")

def test_cli_diarize_end_to_end(tmp_path, monkeypatch):
    """--diarize through the real stage functions (weight-free diarizer):
    the output JSON carries speaker labels on segments/words."""
    import json as _json

    import whisperx_tpu.cli as cli_mod
    from whisperx_tpu.align.alignment import test_align_model
    from whisperx_tpu.audio.io import write_wav
    from whisperx_tpu.pipeline.asr import load_test_pipeline

    SR = 16000
    # Two tone "speakers" with silence padding so the weight-free VAD and
    # the diarizer's window scan both fire.
    audio = np.zeros(8 * SR, np.float32)
    tb = np.arange(3 * SR) / SR
    audio[SR : 4 * SR] = (0.4 * np.sin(2 * np.pi * 210 * tb) * (1 + 0.4 * np.sin(2 * np.pi * 3 * tb))).astype(np.float32)
    audio[5 * SR : 8 * SR] = (0.4 * np.sin(2 * np.pi * 1200 * tb) * (1 + 0.4 * np.sin(2 * np.pi * 3 * tb))).astype(np.float32)
    wav_path = str(tmp_path / "meet.wav")
    write_wav(wav_path, audio)

    monkeypatch.setattr(cli_mod, "load_model", lambda *a, **k: load_test_pipeline(language="en"))

    def fake_load_align_model(language, device, model_name=None, **kw):
        m = test_align_model(language or "en")
        return m, {"language": language or "en", "dictionary": m.dictionary, "type": "jax"}

    monkeypatch.setattr(cli_mod, "load_align_model", fake_load_align_model)

    cli_mod.cli([wav_path, "--model", "tiny", "--output_dir", str(tmp_path),
                 "--output_format", "json", "--language", "en", "--batch_size", "2",
                 "--diarize", "--min_speakers", "1", "--max_speakers", "2",
                 "--verbose", "False"])
    data = _json.loads((tmp_path / "meet.json").read_text())
    assert "segments" in data
    speakered = [s for s in data["segments"] if "speaker" in s]
    assert speakered, "no segment carried a speaker label"
