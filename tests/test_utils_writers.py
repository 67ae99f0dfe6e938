"""Writers and misc-util tests (golden outputs per reference formats)."""

import numpy as np

from whisperx_tpu.io import get_writer
from whisperx_tpu.utils import (
    compression_ratio,
    exact_div,
    format_timestamp,
    interpolate_nans,
)

RESULT = {
    "language": "en",
    "segments": [
        {
            "start": 0.5,
            "end": 2.0,
            "text": " hello world",
            "words": [
                {"word": "hello", "start": 0.5, "end": 1.0, "score": 0.9},
                {"word": "world", "start": 1.2, "end": 2.0, "score": 0.8},
            ],
        },
        {
            "start": 3.0,
            "end": 4.0,
            "text": " again",
            "words": [{"word": "again", "start": 3.0, "end": 4.0, "score": 0.7}],
        },
    ],
}

OPTIONS = {"max_line_width": None, "max_line_count": None, "highlight_words": False}


def test_format_timestamp():
    assert format_timestamp(0.0) == "00:00.000"
    assert format_timestamp(3661.5, always_include_hours=True) == "01:01:01.500"
    assert format_timestamp(1.5, decimal_marker=",") == "00:01,500"


def test_srt_output(tmp_path):
    writer = get_writer("srt", str(tmp_path))
    writer(RESULT, "audio.wav", OPTIONS)
    text = (tmp_path / "audio.srt").read_text()
    assert "1\n00:00:00,500 --> 00:00:02,000\nhello world\n" in text
    assert "2\n00:00:03,000 --> 00:00:04,000\nagain\n" in text


def test_vtt_output(tmp_path):
    writer = get_writer("vtt", str(tmp_path))
    writer(RESULT, "audio.wav", OPTIONS)
    text = (tmp_path / "audio.vtt").read_text()
    assert text.startswith("WEBVTT\n")
    assert "00:00.500 --> 00:02.000\nhello world\n" in text


def test_txt_tsv_json_aud(tmp_path):
    for fmt in ["txt", "tsv", "json", "aud"]:
        get_writer(fmt, str(tmp_path))(RESULT, "a.wav", OPTIONS)
    assert (tmp_path / "a.txt").read_text() == "hello world\nagain\n"
    tsv = (tmp_path / "a.tsv").read_text().splitlines()
    assert tsv[0] == "start\tend\ttext"
    assert tsv[1] == "500\t2000\thello world"
    assert "hello world" in (tmp_path / "a.json").read_text()
    aud = (tmp_path / "a.aud").read_text().splitlines()
    assert aud[0] == "0.5\t2.0\thello world"


def test_writer_all(tmp_path):
    get_writer("all", str(tmp_path))(RESULT, "b.wav", OPTIONS)
    for ext in ["txt", "vtt", "srt", "tsv", "json"]:
        assert (tmp_path / f"b.{ext}").exists()


def test_speaker_prefix(tmp_path):
    result = {
        "language": "en",
        "segments": [
            {**RESULT["segments"][0], "speaker": "SPEAKER_00"},
        ],
    }
    writer = get_writer("srt", str(tmp_path))
    writer(result, "c.wav", OPTIONS)
    assert "[SPEAKER_00]: hello world" in (tmp_path / "c.srt").read_text()


def test_highlight_words(tmp_path):
    options = {"max_line_width": None, "max_line_count": None, "highlight_words": True}
    writer = get_writer("srt", str(tmp_path))
    writer(RESULT, "d.wav", options)
    text = (tmp_path / "d.srt").read_text()
    assert "<u>hello</u>" in text and "<u>world</u>" in text


def test_line_wrapping(tmp_path):
    options = {"max_line_width": 8, "max_line_count": 1, "highlight_words": False}
    writer = get_writer("srt", str(tmp_path))
    writer(RESULT, "e.wav", options)
    text = (tmp_path / "e.srt").read_text()
    # width 8 forces "hello" and "world" into separate blocks (1 line max)
    blocks = [b for b in text.split("\n\n") if b.strip()]
    assert len(blocks) == 3


def test_segment_level_cues_without_words(tmp_path):
    result = {
        "language": "en",
        "segments": [{"start": 0.0, "end": 1.0, "text": " plain"}],
    }
    get_writer("srt", str(tmp_path))(result, "f.wav", OPTIONS)
    assert "plain" in (tmp_path / "f.srt").read_text()


def test_misc_utils():
    assert exact_div(480000, 160) == 3000
    assert compression_ratio("aaaaaaaaaaaaaaaa") > 1.0


def test_interpolate_nans():
    x = np.array([np.nan, 1.0, np.nan, 3.0, np.nan])
    out = interpolate_nans(x)
    assert not np.isnan(out).any()
    assert out[0] == 1.0 and out[4] == 3.0
    assert out[2] in (1.0, 3.0)
    all_nan = interpolate_nans(np.array([np.nan, np.nan]))
    assert np.isnan(all_nan).all()
    one = interpolate_nans(np.array([np.nan, 2.0, np.nan]))
    np.testing.assert_array_equal(one, [2.0, 2.0, 2.0])
