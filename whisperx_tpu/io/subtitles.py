"""Language-aware subtitle post-processor.

Behavioral equivalent of the reference's SubtitlesProcessor
(whisperx/SubtitlesProcessor.py:34-226) — properly packaged here (the
reference version is dead code due to a broken absolute import at its line
2). Splits aligned segments into readable subtitle fragments at length
limits, language-specific commas, and conjunctions; estimates timestamps for
unaligned words at 0.25 s/char; writes srt or vtt.
"""

from __future__ import annotations

import math
from typing import List, Optional

from .conjunctions import get_comma, get_conjunctions

COMPLEX_SCRIPT_LANGUAGES = (
    "th", "lo", "my", "km", "am", "ko", "ja", "zh", "ti", "ta", "te",
    "kn", "ml", "hi", "ne", "mr", "ar", "fa", "ur", "ka",
)


def normal_round(n: float) -> int:
    return math.floor(n) if n - math.floor(n) < 0.5 else math.ceil(n)


def format_timestamp(seconds: float, is_vtt: bool = False) -> str:
    assert seconds >= 0, "non-negative timestamp expected"
    ms = round(seconds * 1000.0)
    hours, ms = divmod(ms, 3_600_000)
    minutes, ms = divmod(ms, 60_000)
    secs, ms = divmod(ms, 1_000)
    sep = "." if is_vtt else ","
    return f"{hours:02d}:{minutes:02d}:{secs:02d}{sep}{ms:03d}"


class SubtitlesProcessor:
    def __init__(
        self,
        segments,
        lang: str,
        max_line_length: int = 45,
        min_char_length_splitter: int = 30,
        is_vtt: bool = False,
    ):
        self.segments = segments
        self.lang = lang
        self.comma = get_comma(lang)
        self.conjunctions = set(get_conjunctions(lang))
        self.is_vtt = is_vtt
        if lang in COMPLEX_SCRIPT_LANGUAGES:
            max_line_length, min_char_length_splitter = 30, 20
        self.max_line_length = max_line_length
        self.min_char_length_splitter = min_char_length_splitter

    # -- timestamp healing ----------------------------------------------------

    def estimate_timestamp_for_word(self, words, i, next_segment_start_time=None):
        """Fill missing word times from neighbors, else 0.25 s per char."""
        k = 0.25
        has_prev_end = i > 0 and "end" in words[i - 1]
        has_next_start = i < len(words) - 1 and "start" in words[i + 1]

        if has_prev_end:
            words[i]["start"] = words[i - 1]["end"]
            if has_next_start:
                words[i]["end"] = words[i + 1]["start"]
            elif next_segment_start_time:
                gap_ok = next_segment_start_time - words[i - 1]["end"] <= 1
                words[i]["end"] = (
                    next_segment_start_time if gap_ok else next_segment_start_time - 0.5
                )
            else:
                words[i]["end"] = words[i]["start"] + len(words[i]["word"]) * k
        elif has_next_start:
            words[i]["start"] = words[i + 1]["start"] - len(words[i]["word"]) * k
            words[i]["end"] = words[i + 1]["start"]
        elif next_segment_start_time:
            words[i]["start"] = next_segment_start_time - 1
            words[i]["end"] = next_segment_start_time - 0.5
        else:
            words[i]["start"] = 0
            words[i]["end"] = 0

    # -- splitting --------------------------------------------------------------

    def _word_text(self, word) -> str:
        return word["word"] if isinstance(word, dict) else word

    def determine_advanced_split_points(self, segment, next_segment_start_time=None) -> List[int]:
        split_points: List[int] = []
        last_split_point = 0
        char_count = 0
        words = segment.get("words", segment["text"].split())
        add_space = 0 if self.lang in ("zh", "ja") else 1

        def wlen(w):
            return len(self._word_text(w)) + (0 if isinstance(w, dict) else add_space)

        total = sum(
            len(w["word"]) if isinstance(w, dict) else len(w) + add_space for w in words
        )
        char_count_after = total

        for i, word in enumerate(words):
            text = self._word_text(word)
            word_length = len(text) + add_space
            char_count += word_length
            char_count_after -= word_length
            char_count_before = char_count - word_length

            if isinstance(word, dict) and ("start" not in word or "end" not in word):
                self.estimate_timestamp_for_word(words, i, next_segment_start_time)

            if char_count >= self.max_line_length:
                midpoint = normal_round((last_split_point + i) / 2)
                if char_count_before >= self.min_char_length_splitter:
                    split_points.append(midpoint)
                    last_split_point = midpoint + 1
                    char_count = sum(
                        len(words[j]["word"]) if isinstance(words[j], dict) else len(words[j]) + add_space
                        for j in range(last_split_point, i + 1)
                    )
            elif (
                text.endswith(self.comma)
                and char_count_before >= self.min_char_length_splitter
                and char_count_after >= self.min_char_length_splitter
            ):
                split_points.append(i)
                last_split_point = i + 1
                char_count = 0
            elif (
                text.lower() in self.conjunctions
                and char_count_before >= self.min_char_length_splitter
                and char_count_after >= self.min_char_length_splitter
            ):
                split_points.append(i - 1)
                last_split_point = i
                char_count = word_length
        return split_points

    def generate_subtitles_from_split_points(
        self, segment, split_points: List[int], next_start_time=None
    ) -> List[dict]:
        subtitles = []
        words = segment.get("words", segment["text"].split())
        total_words = len(words)
        total_time = segment["end"] - segment["start"]
        elapsed = segment["start"]
        prefix = "" if self.lang in ("zh", "ja") else " "

        def emit(fragment_words, end_lookahead: Optional[float]):
            nonlocal elapsed
            if isinstance(fragment_words[0], dict):
                start_time = fragment_words[0]["start"]
                end_time = fragment_words[-1]["end"]
                if end_lookahead is not None and (end_lookahead - end_time) <= 0.8:
                    end_time = end_lookahead
                text = prefix.join(w["word"] for w in fragment_words)
            else:
                duration = (len(fragment_words) / total_words) * total_time
                start_time = elapsed
                end_time = elapsed + duration
                elapsed += duration
                text = prefix.join(fragment_words).strip()
            subtitles.append(
                {"start": start_time, "end": end_time if end_time is not None else segment["end"], "text": text}
            )

        start_idx = 0
        for sp in split_points:
            frag = words[start_idx : sp + 1]
            if not frag:
                start_idx = sp + 1
                continue
            lookahead = None
            if isinstance(frag[0], dict) and sp + 1 < len(words):
                nxt = words[sp + 1]
                lookahead = nxt.get("start") if isinstance(nxt, dict) else None
            emit(frag, lookahead)
            start_idx = sp + 1

        if start_idx < len(words):
            emit(words[start_idx:], next_start_time)
        return subtitles

    # -- driver --------------------------------------------------------------

    def process_segments(self, advanced_splitting: bool = True) -> List[dict]:
        subtitles = []
        for i, segment in enumerate(self.segments):
            next_start = self.segments[i + 1]["start"] if i + 1 < len(self.segments) else None
            if advanced_splitting:
                points = self.determine_advanced_split_points(segment, next_start)
                subtitles.extend(
                    self.generate_subtitles_from_split_points(segment, points, next_start)
                )
            else:
                words = segment.get("words", [])
                for j, word in enumerate(words):
                    if "start" not in word or "end" not in word:
                        self.estimate_timestamp_for_word(words, j, next_start)
                subtitles.append(
                    {"start": segment["start"], "end": segment["end"], "text": segment["text"]}
                )
        return subtitles

    def save(self, filename: str = "subtitles.srt", advanced_splitting: bool = True) -> int:
        subtitles = self.process_segments(advanced_splitting)
        with open(filename, "w", encoding="utf-8") as f:
            if self.is_vtt:
                f.write("WEBVTT\n\n")
            for idx, sub in enumerate(subtitles, 1):
                f.write(f"{idx}\n")
                f.write(
                    f"{format_timestamp(sub['start'], self.is_vtt)} --> "
                    f"{format_timestamp(sub['end'], self.is_vtt)}\n"
                )
                f.write(sub["text"].strip() + "\n\n")
        return len(subtitles)
