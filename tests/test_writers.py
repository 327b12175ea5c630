"""Transcript writers (utils/writers.py) — openai get_writer parity.

Golden-string tests for the srt/vtt/tsv/txt formats against the openai
``whisper/utils.py`` writer conventions, JSON round-trip, word-level
highlight cues, and the timestamp formatter's carry/edge behavior.
"""

import io
import json

import pytest

from mocov2_whisper_flamingo_tpu.decode.timestamps import WordTiming
from mocov2_whisper_flamingo_tpu.utils.writers import (
    WRITER_FORMATS, format_timestamp, get_writer, write_json, write_srt,
    write_tsv, write_txt, write_vtt)

RESULT = {
    "text": " hello world again",
    "segments": [
        {"id": 0, "start": 0.0, "end": 2.5, "text": " hello world",
         "tokens": [1, 2]},
        {"id": 1, "start": 2.5, "end": 5.0, "text": " again",
         "tokens": [3]},
    ],
    "words": [
        WordTiming("hello", 0.0, 1.0, [1]),
        WordTiming("world", 1.0, 2.5, [2]),
        WordTiming("again", 2.5, 4.0, [3]),
    ],
}


def _render(writer, result=RESULT, **kw):
    buf = io.StringIO()
    writer(result, buf, **kw) if kw else writer(result, buf)
    return buf.getvalue()


def test_format_timestamp():
    assert format_timestamp(0.0) == "00:00.000"
    assert format_timestamp(1.5) == "00:01.500"
    assert format_timestamp(59.9995) == "01:00.000"  # ms rounding carries
    assert format_timestamp(3661.25, True, ",") == "01:01:01,250"
    assert format_timestamp(3600.0) == "01:00:00.000"  # hours auto-included
    with pytest.raises(ValueError):
        format_timestamp(-1.0)


def test_txt():
    assert _render(write_txt) == "hello world\nagain\n"


def test_srt_golden():
    assert _render(write_srt) == (
        "1\n00:00:00,000 --> 00:00:02,500\nhello world\n\n"
        "2\n00:00:02,500 --> 00:00:05,000\nagain\n\n")


def test_vtt_golden():
    assert _render(write_vtt) == (
        "WEBVTT\n\n"
        "00:00.000 --> 00:02.500\nhello world\n\n"
        "00:02.500 --> 00:05.000\nagain\n\n")


def test_tsv():
    lines = _render(write_tsv).splitlines()
    assert lines[0] == "start\tend\ttext"
    assert lines[1] == "0\t2500\thello world"
    assert lines[2] == "2500\t5000\tagain"


def test_json_roundtrip():
    out = json.loads(_render(write_json))
    assert out["text"] == RESULT["text"]
    assert [s["text"] for s in out["segments"]] == [" hello world", " again"]
    assert out["words"][0] == {"word": "hello", "start": 0.0, "end": 1.0,
                               "tokens": [1]}


def test_highlight_words():
    srt = _render(write_srt, highlight_words=True)
    # cue text is the enclosing SEGMENT's words only (openai behavior),
    # not the whole transcript
    assert "<u>hello</u> world\n" in srt
    assert "hello <u>world</u>\n" in srt
    assert "again" not in srt.replace("<u>again</u>", "")
    assert "00:00:01,000 --> 00:00:02,500" in srt  # word-level cue times
    vtt = _render(write_vtt, highlight_words=True)
    assert vtt.startswith("WEBVTT") and "\n<u>again</u>\n" in vtt


def test_line_cues_do_not_span_segments():
    """max_words_per_line groups WITHIN segments: a cue must not bridge
    the (possibly silent) gap between two segments."""
    srt = _render(write_srt, max_words_per_line=5)
    # 3 words but 2 segments -> 2 cues, split at the segment boundary
    assert srt.count("-->") == 2
    assert "hello world\n" in srt and "\nagain\n" in srt
    assert "00:00:02,500 --> 00:00:04,000" in srt  # seg-1 words only


def test_arrow_in_text_sanitized():
    result = {"text": "a --> b", "segments": [
        {"start": 0.0, "end": 1.0, "text": "a --> b", "tokens": [1]}]}
    srt = _render(write_srt, result)
    assert "a -> b" in srt and srt.count("-->") == 1  # only the cue arrow
    vtt = _render(write_vtt, result)
    assert "a -> b" in vtt and vtt.count("-->") == 1


def test_no_segments_fallback():
    result = {"text": "x", "segments": [],
              "words": [WordTiming("x", 0.0, 1.25, [9])]}
    assert _render(write_txt, result) == "x\n"
    assert "00:00:00,000 --> 00:00:01,250" in _render(write_srt, result)


def test_get_writer():
    assert set(WRITER_FORMATS) == {"txt", "srt", "vtt", "tsv", "json"}
    assert get_writer("srt") is write_srt
    with pytest.raises(ValueError, match="unknown output format"):
        get_writer("docx")


def test_max_words_per_line():
    srt = io.StringIO()
    write_srt(RESULT, srt, max_words_per_line=2)
    out = srt.getvalue()
    assert "hello world\n" in out and "again\n" in out
    # first cue spans words 1-2, second cue is word 3 alone
    assert "00:00:00,000 --> 00:00:02,500" in out
    assert "00:00:02,500 --> 00:00:04,000" in out
    vtt = io.StringIO()
    write_vtt(RESULT, vtt, max_words_per_line=1)
    assert vtt.getvalue().count("-->") == 3  # one cue per word
    # without word timings the option is a no-op (segment cues)
    no_words = {**RESULT, "words": []}
    srt2 = io.StringIO()
    write_srt(no_words, srt2, max_words_per_line=2)
    assert srt2.getvalue().count("-->") == 2

