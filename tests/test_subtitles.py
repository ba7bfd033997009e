"""SRT/WebVTT codec tests (sources/subtitles.py)."""

from __future__ import annotations

import pytest

from building_coffee_commodity_trading_data_warehouse_spark.sources import subtitles

_CUES = [
    (1, 0, 1500, "hello world"),
    (2, 2000, 3750, "line one\nline two"),
    (3, 3_600_000 + 61_000 + 500, 3_600_000 + 65_000, "over an hour"),
]


def test_srt_roundtrip():
    assert subtitles.parse_subtitles(subtitles.encode_srt(_CUES)) == _CUES


def test_vtt_roundtrip():
    assert subtitles.parse_subtitles(subtitles.encode_vtt(_CUES)) == _CUES


def test_srt_format_pinned():
    doc = subtitles.encode_srt([(1, 3_723_456, 3_723_999, "x")])
    assert "01:02:03,456 --> 01:02:03,999" in doc


def test_vtt_format_pinned():
    doc = subtitles.encode_vtt([(1, 0, 1000, "x")])
    assert doc.startswith("WEBVTT\n")
    assert "00:00:00.000 --> 00:00:01.000" in doc


def test_crlf_and_non_integer_identifiers():
    doc = "WEBVTT\r\n\r\nintro-cue\r\n00:00:00.000 --> 00:00:01.000\r\nhi\r\n"
    cues = subtitles.parse_subtitles(doc)
    assert cues == [(1, 0, 1000, "hi")]


def test_malformed_timecode_raises():
    with pytest.raises(ValueError):
        subtitles.parse_subtitles("1\n00:00:00,000 -> 00:00:01,000\nhi\n")
    with pytest.raises(ValueError):
        subtitles.parse_subtitles("1\nno timecode here\nhi\n")


def test_reversed_range_raises():
    with pytest.raises(ValueError):
        subtitles.parse_subtitles(
            "1\n00:00:05,000 --> 00:00:01,000\nbackwards\n"
        )


def test_multiline_text_and_blank_separation():
    doc = "1\n00:00:00,000 --> 00:00:01,000\na\nb\nc\n\n\n2\n00:00:02,000 --> 00:00:03,000\nd\n"
    cues = subtitles.parse_subtitles(doc)
    assert cues[0][3] == "a\nb\nc"
    assert cues[1][0] == 2


def test_vtt_header_metadata_note_style_blocks_skipped():
    """Real-world VTT: header metadata lines, NOTE and STYLE blocks are
    not cues and must not raise; torn cues still do."""
    doc = (
        "WEBVTT\nKind: captions\nLanguage: en\n\n"
        "NOTE this file is machine generated\nacross two lines\n\n"
        "STYLE\n::cue { color: gold }\n\n"
        "1\n00:00:00.000 --> 00:00:01.000\nhi\n\n"
        "NOTE trailing comment\n"
    )
    assert subtitles.parse_subtitles(doc) == [(1, 0, 1000, "hi")]
    # a block that starts with NOTE but contains a timecode is a cue
    doc2 = "NOTE\n00:00:00.000 --> 00:00:01.000\nreal cue\n"
    assert subtitles.parse_subtitles(doc2) == [(1, 0, 1000, "real cue")]
    # torn cue (no NOTE/STYLE prefix, no timecode) still raises
    with pytest.raises(ValueError):
        subtitles.parse_subtitles("WEBVTT\n\nnot a cue at all\njust text\n")


def test_vtt_cue_glued_to_header_still_parses():
    """Real-world VTT files sometimes glue the first cue straight
    onto the WEBVTT line with no blank separator; the header skip
    must drop only the header LINE then, not the whole block (which
    silently returned zero cues, r9 review)."""
    from building_coffee_commodity_trading_data_warehouse_spark.sources.subtitles import parse_subtitles

    doc = "WEBVTT\n00:00:00.000 --> 00:00:01.000\nhi\n\n00:00:02.000 --> 00:00:03.000\nbye\n"
    got = parse_subtitles(doc)
    assert [(s, e, t) for _, s, e, t in got] == [
        (0, 1000, "hi"),
        (2000, 3000, "bye"),
    ]
    # a PROPER header block (metadata, blank line) still skips whole
    doc2 = "WEBVTT\nKind: captions\n\n00:00:00.000 --> 00:00:01.000\nhi\n"
    assert len(parse_subtitles(doc2)) == 1


def test_vtt_glued_cue_after_header_metadata():
    """Glued cue preceded by header METADATA lines (no blank line
    anywhere in the header): the metadata must be dropped, not
    consumed as a cue identifier — and two metadata lines must not
    turn the block into a torn-cue ValueError (r10 review)."""
    # one metadata line: before the fix it became the cue identifier
    doc = (
        "WEBVTT\nKind: captions\n"
        "00:00:00.000 --> 00:00:01.000\nhi\n\n"
        "00:00:02.000 --> 00:00:03.000\nbye\n"
    )
    got = subtitles.parse_subtitles(doc)
    assert [(s, e, t) for _, s, e, t in got] == [
        (0, 1000, "hi"),
        (2000, 3000, "bye"),
    ]
    # two metadata lines: before the fix lines[1] was 'Language: en'
    # (not a timecode) and parsing raised on a file real players play
    doc2 = (
        "WEBVTT\nKind: captions\nLanguage: en\n"
        "00:00:00.000 --> 00:00:01.000\nhi\n"
    )
    assert [(s, e, t) for _, s, e, t in subtitles.parse_subtitles(doc2)] == [
        (0, 1000, "hi")
    ]
    # a real cue IDENTIFIER between metadata and timecode is kept
    doc3 = (
        "WEBVTT\nKind: captions\nintro-cue\n"
        "00:00:00.000 --> 00:00:01.000\nhi\n"
    )
    assert subtitles.parse_subtitles(doc3) == [(1, 0, 1000, "hi")]
    # integer identifier straight after WEBVTT (no metadata) is kept
    doc4 = "WEBVTT\n7\n00:00:00.000 --> 00:00:01.000\nhi\n"
    assert subtitles.parse_subtitles(doc4) == [(7, 0, 1000, "hi")]


def test_vtt_header_line_containing_arrow_with_glued_cue():
    """The WEBVTT header line itself may contain '-->' (a note); the
    glued-cue scan must start at line 1 like its triggering guard, or
    the header is taken for a timecode line and parsing raises."""
    from building_coffee_commodity_trading_data_warehouse_spark.sources.subtitles import (
        parse_subtitles,
    )

    doc = (
        "WEBVTT - notes --> generated\n"
        "00:00:00.000 --> 00:00:01.000\nhey\n"
    )
    cues = parse_subtitles(doc)
    assert len(cues) == 1 and cues[0][3] == "hey"
