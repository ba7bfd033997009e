"""SRT / WebVTT subtitle codec — the video-text alignment surface.

Video corpora pair frames with caption tracks, and the
training-data join (clip → transcript window) runs on parsed cue
timecodes. This module writes and reads both common formats:

* SRT: numbered blocks, ``HH:MM:SS,mmm --> HH:MM:SS,mmm`` ranges,
  blank-line separated, multi-line cue text.
* WebVTT: ``WEBVTT`` header, ``.`` millisecond separator, optional
  cue identifiers; same block grammar.

``encode_srt/encode_vtt`` render a cue list; ``parse_subtitles``
sniffs the format and returns ``[(index, start_ms, end_ms, text)]``
with exact integer milliseconds (no float timestamps — cue joins
must be exact). Certification: the m_subtitle_cues gate synthesizes
deterministic cues per document, renders SRT, parses it back, proves
the SRT→VTT→parse path returns identical cues, and the oracle
replays the cue arithmetic from payload lengths in SQL. Public-spec
behavior only; the reference repo has no media handling at all.
"""

from __future__ import annotations

import re

_TIME_RE = re.compile(
    r"(\d{2}):(\d{2}):(\d{2})[,.](\d{3})\s*-->\s*"
    r"(\d{2}):(\d{2}):(\d{2})[,.](\d{3})"
)


def _fmt_time(ms: int, sep: str) -> str:
    h, rem = divmod(ms, 3600_000)
    m, rem = divmod(rem, 60_000)
    s, frac = divmod(rem, 1000)
    return f"{h:02d}:{m:02d}:{s:02d}{sep}{frac:03d}"


def encode_srt(cues: list[tuple[int, int, int, str]]) -> str:
    """cues: [(index, start_ms, end_ms, text)] → SRT document."""
    blocks = []
    for idx, start, end, text in cues:
        blocks.append(
            f"{idx}\n{_fmt_time(start, ',')} --> {_fmt_time(end, ',')}\n{text}"
        )
    return "\n\n".join(blocks) + "\n"


def encode_vtt(cues: list[tuple[int, int, int, str]]) -> str:
    blocks = ["WEBVTT"]
    for idx, start, end, text in cues:
        blocks.append(
            f"{idx}\n{_fmt_time(start, '.')} --> {_fmt_time(end, '.')}\n{text}"
        )
    return "\n\n".join(blocks) + "\n"


def parse_subtitles(doc: str) -> list[tuple[int, int, int, str]]:
    """SRT or WebVTT → [(index, start_ms, end_ms, text)]. Cue
    identifiers that aren't integers get a sequential index; malformed
    timecode lines raise (a torn range must not silently drop a
    cue)."""
    body = doc.replace("\r\n", "\n").strip("﻿")
    if body.startswith("WEBVTT"):
        # the header BLOCK may carry metadata lines (Kind:, Language:);
        # drop everything up to the first blank line — UNLESS a cue is
        # glued straight onto the header with no blank line (tolerated
        # by real players): then drop only the header line itself so
        # the glued cue still parses instead of vanishing.
        parts = re.split(r"\n\s*\n", body, maxsplit=1)
        header_block = parts[0]
        if any("-->" in ln for ln in header_block.split("\n")[1:]):
            # glued cue: the header block itself contains a timecode.
            # The header may ALSO carry metadata lines (Kind:,
            # Language:) before the cue — drop everything up to the
            # first timecode line, keeping at most ONE preceding
            # non-metadata line as the cue identifier (metadata lines
            # are "Key: value"-shaped; a real identifier is not).
            hlines = body.split("\n")
            # scan from line 1 like the guard above — the WEBVTT
            # header line itself may contain '-->' (e.g. a note) and
            # must never be taken for the cue's timecode line
            ti = next(
                i for i, ln in enumerate(hlines[1:], start=1)
                if "-->" in ln
            )
            start = ti
            if ti >= 2:
                prev = hlines[ti - 1].strip()
                if prev and not re.match(r"^[\w-]+:\s", prev):
                    start = ti - 1
            body = "\n".join(hlines[start:])
        else:
            body = parts[1] if len(parts) > 1 else ""
    out = []
    seq = 0
    for block in re.split(r"\n\s*\n", body.strip()):
        lines = [ln for ln in block.split("\n")]
        if not lines or not any(ln.strip() for ln in lines):
            continue
        # WebVTT comment/metadata blocks are not cues; a torn cue
        # (any other block without a timecode) still raises below
        head = lines[0].strip().split(None, 1)[0] if lines[0].strip() else ""
        if head in ("NOTE", "STYLE", "REGION") and not any(
            "-->" in ln for ln in lines
        ):
            continue
        seq += 1
        first = lines[0].strip()
        ti = 0
        idx = seq
        if "-->" not in first:
            ti = 1
            try:
                idx = int(first)
            except ValueError:
                idx = seq
        if ti >= len(lines):
            raise ValueError(f"subtitle block without timecode: {block!r}")
        m = _TIME_RE.match(lines[ti].strip())
        if not m:
            raise ValueError(f"malformed subtitle timecode: {lines[ti]!r}")
        g = [int(v) for v in m.groups()]
        start = ((g[0] * 60 + g[1]) * 60 + g[2]) * 1000 + g[3]
        end = ((g[4] * 60 + g[5]) * 60 + g[6]) * 1000 + g[7]
        if end < start:
            raise ValueError(f"subtitle cue ends before it starts: {lines[ti]!r}")
        text = "\n".join(lines[ti + 1 :]).strip()
        out.append((idx, start, end, text))
    return out


# --------------------------------------------------------- spark plumbing

SUBTITLE_SCHEMA = (
    "doc_id long, n_cues bigint, total_ms bigint, first_start_ms bigint, "
    "last_end_ms bigint, vtt_ok boolean"
)


def subtitle_stats(media) -> "object":
    """Subtitle pipeline certified end-to-end: per payload, derive a
    deterministic cue list (n = len%6+1 cues; cue i starts at
    i·2000 + len%997 ms and lasts 500 + (len+i)%1500 ms, text from
    the payload), render real SRT, parse it back, and emit the exact
    integer stats a clip-alignment join needs (cue count, summed
    duration, first start, last end) — all replayed by the oracle
    from payload lengths in SQL. ``vtt_ok`` pins that rendering the
    same cues as WebVTT and parsing returns the identical cue list
    (the ,/. millisecond separator and header handling).

    mapInPandas batches; documents never shuffle."""
    from collections.abc import Iterator

    import pandas as pd

    from building_coffee_commodity_trading_data_warehouse_spark.sources.multimodal import (
        _widen,
    )

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        def _one(payload: bytes):
            b = bytes(payload)
            n = len(b)
            k = n % 6 + 1
            cues = []
            for i in range(k):
                start = i * 2000 + n % 997
                dur = 500 + (n + i) % 1500
                # cue text from the payload, sanitized to the block
                # grammar (raw bytes could inject the blank-line cue
                # separator or leading/trailing whitespace)
                frag = "".join(
                    c for c in b[i : i + 8].decode("latin-1") if c.isalnum()
                )
                cues.append((i + 1, start, start + dur, f"cue{i} {frag}".strip()))
            parsed = parse_subtitles(encode_srt(cues))
            vtt = parse_subtitles(encode_vtt(cues))
            ok = parsed == cues and vtt == cues
            if not ok:
                raise AssertionError("subtitle roundtrip diverged")
            total = sum(e - s for _, s, e, _ in parsed)
            return (
                len(parsed),
                total,
                parsed[0][1],
                parsed[-1][2],
                bool(vtt == parsed),
            )

        for pdf in it:
            rows = [_one(p) for p in pdf["payload"]]
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_cues": _np.array([r[0] for r in rows], dtype="int64"),
                    "total_ms": _np.array([r[1] for r in rows], dtype="int64"),
                    "first_start_ms": _np.array(
                        [r[2] for r in rows], dtype="int64"
                    ),
                    "last_end_ms": _np.array(
                        [r[3] for r in rows], dtype="int64"
                    ),
                    "vtt_ok": [r[4] for r in rows],
                }
            )

    return _widen(media).mapInPandas(_batches, schema=SUBTITLE_SCHEMA)
