"""ID3v2.3 codec tests (sources/id3.py): tag roundtrips over real
FLAC/WAV streams, sync-safe sizes, UTF-16 frames, padding, v2.4
sizes, and hostile inputs."""

from __future__ import annotations

import struct

import pytest

from building_coffee_commodity_trading_data_warehouse_spark.sources import id3
from building_coffee_commodity_trading_data_warehouse_spark.sources.flac import (
    decode_flac,
    encode_flac,
)

_FIELDS = dict(
    title="track1",
    artist="artist2",
    album="album3",
    year="2005",
    genre="genre0",
    extra={"lang": "l2", "src": "web"},
)


def _flac():
    pcm = struct.pack("<64h", *[(i * 37 - 900) % 1000 for i in range(64)])
    return encode_flac(8000, pcm, 1, block_size=64), pcm


def test_roundtrip_over_flac():
    fl, pcm = _flac()
    tagged = id3.prepend_id3(fl, _FIELDS)
    back = id3.parse_id3(tagged)
    for k in ("title", "artist", "album", "year", "genre"):
        assert back[k] == _FIELDS[k], k
    assert back["extra"] == _FIELDS["extra"]
    assert id3.strip_id3(tagged) == fl
    assert decode_flac(id3.strip_id3(tagged))[2] == pcm


def test_no_tag_is_noop():
    fl, _ = _flac()
    assert id3.parse_id3(fl) == {}
    assert id3.strip_id3(fl) == fl


def test_syncsafe_size():
    assert id3._syncsafe(0) == b"\x00\x00\x00\x00"
    assert id3._syncsafe(0x7F) == b"\x00\x00\x00\x7f"
    assert id3._syncsafe(128) == b"\x00\x00\x01\x00"  # 7-bit carry
    assert id3._unsyncsafe(id3._syncsafe(123456)) == 123456
    with pytest.raises(ValueError):
        id3._unsyncsafe(b"\x80\x00\x00\x00")


def test_utf16_text_frame():
    body = b"\x01" + "héllo wörld".encode("utf-16")
    f = b"TIT2" + struct.pack(">I", len(body)) + b"\x00\x00" + body
    tag = b"ID3\x03\x00\x00" + id3._syncsafe(len(f)) + f
    assert id3.parse_id3(tag)["title"] == "héllo wörld"


def test_padding_and_unknown_frames_skipped():
    frames = (
        id3._frame(b"PRIV", b"owner\x00data")  # unknown → skipped
        + id3._frame(b"TIT2", b"\x00padded")
        + b"\x00" * 16  # padding
    )
    tag = b"ID3\x03\x00\x00" + id3._syncsafe(len(frames)) + frames
    back = id3.parse_id3(tag)
    assert back["title"] == "padded"


def test_v24_syncsafe_frame_sizes():
    body = b"\x00deep"
    f = b"TIT2" + id3._syncsafe(len(body)) + b"\x00\x00" + body
    tag = b"ID3\x04\x00\x00" + id3._syncsafe(len(f)) + f
    assert id3.parse_id3(tag)["title"] == "deep"


def test_hostile_inputs():
    with pytest.raises(ValueError):
        id3.parse_id3(b"ID3\x09\x00\x00\x00\x00\x00\x00")  # bad version
    with pytest.raises(ValueError):
        id3.parse_id3(b"ID3\x03\x00\x80\x00\x00\x00\x00")  # unsync flag
    with pytest.raises(ValueError):
        id3.parse_id3(b"ID3\x03\x00\x00\x7f\x7f\x7f\x7f")  # size > payload
    # frame overrunning the tag
    f = b"TIT2" + struct.pack(">I", 1000) + b"\x00\x00" + b"\x00hi"
    tag = b"ID3\x03\x00\x00" + id3._syncsafe(len(f)) + f
    with pytest.raises(ValueError):
        id3.parse_id3(tag)


def test_v24_footer_flag_skipped_by_strip():
    """ID3v2.4 footer (header flag 0x10): 10 extra '3DI' bytes follow
    the tag body and are NOT counted in the syncsafe size — strip_id3
    must skip them so the FLAC magic sniff lands on 'fLaC'."""
    fl, pcm = _flac()
    body = b"\x00deep"
    f = b"TIT2" + id3._syncsafe(len(body)) + b"\x00\x00" + body
    tag = b"ID3\x04\x00\x10" + id3._syncsafe(len(f)) + f
    footer = b"3DI\x04\x00\x10" + id3._syncsafe(len(f))
    tagged = tag + footer + fl
    assert id3.parse_id3(tagged)["title"] == "deep"
    assert id3.parse_id3(tagged)["tag_size"] == len(tag) + len(footer)
    assert id3.strip_id3(tagged) == fl
    assert decode_flac(id3.strip_id3(tagged))[2] == pcm
    # v2.3 cannot carry the footer flag: bit 0x10 there must not skip
    tag3 = b"ID3\x03\x00\x00" + id3._syncsafe(len(f) - 0) + f
    assert id3.strip_id3(tag3 + fl) == fl


def test_v24_footer_counted_in_truncation_check():
    """A v2.4 tag with the footer flag whose payload ends before the
    10-byte footer must raise, not report a tag_size past the data
    (r9 review: data[tag_size:] silently read b'')."""
    import pytest

    from building_coffee_commodity_trading_data_warehouse_spark.sources.id3 import encode_id3, parse_id3

    tag = bytearray(encode_id3({"title": "t"}))
    tag[3] = 4           # v2.4
    tag[5] |= 0x10       # footer flag, but NO footer bytes appended
    with pytest.raises(ValueError, match="exceeds payload"):
        parse_id3(bytes(tag))
    # with the footer actually present it parses and sizes past it
    full = bytes(tag) + b"3DI" + bytes(tag[3:10])
    info = parse_id3(full)
    assert info["tag_size"] == len(full)
