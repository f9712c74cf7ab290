"""Pure-Python media container decoders (functions/media.py).

Payloads are hand-built minimal-but-valid containers: a 1x1 PNG (zlib-
deflated single pixel), a 4-sample PCM WAV, and an ftyp+moov/mvhd MP4.
These exercise the REAL decode path the multimodal pipeline swaps in
under CLOUD_SYNC_REAL_DECODE=1 — the synthetic corpus itself carries
UTF-8 text payloads, which must come back TAGGED invalid, not crash.
"""

from __future__ import annotations

import struct
import zlib

import pytest

from cloud_data_sync_spark.functions.media import (
    MediaFormatError,
    decode_media,
    parse_mp4,
    parse_png,
    parse_wav,
)


def _png_chunk(name: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + name
        + data
        + struct.pack(">I", zlib.crc32(name + data))
    )


def make_png(width: int = 1, height: int = 1, frames: int | None = None) -> bytes:
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + b"\x7f" * width for _ in range(height))
    out = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
    if frames is not None:
        out += _png_chunk(b"acTL", struct.pack(">II", frames, 0))
    out += _png_chunk(b"IDAT", zlib.compress(raw))
    out += _png_chunk(b"IEND", b"")
    return out


def make_wav(n_samples: int = 4, rate: int = 8000, channels: int = 1) -> bytes:
    block_align = channels * 2
    data = b"\x00\x01" * (n_samples * channels)
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * block_align, block_align, 16
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def make_mp4(duration: int = 1000, timescale: int = 500) -> bytes:
    def box(name: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + name + payload

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mvhd = box(
        b"mvhd",
        b"\x00\x00\x00\x00"  # version 0 + flags
        + struct.pack(">II", 0, 0)  # creation/modification time
        + struct.pack(">II", timescale, duration)
        + b"\x00" * 80,
    )
    return ftyp + box(b"moov", mvhd)


def test_png_dimensions_and_frames():
    p = parse_png(make_png(3, 2))
    assert (p["width"], p["height"], p["n_frames"]) == (3, 2, 1)
    assert p["codec"] == "png-3x2"
    assert parse_png(make_png(1, 1, frames=7))["n_frames"] == 7


def test_wav_rate_channels_samples():
    w = parse_wav(make_wav(n_samples=44, rate=16000, channels=2))
    assert w["sample_rate"] == 16000
    assert w["channels"] == 2
    assert w["n_frames"] == 44
    assert w["codec"] == "pcm16-16000hz"


def test_mp4_brand_and_duration():
    m = parse_mp4(make_mp4(duration=1000, timescale=500))  # 2 s -> 50 frames
    assert m["brand"] == "isom"
    assert m["n_frames"] == 50
    assert m["codec"] == "mp4-isom"


@pytest.mark.parametrize(
    "parser", [parse_png, parse_wav, parse_mp4]
)
def test_parsers_reject_text_payloads(parser):
    with pytest.raises((MediaFormatError, struct.error)):
        parser(b"hello world this is not a media container at all")


def test_decode_media_real_containers():
    png = decode_media(make_png(2, 2), "image/png")
    assert png["codec"] == "png-2x2" and png["byte_len"] == len(make_png(2, 2))
    wav = decode_media(make_wav(), "audio/wav")
    assert wav["codec"].startswith("pcm16")
    mp4 = decode_media(make_mp4(), "video/mp4")
    assert mp4["codec"] == "mp4-isom"
    # head_checksum on the real path sums raw bytes
    assert png["head_checksum"] == sum(make_png(2, 2)[:8])


def test_decode_media_tags_corrupt_rows_instead_of_raising():
    out = decode_media(b"utf-8 text payload", "image/png")
    assert out["codec"] == "invalid/image"
    assert out["n_frames"] == 0
    assert out["byte_len"] == len(b"utf-8 text payload")
    unknown = decode_media(b"x", "application/pdf")
    assert unknown["codec"] == "unknown/application"


def test_real_decode_flag_swaps_decode_payload(monkeypatch):
    import cloud_data_sync_spark.operators.multimodal as mm

    monkeypatch.setattr(mm, "REAL_DECODE_REQUESTED", True)
    out = mm.decode_payload(make_png(5, 4), "image/png")
    assert out["codec"] == "png-5x4"
    # synthetic text payloads tag, never raise — zero stubs left
    tagged = mm.decode_payload(b"synthetic doc text", "video/mp4")
    assert tagged["codec"] == "invalid/video"


def test_fake_path_unchanged_default(monkeypatch):
    import cloud_data_sync_spark.operators.multimodal as mm

    monkeypatch.setattr(mm, "REAL_DECODE_REQUESTED", False)
    out = mm.decode_payload("abc".encode(), "image/png")
    assert out["codec"] == "fake-image"
    assert out["head_checksum"] == sum(map(ord, "abc"))
