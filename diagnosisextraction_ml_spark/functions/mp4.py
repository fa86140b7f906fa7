"""Minimal from-spec ISO-BMFF (MP4) metadata probe (stdlib only).

Video FRAME decode genuinely needs external codec libraries (ffmpeg)
— that boundary stands. But a training-data pipeline filters and
routes video long before it decodes a frame: by duration, track
count, codec fourcc, brand. All of that lives in the ISO base media
file format's box structure (ISO/IEC 14496-12, the public MP4/QuickTime
container spec), which parses with nothing beyond ``struct``:
length-fourcc boxes, ``ftyp`` brands, ``moov/mvhd`` timescale +
duration, one ``trak/mdia`` per track with its ``hdlr`` handler and
``stsd`` sample-description fourcc.

``probe_mp4`` walks that structure and returns the routing metadata;
it never touches sample data. The writer (`build_mp4_stub`) emits a
structurally valid metadata-only container for fixtures/tests —
production media obviously comes from real muxers.
"""

from __future__ import annotations

import struct


def _boxes(b: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for the boxes in [start, end)."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", b[pos:pos + 4])
        fourcc = b[pos + 4:pos + 8]
        hdr = 8
        if size == 1:  # 64-bit largesize
            (size,) = struct.unpack(">Q", b[pos + 8:pos + 16])
            hdr = 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError(
                f"invalid ISO-BMFF box size {size} for {fourcc!r} at {pos}"
            )
        yield fourcc, pos + hdr, pos + size
        pos += size


def probe_mp4(payload: bytes) -> dict:
    """Parse the container's routing metadata: {"brand", "duration_ms",
    "timescale", "n_tracks", "tracks": [{"handler", "codec"}]}.

    Raises ``ValueError`` for anything that is not a sane ISO-BMFF
    stream (no ftyp/moov, corrupt box sizes) and lets ``struct.error``
    surface on truncation inside a fixed-width field — the same fault
    surface contract as the image/audio codecs, so
    ``extract_features_robust``-style per-row quarantine works
    unchanged."""
    b = bytes(payload or b"")
    if len(b) < 12 or b[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF stream (missing ftyp)")
    brand = b[8:12].decode("latin-1")
    out = {
        "brand": brand,
        "duration_ms": None,
        "timescale": None,
        "n_tracks": 0,
        "tracks": [],
    }
    moov = None
    for fourcc, s, e in _boxes(b, 0, len(b)):
        if fourcc == b"moov":
            moov = (s, e)
            break
    if moov is None:
        raise ValueError("no moov box (metadata-less or streaming-only file)")
    for fourcc, s, e in _boxes(b, *moov):
        if fourcc == b"mvhd":
            version = b[s]
            if version == 1:
                timescale, duration = struct.unpack(">IQ", b[s + 20:s + 32])
            else:
                timescale, duration = struct.unpack(">II", b[s + 12:s + 20])
            if timescale == 0:
                raise ValueError("mvhd timescale is zero")
            out["timescale"] = timescale
            out["duration_ms"] = round(duration * 1000.0 / timescale, 3)
        elif fourcc == b"trak":
            track = {"handler": None, "codec": None}
            for f2, s2, e2 in _boxes(b, s, e):
                if f2 != b"mdia":
                    continue
                for f3, s3, e3 in _boxes(b, s2, e2):
                    if f3 == b"hdlr":
                        track["handler"] = b[s3 + 8:s3 + 12].decode("latin-1")
                    elif f3 == b"minf":
                        for f4, s4, e4 in _boxes(b, s3, e3):
                            if f4 != b"stbl":
                                continue
                            for f5, s5, e5 in _boxes(b, s4, e4):
                                if f5 == b"stsd":
                                    # fullbox header (4) + entry_count (4),
                                    # then the first sample entry's fourcc
                                    track["codec"] = b[s5 + 12:s5 + 16].decode(
                                        "latin-1"
                                    )
            out["tracks"].append(track)
    out["n_tracks"] = len(out["tracks"])
    return out


def _box(fourcc: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + fourcc + body


def build_mp4_stub(
    duration_ms: float = 1000.0,
    timescale: int = 1000,
    tracks: list[tuple[str, str]] = (("vide", "avc1"),),
) -> bytes:
    """Structurally valid metadata-only MP4 for fixtures/tests:
    ftyp + moov(mvhd + one trak/mdia/hdlr+minf/stbl/stsd per track).
    No sample data — probe-able, not decodable (by design)."""
    ftyp = _box(b"ftyp", b"mp42" + struct.pack(">I", 0) + b"mp42isom")
    mvhd = _box(
        b"mvhd",
        struct.pack(">B3x", 0)  # version 0 fullbox
        + struct.pack(">II", 0, 0)  # creation/modification
        + struct.pack(">II", timescale, int(duration_ms * timescale / 1000.0))
        + b"\x00" * 80,  # rate/volume/matrix/next_track (unused by probe)
    )
    traks = b""
    for handler, codec in tracks:
        stsd = _box(
            b"stsd",
            struct.pack(">B3xI", 0, 1)
            + _box(codec.encode("latin-1"), b"\x00" * 8),
        )
        stbl = _box(b"stbl", stsd)
        minf = _box(b"minf", stbl)
        hdlr = _box(
            b"hdlr",
            struct.pack(">B3xI", 0, 0) + handler.encode("latin-1") + b"\x00" * 13,
        )
        mdia = _box(b"mdia", hdlr + minf)
        traks += _box(b"trak", mdia)
    return ftyp + _box(b"moov", mvhd + traks)
