"""Dependency-free AVI (RIFF) container demuxer — numpy/struct only.

Completes the multimodal decode story: images decode for real
(sources/tiff.py + PPM), audio decodes for real (sources/wav.py),
and with this module video *demuxes* for real — the container walk,
stream headers, frame boundaries, and per-frame byte extraction are
all genuine; only the inner codec decode (typically JPEG for MJPEG
AVIs) remains gated on PIL, exactly like the JPEG image path.

Scope: AVI 1.0 RIFF files — ``hdrl`` (avih/strh headers for fps and
stream types) and the ``movi`` LIST's ``NNdc``/``NNdb`` (video) and
``NNwb`` (audio) chunks. OpenDML extensions (AVIX) and index-based
seeking are out of scope; the sequential chunk walk reads every
frame anyway.

``encode_avi_mjpeg`` writes a minimal spec-conforming MJPEG AVI from
a list of frame blobs — used by the roundtrip tests and handy for
packing frame corpora back into a single object.
"""

from __future__ import annotations

import struct

_FOURCC_VIDEO = (b"dc", b"db")
_FOURCC_AUDIO = (b"wb",)


class AviFormatError(ValueError):
    pass


def is_avi(blob: bytes) -> bool:
    return (
        len(blob) >= 12 and blob[:4] == b"RIFF" and blob[8:12] == b"AVI "
    )


def demux_avi(blob: bytes) -> dict:
    """Parse an AVI blob -> {"fps": float, "n_streams": int,
    "frames": [(stream_id, kind, offset, size)...]} where kind is
    'video' | 'audio' and (offset, size) address the raw frame bytes
    inside ``blob`` (zero-copy: slice to extract)."""
    if not is_avi(blob):
        raise AviFormatError("not a RIFF/AVI stream")
    fps = 0.0
    n_streams = 0
    frames: list[tuple[int, str, int, int]] = []

    def walk(start: int, end: int, in_movi: bool) -> None:
        nonlocal fps, n_streams
        pos = start
        while pos + 8 <= end:
            cid = blob[pos : pos + 4]
            (size,) = struct.unpack_from("<I", blob, pos + 4)
            body = pos + 8
            if cid in (b"LIST", b"RIFF"):
                ltype = blob[body : body + 4]
                walk(body + 4, body + size, in_movi or ltype == b"movi")
            elif cid == b"avih" and size >= 4:
                (us_per_frame,) = struct.unpack_from("<I", blob, body)
                if us_per_frame:
                    fps = 1_000_000.0 / us_per_frame
            elif cid == b"strh":
                n_streams += 1
            elif in_movi and len(cid) == 4 and cid[:2].isdigit():
                sid = int(cid[:2])
                tag = cid[2:]
                if tag in _FOURCC_VIDEO:
                    frames.append((sid, "video", body, size))
                elif tag in _FOURCC_AUDIO:
                    frames.append((sid, "audio", body, size))
            pos = body + size + (size & 1)

    walk(12, len(blob), False)
    return {"fps": fps, "n_streams": n_streams, "frames": frames}


def extract_frames(
    blob: bytes, kind: str = "video"
) -> list[tuple[int, float, bytes]]:
    """[(frame_index, timestamp_ms, frame_bytes)...] for one stream
    kind — the real demux path sample_frames builds on. Timestamps
    derive from the container fps (frame_index / fps)."""
    meta = demux_avi(blob)
    fps = meta["fps"] or 25.0
    out = []
    i = 0
    for _sid, k, off, size in meta["frames"]:
        if k != kind:
            continue
        out.append((i, i * 1000.0 / fps, blob[off : off + size]))
        i += 1
    return out


def encode_avi_mjpeg(
    frames: list[bytes], fps: float = 25.0, width: int = 0, height: int = 0
) -> bytes:
    """Minimal MJPEG AVI writer: hdrl (avih + one strl) + movi with
    one '00dc' chunk per frame."""
    us_per_frame = int(round(1_000_000 / fps))

    def chunk(cid: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) & 1 else b""
        return cid + struct.pack("<I", len(payload)) + payload + pad

    def lst(ltype: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", ltype + payload)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        us_per_frame, 0, 0, 0x10, len(frames), 0, 1, 0,
        width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1,
                                        int(round(fps)), 0, len(frames),
                                        0, 0, 0, 0)
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0x47504A4D,
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
