"""Minimal pure-python MJPEG-in-AVI container codec (public RIFF/AVI
layout, msdn AVIMAINHEADER/AVISTREAMHEADER structs).

Motion-JPEG stores every frame as an independent JPEG, so together with
``jpeg_mini`` this gives the engine a REAL video decode path — frame
sampling over distributed binary columns extracts actual pixels instead
of byte-window digests.  Other codecs (H.26x, VP9, AV1) need entropy/
motion machinery far beyond scope and fall back to the digest-based
``sample_frames`` plumbing in ``operators/multimodal.py``.

Writer exists so the test suite can roundtrip real video bytes with no
external media library; reader and writer share only the public struct
layouts (the reader walks chunks generically and tolerates LIST/JUNK
padding and missing idx1)."""

from __future__ import annotations

import struct
from typing import List, Optional, Tuple

import numpy as np

from .jpeg_mini import encode_jpeg


def _chunk(fourcc: bytes, data: bytes) -> bytes:
    pad = b"\x00" if len(data) & 1 else b""  # RIFF chunks are word-aligned
    return fourcc + struct.pack("<I", len(data)) + data + pad


def _list(listtype: bytes, data: bytes) -> bytes:
    return _chunk(b"LIST", listtype + data)


def encode_avi_mjpeg(
    frames: List[np.ndarray], fps: int = 10, quality: int = 85
) -> bytes:
    """uint8 (h, w, 3) frames -> MJPEG AVI bytes (one JPEG per '00dc'
    chunk, hdrl with avih + one 'vids'/'MJPG' stream, idx1 index)."""
    if not frames:
        raise ValueError("at least one frame required")
    h, w = frames[0].shape[:2]
    jpegs = [encode_jpeg(f, quality=quality) for f in frames]
    maxbuf = max(len(j) for j in jpegs)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,  # dwMicroSecPerFrame
        maxbuf * fps,      # dwMaxBytesPerSec
        0,                 # dwPaddingGranularity
        0x10,              # dwFlags: AVIF_HASINDEX
        len(frames),       # dwTotalFrames
        0, 1,              # dwInitialFrames, dwStreams
        maxbuf,            # dwSuggestedBufferSize
        w, h,
        0, 0, 0, 0,        # dwReserved
    )
    strh = (
        b"vidsMJPG"
        + struct.pack(
            "<IHHIIIIIIII",
            0,                 # dwFlags
            0, 0,              # wPriority, wLanguage
            0,                 # dwInitialFrames
            1, fps,            # dwScale, dwRate -> fps = rate/scale
            0, len(frames),    # dwStart, dwLength (frames)
            maxbuf,            # dwSuggestedBufferSize
            0xFFFFFFFF,        # dwQuality
            0,                 # dwSampleSize
        )
        + struct.pack("<HHHH", 0, 0, w, h)  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_items = b"".join(_chunk(b"00dc", j) for j in jpegs)
    movi = _list(b"movi", movi_items)
    # idx1: one entry per frame (fourcc, flags, offset-from-movi+4, size)
    idx = bytearray()
    off = 4  # offsets count from the 'movi' fourcc
    for j in jpegs:
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(j))
        off += 8 + len(j) + (len(j) & 1)
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def probe_avi(payload: bytes) -> Optional[Tuple[int, int, int, float]]:
    """(height, width, n_frames, fps) from the headers, no frame decode."""
    hdr = _walk_avi(payload, want_frames=False)
    return None if hdr is None else hdr[0]


def decode_avi_frames(payload: bytes) -> Optional[Tuple[float, List[bytes]]]:
    """MJPEG AVI bytes -> (fps, [jpeg bytes per frame]), or None when the
    container/codec is not MJPEG AVI.  Frames stay encoded — callers
    decode only the frames they sample."""
    hdr = _walk_avi(payload, want_frames=True)
    if hdr is None:
        return None
    (_h, _w, _n, fps), frames = hdr
    return fps, frames


def _walk_avi(payload: bytes, want_frames: bool):
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        return None
    fps = 0.0
    dims = None
    n_frames = 0
    frames: List[bytes] = []
    mjpg = False

    def walk(pos: int, end: int) -> None:
        # Iterative (explicit stack): a crafted file of deeply nested LIST
        # chunks must not hit the interpreter recursion limit.  On LIST we
        # push the continuation, then descend — preserving the recursive
        # traversal order (frame order matters).
        nonlocal fps, dims, n_frames, mjpg
        stack = [(pos, end)]
        while stack:
            pos, end = stack.pop()
            while pos + 8 <= end:
                fourcc = payload[pos : pos + 4]
                (size,) = struct.unpack_from("<I", payload, pos + 4)
                body_at = pos + 8
                if fourcc == b"LIST":
                    stack.append((body_at + size + (size & 1), end))
                    pos, end = body_at + 4, body_at + size
                    continue
                elif fourcc == b"avih" and size >= 40:
                    us, _mb, _pg, _fl, total = struct.unpack_from(
                        "<IIIII", payload, body_at
                    )
                    n_frames = total
                    w, h = struct.unpack_from("<II", payload, body_at + 32)
                    dims = dims or (h, w)
                    if us:
                        fps = fps or 1_000_000 / us
                elif fourcc == b"strh" and size >= 48:
                    if payload[body_at : body_at + 4] == b"vids":
                        mjpg = payload[body_at + 4 : body_at + 8] in (
                            b"MJPG", b"mjpg", b"\x00\x00\x00\x00",
                        )
                        scale, rate = struct.unpack_from(
                            "<II", payload, body_at + 20
                        )
                        if scale and rate:
                            fps = rate / scale
                elif want_frames and fourcc[2:4] in (b"dc", b"db"):
                    frames.append(bytes(payload[body_at : body_at + size]))
                pos = body_at + size + (size & 1)

    try:
        walk(12, 8 + struct.unpack_from("<I", payload, 4)[0])
    except Exception:
        # struct.error on truncation, but broadened: no malformed AVI may
        # raise out of probe_avi/decode_avi_frames into a Spark task.
        return None
    if dims is None or not mjpg:
        return None
    info = (dims[0], dims[1], n_frames or len(frames), fps)
    return (info, frames)
