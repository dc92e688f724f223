"""Minimal pure-python GIF codec (public GIF87a/89a spec).

Decoder: global/local color tables, LZW image data (12-bit dictionary,
clear/end codes), interlacing, multi-frame animations with left/top
offsets, transparency (transparent pixels keep the previous canvas,
disposal-to-background clears to the background color).  Completes the
classic web-image trio (JPEG/PNG/GIF) for ``decode_pixels``.

Encoder (test twin): ≤256-color images as GIF89a with a literal LZW
stream — each pixel emitted as its own code while mirroring the
decoder's dictionary growth (the standard 'uncompressed GIF' technique),
optional animation blocks.  Decoder and encoder share only the public
wire layout."""

from __future__ import annotations

import struct
from typing import List, Optional, Tuple

import numpy as np


# --- LZW -----------------------------------------------------------------


def _lzw_decode(data: bytes, min_code: int, npix: int) -> List[int]:
    if not 1 <= min_code <= 11:  # spec: codes are at most 12 bits —
        return []  # a corrupt size would build a 2^min_code table
    clear = 1 << min_code
    end = clear + 1
    out: List[int] = []
    bitpos = 0
    nbits = len(data) * 8
    size = min_code + 1
    table: List[Tuple[int, ...]] = [(i,) for i in range(clear)] + [(), ()]
    prev: Optional[Tuple[int, ...]] = None
    while len(out) < npix and bitpos + size <= nbits:
        byteoff = bitpos >> 3
        v = int.from_bytes(data[byteoff : byteoff + 4], "little") >> (
            bitpos & 7
        )
        code = v & ((1 << size) - 1)
        bitpos += size
        if code == clear:
            size = min_code + 1
            table = [(i,) for i in range(clear)] + [(), ()]
            prev = None
            continue
        if code == end:
            break
        if code < len(table) and (code <= end or table[code]):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + (prev[0],)
        else:
            break  # corrupt stream: emit what we have
        out.extend(entry)
        if prev is not None and len(table) < 4096:
            table.append(prev + (entry[0],))
            if len(table) == (1 << size) and size < 12:
                size += 1
        prev = entry
    return out


class _LzwWriter:
    """Literal-code LZW stream: every pixel is its own code, but the
    dictionary growth (and therefore the code-size schedule) mirrors what
    a decoder reconstructs — valid, merely uncompressed."""

    def __init__(self, min_code: int):
        self.min_code = min_code
        self.clear = 1 << min_code
        self.end = self.clear + 1
        self.buf = bytearray()
        self.acc = 0
        self.nacc = 0
        self.size = min_code + 1
        self.next_code = self.end + 1
        self.started = False

    def _emit(self, code: int) -> None:
        self.acc |= code << self.nacc  # LSB-first packing
        self.nacc += self.size
        while self.nacc >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nacc -= 8

    def pixels(self, pix: List[int]) -> None:
        if not self.started:
            self._emit(self.clear)
            self.started = True
        first = True
        for p in pix:
            self._emit(p)
            if first:  # decoder adds no entry on the code after clear
                first = False
                continue
            # next_code mirrors the DECODER's table length: it appends an
            # entry for every code after the first since clear, and bumps
            # its read size when the table length reaches 2^size — emit
            # the following code at that same size
            self.next_code += 1
            if self.next_code == (1 << self.size) and self.size < 12:
                self.size += 1
            if self.next_code >= 4095:
                self._emit(self.clear)
                self.size = self.min_code + 1
                self.next_code = self.end + 1
                first = True

    def finish(self) -> bytes:
        self._emit(self.end)
        if self.nacc:
            self.buf.append(self.acc & 0xFF)
        return bytes(self.buf)


# --- decoder -------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    out = np.empty_like(rows)
    src = 0
    for start, step in _INTERLACE_PASSES:
        for y in range(start, h, step):
            out[y] = rows[src]
            src += 1
    return out


def decode_gif_frames(
    payload: bytes,
) -> Optional[Tuple[List[np.ndarray], List[float]]]:
    """GIF bytes → (frames as uint8 (h, w, 3) on the composited canvas,
    per-frame delays in seconds), or None if not a GIF."""
    try:
        return _decode_gif_inner(payload)
    except Exception:
        return None


#: refuse canvases beyond 64M pixels — bounds allocations against
#: corrupt/hostile headers (any sane web asset is far below; 8K video
#: frames are 33M)
_MAX_PIXELS = 1 << 26

#: cap TOTAL retained pixels across the frames list (frames × w × h) —
#: per-frame caps alone let a crafted ~32KB GIF of thousands of minimal
#: frame descriptors demand hundreds of GB via canvas.copy() per frame
_MAX_TOTAL_PIXELS = 1 << 28


def _decode_gif_inner(payload: bytes):
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    w, h, packed, bg_idx, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    # absolute cap plus payload-proportional (LZW's run-length growth
    # tops out near 2048 pixels/byte for pathological-but-legal solids)
    if w * h > _MAX_PIXELS or w * h > 2048 * len(payload):
        return None
    pos = 13
    global_pal = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        global_pal = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(
            n, 3
        )
        pos += n * 3
    bg_rgb = (
        global_pal[bg_idx]
        if global_pal is not None and bg_idx < len(global_pal)
        else np.zeros(3, np.uint8)
    )
    canvas = np.broadcast_to(bg_rgb, (h, w, 3)).copy()
    frames: List[np.ndarray] = []
    delays: List[float] = []
    transparent = None
    disposal = 0
    delay = 0.0

    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = payload[pos]
            pos += 1
            subs = []
            while pos < len(payload) and payload[pos]:
                ln = payload[pos]
                subs.append(payload[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            pos += 1  # terminator
            if label == 0xF9 and subs:  # graphic control
                gc = subs[0]
                disposal = (gc[0] >> 2) & 7
                delay = struct.unpack_from("<H", gc, 1)[0] / 100.0
                transparent = gc[3] if gc[0] & 1 else None
        elif block == 0x2C:  # image descriptor
            left, top, iw, ih, ipacked = struct.unpack_from(
                "<HHHHB", payload, pos
            )
            pos += 9
            if iw * ih > _MAX_PIXELS or iw * ih > 2048 * len(payload):
                return None
            pal = global_pal
            if ipacked & 0x80:
                n = 2 << (ipacked & 7)
                pal = np.frombuffer(
                    payload, np.uint8, n * 3, pos
                ).reshape(n, 3)
                pos += n * 3
            if pal is None:
                return None
            min_code = payload[pos]
            pos += 1
            data = bytearray()
            while pos < len(payload) and payload[pos]:
                ln = payload[pos]
                data += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = _lzw_decode(bytes(data), min_code, iw * ih)
            # pad short (corrupt/truncated) streams in numpy, never with
            # a python list — [0] * (iw*ih) is a pointer-array bomb when
            # the descriptor claims a huge frame
            grid = np.zeros(iw * ih, np.int32)
            n_have = min(len(idx), iw * ih)
            grid[:n_have] = idx[:n_have]
            grid = grid.reshape(ih, iw)
            if ipacked & 0x40:
                grid = _deinterlace(grid)
            rgb = pal[np.clip(grid, 0, len(pal) - 1)]
            region = canvas[top : top + ih, left : left + iw]
            if transparent is not None:
                mask = (grid != transparent)[: region.shape[0], : region.shape[1]]
                region[mask] = rgb[: region.shape[0], : region.shape[1]][mask]
            else:
                region[:] = rgb[: region.shape[0], : region.shape[1]]
            if (len(frames) + 1) * h * w > _MAX_TOTAL_PIXELS:
                # retained-memory cap hit: stop decoding further frames
                # but keep what we have (prefix of the animation)
                return frames, delays
            frames.append(canvas.copy())
            delays.append(delay)
            if disposal == 2:  # restore background in the frame rect
                canvas[top : top + ih, left : left + iw] = bg_rgb
            transparent = None
        else:
            return None if not frames else (frames, delays)
    if not frames:
        return None
    return frames, delays


def decode_gif(payload: bytes) -> Optional[np.ndarray]:
    """First composited frame as uint8 (h, w, 3) — the decode_pixels
    entry point for GIF payloads."""
    dec = decode_gif_frames(payload)
    return None if dec is None else dec[0][0]


# --- encoder -------------------------------------------------------------


def _palettize(arr: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    flat = arr.reshape(-1, 3)
    pal, inv = np.unique(flat, axis=0, return_inverse=True)
    if len(pal) > 256:
        raise ValueError(f"{len(pal)} colors; GIF needs <= 256")
    return pal, inv.reshape(arr.shape[:2])


def encode_gif(
    frames, fps: float = 10.0
) -> bytes:
    """uint8 (h, w, 3) frame or list of frames (≤256 distinct colors
    across all frames) → GIF89a bytes."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    h, w = frames[0].shape[:2]
    pal, _ = _palettize(np.concatenate([f.reshape(-1, 1, 3) for f in frames]))
    npal = max(2, int(pal.shape[0]))
    depth = max(1, (npal - 1).bit_length())
    table = np.zeros((1 << depth, 3), np.uint8)
    table[: len(pal)] = pal
    lut = {tuple(c): i for i, c in enumerate(pal)}

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((depth - 1) & 7), 0, 0)
    out += table.tobytes()
    if len(frames) > 1:  # NETSCAPE loop extension
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    delay_cs = max(1, round(100.0 / fps)) if len(frames) > 1 else 0
    min_code = max(2, depth)
    for f in frames:
        if len(frames) > 1:
            out += b"\x21\xf9\x04" + struct.pack(
                "<BHB", 0, delay_cs, 0
            ) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out += bytes([min_code])
        idx = [lut[tuple(px)] for px in f.reshape(-1, 3)]
        lz = _LzwWriter(min_code)
        lz.pixels(idx)
        stream = lz.finish()
        for i in range(0, len(stream), 255):
            chunk = stream[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
