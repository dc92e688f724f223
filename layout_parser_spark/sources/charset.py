"""Charset sniffing for crawl payloads (the WHATWG encoding-sniff
subset browsers and Common-Crawl text extractors apply): real crawls are
~5-10% non-UTF-8 (windows-1252, shift_jis, gb2312, iso-8859-*), and a
hard utf-8 decode mojibakes exactly the pages where extraction quality
matters least-forgivingly.

Order (first hit wins):

1. byte-order mark — UTF-8 / UTF-16 LE / UTF-16 BE;
2. ``<meta charset=…>`` / ``<meta http-equiv="Content-Type"
   content="…charset=…">`` inside the first 1024 bytes (the WHATWG
   prescan window), matched ASCII-wise on the raw bytes;
3. strict UTF-8 attempt;
4. windows-1252 (the WHATWG fallback; a latin-1 superset that never
   raises).

Pure function of the payload bytes → deterministic across executors.
"""

from __future__ import annotations

import codecs
import re

#: WHATWG prescan window
_PRESCAN = 1024

_META_CHARSET = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([a-zA-Z0-9_\-]+)""", re.I
)

#: label → python codec for the common crawl encodings; unknown labels
#: fall through to the utf-8/cp1252 ladder (never raise on a bad label)
_LABEL_ALIASES = {
    "utf8": "utf-8",
    "iso-8859-1": "cp1252",  # WHATWG: latin-1 label MEANS windows-1252
    "latin-1": "cp1252",
    "latin1": "cp1252",
    "us-ascii": "cp1252",
    "shift-jis": "shift_jis",
    "sjis": "shift_jis",
    "x-sjis": "shift_jis",
    "gb-2312": "gb2312",
}


def sniff_charset(payload: bytes) -> str:
    """Best-effort charset label for an HTML payload (see module doc)."""
    if payload[:3] == b"\xef\xbb\xbf":
        return "utf-8-sig"
    if payload[:2] == b"\xff\xfe":
        return "utf-16-le"
    if payload[:2] == b"\xfe\xff":
        return "utf-16-be"
    m = _META_CHARSET.search(payload[:_PRESCAN])
    if m:
        label = m.group(1).decode("ascii", "replace").lower()
        label = _LABEL_ALIASES.get(label, label)
        try:
            codecs.lookup(label)
            return label
        except LookupError:
            pass
    try:
        payload.decode("utf-8")
        return "utf-8"
    except UnicodeDecodeError:
        return "cp1252"


def decode_payload(payload) -> str:
    """bytes → text via the sniffed charset; a payload that defeats even
    its declared charset falls back to replacement — decoding NEVER
    raises (crawl-bytes contract).  str payloads pass through."""
    if isinstance(payload, str):
        return payload
    payload = bytes(payload)
    enc = sniff_charset(payload)
    try:
        return payload.decode(enc, errors="replace")
    except (LookupError, ValueError):
        return payload.decode("utf-8", errors="replace")
