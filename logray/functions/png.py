"""Pure-stdlib PNG codec (zlib + numpy): the real-decode fallback for
:class:`logray.functions.multimodal.DecodeImageBatch` in containers
without Pillow — the image analogue of the stdlib-``wave`` WAV path.

Supported: 8-bit depth, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
6 (RGBA), no interlace — i.e. everything this engine's own encoder and
the overwhelming majority of thumbnails emit.  Decode handles all five
scanline filters (None/Sub/Up/Average/Paeth); filters None/Up/Sub are
fully vectorized (Sub via a wrap-around uint8 cumulative sum), the
sequential Average/Paeth filters fall back to a per-pixel loop on the
rows that use them.

Format reference: the public PNG specification (RFC 2083 / ISO 15948).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def encode_png(arr: np.ndarray) -> bytes:
    """(H, W) or (H, W, C in {1,2,3,4}) uint8 -> PNG bytes (filter 0)."""
    a = np.asarray(arr, np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    # filter byte 0 per scanline
    raw = np.concatenate([np.zeros((h, 1), np.uint8),
                          a.reshape(h, w * c)], axis=1).tobytes()
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw, 6))
            + _chunk(b"IEND", b""))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc_:
        return a
    return b if pb <= pc_ else c


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (H, W, C) uint8 array."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    idat = []
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8:
        raise NotImplementedError(f"PNG bit depth {depth} (only 8 supported)")
    if color not in _CHANNELS:
        raise NotImplementedError(f"PNG color type {color}")
    if interlace:
        raise NotImplementedError("interlaced PNG")
    c = _CHANNELS[color]
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    stride = w * c
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    raw = raw.reshape(h, stride + 1)
    filters = raw[:, 0]
    rows = raw[:, 1:]
    out = np.zeros((h, stride), np.uint8)
    prior = np.zeros(stride, np.uint8)
    bpp = c  # bytes per pixel at depth 8
    for y in range(h):
        f = int(filters[y])
        line = rows[y]
        if f == 0:  # None
            rec = line.copy()
        elif f == 2:  # Up
            rec = line + prior  # uint8 wraps mod 256
        elif f == 1:  # Sub — wrap-around cumulative sum per byte lane
            rec = line.copy().reshape(-1, bpp)
            np.add.accumulate(rec, axis=0, dtype=np.uint8, out=rec)
            rec = rec.reshape(-1)
        else:  # Average (3) / Paeth (4): sequential per pixel
            rec = np.zeros(stride, np.uint8)
            for x in range(stride):
                left = int(rec[x - bpp]) if x >= bpp else 0
                up = int(prior[x])
                ul = int(prior[x - bpp]) if x >= bpp else 0
                v = int(line[x])
                if f == 3:
                    rec[x] = (v + ((left + up) >> 1)) & 0xFF
                elif f == 4:
                    rec[x] = (v + _paeth(left, up, ul)) & 0xFF
                else:
                    raise ValueError(f"bad PNG filter {f}")
        out[y] = rec
        prior = rec
    return out.reshape(h, w, c)


def thumbnail(arr: np.ndarray, max_px: int) -> np.ndarray:
    """Nearest-neighbor downscale keeping aspect ratio (numpy gather)."""
    h, w = arr.shape[:2]
    scale = min(max_px / max(h, 1), max_px / max(w, 1), 1.0)
    nh, nw = max(int(h * scale), 1), max(int(w * scale), 1)
    yi = np.minimum((np.arange(nh) / scale).astype(np.int64), h - 1)
    xi = np.minimum((np.arange(nw) / scale).astype(np.int64), w - 1)
    return arr[yi][:, xi]
