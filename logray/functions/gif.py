"""Pure-stdlib GIF codec (decode: GIF87a/89a, full LZW, interlace,
local palettes, transparency, frame compositing/disposal; encode: a
real-LZW grayscale writer for deterministic test corpora) — the same
trick as :mod:`logray.functions.png`: make the REAL video frame-sampling
path runnable in a container with no media libraries.  PyAV remains the
production decoder for mp4/webm when present
(:class:`logray.functions.multimodal.SampleFramesBatch`); GIF is the
in-container-demonstrable format, so all three modalities exercise real
decodes at the gate.

Decode is a per-payload Python LZW loop — GIF payloads in a media column
are small (thumbnails, clips), and the stage runs inside an actor-pool
``map_batches`` where per-payload decode cost is the point of the
parallelism, exactly like PyAV would be.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_gif", "encode_gif"]

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


class _BitReader:
    """LSB-first bit reader over the concatenated LZW data bytes."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.buf = 0
        self.nbits = 0

    def read(self, width: int) -> int:
        while self.nbits < width:
            if self.pos >= len(self.data):
                return -1  # truncated stream: treated as end-of-data
            self.buf |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        v = self.buf & ((1 << width) - 1)
        self.buf >>= width
        self.nbits -= width
        return v


def _lzw_decode(mcs: int, data: bytes, npix: int) -> np.ndarray:
    """GIF-variant LZW: variable 3..12-bit codes, clear/end codes,
    deferred-clear handling (table frozen at 4096 until a clear)."""
    clear = 1 << mcs
    end = clear + 1
    out = np.zeros(npix, np.uint8)
    n_out = 0
    rd = _BitReader(data)

    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = mcs + 1
    prev: int | None = None
    while n_out < npix:
        code = rd.read(width)
        if code < 0 or code == end:
            break
        if code == clear:
            table = list(base)
            width = mcs + 1
            prev = None
            continue
        if prev is None:
            if code >= len(table):
                raise ValueError("GIF LZW: first code after clear not literal")
            entry = table[code]
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = table[prev] + table[prev][:1]
            else:
                raise ValueError("GIF LZW: code beyond table")
            if len(table) < 4096:
                table.append(table[prev] + entry[:1])
        take = min(len(entry), npix - n_out)
        out[n_out:n_out + take] = np.frombuffer(entry[:take], np.uint8)
        n_out += take
        prev = code
        if len(table) == (1 << width) and width < 12:
            width += 1
    return out


def _interlace_order(h: int) -> np.ndarray:
    """Permutation mapping output row y -> its position in the decoded
    (pass-ordered) row stream."""
    order = np.zeros(h, np.int64)
    r = 0
    for start, step in _INTERLACE_PASSES:
        for y in range(start, h, step):
            order[y] = r
            r += 1
    return order


def decode_gif(data: bytes) -> list[np.ndarray]:
    """GIF bytes -> list of (H, W, 3) uint8 frames (composited onto the
    logical screen with disposal methods 0-3 and transparency).

    A truncated or structurally malformed payload raises ValueError with
    a clear message (never a raw IndexError/struct.error): one corrupt
    media blob in a batch should surface as a codec error the caller can
    route, not kill the map task with an opaque traceback."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    try:
        return _decode_gif_body(data)
    except (IndexError, struct.error) as e:
        raise ValueError(f"GIF: truncated or malformed stream ({e})") from e


# a corrupt 13-byte header can claim a 65535x65535 screen (~12.9 GB
# canvas) — bound total pixels so malformed blobs surface as ValueError,
# not a worker OOM; 64M pixels covers any sane frame-sampling input
_MAX_PIXELS = 1 << 26


def _decode_gif_body(data: bytes) -> list[np.ndarray]:
    W, H, packed, bg, _ar = struct.unpack("<HHBBB", data[6:13])
    if W * H > _MAX_PIXELS:
        raise ValueError(
            f"GIF: logical screen {W}x{H} exceeds the {_MAX_PIXELS}-pixel "
            f"decode bound (corrupt header or oversized input)")
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = np.frombuffer(data[pos:pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n
    canvas = np.zeros((H, W, 3), np.uint8)
    if gct is not None and bg < len(gct):
        canvas[:] = gct[bg]
    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0
    while pos < len(data):
        b = data[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = data[pos]
            pos += 1
            blocks = []
            while data[pos]:
                ln = data[pos]
                blocks.append(data[pos + 1:pos + 1 + ln])
                pos += 1 + ln
            pos += 1  # block terminator
            if label == 0xF9 and blocks:  # graphic control
                gp = blocks[0]
                disposal = (gp[0] >> 2) & 7
                transparent = gp[3] if gp[0] & 1 else None
            continue
        if b != 0x2C:
            raise ValueError(f"GIF: unexpected block 0x{b:02x}")
        left, top, w, h, ip = struct.unpack("<HHHHB", data[pos:pos + 9])
        if w * h > _MAX_PIXELS:
            raise ValueError(
                f"GIF: frame rect {w}x{h} exceeds the {_MAX_PIXELS}-pixel "
                f"decode bound (corrupt descriptor)")
        pos += 9
        pal = gct
        if ip & 0x80:
            n = 2 << (ip & 7)
            pal = np.frombuffer(data[pos:pos + 3 * n], np.uint8).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF: image with no color table")
        mcs = data[pos]
        pos += 1
        chunks = []
        while data[pos]:
            ln = data[pos]
            chunks.append(data[pos + 1:pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode(mcs, b"".join(chunks), w * h)
        grid = idx.reshape(h, w)
        if ip & 0x40:  # interlaced: reorder decoded rows into place
            grid = grid[_interlace_order(h)]
        # clip a frame rect extending past the logical screen (malformed
        # but decodable): the canvas view would otherwise be smaller than
        # the grid and every masked assignment shape-errors
        h_vis = max(0, min(h, H - top))
        w_vis = max(0, min(w, W - left))
        if (h_vis, w_vis) != (h, w):
            grid = grid[:h_vis, :w_vis]
            h, w = h_vis, w_vis
        region = canvas[top:top + h, left:left + w]
        prev_region = region.copy()
        rgb = pal[np.minimum(grid, len(pal) - 1)]
        if transparent is not None:
            m = grid != transparent
            region[m] = rgb[m]
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        if disposal == 2:  # restore to background
            region[:] = gct[bg] if gct is not None and bg < len(gct) else 0
        elif disposal == 3:  # restore to previous
            region[:] = prev_region
        transparent = None
        disposal = 0
    return frames


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def write(self, code: int, width: int):
        self.buf |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.buf & 0xFF)
            self.buf >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.buf & 0xFF)
            self.buf = 0
            self.nbits = 0
        return bytes(self.out)


def _lzw_encode(pixels: bytes, mcs: int = 8) -> bytes:
    """Real GIF LZW (the width-growth schedule mirrors the decoder, so a
    round-trip exercises every decode path, not just literals)."""
    clear = 1 << mcs
    end = clear + 1
    wr = _BitWriter()

    def reset():
        return {bytes([i]): i for i in range(clear)}, end + 1, mcs + 1

    table, nxt, width = reset()
    wr.write(clear, width)
    buf = b""
    for ch in pixels:
        cand = buf + bytes([ch])
        if cand in table:
            buf = cand
            continue
        wr.write(table[buf], width)
        if nxt < 4096:
            table[cand] = nxt
            nxt += 1
            # the decoder appends its matching entry one code LATER than
            # the encoder assigns it, so it reaches 2^width (and bumps)
            # when the encoder's next free code is 2^width + 1
            if nxt == (1 << width) + 1 and width < 12:
                width += 1
        else:  # table full: clear, matching the decoder's frozen table
            wr.write(clear, width)
            table, nxt, width = reset()
        buf = bytes([ch])
    if buf:
        wr.write(table[buf], width)
    wr.write(end, width)
    return wr.flush()


def encode_gif(frames: list[np.ndarray], delay_cs: int = 4) -> bytes:
    """list of (H, W) uint8 GRAYSCALE frames -> animated GIF89a bytes
    (256-gray global palette, full-size frames, disposal 'keep').  The
    deterministic test-corpus generator — decode side handles arbitrary
    public GIFs."""
    if not frames:
        raise ValueError("frames must be non-empty")
    h, w = frames[0].shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 0x70 | 7, 0, 0)
    out += bytes(v for i in range(256) for v in (i, i, i))  # gray GCT
    for f in frames:
        a = np.asarray(f, np.uint8)
        if a.shape != (h, w):
            raise ValueError("all frames must share the first frame's shape")
        out += bytes((0x21, 0xF9, 4, 0x04, delay_cs & 0xFF, delay_cs >> 8,
                      0, 0))
        out += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out.append(8)  # LZW min code size
        data = _lzw_encode(a.tobytes(), 8)
        for i in range(0, len(data), 255):
            chunk = data[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)
