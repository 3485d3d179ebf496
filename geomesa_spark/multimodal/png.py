"""Pure-stdlib PNG codec: zlib inflate/deflate + scanline (un)filtering.

Closes the "real media decode" gap without Pillow: `decode_png` handles
every legal depth/color-type combination — grayscale at depths 1/2/4/8/16,
palette at 1/2/4/8, gray+alpha / RGB / RGBA at 8/16, Adam7-interlaced or
not — with all five scanline filter types (None/Sub/Up/Average/Paeth, PNG
spec §9), verifying chunk CRCs; `encode_png` writes spec-compliant 8-bit
files with a selectable filter per row (also usable as an image export
sink). 16-bit samples are returned as their most-significant byte (the
standard 16->8 reduction), keeping one uint8 pixel contract for the whole
media surface. The reference treats media as opaque binary through its
converters — this supplies the decode step its pipelines would delegate to
an imaging library.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_CTYPE_FOR_CHANNELS = {1: 0, 2: 4, 3: 2, 4: 6}

# Adam7 pass grid: (x offset, y offset, x step, y step) per pass — passes
# 4 and 6 start at ROW 0 (spec §8.2 pattern matrix), not at their x offset
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def decode_png(data: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a PNG byte string -> (width, height, pixels).

    pixels is uint8 with shape (h, w, channels); palette images are
    expanded to RGB. Chunk CRCs are verified (corrupt files raise)."""
    if not data.startswith(PNG_SIGNATURE):
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    plte = None
    idat: list[bytes] = []
    while pos + 12 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        typ = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if zlib.crc32(typ + chunk) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {typ!r} CRC mismatch")
        pos += 12 + length
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", chunk)
        elif typ == b"PLTE":
            plte = np.frombuffer(chunk, dtype=np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat.append(chunk)
        elif typ == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError("PNG: unknown compression/filter method")
    if ctype not in _CHANNELS:
        raise ValueError(f"PNG color type {ctype}")
    if depth not in (1, 2, 4, 8, 16):
        raise ValueError(f"PNG bit depth {depth}")
    if depth < 8 and ctype not in (0, 3):
        raise ValueError(f"sub-byte depth {depth} illegal for color type {ctype}")
    if depth == 16 and ctype == 3:
        raise ValueError("16-bit palette PNG is illegal")
    channels = _CHANNELS[ctype]
    raw = zlib.decompress(b"".join(idat))

    def decode_pass(pw: int, ph: int, p: int) -> tuple[np.ndarray | None, int]:
        """Unfilter + unpack one (sub-)image of pw x ph pixels starting at
        byte offset p in `raw`; returns ((ph, pw, channels) uint8, new p)."""
        if pw == 0 or ph == 0:
            return None, p
        bits_px = channels * depth
        stride = (pw * bits_px + 7) // 8
        bpp = max(1, (bits_px + 7) // 8)  # filter distance, spec §9
        out = np.zeros((ph, stride), dtype=np.uint8)
        prev = np.zeros(stride, dtype=np.int32)
        for row in range(ph):
            if p >= len(raw):
                raise ValueError("PNG: truncated image data")
            ft = raw[p]
            line = np.frombuffer(raw, np.uint8, stride, p + 1).astype(np.int32)
            p += stride + 1
            if ft == 0:  # None
                rec = line
            elif ft == 1:  # Sub: per-byte-lane cumulative sum mod 256
                rec = line.copy()
                for lane in range(bpp):
                    rec[lane::bpp] = np.cumsum(line[lane::bpp]) % 256
            elif ft == 2:  # Up
                rec = (line + prev) % 256
            elif ft == 3:  # Average (sequential left-dependence)
                rec = np.zeros(stride, dtype=np.int32)
                for i in range(stride):
                    left = rec[i - bpp] if i >= bpp else 0
                    rec[i] = (line[i] + (left + int(prev[i])) // 2) % 256
            elif ft == 4:  # Paeth
                rec = np.zeros(stride, dtype=np.int32)
                for i in range(stride):
                    a = rec[i - bpp] if i >= bpp else 0
                    b = int(prev[i])
                    c = int(prev[i - bpp]) if i >= bpp else 0
                    pa = abs(b - c)
                    pb = abs(a - c)
                    pc = abs(a + b - 2 * c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    rec[i] = (line[i] + pred) % 256
            else:
                raise ValueError(f"PNG filter type {ft}")
            prev = rec
            out[row] = rec.astype(np.uint8)
        # bytes -> samples
        if depth == 8:
            smp = out[:, : pw * channels]
        elif depth == 16:
            # most-significant byte: the standard 16->8 reduction
            smp = out[:, 0 : pw * channels * 2 : 2]
        else:
            bits = np.unpackbits(out, axis=1)
            weights = 1 << np.arange(depth - 1, -1, -1)
            smp = (
                (bits.reshape(ph, -1, depth) * weights[None, None, :])
                .sum(axis=2)[:, :pw]
                .astype(np.uint8)
            )
        return smp.reshape(ph, pw, channels), p

    if interlace == 1:  # Adam7: seven independently-filtered sub-images
        px = np.zeros((h, w, channels), dtype=np.uint8)
        p = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            sub, p = decode_pass(pw, ph, p)
            if sub is not None:
                px[y0::dy, x0::dx] = sub
    elif interlace == 0:
        px, p = decode_pass(w, h, 0)
    else:
        raise ValueError(f"PNG interlace method {interlace}")
    if p != len(raw):
        raise ValueError("PNG: decompressed size mismatch")
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE chunk")
        px = plte[px[:, :, 0]]
    elif ctype == 0 and depth < 8:
        px = (px.astype(np.int64) * (255 // ((1 << depth) - 1))).astype(np.uint8)
    return int(w), int(h), px


def _chunk(typ: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + typ
        + payload
        + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray, filter_type: int | list[int] = 0) -> bytes:
    """Encode (h, w[, channels]) uint8 pixels as a PNG byte string.

    channels 1/2/3/4 -> gray / gray+alpha / RGB / RGBA. `filter_type` is
    the scanline filter (0-4) applied to every row, or one per row — the
    test harness uses this to pin all five decode paths against goldens."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, channels = px.shape
    ctype = _CTYPE_FOR_CHANNELS[channels]
    bpp = channels
    stride = w * channels
    fts = [filter_type] * h if isinstance(filter_type, int) else list(filter_type)
    if len(fts) != h:
        raise ValueError("one filter per row required")
    flat = px.reshape(h, stride).astype(np.int32)
    lines = []
    prev = np.zeros(stride, dtype=np.int32)
    for row in range(h):
        cur = flat[row]
        left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]]) if stride > bpp else np.zeros(stride, np.int32)
        upleft = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]]) if stride > bpp else np.zeros(stride, np.int32)
        ft = fts[row]
        if ft == 0:
            enc = cur
        elif ft == 1:
            enc = (cur - left) % 256
        elif ft == 2:
            enc = (cur - prev) % 256
        elif ft == 3:
            enc = (cur - (left + prev) // 2) % 256
        elif ft == 4:
            pa = np.abs(prev - upleft)
            pb = np.abs(left - upleft)
            pc = np.abs(left + prev - 2 * upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            enc = (cur - pred) % 256
        else:
            raise ValueError(f"PNG filter type {ft}")
        lines.append(bytes([ft]) + enc.astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    idat = zlib.compress(b"".join(lines), 9)
    return PNG_SIGNATURE + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")
