"""Pure-stdlib image codec for the multimodal operators.

The container bundles no media libraries (PIL/ffmpeg), but "multimodal
columns" must be more than plumbing: this module implements, with only
``zlib``/``struct``/numpy,

- :func:`probe` — container-header width/height/format sniffing for
  PNG / JPEG / GIF / BMP / binary-PPM (no decompression, O(header) bytes);
- :func:`png_decode` / :func:`png_encode` — a real PNG codec for the
  non-interlaced 8-bit color types (gray, gray+alpha, RGB, RGBA), i.e.
  everything :func:`png_encode` itself can produce round-trips;
- :func:`resize_nearest` — deterministic nearest-neighbor resampling.

Together they give ``operators.multimodal`` an honest decode→transform→
encode path on PNG bytes, with :func:`probe` covering metadata for the other
common containers. Anything fancier (JPEG entropy decode, video) stays
behind the optional-library capability check.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# --- header probing -----------------------------------------------------------


def probe(data: bytes | None) -> tuple[str | None, int | None, int | None]:
    """Return (format, width, height) from container headers only.

    Recognizes png/jpeg/gif/bmp/ppm; anything else → (None, None, None).
    Never raises on truncated/garbage input.
    """
    if not data or len(data) < 10:
        return (None, None, None)
    try:
        if data[:8] == b"\x89PNG\r\n\x1a\n" and len(data) >= 24:
            w, h = struct.unpack(">II", data[16:24])
            return ("png", int(w), int(h))
        if data[:3] == b"\xff\xd8\xff":
            return _probe_jpeg(data)
        if data[:6] in (b"GIF87a", b"GIF89a"):
            w, h = struct.unpack("<HH", data[6:10])
            return ("gif", int(w), int(h))
        if data[:2] == b"BM" and len(data) >= 26:
            w, h = struct.unpack("<ii", data[18:26])
            return ("bmp", int(w), abs(int(h)))
        if data[:2] == b"P6":
            return _probe_ppm(data)
    except (struct.error, ValueError, IndexError):
        return (None, None, None)
    return (None, None, None)


def _probe_jpeg(data: bytes):
    """Walk JPEG marker segments to the first SOF frame header."""
    i = 2
    n = len(data)
    while i + 9 < n:
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
        # SOF0-SOF15 minus DHT(C4)/DNL(DC)/DAC(CC)
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h, w = struct.unpack(">HH", data[i + 5 : i + 9])
            return ("jpeg", int(w), int(h))
        i += 2 + seg_len
    return ("jpeg", None, None)


def _probe_ppm(data: bytes):
    """P6 binary PPM: 'P6 <w> <h> <maxval>' with comment lines allowed."""
    tokens: list[int] = []
    i = 2
    while len(tokens) < 2 and i < min(len(data), 256):
        c = data[i : i + 1]
        if c == b"#":  # comment to end of line
            while i < len(data) and data[i : i + 1] != b"\n":
                i += 1
        elif c.isdigit():
            j = i
            while j < len(data) and data[j : j + 1].isdigit():
                j += 1
            tokens.append(int(data[i:j]))
            i = j
        else:
            i += 1
    if len(tokens) == 2:
        return ("ppm", tokens[0], tokens[1])
    return ("ppm", None, None)


# --- PNG decode/encode (8-bit, non-interlaced) --------------------------------

_COLOR_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _iter_chunks(data: bytes):
    i = 8
    while i + 8 <= len(data):
        (length,) = struct.unpack(">I", data[i : i + 4])
        ctype = data[i + 4 : i + 8]
        yield ctype, data[i + 8 : i + 8 + length]
        i += 12 + length  # len + type + data + crc


def png_decode(data: bytes) -> np.ndarray:
    """Decode a non-interlaced 8-bit PNG to (h, w, channels) uint8.

    Supports color types 0 (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA) — the
    full set :func:`png_encode` emits. Palette/16-bit/interlaced raise
    ``ValueError`` (capability boundary, not silent corruption).
    """
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    w = h = None
    bit_depth = color_type = None
    idat = bytearray()
    for ctype, chunk in _iter_chunks(data):
        if ctype == b"IHDR":
            if len(chunk) != 13:
                # struct.error is NOT a ValueError — keep the documented
                # "corrupt media raises ValueError" boundary total
                raise ValueError(f"corrupt PNG: IHDR length {len(chunk)} != 13")
            w, h, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
            if bit_depth != 8 or color_type not in _COLOR_CHANNELS:
                raise ValueError(
                    f"unsupported PNG (bit_depth={bit_depth}, color_type={color_type})"
                )
            if interlace:
                raise ValueError("interlaced PNG unsupported")
        elif ctype == b"IDAT":
            idat.extend(chunk)
        elif ctype == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    ch = _COLOR_CHANNELS[color_type]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        # zlib.error is NOT a ValueError; a truncated IDAT must still hit
        # the documented capability boundary, not leak a foreign exception
        raise ValueError(f"corrupt PNG: IDAT inflate failed ({exc})") from exc
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG payload size mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for row in range(h):
        ftype = raw[pos]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1).copy()
        pos += stride + 1
        if ftype == 0:
            cur = line
        elif ftype == 2:  # Up
            cur = line + prev
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need left-to-right scan
            cur = _unfilter_scan(ftype, line, prev, ch)
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[row] = cur
        prev = cur
    return out.reshape(h, w, ch)


def _unfilter_scan(ftype: int, line: np.ndarray, prev: np.ndarray, ch: int) -> np.ndarray:
    """Sequential unfilter for the left-dependent filters (Sub/Average/Paeth).
    Vectorized over the channel lanes; loops over pixels in the row (PNG's
    data dependency is intrinsic — each pixel needs the decoded left pixel)."""
    cur = line.copy()
    n = len(line)
    if ftype == 1:  # Sub
        for i in range(ch, n):
            cur[i] = (int(cur[i]) + int(cur[i - ch])) & 0xFF
    elif ftype == 3:  # Average
        for i in range(n):
            left = int(cur[i - ch]) if i >= ch else 0
            cur[i] = (int(line[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
    else:  # Paeth
        for i in range(n):
            a = int(cur[i - ch]) if i >= ch else 0
            b = int(prev[i])
            c = int(prev[i - ch]) if i >= ch else 0
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            cur[i] = (int(line[i]) + pred) & 0xFF
    return cur


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
    )


def png_encode(arr: np.ndarray) -> bytes:
    """Encode (h, w) or (h, w, channels∈{1,2,3,4}) uint8 to PNG (filter 0,
    fixed zlib level 6 — deterministic bytes for a given array)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    body = arr.astype(np.uint8).reshape(h, w * ch)
    raw = b"".join(b"\x00" + body[r].tobytes() for r in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample of (h, w[, c]) to (height, width[, c]) —
    index map ``src = floor((dst + 0.5) * src_size / dst_size)`` (pixel-center
    convention, deterministic)."""
    src_h, src_w = arr.shape[0], arr.shape[1]
    rows = np.minimum(((np.arange(height) + 0.5) * src_h / height).astype(np.int64), src_h - 1)
    cols = np.minimum(((np.arange(width) + 0.5) * src_w / width).astype(np.int64), src_w - 1)
    return arr[rows][:, cols]
