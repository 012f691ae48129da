"""Pure-stdlib media codecs: PNG, BMP and WAV with zlib/struct/numpy
only — no PIL, no ffmpeg, no soundfile.

These turn four common ENCODED formats into real decode paths for
``operators/multimodal.py`` (which previously supported only the
``*/x-raw`` buffer mimes): PNG covers the lossless-image corpus case,
GIF the web-crawl animation/icon case, BMP the legacy-scan case, WAV
the PCM-audio case. JPEG/MP3/MP4 remain stubbed in multimodal.py —
DCT/entropy-coded formats genuinely need codec libraries this
container lacks.

Format support (decoders raise ``ValueError`` on anything else, which
multimodal's per-item corrupt-handling treats as a droppable item):

- PNG: 8-bit depth, non-interlaced; color types 0 (gray), 2 (RGB),
  3 (palette), 4 (gray+alpha), 6 (RGBA); all five scanline filters.
  Unfiltering is vectorized per scanline for None/Up; Sub/Average/
  Paeth carry an in-row byte dependency, so those rows run a Python
  loop — fine for the Arrow-batch kernels these feed (decode cost is
  per item, not per partition); transcode hot corpora to ``image/x-raw``
  for the bulk path.
- BMP: BITMAPINFOHEADER-or-larger, uncompressed (BI_RGB) 24/32 bpp,
  bottom-up or top-down; returns RGB(A).
- WAV: RIFF/WAVE, PCM (format 1), 16-bit, any channel count.
- GIF: 87a/89a, global/local color tables, interlace, first frame
  composited onto the logical screen; pure-Python LZW (12-bit dict,
  re-CLEAR). Transparency renders its palette color.

Encoders (`encode_png` filter-0, `encode_bmp` 24-bit, `encode_wav`,
`encode_gif` single-frame <=256-color)
exist so pipelines can re-emit bytes after a transform and tests can
build golden fixtures without any imaging library.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

#: PNG color type -> sample channels (before palette expansion)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG byte string to an (h, w, channels) uint8 array.
    Palette images are expanded to RGB."""
    data = bytes(data)
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    ihdr = None
    plte = None
    idat = []
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # + CRC
        if ctype == b"IHDR":
            ihdr = chunk
        elif ctype == b"PLTE":
            plte = chunk
        elif ctype == b"IDAT":
            idat.append(chunk)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG (depth={depth}, interlace={interlace})"
        )
    if color not in _PNG_CHANNELS:
        raise ValueError(f"unsupported PNG color type {color}")
    nch = _PNG_CHANNELS[color]
    stride = w * nch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("corrupt PNG scanline data")

    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    bpp = nch  # bytes per pixel at depth 8
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int64)
        if f == 0:  # None
            cur = line
        elif f == 2:  # Up — vectorized
            cur = (line + prev) & 0xFF
        elif f == 1:  # Sub — in-row dependency
            cur = line.copy()
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif f == 3:  # Average
            cur = line.copy()
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            cur = line.copy()
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = cur.astype(np.uint8)
        prev = cur

    img = out.reshape(h, w, nch)
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        img = pal[img[:, :, 0]]
    return np.ascontiguousarray(img)


def encode_png(img: np.ndarray) -> bytes:
    """Encode an (h, w[, channels]) uint8 array as a filter-0 PNG.
    1/2/3/4 channels map to gray / gray+alpha / RGB / RGBA."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode an uncompressed 24/32-bpp BMP to (h, w, 3|4) uint8 RGB(A)."""
    data = bytes(data)
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (offset,) = struct.unpack("<I", data[10:14])
    (hsize,) = struct.unpack("<I", data[14:18])
    if hsize < 40:
        raise ValueError("BITMAPCOREHEADER unsupported")
    w, h_signed = struct.unpack("<ii", data[18:26])
    (bpp,) = struct.unpack("<H", data[28:30])
    (compression,) = struct.unpack("<I", data[30:34])
    if compression != 0 or bpp not in (24, 32) or w <= 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, comp={compression})")
    top_down = h_signed < 0
    h = abs(h_signed)
    c = bpp // 8
    rowsize = (w * c + 3) & ~3
    if offset + rowsize * h > len(data):
        raise ValueError("truncated BMP pixel data")
    buf = np.frombuffer(
        data, dtype=np.uint8, count=rowsize * h, offset=offset
    ).reshape(h, rowsize)
    px = buf[:, : w * c].reshape(h, w, c)
    if not top_down:
        px = px[::-1]
    px = px[:, :, ::-1] if c == 3 else px[:, :, [2, 1, 0, 3]]
    return np.ascontiguousarray(px)


def encode_bmp(img: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a 24-bpp bottom-up BMP."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    h, w, c = img.shape
    if c != 3:
        raise ValueError("encode_bmp wants (h, w, 3) RGB")
    rowsize = (w * 3 + 3) & ~3
    pad = b"\x00" * (rowsize - w * 3)
    bgr = img[:, :, ::-1]
    body = b"".join(bgr[y].tobytes() + pad for y in range(h - 1, -1, -1))
    pixel_offset = 14 + 40
    header = (
        b"BM"
        + struct.pack("<IHHI", pixel_offset + len(body), 0, 0, pixel_offset)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    )
    return header + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM-16 RIFF/WAVE byte string; returns
    ``(samples int16 array of shape (n, channels), sample_rate)``."""
    data = bytes(data)
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    fmt = None
    pcm = None
    pos = 12
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (sz,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + sz]
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            pcm = body
    if fmt is None or pcm is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, nch, sr, _, _, bits = struct.unpack("<HHIIHH", fmt[:16])
    if audio_fmt != 1 or bits != 16 or nch < 1:
        raise ValueError(f"unsupported WAV (fmt={audio_fmt}, bits={bits})")
    usable = (len(pcm) // (2 * nch)) * 2 * nch
    x = np.frombuffer(pcm[:usable], dtype="<i2").reshape(-1, nch)
    return x, int(sr)


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode int16 samples of shape (n,) or (n, channels) as PCM WAV."""
    x = np.asarray(samples, dtype="<i2")
    if x.ndim == 1:
        x = x[:, None]
    n, nch = x.shape
    body = x.tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, nch, sample_rate, sample_rate * nch * 2, nch * 2, 16
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(body))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(body))
        + body
    )


def try_decode_image(data: bytes, mime: str) -> np.ndarray | None:
    """Decode ``data`` to (h, w, c) uint8 if ``mime`` is a supported
    encoded image format; ``None`` if the format is unsupported (caller
    decides whether that's a stub-raise); ``ValueError`` propagates for
    corrupt data in a supported format."""
    if mime == "image/png":
        return decode_png(data)
    if mime == "image/bmp":
        return decode_bmp(data)
    if mime == "image/gif":
        return decode_gif(data)
    return None


def _lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """GIF-flavor LZW: LSB-first bit packing, CLEAR/END codes, dict
    growth to 12 bits."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    table: list[list[int]] = [[i] for i in range(clear)] + [[], []]
    out: list[int] = []
    prev: list[int] | None = None
    acc = 0
    nbits = 0
    pos = 0
    while True:
        while nbits < code_size:
            if pos >= len(data):
                return out  # tolerate missing END (common in the wild)
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = [[i] for i in range(clear)] + [[], []]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            return out
        if code < len(table) and table[code]:
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + [prev[0]]  # the KwKwK case
        elif code < clear:
            entry = [code]
        else:
            raise ValueError(f"bad LZW code {code}")
        out.extend(entry)
        if prev is not None and len(table) < 4096:
            table.append(prev + [entry[0]])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry


def _lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    """GIF-flavor LZW compression (dict growth, 12-bit cap, re-CLEAR)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    code_size = min_code_size + 1
    table: dict[tuple, int] = {(i,): i for i in range(clear)}
    next_code = end + 1

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    w: tuple = ()
    for k in indices:
        wk = w + (k,)
        if wk in table:
            w = wk
            continue
        emit(table[w])
        table[wk] = next_code
        next_code += 1
        if next_code - 1 == (1 << code_size) and code_size < 12:
            code_size += 1
        if next_code >= 4096:
            emit(clear)
            table = {(i,): i for i in range(clear)}
            next_code = end + 1
            code_size = min_code_size + 1
        w = (k,)
    if w:
        emit(table[w])
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(data: bytes) -> np.ndarray:
    """Decode the FIRST frame of a GIF87a/89a to (h, w, 3) uint8 RGB,
    composited onto the logical screen (background-filled if the frame
    rectangle is smaller). Transparency is ignored (the transparent
    index renders its palette color) — featurization treats frames as
    opaque rasters. Pure Python LZW, no codec library."""
    data = bytes(data)
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh, packed, bg, _ = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data, np.uint8, count=3 * n, offset=pos).reshape(n, 3)
        pos += 3 * n
    while pos < len(data):
        b = data[pos]
        if b == 0x21:  # extension: skip label + sub-blocks
            pos += 2
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            left, top, w, h, ipacked = struct.unpack(
                "<HHHHB", data[pos + 1 : pos + 10]
            )
            pos += 10
            pal = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                pal = np.frombuffer(
                    data, np.uint8, count=3 * n, offset=pos
                ).reshape(n, 3)
                pos += 3 * n
            if pal is None:
                raise ValueError("GIF frame without a color table")
            min_code = data[pos]
            pos += 1
            comp = bytearray()
            while pos < len(data) and data[pos] != 0:
                sz = data[pos]
                comp += data[pos + 1 : pos + 1 + sz]
                pos += 1 + sz
            pos += 1
            idx = _lzw_decode(bytes(comp), min_code)
            if len(idx) < w * h:
                raise ValueError("truncated GIF image data")
            grid = np.array(idx[: w * h], dtype=np.int32).reshape(h, w)
            if ipacked & 0x40:  # interlaced: undo the four passes
                rows = []
                for start, step in _GIF_INTERLACE_PASSES:
                    rows.extend(range(start, h, step))
                un = np.empty_like(grid)
                un[rows] = grid
                grid = un
            if grid.max() >= len(pal):
                raise ValueError("GIF index outside color table")
            frame = pal[grid]
            if (left, top, w, h) == (0, 0, sw, sh):
                return np.ascontiguousarray(frame)
            canvas = np.zeros((sh, sw, 3), dtype=np.uint8)
            if gct is not None and bg < len(gct):
                canvas[:, :] = gct[bg]
            canvas[top : top + h, left : left + w] = frame
            return canvas
        elif b == 0x3B:
            break
        else:
            raise ValueError(f"bad GIF block 0x{b:02x}")
    raise ValueError("GIF contains no image")


def encode_gif(img: np.ndarray, *, interlace: bool = False) -> bytes:
    """Encode an (h, w, 3) uint8 array as a single-frame GIF with a
    256-entry color table built from the image's unique colors (must be
    <= 256 — this encoder targets fixtures and re-emission of decoded
    GIFs, not general quantization)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    h, w, c = img.shape
    if c != 3:
        raise ValueError("encode_gif wants (h, w, 3) RGB")
    flat = img.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError("encode_gif supports <= 256 unique colors")
    pal = np.zeros((256, 3), dtype=np.uint8)
    pal[: len(colors)] = colors
    grid = inverse.reshape(h, w)
    if interlace:
        rows = []
        for start, step in _GIF_INTERLACE_PASSES:
            rows.extend(range(start, h, step))
        grid = grid[rows]
    comp = _lzw_encode([int(x) for x in grid.ravel()], 8)
    blocks = bytearray()
    for i in range(0, len(comp), 255):
        chunk = comp[i : i + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, 0x80 | 0x07, 0, 0)
        + pal.tobytes()
        + b"\x2C"
        + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlace else 0)
        + bytes([8])
        + bytes(blocks)
        + b"\x3B"
    )
