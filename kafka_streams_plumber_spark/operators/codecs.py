"""Pure-stdlib media codecs: PNG, BMP and WAV with zlib/struct/numpy
only — no PIL, no ffmpeg, no soundfile.

These turn the five common ENCODED image/audio formats into real
decode paths for ``operators/multimodal.py`` (which previously
supported only the ``*/x-raw`` buffer mimes): PNG covers the
lossless-image corpus case, JPEG the photographic web-crawl case
(baseline SOF0: from-scratch canonical Huffman + orthonormal IDCT),
GIF the icon/animation case, BMP the legacy-scan case, WAV the
PCM-audio case. Only compressed AUDIO/VIDEO (MP3/AAC/MP4) remains
stubbed in multimodal.py.

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
- JPEG: baseline (SOF0/1) 8-bit Huffman, any sampling factors up to
  2x2 (4:4:4 / 4:2:2 / 4:2:0), restart intervals, grayscale or
  YCbCr->RGB (JFIF full range). Progressive (SOF2) and arithmetic
  coding raise ValueError.
- MP4/ISO-BMFF: container DEMUX without any codec — `parse_mp4`
  (duration, per-track handler/codec/dims/sample counts) and
  `mp4_sync_samples` (keyframe payloads located via the
  stsz/stsc/stco/stts/stss sample tables, returned still encoded for
  a downstream codec/GPU stage).

Encoders (`encode_png` filter-0, `encode_bmp` 24-bit, `encode_wav`,
`encode_gif` single-frame <=256-color, `encode_jpeg` baseline with
optional 4:2:0 + restart markers) exist so pipelines can re-emit
bytes after a transform and tests can build golden fixtures without
any imaging library.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np



def _fail_closed(fn):
    """Decoder guard: corrupt input must surface as ValueError (the
    droppable-item contract in operators/multimodal.py) — zlib/struct/
    index errors from truncated or fuzzed bytes must not escape and
    kill a Spark task."""
    import functools

    @functools.wraps(fn)
    def wrapped(*a, **kw):
        try:
            return fn(*a, **kw)
        except ValueError:
            raise
        except (zlib.error, struct.error, IndexError, OverflowError) as e:
            raise ValueError(f"corrupt media: {e}") from e

    return wrapped


_PNG_SIG = b"\x89PNG\r\n\x1a\n"

#: PNG color type -> sample channels (before palette expansion)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


@_fail_closed
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


@_fail_closed
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


@_fail_closed
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
    if mime == "image/jpeg":
        return decode_jpeg(data)
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


@_fail_closed
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


# =====================================================================
# Baseline JPEG — pure numpy Huffman + DCT, no codec library
# =====================================================================

#: zig-zag order: index i of the scan -> (row, col) flattened position
_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
])

#: ITU-T T.81 Annex K quantization tables (luminance, chrominance)
_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

#: Annex K typical Huffman tables: (bits[1..16], values)
_HT_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HT_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HT_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_HT_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _dct_basis() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis matrix C: forward = C @ X @ C.T."""
    k = np.arange(8)[:, None]
    n = np.arange(8)[None, :]
    c = np.cos((2 * n + 1) * k * np.pi / 16) * np.sqrt(2 / 8)
    c[0] /= np.sqrt(2)
    return c


def _huff_decode_table(bits: list[int], values: list[int]) -> dict:
    """Canonical Huffman: (length, code) -> value."""
    table = {}
    code = 0
    i = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = values[i]
            i += 1
            code += 1
        code <<= 1
    return table


def _huff_encode_table(bits: list[int], values: list[int]) -> dict:
    """Canonical Huffman: value -> (code, length)."""
    table = {}
    code = 0
    i = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[values[i]] = (code, ln)
            i += 1
            code += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over entropy-coded JPEG data with 0xFF00
    unstuffing; stops cleanly at markers (returns them via `marker`)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.marker is not None or self.pos >= len(self.data):
                self.acc = (self.acc << 8) & 0xFFFFFFFF
                self.nbits += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 2
                else:
                    self.marker = nxt
                    # marker found: stop consuming, pad with zeros
                    self.acc = (self.acc << 8) & 0xFFFFFFFF
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.acc = ((self.acc << 8) | b) & 0xFFFFFFFF
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def byte_align(self) -> None:
        self.nbits -= self.nbits % 8

    def resync_restart(self) -> None:
        """Consume an RSTn marker at a restart boundary."""
        # everything still buffered is byte-padding for the boundary
        self.acc = 0
        self.nbits = 0
        if self.marker is None:
            # the reader only discovers markers by looking ahead; with
            # short per-restart payloads it may not have reached this
            # one yet — scan forward past any unread padding bytes
            while self.pos < len(self.data):
                b = self.data[self.pos]
                if (
                    b == 0xFF
                    and self.pos + 1 < len(self.data)
                    and self.data[self.pos + 1] != 0x00
                ):
                    self.marker = self.data[self.pos + 1]
                    break
                self.pos += 1
        if self.marker is not None and 0xD0 <= self.marker <= 0xD7:
            self.marker = None
            self.pos += 2


def _huff_read(r: _BitReader, table: dict) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | r.read_bit()
        if (ln, code) in table:
            return table[(ln, code)]
    raise ValueError("bad JPEG huffman code")


def _extend(v: int, t: int) -> int:
    """JPEG magnitude decoding: t-bit value v to signed coefficient."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


@_fail_closed
def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a BASELINE (SOF0, 8-bit, Huffman) JPEG to (h, w, 3) uint8
    RGB — pure numpy: marker parse, canonical Huffman, dequantize,
    inverse zigzag, orthonormal IDCT, nearest-neighbor chroma
    upsampling (any sampling factors up to 2x2), JFIF YCbCr->RGB.
    Grayscale JPEGs return (h, w, 1). Progressive (SOF2), arithmetic
    and 12-bit variants raise ValueError (treated as corrupt items by
    multimodal's droppable-item contract)."""
    data = bytes(data)
    if data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps: list[dict] = []
    w = h = 0
    restart = 0
    pos = 2
    scan_pos = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        m = data[pos + 1]
        if m == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        seg = data[pos + 4 : pos + 2 + seglen]
        if m == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[_ZIGZAG] = np.frombuffer(
                    seg, np.uint8, count=64, offset=i + 1
                )
                qt[tq] = tbl.reshape(8, 8)
                i += 65
        elif m == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                nvals = sum(bits)
                vals = list(seg[i + 17 : i + 17 + nvals])
                (huff_dc if tc == 0 else huff_ac)[th] = _huff_decode_table(
                    bits, vals
                )
                i += 17 + nvals
        elif m == 0xC0 or m == 0xC1:  # SOF0/1 baseline
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
        elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("progressive/extended JPEG unsupported")
        elif m == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", seg[:2])
        elif m == 0xDA:  # SOS
            ns = seg[0]
            for si in range(ns):
                cs, tt = seg[1 + 2 * si], seg[2 + 2 * si]
                for c in comps:
                    if c["id"] == cs:
                        c["td"], c["ta"] = tt >> 4, tt & 0xF
            scan_pos = pos + 2 + seglen
            break
        pos += 2 + seglen
    if scan_pos is None or not comps or w == 0:
        raise ValueError("JPEG missing SOS/SOF")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    C = _dct_basis()
    planes = []
    for c in comps:
        planes.append(
            np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        )

    r = _BitReader(data, scan_pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_count and mcu_count % restart == 0:
                r.resync_restart()
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int32)
                        t = _huff_read(r, huff_dc[c["td"]])
                        diff = _extend(r.read_bits(t), t)
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _huff_read(r, huff_ac[c["ta"]])
                            rrun, size = rs >> 4, rs & 0xF
                            if size == 0:
                                if rrun == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += rrun
                            if k > 63:
                                raise ValueError("AC run overflow")
                            zz[k] = _extend(r.read_bits(size), size)
                            k += 1
                        blk = np.zeros(64, dtype=np.int32)
                        blk[_ZIGZAG] = zz
                        blk = blk.reshape(8, 8) * qt[c["tq"]]
                        px = C.T @ blk @ C + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
            mcu_count += 1

    # upsample to full res, crop
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        y = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return y[:, :, None]
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=2,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


class _BitWriter:
    """MSB-first bit writer with JPEG 0xFF byte stuffing."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


def _category(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def encode_jpeg(
    img: np.ndarray, *, subsample: bool = False, restart: int = 0
) -> bytes:
    """Encode an (h, w, 3) RGB or (h, w[, 1]) grayscale uint8 array as
    a baseline JPEG with the Annex K quantization and Huffman tables —
    primarily the test/fixture counterpart of :func:`decode_jpeg` (the
    tables are unscaled: roughly 'quality 50', visibly lossy but
    PSNR-testable).

    ``subsample=True`` emits 4:2:0 (2x2 luma + box-averaged chroma per
    16x16 MCU — the dominant web-JPEG layout); ``restart=N`` emits a
    DRI segment and RSTn markers every N MCUs. Both exist chiefly so
    the decoder's subsampling/restart paths are testable without any
    external codec."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, nc = img.shape
    if nc not in (1, 3):
        raise ValueError("encode_jpeg wants gray or RGB")
    C = _dct_basis()

    if nc == 3:
        r, g, b = (img[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
        qts = [_QT_LUMA, _QT_CHROMA, _QT_CHROMA]
        dc_tabs = [_HT_DC_LUMA, _HT_DC_CHROMA, _HT_DC_CHROMA]
        ac_tabs = [_HT_AC_LUMA, _HT_AC_CHROMA, _HT_AC_CHROMA]
        if subsample:
            hv = [(2, 2), (1, 1), (1, 1)]
        else:
            hv = [(1, 1), (1, 1), (1, 1)]
    else:
        planes = [img[:, :, 0].astype(np.float64)]
        qts = [_QT_LUMA]
        dc_tabs = [_HT_DC_LUMA]
        ac_tabs = [_HT_AC_LUMA]
        hv = [(1, 1)]

    hmax = max(x for x, _ in hv)
    vmax = max(v for _, v in hv)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    def pad_to(p: np.ndarray, ph: int, pw: int) -> np.ndarray:
        pp = np.empty((ph, pw))
        sh, sw = p.shape
        pp[:sh, :sw] = p
        if ph > sh:
            pp[sh:, :sw] = p[-1:, :]
        if pw > sw:
            pp[:, sw:] = pp[:, sw - 1 : sw]
        return pp

    comp_planes = []
    for ci, p in enumerate(planes):
        ch, cv = hv[ci]
        if (ch, cv) != (hmax, vmax):
            # box-average subsample by the ratio
            ry, rx = vmax // cv, hmax // ch
            ph = (h + ry - 1) // ry * ry
            pw = (w + rx - 1) // rx * rx
            p = pad_to(p, ph, pw)
            p = p.reshape(ph // ry, ry, pw // rx, rx).mean(axis=(1, 3))
        comp_planes.append(pad_to(p, mcuy * cv * 8, mcux * ch * 8))

    enc_dc = [_huff_encode_table(*t) for t in dc_tabs]
    enc_ac = [_huff_encode_table(*t) for t in ac_tabs]
    bwr = _BitWriter()
    pred = [0] * len(planes)
    mcu_count = 0
    rst_idx = 0

    def write_block(ci: int, blk: np.ndarray) -> None:
        coef = C @ (blk - 128.0) @ C.T
        q = np.round(coef / qts[ci].reshape(8, 8)).astype(np.int32)
        zz = q.reshape(-1)[_ZIGZAG]
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        t = _category(diff)
        code, ln = enc_dc[ci][t]
        bwr.write(code, ln)
        if t:
            bwr.write(diff if diff > 0 else diff + (1 << t) - 1, t)
        run = 0
        last_nz = 0
        for k in range(1, 64):
            if zz[k] != 0:
                last_nz = k
        for k in range(1, last_nz + 1):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = enc_ac[ci][0xF0]
                bwr.write(code, ln)
                run -= 16
            scat = _category(v)
            code, ln = enc_ac[ci][(run << 4) | scat]
            bwr.write(code, ln)
            bwr.write(v if v > 0 else v + (1 << scat) - 1, scat)
            run = 0
        if last_nz < 63:
            code, ln = enc_ac[ci][0x00]
            bwr.write(code, ln)

    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_count and mcu_count % restart == 0:
                bwr.flush()
                bwr.out += bytes([0xFF, 0xD0 + rst_idx])
                rst_idx = (rst_idx + 1) % 8
                pred = [0] * len(planes)
            for ci, p in enumerate(comp_planes):
                ch, cv = hv[ci]
                for by in range(cv):
                    for bx in range(ch):
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        write_block(ci, p[y0 : y0 + 8, x0 : x0 + 8])
            mcu_count += 1
    bwr.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xFF\xD8")
    zl = np.zeros(64, dtype=np.uint8)
    zl[:] = _QT_LUMA.reshape(-1)[_ZIGZAG]
    out += seg(0xDB, bytes([0x00]) + zl.tobytes())
    if nc == 3:
        zc = np.zeros(64, dtype=np.uint8)
        zc[:] = _QT_CHROMA.reshape(-1)[_ZIGZAG]
        out += seg(0xDB, bytes([0x01]) + zc.tobytes())
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for ci in range(nc):
        sof += bytes(
            [ci + 1, (hv[ci][0] << 4) | hv[ci][1], 0 if ci == 0 else 1]
        )
    out += seg(0xC0, sof)

    def dht(tc: int, th: int, t: tuple) -> bytes:
        bits, vals = t
        return bytes([tc << 4 | th]) + bytes(bits) + bytes(vals)

    out += seg(0xC4, dht(0, 0, _HT_DC_LUMA) + dht(1, 0, _HT_AC_LUMA))
    if nc == 3:
        out += seg(
            0xC4, dht(0, 1, _HT_DC_CHROMA) + dht(1, 1, _HT_AC_CHROMA)
        )
    if restart:
        out += seg(0xDD, struct.pack(">H", restart))
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += bwr.out
    out += b"\xFF\xD9"
    return bytes(out)


# =====================================================================
# MP4 / ISO-BMFF demux — box parsing + keyframe extraction, no codec
# =====================================================================


def _mp4_boxes(data: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for the boxes in a range."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        fourcc = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            body = pos + 16
        elif size == 0:  # to end of enclosing box
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError("corrupt MP4 box")
        yield fourcc, body, pos + size
        pos += size


def _mp4_find(data: bytes, start: int, end: int, path: list[bytes]):
    """Walk a box path; returns (body_start, body_end) or None."""
    if not path:
        return (start, end)
    for fourcc, b, e in _mp4_boxes(data, start, end):
        if fourcc == path[0]:
            return _mp4_find(data, b, e, path[1:])
    return None


def _fullbox(data: bytes, pos: int) -> tuple[int, int]:
    """(version, body_offset_after_version_flags)."""
    return data[pos], pos + 4


@_fail_closed
def parse_mp4(data: bytes) -> dict:
    """Parse an ISO-BMFF (MP4/MOV) container WITHOUT any codec: movie
    duration and, per track, the handler (vide/soun), sample-entry
    fourcc (the codec id, e.g. avc1/mp4a), dimensions, timescale and
    sample count — the metadata a triage pipeline filters on before
    paying for GPU decode. Raises ValueError on non-BMFF bytes."""
    data = bytes(data)
    moov = _mp4_find(data, 0, len(data), [b"moov"])
    if moov is None:
        raise ValueError("not an MP4 (no moov)")
    out: dict = {"tracks": []}
    mvhd = _mp4_find(data, *moov, [b"mvhd"])
    if mvhd is not None:
        v, p = _fullbox(data, mvhd[0])
        if v == 1:
            ts, dur = struct.unpack(">IQ", data[p + 16 : p + 28])
        else:
            ts, dur = struct.unpack(">II", data[p + 8 : p + 16])
        out["duration_ms"] = int(dur * 1000 // max(ts, 1))
    for fourcc, b, e in _mp4_boxes(data, *moov):
        if fourcc != b"trak":
            continue
        trk: dict = {}
        tkhd = _mp4_find(data, b, e, [b"tkhd"])
        if tkhd is not None:
            v, p = _fullbox(data, tkhd[0])
            base = p + (32 if v == 1 else 20)
            trk["track_id"] = struct.unpack(
                ">I", data[p + (16 if v == 1 else 8) : p + (20 if v == 1 else 12)]
            )[0]
            # after duration: reserved(8) layer/alt/volume/reserved(8)
            # matrix(36) -> width/height as 16.16 fixed point
            w16, h16 = struct.unpack(">II", data[base + 52 : base + 60])
            trk["width"], trk["height"] = w16 >> 16, h16 >> 16
        mdia = _mp4_find(data, b, e, [b"mdia"])
        if mdia is None:
            continue
        mdhd = _mp4_find(data, *mdia, [b"mdhd"])
        if mdhd is not None:
            v, p = _fullbox(data, mdhd[0])
            if v == 1:
                ts, dur = struct.unpack(">IQ", data[p + 16 : p + 28])
            else:
                ts, dur = struct.unpack(">II", data[p + 8 : p + 16])
            trk["timescale"] = ts
            trk["duration_ms"] = int(dur * 1000 // max(ts, 1))
        hdlr = _mp4_find(data, *mdia, [b"hdlr"])
        if hdlr is not None:
            trk["handler"] = data[hdlr[0] + 8 : hdlr[0] + 12].decode(
                "ascii", "replace"
            )
        stbl = _mp4_find(data, *mdia, [b"minf", b"stbl"])
        if stbl is not None:
            stsd = _mp4_find(data, *stbl, [b"stsd"])
            if stsd is not None:
                _, p = _fullbox(data, stsd[0])
                trk["codec"] = data[p + 8 : p + 12].decode("ascii", "replace")
            stsz = _mp4_find(data, *stbl, [b"stsz"])
            if stsz is not None:
                _, p = _fullbox(data, stsz[0])
                trk["n_samples"] = struct.unpack(">I", data[p + 4 : p + 8])[0]
        out["tracks"].append(trk)
    return out


@_fail_closed
def mp4_sync_samples(
    data: bytes, *, handler: str = "vide", max_samples: int = 64
) -> list[dict]:
    """Extract the SYNC (keyframe) samples of the first matching track
    as raw encoded payloads — real container demux with no codec: the
    frame bytes stay encoded (e.g. AVC NAL units) for a downstream
    GPU/codec stage. Returns dicts of (sample_idx, time_ms, size,
    payload). All samples are sync when the track has no stss box."""
    data = bytes(data)
    moov = _mp4_find(data, 0, len(data), [b"moov"])
    if moov is None:
        raise ValueError("not an MP4 (no moov)")
    for fourcc, b, e in _mp4_boxes(data, *moov):
        if fourcc != b"trak":
            continue
        mdia = _mp4_find(data, b, e, [b"mdia"])
        if mdia is None:
            continue
        hdlr = _mp4_find(data, *mdia, [b"hdlr"])
        if hdlr is None or data[hdlr[0] + 8 : hdlr[0] + 12] != handler.encode():
            continue
        stbl = _mp4_find(data, *mdia, [b"minf", b"stbl"])
        mdhd = _mp4_find(data, *mdia, [b"mdhd"])
        v, p = _fullbox(data, mdhd[0])
        if v == 1:
            timescale = struct.unpack(">I", data[p + 16 : p + 20])[0]
        else:
            timescale = struct.unpack(">I", data[p + 8 : p + 12])[0]

        def table(name: bytes):
            r = _mp4_find(data, *stbl, [name])
            if r is None:
                return None
            return _fullbox(data, r[0])[1], r[1]

        # sizes
        _, pz = _fullbox(data, _mp4_find(data, *stbl, [b"stsz"])[0])
        fixed, n = struct.unpack(">II", data[pz : pz + 8])
        sizes = (
            [fixed] * n
            if fixed
            else list(
                struct.unpack(
                    f">{n}I", data[pz + 8 : pz + 8 + 4 * n]
                )
            )
        )
        # chunk offsets (stco or co64)
        co = _mp4_find(data, *stbl, [b"stco"])
        if co is not None:
            _, pc = _fullbox(data, co[0])
            (nc,) = struct.unpack(">I", data[pc : pc + 4])
            offs = list(struct.unpack(f">{nc}I", data[pc + 4 : pc + 4 + 4 * nc]))
        else:
            _, pc = _fullbox(data, _mp4_find(data, *stbl, [b"co64"])[0])
            (nc,) = struct.unpack(">I", data[pc : pc + 4])
            offs = list(struct.unpack(f">{nc}Q", data[pc + 4 : pc + 4 + 8 * nc]))
        # sample->chunk runs
        _, ps = _fullbox(data, _mp4_find(data, *stbl, [b"stsc"])[0])
        (ne,) = struct.unpack(">I", data[ps : ps + 4])
        runs = [
            struct.unpack(">III", data[ps + 4 + 12 * i : ps + 16 + 12 * i])
            for i in range(ne)
        ]
        # per-sample absolute offsets
        sample_off: list[int] = []
        si = 0
        for ri, (first, per_chunk, _) in enumerate(runs):
            last = runs[ri + 1][0] - 1 if ri + 1 < len(runs) else len(offs)
            for ci in range(first - 1, last):
                base = offs[ci]
                for _ in range(per_chunk):
                    if si >= n:
                        break
                    sample_off.append(base)
                    base += sizes[si]
                    si += 1
        # decode times
        _, pt = _fullbox(data, _mp4_find(data, *stbl, [b"stts"])[0])
        (nt,) = struct.unpack(">I", data[pt : pt + 4])
        times: list[int] = []
        t = 0
        for i in range(nt):
            cnt, delta = struct.unpack(
                ">II", data[pt + 4 + 8 * i : pt + 12 + 8 * i]
            )
            for _ in range(cnt):
                times.append(t)
                t += delta
        # sync set
        ss = _mp4_find(data, *stbl, [b"stss"])
        if ss is None:
            sync = range(1, n + 1)
        else:
            _, pp = _fullbox(data, ss[0])
            (ns,) = struct.unpack(">I", data[pp : pp + 4])
            sync = struct.unpack(f">{ns}I", data[pp + 4 : pp + 4 + 4 * ns])
        out = []
        for s1 in sync:
            i = s1 - 1
            if i >= n or len(out) >= max_samples:
                break
            out.append(
                {
                    "sample_idx": i,
                    "time_ms": int(times[i] * 1000 // max(timescale, 1)),
                    "size": sizes[i],
                    "payload": data[sample_off[i] : sample_off[i] + sizes[i]],
                }
            )
        return out
    raise ValueError(f"no {handler!r} track")


def encode_mp4(
    samples: list[bytes],
    *,
    width: int = 64,
    height: int = 48,
    timescale: int = 1000,
    sample_delta: int = 40,
    sync: list[int] | None = None,
    codec: bytes = b"avc1",
) -> bytes:
    """Build a minimal single-video-track ISO-BMFF container around
    encoded sample payloads (one chunk, constant frame duration,
    explicit 1-based ``sync`` sample list; all samples sync when
    omitted). Fixture-grade: gives the demux path (:func:`parse_mp4`,
    :func:`mp4_sync_samples`) a spec-valid container without any
    encoder dependency; the payloads are whatever bytes the caller
    supplies."""

    def box(fourcc: bytes, body: bytes) -> bytes:
        return struct.pack(">I", len(body) + 8) + fourcc + body

    def full(fourcc: bytes, body: bytes, version: int = 0) -> bytes:
        return box(fourcc, bytes([version, 0, 0, 0]) + body)

    n = len(samples)
    dur = n * sample_delta
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mdat_payload = b"".join(samples)
    mdat = box(b"mdat", mdat_payload)
    # chunk data starts right after ftyp + mdat header
    chunk_off = len(ftyp) + 8

    stsd_entry = (
        struct.pack(">I", 86)
        + codec
        + b"\x00" * 6
        + struct.pack(">H", 1)
        + b"\x00" * 16
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)
        + b"\x00" * 32
        + struct.pack(">H", 0x18)
        + struct.pack(">h", -1)
    )
    stsd = full(b"stsd", struct.pack(">I", 1) + stsd_entry)
    stts = full(b"stts", struct.pack(">III", 1, n, sample_delta))
    stsc = full(b"stsc", struct.pack(">IIII", 1, 1, n, 1))
    stsz = full(
        b"stsz",
        struct.pack(">II", 0, n)
        + b"".join(struct.pack(">I", len(s)) for s in samples),
    )
    stco = full(b"stco", struct.pack(">II", 1, chunk_off))
    stbl_body = stsd + stts + stsc + stsz + stco
    if sync is not None:
        stbl_body += full(
            b"stss",
            struct.pack(">I", len(sync))
            + b"".join(struct.pack(">I", s) for s in sync),
        )
    stbl = box(b"stbl", stbl_body)
    vmhd = full(b"vmhd", struct.pack(">HHHH", 0, 0, 0, 0), version=0)
    dref = full(b"dref", struct.pack(">I", 1) + full(b"url ", b"", version=0))
    dinf = box(b"dinf", dref)
    minf = box(b"minf", vmhd + dinf + stbl)
    hdlr = full(
        b"hdlr", struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"demo\x00"
    )
    mdhd = full(
        b"mdhd",
        struct.pack(">IIIIHH", 0, 0, timescale, dur, 0x55C4, 0),
    )
    mdia = box(b"mdia", mdhd + hdlr + minf)
    tkhd = full(
        b"tkhd",
        struct.pack(">III", 0, 0, 1)  # created, modified, track id
        + struct.pack(">I", 0)  # reserved
        + struct.pack(">I", dur)
        + b"\x00" * 8  # reserved
        + struct.pack(">HHHH", 0, 0, 0, 0)  # layer alt volume reserved
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
        version=0,
    )
    mvhd = full(
        b"mvhd",
        struct.pack(">IIII", 0, 0, timescale, dur)
        + struct.pack(">I", 0x00010000)
        + struct.pack(">H", 0x0100)
        + b"\x00" * 10
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),
    )
    trak = box(b"trak", tkhd + mdia)
    moov = box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


# =====================================================================
# Header-only probes — dims/duration/codec without decoding payloads
# =====================================================================

#: MPEG-1 Layer III bitrate (kbps) and sample-rate tables
_MP3_BITRATES = (
    0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
)
_MP3_RATES = (44100, 48000, 32000)


@_fail_closed
def parse_mp3(data: bytes, *, max_frames: int = 2000) -> dict:
    """Parse MPEG-1 Layer III frame headers (no audio decode): sample
    rate, bitrate mode, frame count and the duration estimate —
    1152 samples per frame. Skips a leading ID3v2 tag. Raises
    ValueError when no valid frame sync is found."""
    data = bytes(data)
    pos = 0
    if data[:3] == b"ID3":
        sz = (
            (data[6] & 0x7F) << 21
            | (data[7] & 0x7F) << 14
            | (data[8] & 0x7F) << 7
            | (data[9] & 0x7F)
        )
        pos = 10 + sz
    n = 0
    sr = None
    bitrates = set()
    while pos + 4 <= len(data) and n < max_frames:
        h = struct.unpack(">I", data[pos : pos + 4])[0]
        if (h >> 21) != 0x7FF:
            if n:
                break  # past the last frame (tag/garbage tail)
            pos += 1
            continue
        version = (h >> 19) & 3
        layer = (h >> 17) & 3
        if version != 3 or layer != 1:  # MPEG-1 Layer III only
            raise ValueError("only MPEG-1 Layer III supported")
        br_idx = (h >> 12) & 0xF
        sr_idx = (h >> 10) & 3
        if br_idx in (0, 15) or sr_idx == 3:
            raise ValueError("free-format/bad MP3 header")
        br = _MP3_BITRATES[br_idx]
        this_sr = _MP3_RATES[sr_idx]
        if sr is None:
            sr = this_sr
        elif sr != this_sr:
            break
        padding = (h >> 9) & 1
        frame_len = 144 * br * 1000 // sr + padding
        bitrates.add(br)
        n += 1
        pos += max(frame_len, 4)
    if not n:
        raise ValueError("no MP3 frame sync found")
    return {
        "sample_rate": sr,
        "n_frames": n,
        "vbr": len(bitrates) > 1,
        "bitrate_kbps": max(bitrates),
        "duration_ms": int(n * 1152 * 1000 // sr),
    }


@_fail_closed
def probe_media_bytes(data: bytes, mime: str) -> dict:
    """Header-only probe: dims / duration / sample rate / codec for a
    media blob WITHOUT decoding its payload — the cheap triage pass
    that decides what is worth a decode stage. Supported: PNG, BMP,
    GIF, JPEG (SOF scan), WAV, MP3, MP4. Raises ValueError for corrupt
    bytes or an unsupported mime."""
    data = bytes(data)
    out: dict = {"mime": mime}
    if mime == "image/png":
        if data[:8] != _PNG_SIG:
            raise ValueError("not a PNG")
        w, h = struct.unpack(">II", data[16:24])
        out.update(width=w, height=h)
    elif mime == "image/bmp":
        if data[:2] != b"BM":
            raise ValueError("not a BMP")
        w, hs = struct.unpack("<ii", data[18:26])
        out.update(width=w, height=abs(hs))
    elif mime == "image/gif":
        if data[:6] not in (b"GIF87a", b"GIF89a"):
            raise ValueError("not a GIF")
        w, h = struct.unpack("<HH", data[6:10])
        out.update(width=w, height=h)
    elif mime == "image/jpeg":
        if data[:2] != b"\xFF\xD8":
            raise ValueError("not a JPEG")
        pos = 2
        while pos + 4 <= len(data):
            if data[pos] != 0xFF:
                raise ValueError("bad JPEG marker stream")
            m = data[pos + 1]
            if m in (0xC0, 0xC1, 0xC2):  # SOF0/1/2: dims live here
                h, w = struct.unpack(">HH", data[pos + 5 : pos + 9])
                out.update(width=w, height=h, codec=f"sof{m - 0xC0}")
                break
            if m == 0xD9 or m == 0xDA:
                raise ValueError("JPEG without SOF")
            (ln,) = struct.unpack(">H", data[pos + 2 : pos + 4])
            pos += 2 + ln
        else:
            raise ValueError("truncated JPEG")
    elif mime == "audio/wav":
        x, sr = decode_wav(data)  # header parse dominates; payload is a view
        out.update(
            sample_rate=sr,
            duration_ms=int(x.shape[0] * 1000 // max(sr, 1)),
            channels=int(x.shape[1]),
        )
    elif mime == "audio/mpeg":
        out.update(parse_mp3(data))
    elif mime == "video/mp4":
        meta = parse_mp4(data)
        out["duration_ms"] = meta.get("duration_ms")
        for t in meta["tracks"]:
            if t.get("handler") == "vide":
                out.update(
                    width=t.get("width"),
                    height=t.get("height"),
                    codec=t.get("codec"),
                )
                break
    else:
        raise ValueError(f"no probe for {mime!r}")
    return out


def phash64(img: "np.ndarray") -> int:
    """Perceptual hash (pHash): 32x32 grayscale -> orthonormal 2D
    DCT-II -> low-frequency 8x8 block -> median threshold over the 63
    AC coefficients, packed into bits 0..62 (bit 63 stays 0; the DC
    coefficient is excluded so the hash is invariant under global
    brightness shifts). Resize uses the same pixel-center
    nearest-neighbor convention as resize_images, so the hash is
    stable under rescaling up to NN artifacts (a few bits).

    Pure numpy — two matrix multiplies per image, no codec library.
    Near-duplicate search over the hashes is Hamming distance, served
    at scale by dedup.hamming_pairs' banded bucket join.
    """
    g = img.astype("float64")
    if g.ndim == 3:
        g = g.mean(axis=2)
    h, w = g.shape
    if h < 1 or w < 1:
        raise ValueError("empty image")
    ys = ((np.arange(32) + 0.5) * (h / 32.0)).astype(np.int64).clip(0, h - 1)
    xs = ((np.arange(32) + 0.5) * (w / 32.0)).astype(np.int64).clip(0, w - 1)
    s = g[ys][:, xs]
    n = 32
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.cos(np.pi * k * (2 * i + 1) / (2 * n)) * np.sqrt(2.0 / n)
    m[0] /= np.sqrt(2.0)
    d = m @ s @ m.T
    flat = d[:8, :8].ravel()
    med = float(np.median(flat[1:]))
    bits = 0
    for idx in range(1, 64):
        if flat[idx] > med:
            bits |= 1 << (idx - 1)
    return bits
