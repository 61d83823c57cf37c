"""Multimodal (image/audio/video) column plumbing.

Beyond-reference (SURVEY §7 Phase 4). Binary payloads ride as opaque
``binary`` columns with typed metadata; decode / feature-extraction /
resize / frame-sampling run as Arrow-batched ``mapInPandas`` stages.

Decode support is tiered by what pure stdlib can do (no PIL/ffmpeg in
this container):

- REAL header decode (actual bytes parsing, exact dimensions): PNG,
  JPEG (SOF marker walk), GIF, BMP, binary PPM/PGM;
- REAL raster decode + pixel features (channel means / brightness
  stats): uncompressed 24-bit BMP, binary PPM/PGM, PNG — every legal
  IHDR combination: gray 1/2/4/8/16-bit, gray+alpha/RGB/RGBA 8/16-bit,
  palette 1/2/4/8-bit, sequential and Adam7-interlaced (stdlib zlib
  inflate + scanline unfiltering + 7-pass de-interleave), and JPEG —
  baseline sequential (ITU-T T.81 SOF0: Huffman entropy decode + numpy
  dequant/IDCT/upsample/YCbCr, incl. 4:2:0/4:2:2 and restart markers)
  AND progressive (SOF2: spectral-selection band scans with EOBn runs
  + successive-approximation DC/AC refinement bit scans, G.1.2.3) —
  and GIF (variable-width LZW + palette + deinterlace; animated GIFs
  get full GIF89a frame compositing on the video path),
  WEBP lossless (full VP8L bitstream: canonical prefix codes, meta
  prefix groups, LZ77 + color cache, predictor / cross-color /
  subtract-green / color-indexing transforms with pixel bundling),
  plus Motion-JPEG AVI first frames via the RIFF ``movi`` walk;
- REAL audio decode via the stdlib ``wave`` module: PCM WAV channel
  count / sample rate / duration plus RMS + zero-crossing features;
- REAL video container metadata: MP4/MOV ISO-BMFF box walk (mvhd
  duration, tkhd track dims, versions 0/1) and AVI RIFF avih — feeds
  ``sample_video_frames`` with real durations;
- STUB (deterministic digest-driven fake, clearly marked): pixel data
  of the remaining compressed codecs (lossy VP8 WEBP, arithmetic-coded
  JPEG, non-MJPEG video frames). A codec
  deployment swaps ``_feature_stub`` for a real decoder and nothing
  else changes — schemas, batch iteration and partitioning are real.
"""

from __future__ import annotations

import hashlib
import io
import struct
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T


IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("format", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)

AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_s", T.DoubleType(), True),
        T.StructField("format", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)

VIDEO_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_s", T.DoubleType(), True),
        T.StructField("format", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def parse_image_header(b: bytes) -> Optional[tuple[int, int, str]]:
    """REAL header parse for PNG / JPEG / GIF / BMP / PPM / PGM — exact
    (width, height, format) from the actual bytes; None when the payload
    is none of these."""
    if len(b) >= 24 and b[:8] == b"\x89PNG\r\n\x1a\n":
        w, h = struct.unpack(">II", b[16:24])
        return w, h, "png"
    if len(b) >= 4 and b[:2] == b"\xff\xd8":  # JPEG: walk to an SOF marker
        i = 2
        while i + 9 < len(b):
            if b[i] != 0xFF:
                i += 1
                continue
            marker = b[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seglen = struct.unpack(">H", b[i + 2 : i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                return w, h, "jpeg"
            i += 2 + seglen
        return None
    if len(b) >= 10 and b[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", b[6:10])
        return w, h, "gif"
    if len(b) >= 26 and b[:2] == b"BM":
        w, h = struct.unpack("<ii", b[18:26])
        return w, abs(h), "bmp"
    if len(b) >= 20 and b[:4] == b"RIFF" and b[8:12] == b"WEBP":
        i = 12
        while i + 8 <= len(b):
            fourcc = b[i : i + 4]
            size = struct.unpack("<I", b[i + 4 : i + 8])[0]
            p = b[i + 8 : i + 8 + size]
            if fourcc == b"VP8L" and len(p) >= 5 and p[0] == 0x2F:
                bits = struct.unpack("<I", p[1:5])[0]
                return (bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1, "webp"
            if fourcc == b"VP8X" and len(p) >= 10:  # canvas size, 24-bit LE
                w = 1 + int.from_bytes(p[4:7], "little")
                h = 1 + int.from_bytes(p[7:10], "little")
                return w, h, "webp"
            if fourcc == b"VP8 " and len(p) >= 10 and p[3:6] == b"\x9d\x01\x2a":
                w = struct.unpack("<H", p[6:8])[0] & 0x3FFF
                h = struct.unpack("<H", p[8:10])[0] & 0x3FFF
                return w, h, "webp"
            i += 8 + size + (size & 1)
        return None
    if len(b) >= 2 and b[:2] in (b"P5", b"P6"):
        try:
            toks = _ppm_tokens(b, 3)
            return int(toks[0]), int(toks[1]), "ppm" if b[:2] == b"P6" else "pgm"
        except Exception:
            return None
    return None


def _ppm_tokens(b: bytes, n: int) -> list[bytes]:
    """First n whitespace-separated header tokens after the magic,
    skipping '#' comments; also returns the offset where the raster
    starts via the sentinel appended as the last element."""
    toks: list[bytes] = []
    i = 2
    while len(toks) < n and i < len(b):
        while i < len(b) and b[i : i + 1].isspace():
            i += 1
        if b[i : i + 1] == b"#":
            while i < len(b) and b[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(b) and not b[j : j + 1].isspace():
            j += 1
        toks.append(b[i:j])
        i = j
    toks.append(str(i + 1).encode())  # raster starts after ONE whitespace
    return toks


def decode_raster(b: bytes) -> Optional[tuple[int, int, bytes, int]]:
    """REAL raster decode for uncompressed formats: returns (width,
    height, rgb_bytes, n_channels) for binary PPM (P6) / PGM (P5) and
    uncompressed 24-bit BMP; None for anything else."""
    if b[:2] in (b"P5", b"P6"):
        try:
            toks = _ppm_tokens(b, 3)
            w, h = int(toks[0]), int(toks[1])
            off = int(toks[-1])
            nch = 3 if b[:2] == b"P6" else 1
            raster = b[off : off + w * h * nch]
            if len(raster) == w * h * nch:
                return w, h, raster, nch
        except Exception:
            return None
        return None
    if b[:2] == b"BM" and len(b) >= 54:
        off = struct.unpack("<I", b[10:14])[0]
        w, h = struct.unpack("<ii", b[18:26])
        bpp = struct.unpack("<H", b[28:30])[0]
        comp = struct.unpack("<I", b[30:34])[0]
        if bpp == 24 and comp == 0:
            row = (w * 3 + 3) & ~3  # 4-byte aligned rows
            need = row * abs(h)
            if len(b) >= off + need:
                out = bytearray()
                for r in range(abs(h)):
                    src = off + (abs(h) - 1 - r if h > 0 else r) * row
                    line = b[src : src + w * 3]
                    for px in range(w):  # BGR -> RGB
                        out += line[px * 3 + 2 : px * 3 + 3]
                        out += line[px * 3 + 1 : px * 3 + 2]
                        out += line[px * 3 : px * 3 + 1]
                return w, abs(h), bytes(out), 3
    return None


def _pixel_feature(raster: bytes, nch: int, dim: int = 8) -> list[float]:
    """REAL pixel statistics feature: per-channel means, brightness
    mean/std/min/max, padded/truncated to dim."""
    n = len(raster) // nch
    if not n:
        return [0.0] * dim
    sums = [0] * nch
    bright = []
    for i in range(n):
        px = raster[i * nch : (i + 1) * nch]
        for c in range(nch):
            sums[c] += px[c]
        bright.append(sum(px) / nch)
    mean_b = sum(bright) / n
    var = sum((x - mean_b) ** 2 for x in bright) / n
    feats = [s / n / 255.0 for s in sums]
    feats += [mean_b / 255.0, var**0.5 / 255.0, min(bright) / 255.0, max(bright) / 255.0]
    feats = feats[:dim] + [0.0] * max(0, dim - len(feats))
    return [round(float(x), 6) for x in feats]


def _try_import_pil():
    """Feature gate: real compressed-codec decode when Pillow is
    installed (it isn't in this container); the digest stub otherwise.
    Resolved once at import — environments with codecs get real decode
    with no code change."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except Exception:
        return None


_PIL_IMAGE = _try_import_pil()


def _pil_decode(raw: bytes) -> Optional[tuple[int, int, bytes, int]]:
    """REAL raster decode for compressed codecs (PNG/JPEG/WEBP/...)
    via Pillow when available: returns (width, height, rgb_bytes, 3),
    the same shape ``decode_raster`` yields, so the feature path is
    identical. None when PIL is absent or the payload won't open."""
    if _PIL_IMAGE is None or not raw:
        return None
    try:
        img = _PIL_IMAGE.open(io.BytesIO(raw))
        img = img.convert("RGB")
        w, h = img.size
        return w, h, img.tobytes(), 3
    except Exception:
        return None


# Adam7 interlace pass geometry (PNG spec §8.2): (x_start, y_start,
# x_step, y_step) for each of the 7 passes, in stream order.
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _png_unfilter(plain: bytes, off: int, wpx: int, hpx: int, nch: int, bit: int):
    """Unfilter one (sub-)image of ``hpx`` scanlines starting at byte
    ``off`` of the inflated stream; returns (list-of-raw-scanlines, new
    offset) or None on a bad filter byte / truncation. Each Adam7 pass is
    its own filtered image (prior row resets to zero), which is why this
    is factored per-pass."""
    if wpx == 0 or hpx == 0:
        return [], off
    bits_pp = nch * bit
    stride = (wpx * bits_pp + 7) // 8
    bpp = max(1, (bits_pp + 7) // 8)  # filter distance, per spec min 1 byte
    if off + (stride + 1) * hpx > len(plain):
        return None
    rows = []
    prev = bytes(stride)
    for _r in range(hpx):
        f = plain[off]
        if f > 4:
            return None
        cur = bytearray(stride)
        for x in range(stride):
            v = plain[off + 1 + x]
            a = cur[x - bpp] if x >= bpp else 0
            b = prev[x]
            if f == 0:
                rec = v
            elif f == 1:
                rec = v + a
            elif f == 2:
                rec = v + b
            elif f == 3:
                rec = v + ((a + b) >> 1)
            else:  # 4: Paeth
                c = prev[x - bpp] if x >= bpp else 0
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                rec = v + (a if (pa <= pb and pa <= pc) else (b if pb <= pc else c))
            cur[x] = rec & 0xFF
        off += stride + 1
        prev = bytes(cur)
        rows.append(prev)
    return rows, off


def _png_unpack(row: bytes, n_samples: int, bit: int) -> bytes:
    """Expand a packed sub-byte scanline (bit depth 1/2/4, MSB-first per
    spec) to one byte per sample; identity at bit depth 8; at 16 the
    high byte of each big-endian sample pair (the standard 16→8
    reduction, exact for the v*257 expansion encoders use)."""
    if bit == 8:
        return row[:n_samples]
    if bit == 16:
        return row[: 2 * n_samples : 2]
    mask = (1 << bit) - 1
    out = bytearray(n_samples)
    for i in range(n_samples):
        b = row[(i * bit) >> 3]
        shift = 8 - bit - ((i * bit) & 7)
        out[i] = (b >> shift) & mask
    return bytes(out)


def _png_decode(raw: bytes) -> Optional[tuple[int, int, bytes, int]]:
    """REAL stdlib PNG raster decode — zlib inflate + per-scanline
    unfiltering (filters 0-4 per the public PNG spec) for every legal
    IHDR combination: gray at bit depth 1/2/4/8/16 (sub-byte expanded
    to full range, 16-bit reduced to the high byte), gray+alpha / RGB /
    RGBA at 8/16, and palette (color type 3, bit depth 1/2/4/8, PLTE
    lookup) — both sequential and Adam7-interlaced (7-pass
    de-interleave, each pass unfiltered as its own sub-image). Returns
    (width, height, raster_bytes, n_channels), the same shape
    ``decode_raster`` yields, so the feature path is identical."""
    import zlib

    import numpy as np

    if len(raw) < 33 or raw[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    i = 8
    w = h = bit = ct = interlace = None
    plte = None
    idat = bytearray()
    try:
        while i + 8 <= len(raw):
            (length,) = struct.unpack(">I", raw[i : i + 4])
            ctype = raw[i + 4 : i + 8]
            data = raw[i + 8 : i + 8 + length]
            if ctype == b"IHDR":
                w, h, bit, ct, _comp, _filt, interlace = struct.unpack(
                    ">IIBBBBB", data
                )
            elif ctype == b"PLTE":
                plte = data
            elif ctype == b"IDAT":
                idat += data
            elif ctype == b"IEND":
                break
            i += 12 + length
        if w is None or interlace not in (0, 1):
            return None
        if ct == 3:
            if bit not in (1, 2, 4, 8) or plte is None or len(plte) % 3:
                return None
            nch = 1
        elif ct == 0:
            if bit not in (1, 2, 4, 8, 16):
                return None
            nch = 1
        else:
            nch = {2: 3, 4: 2, 6: 4}.get(ct)
            if nch is None or bit not in (8, 16):
                return None
        plain = zlib.decompress(bytes(idat))
    except Exception:
        return None

    samples = bytearray(w * h * nch)  # one byte per sample, de-interlaced
    if interlace == 0:
        got = _png_unfilter(plain, 0, w, h, nch, bit)
        if got is None:
            return None
        rows, off = got
        if off != len(plain):
            return None
        sw = w * nch
        for r, row in enumerate(rows):
            samples[r * sw : (r + 1) * sw] = _png_unpack(row, sw, bit)
    else:  # Adam7
        off = 0
        for xs, ys, xstep, ystep in _ADAM7:
            pw = (w - xs + xstep - 1) // xstep if w > xs else 0
            ph = (h - ys + ystep - 1) // ystep if h > ys else 0
            got = _png_unfilter(plain, off, pw, ph, nch, bit)
            if got is None:
                return None
            rows, off = got
            for ri, row in enumerate(rows):
                srow = _png_unpack(row, pw * nch, bit)
                y = ys + ri * ystep
                for ci in range(pw):
                    o = (y * w + xs + ci * xstep) * nch
                    samples[o : o + nch] = srow[ci * nch : (ci + 1) * nch]
        if off != len(plain):
            return None

    if ct == 3:
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = np.frombuffer(bytes(samples), dtype=np.uint8)
        if int(idx.max(initial=0)) >= pal.shape[0]:
            return None
        return w, h, pal[idx].tobytes(), 3
    if ct == 0 and bit < 8:
        # expand sub-byte gray to full range: v * 255 / (2^bit - 1)
        mask = (1 << bit) - 1
        table = bytes((v * 255) // mask if v <= mask else 0 for v in range(256))
        return w, h, bytes(samples).translate(table), 1
    return w, h, bytes(samples), nch


_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]  # T.81 Figure A.6 coefficient zig-zag order


class _BitReader:
    """MSB-first bit reader over already-unstuffed entropy bytes."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes):
        self.data, self.pos, self.bit = data, 0, 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise EOFError
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit, self.pos = 0, self.pos + 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _huff_decode(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | reader.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid huffman code")


def _extend(v: int, size: int) -> int:
    """T.81 F.12 EXTEND: map a `size`-bit magnitude to its signed value."""
    return v - (1 << size) + 1 if size and v < (1 << (size - 1)) else v


def _jpeg_entropy_segments(raw: bytes, i: int) -> tuple[list[bytes], int]:
    """Split entropy-coded data starting at ``i`` on restart markers,
    unstuffing 0xFF00. Returns (segments, index of the terminating 0xFF
    of the next header marker / EOI)."""
    segments: list[bytes] = []
    cur = bytearray()
    j = i
    while j < len(raw):
        b = raw[j]
        if b == 0xFF:
            nxt = raw[j + 1] if j + 1 < len(raw) else 0xD9
            if nxt == 0x00:
                cur.append(0xFF)
                j += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                segments.append(bytes(cur))
                cur = bytearray()
                j += 2
                continue
            break  # EOI or next header marker ends the scan
        cur.append(b)
        j += 1
    segments.append(bytes(cur))
    return segments, j


def _jpeg_finish(comps, planes, w, h, hmax, vmax) -> tuple[int, int, bytes, int]:
    """Shared JPEG tail: vectorized 2-D IDCT over dequantized coefficient
    planes, chroma upsample to full MCU resolution, JFIF YCbCr->RGB.
    Used by both the baseline and the progressive decoder."""
    import numpy as np

    # spatial = A^T @ C @ A, A[u, x] = 0.5 * c(u) * cos((2x + 1) u pi / 16)
    xs = np.arange(8)
    A = 0.5 * np.cos((2 * xs[None, :] + 1) * xs[:, None] * np.pi / 16)
    A[0] *= 1 / np.sqrt(2)
    out_planes = []
    for ci, (_, ch, cv, _) in enumerate(comps):
        p = planes[ci]
        by, bx = p.shape[0] // 8, p.shape[1] // 8
        blocks = p.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
        spatial = np.einsum("ux,nmuv,vy->nmxy", A, blocks, A)
        plane = spatial.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8) + 128.0
        plane = np.repeat(np.repeat(plane, vmax // cv, 0), hmax // ch, 1)
        out_planes.append(plane[:h, :w])

    if len(comps) == 1:
        gray = np.clip(np.rint(out_planes[0]), 0, 255).astype(np.uint8)
        return int(w), int(h), gray.tobytes(), 1
    if len(comps) != 3:
        return None
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.clip(np.rint(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)
    return int(w), int(h), rgb.tobytes(), 3


def _jpeg_decode(raw: bytes) -> Optional[tuple[int, int, bytes, int]]:
    """REAL baseline JPEG decode (ITU-T T.81 sequential DCT, SOF0) with
    stdlib + numpy only: marker walk, canonical Huffman entropy decode,
    dequantize, vectorized 2-D IDCT, chroma upsample, JFIF YCbCr->RGB.
    Handles 1- and 3-component scans, any h/v subsampling (4:4:4, 4:2:2,
    4:2:0, ...), 16-bit quant tables, and restart markers. Progressive
    (SOF2) streams dispatch to ``_jpeg_prog_decode``; arithmetic-coded
    and 12-bit payloads return None (PIL gate or digest stub). Returns
    (width, height, raster_bytes, n_channels), the same shape
    ``decode_raster`` yields."""
    import numpy as np

    if len(raw) < 4 or raw[:2] != b"\xff\xd8":
        return None
    try:
        qt: dict[int, "np.ndarray"] = {}
        huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
        comps: list[tuple[int, int, int, int]] = []  # (id, h, v, tq)
        w = h = None
        restart = 0
        scan: list[tuple[int, int, int]] = []  # (comp_idx, td, ta)
        i = 2
        while i + 4 <= len(raw):
            if raw[i] != 0xFF:
                return None
            marker = raw[i + 1]
            if marker == 0xD9:  # EOI before any scan
                return None
            (seglen,) = struct.unpack(">H", raw[i + 2 : i + 4])
            seg = raw[i + 4 : i + 2 + seglen]
            if marker == 0xC2:  # progressive DCT: its own multi-scan walk
                return _jpeg_prog_decode(raw)
            if marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                          0xCB, 0xCD, 0xCE, 0xCF):
                return None  # non-baseline SOF / arithmetic coding
            if marker == 0xDB:  # DQT
                j = 0
                while j < len(seg):
                    pq, tq = seg[j] >> 4, seg[j] & 0xF
                    j += 1
                    n = 64 * (2 if pq else 1)
                    vals = (
                        np.frombuffer(seg[j : j + n], dtype=">u2").astype(np.int32)
                        if pq
                        else np.frombuffer(seg[j : j + 64], dtype=np.uint8).astype(np.int32)
                    )
                    tbl = np.zeros(64, dtype=np.int32)
                    tbl[_ZIGZAG] = vals
                    qt[tq] = tbl.reshape(8, 8)
                    j += n
            elif marker == 0xC4:  # DHT
                j = 0
                while j < len(seg):
                    tc, th = seg[j] >> 4, seg[j] & 0xF
                    counts = seg[j + 1 : j + 17]
                    j += 17
                    table: dict[tuple[int, int], int] = {}
                    code = 0
                    for length in range(1, 17):
                        for _ in range(counts[length - 1]):
                            table[(length, code)] = seg[j]
                            code += 1
                            j += 1
                        code <<= 1
                    huff[(tc, th)] = table
            elif marker == 0xC0:  # SOF0 baseline
                if seg[0] != 8:
                    return None  # 12-bit precision
                h, w = struct.unpack(">HH", seg[1:5])
                ncomp = seg[5]
                comps = [
                    (seg[6 + 3 * c], seg[7 + 3 * c] >> 4, seg[7 + 3 * c] & 0xF,
                     seg[8 + 3 * c])
                    for c in range(ncomp)
                ]
            elif marker == 0xDD:  # DRI
                (restart,) = struct.unpack(">H", seg[:2])
            elif marker == 0xDA:  # SOS
                ns = seg[0]
                for c in range(ns):
                    cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                    idx = next(k for k, cm in enumerate(comps) if cm[0] == cid)
                    scan.append((idx, tt >> 4, tt & 0xF))
                i += 2 + seglen
                break
            i += 2 + seglen
        if w is None or not scan or len(scan) != len(comps):
            return None

        segments, _ = _jpeg_entropy_segments(raw, i)

        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        mcux = -(-w // (8 * hmax))
        mcuy = -(-h // (8 * vmax))
        # Per-component dequantized coefficient planes, in 8x8 block grid.
        planes = [
            np.zeros((mcuy * cv * 8, mcux * ch * 8), dtype=np.float64)
            for _, ch, cv, _ in comps
        ]

        n_mcu = mcux * mcuy
        per_seg = restart if restart else n_mcu
        mcu = 0
        for seg_bytes in segments:
            if mcu >= n_mcu:
                break
            reader = _BitReader(seg_bytes)
            pred = [0] * len(comps)
            for _ in range(min(per_seg, n_mcu - mcu)):
                my, mx = divmod(mcu, mcux)
                for ci, td, ta in scan:
                    _, ch, cv, tq = comps[ci]
                    q = qt[tq]
                    dc_tab, ac_tab = huff[(0, td)], huff[(1, ta)]
                    for by in range(cv):
                        for bx in range(ch):
                            blk = np.zeros(64, dtype=np.float64)
                            s = _huff_decode(reader, dc_tab)
                            pred[ci] += _extend(reader.read_bits(s), s)
                            blk[0] = pred[ci]
                            k = 1
                            while k < 64:
                                rs = _huff_decode(reader, ac_tab)
                                r, s = rs >> 4, rs & 0xF
                                if s == 0:
                                    if r != 15:
                                        break  # EOB
                                    k += 16  # ZRL
                                    continue
                                k += r
                                blk[_ZIGZAG[k]] = _extend(reader.read_bits(s), s)
                                k += 1
                            y0 = (my * cv + by) * 8
                            x0 = (mx * ch + bx) * 8
                            planes[ci][y0 : y0 + 8, x0 : x0 + 8] = (
                                blk.reshape(8, 8) * q
                            )
                mcu += 1

        return _jpeg_finish(comps, planes, w, h, hmax, vmax)
    except Exception:
        return None


def _jpeg_prog_decode(raw: bytes) -> Optional[tuple[int, int, bytes, int]]:
    """REAL progressive JPEG decode (ITU-T T.81 SOF2: spectral selection
    + successive approximation) with stdlib + numpy only. Multi-scan
    marker walk accumulating per-component coefficient arrays in zigzag
    order: DC-first scans (interleaved or single-component, point
    transform ``<< Al``), DC-refinement bit scans, AC-first band scans
    with EOBn run coding, and AC-refinement scans (T.81 G.1.2.3
    correction bits), all with restart-marker support; then one
    dequantize + the shared ``_jpeg_finish`` IDCT/upsample/YCbCr tail.
    Arithmetic-coded (SOF10) and 12-bit payloads never reach here
    (rejected by ``_jpeg_decode``'s marker walk)."""
    import numpy as np

    if len(raw) < 4 or raw[:2] != b"\xff\xd8":
        return None
    try:
        qt: dict[int, "np.ndarray"] = {}
        huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
        comps: list[tuple[int, int, int, int]] = []  # (id, h, v, tq)
        coef: list["np.ndarray"] = []  # (nby, nbx, 64) int32, zigzag order
        w = h = None
        hmax = vmax = mcux = mcuy = 0
        restart = 0
        i = 2
        while i + 2 <= len(raw):
            if raw[i] != 0xFF:
                return None
            marker = raw[i + 1]
            if marker == 0xD9:  # EOI
                break
            if 0xD0 <= marker <= 0xD7:  # stray RST between scans
                i += 2
                continue
            (seglen,) = struct.unpack(">H", raw[i + 2 : i + 4])
            seg = raw[i + 4 : i + 2 + seglen]
            if marker == 0xDB:  # DQT
                j = 0
                while j < len(seg):
                    pq, tq = seg[j] >> 4, seg[j] & 0xF
                    j += 1
                    n = 64 * (2 if pq else 1)
                    vals = (
                        np.frombuffer(seg[j : j + n], dtype=">u2").astype(np.int32)
                        if pq
                        else np.frombuffer(seg[j : j + 64], dtype=np.uint8).astype(np.int32)
                    )
                    tbl = np.zeros(64, dtype=np.int32)
                    tbl[_ZIGZAG] = vals
                    qt[tq] = tbl
                    j += n
            elif marker == 0xC4:  # DHT (may be redefined between scans)
                j = 0
                while j < len(seg):
                    tc, th = seg[j] >> 4, seg[j] & 0xF
                    counts = seg[j + 1 : j + 17]
                    j += 17
                    table: dict[tuple[int, int], int] = {}
                    code = 0
                    for length in range(1, 17):
                        for _ in range(counts[length - 1]):
                            table[(length, code)] = seg[j]
                            code += 1
                            j += 1
                        code <<= 1
                    huff[(tc, th)] = table
            elif marker == 0xC2:  # SOF2
                if seg[0] != 8:
                    return None  # 12-bit precision
                h, w = struct.unpack(">HH", seg[1:5])
                ncomp = seg[5]
                comps = [
                    (seg[6 + 3 * c], seg[7 + 3 * c] >> 4, seg[7 + 3 * c] & 0xF,
                     seg[8 + 3 * c])
                    for c in range(ncomp)
                ]
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                mcux = -(-w // (8 * hmax))
                mcuy = -(-h // (8 * vmax))
                coef = [
                    np.zeros((mcuy * cv, mcux * ch, 64), dtype=np.int32)
                    for _, ch, cv, _ in comps
                ]
            elif marker == 0xDD:  # DRI
                (restart,) = struct.unpack(">H", seg[:2])
            elif marker == 0xDA:  # SOS: one of possibly many scans
                if not comps:
                    return None
                ns = seg[0]
                scomps: list[tuple[int, int, int]] = []
                for c in range(ns):
                    cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                    idx = next(k for k, cm in enumerate(comps) if cm[0] == cid)
                    scomps.append((idx, tt >> 4, tt & 0xF))
                ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
                ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 0xF
                # T.81 B.2.3 progressive scan-header legality: a DC scan
                # is exactly the 0..0 band; AC scans are single-component
                if (ss == 0) != (se == 0) or se > 63 or (ss > 0 and ns != 1):
                    return None
                segments, i = _jpeg_entropy_segments(raw, i + 2 + seglen)
                _jpeg_prog_scan(
                    coef, comps, scomps, ss, se, ah, al, segments, restart,
                    mcux, mcuy, hmax, vmax, w, h, huff,
                )
                continue  # i already points at the terminating marker
            i += 2 + seglen
        if w is None or not coef:
            return None

        # Dequantize (zigzag -> natural order) and lay out 8x8 blocks the
        # way the shared IDCT tail expects.
        planes = []
        for ci, (_, ch, cv, tq) in enumerate(comps):
            c = coef[ci]
            nby, nbx = c.shape[0], c.shape[1]
            nat = np.zeros((nby, nbx, 64), dtype=np.float64)
            nat[:, :, _ZIGZAG] = c
            deq = nat * qt[tq][None, None, :].astype(np.float64)
            planes.append(
                deq.reshape(nby, nbx, 8, 8).transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
            )
        return _jpeg_finish(comps, planes, w, h, hmax, vmax)
    except Exception:
        return None


def _jpeg_prog_scan(
    coef, comps, scomps, ss, se, ah, al, segments, restart,
    mcux, mcuy, hmax, vmax, w, h, huff,
) -> None:
    """Decode one progressive scan into the zigzag-order coefficient
    arrays. DC scans (ss == 0) may interleave several components in MCU
    order; AC scans are single-component in row-major block order over
    that component's own block grid (T.81 A.2.2). Restart intervals
    count MCUs (interleaved) or data units (single-component); each
    restart segment resets the DC predictors and the EOB run."""
    p1 = 1 << al
    interleaved = len(scomps) > 1

    def block_grid(ch: int, cv: int) -> tuple[int, int]:
        # single-component data-unit grid: ceil(ceil(w*ch/hmax)/8) etc.
        cw, chh = -(-(w * ch) // hmax), -(-(h * cv) // vmax)
        return -(-cw // 8), -(-chh // 8)

    if ss == 0:
        # ---- DC scan (first pass: Huffman diffs << al; refine: 1 bit) --
        if interleaved:
            n_units = mcux * mcuy
        else:
            ci0, _, _ = scomps[0]
            _, ch0, cv0, _ = comps[ci0]
            bw, bh = block_grid(ch0, cv0)
            n_units = bw * bh
        per_seg = restart if restart else n_units
        unit = 0
        for seg_bytes in segments:
            if unit >= n_units:
                break
            reader = _BitReader(seg_bytes)
            pred = [0] * len(comps)
            for _ in range(min(per_seg, n_units - unit)):
                if interleaved:
                    my, mx = divmod(unit, mcux)
                    for ci, td, _ in scomps:
                        _, ch, cv, _ = comps[ci]
                        for by in range(cv):
                            for bx in range(ch):
                                blk = coef[ci][my * cv + by, mx * ch + bx]
                                if ah == 0:
                                    s = _huff_decode(reader, huff[(0, td)])
                                    pred[ci] += _extend(reader.read_bits(s), s)
                                    blk[0] = pred[ci] << al
                                elif reader.read_bit():
                                    blk[0] = int(blk[0]) | p1
                else:
                    ci, td, _ = scomps[0]
                    by, bx = divmod(unit, bw)
                    blk = coef[ci][by, bx]
                    if ah == 0:
                        s = _huff_decode(reader, huff[(0, td)])
                        pred[ci] += _extend(reader.read_bits(s), s)
                        blk[0] = pred[ci] << al
                    elif reader.read_bit():
                        blk[0] = int(blk[0]) | p1
                unit += 1
        return

    # ---- AC scan: single component only (T.81 B.2.3) -------------------
    ci, _, ta = scomps[0]
    _, ch, cv, _ = comps[ci]
    ac_tab = huff[(1, ta)]
    bw, bh = block_grid(ch, cv)
    n_units = bw * bh
    per_seg = restart if restart else n_units
    unit = 0
    for seg_bytes in segments:
        if unit >= n_units:
            break
        reader = _BitReader(seg_bytes)
        eobrun = 0
        for _ in range(min(per_seg, n_units - unit)):
            by, bx = divmod(unit, bw)
            blk = coef[ci][by, bx]
            if ah == 0:
                eobrun = _prog_ac_first(reader, ac_tab, blk, ss, se, al, eobrun)
            else:
                eobrun = _prog_ac_refine(reader, ac_tab, blk, ss, se, al, eobrun)
            unit += 1


def _prog_ac_first(reader, ac_tab, blk, ss, se, al, eobrun) -> int:
    """First AC pass for one block: run/size coefficients scaled by
    2^al, EOBn codes spanning blocks. Returns the remaining EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huff_decode(reader, ac_tab)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r != 15:
                eob = (1 << r) - 1  # this block is a member of the run
                if r:
                    eob += reader.read_bits(r)
                return eob
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            break
        blk[k] = _extend(reader.read_bits(s), s) << al
        k += 1
    return 0


def _prog_ac_refine(reader, ac_tab, blk, ss, se, al, eobrun) -> int:
    """AC refinement pass for one block (T.81 G.1.2.3): newly nonzero
    coefficients arrive as run/1 symbols whose runs count zero-history
    positions only; every already-nonzero coefficient passed over reads
    one correction bit. Returns the remaining EOB run."""
    p1, m1 = 1 << al, -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _huff_decode(reader, ac_tab)
            r, s = rs >> 4, rs & 0xF
            val = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read_bits(r)
                    break
                # r == 15 (ZRL): pass 16 zero-history positions
            else:
                val = p1 if reader.read_bit() else m1
            while k <= se:
                v = int(blk[k])
                if v != 0:
                    if reader.read_bit() and not (v & p1):
                        blk[k] = v + (p1 if v >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                blk[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            v = int(blk[k])
            if v != 0 and reader.read_bit() and not (v & p1):
                blk[k] = v + (p1 if v >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _gif_decode(raw: bytes) -> Optional[tuple[int, int, bytes, int]]:
    """REAL stdlib GIF raster decode (GIF87a/89a): variable-width LZW
    over the first image frame, palette lookup (local table wins over
    global), 4-pass deinterlace. Later frames of an animation, and
    frames smaller than the logical screen, are out of scope (first
    frame rendered at its own size). Returns (width, height, rgb_bytes,
    3), the same shape ``decode_raster`` yields."""
    if len(raw) < 13 or raw[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    try:
        flags = raw[10]
        i = 13
        gct = None
        if flags & 0x80:
            n = 2 << (flags & 0x07)
            gct = raw[i : i + 3 * n]
            i += 3 * n
        while i < len(raw):
            b = raw[i]
            if b == 0x21:  # extension: label + sub-blocks
                i += 2
                while i < len(raw) and raw[i]:
                    i += 1 + raw[i]
                i += 1
            elif b == 0x2C:  # image descriptor
                w, h = struct.unpack("<HH", raw[i + 5 : i + 9])
                iflags = raw[i + 9]
                i += 10
                pal = gct
                if iflags & 0x80:
                    n = 2 << (iflags & 0x07)
                    pal = raw[i : i + 3 * n]
                    i += 3 * n
                if pal is None or not w or not h:
                    return None
                min_code = raw[i]
                i += 1
                data = bytearray()
                while i < len(raw) and raw[i]:
                    sz = raw[i]
                    data += raw[i + 1 : i + 1 + sz]
                    i += 1 + sz
                idx = _lzw_decode(bytes(data), min_code, w * h)
                if idx is None or len(idx) < w * h:
                    return None
                if iflags & 0x40:  # deinterlace: 4 passes over rows
                    order = (
                        list(range(0, h, 8)) + list(range(4, h, 8))
                        + list(range(2, h, 4)) + list(range(1, h, 2))
                    )
                    rows = [None] * h
                    for src_r, dst_r in enumerate(order):
                        rows[dst_r] = idx[src_r * w : (src_r + 1) * w]
                    idx = b"".join(rows)
                np_max = len(pal) // 3
                out = bytearray(w * h * 3)
                for p in range(w * h):
                    c = idx[p]
                    if c >= np_max:
                        return None
                    out[3 * p : 3 * p + 3] = pal[3 * c : 3 * c + 3]
                return int(w), int(h), bytes(out), 3
            elif b == 0x3B:  # trailer
                return None
            else:
                return None
    except Exception:
        return None
    return None


def _gif_frames(raw: bytes, max_frames: int = 1) -> tuple[list[tuple[int, int, bytes, int]], float]:
    """REAL animated-GIF frame extraction (GIF87a/89a): every frame is
    composited onto the logical-screen canvas with full GIF89a animation
    semantics — frame rects at (x, y) offsets, per-frame transparency
    index, and disposal methods 1 (keep), 2 (restore to background) and
    3 (restore to previous). Returns (frames, duration_s): up to
    ``max_frames`` full-canvas (w, h, rgb_bytes, 3) rasters in display
    order, plus the animation's total delay summed over ALL graphic
    control extensions (the remaining frames are scanned for timing
    without paying their LZW decode). This is the engine's video-frame
    path for the one animation format stdlib can fully decode."""
    if len(raw) < 13 or raw[:6] not in (b"GIF87a", b"GIF89a"):
        return [], 0.0
    frames: list[tuple[int, int, bytes, int]] = []
    total_delay = 0.0
    try:
        cw, ch = struct.unpack("<HH", raw[6:10])
        flags = raw[10]
        bg_idx = raw[11]
        i = 13
        gct = None
        if flags & 0x80:
            n = 2 << (flags & 0x07)
            gct = raw[i : i + 3 * n]
            i += 3 * n
        if not cw or not ch:
            return [], 0.0
        bg = (
            bytes(gct[bg_idx * 3 : bg_idx * 3 + 3])
            if gct is not None and bg_idx * 3 + 3 <= len(gct)
            else b"\x00\x00\x00"
        )
        canvas = bytearray(bg * (cw * ch))
        disposal, trans_idx = 0, None
        while i < len(raw):
            b = raw[i]
            if b == 0x21:  # extension
                label = raw[i + 1]
                i += 2
                if label == 0xF9 and i < len(raw) and raw[i] >= 4:
                    blk = raw[i + 1 : i + 1 + raw[i]]
                    disposal = (blk[0] >> 2) & 0x7
                    total_delay += struct.unpack("<H", blk[1:3])[0] / 100.0
                    trans_idx = blk[3] if blk[0] & 1 else None
                while i < len(raw) and raw[i]:
                    i += 1 + raw[i]
                i += 1
            elif b == 0x2C:  # image descriptor
                x, y, w, h = struct.unpack("<HHHH", raw[i + 1 : i + 9])
                iflags = raw[i + 9]
                i += 10
                pal = gct
                if iflags & 0x80:
                    n = 2 << (iflags & 0x07)
                    pal = raw[i : i + 3 * n]
                    i += 3 * n
                min_code = raw[i]
                i += 1
                data = bytearray()
                while i < len(raw) and raw[i]:
                    sz = raw[i]
                    data += raw[i + 1 : i + 1 + sz]
                    i += 1 + sz
                i += 1  # block terminator
                if len(frames) >= max_frames:
                    disposal, trans_idx = 0, None
                    continue  # timing-only scan from here on
                if pal is None or not w or not h:
                    return frames, total_delay
                idx = _lzw_decode(bytes(data), min_code, w * h)
                if idx is None or len(idx) < w * h:
                    return frames, total_delay
                if iflags & 0x40:  # deinterlace
                    order = (
                        list(range(0, h, 8)) + list(range(4, h, 8))
                        + list(range(2, h, 4)) + list(range(1, h, 2))
                    )
                    rows: list = [None] * h
                    for src_r, dst_r in enumerate(order):
                        rows[dst_r] = idx[src_r * w : (src_r + 1) * w]
                    idx = b"".join(rows)
                prev = bytes(canvas) if disposal == 3 else None
                np_max = len(pal) // 3
                for ry in range(min(h, ch - y if y < ch else 0)):
                    cy = y + ry
                    row = ry * w
                    o = (cy * cw + x) * 3
                    for rx in range(min(w, cw - x if x < cw else 0)):
                        c = idx[row + rx]
                        if c != trans_idx:
                            if c >= np_max:
                                return frames, total_delay
                            canvas[o + rx * 3 : o + rx * 3 + 3] = pal[3 * c : 3 * c + 3]
                frames.append((int(cw), int(ch), bytes(canvas), 3))
                if disposal == 2:  # restore frame rect to background
                    for ry in range(min(h, ch - y if y < ch else 0)):
                        o = ((y + ry) * cw + x) * 3
                        n_px = min(w, cw - x if x < cw else 0)
                        canvas[o : o + n_px * 3] = bg * n_px
                elif disposal == 3 and prev is not None:
                    canvas = bytearray(prev)
                disposal, trans_idx = 0, None
            elif b == 0x3B:  # trailer
                break
            else:
                break
    except Exception:
        pass
    return frames, total_delay


def _lzw_decode(data: bytes, min_code: int, limit: int) -> Optional[bytes]:
    """GIF variable-width LZW: clear/EOI codes, dictionary to 4096
    entries, code width grows at dictionary size boundaries."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1

    def fresh():
        return {c: bytes([c]) for c in range(clear)}

    table = fresh()
    width = min_code + 1
    next_code = eoi + 1
    out = bytearray()
    prev = None
    acc = bits = 0
    for byte in data:
        acc |= byte << bits
        bits += 8
        while bits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            bits -= width
            if code == clear:
                table, width, next_code, prev = fresh(), min_code + 1, eoi + 1, None
                continue
            if code == eoi:
                return bytes(out)
            if prev is None:
                entry = table.get(code)
                if entry is None:
                    return None
            elif code in table:
                entry = table[code]
                table[next_code] = prev + entry[:1]
                next_code += 1
            elif code == next_code:  # KwKwK case
                entry = prev + prev[:1]
                table[next_code] = entry
                next_code += 1
            else:
                return None
            if next_code == (1 << width) and width < 12:
                width += 1
            out += entry
            prev = entry
            if len(out) >= limit:
                return bytes(out)
    return bytes(out)


# ---------------------------------------------------------------------------
# WEBP lossless (VP8L) — REAL stdlib decode.
#
# Full "WebP Lossless Bitstream Specification" coverage: canonical prefix
# codes (simple 1-2-symbol and code-length-coded forms), meta prefix
# groups via the entropy image, LZ77 backward references with the 120-code
# close-neighbor distance map, the color cache, and all four transforms
# (predictor with its 14 modes, cross-color, subtract-green, and color
# indexing with sub-byte pixel bundling). Lossy VP8 (boolean arithmetic
# coder + loop filter) stays PIL-gated/digest-stubbed.
# ---------------------------------------------------------------------------

_VP8L_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

# (xoffset, yoffset) for distance codes 1..120 (spec's close-neighbor map)
_VP8L_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
)


class _LsbReader:
    """LSB-first bit reader (VP8L field order; prefix-code bits are read
    one at a time, first-read bit = MSB of the canonical code)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def bit(self) -> int:
        p = self.pos
        if (p >> 3) >= len(self.data):
            raise ValueError("vp8l: out of bits")
        self.pos = p + 1
        return (self.data[p >> 3] >> (p & 7)) & 1

    def bits(self, n: int) -> int:
        v = 0
        for i in range(n):
            v |= self.bit() << i
        return v


def _vp8l_canonical(lengths: list[int]):
    """Canonical prefix table: {(length, code): symbol} (DEFLATE-style
    assignment: shorter first, then symbol order). A 0/1-used-symbol code
    is returned as ('const', symbol) — read with zero bits."""
    used = [(l, s) for s, l in enumerate(lengths) if l > 0]
    if not used:
        return ("const", 0)
    if len(used) == 1:
        return ("const", used[0][1])
    used.sort()
    table: dict[tuple[int, int], int] = {}
    code = 0
    prev_len = used[0][0]
    for l, s in used:
        code <<= l - prev_len
        prev_len = l
        table[(l, code)] = s
        code += 1
    if code != (1 << prev_len):
        raise ValueError("vp8l: incomplete prefix code")
    return table


def _vp8l_read_sym(r: _LsbReader, table) -> int:
    if isinstance(table, tuple):  # ('const', sym)
        return table[1]
    acc = 0
    for length in range(1, 16):
        acc = (acc << 1) | r.bit()
        s = table.get((length, acc))
        if s is not None:
            return s
    raise ValueError("vp8l: bad prefix code")


def _vp8l_read_code(r: _LsbReader, alphabet_size: int):
    """One prefix code: the simple (1-2 symbol) form or the normal form
    whose symbol lengths are themselves prefix-coded (19-symbol
    code-length alphabet, order _VP8L_CLC_ORDER, repeats 16/17/18)."""
    if r.bit():  # simple
        num_symbols = r.bit() + 1
        sym0 = r.bits(8) if r.bit() else r.bit()
        if num_symbols == 1:
            return ("const", sym0)
        sym1 = r.bits(8)
        # 1-bit code in transmission order: first-read 0 -> sym0
        return {(1, 0): sym0, (1, 1): sym1}
    num_clc = 4 + r.bits(4)
    clc_len = [0] * 19
    for i in range(num_clc):
        clc_len[_VP8L_CLC_ORDER[i]] = r.bits(3)
    clc = _vp8l_canonical(clc_len)
    if r.bit():  # explicit cap on how many length symbols are coded
        length_nbits = 2 + 2 * r.bits(3)
        max_symbol = 2 + r.bits(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_len = 8  # spec's default repeat-16 seed
    symbol = 0
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code = _vp8l_read_sym(r, clc)
        if code < 16:
            lengths[symbol] = code
            symbol += 1
            if code:
                prev_len = code
        elif code == 16:
            rep, fill = 3 + r.bits(2), prev_len
        elif code == 17:
            rep, fill = 3 + r.bits(3), 0
        else:
            rep, fill = 11 + r.bits(7), 0
        if code >= 16:
            for _ in range(rep):
                if symbol >= alphabet_size:
                    raise ValueError("vp8l: repeat overflows alphabet")
                lengths[symbol] = fill
                symbol += 1
    return _vp8l_canonical(lengths)


def _vp8l_prefix_value(code: int, r: _LsbReader) -> int:
    """LZ77 length / distance prefix decode (spec 'prefix coding')."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + r.bits(extra) + 1


def _vp8l_image(r: _LsbReader, w: int, h: int, is_level0: bool):
    """decode_image_stream: returns (list of ARGB uint32 of len w*h at
    the CODED width, transforms list [(type, data..., w_at_read)], coded
    width). Transforms are only present at level 0."""
    transforms = []
    seen = set()
    cur_w = w
    if is_level0:
        while r.bit():
            ttype = r.bits(2)
            if ttype in seen:
                raise ValueError("vp8l: duplicate transform")
            seen.add(ttype)
            if ttype in (0, 1):  # PREDICTOR / COLOR
                size_bits = r.bits(3) + 2
                bw = (cur_w + (1 << size_bits) - 1) >> size_bits
                bh = (h + (1 << size_bits) - 1) >> size_bits
                sub, _, _ = _vp8l_image(r, bw, bh, False)
                transforms.append((ttype, size_bits, sub, cur_w))
            elif ttype == 2:  # SUBTRACT_GREEN
                transforms.append((2, None, None, cur_w))
            else:  # COLOR_INDEXING
                n_colors = r.bits(8) + 1
                pal, _, _ = _vp8l_image(r, n_colors, 1, False)
                for i in range(1, n_colors):  # palette stored as deltas
                    pal[i] = (
                        ((pal[i] & 0xFF00FF00) + (pal[i - 1] & 0xFF00FF00))
                        & 0xFF00FF00
                    ) | (
                        ((pal[i] & 0x00FF00FF) + (pal[i - 1] & 0x00FF00FF))
                        & 0x00FF00FF
                    )
                if n_colors <= 2:
                    width_bits = 3
                elif n_colors <= 4:
                    width_bits = 2
                elif n_colors <= 16:
                    width_bits = 1
                else:
                    width_bits = 0
                transforms.append((3, width_bits, pal, cur_w))
                if width_bits:
                    cur_w = (cur_w + (1 << width_bits) - 1) >> width_bits

    cache_bits = r.bits(4) if r.bit() else 0
    if cache_bits > 11:
        raise ValueError("vp8l: bad color cache size")
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [0] * cache_size

    meta = None
    meta_bits = 0
    n_groups = 1
    if is_level0 and r.bit():  # meta prefix codes via the entropy image
        meta_bits = r.bits(3) + 2
        mw = (cur_w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta, _, _ = _vp8l_image(r, mw, mh, False)
        n_groups = max(((p >> 8) & 0xFFFF) for p in meta) + 1

    green_size = 256 + 24 + cache_size
    groups = [
        (
            _vp8l_read_code(r, green_size),
            _vp8l_read_code(r, 256),
            _vp8l_read_code(r, 256),
            _vp8l_read_code(r, 256),
            _vp8l_read_code(r, 40),
        )
        for _ in range(n_groups)
    ]

    n = cur_w * h
    out: list[int] = [0] * n
    pos = 0
    mw = ((cur_w + (1 << meta_bits) - 1) >> meta_bits) if meta is not None else 0
    while pos < n:
        if meta is not None:
            x, y = pos % cur_w, pos // cur_w
            mp = meta[(y >> meta_bits) * mw + (x >> meta_bits)]
            grp = groups[(mp >> 8) & 0xFFFF]
        else:
            grp = groups[0]
        g_code, r_code, b_code, a_code, d_code = grp
        s = _vp8l_read_sym(r, g_code)
        if s < 256:  # literal: G then R, B, A
            red = _vp8l_read_sym(r, r_code)
            blue = _vp8l_read_sym(r, b_code)
            alpha = _vp8l_read_sym(r, a_code)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[pos] = px
            pos += 1
            if cache_size:
                cache[((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - cache_bits)] = px
        elif s < 280:  # LZ77 backward reference
            length = _vp8l_prefix_value(s - 256, r)
            dcode = _vp8l_prefix_value(_vp8l_read_sym(r, d_code), r)
            if dcode > 120:
                dist = dcode - 120
            else:
                dx, dy = _VP8L_DIST_MAP[dcode - 1]
                dist = max(1, dy * cur_w + dx)
            if dist > pos or pos + length > n:
                raise ValueError("vp8l: bad backward reference")
            for _ in range(length):
                px = out[pos - dist]
                out[pos] = px
                pos += 1
                if cache_size:
                    cache[((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - cache_bits)] = px
        else:  # color cache hit
            if not cache_size:
                raise ValueError("vp8l: cache symbol without cache")
            out[pos] = cache[s - 280]
            pos += 1
    return out, transforms, cur_w


def _vp8l_avg2(a: int, b: int) -> int:
    return (((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)


def _vp8l_clamp_add_sub_full(a: int, b: int, c: int) -> int:
    out = 0
    for sh in (0, 8, 16, 24):
        v = ((a >> sh) & 0xFF) + ((b >> sh) & 0xFF) - ((c >> sh) & 0xFF)
        out |= max(0, min(255, v)) << sh
    return out


def _vp8l_clamp_add_sub_half(ab: int, c: int) -> int:
    out = 0
    for sh in (0, 8, 16, 24):
        a = (ab >> sh) & 0xFF
        d = a - ((c >> sh) & 0xFF)
        v = a + (d // 2 if d >= 0 else -((-d) // 2))  # C trunc division
        out |= max(0, min(255, v)) << sh
    return out


def _vp8l_select(left: int, top: int, top_left: int) -> int:
    # Spec (RFC 9649 §4.4.1) / libwebp: ties go to TOP ("if pL < pT
    # return L; else return T"; libwebp: pa_minus_pb <= 0 ? top : left).
    p_l = p_t = 0
    for sh in (0, 8, 16, 24):
        p = ((left >> sh) & 0xFF) + ((top >> sh) & 0xFF) - ((top_left >> sh) & 0xFF)
        p_l += abs(p - ((left >> sh) & 0xFF))
        p_t += abs(p - ((top >> sh) & 0xFF))
    return left if p_l < p_t else top


def _vp8l_predict(mode: int, px, w: int, x: int, y: int) -> int:
    """Predictor modes 0-13 over already-reconstructed neighbors."""
    pos = y * w + x
    if y == 0:  # top row: L mode everywhere, black at the corner
        return 0xFF000000 if x == 0 else px[pos - 1]
    T = px[pos - w]
    if x == 0:  # leftmost column: T mode regardless of the block mode
        return T
    L = px[pos - 1]
    TL = px[pos - w - 1]
    # rightmost column's top-right wraps to the first pixel of this row
    TR = px[pos - w + 1] if x + 1 < w else px[y * w]
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return _vp8l_avg2(_vp8l_avg2(L, TR), T)
    if mode == 6:
        return _vp8l_avg2(L, TL)
    if mode == 7:
        return _vp8l_avg2(L, T)
    if mode == 8:
        return _vp8l_avg2(TL, T)
    if mode == 9:
        return _vp8l_avg2(T, TR)
    if mode == 10:
        return _vp8l_avg2(_vp8l_avg2(L, TL), _vp8l_avg2(T, TR))
    if mode == 11:
        return _vp8l_select(L, T, TL)
    if mode == 12:
        return _vp8l_clamp_add_sub_full(L, T, TL)
    if mode == 13:
        return _vp8l_clamp_add_sub_half(_vp8l_avg2(L, T), TL)
    raise ValueError("vp8l: bad predictor mode")


def _vp8l_delta(t: int, c: int) -> int:
    """Cross-color transform delta: (int8(t) * int8(c)) >> 5."""
    if t >= 128:
        t -= 256
    if c >= 128:
        c -= 256
    return (t * c) >> 5


def _vp8l_inverse_transforms(px: list[int], transforms, w: int, h: int):
    """Apply inverse transforms in reverse read order; returns (pixels,
    width) at full resolution."""
    for ttype, p1, p2, w_at_read in reversed(transforms):
        if ttype == 3:  # COLOR_INDEXING
            width_bits, pal = p1, p2
            if width_bits:
                packed_w = (w_at_read + (1 << width_bits) - 1) >> width_bits
                per = 1 << width_bits  # indices per packed pixel
                ibits = 8 >> width_bits  # bits per index
                mask = (1 << ibits) - 1
                out = [0] * (w_at_read * h)
                for y in range(h):
                    for x in range(w_at_read):
                        packed = px[y * packed_w + (x >> width_bits)]
                        idx = ((packed >> 8) & 0xFF) >> (ibits * (x % per)) & mask
                        out[y * w_at_read + x] = pal[idx] if idx < len(pal) else 0
                px = out
            else:
                px = [pal[(p >> 8) & 0xFF] if ((p >> 8) & 0xFF) < len(pal) else 0 for p in px]
            w = w_at_read
        elif ttype == 2:  # SUBTRACT_GREEN inverse
            for i, p in enumerate(px):
                g = (p >> 8) & 0xFF
                red = (((p >> 16) & 0xFF) + g) & 0xFF
                blue = ((p & 0xFF) + g) & 0xFF
                px[i] = (p & 0xFF00FF00) | (red << 16) | blue
        elif ttype == 1:  # COLOR (cross-color) inverse
            # The image is at this transform's coded width when its
            # inverse runs (w_at_read, NOT the full-resolution w — they
            # differ when COLOR_INDEXING with bundling was read first).
            cw = w_at_read
            size_bits, sub = p1, p2
            bw = (cw + (1 << size_bits) - 1) >> size_bits
            for y in range(h):
                for x in range(cw):
                    cte = sub[(y >> size_bits) * bw + (x >> size_bits)]
                    g2r, g2b, r2b = cte & 0xFF, (cte >> 8) & 0xFF, (cte >> 16) & 0xFF
                    p = px[y * cw + x]
                    g = (p >> 8) & 0xFF
                    red = (((p >> 16) & 0xFF) + _vp8l_delta(g2r, g)) & 0xFF
                    blue = ((p & 0xFF) + _vp8l_delta(g2b, g) + _vp8l_delta(r2b, red)) & 0xFF
                    px[y * cw + x] = (p & 0xFF00FF00) | (red << 16) | blue
        elif ttype == 0:  # PREDICTOR inverse (coded width, see above)
            cw = w_at_read
            size_bits, sub = p1, p2
            bw = (cw + (1 << size_bits) - 1) >> size_bits
            for y in range(h):
                for x in range(cw):
                    mode = (sub[(y >> size_bits) * bw + (x >> size_bits)] >> 8) & 0xFF
                    pred = _vp8l_predict(mode, px, cw, x, y)
                    p = px[y * cw + x]
                    px[y * cw + x] = (
                        (((p >> 24) + (pred >> 24)) & 0xFF) << 24
                        | ((((p >> 16) & 0xFF) + ((pred >> 16) & 0xFF)) & 0xFF) << 16
                        | ((((p >> 8) & 0xFF) + ((pred >> 8) & 0xFF)) & 0xFF) << 8
                        | ((p & 0xFF) + (pred & 0xFF)) & 0xFF
                    )
    return px, w


def _webp_decode(raw: bytes) -> Optional[tuple[int, int, bytes, int]]:
    """REAL stdlib WEBP-lossless decode: walks the RIFF container to the
    VP8L chunk and decodes the full lossless bitstream (prefix codes,
    meta groups, LZ77 + color cache, all four transforms). Returns
    (width, height, rgb(a)_bytes, nch); None for lossy VP8 / malformed
    streams (those stay PIL-gated)."""
    if len(raw) < 12 or raw[:4] != b"RIFF" or raw[8:12] != b"WEBP":
        return None
    try:
        i = 12
        payload = None
        while i + 8 <= len(raw):
            fourcc = raw[i : i + 4]
            size = struct.unpack("<I", raw[i + 4 : i + 8])[0]
            if fourcc == b"VP8L":
                payload = raw[i + 8 : i + 8 + size]
                break
            i += 8 + size + (size & 1)
        if not payload or payload[0] != 0x2F:
            return None
        r = _LsbReader(payload[1:])
        w = r.bits(14) + 1
        h = r.bits(14) + 1
        alpha_used = r.bit()
        if r.bits(3) != 0:  # version must be 0
            return None
        px, transforms, _ = _vp8l_image(r, w, h, True)
        px, w2 = _vp8l_inverse_transforms(px, transforms, w, h)
        if w2 != w or len(px) != w * h:
            return None
        # alpha_is_used is a spec-designated HINT that "should not impact
        # decoding" — emit alpha whenever the hint is set OR the decoded
        # pixels actually carry a non-opaque value, so meaningful alpha
        # with the hint unset is never silently flattened.
        nch = 4 if (alpha_used or any((p >> 24) & 0xFF != 0xFF for p in px)) else 3
        out = bytearray(w * h * nch)
        for i, p in enumerate(px):
            out[i * nch] = (p >> 16) & 0xFF
            out[i * nch + 1] = (p >> 8) & 0xFF
            out[i * nch + 2] = p & 0xFF
            if nch == 4:
                out[i * nch + 3] = (p >> 24) & 0xFF
        return w, h, bytes(out), nch
    except Exception:
        return None


def _decode_image_stub(payload: bytes) -> tuple[int, int, str]:
    """STUB fallback for undecodable payloads: deterministic fake
    (width, height, format) from a stable digest of the bytes. A codec
    deployment replaces this with e.g. PIL.Image.open."""
    d = hashlib.md5(payload or b"").digest()
    return 16 + d[0] % 1024, 16 + d[1] % 1024, ["jpeg", "png", "webp"][d[2] % 3]


def _feature_stub(payload: bytes, dim: int = 8) -> list[float]:
    """STUB: deterministic fake embedding from payload bytes (stands in
    for a vision encoder on compressed rasters)."""
    d = hashlib.sha256(payload or b"").digest()
    return [round(b / 255.0, 6) for b in d[:dim]]


def decode_images(
    df: DataFrame, id_col: str = "media_id", payload_col: str = "payload", feature_dim: int = 8
) -> DataFrame:
    """binary payloads -> typed metadata + feature vector via Arrow-batched
    mapInPandas. Header metadata is REAL for PNG/JPEG/GIF/BMP/PPM; pixel
    features are REAL for uncompressed rasters (PPM/PGM/24-bit BMP),
    8-bit non-interlaced PNG and baseline JPEG (stdlib+numpy decoders) —
    and, when Pillow is installed (runtime feature gate), for the rest of
    the compressed codecs too; digest-stubbed otherwise (marked format
    unchanged)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                hdr = parse_image_header(raw)
                ras = decode_raster(raw)
                if ras is None:
                    ras = _pil_decode(raw)
                if ras is None:
                    ras = _png_decode(raw)
                if ras is None:
                    ras = _jpeg_decode(raw)
                if ras is None:
                    ras = _gif_decode(raw)
                if ras is None:
                    ras = _webp_decode(raw)
                if ras is not None:
                    # Raster dims win over header dims: a GIF first frame
                    # can be smaller than the logical screen, and the
                    # pixel features were computed from the raster.
                    w, h = ras[0], ras[1]
                    fmt = hdr[2] if hdr is not None else "pil"
                elif hdr is not None:
                    w, h, fmt = hdr
                else:
                    w, h, fmt = _decode_image_stub(raw)
                    fmt = fmt + "-stub"
                feat = (
                    _pixel_feature(ras[2], ras[3], feature_dim)
                    if ras is not None
                    else _feature_stub(raw, feature_dim)
                )
                rows.append(
                    {
                        "media_id": int(mid),
                        "width": w,
                        "height": h,
                        "format": fmt,
                        "n_bytes": len(raw),
                        "feature": feat,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_META_SCHEMA.fields])

    return df.select(id_col, payload_col).mapInPandas(batches, IMAGE_META_SCHEMA)


def decode_audio(
    df: DataFrame, id_col: str = "media_id", payload_col: str = "payload", feature_dim: int = 8
) -> DataFrame:
    """binary payloads -> audio metadata + features via mapInPandas.
    REAL for PCM WAV (stdlib ``wave``): channels, sample rate, duration,
    RMS + zero-crossing-rate features over the first second; stubbed for
    compressed audio (mp3/ogg...)."""
    import wave

    def wav_meta(raw: bytes):
        try:
            with wave.open(io.BytesIO(raw)) as wf:
                nch, sw, rate, nframes = (
                    wf.getnchannels(), wf.getsampwidth(), wf.getframerate(), wf.getnframes(),
                )
                frames = wf.readframes(min(nframes, rate))  # first second
        except Exception:
            return None
        dur = nframes / rate if rate else 0.0
        feats = [0.0] * feature_dim
        if sw == 2 and frames:
            vals = struct.unpack(f"<{len(frames) // 2}h", frames)
            mono = vals[::nch] if nch > 1 else vals
            if mono:
                n = len(mono)
                rms = (sum(v * v for v in mono) / n) ** 0.5 / 32768.0
                zcr = sum(
                    1 for a, b2 in zip(mono, mono[1:]) if (a >= 0) != (b2 >= 0)
                ) / max(n - 1, 1)
                peak = max(abs(v) for v in mono) / 32768.0
                mean = sum(mono) / n / 32768.0
                feats = [rms, zcr, peak, mean, nch / 8.0, sw / 4.0, min(rate, 96000) / 96000.0, min(dur, 3600.0) / 3600.0]
                feats = feats[:feature_dim] + [0.0] * max(0, feature_dim - len(feats))
        return nch, rate, dur, [round(float(x), 6) for x in feats]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                meta = wav_meta(raw)
                if meta is not None:
                    nch, rate, dur, feats = meta
                    fmt = "wav"
                else:
                    d = hashlib.md5(raw or b"").digest()
                    nch, rate = 1 + d[0] % 2, [16000, 44100, 48000][d[1] % 3]
                    dur = round(0.5 + d[2] / 16.0, 3)
                    feats = _feature_stub(raw, feature_dim)
                    fmt = "audio-stub"
                rows.append(
                    {
                        "media_id": int(mid),
                        "n_channels": nch,
                        "sample_rate": rate,
                        "duration_s": float(dur),
                        "format": fmt,
                        "n_bytes": len(raw),
                        "feature": feats,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_META_SCHEMA.fields])

    return df.select(id_col, payload_col).mapInPandas(batches, AUDIO_META_SCHEMA)


def _mp4_boxes(b: bytes, start: int, end: int) -> Iterator[tuple[bytes, int, int]]:
    """Yield (type, payload_start, payload_end) for ISO-BMFF boxes in
    b[start:end], handling 64-bit largesize and to-end-of-file boxes."""
    i = start
    while i + 8 <= end:
        (size,) = struct.unpack(">I", b[i : i + 4])
        typ = b[i + 4 : i + 8]
        hdr = 8
        if size == 1:
            if i + 16 > end:
                return
            (size,) = struct.unpack(">Q", b[i + 8 : i + 16])
            hdr = 16
        elif size == 0:
            size = end - i
        if size < hdr or i + size > end:
            return
        yield typ, i + hdr, i + size
        i += size


def parse_video_header(b: bytes) -> Optional[tuple[int, int, float, str]]:
    """REAL container-metadata parse for MP4/MOV (ISO-BMFF box walk:
    ``mvhd`` timescale/duration, ``tkhd`` track dimensions, versions 0
    and 1) and AVI (RIFF ``avih``: frame period, frame count, dims) —
    exact (width, height, duration_s, format) from the actual bytes;
    None when the payload is neither. Frame PIXEL data stays behind the
    codec stub — only the metadata tier is stdlib-decodable."""
    if len(b) >= 12 and b[4:8] == b"ftyp":
        brand = b[8:12]
        fmt = "mov" if brand in (b"qt  ", b"MOOV") else "mp4"
        dur = 0.0
        w = h = 0
        for typ, s, e in _mp4_boxes(b, 0, len(b)):
            if typ != b"moov":
                continue
            for t2, s2, e2 in _mp4_boxes(b, s, e):
                if t2 == b"mvhd" and e2 - s2 >= 20:
                    ver = b[s2]
                    if ver == 1 and e2 - s2 >= 32:
                        (ts,) = struct.unpack(">I", b[s2 + 20 : s2 + 24])
                        (d,) = struct.unpack(">Q", b[s2 + 24 : s2 + 32])
                    else:
                        (ts,) = struct.unpack(">I", b[s2 + 12 : s2 + 16])
                        (d,) = struct.unpack(">I", b[s2 + 16 : s2 + 20])
                    dur = d / ts if ts else 0.0
                elif t2 == b"trak":
                    for t3, s3, e3 in _mp4_boxes(b, s2, e2):
                        if t3 != b"tkhd":
                            continue
                        off = 88 if b[s3] == 1 else 76
                        if e3 - s3 >= off + 8 and not (w or h):
                            tw, th = struct.unpack(
                                ">II", b[s3 + off : s3 + off + 8]
                            )
                            # 16.16 fixed point; audio tracks carry 0x0
                            if tw and th:
                                w, h = tw >> 16, th >> 16
        return w, h, round(dur, 6), fmt
    if len(b) >= 12 and b[:4] == b"RIFF" and b[8:12] == b"AVI ":
        j = b.find(b"avih")
        if j < 0 or j + 48 > len(b):
            return None
        usec_pf, _, _, _, n_frames = struct.unpack("<IIIII", b[j + 8 : j + 28])
        w, h = struct.unpack("<II", b[j + 40 : j + 48])
        dur = usec_pf * n_frames / 1e6
        return w, h, round(dur, 6), "avi"
    return None


def _riff_chunks(b: bytes, start: int, end: int) -> Iterator[tuple[bytes, int, int]]:
    """Iterate RIFF chunks as (fourcc, data_start, data_end); chunks pad
    to even byte boundaries per the RIFF spec."""
    i = start
    while i + 8 <= end:
        cid = b[i : i + 4]
        (sz,) = struct.unpack("<I", b[i + 4 : i + 8])
        yield cid, i + 8, min(i + 8 + sz, end)
        i += 8 + sz + (sz & 1)


def _avi_mjpeg_frames(raw: bytes, max_frames: int = 1) -> list[tuple[int, int, bytes, int]]:
    """REAL stdlib video-frame decode for the one codec our JPEG decoder
    already covers: Motion-JPEG in AVI. Walks the RIFF tree to the
    ``movi`` LIST, takes video stream chunks (``##dc``/``##db``) whose
    payload is a JPEG stream (SOI marker), and runs them through
    ``_jpeg_decode``. Returns up to ``max_frames`` decoded rasters
    (w, h, bytes, nch); empty list when the container holds no
    baseline-decodable JPEG frames (e.g. DHT-less MJPEG variants —
    those fall back to the digest stub)."""
    out: list[tuple[int, int, bytes, int]] = []
    if len(raw) < 12 or raw[:4] != b"RIFF" or raw[8:12] != b"AVI ":
        return out
    for cid, s, e in _riff_chunks(raw, 12, len(raw)):
        if cid != b"LIST" or raw[s : s + 4] != b"movi":
            continue
        for fcc, fs, fe in _riff_chunks(raw, s + 4, e):
            if fcc[2:4] not in (b"dc", b"db") or raw[fs : fs + 2] != b"\xff\xd8":
                continue
            ras = _jpeg_decode(raw[fs:fe])
            if ras is not None:
                out.append(ras)
                if len(out) >= max_frames:
                    return out
    return out


def decode_videos(
    df: DataFrame, id_col: str = "media_id", payload_col: str = "payload", feature_dim: int = 8
) -> DataFrame:
    """binary payloads -> video metadata + features via mapInPandas.
    Container metadata (dims, duration) is REAL for MP4/MOV/AVI from the
    actual box/chunk structures; frame pixel features are REAL for
    Motion-JPEG AVI and animated GIF (full GIF89a compositing — frame
    offsets, transparency, disposal — with duration from the summed
    frame delays) and digest-stubbed for the remaining codecs (no
    H.264/VP9 in stdlib) with the format kept real so downstream filters
    can split decodable work from stub work. The output feeds
    ``sample_video_frames`` directly (duration_s column)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                meta = parse_video_header(raw)
                frame = None
                if meta is not None:
                    w, h, dur, fmt = meta
                    if fmt == "avi":
                        frames = _avi_mjpeg_frames(raw, max_frames=1)
                        if frames:
                            frame = frames[0]
                elif raw[:6] in (b"GIF87a", b"GIF89a"):
                    gif_frames, gif_dur = _gif_frames(raw, max_frames=1)
                    if gif_frames:
                        frame = gif_frames[0]
                        w, h = frame[0], frame[1]
                        dur = round(gif_dur, 3)
                        fmt = "gif"
                    else:
                        meta = None  # malformed GIF: digest stub below
                if meta is None and frame is None:
                    d = hashlib.md5(raw or b"").digest()
                    w, h = 160 + d[0] % 1024, 120 + d[1] % 1024
                    dur = round(1.0 + d[2] / 8.0, 3)
                    fmt = "video-stub"
                rows.append(
                    {
                        "media_id": int(mid),
                        "width": int(w),
                        "height": int(h),
                        "duration_s": float(dur),
                        "format": fmt,
                        "n_bytes": len(raw),
                        "feature": (
                            _pixel_feature(frame[2], frame[3], feature_dim)
                            if frame is not None
                            else _feature_stub(raw, feature_dim)
                        ),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in VIDEO_META_SCHEMA.fields])

    return df.select(id_col, payload_col).mapInPandas(batches, VIDEO_META_SCHEMA)


def resize_images(df: DataFrame, max_side: int, width_col: str = "width", height_col: str = "height") -> DataFrame:
    """Pure-expression resize planning: target dims preserving aspect
    ratio (the byte-level resample would live in the decode kernel)."""
    scale = F.least(
        F.lit(1.0), F.lit(max_side) / F.greatest(F.col(width_col), F.col(height_col))
    )
    return df.withColumn("target_width", F.ceil(F.col(width_col) * scale).cast("int")).withColumn(
        "target_height", F.ceil(F.col(height_col) * scale).cast("int")
    )


def sample_video_frames(
    df: DataFrame,
    id_col: str = "media_id",
    duration_col: str = "duration_s",
    fps: float = 1.0,
) -> DataFrame:
    """One row per sampled frame timestamp: (media_id, frame_idx, ts_s).
    Frame extraction itself would run in the decode kernel; the explode
    keeps per-frame rows distributed."""
    n = F.greatest(F.floor(F.col(duration_col) * fps).cast("int"), F.lit(1))
    return df.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), n - 1)).alias("frame_idx"),
    ).withColumn("ts_s", F.round(F.col("frame_idx") / fps, 6))
