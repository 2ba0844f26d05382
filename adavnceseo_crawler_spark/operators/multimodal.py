"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Treats image/audio/video as ``binary`` columns with a metadata struct, the way
a 100 TB training-data pipeline stores them next to text.  The Spark-side
plumbing — schema, Arrow batch shape, ``mapInPandas`` signatures, partitioning
by modality — is real and tested.

Codecs: decode is REAL for seven formats — 24-bit BMP, binary PPM (P6),
PNG (RGB8: zlib inflate + per-scanline unfilter, round 5), GIF
(variable-width LZW, palette-exact, round 5), baseline JPEG (full DCT +
Annex-K Huffman entropy codec in operators/jpeg.py, round 5), PCM16 WAV,
and uncompressed RGB24 AVI — so ``decode_real`` produces actual
pixel/sample arrays and ``extract_features(..., decode="real")`` computes
dimensions + channel statistics + histograms from ACTUAL data
(encode→decode roundtrips are exact for the lossless formats and for
block-constant quality-100 JPEG; unit-tested throughout).  Only codecs
that genuinely need non-stdlib libraries remain a documented
NotImplementedError boundary (progressive JPEG / MP3 / H.264 —
PIL/torchaudio/ffmpeg are not installable in this sandbox; decode_real
names the wire-in point).  ``decode_stub`` (byte-histogram fake) remains
the oracle-checked default path for the q30 driver query, and real-mode
fallbacks to it are recorded in the ``decoded`` output column.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .jpeg import decode_jpeg, encode_jpeg

MEDIA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURES = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("n_bytes", T.LongType(), True),
        # True iff the feature came from a REAL codec decode; False = the
        # byte-histogram stub (either stub mode, or a real-mode fallback on
        # a corrupt/unsupported payload).  Downstream audits/filters on it.
        T.StructField("decoded", T.BooleanType(), False),
    ]
)


# ---------------------------------------------------------------------------
# Real image codecs (pure stdlib + numpy): 24-bit BMP and binary PPM (P6).
# Both are uncompressed raster formats, so decode is header parsing + a
# reshape — exactly what a per-row decode UDF does at scale, minus the
# libjpeg call.  Encoders exist so tests can roundtrip deterministic pixels.
# ---------------------------------------------------------------------------
def encode_ppm(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 -> binary PPM (P6, maxval 255)."""
    h, w, _ = pixels.shape
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) -> (H, W, 3) uint8.  Handles comment lines and any
    whitespace between header tokens, per the netpbm spec."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    # tokenize header: magic, width, height, maxval (comments start with #)
    toks: list[bytes] = []
    i = 2
    while len(toks) < 3:
        while i < len(payload) and payload[i:i + 1].isspace():
            i += 1
        if payload[i:i + 1] == b"#":
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j:j + 1].isspace():
            j += 1
        toks.append(payload[i:j])
        i = j
    w, h, maxval = (int(t) for t in toks)
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    i += 1  # single whitespace after maxval
    raster = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=i)
    return raster.reshape(h, w, 3).copy()


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> 24-bit uncompressed BMP (BITMAPINFOHEADER,
    bottom-up rows, 4-byte row padding, BGR byte order)."""
    h, w, _ = pixels.shape
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    header = (
        b"BM"
        + (54 + img_size).to_bytes(4, "little")
        + b"\x00\x00\x00\x00" + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little") + h.to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little") + img_size.to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2
        + (0).to_bytes(4, "little") * 2
    )
    rows = []
    pad = b"\x00" * (row_size - w * 3)
    bgr = pixels[:, :, ::-1].astype(np.uint8)  # RGB -> BGR
    for y in range(h - 1, -1, -1):  # bottom-up
        rows.append(bgr[y].tobytes() + pad)
    return header + b"".join(rows)


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP -> (H, W, 3) uint8 RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = int.from_bytes(payload[10:14], "little")
    hdr_size = int.from_bytes(payload[14:18], "little")
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant bpp={bpp} comp={compression}")
    top_down = h < 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    raster = np.frombuffer(
        payload, dtype=np.uint8, count=row_size * h, offset=data_off
    ).reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        raster = raster[::-1]
    return raster[:, :, ::-1].copy()  # BGR -> RGB


# ---------------------------------------------------------------------------
# Real PNG codec (pure stdlib: zlib): 8-bit RGB (color type 2), the
# dominant lossless web image format.  Decode = signature + chunk walk
# (CRC-verified) + inflate of the concatenated IDATs + per-scanline
# unfilter.  Filters 0/2 (None/Up) unfilter vectorized in numpy; 1/3/4
# (Sub/Average/Paeth) carry a sequential left-dependence along the
# scanline, so they run a per-byte loop over that line — linear and
# row-local, the same work PIL does in C.  Interlace, palettes, alpha and
# bit depths != 8 are rejected explicitly (ValueError), never mis-decoded.
# ---------------------------------------------------------------------------
def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        len(data).to_bytes(4, "big") + ctype + data
        + (zlib.crc32(ctype + data) & 0xFFFFFFFF).to_bytes(4, "big")
    )


def encode_png(pixels: np.ndarray, filter_type: int = 0) -> bytes:
    """(H, W, 3) uint8 RGB -> PNG (bit depth 8, color type 2, one IDAT).
    ``filter_type`` applies that scanline filter (0..4) to EVERY row so
    tests can roundtrip each of the decoder's unfilter paths."""
    h, w, _ = pixels.shape
    raw = pixels.astype(np.uint8).reshape(h, w * 3).astype(np.int16)
    zeros3 = np.zeros(3, dtype=np.int16)
    prev = np.zeros(w * 3, dtype=np.int16)
    lines = []
    for y in range(h):
        cur = raw[y]
        left = np.concatenate([zeros3, cur[:-3]])
        ul = np.concatenate([zeros3, prev[:-3]])
        if filter_type == 0:
            out = cur
        elif filter_type == 1:
            out = cur - left
        elif filter_type == 2:
            out = cur - prev
        elif filter_type == 3:
            out = cur - ((left + prev) // 2)
        elif filter_type == 4:
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul)
            )
            out = cur - pred
        else:
            raise ValueError(f"bad PNG filter {filter_type}")
        lines.append(bytes([filter_type]) + (out % 256).astype(np.uint8).tobytes())
        prev = cur
    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 2, 0, 0, 0])
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """PNG (RGB8, non-interlaced) -> (H, W, 3) uint8.  CRC-checks every
    chunk; unknown ancillary chunks are skipped per the spec."""
    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, idat, w, h = 8, [], None, None
    while pos + 12 <= len(payload):
        size = int.from_bytes(payload[pos:pos + 4], "big")
        cid = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + size]
        crc = int.from_bytes(payload[pos + 8 + size:pos + 12 + size], "big")
        if (zlib.crc32(cid + data) & 0xFFFFFFFF) != crc:
            raise ValueError(f"PNG chunk {cid!r} CRC mismatch")
        if cid == b"IHDR":
            w = int.from_bytes(data[0:4], "big")
            h = int.from_bytes(data[4:8], "big")
            depth, ctype, comp, filt, interlace = data[8:13]
            if (depth, ctype, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise ValueError(
                    f"unsupported PNG variant depth={depth} color={ctype} "
                    f"interlace={interlace} (RGB8 non-interlaced only)"
                )
        elif cid == b"IDAT":
            idat.append(data)
        elif cid == b"IEND":
            break
        pos += 12 + size
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    raw = zlib.decompress(b"".join(idat))
    stride = w * 3
    if len(raw) != (stride + 1) * h:
        raise ValueError("PNG raster size mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = bytearray(stride)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)])
        if ft == 0:
            pass
        elif ft == 1:  # Sub
            for i in range(3, stride):
                line[i] = (line[i] + line[i - 3]) & 255
        elif ft == 2:  # Up (vectorized)
            line = bytearray(
                (
                    np.frombuffer(bytes(line), dtype=np.uint8)
                    + np.frombuffer(bytes(prev), dtype=np.uint8)
                ).tobytes()
            )
        elif ft == 3:  # Average
            for i in range(stride):
                a = line[i - 3] if i >= 3 else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 255
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = line[i - 3] if i >= 3 else 0
                b = prev[i]
                c = prev[i - 3] if i >= 3 else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 255
        else:
            raise ValueError(f"bad PNG filter {ft}")
        out[y] = np.frombuffer(bytes(line), dtype=np.uint8)
        prev = line
    return out.reshape(h, w, 3).copy()


# ---------------------------------------------------------------------------
# Real GIF codec (pure Python LZW): GIF87a/89a, global palette, first image
# block, non-interlaced.  GIF is palettized, so decode is EXACT (palette
# lookup), and any image with <= 256 distinct colors roundtrips
# byte-identically through encode_gif -> decode_gif.  Variable-width
# LSB-first LZW with clear/EOI codes and 4096-entry table resets, per the
# GIF89a spec.  Interlace and local color tables are rejected explicitly.
# ---------------------------------------------------------------------------
def _lzw_encode(indices, mcs: int) -> bytes:
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    table = {(i,): i for i in range(1 << mcs)}
    next_code = eoi + 1
    width = mcs + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, w: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear, width)
    seq: tuple = ()
    for px in indices:
        cand = seq + (int(px),)
        if cand in table:
            seq = cand
            continue
        emit(table[seq], width)
        table[cand] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        elif next_code >= 4096:
            emit(clear, width)
            table = {(i,): i for i in range(1 << mcs)}
            next_code = eoi + 1
            width = mcs + 1
        seq = (int(px),)
    if seq:
        emit(table[seq], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, mcs: int, n_px: int) -> list[int]:
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    width = mcs + 1
    table: list[tuple] = [(i,) for i in range(1 << mcs)] + [(), ()]
    out: list[int] = []
    acc = nbits = pos = 0
    prev: tuple | None = None
    while len(out) < n_px:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("GIF LZW stream truncated")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [(i,) for i in range(1 << mcs)] + [(), ()]
            width = mcs + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + (prev[0],)  # the cScSc special case
        else:
            raise ValueError(f"bad GIF LZW code {code}")
        out.extend(entry)
        if prev is not None:
            table.append(prev + (entry[0],))
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return out[:n_px]


def encode_gif(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 with <= 256 distinct colors -> GIF89a (global
    palette, one image block, non-interlaced)."""
    h, w, _ = pixels.shape
    flat = pixels.reshape(-1, 3)
    colors, indices = np.unique(flat, axis=0, return_inverse=True)
    n = len(colors)
    if n > 256:
        raise ValueError(f"GIF needs <= 256 distinct colors, got {n}")
    depth = max(1, (n - 1).bit_length())  # palette size = 2^depth
    pal = np.zeros((1 << depth, 3), dtype=np.uint8)
    pal[:n] = colors
    mcs = max(2, depth)
    head = (
        b"GIF89a"
        + w.to_bytes(2, "little") + h.to_bytes(2, "little")
        + bytes([0x80 | (depth - 1), 0, 0])  # global table, 2^depth entries
        + pal.tobytes()
    )
    desc = (
        b"\x2c" + b"\x00\x00\x00\x00"
        + w.to_bytes(2, "little") + h.to_bytes(2, "little")
        + b"\x00"  # no local table, not interlaced
    )
    lzw = _lzw_encode(indices.astype(np.int64), mcs)
    blocks = bytearray([mcs])
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        blocks.append(len(chunk))
        blocks.extend(chunk)
    blocks.append(0)
    return head + desc + bytes(blocks) + b"\x3b"


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF87a/89a (global palette, non-interlaced) -> (H, W, 3) uint8 of
    the FIRST image block; extensions are skipped per the spec."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    flags = payload[10]
    pos = 13
    if not flags & 0x80:
        raise ValueError("unsupported GIF variant: no global color table")
    pal_n = 2 << (flags & 7)
    pal = np.frombuffer(payload, np.uint8, pal_n * 3, pos).reshape(pal_n, 3)
    pos += pal_n * 3
    while pos < len(payload):
        b = payload[pos]
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            w = int.from_bytes(payload[pos + 5:pos + 7], "little")
            h = int.from_bytes(payload[pos + 7:pos + 9], "little")
            iflags = payload[pos + 9]
            if iflags & 0xC0:
                raise ValueError(
                    "unsupported GIF variant: local color table / interlace"
                )
            pos += 10
            mcs = payload[pos]
            pos += 1
            data = bytearray()
            while payload[pos] != 0:
                ln = payload[pos]
                data.extend(payload[pos + 1:pos + 1 + ln])
                pos += 1 + ln
            idx = _lzw_decode(bytes(data), mcs, w * h)
            return pal[np.array(idx, dtype=np.int64)].reshape(h, w, 3).copy()
        elif b == 0x3B:
            break
        else:
            raise ValueError(f"bad GIF block 0x{b:02x}")
    raise ValueError("GIF has no image block")


# ---------------------------------------------------------------------------
# Real audio codec (pure stdlib + numpy): RIFF/WAVE, 16-bit PCM mono.
# ---------------------------------------------------------------------------
def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """1-D int16 samples -> RIFF/WAVE PCM16 mono."""
    data = samples.astype("<i2").tobytes()
    n = len(data)
    hdr = (
        b"RIFF" + (36 + n).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")   # PCM, mono
        + rate.to_bytes(4, "little") + (rate * 2).to_bytes(4, "little")
        + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
        + b"data" + n.to_bytes(4, "little")
    )
    return hdr + data


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 mono -> (int16 samples, sample_rate).  Walks the
    chunk list (fmt may not be first), rejects compressed/stereo variants."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = int.from_bytes(payload[pos + 4:pos + 8], "little")
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = int.from_bytes(body[0:2], "little")
            channels = int.from_bytes(body[2:4], "little")
            bits = int.from_bytes(body[14:16], "little")
            if fmt != 1 or channels != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV fmt={fmt} ch={channels} bits={bits}")
            rate = int.from_bytes(body[4:8], "little")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    return np.frombuffer(data, dtype="<i2").astype(np.int16), rate


def audio_features(samples: np.ndarray, rate: int, dim: int = 16) -> np.ndarray:
    """Feature vector from ACTUAL samples: [n_samples, rate, mean, strict
    zero-crossing count, then a (dim-4)-bin normalized amplitude histogram].
    Histogram binning is integer ((s+32768)·nbins // 65536), so an SQL
    oracle replays it exactly."""
    s = samples.astype(np.int64)
    n = len(s)
    nbins = dim - 4
    bins = (s + 32768) * nbins // 65536
    hist = np.bincount(bins, minlength=nbins).astype(np.float64) / max(1, n)
    zc = int(np.sum(s[1:] * s[:-1] < 0)) if n > 1 else 0
    mean = float(s.mean()) if n else 0.0
    return np.concatenate(
        ([float(n), float(rate), mean, float(zc)], hist)
    ).astype(np.float32)


# ---------------------------------------------------------------------------
# Real video codec (pure stdlib + numpy): minimal AVI (RIFF) container with
# uncompressed raw-DIB frames ('00db' chunks: bottom-up BGR rows padded to
# 4 bytes — the BMP raster without the BMP header).
# ---------------------------------------------------------------------------
def encode_avi(frames: list, rate: int = 10) -> bytes:
    """List of (H, W, 3) uint8 RGB frames -> minimal AVI."""
    h, w, _ = frames[0].shape
    row_size = (w * 3 + 3) & ~3
    pad = b"\x00" * (row_size - w * 3)

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + len(body).to_bytes(4, "little") + body + (
            b"\x00" if len(body) & 1 else b"")

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    avih = (
        (1000000 // rate).to_bytes(4, "little")       # usec/frame
        + (0).to_bytes(4, "little") * 2
        + (0).to_bytes(4, "little")                   # flags
        + len(frames).to_bytes(4, "little")           # total frames
        + (0).to_bytes(4, "little") + (1).to_bytes(4, "little")
        + (row_size * h).to_bytes(4, "little")
        + w.to_bytes(4, "little") + h.to_bytes(4, "little")
        + (0).to_bytes(4, "little") * 4
    )
    strh = (
        b"vids" + b"DIB " + (0).to_bytes(4, "little") * 3
        + (1).to_bytes(4, "little") + rate.to_bytes(4, "little")
        + (0).to_bytes(4, "little") + len(frames).to_bytes(4, "little")
        + (row_size * h).to_bytes(4, "little")
        + (0xFFFFFFFF).to_bytes(4, "little") + (0).to_bytes(4, "little")
        + (0).to_bytes(8, "little")
    )
    strf = (
        (40).to_bytes(4, "little")
        + w.to_bytes(4, "little") + h.to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little") + (row_size * h).to_bytes(4, "little")
        + (0).to_bytes(4, "little") * 4
    )
    movi = b""
    for fr in frames:
        bgr = fr[:, :, ::-1].astype(np.uint8)
        raster = b"".join(bgr[y].tobytes() + pad for y in range(h - 1, -1, -1))
        movi += chunk(b"00db", raster)
    body = (
        b"AVI "
        + lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
        + lst(b"movi", movi)
    )
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def decode_avi(payload: bytes) -> np.ndarray:
    """Minimal AVI with raw-DIB frames -> (N, H, W, 3) uint8 RGB."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    w = h = None
    rasters: list[bytes] = []

    def walk(buf: bytes) -> None:
        nonlocal w, h
        pos = 0
        while pos + 8 <= len(buf):
            cid = buf[pos:pos + 4]
            size = int.from_bytes(buf[pos + 4:pos + 8], "little")
            body = buf[pos + 8:pos + 8 + size]
            if cid == b"LIST":
                walk(body[4:])
            elif cid == b"avih":
                w = int.from_bytes(body[32:36], "little")
                h = int.from_bytes(body[36:40], "little")
            elif cid in (b"00db", b"00dc"):
                rasters.append(body)
            pos += 8 + size + (size & 1)

    walk(payload[12:])
    if w is None or not rasters:
        raise ValueError("AVI missing avih or frame chunks")
    row_size = (w * 3 + 3) & ~3
    frames = []
    for r in rasters:
        raster = np.frombuffer(r, dtype=np.uint8, count=row_size * h).reshape(
            h, row_size)[:, : w * 3].reshape(h, w, 3)
        frames.append(raster[::-1, :, ::-1])  # bottom-up BGR -> top-down RGB
    return np.stack(frames)


def video_features(frames: np.ndarray, dim: int = 16) -> np.ndarray:
    """Feature vector with FRAME SAMPLING: [n_frames, w, h, then a
    (dim-3)-bin integer-binned luminance histogram over the first / middle /
    last frames only] — the decode-a-few-frames shape a training pipeline
    uses on hour-long videos."""
    n, h, w, _ = frames.shape
    idxs = sorted({0, n // 2, n - 1})
    px = frames[idxs].reshape(-1, 3).astype(np.int64)
    lum = 299 * px[:, 0] + 587 * px[:, 1] + 114 * px[:, 2]
    nbins = dim - 3
    bins = lum * nbins // 255001
    hist = np.bincount(bins, minlength=nbins).astype(np.float64) / max(1, lum.size)
    return np.concatenate(([float(n), float(w), float(h)], hist)).astype(np.float32)


_IMAGE_DECODERS = {
    "image/bmp": decode_bmp,
    "image/x-portable-pixmap": decode_ppm,
    "image/png": decode_png,
    "image/gif": decode_gif,
    "image/jpeg": decode_jpeg,
}


def decode_real(payload: bytes, mime: str):
    """Real decode: (H, W, 3) uint8 pixels for BMP/PPM/PNG/GIF/baseline
    JPEG, (samples, rate) for PCM WAV, (N, H, W, 3) frames for RGB24 AVI;
    everything else (progressive JPEG, compressed audio, H.264) raises
    with the integration point documented (PIL/torchaudio/ffmpeg are not
    installable in this sandbox)."""
    dec = _IMAGE_DECODERS.get(mime)
    if dec is not None:
        return dec(payload)
    if mime in ("audio/wav", "audio/x-wav"):
        return decode_wav(payload)
    if mime in ("video/x-msvideo", "video/avi"):
        return decode_avi(payload)
    raise NotImplementedError(
        f"no codec for {mime!r} in this sandbox (supported: "
        f"{sorted(_IMAGE_DECODERS) + ['audio/wav', 'video/x-msvideo']}); "
        "wire PIL/torchaudio/ffmpeg here in deployment"
    )


def image_features(pixels: np.ndarray, dim: int = 16) -> np.ndarray:
    """Feature vector from ACTUAL pixels: [w, h, mean_r, mean_g, mean_b,
    then a (dim-5)-bin normalized luminance histogram].  Binning is pure
    integer arithmetic (milli-weight luminance 299r+587g+114b in 0..255000,
    bin = lum*nbins // 255001) so an SQL oracle replays it EXACTLY — no
    float bin-edge hazards."""
    h, w, _ = pixels.shape
    npx = h * w
    px = pixels.reshape(-1, 3).astype(np.int64)
    means = px.astype(np.float64).mean(axis=0)
    lum = 299 * px[:, 0] + 587 * px[:, 1] + 114 * px[:, 2]
    nbins = dim - 5
    bins = lum * nbins // 255001
    hist = np.bincount(bins, minlength=nbins).astype(np.float64) / max(1, npx)
    return np.concatenate(([float(w), float(h)], means, hist)).astype(np.float32)


def decode_stub(payload: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic fake feature: byte-histogram folded to `dim` floats."""
    if payload is None or len(payload) == 0:
        return np.zeros(dim, dtype=np.float32)
    hist = np.bincount(np.frombuffer(payload, dtype=np.uint8), minlength=256)
    folded = hist.reshape(dim, 256 // dim).sum(axis=1).astype(np.float32)
    return folded / max(1.0, folded.sum())


def extract_features(
    media: DataFrame, dim: int = 16, decode: str = "stub"
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads (Arrow-batched).

    ``decode="stub"``: byte-histogram fake (the oracle-checked q30 path).
    ``decode="real"``: decode supported image payloads to pixels and compute
    dims + channel means + luminance histogram (image_features); payloads
    with no codec (or corrupt payloads) fall back to the stub so
    mixed-modality batches survive — the ``decoded`` output column records
    which rows actually decoded, so a fallback is auditable, never silent.

    Runs over the input's existing partitioning: an earlier revision
    hash-repartitioned by ``modality`` first ("each task loads one codec"),
    but a 3-distinct-value partitioning key collapses any corpus into <= 3
    working partitions — the guide's few-distinct-synthetic-keys skew trap —
    and the codecs are plain module functions with no per-task load cost, so
    the exchange bought nothing.  Callers that do want codec locality can
    pre-partition by (modality, hash bucket) themselves."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            flags = []
            for p, mime in zip(pdf["payload"], pdf["mime"]):
                if decode == "real":
                    try:
                        decoded = decode_real(p, mime)
                        if isinstance(decoded, tuple):      # (samples, rate)
                            feats.append(audio_features(*decoded, dim).tolist())
                        elif decoded.ndim == 4:             # (N, H, W, 3) frames
                            feats.append(video_features(decoded, dim).tolist())
                        else:                               # (H, W, 3) pixels
                            feats.append(image_features(decoded, dim).tolist())
                        flags.append(True)
                        continue
                    except Exception:
                        # ADVICE r5: codecs raise more than (NotImplemented,
                        # Value)Error on malformed bytes — IndexError on a
                        # truncated GIF, StopIteration/KeyError on a JPEG
                        # with an unknown component id / missing DHT,
                        # zlib.error on a bad IDAT.  One corrupt payload
                        # must flag decoded=false, not kill the whole task.
                        pass
                feats.append(decode_stub(p, dim).tolist())
                flags.append(False)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "feature": feats,
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "decoded": flags,
                }
            )

    return (
        media.select(
            "media_id", "modality", "payload",
            F.coalesce(F.col("meta.mime"), F.lit("")).alias("mime"),
        )
        .mapInPandas(run, schema=FEATURES)
    )


def synth_pixels(i: int, w: int = 8, h: int = 6) -> np.ndarray:
    """Deterministic (h, w, 3) uint8 test image for media_id i."""
    yy, xx = np.mgrid[0:h, 0:w]
    r = (xx * 31 + i * 7) % 256
    g = (yy * 53 + i * 13) % 256
    b = (xx * yy + i) % 256
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def synth_media(spark, n: int = 100) -> DataFrame:
    """Deterministic fake media table for tests (opaque blobs, stub-decoded;
    q30's oracle replays this byte formula in SQL — keep in sync)."""
    rows = []
    for i in range(n):
        modality = ("image", "audio", "video")[i % 3]
        payload = bytes(((i * 37 + j * 11) % 256) for j in range(64 + i % 128))
        meta = ("application/octet-stream", 64, 48, 1000 + i)
        rows.append((i, modality, payload, meta))
    return spark.createDataFrame(rows, MEDIA)


def synth_samples(i: int, n: int = 400) -> np.ndarray:
    """Deterministic int16 PCM test signal for media_id i: amplitude bounded
    to ±8192 so 400-sample sums stay < 2^24 (exact in float32 features)."""
    j = np.arange(n, dtype=np.int64)
    return ((j * j + 31 * j * i + i) % 16384 - 8192).astype(np.int16)


def synth_media_audio(spark, n: int = 40, n_samples: int = 400) -> DataFrame:
    """Deterministic REAL-audio media table: RIFF/WAVE PCM16 payloads of
    synth_samples(i).  The q58 oracle recomputes features from the sample
    FORMULA in SQL, never parsing the WAV container."""
    rows = []
    for i in range(n):
        payload = encode_wav(synth_samples(i, n_samples), rate=8000)
        rows.append(
            (i, "audio", payload,
             ("audio/wav", None, None, n_samples * 1000 // 8000))
        )
    return spark.createDataFrame(rows, MEDIA)


def synth_media_video(spark, n: int = 12) -> DataFrame:
    """Deterministic REAL-video media table: minimal AVIs of 4-6 synthetic
    8x6 frames (frame f of media i = synth_pixels(i*97 + f)).  The q59
    oracle recomputes the frame-sampled features from the pixel formula."""
    rows = []
    for i in range(n):
        n_frames = 4 + i % 3
        frames = [synth_pixels(i * 97 + f, 8, 6) for f in range(n_frames)]
        payload = encode_avi(frames, rate=10)
        rows.append(
            (i, "video", payload,
             ("video/x-msvideo", 8, 6, n_frames * 100))
        )
    return spark.createDataFrame(rows, MEDIA)


def synth_media_real(spark, n: int = 60) -> DataFrame:
    """Deterministic REAL-image media table: rows rotate 24-bit BMP, binary
    PPM and PNG (filter i%5, exercising every unfilter path) encodings of
    synth_pixels(i) — decode_real roundtrips all three to exact pixels.
    The q57 oracle recomputes the features from the pixel FORMULA in SQL
    (never parsing any container), so a decoder bug cannot cancel out."""
    rows = []
    for i in range(n):
        w, h = 8 + i % 5, 6 + i % 3
        px = synth_pixels(i, w, h)
        if i % 3 == 0:
            payload, mime = encode_bmp(px), "image/bmp"
        elif i % 3 == 1:
            payload, mime = encode_ppm(px), "image/x-portable-pixmap"
        else:
            payload, mime = encode_png(px, filter_type=i % 5), "image/png"
        rows.append((i, "image", payload, (mime, w, h, None)))
    return spark.createDataFrame(rows, MEDIA)


def synth_media_gif(spark, n: int = 40) -> DataFrame:
    """Deterministic all-GIF media table over synth_pixels (w·h ≤ 126 ≤
    256 colors, so the palette is exact).  The q86 oracle recomputes
    features from the pixel formula, never LZW-decoding anything."""
    rows = []
    for i in range(n):
        w, h = 8 + i % 6, 6 + i % 5
        px = synth_pixels(i, w, h)
        rows.append(
            (i, "image", encode_gif(px), ("image/gif", w, h, None))
        )
    return spark.createDataFrame(rows, MEDIA)


def synth_tiles(i: int) -> np.ndarray:
    """Deterministic 8x8-block-constant GRAYSCALE test image for media_id
    i: a (1 + i%2) x (2 + i%3) tile grid, tile (tx, ty) filled with
    (tx*31 + ty*53 + i*7) % 256.  Block-constant images survive quality-100
    JPEG EXACTLY (DC-only blocks, all-ones quant tables), so the q87
    oracle can replay this formula in SQL."""
    th, tw = 1 + i % 2, 2 + i % 3
    out = np.empty((8 * th, 8 * tw), dtype=np.uint8)
    for ty in range(th):
        for tx in range(tw):
            out[ty * 8:(ty + 1) * 8, tx * 8:(tx + 1) * 8] = (
                tx * 31 + ty * 53 + i * 7) % 256
    return out


def synth_media_jpeg(spark, n: int = 40) -> DataFrame:
    """Deterministic all-JPEG media table: synth_tiles(i) encoded as
    quality-100 grayscale baseline JPEG with restart interval i % 4
    (0 = no DRI), so a scan exercises the Huffman DC chain, byte
    unstuffing, and the RSTn resync path.  Decode is pixel-EXACT (see
    synth_tiles); the q87 oracle recomputes features from the tile
    formula, never entropy-decoding anything."""
    rows = []
    for i in range(n):
        px = synth_tiles(i)
        h, w = px.shape
        payload = encode_jpeg(px, quality=100, restart_interval=i % 4)
        rows.append((i, "image", payload, ("image/jpeg", w, h, None)))
    return spark.createDataFrame(rows, MEDIA)


def synth_media_png(spark, n: int = 50) -> DataFrame:
    """Deterministic all-PNG media table: synth_pixels(i) encoded with
    scanline filter i%5, so a scan exercises every unfilter path (None/
    Sub/Up/Average/Paeth).  The q83 oracle recomputes features from the
    pixel formula in SQL, never inflating a PNG."""
    rows = []
    for i in range(n):
        w, h = 8 + i % 7, 6 + i % 4
        px = synth_pixels(i, w, h)
        rows.append(
            (i, "image", encode_png(px, filter_type=i % 5),
             ("image/png", w, h, None))
        )
    return spark.createDataFrame(rows, MEDIA)
