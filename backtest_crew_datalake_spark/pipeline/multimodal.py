"""Multimodal columns: image/audio/video as opaque binary columns with typed
metadata, processed through Arrow-batched Pandas UDFs (mapInPandas).

Decode support is tiered by what a dependency-free container can honestly do:

- REAL decoders for self-describing formats the stdlib + numpy can parse:
  uncompressed 24-bpp BMP (``decode_bmp`` — struct header parse + numpy
  pixel stats), PCM WAV (``decode_wav`` — stdlib ``wave`` + numpy RMS/
  peak/zero-crossing features), and 8-bit truecolor PNG (``decode_png`` —
  chunk walk, stdlib ``zlib`` inflate, full scanline defilter incl. Paeth).
  Matching pure-python ENCODERS (``encode_bmp`` / ``encode_wav`` /
  ``encode_png``) exist so tests and queries can run the real
  encode→decode path end to end with no media libraries at all.
- A deterministic STUB (``decode_image_stub``) for formats that genuinely
  need external codecs (MP3/H.264 — JPEG now has a real from-scratch codec): fake features derived from the
  payload hash. ``decode_media`` sniffs the format and routes — real
  decoders for BMP/WAV/PNG, stub otherwise; a payload that *claims* a
  real format but is malformed raises rather than silently degrading to
  the stub.

Scale notes: mapInPandas streams Arrow batches — the binary payload never
round-trips through Python row objects; `spark.sql.execution.arrow
.maxRecordsPerBatch` bounds batch memory. Partition by a content-size bucket
before heavy decode so skewed large files don't straggle one task.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),        # image|audio|video
    T.StructField("content", T.BinaryType(), True),      # opaque payload
    T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("digest", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("feature", T.ArrayType(T.FloatType()), True),
])


def decode_image_stub(content: bytes) -> dict:
    """Deterministic fake decode: derives (width, height, 8-dim feature) from
    the sha256 of the payload. Used for formats that need external codecs
    (MP3/...); self-describing BMP/WAV/PNG/GIF/JPEG route to the REAL decoders via
    ``decode_media``.

    raise NotImplementedError here if you need the pipeline to fail loudly
    instead of producing fake features.
    """
    h = hashlib.sha256(content or b"").digest()
    width = 64 + h[0]
    height = 64 + h[1]
    feature = [b / 255.0 for b in h[2:10]]
    return {"width": width, "height": height, "feature": feature}


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as an uncompressed 24-bpp BMP
    (BITMAPINFOHEADER, bottom-up rows, 4-byte row padding) — pure python."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    row_sz = (w * 3 + 3) & ~3
    body = bytearray()
    for row in px[::-1]:                       # bottom-up
        bgr = row[:, ::-1].tobytes()           # RGB -> BGR
        body += bgr + b"\x00" * (row_sz - len(bgr))
    data_off = 14 + 40
    total = data_off + len(body)
    header = struct.pack("<2sIHHI", b"BM", total, 0, 0, data_off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                      2835, 2835, 0, 0)
    return header + dib + bytes(body)


def _bmp_px(content: bytes, data_off: int, w: int, h: int) -> np.ndarray:
    """Pixel extraction shared by decode_bmp and the perceptual hash:
    (abs(h), w, 3) uint8 RGB, top-down."""
    ah = abs(h)
    row_sz = (w * 3 + 3) & ~3
    arr = np.frombuffer(content, np.uint8, count=row_sz * ah, offset=data_off)
    px = arr.reshape(ah, row_sz)[:, : w * 3].reshape(ah, w, 3)[:, :, ::-1]
    if h > 0:
        px = px[::-1]                          # bottom-up -> top-down
    return px


def decode_bmp(content: bytes) -> dict:
    """REAL decode of an uncompressed 24-bpp BMP: struct header parse, numpy
    pixel extraction (BGR->RGB, bottom-up flip, row padding stripped), and
    an 8-dim feature of actual pixel statistics:
    [mean_r, mean_g, mean_b, std_r, std_g, std_b, brightness, aspect]."""
    if len(content) < 54 or content[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = int.from_bytes(content[10:14], "little")
    w = int.from_bytes(content[18:22], "little", signed=True)
    h = int.from_bytes(content[22:26], "little", signed=True)
    bpp = int.from_bytes(content[28:30], "little")
    comp = int.from_bytes(content[30:34], "little")
    if bpp != 24 or comp != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bpp BMP is supported (bpp={bpp}, "
            f"compression={comp})")
    ah = abs(h)
    px = _bmp_px(content, data_off, w, h)
    means = px.mean(axis=(0, 1)) / 255.0
    stds = px.std(axis=(0, 1)) / 255.0
    brightness = float(px.mean()) / 255.0
    aspect = float(w) / float(max(ah, 1))
    return {
        "width": int(w), "height": int(ah),
        "feature": [float(means[0]), float(means[1]), float(means[2]),
                    float(stds[0]), float(stds[1]), float(stds[2]),
                    brightness, aspect],
    }


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Encode a 1-D int16 sample array as mono PCM WAV (stdlib wave)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def decode_wav(content: bytes) -> dict:
    """REAL decode of PCM WAV (stdlib ``wave`` + numpy): 8-dim feature of
    actual signal statistics —
    [n_channels, rate/48k, duration_s, rms, peak, zero-crossing rate,
    mean, std] (amplitudes normalized to [-1, 1])."""
    with wave.open(io.BytesIO(content), "rb") as wf:
        nch, sw, rate, nfr = (wf.getnchannels(), wf.getsampwidth(),
                              wf.getframerate(), wf.getnframes())
        raw = wf.readframes(nfr)
    if sw == 1:
        # 8-bit PCM WAV is UNSIGNED (0..255, silence at 128) per the WAV
        # spec — signed i8 would read silence as a -1.0 DC offset.
        x = np.frombuffer(raw, np.uint8).astype(np.float64) - 128.0
        x /= 128.0
    elif sw in (2, 4):
        x = np.frombuffer(raw, np.dtype(f"<i{sw}")).astype(np.float64)
        x /= float(2 ** (8 * sw - 1))
    else:
        raise NotImplementedError(f"unsupported WAV sample width {sw}")
    dur = nfr / float(rate) if rate else 0.0
    if x.size:
        rms = float(np.sqrt(np.mean(x * x)))
        peak = float(np.max(np.abs(x)))
        zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
        mean, std = float(x.mean()), float(x.std())
    else:
        rms = peak = zcr = mean = std = 0.0
    return {
        "width": None, "height": None,
        "feature": [float(nch), rate / 48000.0, dur, rms, peak, zcr,
                    mean, std],
    }


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def encode_png(pixels: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as an 8-bit truecolor PNG
    (filter-0 scanlines, single zlib IDAT) — stdlib zlib only."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw))
            + _png_chunk(b"IEND", b""))


def _png_defilter(raw: bytes, w: int, h: int, nch: int) -> np.ndarray:
    """Reverse PNG scanline filtering (types 0-4: None/Sub/Up/Average/
    Paeth) -> (h, w, nch) uint8. Sub/Up are vectorized; Average and Paeth
    walk pixels (their recurrences are inherently sequential along x) —
    fine at feature-extraction scale, and encode_png emits filter 0 only."""
    stride = w * nch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    out = np.zeros((h, stride), np.int32)
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, stride, y * (stride + 1) + 1).astype(np.int32)
        if f == 0:
            cur = line
        elif f == 1:   # Sub: cumulative along x per channel offset
            cur = np.cumsum(line.reshape(w, nch), axis=0).reshape(-1) & 0xFF
        elif f == 2:   # Up
            cur = (line + prev) & 0xFF
        elif f == 3:   # Average
            cur = line.copy()
            for x in range(stride):
                a = cur[x - nch] if x >= nch else 0
                cur[x] = (line[x] + (a + prev[x]) // 2) & 0xFF
        elif f == 4:   # Paeth
            cur = line.copy()
            for x in range(stride):
                a = int(cur[x - nch]) if x >= nch else 0
                b = int(prev[x])
                c = int(prev[x - nch]) if x >= nch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                cur[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = cur
        prev = cur
    return out.astype(np.uint8).reshape(h, w, nch)


def _png_px(content: bytes) -> np.ndarray:
    """Chunk walk + inflate + defilter shared by decode_png and the
    perceptual hash: (h, w, nch) uint8, nch 3 (RGB) or 4 (RGBA)."""
    if content[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat, meta = 8, [], None
    while pos + 8 <= len(content):
        (ln,) = struct.unpack(">I", content[pos:pos + 4])
        tag = content[pos + 4:pos + 8]
        data = content[pos + 8:pos + 8 + ln]
        if len(data) != ln:
            raise ValueError("truncated PNG chunk")
        if tag == b"IHDR":
            meta = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if meta is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt, ilace = meta
    if depth != 8 or ctype not in (2, 6) or comp != 0 or ilace != 0:
        raise NotImplementedError(
            f"only 8-bit non-interlaced truecolor PNG is supported "
            f"(depth={depth}, color_type={ctype}, interlace={ilace})")
    nch = 3 if ctype == 2 else 4
    return _png_defilter(zlib.decompress(b"".join(idat)), w, h, nch)


def decode_png(content: bytes) -> dict:
    """REAL decode of 8-bit truecolor PNG (color type 2 RGB / 6 RGBA,
    non-interlaced): chunk walk, stdlib zlib inflate, per-scanline
    defilter (incl. Paeth), numpy pixel statistics — the same 8-dim
    feature family as decode_bmp (stats over the RGB channels; alpha is
    ignored for statistics)."""
    px = _png_px(content)
    h, w = px.shape[0], px.shape[1]
    rgb = px[:, :, :3]
    means = rgb.mean(axis=(0, 1)) / 255.0
    stds = rgb.std(axis=(0, 1)) / 255.0
    return {
        "width": int(w), "height": int(h),
        "feature": [float(means[0]), float(means[1]), float(means[2]),
                    float(stds[0]), float(stds[1]), float(stds[2]),
                    float(rgb.mean()) / 255.0, float(w) / float(max(h, 1))],
    }


def _gif_palette(px: np.ndarray):
    """(palette-table, index-array, table-bits) for one RGB frame."""
    flat = px.reshape(-1, 3)
    palette, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError("encode_gif: more than 256 unique colors")
    # color-table size must be a power of two >= 2
    bits = max(1, int(len(palette) - 1).bit_length())
    table = np.zeros((1 << bits, 3), np.uint8)
    table[:len(palette)] = palette
    return table, idx, bits


def _gif_lzw_stream(idx, bits: int) -> bytes:
    """LZW-encode an index array as <mcs byte><sub-blocks><terminator>.

    Emits literal root codes with correct code-width growth — it mirrors
    the decoder's table growth exactly: NO entry for the first code after
    CLEAR, one entry per code after that, width bump when the table
    reaches the current width's ceiling (capped at 12 bits; beyond that
    literal codes still fit, so a literal-only stream never needs a
    mid-stream CLEAR)."""
    mcs = max(2, bits)  # LZW min code size (spec: >= 2)
    clear, eoi = 1 << mcs, (1 << mcs) + 1

    out = bytearray()
    acc = n_bits = 0

    def put(code: int, width: int):
        nonlocal acc, n_bits
        acc |= code << n_bits
        n_bits += width
        while n_bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n_bits -= 8

    width = mcs + 1
    put(clear, width)
    table_len = eoi + 1
    first = True
    for v in idx:
        put(int(v), width)
        if first:
            first = False
        else:
            table_len += 1
            if table_len == (1 << width) and width < 12:
                width += 1
    put(eoi, width)
    if n_bits:
        out.append(acc & 0xFF)

    blocks = b"".join(
        bytes([min(255, len(out) - i)]) + bytes(out[i:i + 255])
        for i in range(0, len(out), 255)
    )
    return bytes([mcs]) + blocks + b"\x00"


def encode_gif(pixels: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as a GIF89a (stdlib only).

    The palette is the image's unique colors (≤256 — raises otherwise;
    feature-extraction fixtures are quantized by construction)."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    table, idx, bits = _gif_palette(px)
    lsd = struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) << 4) | (bits - 1),
                      0, 0)
    imgd = struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
    return (b"GIF89a" + lsd + table.tobytes() + imgd
            + _gif_lzw_stream(idx, bits) + b"\x3B")


def encode_gif_anim(frames: list) -> bytes:
    """Encode equal-sized RGB frames as an ANIMATED GIF89a: no global
    color table; each frame carries its own local table + LZW stream —
    the multi-frame fixture generator for the video frame-sampling path."""
    if not frames:
        raise ValueError("encode_gif_anim: no frames")
    px0 = np.asarray(frames[0], dtype=np.uint8)
    h, w, _ = px0.shape
    parts = [b"GIF89a", struct.pack("<HHBBB", w, h, 0, 0, 0)]
    for fr in frames:
        px = np.asarray(fr, dtype=np.uint8)
        if px.shape != px0.shape:
            raise ValueError("encode_gif_anim: frame size mismatch")
        table, idx, bits = _gif_palette(px)
        parts.append(
            struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x80 | (bits - 1))
        )
        parts.append(table.tobytes())
        parts.append(_gif_lzw_stream(idx, bits))
    parts.append(b"\x3B")
    return b"".join(parts)


def _gif_lzw_decode(data: bytes, mcs: int) -> list[int]:
    """GIF-variant LZW: little-endian bit packing, growing code width,
    CLEAR/EOI codes, 12-bit ceiling."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    width = mcs + 1
    table: list[list[int]] = [[i] for i in range(1 << mcs)] + [[], []]
    out: list[int] = []
    prev: list[int] | None = None
    acc = n_bits = pos = 0
    while True:
        while n_bits < width:
            if pos >= len(data):
                return out  # missing EOI: tolerate truncated streams
            acc |= data[pos] << n_bits
            pos += 1
            n_bits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        n_bits -= width
        if code == clear:
            table = [[i] for i in range(1 << mcs)] + [[], []]
            width = mcs + 1
            prev = None
            continue
        if code == eoi:
            return out
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + [entry[0]])
        elif code == len(table):  # the KwKwK case
            entry = prev + [prev[0]]
            table.append(entry)
        else:
            raise ValueError("corrupt GIF LZW stream")
        if prev is not None and len(table) == (1 << width) and width < 12:
            width += 1
        out.extend(entry)
        prev = entry
    return out


def _gif_px(content: bytes) -> np.ndarray:
    """Parse a GIF87a/89a first frame to (H, W, 3) uint8 (global or local
    color table, non-interlaced and interlaced)."""
    c = content
    if c[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h, flags, _bg, _ar = struct.unpack("<HHBBB", c[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(c, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(c):
        b0 = c[pos]
        if b0 == 0x21:  # extension: label + sub-blocks
            pos += 2
            while c[pos] != 0:
                pos += 1 + c[pos]
            pos += 1
        elif b0 == 0x2C:
            _, _, _, iw, ih, iflags = struct.unpack("<BHHHHB", c[pos:pos + 10])
            pos += 10
            table = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                table = np.frombuffer(c, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            if table is None:
                raise ValueError("GIF image with no color table")
            mcs = c[pos]
            pos += 1
            chunks = []
            while c[pos] != 0:
                ln = c[pos]
                chunks.append(c[pos + 1:pos + 1 + ln])
                pos += 1 + ln
            idx = np.array(
                _gif_lzw_decode(b"".join(chunks), mcs), dtype=np.int64
            )
            if len(idx) < iw * ih:
                raise ValueError("GIF pixel data underrun")
            idx = idx[:iw * ih].reshape(ih, iw)
            if iflags & 0x40:  # interlaced: 4-pass row shuffle
                order = [y for y in range(0, ih, 8)] + \
                        [y for y in range(4, ih, 8)] + \
                        [y for y in range(2, ih, 4)] + \
                        [y for y in range(1, ih, 2)]
                deint = np.empty_like(idx)
                deint[order] = idx
                idx = deint
            return table[idx]
        elif b0 == 0x3B:
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{b0:02x}")
    raise ValueError("GIF contains no image data")


def gif_frames(content: bytes):
    """Yield every frame of a (possibly animated) GIF as an (H, W, 3)
    uint8 canvas — real video-style frame iteration with the standard
    animation model: frames composite onto the logical-screen canvas at
    their (left, top) offset; a transparent index (GCE flag) leaves the
    underlying canvas pixel; disposal 2 restores the frame region to the
    background color, disposal 3 restores the pre-frame canvas."""
    c = content
    if c[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h, flags, bg, _ar = struct.unpack("<HHBBB", c[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(c, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    bg_rgb = (gct[bg] if gct is not None and bg < len(gct)
              else np.zeros(3, np.uint8))
    canvas = np.tile(bg_rgb, (h, w, 1)).astype(np.uint8)
    transparent = None
    disposal = 0
    while pos < len(c):
        b0 = c[pos]
        if b0 == 0x21:
            label = c[pos + 1]
            pos += 2
            if label == 0xF9 and c[pos] >= 4:  # graphic control extension
                gflags = c[pos + 1]
                disposal = (gflags >> 2) & 0x07
                transparent = c[pos + 4] if gflags & 0x01 else None
            while c[pos] != 0:
                pos += 1 + c[pos]
            pos += 1
        elif b0 == 0x2C:
            _, ix, iy, iw, ih, iflags = struct.unpack(
                "<BHHHHB", c[pos:pos + 10])
            pos += 10
            table = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                table = np.frombuffer(c, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            if table is None:
                raise ValueError("GIF image with no color table")
            mcs = c[pos]
            pos += 1
            chunks = []
            while c[pos] != 0:
                ln = c[pos]
                chunks.append(c[pos + 1:pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            idx = np.array(
                _gif_lzw_decode(b"".join(chunks), mcs), dtype=np.int64
            )
            if len(idx) < iw * ih:
                raise ValueError("GIF pixel data underrun")
            idx = idx[:iw * ih].reshape(ih, iw)
            if iflags & 0x40:
                order = [y for y in range(0, ih, 8)] + \
                        [y for y in range(4, ih, 8)] + \
                        [y for y in range(2, ih, 4)] + \
                        [y for y in range(1, ih, 2)]
                deint = np.empty_like(idx)
                deint[order] = idx
                idx = deint
            before = canvas.copy() if disposal == 3 else None
            region = canvas[iy:iy + ih, ix:ix + iw]
            painted = table[idx]
            if transparent is not None:
                mask = idx != transparent
                region[mask] = painted[mask]
            else:
                region[:] = painted
            yield canvas.copy()
            if disposal == 2:
                canvas[iy:iy + ih, ix:ix + iw] = bg_rgb
            elif disposal == 3 and before is not None:
                canvas = before
            transparent = None
            disposal = 0
        elif b0 == 0x3B:
            return
        else:
            raise ValueError(f"unexpected GIF block 0x{b0:02x}")


def frame_sample_gif(df: DataFrame, every_n: int = 2) -> DataFrame:
    """REAL video-style frame sampling: decode every frame of each
    (animated) GIF payload, keep every ``every_n``-th frame, and emit its
    dimensions + 64-bit perceptual dHash — the per-frame dedup/similarity
    key a video-data pipeline buckets on. Decoding and sampling happen
    INSIDE the Arrow batch iterator (a long animation never explodes a
    binary column Spark-side); non-GIF payloads yield no rows (same
    contract as audio_frame_features)."""
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("dhash", T.LongType()),
    ])

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, totals, ws, hs, hashes = [], [], [], [], [], []
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                c = bytes(c or b"")
                if c[:6] not in (b"GIF87a", b"GIF89a"):
                    continue
                try:
                    frames = list(gif_frames(c))
                except (ValueError, IndexError, struct.error):
                    continue
                for i in range(0, len(frames), every_n):
                    fr = frames[i].astype(np.float64)
                    gray = (fr[:, :, 0] * 0.299 + fr[:, :, 1] * 0.587
                            + fr[:, :, 2] * 0.114)
                    ids.append(mid)
                    idxs.append(i)
                    totals.append(len(frames))
                    hs.append(frames[i].shape[0])
                    ws.append(frames[i].shape[1])
                    v = dhash64(gray)
                    # same two's-complement int64 mapping as media_dhash
                    hashes.append(v - (1 << 64) if v >= (1 << 63) else v)
            if ids:
                yield pd.DataFrame({
                    "media_id": ids, "frame_idx": idxs, "n_frames": totals,
                    "width": ws, "height": hs, "dhash": hashes,
                })

    return df.select("media_id", "content").mapInPandas(
        _sample, schema=out_schema)


def decode_gif(content: bytes) -> dict:
    """REAL decode of a GIF first frame (stdlib LZW: sub-block reassembly,
    growing code width, KwKwK case, interlace) — same 8-dim feature family
    as decode_bmp/decode_png."""
    px = _gif_px(content)
    h, w = px.shape[0], px.shape[1]
    means = px.mean(axis=(0, 1)) / 255.0
    stds = px.std(axis=(0, 1)) / 255.0
    return {
        "width": int(w), "height": int(h),
        "feature": [float(means[0]), float(means[1]), float(means[2]),
                    float(stds[0]), float(stds[1]), float(stds[2]),
                    float(px.mean()) / 255.0, float(w) / float(max(h, 1))],
    }


_DIB_SIZES = (12, 40, 52, 56, 108, 124)


def decode_media(content: bytes) -> dict:
    """Sniff the payload format and route: REAL decoders for BMP, WAV,
    PNG, GIF and baseline JPEG, the deterministic stub for everything
    else. A payload that passes the sniff but fails to parse raises
    (corrupt data must not silently become fake features)."""
    c = content or b""
    if (len(c) >= 54 and c[:2] == b"BM"
            and int.from_bytes(c[14:18], "little") in _DIB_SIZES):
        return decode_bmp(c)
    if len(c) >= 44 and c[:4] == b"RIFF" and c[8:12] == b"WAVE":
        return decode_wav(c)
    if c[:8] == _PNG_SIG:
        return decode_png(c)
    if c[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif(c)
    if c[:2] == b"\xff\xd8":
        return decode_jpeg(c)
    return decode_image_stub(c)


def extract_media_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary media columns.

    Input must have (media_id, kind, content); output FEATURE_SCHEMA.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_media(c) for c in pdf["content"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": [len(c or b"") for c in pdf["content"]],
                "digest": [hashlib.sha256(c or b"").hexdigest()
                           for c in pdf["content"]],
                "width": [f["width"] for f in feats],
                "height": [f["height"] for f in feats],
                "feature": [f["feature"] for f in feats],
            })

    return df.select("media_id", "kind", "content").mapInPandas(
        _extract, schema=FEATURE_SCHEMA)


def with_size_bucket(df: DataFrame, n_buckets: int = 32) -> DataFrame:
    """Pre-decode partitioning guard: bucket by payload size so heavy items
    spread across tasks (skew control before expensive decode)."""
    return df.withColumn(
        "__size_bucket", F.pmod(F.length("content"), F.lit(n_buckets))
    ).repartition(n_buckets, "__size_bucket").drop("__size_bucket")


def frame_sample_stub(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: explode a (deterministic, fake) frame
    index list per video; the real implementation would demux with ffmpeg.
    Output: one row per sampled frame with frame_idx."""
    n_frames = F.pmod(F.xxhash64("media_id"), F.lit(300)) + 1
    idx = F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
    return df.select(
        "media_id", "kind", F.explode(idx).alias("frame_idx")
    )


RESIZED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("content", T.BinaryType(), True),   # resized payload
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
])


def resize_stub(df: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Image-resize plumbing (mapInPandas): emits a deterministic
    fixed-dimension payload per input (sha256 stream expanded to
    width·height//64 bytes — a real implementation swaps in
    PIL.Image.resize behind the same batch signature). The batch shape is
    the production one: binary in, binary out, Arrow both ways, constant
    output dims for downstream batch tensorization."""
    n_out = max(1, width * height // 64)

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for c in pdf["content"]:
                seed = hashlib.sha256(c or b"").digest()
                reps = (n_out + len(seed) - 1) // len(seed)
                out.append((seed * reps)[:n_out])
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "content": out,
                "width": width,
                "height": height,
            })

    return df.select("media_id", "kind", "content").mapInPandas(
        _resize, schema=RESIZED_SCHEMA)


AUDIO_WINDOW_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("window_idx", T.IntegerType(), False),
    T.StructField("n_windows", T.IntegerType(), False),
    T.StructField("feature", T.ArrayType(T.FloatType()), True),
])


def audio_window_features_stub(
    df: DataFrame, window_bytes: int = 1024
) -> DataFrame:
    """Audio framing plumbing: split each payload into fixed-size windows
    and emit a deterministic 4-dim feature per window (real impl: PCM
    decode + MFCC per frame, same output shape). One output row per
    window — the explode happens INSIDE the pandas iterator so a long
    audio file fans out without a Spark-side explode of the binary."""

    def _win(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, totals, feats = [], [], [], []
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                c = c or b""
                n = max(1, (len(c) + window_bytes - 1) // window_bytes)
                for w in range(n):
                    chunk = c[w * window_bytes:(w + 1) * window_bytes]
                    h = hashlib.sha256(chunk).digest()
                    ids.append(mid)
                    idxs.append(w)
                    totals.append(n)
                    feats.append([b / 255.0 for b in h[:4]])
            yield pd.DataFrame({
                "media_id": ids, "window_idx": idxs,
                "n_windows": totals, "feature": feats,
            })

    return df.select("media_id", "content").mapInPandas(
        _win, schema=AUDIO_WINDOW_SCHEMA)


# ---------------------------------------------------------------------------
# Perceptual hashing (image near-dup): dHash over the stdlib decoders.


def gray_pixels(content: bytes) -> "np.ndarray | None":
    """Grayscale 2-D float array for an image payload (BMP/PNG/GIF/JPEG via
    the REAL decoders), or None for non-image payloads (audio, unknown formats) —
    the hash stage skips those instead of inventing fake bits."""
    c = content or b""
    try:
        if (len(c) >= 54 and c[:2] == b"BM"
                and int.from_bytes(c[14:18], "little") in _DIB_SIZES):
            bpp = int.from_bytes(c[28:30], "little")
            comp = int.from_bytes(c[30:34], "little")
            if bpp != 24 or comp != 0:
                # same variants decode_bmp rejects: hashing a 32-bpp or
                # RLE payload with a 24-bpp stride would produce garbage
                # bits that LOOK like a valid hash
                return None
            data_off = int.from_bytes(c[10:14], "little")
            w = int.from_bytes(c[18:22], "little", signed=True)
            h = int.from_bytes(c[22:26], "little", signed=True)
            px = _bmp_px(c, data_off, w, h)
        elif c[:8] == _PNG_SIG:
            px = _png_px(c)[:, :, :3]
        elif c[:6] in (b"GIF87a", b"GIF89a"):
            px = _gif_px(c)
        elif c[:2] == b"\xff\xd8":
            px = _jpeg_px(c).astype(np.float64)
        else:
            return None
    except (ValueError, NotImplementedError):
        return None
    # ITU-R BT.601 luma — the standard grayscale reduction
    return (px[:, :, 0] * 0.299 + px[:, :, 1] * 0.587
            + px[:, :, 2] * 0.114).astype(np.float64)


def dhash64(gray: "np.ndarray") -> int:
    """64-bit difference hash (dHash, public algorithm): block-mean resize
    to 9×8 (no external imaging library — each target cell averages its
    source block), then bit i*8+j = [cell(i,j) < cell(i,j+1)] over the
    horizontal gradient. Robust to re-encoding, scaling, and small noise;
    near-duplicate images land within a few bits of Hamming distance."""
    h, w = gray.shape
    th, tw = 8, 9
    # block-mean resize: split rows/cols into th/tw nearly-equal slices
    ys = np.linspace(0, h, th + 1).astype(int)
    xs = np.linspace(0, w, tw + 1).astype(int)
    cells = np.empty((th, tw), dtype=np.float64)
    for i in range(th):
        for j in range(tw):
            block = gray[ys[i]:max(ys[i + 1], ys[i] + 1),
                         xs[j]:max(xs[j + 1], xs[j] + 1)]
            cells[i, j] = float(block.mean())
    bits = (cells[:, :-1] < cells[:, 1:]).flatten()
    out = 0
    for idx, b in enumerate(bits):
        if b:
            out |= 1 << idx
    return out


def image_dhash(df: DataFrame) -> DataFrame:
    """mapInPandas: (media_id, kind, content) → (media_id, kind, dhash) for
    image payloads; non-images pass through with dhash NULL. Arrow-batched;
    compose with with_size_bucket upstream for decode-skew control."""
    schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), True),
        T.StructField("dhash", T.LongType(), True),
    ])

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = []
            for c in pdf["content"]:
                g = gray_pixels(c)
                # numpy int64 overflow guard: keep the hash as a python int
                # and let pandas box it (bit 63 set would overflow int64 —
                # store as signed via two's complement)
                hashes.append(
                    None if g is None
                    else (lambda v: v - (1 << 64) if v >= (1 << 63) else v)(
                        dhash64(g))
                )
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "dhash": pd.array(hashes, dtype="Int64"),
            })

    return df.select("media_id", "kind", "content").mapInPandas(
        _hash, schema=schema)


def dhash_candidate_pairs(
    df: DataFrame,
    bands: int = 4,
    max_hamming: int = 3,
    id_col: str = "media_id",
    hash_col: str = "dhash",
) -> DataFrame:
    """Image near-duplicate pairs by banded Hamming join: split the 64-bit
    dHash into ``bands`` equal bit-slices; two hashes within Hamming
    distance ``bands - 1`` MUST share at least one slice (pigeonhole), so
    the equi-join on (band, slice) finds every such pair without an
    all-pairs scan, and the exact bit_count(xor) filter then enforces
    ``max_hamming``. Requires max_hamming < bands for the exactness
    guarantee (asserted).

    Scale: O(images × bands) rows into a keyed equi-join — the image
    analogue of the minhash band join; bit ops are JVM built-ins.
    """
    assert max_hamming < bands, "pigeonhole guarantee needs max_hamming < bands"
    width = 64 // bands
    mask = (1 << width) - 1
    h = df.where(F.col(hash_col).isNotNull()).select(
        F.col(id_col).alias("id"), F.col(hash_col).alias("h")
    )
    sliced = h.select(
        "id", "h",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftrightunsigned(F.col("h"), b * width)
                .bitwiseAND(F.lit(mask)).alias("slice"),
            )
            for b in range(bands)
        ])).alias("bs"),
    ).select("id", "h", "bs.band", "bs.slice")
    a, b = sliced.alias("a"), sliced.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.slice") == F.col("b.slice"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                F.bit_count(F.col("a.h").bitwiseXOR(F.col("b.h")))
                .alias("hamming"))
        # filter BEFORE the dedup exchange: far pairs sharing one slice and
        # the up-to-`bands` copies of each true pair are discarded map-side
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def audio_frame_features(
    df: DataFrame, frame_ms: int = 25
) -> DataFrame:
    """REAL per-frame audio features for PCM WAV payloads: the decoded
    signal (channel-averaged, [-1, 1]) is cut into ``frame_ms`` frames and
    each frame emits [rms, peak, zero-crossing rate, mean] — the energy/
    voicing features an audio-data pipeline filters and segments on (the
    MFCC predecessors computable with numpy alone; no external audio lib
    in this container). One output row per frame; the fan-out happens
    INSIDE the Arrow batch iterator, so a long recording never explodes a
    binary column Spark-side. Non-WAV payloads yield no rows (decode
    errors are a data-quality signal, surfaced by comparing input and
    output media_id sets — same contract as gray_pixels returning None).
    """
    frame_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("rate", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ])

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, totals, rates, feats = [], [], [], [], []
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                try:
                    with wave.open(io.BytesIO(c or b""), "rb") as wf:
                        nch, sw, rate, nfr = (
                            wf.getnchannels(), wf.getsampwidth(),
                            wf.getframerate(), wf.getnframes())
                        raw = wf.readframes(nfr)
                except (wave.Error, EOFError):
                    continue
                if sw == 1:
                    x = np.frombuffer(raw, np.uint8).astype(np.float64)
                    x = (x - 128.0) / 128.0
                elif sw in (2, 4):
                    x = np.frombuffer(raw, np.dtype(f"<i{sw}"))
                    x = x.astype(np.float64) / float(2 ** (8 * sw - 1))
                else:
                    continue
                if nch > 1:
                    x = x[: (x.size // nch) * nch]
                    x = x.reshape(-1, nch).mean(axis=1)
                spf = max(1, int(rate * frame_ms / 1000))
                n = max(1, (x.size + spf - 1) // spf) if x.size else 0
                for i in range(n):
                    fr = x[i * spf:(i + 1) * spf]
                    if fr.size == 0:
                        continue
                    rms = float(np.sqrt(np.mean(fr * fr)))
                    peak = float(np.max(np.abs(fr)))
                    zcr = float(
                        np.mean(np.signbit(fr[1:]) != np.signbit(fr[:-1]))
                    ) if fr.size > 1 else 0.0
                    ids.append(mid)
                    idxs.append(i)
                    totals.append(n)
                    rates.append(rate)
                    feats.append([rms, peak, zcr, float(fr.mean())])
            if ids:  # an all-undecodable batch yields nothing (an empty
                # pandas frame would type the list column float64 and
                # fail Arrow conversion)
                yield pd.DataFrame({
                    "media_id": ids, "frame_idx": idxs, "n_frames": totals,
                    "rate": rates, "feature": feats,
                })

    return df.select("media_id", "content").mapInPandas(
        _frames, schema=frame_schema)


# --------------------------------------------------------------------------
# Baseline JPEG (ITU-T T.81 sequential DCT, 4:4:4) — real codec, no PIL.
#
# The encoder writes spec-valid JFIF: SOI, APP0, DQT (IJG quality-scaled
# K.1/K.2 tables), SOF0, DHT, SOS, entropy-coded MCUs with byte stuffing,
# EOI. Huffman tables are OUR OWN flat canonical tables (every DC symbol
# 8 bits, every AC symbol 9 bits) — DHT carries them, so any conforming
# decoder reads the file; flat tables keep the coder simple without
# changing the format. The decoder reads whatever tables the file
# declares (not just ours), supports multi-table DQT/DHT segments, and
# LOUD-FAILS on progressive SOF2, chroma subsampling, and restart
# intervals rather than producing garbage pixels.

_JPEG_QL = np.array([  # Annex K.1 luminance quantization
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.float64)
_JPEG_QC = np.array([  # Annex K.2 chrominance quantization
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.float64)

_ZZ = np.array([  # zigzag scan order: index i -> (row, col)
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])


def _dct_mat() -> np.ndarray:
    n = np.arange(8)
    T = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16)
    T *= np.sqrt(2.0 / 8.0)
    T[0, :] = np.sqrt(1.0 / 8.0)
    return T


_DCTM = _dct_mat()


def _jpeg_qtabs(quality: int):
    q = min(100, max(1, int(quality)))
    scale = 5000 / q if q < 50 else 200 - 2 * q
    ql = np.clip(np.floor((_JPEG_QL * scale + 50) / 100), 1, 255)
    qc = np.clip(np.floor((_JPEG_QC * scale + 50) / 100), 1, 255)
    return ql, qc


# flat canonical huffman: DC symbols 0..11 all length 8; AC symbols (EOB,
# ZRL, RRRRSSSS for run 0-15 × size 1-10) all length 9. Canonical code
# assignment in HUFFVAL order — 12 < 2^8 and 162 < 2^9, so the reserved
# all-ones code is never assigned.
_DC_SYMS = list(range(12))
_AC_SYMS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]


def _canonical_codes(syms: list[int], length: int) -> dict[int, tuple[int, int]]:
    return {s: (i, length) for i, s in enumerate(syms)}


_DC_CODES = _canonical_codes(_DC_SYMS, 8)
_AC_CODES = _canonical_codes(_AC_SYMS, 9)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, width: int) -> None:
        self.acc = (self.acc << width) | (code & ((1 << width) - 1))
        self.nbits += width
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:          # byte stuffing inside entropy data
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1s per spec


def _mag_bits(v: int) -> tuple[int, int]:
    """JPEG magnitude category: (size, value-bits)."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << s) - 1
    return s, bits


def _dht_segment(tclass: int, tid: int, syms: list[int], length: int) -> bytes:
    bits = [0] * 16
    bits[length - 1] = len(syms)
    body = bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(syms)
    return b"\xff\xc4" + (len(body) + 2).to_bytes(2, "big") + body


def encode_jpeg(pixels: np.ndarray, quality: int = 90) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as baseline sequential JFIF
    (4:4:4, no subsampling). Pure numpy/stdlib — matrix DCT-II per 8×8
    block, IJG-scaled Annex-K quantization, flat canonical huffman."""
    px = np.asarray(pixels, dtype=np.float64)
    h, w = px.shape[0], px.shape[1]
    r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
    Y = 0.299 * r + 0.587 * g + 0.114 * b
    Cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    Cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    ql, qc = _jpeg_qtabs(quality)

    def blocks(chan, q):
        ph = -(-h // 8) * 8
        pw = -(-w // 8) * 8
        c = np.pad(chan, ((0, ph - h), (0, pw - w)), mode="edge") - 128.0
        out = []
        for by in range(0, ph, 8):
            for bx in range(0, pw, 8):
                d = _DCTM @ c[by:by + 8, bx:bx + 8] @ _DCTM.T
                qd = np.round(d / q).astype(np.int64)
                out.append(qd.reshape(-1)[_ZZ])
        return out

    comps = [blocks(Y, ql), blocks(Cb, qc), blocks(Cr, qc)]
    bw = _BitWriter()
    prev_dc = [0, 0, 0]
    for m in range(len(comps[0])):           # MCU = one block per comp
        for ci in range(3):
            zz = comps[ci][m]
            diff = int(zz[0]) - prev_dc[ci]
            prev_dc[ci] = int(zz[0])
            s, vb = _mag_bits(diff)
            code, width = _DC_CODES[s]
            bw.put(code, width)
            if s:
                bw.put(vb, s)
            run = 0
            last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
            for k in range(1, 64):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    c16, w16 = _AC_CODES[0xF0]
                    bw.put(c16, w16)
                    run -= 16
                s, vb = _mag_bits(v)
                code, width = _AC_CODES[(run << 4) | s]
                bw.put(code, width)
                bw.put(vb, s)
                run = 0
            if last_nz < 63:
                code, width = _AC_CODES[0x00]
                bw.put(code, width)
    bw.flush()

    def seg(marker, body):
        return marker + (len(body) + 2).to_bytes(2, "big") + body

    def dqt(tid, q):
        return seg(b"\xff\xdb",
                   bytes([tid]) + bytes(int(q.reshape(-1)[z]) for z in _ZZ))

    sof = seg(b"\xff\xc0", bytes([8]) + h.to_bytes(2, "big")
              + w.to_bytes(2, "big") + bytes([3])
              + bytes([1, 0x11, 0]) + bytes([2, 0x11, 1])
              + bytes([3, 0x11, 1]))
    sos = seg(b"\xff\xda", bytes([3]) + bytes([1, 0x00])
              + bytes([2, 0x11]) + bytes([3, 0x11])
              + bytes([0, 63, 0]))
    app0 = seg(b"\xff\xe0", b"JFIF\x00\x01\x01\x00" + b"\x00\x01\x00\x01"
               + b"\x00\x00")
    return (b"\xff\xd8" + app0 + dqt(0, ql) + dqt(1, qc)
            + _dht_segment(0, 0, _DC_SYMS, 8)
            + _dht_segment(1, 0, _AC_SYMS, 9)
            + _dht_segment(0, 1, _DC_SYMS, 8)
            + _dht_segment(1, 1, _AC_SYMS, 9)
            + sof + sos + bytes(bw.out) + b"\xff\xd9")


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.d = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.d):
                raise ValueError("jpeg: entropy data exhausted")
            b = self.d[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.d) or self.d[self.pos] != 0x00:
                    raise ValueError("jpeg: marker inside entropy data")
                self.pos += 1          # skip stuffed 0x00
            self.acc = b
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _huff_table(bits16: bytes, vals: bytes) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, canonical assignment per T.81 C.2."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits16[ln - 1]):
            table[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("jpeg: invalid huffman code")


def _extend(v: int, s: int) -> int:
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(content: bytes) -> dict:
    """REAL decode of baseline sequential JFIF (SOF0, 4:4:4, no restart
    intervals): marker walk, huffman tables from the file's own DHT
    segments, dequant + matrix IDCT per block, YCbCr→RGB. Same 8-dim
    feature family as decode_bmp. LOUD-FAILS on progressive (SOF2),
    subsampled chroma, and restart intervals."""
    px = _jpeg_px(content)
    h, w = px.shape[0], px.shape[1]
    rgb = px.astype(np.float64)
    means = rgb.mean(axis=(0, 1)) / 255.0
    stds = rgb.std(axis=(0, 1)) / 255.0
    return {
        "width": int(w), "height": int(h),
        "feature": [float(means[0]), float(means[1]), float(means[2]),
                    float(stds[0]), float(stds[1]), float(stds[2]),
                    float(rgb.mean()) / 255.0, float(w) / float(max(h, 1))],
    }


def _jpeg_px(content: bytes) -> np.ndarray:
    c = content or b""
    if c[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    sof = None
    scan_comps = None
    data_start = None
    while pos < len(c):
        if c[pos] != 0xFF:
            raise ValueError("jpeg: marker sync lost")
        m = c[pos + 1]
        if m == 0xD9:                 # EOI
            break
        if m in (0x01,) or 0xD0 <= m <= 0xD7:
            pos += 2
            continue
        ln = int.from_bytes(c[pos + 2:pos + 4], "big")
        body = c[pos + 4:pos + 2 + ln]
        if m == 0xDB:                 # DQT (possibly several tables)
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 0xF
                if prec != 0:
                    raise NotImplementedError("jpeg: 16-bit quant tables")
                q = np.zeros(64)
                q[_ZZ] = np.frombuffer(body[i + 1:i + 65], dtype=np.uint8)
                qtabs[tid] = q.reshape(8, 8)
                i += 65
        elif m == 0xC4:               # DHT (possibly several tables)
            i = 0
            while i < len(body):
                tclass, tid = body[i] >> 4, body[i] & 0xF
                bits16 = body[i + 1:i + 17]
                n = sum(bits16)
                vals = body[i + 17:i + 17 + n]
                htabs[(tclass, tid)] = _huff_table(bits16, vals)
                i += 17 + n
        elif m == 0xC0:               # SOF0 baseline
            hh = int.from_bytes(body[1:3], "big")
            ww = int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            comps = []
            for k in range(ncomp):
                cid, samp, qid = body[6 + 3 * k:9 + 3 * k]
                if samp != 0x11:
                    raise NotImplementedError(
                        "jpeg: chroma subsampling not supported (4:4:4 only)")
                comps.append((cid, qid))
            sof = (hh, ww, comps)
        elif m in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"jpeg: SOF{m - 0xC0} not baseline")
        elif m == 0xDD:
            raise NotImplementedError("jpeg: restart intervals")
        elif m == 0xDA:               # SOS
            ns = body[0]
            scan_comps = [
                (body[1 + 2 * k], body[2 + 2 * k] >> 4, body[2 + 2 * k] & 0xF)
                for k in range(ns)
            ]
            data_start = pos + 2 + ln
            break
        pos += 2 + ln
    if sof is None or scan_comps is None:
        raise ValueError("jpeg: missing SOF0/SOS")
    h, w, comps = sof
    if len(comps) != 3 or len(scan_comps) != 3:
        raise NotImplementedError("jpeg: only 3-component YCbCr supported")
    end = c.rfind(b"\xff\xd9")
    br = _BitReader(c[data_start:end if end > data_start else len(c)])
    bh, bw_ = -(-h // 8), -(-w // 8)
    planes = [np.zeros((bh * 8, bw_ * 8)) for _ in range(3)]
    prev_dc = [0, 0, 0]
    qmap = {cid: qid for cid, qid in comps}
    for by in range(bh):
        for bx in range(bw_):
            for ci, (cid, dcid, acid) in enumerate(scan_comps):
                dct = htabs.get((0, dcid))
                act = htabs.get((1, acid))
                q = qtabs.get(qmap[cid])
                if dct is None or act is None or q is None:
                    raise ValueError("jpeg: missing table for component")
                zz = np.zeros(64, dtype=np.int64)
                s = _huff_decode(br, dct)
                diff = _extend(br.bits(s), s) if s else 0
                prev_dc[ci] += diff
                zz[0] = prev_dc[ci]
                k = 1
                while k < 64:
                    sym = _huff_decode(br, act)
                    if sym == 0x00:
                        break
                    if sym == 0xF0:
                        k += 16
                        continue
                    run, size = sym >> 4, sym & 0xF
                    k += run
                    if k > 63:
                        raise ValueError("jpeg: AC index out of range")
                    zz[k] = _extend(br.bits(size), size)
                    k += 1
                blk = np.zeros(64)
                blk[_ZZ] = zz
                d = blk.reshape(8, 8) * q
                p = _DCTM.T @ d @ _DCTM + 128.0
                planes[ci][by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = p
    Y = planes[0][:h, :w]
    Cb = planes[1][:h, :w] - 128.0
    Cr = planes[2][:h, :w] - 128.0
    r = Y + 1.402 * Cr
    g = Y - 0.344136 * Cb - 0.714136 * Cr
    b = Y + 1.772 * Cb
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)


def _media_px(content: bytes) -> "np.ndarray | None":
    """RGB (h, w, 3) uint8 array for a decodable image payload, None for
    audio/unknown — the color twin of gray_pixels, same routing."""
    c = content or b""
    try:
        if (len(c) >= 54 and c[:2] == b"BM"
                and int.from_bytes(c[14:18], "little") in _DIB_SIZES):
            bpp = int.from_bytes(c[28:30], "little")
            comp = int.from_bytes(c[30:34], "little")
            if bpp != 24 or comp != 0:
                return None
            data_off = int.from_bytes(c[10:14], "little")
            w = int.from_bytes(c[18:22], "little", signed=True)
            h = int.from_bytes(c[22:26], "little", signed=True)
            return _bmp_px(c, data_off, w, h).astype(np.uint8)
        if c[:8] == _PNG_SIG:
            return _png_px(c)[:, :, :3].astype(np.uint8)
        if c[:6] in (b"GIF87a", b"GIF89a"):
            return _gif_px(c).astype(np.uint8)
        if c[:2] == b"\xff\xd8":
            return _jpeg_px(c)
    except (ValueError, NotImplementedError):
        return None
    return None


def bilinear_resize(px: np.ndarray, height: int, width: int) -> np.ndarray:
    """Deterministic bilinear resample (align-centers convention, the
    standard INTER_LINEAR geometry) — pure numpy, used by resize_images."""
    h, w = px.shape[0], px.shape[1]
    y = (np.arange(height) + 0.5) * h / height - 0.5
    x = (np.arange(width) + 0.5) * w / width - 0.5
    fy = (y - np.floor(y))[:, None, None]
    fx = (x - np.floor(x))[None, :, None]
    y0 = np.clip(np.floor(y).astype(int), 0, h - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x0 = np.clip(np.floor(x).astype(int), 0, w - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    p = px.astype(np.float64)
    top = p[y0][:, x0] * (1 - fx) + p[y0][:, x1] * fx
    bot = p[y1][:, x0] * (1 - fx) + p[y1][:, x1] * fx
    return np.clip(np.round(top * (1 - fy) + bot * fy), 0, 255).astype(
        np.uint8)


def resize_images(
    df: DataFrame, width: int = 224, height: int = 224
) -> DataFrame:
    """REAL image resize over binary media columns (supersedes
    resize_stub for decodable payloads): decode via the real
    BMP/PNG/GIF/JPEG codecs, bilinear-resample to (height, width),
    re-encode as lossless BMP. Non-image payloads (audio, unknown
    formats) keep resize_stub's deterministic placeholder so the batch
    shape (binary in → fixed-dim binary out) never branches by kind
    downstream. Same mapInPandas boundary as every codec op."""
    n_out = max(1, width * height // 64)

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for c in pdf["content"]:
                px = _media_px(c)
                if px is None:
                    seed = hashlib.sha256(c or b"").digest()
                    reps = (n_out + len(seed) - 1) // len(seed)
                    out.append((seed * reps)[:n_out])
                else:
                    out.append(encode_bmp(bilinear_resize(px, height, width)))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "content": out,
                "width": width,
                "height": height,
            })

    return df.select("media_id", "kind", "content").mapInPandas(
        _resize, schema=RESIZED_SCHEMA)
