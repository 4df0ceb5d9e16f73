"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side machinery (schemas, partition-friendly batch shapes,
mapInPandas signatures) is real and tested. Decoders in ``MEDIA_DECODERS``:
the IMAGE path really decodes PNG (pure stdlib: zlib inflate + scanline
unfilter, dimensions + per-channel means as features), the AUDIO path
really decodes PCM WAV (RIFF parse + sample statistics), and the VIDEO
path really decodes animated GIF (variable-width LZW + even frame
sampling). Each falls back to a deterministic sha256 fake for codecs not
in this container (JPEG/WebP/MP3/MP4/…). Swapping a fake for a real
decoder (PIL/ffmpeg) changes no Spark code.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as Ty

MEDIA_SCHEMA = Ty.StructType([
    Ty.StructField("media_id", Ty.LongType(), False),
    Ty.StructField("kind", Ty.StringType(), False),  # image | audio | video
    Ty.StructField("mime", Ty.StringType(), True),
    Ty.StructField("payload", Ty.BinaryType(), True),
    Ty.StructField("meta", Ty.MapType(Ty.StringType(), Ty.StringType()), True),
])

FEATURE_SCHEMA = Ty.StructType([
    Ty.StructField("media_id", Ty.LongType(), False),
    Ty.StructField("kind", Ty.StringType(), False),
    Ty.StructField("n_bytes", Ty.IntegerType(), True),
    Ty.StructField("digest", Ty.StringType(), True),
    Ty.StructField("feature", Ty.ArrayType(Ty.FloatType()), True),
])


PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes, want_pixels: bool = False) -> dict | None:
    """REAL pure-stdlib PNG decode (zlib inflate + scanline unfilter) —
    no codec library needed. Supports the common web shapes: 8-bit
    greyscale / RGB / RGBA, non-interlaced. Returns
    {width, height, channels, means: [per-channel pixel mean 0-1]} or
    None when the payload is not a decodable PNG (caller falls back).
    ``want_pixels=True`` adds ``pixels``: the full unfiltered buffer as
    row-major channel-interleaved bytes (what :func:`box_resize`
    consumes)."""
    import struct
    import zlib

    if len(payload) < 8 or payload[:8] != PNG_MAGIC:
        return None
    pos, idat, hdr = 8, [], None
    try:
        while pos + 8 <= len(payload):
            (length,), ctype = struct.unpack(">I", payload[pos:pos + 4]), \
                payload[pos + 4:pos + 8]
            data = payload[pos + 8:pos + 8 + length]
            if ctype == b"IHDR":
                hdr = struct.unpack(">IIBBBBB", data)
            elif ctype == b"IDAT":
                idat.append(data)
            elif ctype == b"IEND":
                break
            pos += 12 + length  # length + type + data + crc
        if hdr is None or not idat:
            return None
        width, height, depth, color, _comp, _filt, interlace = hdr
        n_chan = {0: 1, 2: 3, 6: 4}.get(color)
        if n_chan is None or depth != 8 or interlace != 0:
            return None  # exotic shape — fall back to the hash stub
        raw = zlib.decompress(b"".join(idat))
        stride = width * n_chan
        if len(raw) != height * (stride + 1):
            return None
        sums = [0] * n_chan
        buf = bytearray() if want_pixels else None
        prev = bytearray(stride)
        for y in range(height):
            off = y * (stride + 1)
            ftype, line = raw[off], bytearray(raw[off + 1:off + 1 + stride])
            for x in range(stride):
                a = line[x - n_chan] if x >= n_chan else 0
                b = prev[x]
                c = prev[x - n_chan] if x >= n_chan else 0
                if ftype == 1:
                    line[x] = (line[x] + a) & 0xFF
                elif ftype == 2:
                    line[x] = (line[x] + b) & 0xFF
                elif ftype == 3:
                    line[x] = (line[x] + (a + b) // 2) & 0xFF
                elif ftype == 4:
                    line[x] = (line[x] + _paeth(a, b, c)) & 0xFF
            for x in range(stride):
                sums[x % n_chan] += line[x]
            if buf is not None:
                buf += line
            prev = line
        n_px = width * height
        out = {
            "width": width, "height": height, "channels": n_chan,
            "means": [s / (255.0 * n_px) for s in sums],
        }
        if buf is not None:
            out["pixels"] = bytes(buf)
        return out
    except Exception:
        return None  # corrupt payload — not an image we can decode


def _decode_image(payload: bytes) -> list[float]:
    """Image feature vector: REAL PNG decode (dimensions + channel means)
    when the payload is a PNG; deterministic sha256 fake otherwise (JPEG/
    WebP codecs are not in this container — swapping in PIL here changes
    no Spark code). 8 dims either way, so the Spark schema/batch shape is
    payload-independent."""
    png = decode_png(payload)
    if png is not None:
        means = (png["means"] + [0.0] * 4)[:4]
        return [
            min(png["width"] / 65535.0, 1.0),
            min(png["height"] / 65535.0, 1.0),
            *means,
            png["channels"] / 4.0,
            1.0,  # "decoded for real" flag
        ]
    d = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in d[:8]]


def decode_wav(payload: bytes) -> dict | None:
    """REAL pure-stdlib WAV (RIFF/PCM) decode: header parse + 16-bit or
    8-bit PCM sample statistics. Returns {rate, channels, n_samples,
    mean_abs, peak} (amplitudes normalized to 0-1) or None when the
    payload is not decodable PCM WAV (caller falls back)."""
    import struct

    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    try:
        pos, fmt, data = 12, None, None
        while pos + 8 <= len(payload):
            cid, clen = payload[pos:pos + 4], struct.unpack(
                "<I", payload[pos + 4:pos + 8])[0]
            body = payload[pos + 8:pos + 8 + clen]
            if cid == b"fmt ":
                fmt = struct.unpack("<HHIIHH", body[:16])
            elif cid == b"data":
                data = body
            pos += 8 + clen + (clen & 1)  # chunks are word-aligned
        if fmt is None or data is None:
            return None
        audio_fmt, channels, rate, _bps, _align, bits = fmt
        if audio_fmt != 1 or bits not in (8, 16) or channels < 1:
            return None  # non-PCM / exotic depth — fall back
        if bits == 16:
            n = len(data) // 2
            samples = struct.unpack(f"<{n}h", data[:n * 2])
            scale = 32768.0
        else:
            samples = [s - 128 for s in data]
            scale = 128.0
        if not samples:
            return None
        absvals = [abs(s) for s in samples]
        return {
            "rate": rate, "channels": channels,
            "n_samples": len(samples) // channels,
            "mean_abs": sum(absvals) / (len(absvals) * scale),
            "peak": max(absvals) / scale,
        }
    except Exception:
        return None


def _decode_audio(payload: bytes) -> list[float]:
    """Audio feature vector: REAL PCM WAV decode (rate, duration,
    amplitude stats) when the payload is RIFF/WAVE; deterministic sha256
    fake otherwise (compressed codecs are not in this container). 4 dims
    either way — payload-independent batch shape."""
    wav = decode_wav(payload)
    if wav is not None:
        return [
            min(wav["rate"] / 96000.0, 1.0),
            min(wav["n_samples"] / (wav["rate"] * 60.0), 1.0),  # ≤1 min cap
            wav["mean_abs"],
            wav["peak"],
        ]
    d = hashlib.sha256(b"audio:" + payload).digest()
    return [b / 255.0 for b in d[:4]]


def _gif_lzw_decode(min_code_size: int, data: bytes, max_pixels: int) -> list[int] | None:
    """Variable-width GIF LZW decode (LSB-first bit packing, CLEAR/END
    codes, 12-bit table cap) → palette-index list, or None on corruption."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    table: dict[int, tuple[int, ...]] = {i: (i,) for i in range(clear)}
    next_code = end + 1
    out: list[int] = []
    prev: tuple[int, ...] | None = None
    bitpos, nbits = 0, len(data) * 8
    while True:
        if bitpos + code_size > nbits:
            break
        code = 0
        for k in range(code_size):
            code |= ((data[bitpos >> 3] >> (bitpos & 7)) & 1) << k
            bitpos += 1
        if code == end:
            break
        if code == clear:
            table = {i: (i,) for i in range(clear)}
            next_code = end + 1
            code_size = min_code_size + 1
            prev = None
            continue
        if prev is None:
            entry = table.get(code)
            if entry is None:
                return None
        elif code in table:
            entry = table[code]
            table[next_code] = prev + (entry[0],)
            next_code += 1
        elif code == next_code:  # the KwKwK self-reference case
            entry = prev + (prev[0],)
            table[next_code] = entry
            next_code += 1
        else:
            return None
        if next_code == (1 << code_size) and code_size < 12:
            code_size += 1
        out.extend(entry)
        prev = entry
        if len(out) >= max_pixels:
            break
    return out


GIF_MAGICS = (b"GIF87a", b"GIF89a")


def decode_gif(payload: bytes, sample_frames: int = 4) -> dict | None:
    """REAL pure-stdlib GIF decode + frame sampler (same spirit as the PNG
    path: no codec library). Parses the logical screen + color tables,
    walks every image descriptor (skipping extension blocks), LZW-decodes
    up to ``sample_frames`` frames evenly spaced across the animation, and
    maps palette indices through the active color table. Returns
    {width, height, n_frames, means: [r, g, b] over sampled frames, 0-1}
    or None when the payload is not a decodable GIF (caller falls back).
    Interlaced frames need no row reordering: channel MEANS are
    pixel-order-independent."""
    import struct

    if len(payload) < 13 or payload[:6] not in GIF_MAGICS:
        return None
    try:
        width, height = struct.unpack("<HH", payload[6:10])
        flags = payload[10]
        pos, gct = 13, None
        if flags & 0x80:
            n = 2 << (flags & 7)
            gct = payload[pos:pos + 3 * n]
            pos += 3 * n
        frames = []  # (fw, fh, color_table, min_code_size, lzw_bytes)
        while pos < len(payload):
            b0 = payload[pos]
            if b0 == 0x3B:  # trailer
                break
            if b0 == 0x21:  # extension: label byte + data sub-blocks
                pos += 2
                while payload[pos] != 0:
                    pos += 1 + payload[pos]
                pos += 1
            elif b0 == 0x2C:  # image descriptor
                _fx, _fy, fw, fh, ff = struct.unpack(
                    "<HHHHB", payload[pos + 1:pos + 10])
                pos += 10
                lct = None
                if ff & 0x80:
                    n = 2 << (ff & 7)
                    lct = payload[pos:pos + 3 * n]
                    pos += 3 * n
                mcs = payload[pos]
                pos += 1
                chunks = []
                while payload[pos] != 0:
                    ln = payload[pos]
                    chunks.append(payload[pos + 1:pos + 1 + ln])
                    pos += 1 + ln
                pos += 1
                frames.append((fw, fh, lct or gct, mcs, b"".join(chunks)))
            else:
                return None
        if not frames:
            return None
        n_frames = len(frames)
        k = min(sample_frames, n_frames)
        idxs = sorted({round(i * (n_frames - 1) / (k - 1)) for i in range(k)}) \
            if k > 1 else [0]
        sums, n_px = [0, 0, 0], 0
        for fi in idxs:
            fw, fh, ct, mcs, data = frames[fi]
            if ct is None or not (0 < fw * fh):
                return None
            px = _gif_lzw_decode(mcs, data, fw * fh)
            if px is None or len(px) < fw * fh:
                return None
            for p in px[:fw * fh]:
                base = 3 * p
                if base + 3 > len(ct):
                    return None
                sums[0] += ct[base]
                sums[1] += ct[base + 1]
                sums[2] += ct[base + 2]
            n_px += fw * fh
        return {
            "width": width, "height": height, "n_frames": n_frames,
            "means": [s / (255.0 * n_px) for s in sums],
        }
    except Exception:
        return None  # corrupt payload — not a GIF we can decode


def _decode_video(payload: bytes) -> list[float]:
    """Video feature vector: REAL GIF decode + frame sampling (dimensions,
    frame count, sampled-frame channel means) when the payload is GIF;
    deterministic sha256 fake otherwise (MP4/WebM need ffmpeg, which this
    container lacks — swapping it in changes no Spark code). 6 dims either
    way — payload-independent batch shape."""
    gif = decode_gif(payload)
    if gif is not None:
        return [
            min(gif["width"] / 65535.0, 1.0),
            min(gif["height"] / 65535.0, 1.0),
            min(gif["n_frames"] / 255.0, 1.0),
            *gif["means"],
        ]
    d = hashlib.sha256(b"video:" + payload).digest()
    return [b / 255.0 for b in d[:6]]


MEDIA_DECODERS = {
    "image": _decode_image,  # REAL for PNG; hash fake for other codecs
    "audio": _decode_audio,  # REAL for PCM WAV; hash fake otherwise
    "video": _decode_video,  # REAL for GIF; hash fake for ffmpeg codecs
}


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads. The payload
    column stays off the shuffle: output carries only small features."""

    def batches(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                if payload is None:
                    rows.append((int(mid), kind, None, None, None))
                    continue
                payload = bytes(payload)
                dec = MEDIA_DECODERS.get(kind)
                feat = dec(payload) if dec else None
                rows.append((
                    int(mid), kind, len(payload),
                    hashlib.sha256(payload).hexdigest(), feat,
                ))
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "n_bytes", "digest", "feature"]
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        batches, schema=FEATURE_SCHEMA
    )


def box_resize(
    pixels: bytes, width: int, height: int, channels: int,
    out_w: int, out_h: int,
) -> list[float]:
    """EXACT area-average (box) resample to ``out_h × out_w``, RGB.

    Integer-exact weighting for ANY scale ratio: scale the y axis by
    ``out_h`` and the x axis by ``out_w`` so every source-pixel /
    output-cell overlap is an integer (`min((y+1)·oh, (j+1)·H) −
    max(y·oh, j·H)`); each cell's total weight is then exactly ``H·W``,
    so one float division per output value at the end — deterministic
    across platforms, no accumulated rounding. Greyscale is replicated
    to RGB, alpha is dropped. Returns ``out_h·out_w·3`` floats in 0-1,
    row-major, channel-interleaved."""
    if width <= 0 or height <= 0 or out_w <= 0 or out_h <= 0:
        raise ValueError("dimensions must be positive")

    def spans(n_in: int, n_out: int) -> list[list[tuple[int, int]]]:
        # per output index: the (source index, integer overlap) pairs
        out = []
        for j in range(n_out):
            lo, hi = j * n_in, (j + 1) * n_in  # cell bounds × n_out scale
            first, last = lo // n_out, (hi - 1) // n_out
            out.append([
                (y, min(hi, (y + 1) * n_out) - max(lo, y * n_out))
                for y in range(first, last + 1)
            ])
        return out

    ys, xs = spans(height, out_h), spans(width, out_w)
    rgb = (0, 1, 2) if channels >= 3 else (0, 0, 0)
    den = float(height * width) * 255.0
    vals: list[float] = []
    for yspan in ys:
        for xspan in xs:
            acc = [0, 0, 0]
            for y, wy in yspan:
                row_off = y * width * channels
                for x, wx in xspan:
                    off = row_off + x * channels
                    w = wy * wx
                    for c in range(3):
                        acc[c] += w * pixels[off + rgb[c]]
            vals.extend(a / den for a in acc)
    return vals


RESIZE_SCHEMA = Ty.StructType([
    Ty.StructField("media_id", Ty.LongType(), False),
    Ty.StructField("kind", Ty.StringType(), False),
    Ty.StructField("src_w", Ty.IntegerType(), False),
    Ty.StructField("src_h", Ty.IntegerType(), False),
    Ty.StructField("pixels", Ty.ArrayType(Ty.DoubleType()), False),
    Ty.StructField("decoded", Ty.BooleanType(), False),
])


def _resize_payload(
    payload: bytes, out_h: int, out_w: int
) -> tuple[int, int, list[float], bool]:
    """PNG payloads get the REAL decode + exact box resample; anything
    else gets a deterministic sha256-derived fake of the SAME shape
    (``out_h·out_w·3`` floats, digest bytes cycled) so the Spark schema
    and batch shape are payload-independent — the extract_features
    convention. ``src_w/src_h`` are ``-1`` sentinels on the fallback
    (driver rows ship NULL-free columns)."""
    dec = decode_png(payload, want_pixels=True)
    if dec is not None:
        return (
            dec["width"], dec["height"],
            box_resize(dec["pixels"], dec["width"], dec["height"],
                       dec["channels"], out_w, out_h),
            True,
        )
    d = hashlib.sha256(payload).digest()
    return (-1, -1,
            [d[i % 32] / 255.0 for i in range(out_h * out_w * 3)], False)


def resize_images(
    media: DataFrame, out_h: int = 8, out_w: int = 8
) -> DataFrame:
    """Arrow-batched thumbnail resize over binary payloads — the
    'resize' leg of the multimodal plumbing (decode / feature-extract /
    resize / frame-sample). Same scale shape as
    :func:`extract_features`: the payload never crosses a shuffle, the
    output is a fixed ``out_h·out_w·3`` vector per row, and swapping
    the pure-stdlib PNG path for PIL/ffmpeg changes no Spark code."""

    def batches(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for mid, kind, payload in zip(
                    pdf["media_id"], pdf["kind"], pdf["payload"]):
                if payload is None:
                    rows.append((int(mid), kind, -1, -1, [], False))
                    continue
                w, h, px, real = _resize_payload(
                    bytes(payload), out_h, out_w)
                rows.append((int(mid), kind, w, h, px, real))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "kind", "src_w", "src_h",
                         "pixels", "decoded"])

    return media.select("media_id", "kind", "payload").mapInPandas(
        batches, schema=RESIZE_SCHEMA)


def synthetic_media(spark, n: int = 50, seed: int = 42) -> DataFrame:
    """Deterministic fixture media table."""
    import random

    rng = random.Random(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rng.randrange(256) for _ in range(64 + (i % 5) * 16))
        rows.append((i, kind, f"application/x-fixture-{kind}", payload,
                     {"w": str(64 + i), "h": str(48 + i)} if kind == "image" else {}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
