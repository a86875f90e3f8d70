"""Multimodal column plumbing: image/audio/video as opaque binary columns.

Image HEADER decoding (PNG IHDR / JPEG SOF / GIF logical screen) is REAL —
pure-Python byte parsing, no imaging library needed — as is nearest-neighbor
resize over raw interleaved uint8 payloads (numpy). Only the lossy-codec
pixel decode and model-inference feature extraction remain deterministic
fakes (``mode="stub"``): those genuinely need PIL/librosa, absent in this
container. The Spark-side plumbing — schema, Arrow batch shape, mapInPandas
signatures, partitioning — is production-shaped throughout.
"""

from __future__ import annotations

import hashlib
import struct as _struct
import zlib as _zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ]
)


def attach_binary_metadata(df: DataFrame, binary_col: str) -> DataFrame:
    """Typed metadata columns computable without decoding: byte length and
    a content hash (dedup key) — pure JVM exprs."""
    b = F.col(binary_col)
    return df.withColumn("byte_size", F.length(b)).withColumn("content_hash", F.xxhash64(b))


def _decode_image_stub(payload: bytes) -> dict:
    """Deterministic fake decoder (kept as ``mode="stub"`` so the DuckDB
    oracle can replay it via sha256 SQL). The fake derives stable
    pseudo-dimensions from a content digest so tests are reproducible."""
    h = hashlib.sha256(payload or b"").digest()
    return {
        "width": 64 + h[0] % 192,
        "height": 64 + h[1] % 192,
        "channels": 3,
        "format": "fake/deterministic",
    }


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# PNG color type → sample channels (spec: greyscale, RGB, palette, grey+A, RGBA)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# JPEG frame markers carrying dimensions: SOF0..SOF15 minus DHT/JPG/DAC
_JPEG_SOF = {m for m in range(0xC0, 0xD0)} - {0xC4, 0xC8, 0xCC}


def decode_image_header(payload: bytes) -> dict | None:
    """REAL image header parse — pure Python over the raw bytes, no
    imaging library. Formats: PNG (IHDR width/height/colortype), JPEG
    (first SOFn frame header), GIF87a/89a (logical screen descriptor).
    Returns None for unrecognized/truncated payloads (caller maps that to
    a NULL metadata struct — the 100 TB pipeline must tolerate corrupt
    blobs without failing the task)."""
    if not payload:
        return None
    if payload.startswith(_PNG_SIG) and len(payload) >= 26 and payload[12:16] == b"IHDR":
        w, h = _struct.unpack(">II", payload[16:24])
        color_type = payload[25]
        return {
            "width": w,
            "height": h,
            "channels": _PNG_CHANNELS.get(color_type, 0),
            "format": "png",
        }
    if payload.startswith(b"\xff\xd8"):
        i = 2
        n = len(payload)
        while i + 4 <= n:
            if payload[i] != 0xFF:
                i += 1
                continue
            marker = payload[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:  # no-length markers
                i += 2
                continue
            seglen = _struct.unpack(">H", payload[i + 2 : i + 4])[0]
            if marker in _JPEG_SOF:
                if i + 10 > n:
                    return None
                h, w = _struct.unpack(">HH", payload[i + 5 : i + 9])
                return {"width": w, "height": h, "channels": payload[i + 9], "format": "jpeg"}
            i += 2 + seglen
        return None
    if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
        w, h = _struct.unpack("<HH", payload[6:10])
        return {"width": w, "height": h, "channels": 3, "format": "gif"}
    return None


def _paeth_predict(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _png_unfilter(data: bytes, height: int, stride: int, bpp: int) -> np.ndarray | None:
    """Reverse PNG scanline filtering (spec §9: None/Sub/Up/Average/Paeth)
    over the inflated IDAT stream. Sub and Up are vectorized (per-channel
    cumsum / whole-row add); Average and Paeth are sequential in x by
    definition, so those rows fall back to a per-byte loop. Returns the
    (height, stride) uint8 matrix or None on malformed input."""
    if len(data) != height * (1 + stride):
        return None
    out = np.empty((height, stride), dtype=np.uint8)
    zero = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(height):
        ftype = data[pos]
        row = np.frombuffer(data, dtype=np.uint8, count=stride, offset=pos + 1)
        pos += 1 + stride
        prev = out[y - 1] if y else zero
        if ftype == 0:
            out[y] = row
        elif ftype == 1:  # Sub: cumulative sum along x within each byte lane
            out[y] = row.reshape(-1, bpp).cumsum(axis=0, dtype=np.uint32).astype(np.uint8).reshape(-1)
        elif ftype == 2:  # Up
            out[y] = row + prev
        elif ftype in (3, 4):
            cur = out[y]
            for i in range(stride):
                a = int(cur[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                if ftype == 3:
                    pred = (a + b) >> 1
                else:
                    c = int(prev[i - bpp]) if i >= bpp else 0
                    pred = _paeth_predict(a, b, c)
                cur[i] = (int(row[i]) + pred) & 0xFF
        else:
            return None
    return out


def decode_png_pixels(payload: bytes) -> dict | None:
    """REAL PNG pixel decode — stdlib only (zlib inflate + numpy
    unfilter), no imaging library. Supports the dominant production
    profile: 8-bit depth, color types 0/2/3/4/6 (palette expands through
    PLTE to RGB), non-interlaced. Returns {width, height, channels,
    pixels} with pixels as the raw interleaved uint8 buffer — the exact
    input contract of resize_images_raw / extract_features_raw — or None
    for unsupported/corrupt payloads (a 100 TB decode stage must tolerate
    bad blobs without failing the task)."""
    hdr = decode_image_header(payload)
    if hdr is None or hdr["format"] != "png":
        return None
    bit_depth, color_type, _, _, interlace = payload[24:29]
    if bit_depth != 8 or interlace != 0 or color_type not in _PNG_CHANNELS:
        return None
    samples = _PNG_CHANNELS[color_type]
    w, h = hdr["width"], hdr["height"]
    # chunk walk: collect IDAT (may be split) and PLTE
    idat = bytearray()
    plte = None
    i, n = 8, len(payload)
    while i + 8 <= n:
        (clen,) = _struct.unpack(">I", payload[i : i + 4])
        ctype = payload[i + 4 : i + 8]
        body = payload[i + 8 : i + 8 + clen]
        if len(body) != clen:
            return None
        if ctype == b"IDAT":
            idat += body
        elif ctype == b"PLTE":
            plte = body
        elif ctype == b"IEND":
            break
        i += 12 + clen  # len + type + body + crc
    if not idat:
        return None
    try:
        raw = _zlib.decompress(bytes(idat))
    except _zlib.error:
        return None
    img = _png_unfilter(raw, h, w * samples, samples)
    if img is None:
        return None
    if color_type == 3:  # palette → RGB
        if plte is None or len(plte) % 3:
            return None
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = img.reshape(h, w)
        if idx.max(initial=0) >= len(pal):
            return None
        img = pal[idx].reshape(h, -1)
        samples = 3
    return {"width": w, "height": h, "channels": samples, "pixels": img.tobytes()}


def encode_png(pixels: bytes, width: int, height: int, channels: int, filters: str | int = "mixed") -> bytes:
    """Minimal REAL PNG encoder (stdlib zlib, valid CRCs) used to
    synthesize decodable fixtures and round-trip tests. ``filters``
    selects the per-scanline filter: an int 0-4 applies that filter to
    every row; ``"mixed"`` cycles row % 5 so a decode round-trip
    exercises all five unfilter branches."""
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer size mismatch")
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    img = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width * channels)
    bpp = channels
    lines = bytearray()
    zero = np.zeros(width * channels, dtype=np.uint8)
    for y in range(height):
        ftype = (y % 5) if filters == "mixed" else int(filters)
        cur = img[y].astype(np.int32)
        prev = (img[y - 1] if y else zero).astype(np.int32)
        left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]]) if len(cur) > bpp else np.zeros_like(cur)
        upleft = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]]) if len(prev) > bpp else np.zeros_like(prev)
        if ftype == 0:
            filt = cur
        elif ftype == 1:
            filt = cur - left
        elif ftype == 2:
            filt = cur - prev
        elif ftype == 3:
            filt = cur - ((left + prev) >> 1)
        else:
            pred = np.array([_paeth_predict(int(a), int(b), int(c)) for a, b, c in zip(left, prev, upleft)], np.int32)
            filt = cur - pred
        lines.append(ftype)
        lines += (filt & 0xFF).astype(np.uint8).tobytes()

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return _struct.pack(">I", len(body)) + ctype + body + _struct.pack(">I", _zlib.crc32(ctype + body))

    ihdr = _struct.pack(">II", width, height) + bytes([8, color_type, 0, 0, 0])
    return _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", _zlib.compress(bytes(lines))) + chunk(b"IEND", b"")


def decode_pixels(df: DataFrame, binary_col: str = "payload") -> DataFrame:
    """mapInPandas full pixel decode (currently PNG — the one production
    codec whose compression is stdlib zlib): emits (pixels, width,
    height, channels) columns whose pixel buffer feeds resize_images_raw
    / extract_features_raw / frame_sample_raw directly. Unsupported or
    corrupt payloads yield NULLs, not task failures."""
    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("pixels", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("channels", T.IntegerType()),
        ]
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            px, ws, hs, cs = [], [], [], []
            for p in pdf[binary_col]:
                d = decode_png_pixels(p)
                px.append(d["pixels"] if d else None)
                ws.append(d["width"] if d else None)
                hs.append(d["height"] if d else None)
                cs.append(d["channels"] if d else None)
            pdf = pdf.copy()
            pdf["pixels"], pdf["width"], pdf["height"], pdf["channels"] = px, ws, hs, cs
            yield pdf

    return df.mapInPandas(decode, schema=out_schema)


def decode_images(df: DataFrame, binary_col: str = "payload", mode: str = "header") -> DataFrame:
    """mapInPandas decode: Arrow batches of binary → metadata struct. The
    batch shape (iterator of pdf) is the real 100 TB pattern — decoding
    streams per-partition without materializing the table.

    ``mode="header"`` (default) parses REAL PNG/JPEG/GIF headers from the
    bytes; unrecognized payloads yield a NULL struct. ``mode="stub"``
    keeps the sha256-derived deterministic fake (SQL-replayable oracle)."""
    out_schema = T.StructType(df.schema.fields + [T.StructField("image_meta", IMAGE_META_SCHEMA)])
    decoder = decode_image_header if mode == "header" else _decode_image_stub

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decoder(p) for p in pdf[binary_col]]
            pdf = pdf.copy()
            pdf["image_meta"] = metas
            yield pdf

    return df.mapInPandas(decode, schema=out_schema)


def extract_features_stub(df: DataFrame, binary_col: str = "payload", dim: int = 8) -> DataFrame:
    """Feature extraction stub: binary → fixed-dim float vector. Real
    impl = model inference per Arrow batch (GPU executor pools); fake =
    digest-derived deterministic vector with the production schema."""
    out_schema = T.StructType(df.schema.fields + [T.StructField("features", T.ArrayType(T.FloatType()))])

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p in pdf[binary_col]:
                h = hashlib.sha256(p or b"").digest()
                feats.append([b / 255.0 for b in h[:dim]])
            pdf = pdf.copy()
            pdf["features"] = feats
            yield pdf

    return df.mapInPandas(extract, schema=out_schema)


def frame_sample_stub(df: DataFrame, binary_col: str = "payload", every_n: int = 10) -> DataFrame:
    """Video frame-sampling stub: one row per sampled frame (explode
    shape). Real impl decodes with ffmpeg per batch; fake emits
    deterministic frame indices. Output schema carries (frame_idx,
    frame_payload) — the downstream image pipeline's input contract."""
    out_schema = T.StructType(
        [f for f in df.schema.fields]
        + [T.StructField("frame_idx", T.IntegerType()), T.StructField("frame_payload", T.BinaryType())]
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                payload = row[binary_col] or b""
                n_frames = 1 + (len(payload) % 5)
                for i in range(0, n_frames, 1):
                    r = dict(row)
                    r["frame_idx"] = i * every_n
                    r["frame_payload"] = hashlib.sha256(payload + bytes([i])).digest()
                    rows.append(r)
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.mapInPandas(sample, schema=out_schema)


def _resize_nearest(buf: bytes, w: int, h: int, c: int, out_w: int, out_h: int) -> bytes | None:
    """Nearest-neighbor resample of a raw interleaved uint8 image buffer
    (H×W×C). Pure numpy — the sampling grid matches the standard
    pixel-center convention src = floor((dst + 0.5) * scale)."""
    if w <= 0 or h <= 0 or c <= 0 or len(buf) != w * h * c:
        return None
    img = np.frombuffer(buf, dtype=np.uint8).reshape(h, w, c)
    ys = np.minimum(((np.arange(out_h) + 0.5) * (h / out_h)).astype(np.int64), h - 1)
    xs = np.minimum(((np.arange(out_w) + 0.5) * (w / out_w)).astype(np.int64), w - 1)
    return img[ys][:, xs].tobytes()


def resize_images_raw(
    df: DataFrame,
    binary_col: str = "payload",
    width_col: str = "width",
    height_col: str = "height",
    channels_col: str = "channels",
    out_width: int = 224,
    out_height: int = 224,
) -> DataFrame:
    """REAL resize over raw interleaved uint8 payloads (the post-codec
    representation a decode stage emits): nearest-neighbor resample per
    Arrow batch via numpy — no imaging library involved. Input rows carry
    (payload, width, height, channels); malformed rows (size mismatch)
    yield NULL payloads instead of failing the task. Codec-compressed
    inputs (PNG/JPEG bytes) must be pixel-decoded first — that step needs
    a codec library and stays behind ``mode="stub"`` in decode_images."""
    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("resized_payload", T.BinaryType()),
            T.StructField("resized_width", T.IntegerType()),
            T.StructField("resized_height", T.IntegerType()),
        ]
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                _resize_nearest(p, int(w), int(h), int(c), out_width, out_height)
                for p, w, h, c in zip(pdf[binary_col], pdf[width_col], pdf[height_col], pdf[channels_col])
            ]
            pdf = pdf.copy()
            pdf["resized_payload"] = out
            pdf["resized_width"] = out_width
            pdf["resized_height"] = out_height
            yield pdf

    return df.mapInPandas(resize, schema=out_schema)


# ------------------------------------------------------------------ audio
AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("bits_per_sample", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("format", T.StringType()),
    ]
)


def decode_audio_header(payload: bytes) -> dict | None:
    """REAL audio header parse — pure Python, no audio library. Formats:
    WAV (RIFF chunk walk: fmt → channels/rate/bits, data → sample count)
    and FLAC (STREAMINFO bitfield: 20-bit rate, 3-bit channels, 5-bit
    depth, 36-bit total samples). Returns None for unrecognized or
    truncated payloads — corrupt blobs must not fail the task."""
    if not payload or len(payload) < 12:
        return None
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        i, n = 12, len(payload)
        meta: dict = {}
        while i + 8 <= n:
            cid = payload[i : i + 4]
            clen = _struct.unpack("<I", payload[i + 4 : i + 8])[0]
            if cid == b"fmt " and i + 24 <= n:
                ch, rate = _struct.unpack("<HI", payload[i + 10 : i + 16])
                block_align, bits = _struct.unpack("<HH", payload[i + 20 : i + 24])
                meta.update(channels=ch, sample_rate=rate, bits_per_sample=bits,
                            _block_align=block_align)
            elif cid == b"data" and "_block_align" in meta:
                ba = meta.pop("_block_align") or 1
                meta["n_samples"] = clen // ba
                meta["format"] = "wav"
                return meta
            i += 8 + clen + (clen & 1)  # RIFF chunks pad to even
        return None
    if payload[:4] == b"fLaC" and len(payload) >= 4 + 4 + 34:
        # first metadata block must be STREAMINFO (type bits 0-6 == 0)
        if payload[4] & 0x7F != 0:
            return None
        si = payload[8 : 8 + 34]
        # bytes 10..17: rate(20) | channels-1(3) | bits-1(5) | total(36)
        bits64 = int.from_bytes(si[10:18], "big")
        rate = bits64 >> 44
        ch = ((bits64 >> 41) & 0x7) + 1
        depth = ((bits64 >> 36) & 0x1F) + 1
        total = bits64 & ((1 << 36) - 1)
        return {"channels": ch, "sample_rate": rate, "bits_per_sample": depth,
                "n_samples": total, "format": "flac"}
    return None


def decode_audio(df: DataFrame, binary_col: str = "payload") -> DataFrame:
    """mapInPandas audio-header decode — same Arrow-batch shape as
    ``decode_images``: streams per partition, corrupt payloads become a
    NULL struct."""
    out_schema = T.StructType(df.schema.fields + [T.StructField("audio_meta", AUDIO_META_SCHEMA)])

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["audio_meta"] = [decode_audio_header(p) for p in pdf[binary_col]]
            yield pdf

    return df.mapInPandas(decode, schema=out_schema)


def decode_wav_samples(payload: bytes) -> dict | None:
    """REAL WAV PCM sample decode — stdlib/numpy only: RIFF chunk walk to
    the data chunk, then frombuffer at the declared width (8-bit unsigned,
    16/32-bit signed little-endian), normalized to [-1, 1) float64,
    channel-interleaved. Returns {channels, sample_rate, samples} or None
    for non-PCM/corrupt payloads."""
    meta = decode_audio_header(payload)
    if meta is None or meta.get("format") != "wav":
        return None
    bits = meta["bits_per_sample"]
    if bits not in (8, 16, 32):
        return None
    i, n = 12, len(payload)
    while i + 8 <= n:
        cid = payload[i : i + 4]
        clen = _struct.unpack("<I", payload[i + 4 : i + 8])[0]
        if cid == b"data":
            body = payload[i + 8 : i + 8 + clen]
            if len(body) != clen:
                return None
            width = bits // 8
            body = body[: len(body) - len(body) % width]
            if bits == 8:
                s = (np.frombuffer(body, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
            elif bits == 16:
                s = np.frombuffer(body, dtype="<i2").astype(np.float64) / 32768.0
            else:
                s = np.frombuffer(body, dtype="<i4").astype(np.float64) / 2147483648.0
            return {"channels": meta["channels"], "sample_rate": meta["sample_rate"], "samples": s}
        i += 8 + clen + (clen & 1)
    return None


def encode_wav(samples_i16: np.ndarray, channels: int = 1, sample_rate: int = 16000) -> bytes:
    """Minimal REAL WAV (PCM s16le) encoder for fixtures and round-trip
    tests: RIFF + fmt + data with correct sizes and block alignment."""
    body = np.asarray(samples_i16, dtype="<i2").tobytes()
    block_align = channels * 2
    fmt = _struct.pack("<HHIIHH", 1, channels, sample_rate, sample_rate * block_align, block_align, 16)
    data = b"data" + _struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")
    riff_body = b"WAVE" + b"fmt " + _struct.pack("<I", len(fmt)) + fmt + data
    return b"RIFF" + _struct.pack("<I", len(riff_body)) + riff_body


def decode_audio_samples(df: DataFrame, binary_col: str = "payload") -> DataFrame:
    """mapInPandas PCM sample decode: emits an array<double> ``samples``
    column (normalized, interleaved) beside the usual audio_meta fields.
    Same corrupt-tolerant Arrow-batch contract as the header decoders."""
    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("channels", T.IntegerType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("samples", T.ArrayType(T.DoubleType())),
        ]
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ch, sr, ss = [], [], []
            for p in pdf[binary_col]:
                d = decode_wav_samples(p)
                ch.append(d["channels"] if d else None)
                sr.append(d["sample_rate"] if d else None)
                ss.append(d["samples"].tolist() if d else None)
            pdf = pdf.copy()
            pdf["channels"], pdf["sample_rate"], pdf["samples"] = ch, sr, ss
            yield pdf

    return df.mapInPandas(decode, schema=out_schema)


# ------------------------------------------------------------------ video
VIDEO_META_SCHEMA = T.StructType(
    [
        T.StructField("timescale", T.IntegerType()),
        T.StructField("duration_ticks", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("n_tracks", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ]
)


def decode_video_header(payload: bytes) -> dict | None:
    """REAL MP4/ISO-BMFF header parse — pure Python box walk, no codec
    library: top-level boxes (size+fourcc) → moov → mvhd (version 0:
    32-bit timescale/duration; version 1: 64-bit duration), counting
    trak children. Returns None for unrecognized/truncated payloads."""
    n = len(payload)
    if n < 16:
        return None

    def walk(lo: int, hi: int):
        i = lo
        while i + 8 <= hi:
            size = int.from_bytes(payload[i : i + 4], "big")
            typ = payload[i + 4 : i + 8]
            if size < 8 or i + size > hi:
                return
            yield typ, i + 8, i + size
            i += size

    top = {t: (a, b) for t, a, b in walk(0, n)}
    if b"ftyp" not in top or b"moov" not in top:
        return None
    mlo, mhi = top[b"moov"]
    timescale = duration = None
    n_tracks = 0
    for typ, a, b in walk(mlo, mhi):
        if typ == b"mvhd" and b - a >= 20:
            ver = payload[a]
            if ver == 1 and b - a >= 32:
                timescale = int.from_bytes(payload[a + 20 : a + 24], "big")
                duration = int.from_bytes(payload[a + 24 : a + 32], "big")
            else:
                timescale = int.from_bytes(payload[a + 12 : a + 16], "big")
                duration = int.from_bytes(payload[a + 16 : a + 20], "big")
        elif typ == b"trak":
            n_tracks += 1
    if not timescale:
        return None
    return {
        "timescale": timescale,
        "duration_ticks": duration,
        "duration_s": duration / timescale,
        "n_tracks": n_tracks,
        "format": "mp4",
    }


def decode_video(df: DataFrame, binary_col: str = "payload") -> DataFrame:
    """mapInPandas video-header decode — same Arrow-batch contract as
    decode_images/decode_audio; corrupt payloads → NULL struct."""
    out_schema = T.StructType(df.schema.fields + [T.StructField("video_meta", VIDEO_META_SCHEMA)])

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["video_meta"] = [decode_video_header(p) for p in pdf[binary_col]]
            yield pdf

    return df.mapInPandas(decode, schema=out_schema)


def frame_sample_raw(
    df: DataFrame,
    binary_col: str = "payload",
    width_col: str = "width",
    height_col: str = "height",
    channels_col: str = "channels",
    every_n: int = 10,
) -> DataFrame:
    """REAL frame sampling over raw interleaved video buffers (n_frames ×
    h × w × c uint8): numpy strided slice keeps every ``every_n``-th
    frame and emits one row per kept frame (frame_idx, frame_payload) —
    the downstream image pipeline's input contract, content-exact.
    Frame count is derived from the buffer size; ragged/corrupt buffers
    (size not divisible by the frame stride) yield no rows rather than
    failing the task. Compressed containers still need a codec
    (``frame_sample_stub`` documents that boundary); this is the real
    path for decoded/raw intermediates."""
    out_schema = T.StructType(
        [f for f in df.schema.fields]
        + [T.StructField("frame_idx", T.IntegerType()), T.StructField("frame_payload", T.BinaryType())]
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                payload = row[binary_col] or b""
                stride = int(row[width_col]) * int(row[height_col]) * int(row[channels_col])
                if stride <= 0 or len(payload) % stride:
                    continue
                n_frames = len(payload) // stride
                for i in range(0, n_frames, every_n):
                    r = dict(row)
                    r["frame_idx"] = i
                    r["frame_payload"] = payload[i * stride : (i + 1) * stride]
                    rows.append(r)
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.mapInPandas(sample, schema=out_schema)


def extract_features_raw(
    df: DataFrame,
    binary_col: str = "payload",
    width_col: str = "width",
    height_col: str = "height",
    channels_col: str = "channels",
    hist_bins: int = 8,
) -> DataFrame:
    """REAL feature extraction over raw interleaved uint8 image buffers
    (no codec needed): per-channel mean/std plus a ``hist_bins``-bin
    grayscale intensity histogram (normalized), as an array<double>
    feature vector of length 2·channels + hist_bins — a usable input
    for the ANN/dedup family (model-embedding extraction proper needs
    inference and stays ``extract_features_stub``). Ragged buffers
    yield NULL."""
    out_schema = T.StructType(df.schema.fields + [T.StructField("features", T.ArrayType(T.DoubleType()))])

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for _, row in pdf.iterrows():
                payload = row[binary_col] or b""
                w, h, c = int(row[width_col]), int(row[height_col]), int(row[channels_col])
                if w * h * c <= 0 or len(payload) != w * h * c:
                    feats.append(None)
                    continue
                a = np.frombuffer(payload, dtype=np.uint8).reshape(h, w, c).astype(np.float64)
                means = a.mean(axis=(0, 1))
                stds = a.std(axis=(0, 1))
                gray = a.mean(axis=2)
                hist, _ = np.histogram(gray, bins=hist_bins, range=(0.0, 256.0))
                hist = hist / gray.size
                feats.append([*means.tolist(), *stds.tolist(), *hist.tolist()])
            pdf = pdf.copy()
            pdf["features"] = feats
            yield pdf

    return df.mapInPandas(extract, schema=out_schema)


def audio_features_int(payload: bytes) -> dict | None:
    """Integer-exact acoustic features from a PCM payload — the audio
    analogue of extract_features_raw: zero-crossing count, scaled energy
    Σk² and peak |k| over the RAW integer samples (k = the container's
    own sample words, sign-centered), so every feature is integer
    arithmetic — engine-portable, no float ties, and directly usable as
    silence/clipping/voice-activity gates in a curation pipeline."""
    meta = decode_audio_header(payload)
    if meta is None or meta.get("format") != "wav":
        return None
    d = decode_wav_samples(payload)
    if d is None:
        return None
    bits = meta["bits_per_sample"]
    scale = 128.0 if bits == 8 else float(1 << (bits - 1))
    k = np.rint(np.asarray(d["samples"], dtype=np.float64) * scale).astype(np.int64)
    if k.size == 0:
        zcr = 0
    else:
        nonneg = k >= 0
        zcr = int(np.count_nonzero(nonneg[:-1] != nonneg[1:]))
    return {
        "channels": d["channels"],
        "sample_rate": d["sample_rate"],
        "n_samples": int(k.size),
        "zero_crossings": zcr,
        "energy_scaled": int(np.sum(k * k)),
        "peak_scaled": int(np.max(np.abs(k))) if k.size else 0,
    }


def audio_features(df: DataFrame, binary_col: str = "payload") -> DataFrame:
    """mapInPandas integer-exact audio features (see audio_features_int):
    appends channels / sample_rate / n_samples / zero_crossings /
    energy_scaled / peak_scaled. Same corrupt-tolerant Arrow-batch
    contract as the decoders: undecodable payloads yield NULLs."""
    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("channels", T.IntegerType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("n_samples", T.IntegerType()),
            T.StructField("zero_crossings", T.IntegerType()),
            T.StructField("energy_scaled", T.LongType()),
            T.StructField("peak_scaled", T.LongType()),
        ]
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols: dict[str, list] = {k: [] for k in
                ("channels", "sample_rate", "n_samples", "zero_crossings", "energy_scaled", "peak_scaled")}
            for p in pdf[binary_col]:
                d = audio_features_int(p)
                for c in cols:
                    cols[c].append(d[c] if d else None)
            for c, v in cols.items():
                pdf[c] = v
            yield pdf

    return df.mapInPandas(extract, schema=out_schema)
