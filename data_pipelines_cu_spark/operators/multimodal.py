"""Multimodal column plumbing (north-star set; SURVEY.md §1.2 binary type).

Reference grounding: the course downloads rocket-launch images as binary
files (Solutions/chapter02/dags/download_rocket_launches.py:26-44). Here
image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct, processed by Arrow-batched ``mapInPandas`` stages.

Decode kernels come in two flavors. ``decode_image_real`` /
``resize_image_real`` / ``decode_wav`` are REAL media paths for
uncompressed formats — P6 PPM and 24-bit BI_RGB BMP pixels, and PCM-16
RIFF/WAV samples, all decoded with pure numpy (no PIL/libvips/ffmpeg
needed) — so actual pixels and audio samples flow through the Arrow
stages end-to-end. Compressed formats (JPEG/PNG/video)
still need a codec library absent from this container; ``decode_image_
stub`` keeps those paths testable with a deterministic sha256 fake, and
the real kernels raise ``ValueError`` on blobs they can't parse, marking
exactly where a PIL/ffmpeg kernel widens format support.

Scale notes: blobs ride in parquet binary columns; ``mapInPandas`` streams
Arrow record batches so executor memory holds one batch of blobs, not a
partition of decoded tensors; ``spark.sql.execution.arrow.maxRecordsPerBatch``
bounds batch size for fat rows.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sha256", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def attach_media_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed metadata struct from the blob itself (JVM-side: no decode)."""
    p = F.col(payload_col)
    return df.withColumn(
        "meta",
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.length(p).cast("long").alias("n_bytes"),
        ),
    )


def encode_ppm(pixels) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as binary P6 PPM."""
    import numpy as np

    arr = np.ascontiguousarray(np.asarray(pixels, dtype=np.uint8))
    h, w = arr.shape[0], arr.shape[1]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def encode_bmp(pixels) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as a 24-bit uncompressed
    (BI_RGB) bottom-up BMP — the fixture-side twin of decode_pixels."""
    import struct

    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    h, w = arr.shape[0], arr.shape[1]
    row_len = (w * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    body = bytearray()
    pad = b"\x00" * (row_len - w * 3)
    for y in range(h - 1, -1, -1):  # bottom-up row order
        body += arr[y, :, ::-1].tobytes() + pad  # RGB -> BGR
    pix_offset = 14 + 40
    file_hdr = struct.pack("<2sIHHI", b"BM", pix_offset + len(body), 0, 0, pix_offset)
    dib_hdr = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return file_hdr + dib_hdr + bytes(body)


def decode_pixels(payload: bytes):
    """Decode a P6 PPM, 24-bit uncompressed BMP, or non-interlaced 8-bit
    PNG (RGB/RGBA/greyscale, stdlib zlib inflate + scanline unfilter) blob
    to an (H, W, 3) uint8 RGB numpy array — no codec library. Raises
    ValueError on anything else (the plug point where PIL/libvips widens
    format support: JPEG, palette/16-bit/interlaced PNG)."""
    import struct

    import numpy as np

    if not payload:
        raise ValueError("empty payload")
    if payload[:2] == b"P6":
        # header = magic, width, height, maxval, single whitespace, raster
        parts, idx = [], 2
        while len(parts) < 3:
            while idx < len(payload) and payload[idx : idx + 1].isspace():
                idx += 1
            if payload[idx : idx + 1] == b"#":  # comment to EOL
                idx = payload.index(b"\n", idx) + 1
                continue
            start = idx
            while idx < len(payload) and not payload[idx : idx + 1].isspace():
                idx += 1
            parts.append(int(payload[start:idx]))
        idx += 1  # exactly one whitespace byte before the raster
        w, h, maxval = parts
        if maxval != 255:
            raise ValueError(f"unsupported PPM maxval {maxval}")
        raster = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=idx)
        return raster.reshape(h, w, 3).copy()
    if payload[:2] == b"BM":
        pix_offset = struct.unpack_from("<I", payload, 10)[0]
        (hdr_size, w, h, _planes, bpp, compression) = struct.unpack_from(
            "<IiiHHI", payload, 14
        )
        if bpp != 24 or compression != 0:
            raise ValueError(
                f"only 24-bit BI_RGB BMP supported (bpp={bpp}, comp={compression})"
            )
        flip = h > 0  # positive height = bottom-up row order
        h = abs(h)
        row_len = (w * 3 + 3) & ~3
        rows = np.frombuffer(
            payload, dtype=np.uint8, count=row_len * h, offset=pix_offset
        ).reshape(h, row_len)
        bgr = rows[:, : w * 3].reshape(h, w, 3)
        rgb = bgr[:, :, ::-1]
        return (rgb[::-1] if flip else rgb).copy()
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return _decode_png(payload)
    raise ValueError(f"unrecognized image magic {payload[:2]!r}")


def _png_chunks(payload: bytes):
    """Iterate (type, data) chunks of a PNG stream (CRCs not verified —
    corrupt data surfaces as a zlib/shape error, the same failure class)."""
    import struct

    idx = 8
    while idx + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, idx)
        ctype = payload[idx + 4 : idx + 8]
        data = payload[idx + 8 : idx + 8 + length]
        yield ctype, data
        idx += 12 + length  # length + type + data + CRC
        if ctype == b"IEND":
            break


def _decode_png(payload: bytes):
    """Pure-stdlib PNG decode (zlib inflate + per-scanline unfilter) for
    non-interlaced 8-bit RGB/RGBA/greyscale — the formats the reference's
    actual image payloads use (rocket launch images,
    Solutions/chapter02/dags/download_rocket_launches.py:34-41). Returns
    (H, W, 3) uint8 RGB; alpha is dropped, greyscale replicates. Palette,
    16-bit, and Adam7-interlaced PNGs raise ValueError (declared stub)."""
    import struct
    import zlib

    import numpy as np

    ihdr = None
    idat = bytearray()
    for ctype, data in _png_chunks(payload):
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.extend(data)
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, bit_depth, color_type, _comp, _filt, interlace = ihdr
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type)
    if bit_depth != 8 or channels is None or interlace != 0:
        raise ValueError(
            f"only non-interlaced 8-bit PNG supported "
            f"(depth={bit_depth}, color_type={color_type}, interlace={interlace})"
        )
    raw = zlib.decompress(bytes(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline data truncated")
    img = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    bpp = channels  # bytes per pixel at depth 8
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        else:
            cur = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0  # left
                b = prev[i]  # up
                if ftype == 1:  # Sub
                    pred = a
                elif ftype == 3:  # Average
                    pred = (a + b) >> 1
                elif ftype == 4:  # Paeth
                    c = prev[i - bpp] if i >= bpp else 0  # up-left
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                else:
                    raise ValueError(f"bad PNG filter type {ftype}")
                cur[i] = (line[i] + pred) & 0xFF
        img[y] = cur.astype(np.uint8)
        prev = cur
    px = img.reshape(h, w, channels)
    if color_type == 2:
        return px.copy()
    if color_type == 6:
        return px[:, :, :3].copy()
    grey = px[:, :, 0]
    return np.repeat(grey[:, :, None], 3, axis=2).copy()


def encode_png(arr) -> bytes:
    """Minimal PNG encoder (8-bit RGB, filter 0, one IDAT) — the write
    side of the decode kernel, pure stdlib zlib."""
    import struct
    import zlib

    import numpy as np

    px = np.asarray(arr, dtype=np.uint8)
    h, w = px.shape[0], px.shape[1]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_image_real(payload: bytes, dim: int = 8) -> list[float]:
    """REAL image feature kernel: decode actual pixels (PPM/BMP, pure
    numpy) and emit per-channel statistics scaled to [0,1] — mean/std per
    RGB channel, luminance mean, aspect ratio — cycled/truncated to
    ``dim``. Same signature as decode_image_stub, so it swaps into
    extract_features unchanged."""
    import numpy as np

    px = decode_pixels(payload).astype(np.float64)
    h, w = px.shape[0], px.shape[1]
    lum = px @ np.array([0.299, 0.587, 0.114])
    stats = [
        *(px[:, :, c].mean() / 255.0 for c in range(3)),
        *(px[:, :, c].std() / 255.0 for c in range(3)),
        lum.mean() / 255.0,
        w / (w + h),
    ]
    return [float(stats[i % len(stats)]) for i in range(dim)]


def decode_image_stub(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake 'embedding': bytes of sha256 scaled to [0,1).
    Keeps every test reproducible with zero native deps."""
    digest = hashlib.sha256(payload or b"").digest()
    return [b / 256.0 for b in digest[:dim]]


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    dim: int = 8,
    kernel=decode_image_stub,
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    mapInPandas — the real production shape; only ``kernel`` is a stub."""
    import pandas as pd  # noqa: PLC0415

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "sha256": [
                        hashlib.sha256(p or b"").hexdigest() for p in payloads
                    ],
                    "n_bytes": [len(p or b"") for p in payloads],
                    "feature": [kernel(p, dim) for p in payloads],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(
    df: DataFrame, every_n: int = 10, id_col: str = "media_id"
) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame index
    (JVM-side sequence/explode; the frame decode itself is the stubbed
    kernel). Demonstrates fan-out partitioning: downstream decode
    parallelism is per-frame, not per-video."""
    n_frames = (F.col("meta.n_bytes") / 1000).cast("int") + 1  # fake frame count
    return df.select(
        id_col,
        F.explode(
            F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
        T.StructField("out_w", T.IntegerType(), False),
        T.StructField("out_h", T.IntegerType(), False),
    ]
)


def decode_frame_stub(payload: bytes, frame_idx: int, w: int, h: int) -> bytes:
    """Deterministic fake frame decode: sha256-keyed w*h bytes per
    (video, frame) pair. A real kernel (ffmpeg/pyav seek+decode) swaps in
    with the same signature."""
    seed = hashlib.sha256(
        (payload or b"") + f"#{frame_idx}:{w}x{h}".encode()
    ).digest()
    reps = (w * h + len(seed) - 1) // len(seed)
    return (seed * reps)[: w * h]


def sample_frames(
    df: DataFrame,
    every_n: int = 10,
    out_w: int = 32,
    out_h: int = 32,
    payload_col: str = "payload",
    id_col: str = "media_id",
    kernel=decode_frame_stub,
) -> DataFrame:
    """Video frame sampling end-to-end: JVM-side index fan-out (one row per
    sampled frame, carrying the blob) → Arrow-batched per-frame decode.
    Fan-out BEFORE decode is the scale-critical ordering: a 2-hour video's
    frames decode on many tasks instead of serially inside one, and a
    repartition on (media_id, frame_idx) between the two stages spreads
    one viral video across the cluster. Decode kernel is the declared stub
    (no codec in this container); schema, batching and partitioning are
    the production shape."""
    import pandas as pd  # noqa: PLC0415

    n_frames = (F.col("meta.n_bytes") / 1000).cast("int") + 1  # fake frame count
    frames = df.select(
        id_col,
        payload_col,
        F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))).alias(
            "frame_idx"
        ),
    ).repartition(id_col, "frame_idx")

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "frame_idx": pdf["frame_idx"].astype("int32"),
                    "frame": [
                        kernel(p, int(i), out_w, out_h)
                        for p, i in zip(pdf[payload_col], pdf["frame_idx"])
                    ],
                    "out_w": out_w,
                    "out_h": out_h,
                }
            )

    return frames.mapInPandas(run, schema=FRAME_SCHEMA)


AUDIO_CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("chunk_idx", T.IntegerType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def audio_chunk_features(
    df: DataFrame,
    bytes_per_chunk: int = 4000,
    dim: int = 8,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Audio feature extraction per fixed-size chunk (the windowed-fbank
    shape): JVM-side chunk fan-out → Arrow-batched per-chunk features over
    the chunk's OWN byte slice (a real DSP kernel swaps into the hash
    stand-in). Chunk rows carry only their slice, so executor memory is
    bounded by chunk size, not clip length."""
    import pandas as pd  # noqa: PLC0415

    p = F.col(payload_col)
    n_chunks = F.greatest(
        F.ceil(F.length(p) / bytes_per_chunk).cast("int"), F.lit(1)
    )
    chunks = df.select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.substring(
                    p, i * bytes_per_chunk + 1, bytes_per_chunk
                ),
            )
        ).alias("chunk_idx", "chunk"),
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "chunk_idx": pdf["chunk_idx"].astype("int32"),
                    "feature": [
                        decode_image_stub(c, dim) for c in pdf["chunk"]
                    ],
                }
            )

    return chunks.mapInPandas(run, schema=AUDIO_CHUNK_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("resized", T.BinaryType(), True),
        T.StructField("out_w", T.IntegerType(), False),
        T.StructField("out_h", T.IntegerType(), False),
    ]
)


def resize_image_stub(payload: bytes, w: int, h: int) -> bytes:
    """Deterministic fake resize: sha256-keyed byte stream of exactly
    w*h bytes (one 'pixel' per byte) so size contracts are testable
    without a codec. A real kernel (PIL.Image.resize / libvips) swaps in
    with the same signature."""
    seed = hashlib.sha256((payload or b"") + f"{w}x{h}".encode()).digest()
    reps = (w * h + len(seed) - 1) // len(seed)
    return (seed * reps)[: w * h]


def resize_image_real(payload: bytes, w: int, h: int) -> bytes:
    """REAL resize kernel: decode pixels (PPM/BMP), nearest-neighbor
    resample to (h, w), re-encode as P6 PPM — pure numpy end-to-end, and
    the output is itself decodable, so resize -> extract_features chains
    on real pixel bytes. Same signature as resize_image_stub."""
    import numpy as np

    px = decode_pixels(payload)
    src_h, src_w = px.shape[0], px.shape[1]
    ys = (np.arange(h) * src_h) // h
    xs = (np.arange(w) * src_w) // w
    return encode_ppm(px[ys][:, xs])


def resize_images(
    df: DataFrame,
    out_w: int,
    out_h: int,
    payload_col: str = "payload",
    id_col: str = "media_id",
    kernel=resize_image_stub,
) -> DataFrame:
    """Arrow-batched image resize over binary payloads — the normalize
    step of an image-pretraining pipeline (reference grounding: the
    downloaded launch images, Solutions/chapter02/dags/
    download_rocket_launches.py:26-44, would be size-normalized before
    training). mapInPandas streams batches so executor memory holds one
    Arrow batch of blobs, never a partition of decoded bitmaps; output
    blobs are again an opaque binary column, so stages compose:
    resize -> extract_features chains without leaving Arrow."""
    import pandas as pd  # noqa: PLC0415

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "resized": [kernel(p, out_w, out_h) for p in pdf[payload_col]],
                    "out_w": out_w,
                    "out_h": out_h,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=RESIZED_SCHEMA)


# --- Real audio path: RIFF/WAV PCM decode (pure numpy) -----------------------
# The audio twin of the PPM/BMP pixel kernels: uncompressed 16-bit PCM WAV
# decodes with struct + frombuffer, so real samples flow through the Arrow
# stages. Compressed audio (mp3/ogg/aac) still needs a codec library and
# raises ValueError at the same plug point.


def encode_wav(samples, sample_rate: int = 16000) -> bytes:
    """Encode an (n,) or (n, channels) int16 array as a PCM WAV blob."""
    import struct

    import numpy as np

    arr = np.asarray(samples, dtype=np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    n_ch = arr.shape[1]
    data = np.ascontiguousarray(arr).tobytes()
    byte_rate = sample_rate * n_ch * 2
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, n_ch, sample_rate, byte_rate, n_ch * 2, 16
    )
    return hdr + fmt + b"data" + struct.pack("<I", len(data)) + data


def decode_wav(payload: bytes):
    """Decode a PCM 16-bit WAV blob to (sample_rate, (n, channels) int16
    array) — walks RIFF chunks, so extra chunks (LIST/fact) don't break it.
    Raises ValueError on non-RIFF or non-PCM-16 payloads (the codec plug
    point, as with compressed images)."""
    import struct

    import numpy as np

    if not payload or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks pad to even offsets
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_ch, sample_rate, _br, _ba, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"only PCM-16 supported (format={audio_format}, bits={bits})")
    arr = np.frombuffer(data, dtype="<i2")
    return sample_rate, arr.reshape(-1, n_ch).copy()


WAV_CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("chunk_idx", T.IntegerType(), False),
        T.StructField("n_samples", T.IntegerType(), False),
        T.StructField("mean_abs", T.DoubleType(), True),
        T.StructField("peak", T.IntegerType(), True),
        T.StructField("zero_crossings", T.IntegerType(), True),
    ]
)


def wav_chunk_features(
    df: DataFrame,
    samples_per_chunk: int = 4000,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """REAL audio feature extraction: decode PCM samples, window them, emit
    per-chunk integer-derived features (mean |amplitude|, peak, zero
    crossings — all exact integer arithmetic except the one mean division).

    Features are computed on CHANNEL 0 (stereo clips are not downmixed —
    a mixdown policy is a modeling choice the caller makes upstream).
    The Arrow kernel fans each clip out to its chunk rows (mapInPandas may
    emit more rows than it receives), so downstream work parallelizes
    per-chunk. Clip-level decode is the memory bound; for hour-long clips
    the JVM-side byte-slice fan-out applies (PCM frames are fixed-width, so
    chunk byte ranges are exactly data_offset + i*2*ch*samples — the
    audio_chunk_features plumbing), with this kernel decoding each slice.
    """
    import numpy as np
    import pandas as pd  # noqa: PLC0415

    def run(batches):
        for pdf in batches:
            out = {k: [] for k in
                   ("media_id", "chunk_idx", "n_samples", "mean_abs", "peak",
                    "zero_crossings")}
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                _sr, arr = decode_wav(bytes(payload))
                mono = arr[:, 0].astype(np.int64)
                n = len(mono)
                for ci in range(max(1, -(-n // samples_per_chunk))):
                    ch = mono[ci * samples_per_chunk : (ci + 1) * samples_per_chunk]
                    out["media_id"].append(mid)
                    out["chunk_idx"].append(ci)
                    out["n_samples"].append(len(ch))
                    out["mean_abs"].append(
                        float(np.abs(ch).sum()) / len(ch) if len(ch) else None
                    )
                    out["peak"].append(int(np.abs(ch).max()) if len(ch) else None)
                    signs = np.sign(ch[ch != 0])
                    out["zero_crossings"].append(
                        int((signs[1:] != signs[:-1]).sum()) if len(signs) > 1 else 0
                    )
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(run, schema=WAV_CHUNK_SCHEMA)
