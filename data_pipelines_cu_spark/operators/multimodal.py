"""Multimodal column plumbing (north-star set; SURVEY.md §1.2 binary type).

Reference grounding: the course downloads rocket-launch images as binary
files (Solutions/chapter02/dags/download_rocket_launches.py:26-44). Here
image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct, processed by Arrow-batched ``mapInPandas`` stages.

The actual codec work (image decode, resampling, frame extraction) needs
libraries not present in this container, so the decode kernels are STUBS:
``decode_image_stub`` produces a deterministic fake feature row per blob
(so the Spark-side plumbing — schema, batch shape, partitioning, UDF
signature — is real and testable), and ``decode_image_real`` raises
NotImplementedError marking exactly where a PIL/ffmpeg kernel plugs in.

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


def decode_image_real(payload: bytes) -> list[float]:
    """Plug point for a real decoder (PIL/libvips/ffmpeg). Not available in
    this container by design."""
    raise NotImplementedError(
        "image decode requires PIL/libvips; wire a real kernel here"
    )


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
