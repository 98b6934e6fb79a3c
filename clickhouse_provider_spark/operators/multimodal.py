"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode step itself is STUBBED (image/audio libraries are not in this
container): ``decode_image`` raises NotImplementedError unless a decoder
is injected, and ``fake_decode`` provides a deterministic stand-in so the
Spark-side plumbing — schema, batch shape, partitioning — is real and
tested end-to-end.

Scale design: media blobs never pass through Python row-at-a-time; each
mapInPandas batch moves as one Arrow chunk. Feature outputs are small fixed
-width columns, so downstream joins/aggs shed the blob column immediately
(column pruning drops `content` unless explicitly selected).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("byte_entropy", T.DoubleType(), True),
        T.StructField("histogram", T.ArrayType(T.LongType()), True),  # 16 bins
    ]
)


def has_pil() -> bool:
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def decode_image(content: bytes) -> bytes:
    """Decode an image blob to raw RGB bytes.

    Uses PIL when installed (guarded import — the decode then feeds
    extract_features like any other decoder). Without an imaging library
    this stays an explicit NotImplementedError: silently faking decode in
    the *production* path would hide that the container can't decode.
    """
    try:
        from PIL import Image
    except ImportError as exc:
        raise NotImplementedError(
            "image decoding requires an imaging library (e.g. PIL) not "
            "present in this environment; use fake_decode for pipeline "
            "testing"
        ) from exc
    import io

    with Image.open(io.BytesIO(content)) as img:
        return img.convert("RGB").tobytes()


def fake_decode(content: bytes) -> bytes:
    """Deterministic decode stand-in (identity) for plumbing tests."""
    return content


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: synthesize a media table from the documents fixture (text
    bytes as blob) so the binary pipeline is exercised on driver-provided
    data without fabricating new inputs."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "utf-8").alias("content"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def extract_features(
    media: DataFrame, decode: Callable[[bytes], bytes] = fake_decode
) -> DataFrame:
    """Per-blob features via mapInPandas (Arrow batches): byte count,
    16-bin byte histogram, byte entropy. Deterministic given the decoder.
    Per-blob math is vectorized numpy (frombuffer + bincount) — the only
    Python-level loop is over blobs in the Arrow batch."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    out.append((media_id, None, None, None))
                    continue
                data = np.frombuffer(decode(bytes(content)), dtype=np.uint8)
                hist = np.bincount(data >> 4, minlength=16)
                n = int(data.size)
                p = hist[hist > 0] / n if n else hist[:0]
                ent = float(-(p * np.log2(p)).sum()) if n else 0.0
                out.append((media_id, n, ent, hist.tolist()))
            yield pd.DataFrame(
                out, columns=["media_id", "n_bytes", "byte_entropy", "histogram"]
            )

    return media.select("media_id", "content").mapInPandas(batches, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: expands (media_id, duration_ms) into
    per-frame timestamps JVM-side (sequence+explode); the actual frame
    decode would plug into extract_features' decoder. Demonstrates that
    fan-out happens before Python, so Arrow batches stay small per frame."""
    return (
        media.filter(F.col("meta.duration_ms").isNotNull())
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )


def frame_slices(
    media: DataFrame, stride: int = 256, frame_bytes: int = 64
) -> DataFrame:
    """Byte-level frame sampler over opaque blobs: one row per sampled
    frame, sliced JVM-side with binary ``substr`` — the container-level
    step of video/audio frame extraction (seek to offset, hand a small
    window to the codec). The expensive decode stays downstream (plug the
    sliced frame into ``extract_features``' decoder); this stage is pure
    codegen: sequence+explode fan-out, byte slice, fixed-width digests —
    zero Python, zero shuffles.

    Offsets run 0, stride, … through ``octet_length(content)`` inclusive
    (a final empty tail frame marks end-of-stream, mirroring a demuxer's
    EOF sentinel). Emits per-frame byte count and md5-of-hex digest —
    both exactly reproducible from the blob's hex encoding by the DuckDB
    oracle (no float math anywhere).
    """
    n = F.octet_length("content")
    frames = media.select(
        "media_id",
        F.col("content"),
        F.explode(F.sequence(F.lit(0), n, F.lit(stride))).alias("frame_off"),
    )
    frame = F.expr(f"substr(content, frame_off + 1, {frame_bytes})")
    return frames.select(
        "media_id",
        F.col("frame_off").cast("long").alias("frame_off"),
        F.octet_length(frame).cast("long").alias("frame_n_bytes"),
        F.md5(F.hex(frame)).alias("frame_md5"),
    )
