"""Multimodal column handling (SURVEY.md §2.11 L10).

Model: media are opaque ``binary`` payloads + a typed metadata struct
(path, mime, n_bytes, content hash), exactly how a 100 TB lakehouse
stores them (parquet binary columns or ``binaryFile`` pointers). The
Spark-side plumbing — schemas, Arrow batch shapes, mapInPandas
signatures, partition sizing — is real and tested. ``decode_image`` is
a REAL pure-Python netpbm (PGM/PPM) decoder differential-tested against
a closed-form pixel oracle (llm_multimodal_decode); formats that need
codec libraries (JPEG/PNG/video — none exist in this container) keep
deterministic stand-ins (``fake_image_features``, byte-slice frame
sampling) with the swap point documented at each function.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("path", T.StringType(), False),
                    T.StructField("mime", T.StringType(), False),
                    T.StructField("n_bytes", T.LongType(), False),
                    T.StructField("sha256", T.StringType(), False),
                ]
            ),
            False,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)


def attach_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Derive the typed metadata struct from a binary column, JVM-side
    (no Python for hashing/sizing — sha2 and octet length are codegen)."""
    return df.withColumn(
        "meta",
        F.struct(
            F.col("path").alias("path"),
            F.col("mime").alias("mime"),
            F.octet_length(F.col(payload_col)).cast("long").alias("n_bytes"),
            F.lower(F.sha2(F.col(payload_col), 256)).alias("sha256"),
        ),
    )


def decode_image(payload: bytes) -> "object":
    """Decode a netpbm image (PGM ``P2``/``P5``, PPM ``P3``/``P6``) to a
    numpy array — pure stdlib + numpy, no codec libraries.

    Netpbm is the one raster family decodable dependency-free, so it is
    the REAL decode path here; JPEG/PNG/video still need PIL/opencv/
    ffmpeg in deployment (swap this function — the distributed plumbing
    around it does not change). Returns shape (h, w) for grayscale or
    (h, w, 3) for RGB, dtype uint8. Raises ValueError on any other
    format, 16-bit rasters, or a truncated raster.
    """
    import numpy as np

    if payload[:1] != b"P" or payload[1:2] not in (b"2", b"3", b"5", b"6"):
        raise ValueError("unsupported image format (netpbm P2/P3/P5/P6 only)")
    magic = payload[:2].decode("ascii")
    # header = three ASCII ints (width, height, maxval) separated by
    # arbitrary whitespace, with '#' comments running to end-of-line
    pos, vals = 2, []
    while len(vals) < 3:
        c = payload[pos : pos + 1]
        if c == b"":
            raise ValueError("truncated netpbm header")
        if c == b"#":
            pos = payload.index(b"\n", pos) + 1
        elif c.isspace():
            pos += 1
        else:
            end = pos
            while payload[end : end + 1] not in (b"",) and not payload[end : end + 1].isspace():
                end += 1
            vals.append(int(payload[pos:end]))
            pos = end
    w, h, maxval = vals
    if maxval > 255:
        raise ValueError("16-bit netpbm rasters unsupported")
    channels = 3 if magic in ("P3", "P6") else 1
    n = w * h * channels
    if magic in ("P5", "P6"):
        pos += 1  # exactly one whitespace byte after maxval, then raster
        if len(payload) - pos < n:
            raise ValueError("truncated netpbm raster")
        raster = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    else:
        toks = payload[pos:].split()
        if len(toks) < n:
            raise ValueError("truncated netpbm raster")
        raster = np.array(toks[:n], dtype=np.int64)
        if raster.size and (raster.min() < 0 or raster.max() > maxval):
            raise ValueError("netpbm ASCII sample outside 0..maxval")
        raster = raster.astype(np.uint8)
    return raster.reshape(h, w, 3) if channels == 3 else raster.reshape(h, w)


def encode_netpbm(pixels: "object") -> bytes:
    """Inverse of :func:`decode_image` for the binary formats: uint8
    array of shape (h, w) -> PGM ``P5``; (h, w, 3) -> PPM ``P6``."""
    shape = pixels.shape
    if len(shape) == 2:
        magic, (h, w) = b"P5", shape
    elif len(shape) == 3 and shape[2] == 3:
        magic, (h, w) = b"P6", shape[:2]
    else:
        raise ValueError(f"expected (h,w) or (h,w,3) uint8 array, got {shape}")
    return magic + b"\n%d %d\n255\n" % (w, h) + pixels.astype("uint8").tobytes()


def fake_image_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a feature extractor: digest bytes ->
    dim pseudo-features in [0, 1). Same payload => same features on any
    executor, which is what the pipeline tests need."""
    digest = hashlib.sha256(payload).digest()
    return [
        int.from_bytes(digest[4 * i : 4 * i + 4], "big") / 2**32 for i in range(dim)
    ]


def extract_features(media: DataFrame, batch_limit_bytes: int = 1 << 28) -> DataFrame:
    """Feature extraction over media payloads via mapInPandas.

    Arrow streams batches into Python; each batch holds whole payloads,
    so ``spark.sql.execution.arrow.maxRecordsPerBatch`` (and the
    partition sizing of the upstream scan) bounds executor memory —
    with ~10 MB images, 256 MB batches mean <=25 rows per batch.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [fake_image_features(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


DECODE_SCHEMA = (
    "media_id long, width int, height int, n_values long, "
    "px_sum long, px_min int, px_max int, px_mean double"
)


def gradient_image(media_id: int, width: int = 16, height_mod: int = 8) -> bytes:
    """Deterministic fixture image for ``media_id``: a cyclic gradient
    pixel(i) = (media_id*31 + i) % 256 over row-major flattened values —
    even ids become grayscale PGM (P5), odd ids RGB PPM (P6), heights
    vary as 4 + media_id % height_mod so the header parse is exercised
    across shapes. The pixel law is closed-form, so a SQL oracle can
    recompute every statistic without any image code (queries/llm.py
    llm_multimodal_decode)."""
    import numpy as np

    h = 4 + int(media_id) % height_mod
    channels = 1 if media_id % 2 == 0 else 3
    n = width * h * channels
    flat = ((int(media_id) * 31 + np.arange(n, dtype=np.int64)) % 256).astype("uint8")
    px = flat.reshape(h, width) if channels == 1 else flat.reshape(h, width, 3)
    return encode_netpbm(px)


def decode_pixel_stats(
    ids: DataFrame, width: int = 16, height_mod: int = 8
) -> DataFrame:
    """Synthesize a real netpbm image per id, push it through the REAL
    decoder, and emit pixel statistics — the full binary encode->decode
    round trip runs on executors via mapInPandas with the same Arrow
    batch-size memory bounds as extract_features. Any parser defect
    (header offset, raster truncation, channel order) shows up as a
    statistics mismatch against the closed-form oracle.

    Scale shape: embarrassingly parallel, zero shuffle; per-task memory
    is rows-per-Arrow-batch x image size."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in (
                "media_id", "width", "height", "n_values",
                "px_sum", "px_min", "px_max", "px_mean",
            )}
            for mid in pdf["media_id"]:
                px = decode_image(gradient_image(int(mid), width, height_mod))
                flat = np.asarray(px, dtype=np.int64).ravel()
                out["media_id"].append(int(mid))
                out["width"].append(px.shape[1])
                out["height"].append(px.shape[0])
                out["n_values"].append(int(flat.size))
                out["px_sum"].append(int(flat.sum()))
                out["px_min"].append(int(flat.min()))
                out["px_max"].append(int(flat.max()))
                out["px_mean"].append(round(float(flat.mean()), 6))
            yield pd.DataFrame(out)

    return ids.mapInPandas(run, schema=DECODE_SCHEMA)


def read_media_dir(spark, path: str, pattern: str = "*") -> DataFrame:
    """True binary-object source (SURVEY.md §2.1 S2 read side): each
    file becomes one row (path, modificationTime, length, content).
    This is how real image/audio/video objects enter the pipeline; the
    fixture-backed tests use documents_as_media instead because the
    container ships no media fixtures.

    ``pathGlobFilter`` prunes at listing time;
    ``spark.sql.files.maxPartitionBytes`` governs how many objects land
    in one task — size it to a few payloads for decode-heavy stages.
    """
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .load(path)
        .select(
            F.col("path"),
            F.col("length").cast("long").alias("n_bytes"),
            F.col("content").alias("payload"),
        )
    )


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Fixture adapter: treat document text bytes as media payloads so
    the binary pipeline is exercised end-to-end without codec libs."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.concat(F.lit("mem://documents/"), F.col("doc_id")).alias("path"),
        F.lit("text/plain").alias("mime"),
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_ts_ms", T.LongType(), False),
        T.StructField("n_frame_bytes", T.LongType(), False),
        T.StructField("frame_sha256", T.StringType(), False),
    ]
)


def sample_frames(
    media: DataFrame,
    frame_bytes: int = 256,
    stride_bytes: int = 256,
    max_frames: int = 4,
    fps: int = 25,
) -> DataFrame:
    """Video-style frame sampling over binary payloads via mapInPandas.

    Each payload yields up to ``max_frames`` evenly-strided frames; the
    "decode" is a deterministic byte-slice stand-in (this container has
    no ffmpeg — swap the slice for a real frame decoder in deployment;
    the plumbing is the real part). Output is one row per frame, i.e.
    the batch SHAPE changes (1 row in -> k rows out) — exactly the
    contract mapInPandas has and a scalar pandas UDF does not.

    Scale shape: embarrassingly parallel, no shuffle; frames per task
    are bounded by max_frames x rows-per-Arrow-batch, so executor
    memory is governed by the same batch-size math as
    ``extract_features``.
    """
    import hashlib as _hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [], "frame_idx": [], "frame_ts_ms": [],
                "n_frame_bytes": [], "frame_sha256": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                n = len(payload)
                k = min(max_frames, max(1, -(-n // stride_bytes)))
                for i in range(k):
                    frame = bytes(payload[i * stride_bytes : i * stride_bytes + frame_bytes])
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["frame_ts_ms"].append(i * 1000 // fps)
                    out["n_frame_bytes"].append(len(frame))
                    out["frame_sha256"].append(_hashlib.sha256(frame).hexdigest())
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


def fake_resize(payload: bytes, num: int = 1, den: int = 2) -> bytes:
    """Deterministic stand-in for a resize kernel: decode, keep the
    first ceil(n*num/den) code points, re-encode — a content-prefix
    "downsample" with the same contract a real resize has (pure
    function of payload + scale, output strictly smaller). Same
    payload => same bytes on any executor."""
    text = payload.decode("utf-8", errors="surrogateescape")
    keep = -(-len(text) * num // den)  # ceil
    return text[:keep].encode("utf-8", errors="surrogateescape")


def resize_media(media: DataFrame, num: int = 1, den: int = 2) -> DataFrame:
    """Resize stage over media payloads via mapInPandas — identical
    plumbing to extract_features (Arrow batches of whole payloads,
    memory bounded by upstream batch sizing); emits the resized
    payload's size and sha-256 so the transform is digest-checkable
    without shipping the bytes back."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [fake_resize(p, num, den) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "orig_bytes": [len(p) for p in pdf["payload"]],
                    "resized_bytes": [len(r) for r in resized],
                    "resized_sha": [hashlib.sha256(r).hexdigest() for r in resized],
                }
            )

    return media.mapInPandas(
        run,
        schema="media_id long, orig_bytes long, resized_bytes long, resized_sha string",
    )
