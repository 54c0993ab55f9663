"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with a typed metadata struct;
decode / feature-extraction run as Arrow-batched ``mapInPandas`` stages.
The actual codec step is STUBBED (no image/audio libraries in this
container): ``decode_media`` raises ``NotImplementedError`` unless a
deterministic fake decoder is requested — but the Spark-side plumbing
(schema, batching, partitioning, UDF signatures) is real and tested, so a
codec drop-in is a one-function change.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.StructType(
            [
                T.StructField("mime", T.StringType()),
                T.StructField("width", T.IntegerType()),
                T.StructField("height", T.IntegerType()),
                T.StructField("n_bytes", T.LongType()),
            ]), True),
    ]
)

FEATURE_DIM = 8

_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def media_table_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a media table from the documents table: payload = the text
    bytes (deterministic stand-in for raw media bytes), metadata derived
    natively (JVM-side)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    payload = F.encode("text", "UTF-8")
    return docs.select(
        F.substring(F.sha2("text", 256), 1, 16).alias("media_ref"),
        payload.alias("payload"),
        F.struct(
            F.lit("image/x-fake").alias("mime"),
            (F.pmod(F.xxhash64("text"), F.lit(1920)) + 1).cast("int").alias("width"),
            (F.pmod(F.xxhash64("doc_id"), F.lit(1080)) + 1).cast("int").alias("height"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_media(payload: bytes, mime: str, *, fake: bool = False) -> bytes:
    """Decode a media payload to raw pixels/samples.

    STUB: real codecs (PIL/ffmpeg/...) are not available in this
    container. ``fake=True`` returns a deterministic pseudo-decode (the
    md5 digest of the payload — chosen because DuckDB can compute the
    same bytes, giving the feature plumbing a hash-exact oracle) so the
    downstream plumbing is testable end-to-end.
    """
    if not fake:
        raise NotImplementedError(
            "media codecs are not available in this environment; "
            "pass fake=True for the deterministic test decoder")
    return hashlib.md5(payload or b"").digest()


def extract_features(media: DataFrame, *, fake_decode: bool = True) -> DataFrame:
    """mapInPandas feature extraction: payload → FEATURE_DIM float vector.

    Batch shape: Arrow hands `payload` as bytes per row; features are
    derived from the (fake-)decoded bytes deterministically. Partitioning:
    inherits the input's; callers repartition by size class upstream if
    payloads are skewed (same policy as pipeline.salted_repartition).
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                decoded = decode_media(
                    bytes(payload) if payload is not None else b"",
                    meta["mime"] if meta is not None else "",
                    fake=fake_decode)
                # One float per decoded byte: stable, finite, and exactly
                # reproducible in SQL for the oracle.
                feats.append([float(b) for b in decoded[:FEATURE_DIM]])
            yield pd.DataFrame(
                {"media_ref": pdf["media_ref"], "features": feats})

    return media.mapInPandas(fn, schema=_FEATURES_SCHEMA)


def media_features_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: media table → decoded features, summarized
    deterministically. The fake decode is md5-based, so the whole
    payload→decode→feature→L1 chain has a hash-exact DuckDB oracle."""
    media = media_table_from_documents(spark, sf_dir)
    feats = extract_features(media, fake_decode=True)
    return feats.select(
        "media_ref",
        F.round(F.aggregate("features", F.lit(0.0).cast("double"),
                            lambda a, b: a + F.abs(b)), 3).alias("l1"),
    ).orderBy("media_ref")


_RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("out_width", T.IntegerType(), False),
        T.StructField("out_height", T.IntegerType(), False),
        T.StructField("pixels", T.BinaryType(), True),
    ]
)


def resize_media(media: DataFrame, *, out_w: int = 32, out_h: int = 32,
                 fake_decode: bool = True) -> DataFrame:
    """mapInPandas resize stage: decode → resample to (out_w, out_h).

    The codec is the documented md5-based STUB (no image libs in this
    container), but the Spark-side contract is the real one: binary in,
    fixed-size pixel buffer out (out_w*out_h bytes), aspect metadata kept,
    Arrow-batched, partitioning inherited. A real decoder drops in by
    replacing ``decode_media`` only."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pixels, ows, ohs = [], [], []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                decoded = decode_media(
                    bytes(payload) if payload is not None else b"",
                    meta["mime"] if meta is not None else "",
                    fake=fake_decode)
                # deterministic fake resample: tile the decode to the
                # target buffer size (real impl: bilinear over pixels)
                buf = (decoded * (out_w * out_h // len(decoded) + 1))
                pixels.append(buf[: out_w * out_h])
                ows.append(out_w)
                ohs.append(out_h)
            yield pd.DataFrame({
                "media_ref": pdf["media_ref"],
                "width": [m["width"] if m is not None else None
                          for m in pdf["meta"]],
                "height": [m["height"] if m is not None else None
                           for m in pdf["meta"]],
                "out_width": ows, "out_height": ohs, "pixels": pixels,
            })

    return media.mapInPandas(fn, schema=_RESIZED_SCHEMA)


_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def frame_sample(media: DataFrame, *, every_n: int = 4,
                 max_frames: int = 8, fake_decode: bool = True) -> DataFrame:
    """mapInPandas frame-sampling stage (video analog): one input row →
    N output rows (frame_idx, frame bytes), sampling every ``every_n``-th
    frame up to ``max_frames``. The fake decoder derives deterministic
    per-frame bytes; the row-explosion shape (1→N through Arrow) is the
    real contract a video pipeline needs."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, idxs, frames = [], [], []
            for ref, payload, meta in zip(
                    pdf["media_ref"], pdf["payload"], pdf["meta"]):
                raw = bytes(payload) if payload is not None else b""
                # fake "video length": one frame per 64 payload bytes
                n_total = max(1, len(raw) // 64)
                for i, fi in enumerate(range(0, n_total, every_n)):
                    if i >= max_frames:
                        break
                    # ASCII frame salt (not packed bytes): keeps the fake
                    # decode exactly expressible in the DuckDB oracle,
                    # whose md5() only accepts VARCHAR.
                    frames.append(decode_media(
                        raw + str(fi).encode("ascii"),
                        meta["mime"] if meta is not None else "",
                        fake=fake_decode))
                    refs.append(ref)
                    idxs.append(fi)
            yield pd.DataFrame(
                {"media_ref": refs, "frame_idx": idxs, "frame": frames})

    return media.mapInPandas(fn, schema=_FRAMES_SCHEMA)


def resize_media_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: resize stage end-to-end (decode → fixed 32×32
    buffer), summarized as an md5 over the hex of the pixel buffer so the
    whole tiled-buffer contract is hash-exact against DuckDB (the fake
    16-byte decode tiles exactly 64× into 1024 bytes)."""
    media = media_table_from_documents(spark, sf_dir)
    out = resize_media(media, out_w=32, out_h=32, fake_decode=True)
    return out.select(
        "media_ref", "out_width", "out_height",
        F.md5(F.lower(F.hex("pixels"))).alias("pixels_md5"),
    ).orderBy("media_ref")


RESIZE_MEDIA_SQL = """
SELECT substring(sha256(text), 1, 16) AS media_ref,
       32 AS out_width, 32 AS out_height,
       md5(repeat(md5(text), 64)) AS pixels_md5
FROM documents
ORDER BY media_ref
"""


def frame_sample_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: frame sampling end-to-end (1 row → N frame rows,
    every 4th of the fake 64-bytes-per-frame 'video', max 8), each frame
    reported as its hex (the fake decode is an md5 digest, so the hex IS
    md5(payload || idx) — directly computable in DuckDB)."""
    media = media_table_from_documents(spark, sf_dir)
    out = frame_sample(media, every_n=4, max_frames=8, fake_decode=True)
    return out.select(
        "media_ref", "frame_idx",
        F.lower(F.hex("frame")).alias("frame_md5"),
    ).orderBy("media_ref", "frame_idx")


FRAME_SAMPLE_SQL = """
WITH m AS (
  SELECT substring(sha256(text), 1, 16) AS media_ref, text,
         greatest(1, octet_length(encode(text)) // 64) AS n_total
  FROM documents
), f AS (
  SELECT media_ref, text, unnest(range(0, n_total, 4)) AS fi FROM m
)
SELECT media_ref, CAST(fi AS INT) AS frame_idx,
       md5(text || CAST(fi AS VARCHAR)) AS frame_md5
FROM f
WHERE fi < 32
ORDER BY media_ref, frame_idx
"""


# The payload is the document text's utf-8 bytes (media_table_from_documents),
# so md5(text) in DuckDB hashes the same bytes; features are the first
# FEATURE_DIM digest bytes as floats and l1 is their sum.
_L1_TERMS = " + ".join(
    f"('0x' || substring(md5(text), {2 * j + 1}, 2))::INT"
    for j in range(FEATURE_DIM))

MEDIA_FEATURES_SQL = f"""
SELECT substring(sha256(text), 1, 16) AS media_ref,
       round(CAST({_L1_TERMS} AS DOUBLE), 3) AS l1
FROM documents
ORDER BY media_ref
"""
