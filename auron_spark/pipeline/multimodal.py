"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The container has no image/audio codecs, so the *decode* kernel is a
clearly-marked deterministic fake (`fake_decode_meta`) — but everything
Spark-side is real and scale-shaped: binary columns, metadata structs, and
`mapInPandas` feature extraction over Arrow batches (the exact architecture
a real decoder would slot into: replace the fake with PIL/ffmpeg and the
plan, schema, partitioning and batch shapes are unchanged).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from auron_spark.registry import query
from auron_spark.tables import Tables


def fake_decode_meta(payload: bytes) -> tuple[int, int, str]:
    """STUB decoder: derives (width, height, codec) deterministically from the
    payload bytes.  A real build replaces this with an image/audio library;
    raise NotImplementedError for codecs we do not fake."""
    n = len(payload)
    width = 64 + (n % 577)
    height = 64 + ((n * 7) % 449)
    codec = ("png", "jpeg", "webp")[n % 3]
    return width, height, codec


@query(
    "mm_binary_metadata",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           upper(substring(hex(encode(text)), 1, 8)) AS magic,
           octet_length(encode(text)) > 256 AS is_large
    FROM documents
    ORDER BY doc_id
    """,
    tags=("pipeline", "multimodal", "binary"),
)
def mm_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload column (utf-8 encoded text stands in for media bytes)
    with metadata projections — octet length, magic-bytes prefix.  All
    JVM-side built-ins."""
    t = Tables(spark, sf_dir)
    payload = F.encode(F.col("text"), "utf-8")
    return t.documents.select(
        "doc_id",
        F.octet_length(payload).alias("n_bytes"),
        F.hex(F.substring(payload, 1, 4)).alias("magic"),
        (F.octet_length(payload) > 256).alias("is_large"),
    ).orderBy("doc_id")


@query(
    "mm_decode_features",
    oracle="""
    SELECT doc_id,
           64 + (octet_length(encode(text)) % 577) AS width,
           64 + ((octet_length(encode(text)) * 7) % 449) AS height,
           CASE octet_length(encode(text)) % 3
             WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp' END AS codec,
           CAST(64 + (octet_length(encode(text)) % 577) AS BIGINT)
             * (64 + ((octet_length(encode(text)) * 7) % 449)) AS n_pixels
    FROM documents
    ORDER BY doc_id
    """,
    tags=("pipeline", "multimodal", "decode", "mapInPandas"),
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`mapInPandas` decode/feature-extract over Arrow batches.  The fake
    decode is SQL-mirrorable, so the Python plumbing (schema, batch iteration,
    column assembly) gets a full oracle check — the part a real codec swap
    would keep."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [fake_decode_meta(p) for p in pdf["payload"]]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "width": [m[0] for m in metas],
                    "height": [m[1] for m in metas],
                    "codec": [m[2] for m in metas],
                }
            )
            out["n_pixels"] = (out["width"].astype("int64") * out["height"]).astype("int64")
            yield out

    t = Tables(spark, sf_dir)
    payloads = t.documents.select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
    return (
        payloads.mapInPandas(
            decode_batches, "doc_id long, width int, height int, codec string, n_pixels long"
        )
        .orderBy("doc_id")
    )


@query(
    "mm_frame_sample",
    oracle="""
    SELECT doc_id, unnest(range(0, n_frames)) AS frame_idx,
           md5(CAST(doc_id AS VARCHAR) || ':' || CAST(unnest(range(0, n_frames)) AS VARCHAR))
             AS frame_key
    FROM (
        SELECT doc_id, 1 + (octet_length(encode(text)) % 4) AS n_frames
        FROM documents
        WHERE doc_id % 10 = 0
    )
    ORDER BY doc_id, frame_idx
    """,
    tags=("pipeline", "multimodal", "frame-sample"),
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling for video-like payloads: derive a per-asset frame count,
    explode one row per sampled frame with a stable frame key.  The explode is
    the real operator; frame *content* decode stays behind the stub."""
    t = Tables(spark, sf_dir)
    base = t.documents.filter(F.col("doc_id") % 10 == 0).select(
        "doc_id",
        (1 + (F.octet_length(F.encode(F.col("text"), "utf-8")) % 4)).alias("n_frames"),
    )
    return (
        base.select(
            "doc_id", F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)).alias("frame_idx")
        )
        .select(
            "doc_id",
            "frame_idx",
            F.md5(
                F.concat_ws(":", F.col("doc_id").cast("string"), F.col("frame_idx").cast("string"))
            ).alias("frame_key"),
        )
        .orderBy("doc_id", "frame_idx")
    )


@query(
    "mm_resize_plan",
    oracle="""
    SELECT doc_id, width, height,
           CAST(FLOOR(width * s) AS INTEGER) AS out_w,
           CAST(FLOOR(height * s) AS INTEGER) AS out_h
    FROM (
        SELECT doc_id, width, height,
               LEAST(224.0 / width, 224.0 / height, 1.0) AS s
        FROM (
            SELECT doc_id,
                   64 + (octet_length(encode(text)) % 577) AS width,
                   64 + ((octet_length(encode(text)) * 7) % 449) AS height
            FROM documents
        )
    )
    ORDER BY doc_id
    """,
    tags=("pipeline", "multimodal", "resize", "mapInPandas"),
)
def mm_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize to fit 224×224 (no upscaling), planned in
    `mapInPandas` over Arrow batches.  The geometry math is SQL-mirrorable so
    the full Python path is oracle-checked; the pixel resample itself is the
    stubbed step (`NotImplementedError` — container has no image libs), and a
    real build swaps it in without touching plan/schema/batching."""

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [fake_decode_meta(p) for p in pdf["payload"]]
            w = pd.Series([m[0] for m in metas], dtype="int64")
            h = pd.Series([m[1] for m in metas], dtype="int64")
            s = pd.concat([224.0 / w, 224.0 / h], axis=1).min(axis=1).clip(upper=1.0)
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "width": w.astype("int32"),
                    "height": h.astype("int32"),
                    "out_w": (w * s).apply(int).astype("int32"),  # floor: positive values
                    "out_h": (h * s).apply(int).astype("int32"),
                }
            )
            yield out

    def resample_pixels(payload: bytes, out_w: int, out_h: int) -> bytes:
        raise NotImplementedError("pixel resample needs an image codec (PIL)")

    t = Tables(spark, sf_dir)
    payloads = t.documents.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return payloads.mapInPandas(
        resize_batches, "doc_id long, width int, height int, out_w int, out_h int"
    ).orderBy("doc_id")
