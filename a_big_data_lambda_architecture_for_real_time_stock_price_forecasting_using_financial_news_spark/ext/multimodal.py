"""Multimodal column handling: opaque binary payloads + typed metadata.

At 100 TB, images/audio/video ride along as `binary` columns with a typed
metadata struct; decode and feature extraction are Arrow-batched Python
(`mapInPandas`) because no built-in expression decodes media. This module
makes ALL the Spark-side plumbing real — schema, partition passthrough, UDF
signature, batch iteration — while the actual media decode is stubbed:
the container has no image/audio libs, so backend="pil" (or any real lib)
raises NotImplementedError at a clearly-marked seam, and the default
backend="fake" derives deterministic features from the raw bytes so the
pipeline is testable end-to-end and oracle-checkable.

Scale notes: mapInPandas streams Arrow batches — one Python worker per
partition, no per-row ser/de; binary payloads never pass through the driver;
feature extraction preserves the input partitioning (narrow op, no shuffle).
Control `spark.sql.execution.arrow.maxRecordsPerBatch` so a batch of
payload bytes fits executor-python memory.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META = StructType(
    [
        StructField("fmt", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("byte_len", IntegerType()),
        StructField("byte_sum", LongType()),
        StructField("head64", LongType()),
        StructField("fmt", StringType()),
    ]
)


def attach_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Synthesize a deterministic binary payload + metadata per row (the
    fixtures carry no real media; payload = md5 digest bytes of the text).
    In production this column comes straight from parquet/avro ingestion."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.unhex(F.md5(F.col(text_col))).alias("payload"),  # already BinaryType
        F.struct(
            F.lit("fake").alias("fmt"),
            (F.pmod(F.col(id_col), F.lit(64)) + 1).cast("int").alias("width"),
            (F.pmod(F.col(id_col), F.lit(48)) + 1).cast("int").alias("height"),
            (F.pmod(F.col(id_col), F.lit(16)) + 1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def extract_features(df: DataFrame, backend: str = "fake") -> DataFrame:
    """Arrow-batched feature extraction over (doc_id, payload, meta).

    backend="fake": deterministic features of the raw bytes (len, byte sum,
    first-8-bytes big-endian uint -> int64 via 60-bit truncation).
    backend="pil"/"ffmpeg": the seam where a real decoder plugs in.
    """
    if backend not in ("fake", "pil", "ffmpeg"):
        raise ValueError(f"unknown backend {backend!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if backend != "fake":
                # STUB: real media decode needs PIL/ffmpeg, absent here.
                raise NotImplementedError(
                    f"media backend {backend!r} not available in this build"
                )
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "byte_len": payloads.map(len).astype("int32"),
                    "byte_sum": payloads.map(lambda b: sum(b)).astype("int64"),
                    # 60-bit head so it matches phash60-style oracles
                    "head64": payloads.map(
                        lambda b: int.from_bytes(b[:8], "big") >> 4
                    ).astype("int64"),
                    "fmt": pdf["meta"].map(lambda m: m["fmt"]),
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 4) -> DataFrame:
    """Deterministic frame sampling plan for 'video' rows: emit one row per
    sampled frame index (0, every_n, 2*every_n, ... < n_frames). Pure
    expression — the decode of each sampled frame is extract_features'
    backend seam. posexplode keeps the op narrow until the explode itself."""
    return df.select(
        "doc_id",
        F.col("meta.n_frames").alias("n_frames"),
        F.explode(
            F.sequence(
                F.lit(0),
                F.col("meta.n_frames") - 1,
                F.lit(every_n),
            )
        ).alias("frame_idx"),
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("meta", MEDIA_META),
    ]
)


def resize(df: DataFrame, max_w: int, max_h: int, backend: str = "fake") -> DataFrame:
    """Resize plan: target dimensions are computed JVM-side (integer
    aspect-preserving scale, never upscale); the pixel transform itself is
    the Arrow-batched backend seam — backend="fake" passes the payload
    through with updated metadata, real backends (pil) are stubbed.

    Keeping the dimension math in Column expressions means Catalyst can
    prune rows that need no work (filter w<=max and h<=max) BEFORE any
    Python worker spins up."""
    if backend not in ("fake", "pil"):
        raise ValueError(f"unknown backend {backend!r}")

    w, h = F.col("meta.width"), F.col("meta.height")
    # scale = min(max_w/w, max_h/h, 1) in exact integer arithmetic:
    # pick the binding axis by cross-multiplication, floor the other
    landscape = w * max_h >= h * max_w  # width is the binding constraint
    new_w = F.when(landscape, F.least(w, F.lit(max_w))).otherwise(
        F.greatest((w * max_h) / h, F.lit(1)).cast("int")
    )
    new_h = F.when(landscape, F.greatest((h * max_w) / w, F.lit(1)).cast("int")).otherwise(
        F.least(h, F.lit(max_h))
    )
    no_op = (w <= max_w) & (h <= max_h)
    planned = df.select(
        "doc_id",
        "payload",
        F.struct(
            F.col("meta.fmt").alias("fmt"),
            F.when(no_op, w).otherwise(new_w).cast("int").alias("width"),
            F.when(no_op, h).otherwise(new_h).cast("int").alias("height"),
            F.col("meta.n_frames").alias("n_frames"),
        ).alias("meta"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if backend != "fake":
                # STUB: real pixel resampling needs PIL, absent here.
                raise NotImplementedError(
                    f"resize backend {backend!r} not available in this build"
                )
            yield pdf  # fake backend: payload unchanged, metadata already set

    return planned.mapInPandas(run, RESIZED_SCHEMA)
