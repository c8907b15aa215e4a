"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video payloads are ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages. The actual codecs are NOT in this container, so the
decode step is stubbed: ``decode_stub`` raises ``NotImplementedError`` where
a real codec would run, and ``deterministic_features`` is the seeded fake
used by tests — the Spark-side plumbing (schema, batch shape, partitioning,
never-throw error channel) is real and tested.

Scale shape: the binary column stays columnar end-to-end (Arrow buffers, no
base64 round-trips); feature extraction is a per-row map with no shuffle;
partitioning follows the parent table. Frame sampling emits one row per
sampled frame via an explode AFTER the cheap metadata probe, so the row
blow-up happens post-filter.
"""

from __future__ import annotations

import hashlib
from typing import Iterator, List

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (ArrayType, BinaryType, DoubleType, IntegerType,
                               LongType, StringType, StructField, StructType)

ASSET_SCHEMA = StructType([
    StructField("asset_id", StringType(), False),
    StructField("kind", StringType(), False),        # image | audio | video
    StructField("payload", BinaryType(), True),
    StructField("mime", StringType(), True),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("duration_ms", LongType(), True),
])

FEATURE_SCHEMA = StructType([
    StructField("asset_id", StringType(), False),
    StructField("kind", StringType(), False),
    StructField("n_bytes", LongType(), False),
    StructField("content_hash", StringType(), False),
    StructField("features", ArrayType(DoubleType()), True),
    StructField("error", StringType(), True),
])

FEATURE_DIM = 16


def decode_stub(payload: bytes, kind: str):
    """Where a real decoder would run (PIL / libav are not in this
    container). Marked clearly so the integration point is obvious."""
    raise NotImplementedError(
        f"no {kind} codec in this environment — swap in a real decoder here")


def deterministic_features(payload: bytes, dim: int = FEATURE_DIM) -> List[float]:
    """Seeded fake feature vector: md5 hex-digest chain → [0,1) doubles
    (each value is an 8-hex-digit slice / 2^32 — an exact dyadic rational,
    so sums are bit-exact across engines). Deterministic stand-in for an
    embedding model; hex-string chaining (seed_{j+1} = md5(ascii hex of
    seed_j)) keeps every step expressible in SQL, which is what lets the
    driver verify this path against a DuckDB oracle."""
    out: List[float] = []
    seed = hashlib.md5(payload or b"").hexdigest()
    while len(out) < dim:
        for i in range(0, 32, 8):
            out.append(int(seed[i:i + 8], 16) / 2 ** 32)
            if len(out) == dim:
                break
        seed = hashlib.md5(seed.encode("ascii")).hexdigest()
    return out


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for asset_id, kind, payload in zip(pdf["asset_id"], pdf["kind"],
                                           pdf["payload"]):
            raw = bytes(payload) if payload is not None else b""
            try:
                feats = deterministic_features(raw)
                err = None
            except Exception as exc:  # never throw — error channel instead
                feats, err = None, f"{type(exc).__name__}: {exc}"
            rows.append({
                "asset_id": asset_id,
                "kind": kind,
                "n_bytes": len(raw),
                "content_hash": hashlib.md5(raw).hexdigest(),
                "features": feats,
                "error": err,
            })
        yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])


def extract_features(assets: DataFrame) -> DataFrame:
    """binary assets → fixed-dim feature rows (Arrow-batched map, no shuffle)."""
    return assets.select("asset_id", "kind", "payload").mapInPandas(
        _feature_batches, schema=FEATURE_SCHEMA)


def sample_frames(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one row per sampled timestamp, derived
    from metadata BEFORE any decode (cheap), exploded JVM-side."""
    from pyspark.sql import functions as F
    vids = assets.filter(F.col("kind") == "video")
    stamps = F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                        F.lit(every_ms))
    return (vids.withColumn("frame_ts_ms", F.explode(stamps))
                .select("asset_id", "frame_ts_ms", "mime", "width", "height"))
