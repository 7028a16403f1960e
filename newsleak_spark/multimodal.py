"""Multimodal column plumbing: opaque ``binary`` media + typed metadata.

A 100TB training-data pipeline carries image/audio/video as binary
columns beside the text. The decode step itself needs codec libraries
that are NOT in this environment, so decoding is a clearly-marked
deterministic STUB — but everything Spark-side is real and tested:
schema (binary + struct metadata), Arrow batch shape through
``mapInPandas``, partition-preserving plumbing, and frame-sampling
arithmetic.

The media table is DERIVED deterministically from ``documents`` (no
external data): blob = md5(text) bytes, media_type = doc_id % 3. Both
engines derive identical rows, so the metadata ops have exact DuckDB
oracles; the mapInPandas decode path is checked rows-only by the driver
and exactly in tests/test_multimodal.py against a pure-Python oracle.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_TYPES = ["image", "audio", "video"]
FRAME_STRIDE = 4

_MEDIA_SQL_DUCK = """
SELECT doc_id,
       CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
       unhex(md5(text)) AS blob,
       CAST(doc_id % 100 + 1 AS INT) AS n_frames
FROM documents
"""


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, media_type, blob binary, n_frames) derived from documents."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    mt = F.element_at(
        F.array(*[F.lit(t) for t in _TYPES]), (F.col("doc_id") % 3).cast("int") + 1
    )
    return d.select(
        "doc_id",
        mt.alias("media_type"),
        F.to_binary(F.md5("text"), F.lit("hex")).alias("blob"),
        (F.col("doc_id") % 100 + 1).cast("int").alias("n_frames"),
    )


def mm_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over the binary column: byte length + per-type
    counts stay pure-JVM (no decode needed)."""
    m = media_table(spark, sf_dir)
    return (
        m.groupBy("media_type")
        .agg(
            F.count("*").alias("n_media"),
            F.sum(F.length("blob")).alias("total_bytes"),
            F.max("n_frames").cast("long").alias("max_frames"),
        )
        .orderBy("media_type")
    )


def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling plan: every FRAME_STRIDE-th frame index per video,
    as (doc_id, frame_idx) — the explode that fans a video row out to
    its decode work items. Pure sequence arithmetic, no decode."""
    m = media_table(spark, sf_dir).filter(F.col("media_type") == "video")
    return (
        m.select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(FRAME_STRIDE))
            ).alias("frame_idx"),
        )
        .orderBy("doc_id", "frame_idx")
    )


# ---------------------------------------------------------------------------
# Decode / feature-extract via mapInPandas (Arrow-batched)
# ---------------------------------------------------------------------------

DECODE_SCHEMA = "doc_id long, media_type string, n_bytes long, feat0 long, feat1 long"


def _decode_stub(blob: bytes, media_type: str) -> tuple[int, int]:
    """STUB decode: the real implementation would dispatch to
    PIL/ffmpeg/soundfile per media_type — not available in this
    container. Deterministic fake features stand in: (first byte,
    xor-fold of all bytes). Raise for unknown types exactly as the
    real decoder would."""
    if media_type not in _TYPES:
        raise NotImplementedError(f"no decoder for media_type={media_type!r}")
    x = 0
    for b in blob:
        x ^= b
    return blob[0] if blob else 0, x


def decode_features(media: DataFrame) -> DataFrame:
    """Feature extraction over Arrow batches: mapInPandas keeps the
    blob column off the driver and processes whole record batches per
    task — the pattern a real decoder plugs into unchanged."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_decode_stub(b, t) for b, t in zip(pdf["blob"], pdf["media_type"])]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(b) for b in pdf["blob"]],
                    "feat0": [f[0] for f in feats],
                    "feat1": [f[1] for f in feats],
                }
            )

    return media.mapInPandas(run, DECODE_SCHEMA)


def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from newsleak_spark.session import ensure_workers_can_import

    ensure_workers_can_import(spark)
    return decode_features(media_table(spark, sf_dir)).orderBy("doc_id")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "mm_metadata": mm_metadata,
        "mm_frame_sample": mm_frame_sample,
        "mm_decode_features": mm_decode_features,  # rows-only (stubbed decode)
    }


def oracle_sql() -> dict[str, str]:
    return {
        "mm_metadata": (
            f"WITH media AS ({_MEDIA_SQL_DUCK})\n"
            "SELECT media_type, COUNT(*) AS n_media,\n"
            "       CAST(SUM(octet_length(blob)) AS BIGINT) AS total_bytes,\n"
            "       CAST(MAX(n_frames) AS BIGINT) AS max_frames\n"
            "FROM media GROUP BY media_type ORDER BY media_type"
        ),
        "mm_frame_sample": (
            f"WITH media AS ({_MEDIA_SQL_DUCK})\n"
            "SELECT doc_id, CAST(unnest(range(0, n_frames, "
            f"{FRAME_STRIDE})) AS INT) AS frame_idx\n"
            "FROM media WHERE media_type = 'video' ORDER BY doc_id, frame_idx"
        ),
    }
