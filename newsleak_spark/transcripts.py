"""The transcripts input table (BASELINE.json input_hint).

Schema: (conv_id string, turn_idx int, role string, text string,
tool string, ts timestamp) — one indexed document per turn, the
newsleak "document" analog (Postgres2ElasticsearchIndexer.java:239-313).

Two sources:

1. ``load_transcripts(spark, sf_dir)`` — a deterministic derivation of
   the transcripts table FROM the driver-provided ``documents`` parquet.
   The derivation is expressed as SQL that parses identically in Spark
   and DuckDB (modulo the timestamp constructor), so every oracle query
   can rebuild the exact same table inside DuckDB: parity by
   construction. ``doc_id`` is the pre-existing dense id (SURVEY §1.4:
   deterministic id, unlike the reference's autoincrement mutex at
   ElasticsearchResource.java:241-244).

2. ``synth_transcripts(spark, n_turns, ...)`` — a seed-pinned scalable
   generator (spark.range + hash-mixed Zipfian text in an Arrow pandas
   UDF) used for benchmarks and skew tests at arbitrary scale. Pure
   function of (seed, n_turns): no wall clock, no Python RNG state
   shared across partitions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

# Portable core of the derivation. {ts} is the dialect-specific
# micros→timestamp constructor; everything else parses in both engines.
# Layout: n_convs = floor(N/20) conversations of ~20 turns;
# conv = doc_id % n_convs, turn_idx = doc_id // n_convs (gap-free,
# (conv_id, turn_idx) unique — the stable-ordering invariant).
# ts is monotone within a conversation and spans multiple years so
# year/month/day histograms all bucket non-trivially.
_DERIVE_TEMPLATE = """
WITH _cnt AS (
  SELECT GREATEST(CAST(FLOOR(COUNT(*) / 20.0) AS BIGINT), 1) AS n_convs
  FROM documents
),
_base AS (
  SELECT doc_id, text, n_convs
  FROM documents CROSS JOIN _cnt
),
_turns AS (
  SELECT
    doc_id,
    CONCAT('conv_', CAST(doc_id % n_convs AS {str_t})) AS conv_id,
    CAST(FLOOR(doc_id / CAST(n_convs AS DOUBLE)) AS INT) AS turn_idx,
    CASE CAST(doc_id % 4 AS INT)
      WHEN 0 THEN 'user'
      WHEN 1 THEN 'assistant'
      WHEN 2 THEN 'system'
      ELSE 'tool'
    END AS role,
    text,
    CASE WHEN doc_id % 4 = 3
         THEN CONCAT('tool_', CAST(doc_id % 7 AS {str_t}))
         ELSE NULL END AS tool,
    CAST(
      (1514764800000000
       + CAST(FLOOR(doc_id / CAST(n_convs AS DOUBLE)) AS BIGINT) * 6307200000000
       + (doc_id % n_convs) * 3600000000) AS BIGINT) AS ts_micros
  FROM _base
)
SELECT doc_id, conv_id, turn_idx, role, text, tool, {ts} AS ts
FROM _turns
"""


def transcripts_sql(dialect: str = "duckdb") -> str:
    """The full derivation SELECT (expects a ``documents`` view)."""
    if dialect == "duckdb":
        return _DERIVE_TEMPLATE.format(ts="make_timestamp(ts_micros)", str_t="VARCHAR")
    if dialect == "spark":
        return _DERIVE_TEMPLATE.format(ts="timestamp_micros(ts_micros)", str_t="STRING")
    raise ValueError(dialect)


def oracle_prelude(sf_dir_placeholder: bool = False) -> str:
    """DuckDB WITH-clause prefix defining ``transcripts`` from the
    pre-registered ``documents`` view. Append the query body after it."""
    return f"WITH transcripts AS ({transcripts_sql('duckdb')})\n"


def register_tables(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    for name in tables or TABLES:
        try:
            spark.read.parquet(f"{sf_dir}/{name}.parquet").createOrReplaceTempView(name)
        except Exception:
            pass  # not every sf dir has every table


def load_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic transcripts table for an sf dir (oracle-reproducible)."""
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView("documents")
    return spark.sql(transcripts_sql("spark"))


# ---------------------------------------------------------------------------
# Scalable synthetic generator (bench / skew / scaling runs)
# ---------------------------------------------------------------------------

_VOCAB_SIZE = 50_000
_HOT_TERM = "spark"  # injected with df ≈ 0.4N to exercise salted merge


_M64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 — a counter-based hash, so every token of
    every doc is a pure function of (seed, doc_id, j): deterministic,
    partition-independent, no per-row RNG objects."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & _M64
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _M64
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _M64
    return x ^ (x >> np.uint64(31))


def _zipf_text_batch(doc_ids: np.ndarray, seed: int) -> list[str]:
    """Deterministic per-doc text: Zipf-ish draws from a synthetic
    vocab, fully vectorized (hash → inverse-CDF power law)."""
    dids = doc_ids.astype(np.uint64)
    s = np.uint64(seed)
    h0 = _splitmix64(dids * np.uint64(2654435761) + s)
    n_tok = (5 + (h0 % np.uint64(115))).astype(np.int64)  # 5..119 tokens
    offs = np.concatenate(([0], np.cumsum(n_tok)))
    total = int(offs[-1])
    # counter per token: doc_id * 2^32 + j  (j < 2^32 always)
    doc_rep = np.repeat(dids, n_tok)
    j = np.arange(total, dtype=np.int64) - np.repeat(offs[:-1], n_tok)
    ht = _splitmix64((doc_rep << np.uint64(32)) + j.astype(np.uint64) + s)
    u = (ht >> np.uint64(11)).astype(np.float64) / float(1 << 53)  # (0,1)
    # inverse-CDF power law ≈ Zipf(1.3): heavy head, long tail, clipped
    ids = np.minimum((1.0 / np.maximum(u, 1e-12)) ** (1.0 / 0.3), _VOCAB_SIZE).astype(np.int64)
    words = np.char.add("w", ids.astype("U7"))
    hot = (h0 >> np.uint64(8)) % np.uint64(10) < np.uint64(4)  # df ≈ 0.4N
    rare = (h0 >> np.uint64(16)) % np.uint64(50) == np.uint64(0)
    long_tok = "reallylong" + "x" * 80  # >70-char token (dropped by cleanup)
    out = []
    for i in range(len(dids)):
        w = words[offs[i] : offs[i + 1]]
        parts = " ".join(w)
        if hot[i]:
            parts += " " + _HOT_TERM
        if rare[i]:
            parts += " " + long_tok
        out.append(parts)
    return out


def synth_transcripts(
    spark: SparkSession,
    n_turns: int,
    turns_per_conv: int = 20,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Seed-pinned synthetic transcripts at arbitrary scale.

    Generated distributively from spark.range — at 10^12 turns this is
    a pure map stage, no driver materialization, no shuffle."""
    n_convs = max(n_turns // turns_per_conv, 1)
    base = spark.range(0, n_turns, 1, partitions or spark.sparkContext.defaultParallelism)
    base = base.withColumnRenamed("id", "doc_id")

    @F.pandas_udf(T.StringType())
    def gen_text(ids: pd.Series) -> pd.Series:
        return pd.Series(_zipf_text_batch(ids.to_numpy(), seed))

    roles = F.array(F.lit("user"), F.lit("assistant"), F.lit("system"), F.lit("tool"))
    return (
        base.withColumn("conv_id", F.concat(F.lit("conv_"), (F.col("doc_id") % n_convs).cast("string")))
        .withColumn("turn_idx", (F.col("doc_id") / n_convs).cast("int"))
        .withColumn("role", F.element_at(roles, (F.col("doc_id") % 4).cast("int") + 1))
        .withColumn("text", gen_text("doc_id"))
        .withColumn(
            "tool",
            F.when(F.col("doc_id") % 4 == 3, F.concat(F.lit("tool_"), (F.col("doc_id") % 7).cast("string"))),
        )
        .withColumn(
            "ts",
            F.timestamp_micros(
                F.lit(1514764800000000)
                + F.col("turn_idx").cast("long") * F.lit(6307200000000)
                + (F.col("doc_id") % n_convs) * F.lit(3600000000)
            ),
        )
    )


def composite_doc_id(conv_id: F.Column, turn_idx: F.Column) -> F.Column:
    """Deterministic 64-bit doc id for arbitrary transcript tables:
    43 bits of conv hash << 21 | turn_idx (turn_idx < 2^21). Collision
    risk is audited by ``audit_doc_ids``. SURVEY §1.4."""
    return F.shiftleft(F.abs(F.xxhash64(conv_id)) % F.lit(1 << 42), 21) + turn_idx.cast("long")


def audit_doc_ids(df: DataFrame) -> int:
    """Returns number of colliding doc_ids (must be 0 before indexing)."""
    return df.groupBy("doc_id").count().filter(F.col("count") > 1).count()
