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


def _zipf_text_batch(doc_ids: np.ndarray, seed: int) -> list[str]:
    """Deterministic per-doc text: Zipfian draws from a synthetic vocab.

    Seeded per doc_id so output is independent of partitioning."""
    out = []
    for did in doc_ids:
        rng = np.random.default_rng(seed * 1_000_003 + int(did))
        n = int(rng.integers(5, 120))
        # Zipf over vocab ids; clip to vocab
        ids = np.minimum(rng.zipf(1.3, size=n), _VOCAB_SIZE)
        words = [f"w{v}" for v in ids]
        if rng.random() < 0.4:
            words.append(_HOT_TERM)  # hot term, df ≈ 0.4N
        if rng.random() < 0.02:
            words.append("reallylong" + "x" * 80)  # >70-char token (dropped by cleanup)
        out.append(" ".join(words))
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
