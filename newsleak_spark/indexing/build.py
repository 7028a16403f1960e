"""Inverted-index build pipeline (north_star lineage):

  transcripts scan
    → tokenize (Arrow UDF / JVM regexp)            [stage: tokenized]
    → docmeta + collection stats (N, avgdl)        [stage: docmeta]
    → postings groupBy (doc_id, term)              (recomputed per stage,
                                                    deterministic)
    → dictionary (term, df, cf, is_hot)            [stage: dictionary]
    → salted repartition by (shard, bucket, term, salt)
    → delta+varint block encode (applyInPandas)    [stage: segments]
    → manifest with per-partition lineage          (committed last)

Layout (SURVEY §4.2 "Partition pruning" — two-level):
  - ``shard``  = hash(doc_id) % n_shards: the document shard. Each
    shard holds a full mini-index, so query-time AND-intersection and
    top-k are SHARD-LOCAL (mapPartitions/applyInPandas, no cross-shard
    traffic except the final k-way merge). Shard count is the scale
    knob: 10^12 turns → O(10^4-10^5) shards.
  - ``bucket`` = hash(term) % n_term_buckets: the term partition column
    INSIDE each shard. A query reads only the buckets of its query
    terms → parquet partition pruning does segment pruning for free.

Skew (north_rule "skew handled explicitly"): terms with
df ≥ hot_df_ratio·N get ``salt = doc_id % n_salts`` in the encode
shuffle key, so a stopword-frequency term (df ≈ 0.4N in the fixtures)
encodes as n_salts parallel groups instead of one straggler. Salted
sub-lists stay separate block runs in the segment; the query side
merges them (they are disjoint by construction).

Resumability: each stage is skipped when the manifest holds a
committed record with the same config hash (kill-and-resume tested in
tests/test_index_resume.py). Replaces the reference's non-resumable
drop-and-recreate (Postgres2ElasticsearchIndexer.java:82,368-372).
"""

from __future__ import annotations

import os
import time
from dataclasses import asdict, dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from newsleak_spark.analysis import ANALYZER_VERSION, tokens_col
from newsleak_spark.codec import delta_encode, encode_positions, varint_encode
from newsleak_spark.indexing.manifest import (
    Manifest,
    StageRecord,
    config_hash,
    dir_bytes,
)

K1 = 1.2
B = 0.75


@dataclass(frozen=True)
class IndexConfig:
    mode: str = "standard"          # analyzer mode (analysis.py)
    n_shards: int = 8               # doc shards (scale knob)
    n_term_buckets: int = 8         # term partition column per shard
    block_size: int = 128           # postings per block
    hot_df_ratio: float = 0.05      # df/N above which a term is "hot"
    n_salts: int = 8                # salt fan-out for hot-term encode
    with_positions: bool = True     # store positions (phrase queries)
    analyzer_version: int = ANALYZER_VERSION

    def as_dict(self) -> dict:
        return asdict(self)


BLOCK_SCHEMA = (
    "shard int, bucket int, term string, salt int, block_seq int, n int, "
    "doc_first long, doc_last long, max_tf int, max_score double, "
    "docs binary, tfs binary, dls binary, poscnt binary, posflat binary"
)


def _shard_col(doc_id, n_shards: int):
    return F.pmod(F.xxhash64(doc_id), F.lit(n_shards)).cast("int")


def _bucket_col(term, n_buckets: int):
    return F.pmod(F.xxhash64(term), F.lit(n_buckets)).cast("int")


def _postings(tokenized: DataFrame, with_positions: bool) -> DataFrame:
    """(doc_id, shard, dl, term, tf[, positions]) — one row per (doc, term)."""
    ex = tokenized.select(
        "doc_id", "shard", "dl", F.posexplode("toks").alias("pos", "term")
    )
    aggs = [F.count("*").cast("int").alias("tf"), F.first("dl").alias("dl"), F.first("shard").alias("shard")]
    if with_positions:
        aggs.append(F.sort_array(F.collect_list("pos")).alias("positions"))
    return ex.groupBy("doc_id", "term").agg(*aggs)


def _encode_group_fn(cfg: IndexConfig, n_docs: float, avgdl: float):
    block_size = cfg.block_size
    with_pos = cfg.with_positions

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        term = pdf["term"].iloc[0]
        shard = int(pdf["shard"].iloc[0])
        bucket = int(pdf["bucket"].iloc[0])
        salt = int(pdf["salt"].iloc[0])
        df_term = float(pdf["df"].iloc[0])
        idf = np.log(1.0 + (n_docs - df_term + 0.5) / (df_term + 0.5))

        docs = pdf["doc_id"].to_numpy(dtype=np.int64)
        tfs = pdf["tf"].to_numpy(dtype=np.int64)
        dls = pdf["dl"].to_numpy(dtype=np.int64)
        poss = pdf["positions"].tolist() if with_pos else None

        rows = []
        for seq, lo in enumerate(range(0, len(docs), block_size)):
            hi = min(lo + block_size, len(docs))
            d, t, L = docs[lo:hi], tfs[lo:hi], dls[lo:hi]
            scores = idf * t * (K1 + 1.0) / (t + K1 * (1.0 - B + B * L / avgdl))
            if with_pos:
                pc, pf = encode_positions([np.asarray(p, dtype=np.uint64) for p in poss[lo:hi]])
            else:
                pc, pf = b"", b""
            rows.append(
                {
                    "shard": shard,
                    "bucket": bucket,
                    "term": term,
                    "salt": salt,
                    "block_seq": seq,
                    "n": hi - lo,
                    "doc_first": int(d[0]),
                    "doc_last": int(d[-1]),
                    "max_tf": int(t.max()),
                    "max_score": float(scores.max()),
                    "docs": delta_encode(d.astype(np.uint64)),
                    "tfs": varint_encode(t.astype(np.uint64)),
                    "dls": varint_encode(L.astype(np.uint64)),
                    "poscnt": pc,
                    "posflat": pf,
                }
            )
        return pd.DataFrame(rows)

    return encode


def build_index(
    spark: SparkSession,
    transcripts: DataFrame,
    index_dir: str,
    cfg: IndexConfig | None = None,
    resume: bool = True,
) -> Manifest:
    from newsleak_spark.session import ensure_workers_can_import

    ensure_workers_can_import(spark)
    cfg = cfg or IndexConfig()
    man = Manifest(index_dir)
    chash = config_hash(cfg.as_dict())
    if man.config and man.config.get("_hash") not in (None, chash) and resume:
        raise ValueError(
            f"index at {index_dir} was built with a different config "
            f"({man.config.get('_hash')} != {chash}); pass resume=False to rebuild"
        )
    man.set_config({**cfg.as_dict(), "_hash": chash})

    tok_path = os.path.join(index_dir, "tokenized")
    meta_path = os.path.join(index_dir, "docmeta")
    dict_path = os.path.join(index_dir, "dictionary")
    seg_path = os.path.join(index_dir, "segments")

    # ---- stage 1: tokenized checkpoint (the temp-index analog, S4) -------
    if not (resume and man.stage_done("tokenized", chash)):
        t0 = time.time()
        tokenized = transcripts.select(
            "doc_id",
            "role",
            "tool",
            "ts",
            tokens_col(F.col("text"), cfg.mode).alias("toks"),
        ).withColumn("dl", F.size("toks")).withColumn(
            "shard", _shard_col(F.col("doc_id"), cfg.n_shards)
        )
        tokenized.write.mode("overwrite").partitionBy("shard").parquet(tok_path)
        rows = spark.read.parquet(tok_path).count()
        man.commit_stage(
            StageRecord("tokenized", rows, time.time() - t0, dir_bytes(tok_path), chash)
        )

    tokenized = spark.read.parquet(tok_path)

    # ---- stage 2: docmeta + collection stats ------------------------------
    if not (resume and man.stage_done("docmeta", chash)):
        t0 = time.time()
        tokenized.select("doc_id", "role", "tool", "ts", "dl", "shard").write.mode(
            "overwrite"
        ).partitionBy("shard").parquet(meta_path)
        stats_row = spark.read.parquet(meta_path).agg(
            F.count("*").alias("n"), F.sum("dl").alias("sum_dl")
        ).collect()[0]
        n_docs = int(stats_row["n"])
        avgdl = float(stats_row["sum_dl"]) / n_docs if n_docs else 0.0
        man.set_stats(n_docs=n_docs, avgdl=avgdl, sum_dl=int(stats_row["sum_dl"] or 0))
        man.commit_stage(
            StageRecord("docmeta", n_docs, time.time() - t0, dir_bytes(meta_path), chash)
        )
    n_docs = float(man.stats["n_docs"])
    avgdl = float(man.stats["avgdl"])

    # ---- stage 3: dictionary ----------------------------------------------
    if not (resume and man.stage_done("dictionary", chash)):
        t0 = time.time()
        postings = _postings(tokenized, with_positions=False)
        dictionary = (
            postings.groupBy("term")
            .agg(F.count("*").alias("df"), F.sum("tf").alias("cf"))
            .withColumn("bucket", _bucket_col(F.col("term"), cfg.n_term_buckets))
            .withColumn("is_hot", F.col("df") >= F.lit(cfg.hot_df_ratio) * F.lit(n_docs))
        )
        dictionary.write.mode("overwrite").partitionBy("bucket").parquet(dict_path)
        n_terms = spark.read.parquet(dict_path).count()
        n_hot = spark.read.parquet(dict_path).filter("is_hot").count()
        man.set_stats(n_terms=n_terms, n_hot_terms=n_hot)
        man.commit_stage(
            StageRecord(
                "dictionary", n_terms, time.time() - t0, dir_bytes(dict_path), chash,
                extra={"hot_terms": n_hot},
            )
        )

    dictionary = spark.read.parquet(dict_path)

    # ---- stage 4: segments (salted encode shuffle) -------------------------
    if not (resume and man.stage_done("segments", chash)):
        t0 = time.time()
        postings = _postings(tokenized, cfg.with_positions)
        if not cfg.with_positions:
            postings = postings.withColumn("positions", F.array().cast("array<int>"))
        joined = postings.join(
            dictionary.select("term", "df", "bucket", "is_hot"), "term"
        ).withColumn(
            "salt",
            F.when(F.col("is_hot"), F.pmod(F.col("doc_id"), F.lit(cfg.n_salts)))
            .otherwise(F.lit(0))
            .cast("int"),
        )
        blocks = joined.groupBy("shard", "bucket", "term", "salt").applyInPandas(
            _encode_group_fn(cfg, n_docs, avgdl), BLOCK_SCHEMA
        )
        # second (cheap) shuffle: co-locate each (shard,bucket) partition's
        # blocks and lay rows out term-sorted for parquet row-group pruning
        (
            blocks.repartition("shard", "bucket")
            .sortWithinPartitions("term", "salt", "block_seq")
            .write.mode("overwrite")
            .partitionBy("shard", "bucket")
            .parquet(seg_path)
        )
        seg = spark.read.parquet(seg_path)
        lineage_rows = (
            seg.groupBy("shard", "bucket")
            .agg(F.count("*").alias("blocks"), F.sum("n").alias("postings"))
            .collect()
        )
        lineage = {
            f"shard={r['shard']}/bucket={r['bucket']}": {
                "blocks": int(r["blocks"]),
                "postings": int(r["postings"]),
            }
            for r in lineage_rows
        }
        total_postings = sum(v["postings"] for v in lineage.values())
        man.set_stats(n_postings=total_postings)
        man.commit_stage(
            StageRecord(
                "segments",
                total_postings,
                time.time() - t0,
                dir_bytes(seg_path),
                chash,
                partitions=lineage,
            )
        )

    return man
