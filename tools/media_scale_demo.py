"""Media encode/decode throughput at scale: build real containers
(WAV/PPM/Y4M) for N synthetic docs and run the full decode_features
parse over them — the round-3 real-codec path under load.

Usage: python tools/media_scale_demo.py [n_docs]   (default 2_000_000)
Prints one JSON line (encode+decode wall, rows/s, per-type counts).

Both stages are map-only mapInPandas over Arrow batches (no shuffle
except the final type histogram), so throughput scales with executors;
the number here is the single-node local[32] anchor.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from newsleak_spark import multimodal  # noqa: E402
from newsleak_spark.session import ensure_workers_can_import, get_spark  # noqa: E402


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    spark = get_spark(app_name="media_scale_demo")
    spark.range(100).count()
    ensure_workers_can_import(spark)

    # synthetic docs table shaped like the fixture (doc_id, text)
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("turn text "), F.col("id").cast("string")).alias("text"),
    )
    d = "/tmp/media_scale_docs"
    docs.write.mode("overwrite").parquet(f"{d}/documents.parquet")

    t0 = time.time()
    media = multimodal.media_table(spark, d)
    enc_bytes = media.agg(F.sum(F.length("blob")).alias("b")).collect()[0]["b"]
    enc_sec = time.time() - t0

    t0 = time.time()
    feats = multimodal.decode_features(multimodal.media_table(spark, d))
    hist = {
        r["media_type"]: (r["n"], r["fsum"])
        for r in feats.groupBy("media_type")
        .agg(F.count("*").alias("n"), F.sum("feat_sum").alias("fsum"))
        .collect()
    }
    dec_sec = time.time() - t0

    print(json.dumps({
        "n_docs": n_docs,
        "encode_sec": round(enc_sec, 1),
        "encode_docs_per_sec": round(n_docs / enc_sec),
        "total_media_bytes": int(enc_bytes),
        "decode_sec": round(dec_sec, 1),  # includes re-encode (one pass)
        "decode_docs_per_sec": round(n_docs / dec_sec),
        "per_type": {k: {"n": int(n), "feat_sum": int(s)} for k, (n, s) in hist.items()},
    }))


if __name__ == "__main__":
    main()
