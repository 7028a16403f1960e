"""Compaction cost vs full rebuild (BASELINE.md "Compaction cost").

Builds a base (2/3 of turns) + one delta (1/3), then times
compact_index against a from-scratch rebuild of the full collection on
the same session. Compaction skips tokenize + postings derivation (the
merged postings checkpoints are unioned), so its cost is ~the
dictionary+segments stages plus two columnar unions.

Usage: python tools/compact_bench.py [n_turns]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from newsleak_spark.indexing import (  # noqa: E402
    IndexConfig,
    append_index,
    build_index,
    compact_index,
)
from newsleak_spark.indexing.manifest import Manifest  # noqa: E402
from newsleak_spark.session import get_spark  # noqa: E402
from newsleak_spark.transcripts import synth_transcripts  # noqa: E402


def main() -> None:
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    mode = sys.argv[2] if len(sys.argv) > 2 else "standard"
    spark = get_spark()
    cfg = IndexConfig(mode=mode)
    root = f"/tmp/newsleak_compact_bench_{n_turns}"
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    t = synth_transcripts(spark, n_turns, partitions=128)

    # warm-up (JIT + python workers), untimed
    warm = os.path.join(root, "warm")
    build_index(spark, synth_transcripts(spark, 50_000, partitions=32), warm, cfg)
    shutil.rmtree(warm, ignore_errors=True)

    inc = os.path.join(root, "inc")
    build_index(spark, t.filter(F.col("doc_id") % 3 != 0), inc, cfg, resume=False)
    append_index(spark, t.filter(F.col("doc_id") % 3 == 0), inc, cfg)

    t0 = time.time()
    comp = os.path.join(root, "compacted")
    compact_index(spark, inc, comp)
    compact_sec = time.time() - t0

    t0 = time.time()
    full = os.path.join(root, "full")
    build_index(spark, t, full, cfg, resume=False)
    rebuild_sec = time.time() - t0

    cs, fs = Manifest(comp).stats, Manifest(full).stats
    assert cs["n_docs"] == fs["n_docs"] and cs["n_postings"] == fs["n_postings"], (cs, fs)
    print(
        f"n_turns={n_turns} mode={mode} compact_sec={compact_sec:.1f} "
        f"rebuild_sec={rebuild_sec:.1f} ratio={compact_sec / rebuild_sec:.2f} "
        f"(postings={fs['n_postings']})"
    )
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
