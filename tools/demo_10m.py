"""Single-node scale demonstration: build a 10M-turn index on
local[32] and measure warm query latency on it (the numbers behind
BASELINE.md §"10M-turn single-node demonstration").

Usage: python tools/demo_10m.py [n_turns]   (default 10_000_000)
Prints one JSON line: build stage walls + per-query warm latency.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from newsleak_spark.indexing import IndexConfig, build_index  # noqa: E402
from newsleak_spark.indexing.manifest import Manifest  # noqa: E402
from newsleak_spark.query import QuerySpec  # noqa: E402
from newsleak_spark.query.engine import search  # noqa: E402
from newsleak_spark.session import get_spark  # noqa: E402
from newsleak_spark.transcripts import synth_transcripts  # noqa: E402

QUERIES = {
    "single_w3": QuerySpec(terms=("w3",), k=20),
    "hot_spark": QuerySpec(terms=("spark",), k=20),
    "and_w5_w17": QuerySpec(terms=("w5", "w17"), k=20),
    "phrase_selective": QuerySpec(phrases=(("w207", "w1033"),), k=20),
    # two top-Zipf terms: COVERED by the top-8-by-cf bigram sidecar
    # (membership pruning, no position decode)
    "phrase_worstcase": QuerySpec(phrases=(("w2", "w4"),), k=20),
    # two hot-but-below-top-8 terms (df≈0.58/0.54): UNCOVERED — the
    # honest residual cost of the bounded sidecar (unigram positions
    # over a ~3M-candidate AND)
    "phrase_hot_uncovered": QuerySpec(phrases=(("w9", "w10"),), k=20),
    "union_bmw": QuerySpec(terms=(), boost_terms=("w3", "w9", "w27"), k=20),
    "filtered_w3_role": QuerySpec(terms=("w3",), role_filter=("user",), k=20),
}


def main() -> None:
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    extra = None
    if n_turns > 20_000_000:
        # disk-footprint controls for runs past the proven 10M size:
        # the sandbox has one ~76GB-free disk, and the ContextCleaner's
        # default 30min periodic GC leaves every completed stage's
        # shuffle blocks on disk for the whole build — a 50M run died
        # on ENOSPC exactly that way. zstd shuffle/spill compression
        # (~1.5-2x over lz4 on token-ish rows) plus a 1min GC interval
        # (shuffles become unreferenced as soon as the next stage's
        # checkpoint is written) keep peak scratch within the budget.
        extra = {
            "spark.io.compression.codec": "zstd",
            "spark.cleaner.periodicGC.interval": "1min",
            # local mode: the driver JVM is the executor — the default
            # 8g heap OOMed the 50M segments encode (32 concurrent
            # applyInArrow groups, each materializing a multi-hundred-MB
            # Arrow table of postings+positions, plus shuffle read-ahead
            # buffers). Size the heap like a real executor fleet would
            # be: ~2g per concurrent encode task.
            "spark.driver.memory": "64g",
        }
    spark = get_spark(app_name="demo_10m", extra_conf=extra)
    spark.range(1_000).count()

    idx = f"/tmp/newsleak_demo_{n_turns}"
    # RESUME=1: re-enter a partially-built index dir (kill-and-resume is
    # a first-class build feature; committed stages are skipped by
    # manifest config-hash match). Total build wall is then the sum of
    # the manifest's per-stage walls, not this process's elapsed time.
    resume = os.environ.get("RESUME") == "1"
    if not resume:
        shutil.rmtree(idx, ignore_errors=True)
    # hold per-partition volume at the proven 10M geometry (256 parts
    # ≈ 39k turns/part) instead of letting larger runs inflate it
    parts = max(256, n_turns // 39_000)
    t = synth_transcripts(spark, n_turns, partitions=parts)
    cfg = IndexConfig()
    if n_turns > 20_000_000:
        # posting-merge / segment-write partition tuning (the north
        # rule's explicit scale knob): widen the term-bucket fan-out so
        # per-(shard,bucket,salt) encode groups stay near the proven
        # 10M geometry instead of growing linearly with the input
        cfg = IndexConfig(n_term_buckets=128)
    t0 = time.time()
    build_index(spark, t, idx, cfg, resume=resume)
    build_sec = time.time() - t0
    man = Manifest(idx)
    if resume:
        # elapsed time excludes stages committed by the killed run;
        # report the manifest's stage-wall sum as the build cost so the
        # headline number covers the WHOLE build, not just the tail
        build_sec = sum(v["wall_sec"] for v in man.stages.values())

    out = {
        "n_turns": n_turns,
        "build_sec": round(build_sec, 1),
        "turns_per_sec": round(n_turns / build_sec),
        "stage_sec": {k: round(v["wall_sec"], 1) for k, v in man.stages.items()},
        "postings": man.stats.get("n_postings"),
        "terms": man.stats.get("n_terms"),
        "hot_terms": man.stats.get("n_hot_terms"),
    }

    lat: dict[str, float] = {}
    for name, spec in QUERIES.items():
        search(spark, idx, spec).collect()  # cold (plan + page cache)
        t0 = time.time()
        search(spark, idx, spec).collect()
        lat[name] = round(time.time() - t0, 2)
    out["query_warm_sec"] = lat
    # KEEP_INDEX=1 leaves the built index for tools/api_page_bench.py
    # (it resumes from /tmp/newsleak_demo_{n} instead of rebuilding)
    if os.environ.get("KEEP_INDEX") != "1":
        shutil.rmtree(idx, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
