"""P2 scale route measured: getDocs page latency over the ENGINE path
on a 10M-turn index (BASELINE.md "API getDocs at 10M") — ranked top-k
from the segment/WAND engine, whole-doc highlighting and metadata
enrichment on the returned page, hit total from the index alone.

Usage: python tools/api_page_bench.py [n_turns]   (default 10_000_000)
Reuses the demo index at /tmp/newsleak_demo_{n} when already built
(resume path), so it can run right after tools/demo_10m.py for free.
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from newsleak_spark.api import NewsleakAPI  # noqa: E402
from newsleak_spark.indexing import IndexConfig, build_index  # noqa: E402
from newsleak_spark.session import get_spark  # noqa: E402
from newsleak_spark.transcripts import synth_transcripts  # noqa: E402

PAGES = [
    # (label, query kwargs) — page 2 exercises the growing-top-k T2
    # path; the no-total variant isolates rank+fetch+highlight cost
    ("page1_total", dict(query="w5 w17", page=1, with_total=True)),
    ("page1_no_total", dict(query="w5 w17", page=1, with_total=False)),
    ("page2_cached", dict(query="w5 w17", page=2, with_total=False)),
    ("hot_page1", dict(query="spark", page=1, with_total=False)),
]


def main() -> None:
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    spark = get_spark(app_name="api_page_bench")
    spark.range(1_000).count()

    idx = f"/tmp/newsleak_demo_{n_turns}"
    parts = max(256, n_turns // 39_000)
    t = synth_transcripts(spark, n_turns, partitions=parts)
    # mirror tools/demo_10m.py's config selection so the resume path's
    # config-hash check accepts an index that demo built at this size
    cfg = IndexConfig(n_term_buckets=128) if n_turns > 20_000_000 else IndexConfig()
    build_index(spark, t, idx, cfg, resume=True)  # no-op if built

    api = NewsleakAPI(spark, t, idx)
    # warm: reader cache + dictionary point reads
    api.get_docs("w5 w17", page=1, page_size=50, with_total=False)
    api._hit_cache.clear()
    api.topk_runs = 0

    lat: dict[str, float] = {}
    for label, kw in PAGES:
        t0 = time.time()
        r = api.get_docs(page_size=50, **kw)
        lat[label] = round(time.time() - t0, 3)
        assert r["docs"], label
        assert all("<em>" in d["highlighted"] for d in r["docs"]), label

    # repeat-aggregation latency: first call runs the job, the repeat
    # is served from the (request, index state) result cache
    for label, call in (
        ("aggregate_first", lambda: api.aggregate("role", query="w5 w17")),
        ("aggregate_repeat", lambda: api.aggregate("role", query="w5 w17")),
        ("timeline_first", lambda: api.get_timeline("w5 w17", lod="year")),
        ("timeline_repeat", lambda: api.get_timeline("w5 w17", lod="year")),
    ):
        t0 = time.time()
        call()
        lat[label] = round(time.time() - t0, 3)
    print(json.dumps({
        "n_turns": n_turns,
        "page_size": 50,
        "latency_sec": lat,
        # expected 2: page1's ONE heap scan answers page1_no_total AND
        # page2_cached (merged per-shard heaps, exactness bound);
        # hot_page1 is a new query
        "topk_runs": api.topk_runs,
        "agg_runs": api.agg_runs,  # expected 2: each repeat is a cache hit
    }))


if __name__ == "__main__":
    main()
