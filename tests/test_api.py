"""Serving-layer API tests: the getDocs/induceSubgraph/getTimeline/
aggregate surface must agree with the operator layer it composes
(engine search, facet_counts, cooccurrence, date_histogram)."""

import shutil

import pytest
from pyspark.sql import functions as F

from newsleak_spark import facets as facets_mod
from newsleak_spark.api import NewsleakAPI
from newsleak_spark.indexing import IndexConfig, build_index
from newsleak_spark.query import QuerySpec, bm25_topk
from newsleak_spark.query.brute import matching_docs


@pytest.fixture(scope="module")
def index_dir(spark, transcripts, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("apiidx"))
    build_index(spark, transcripts, d, IndexConfig(n_shards=4, n_term_buckets=8, block_size=32))
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="module")
def api(spark, transcripts, index_dir):
    return NewsleakAPI(spark, transcripts, index_dir)


@pytest.fixture(scope="module")
def api_noindex(spark, transcripts):
    return NewsleakAPI(spark, transcripts, None)


def test_get_docs_ranks_match_engine(api, api_noindex, transcripts):
    want = [r["doc_id"] for r in bm25_topk(transcripts, QuerySpec(terms=("merge", "window"), k=10)).collect()]
    got = api.get_docs("merge window", page_size=10, with_total=False)
    assert [d["id"] for d in got["docs"]] == want
    got2 = api_noindex.get_docs("merge window", page_size=10, with_total=False)
    assert [d["id"] for d in got2["docs"]] == want


def test_get_docs_shape_and_highlight(api):
    out = api.get_docs('merge "fast table"', page_size=5)
    assert out["hits"] is not None and out["hits"] >= len(out["docs"])
    for d in out["docs"]:
        assert {"id", "score", "content", "highlighted", "metadata"} <= set(d)
        assert "<em>" in d["highlighted"]
        assert set(d["metadata"]) == {"conv_id", "turn_idx", "role", "tool", "ts"}


def test_get_docs_not_query(api, api_noindex, transcripts):
    """'-term' flows request-string → compile_spec → engine/brute."""
    spec = QuerySpec(terms=("table",), not_terms=("join",), k=10)
    want = [r["doc_id"] for r in bm25_topk(transcripts, spec).collect()]
    got = api.get_docs("table -join", page_size=10, with_total=False)
    assert [d["id"] for d in got["docs"]] == want
    got2 = api_noindex.get_docs("table -join", page_size=10, with_total=False)
    assert [d["id"] for d in got2["docs"]] == want
    # excluded term absent from every surfaced doc
    import re as _re

    for d in got["docs"]:
        assert "join" not in _re.findall(r"[a-z0-9]+", d["content"].lower())


def test_get_docs_pagination(api):
    all20 = api.get_docs("table", page_size=20, with_total=False)["docs"]
    p2 = api.get_docs("table", page=2, page_size=10, with_total=False)["docs"]
    assert [d["id"] for d in p2] == [d["id"] for d in all20[10:]]


def test_get_docs_hits_is_matching_count(api, transcripts):
    spec = QuerySpec(terms=("merge",))
    out = api.get_docs("merge", page_size=3)
    assert out["hits"] == matching_docs(transcripts, spec).count()


def test_count_hits_matches_matching_docs(spark, api, transcripts, index_dir):
    """Engine-only totals (no text scan) must equal the brute doc-set
    count, including the ES bool edge case: no musts → at least one
    should (boost) term must match."""
    from newsleak_spark.query.engine import count_hits

    for spec in [
        QuerySpec(terms=("merge", "window")),
        QuerySpec(phrases=(("fast", "table"),)),
        QuerySpec(terms=("table",), role_filter=("user",)),
        QuerySpec(terms=(), boost_terms=("merge", "window")),  # should-only
        QuerySpec(),  # match_all
    ]:
        got = count_hits(spark, index_dir, spec)
        want = matching_docs(transcripts, spec).count()
        assert got == want, (spec, got, want)


def test_induce_subgraph_matches_operator_layer(api, transcripts):
    g = api.induce_subgraph(n_nodes=7)
    want_nodes = facets_mod.facet_counts(
        transcripts.filter(F.col("tool").isNotNull()), "tool", k=7
    ).collect()
    assert [n["id"] for n in g["nodes"]] == [r["value"] for r in want_nodes]
    assert g["relationships"], "expected co-usage edges"
    for e in g["relationships"]:
        assert e["source"] < e["target"] and e["weight"] >= 1


def test_induce_subgraph_filtered(api, transcripts):
    g = api.induce_subgraph(query="merge", n_nodes=5)
    m = matching_docs(transcripts, QuerySpec(terms=("merge",)))
    want = facets_mod.facet_counts(m, "tool", k=5).collect()
    assert [n["id"] for n in g["nodes"]] == [r["value"] for r in want]


def test_timeline_dense_buckets(api):
    tl = api.get_timeline(lod="year")
    keys = [b["key"] for b in tl["buckets"]]
    assert keys == sorted(keys) and len(keys) == len(set(keys))
    # dense: every year between min and max present (min_doc_count=0)
    years = [int(k) for k in keys]
    assert years == list(range(years[0], years[-1] + 1))


def test_timeline_respects_time_range(api):
    tl = api.get_timeline(time_range="2018-2019", lod="year")
    assert all(b["key"] in ("2018", "2019") for b in tl["buckets"])


def test_english_mode_highlight_surfaces_stems(spark):
    """english mode: query 'tables' stems to 'tabl'; docs whose text
    has only the surface form 'table' must STILL get <em> highlights
    (analyzed-term matching, not surface-regex matching)."""
    from newsleak_spark.transcripts import TRANSCRIPT_SCHEMA
    import datetime as dt

    rows = [
        (1, "c1", 0, "user", "the table was merged fast", None, dt.datetime(2020, 1, 1)),
        (2, "c1", 1, "user", "tables inside tables", None, dt.datetime(2020, 1, 2)),
    ]
    t = spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)
    api = NewsleakAPI(spark, t, None, mode="english")
    out = api.get_docs("tables", page_size=5, with_total=False)
    by_id = {d["id"]: d for d in out["docs"]}
    assert set(by_id) == {1, 2}
    assert "<em>table</em>" in by_id[1]["highlighted"]
    assert "<em>tables</em>" in by_id[2]["highlighted"]


def test_aggregate_include_zero_fill(api):
    out = api.aggregate("tool", include=["tool_1", "zzz_never"])
    by_key = {b["key"]: b["docCount"] for b in out["buckets"]}
    assert by_key.get("zzz_never") == 0 and by_key.get("tool_1", 0) > 0


def test_hit_cache_invalidated_by_index_mutation(
    spark, transcripts, tmp_path_factory
):
    """The collected-hits cache must not outlive the index state: after
    append_index on the same index_dir, a repeated getDocs re-runs the
    ranked scan and surfaces docs from the delta (the index mtime rides
    in the cache key, same invalidation as the engine reader cache)."""
    from newsleak_spark.indexing import append_index

    d = str(tmp_path_factory.mktemp("mutidx"))
    base = transcripts.filter(F.col("doc_id") % 2 == 0)
    cfg = IndexConfig(n_shards=2, n_term_buckets=4, block_size=32)
    build_index(spark, base, d, cfg)
    api_m = NewsleakAPI(spark, transcripts, d)

    r1 = api_m.get_docs("table", page=1, page_size=10, with_total=False, highlight=False)
    assert api_m.topk_runs == 1
    extra = transcripts.filter(F.col("doc_id") % 2 == 1)
    append_index(spark, extra, d, cfg)

    r2 = api_m.get_docs("table", page=1, page_size=10, with_total=False, highlight=False)
    assert api_m.topk_runs == 2  # NOT served from the stale cache
    assert {doc["id"] for doc in r2["docs"]} != {doc["id"] for doc in r1["docs"]} or [
        doc["score"] for doc in r2["docs"]
    ] != [doc["score"] for doc in r1["docs"]]
    shutil.rmtree(d, ignore_errors=True)


def test_get_docs_hit_cache_across_pages(spark, transcripts):
    """Paginated requests of the same query reuse the collected ranked
    hits (the reference caches its hit iterator by query hash): a
    repeat of page 1 and a SHALLOWER page after a deep one run no new
    ranked scan; a deeper page re-runs with a larger k."""
    from newsleak_spark.api import NewsleakAPI

    api = NewsleakAPI(spark, transcripts)
    r1 = api.get_docs("table", page=1, page_size=5, with_total=False, highlight=False)
    assert api.topk_runs == 1
    r1b = api.get_docs("table", page=1, page_size=5, with_total=False, highlight=False)
    assert api.topk_runs == 1  # served from cache
    assert [d["id"] for d in r1b["docs"]] == [d["id"] for d in r1["docs"]]

    r2 = api.get_docs("table", page=2, page_size=5, with_total=False, highlight=False)
    assert api.topk_runs == 2  # deeper k -> one re-run
    assert not set(d["id"] for d in r2["docs"]) & set(d["id"] for d in r1["docs"])

    # page 1 again: the cached deeper run answers it (prefix property)
    r1c = api.get_docs("table", page=1, page_size=5, with_total=False, highlight=False)
    assert api.topk_runs == 2
    assert [d["id"] for d in r1c["docs"]] == [d["id"] for d in r1["docs"]]


def test_merge_heaps_exactness_bound():
    """_merge_heaps unit semantics: the merged ranking is exact through
    the minimum truncated-shard boundary key; untruncated shards are
    exhaustive."""
    from newsleak_spark.api import _merge_heaps

    mk = lambda s, d, sc: {"shard": s, "doc_id": d, "score_e6": sc}
    # k=2: shard 0 truncated (2 rows, weakest score 80), shard 1
    # exhausted (1 row). Rows scoring >= 80 are exact; doc 4 (score 70)
    # could be displaced by shard 0's unreturned docs.
    rows = [mk(0, 1, 100), mk(0, 2, 80), mk(1, 3, 90), mk(1, 4, 70)]
    merged, safe = _merge_heaps(rows, 2)
    assert [r["doc_id"] for r in merged] == [1, 3, 2, 4]
    # both shards truncated; the MOST RESTRICTIVE boundary is shard 0's
    # (score 80): an unreturned shard-0 doc could score 79 and displace
    # doc 4 (score 70), so only the first 3 positions are exact
    assert safe == 3
    # only shard 0 truncated: boundary (80, 2) -> exact through doc 2
    merged, safe = _merge_heaps([mk(0, 1, 100), mk(0, 2, 80), mk(1, 3, 90)], 2)
    assert safe == 3
    # no shard truncated: exhaustive
    _merged, safe = _merge_heaps([mk(0, 1, 100), mk(1, 3, 90)], 5)
    assert safe == float("inf")


def test_indexed_pagination_vs_full_rank(spark, transcripts, index_dir):
    """Pagination vs full rank (T2 / SearchHitIterator.scala:43-58):
    pages concatenated == one deep top-k, and pages within the heap
    exactness bound run NO new ranked scan (the round-3 pager re-ran
    the whole top-k at growing k per page boundary)."""
    from newsleak_spark.query.engine import search

    api = NewsleakAPI(spark, transcripts, index_dir)
    pages = []
    for p in range(1, 5):
        pages += [
            d["id"]
            for d in api.get_docs(
                "table", page=p, page_size=5, with_total=False, highlight=False
            )["docs"]
        ]
    want = [r["doc_id"] for r in search(spark, index_dir, QuerySpec(terms=("table",), k=20)).collect()]
    assert pages == want
    # one heap scan answers several pages: with 4 shards the merge is
    # exact well past page 1, so 4 pages never cost 4 scans
    assert api.topk_runs <= 2


def test_aggregation_result_cache(spark, transcripts, index_dir):
    """Facet/timeline/network results are cached on (request, index
    state): a repeat request runs no new aggregation job; a different
    request does (reference: ES request cache, ESRequestUtils.scala:68)."""
    api = NewsleakAPI(spark, transcripts, index_dir)
    r1 = api.aggregate("role", query="table", size=5)
    assert api.agg_runs == 1
    assert api.aggregate("role", query="table", size=5) == r1
    assert api.agg_runs == 1  # cache hit
    t1 = api.get_timeline("table", lod="year")
    assert api.agg_runs == 2
    assert api.get_timeline("table", lod="year") == t1
    assert api.agg_runs == 2
    g1 = api.induce_subgraph("table")
    assert api.agg_runs == 3
    assert api.induce_subgraph("table") == g1
    assert api.agg_runs == 3
    api.aggregate("role", query="merge", size=5)  # different spec -> job
    assert api.agg_runs == 4
    # match_all / filters-only specs take the brute path in _matching
    # (computed from self.transcripts, which carries no invalidation
    # signal) — they must recompute every time even with an index
    # attached, or a transcripts-source change that doesn't touch the
    # index would serve stale aggregations
    api.aggregate("role", query="", size=5)
    assert api.agg_runs == 5
    api.aggregate("role", query="", size=5)
    assert api.agg_runs == 6  # no cache for brute-path specs


def test_bad_query_returns_400(api):
    """F8 fail-closed parse errors (negated quoted phrase) surface as a
    structured 400 from every endpoint, not an uncaught ValueError."""
    for out in (
        api.get_docs('-"foo bar"'),
        api.aggregate("role", query='-"foo bar"'),
        api.get_timeline('-"foo bar"'),
        api.induce_subgraph('-"foo bar"'),
    ):
        assert out["status"] == 400 and "negated quoted phrase" in out["error"]


def test_generation_counter_invalidates_without_mtime(tmp_path):
    """Index-state invalidation is timestamp-independent: two manifest
    writes landing on the SAME mtime (sub-granularity mutation) still
    change index_state_key via the monotonic generation counter."""
    import os

    from newsleak_spark.indexing.manifest import Manifest
    from newsleak_spark.query.engine import index_state_key

    d = str(tmp_path)
    Manifest(d).set_stats(a=1)
    k1 = index_state_key(d)
    st = os.stat(os.path.join(d, "manifest.json"))
    Manifest(d).set_stats(a=2)
    os.utime(os.path.join(d, "manifest.json"), ns=(st.st_atime_ns, st.st_mtime_ns))
    k2 = index_state_key(d)
    assert k1 != k2
