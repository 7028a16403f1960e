"""Serving-layer API — the controller surface of the reference.

Maps newsleak's three user-facing entry points (plus the facet
endpoint) 1:1 onto the engine, so a user of the reference's HTTP API
finds the same request/response shapes here (citations into
/root/reference/):

  get_docs         GET /getDocs    DocumentController.scala:276-346
                   (ranked top-k + pagination + whole-doc highlighting
                   + metadata enrichment in one Spark plan)
  induce_subgraph  GET /induceSubgraph  NetworkController →
                   NetworkService.scala:136-175 — node facet + ALL
                   edges in one self-join job instead of O(n²)
                   sequential per-pair requests
  get_timeline     GET /getTimeline  HistogramController.scala:49-66,
                   TimelineService.scala:91-151 (LoD buckets, dense)
  aggregate        GET /getAggregate  MetadataController/
                   AggregateService.scala:195-226 (terms facet with
                   include/exclude + zero-fill)

Request parsing reuses the F8 grammars (query_string with quoted
phrases, 4-regex time ranges); the doc-set filter for aggregation
endpoints carries the same bool-query semantics the reference applies
to every aggregation request — served from the index when one is built
(engine.matching_doc_ids posting intersection + semi-join; no text
re-tokenization) and by query/brute.matching_docs otherwise. Results
are plain Python dicts (the JSON the controllers emit); every
.collect() here is bounded by page/facet size, never by collection
size.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from newsleak_spark import facets as facets_mod
from newsleak_spark.analysis import analyze
from newsleak_spark.query.brute import bm25_topk, matching_docs
from newsleak_spark.query.engine import (
    count_hits,
    index_state_key,
    matching_doc_ids,
    search,
    search_heaps,
)
from newsleak_spark.query.spec import QuerySpec, parse_query_string, parse_time_range

DEFAULT_PAGE_SIZE = 50  # DocumentController.scala:47

_WORD_RE = re.compile(r"[0-9A-Za-z][0-9A-Za-z'’]*")


def _highlight_analyzed(text: str, targets: set[str], mode: str) -> str:
    """Wrap every surface word whose ANALYZED form is a query term in
    <em> tags — what the ES highlighter does by re-analyzing the field.
    Bounded: only called on the page's returned bodies."""

    def repl(m: "re.Match[str]") -> str:
        # any() not toks[0]: a surface word can analyze to several
        # tokens ("o'brien" → ['o','brien']) and match on a later one
        toks = analyze(m.group(0), mode)
        return f"<em>{m.group(0)}</em>" if any(t in targets for t in toks) else m.group(0)

    return _WORD_RE.sub(repl, text)


def compile_spec(
    query: str = "",
    time_range: str | None = None,
    roles: tuple[str, ...] = (),
    tools: tuple[str, ...] = (),
    k: int = DEFAULT_PAGE_SIZE,
    mode: str = "standard",
) -> QuerySpec:
    """Request params → QuerySpec (the Facets binder analog)."""
    terms, phrases, not_terms = parse_query_string(
        query, analyzer=lambda s: analyze(s, mode)
    )
    ts_from = ts_to = None
    if time_range:
        ts_from, ts_to = parse_time_range(time_range)
    return QuerySpec(
        terms=terms, phrases=phrases, not_terms=not_terms,
        role_filter=tuple(roles), tool_filter=tuple(tools),
        ts_from=ts_from, ts_to=ts_to, k=k,
    )


def _merge_heaps(hrows: list, k: int) -> tuple[list, float]:
    """Merge collected per-shard heap rows (shard, doc_id, score_e6)
    into the global ranking and the rank through which it is exact.

    A doc a TRUNCATED shard (one that returned exactly k rows) did not
    return ranks strictly after that shard's weakest returned key, so
    the merge is exact through every position whose key sorts <= the
    minimum truncated-shard boundary key; with no truncated shard the
    heaps are exhaustive and the whole merge is exact."""
    per_shard: dict[int, int] = {}
    boundary: dict[int, tuple[int, int]] = {}
    for r in hrows:
        s = r["shard"]
        per_shard[s] = per_shard.get(s, 0) + 1
        key = (-r["score_e6"], r["doc_id"])
        if s not in boundary or key > boundary[s]:
            boundary[s] = key
    merged = sorted(hrows, key=lambda r: (-r["score_e6"], r["doc_id"]))
    truncated = [boundary[s] for s, n in per_shard.items() if n >= k]
    if not truncated:
        return merged, float("inf")
    cut = min(truncated)
    safe_rank = sum(1 for r in merged if (-r["score_e6"], r["doc_id"]) <= cut)
    return merged, safe_rank


def _bad_request(e: ValueError) -> dict:
    """F8 fail-closed parse errors surface as a structured 400 at the
    API boundary (the controller's BadRequest analog) instead of an
    uncaught exception from a raw user query string."""
    return {"status": 400, "error": str(e)}


class NewsleakAPI:
    """One handle = one collection: the transcripts table plus (when
    built) its segment index. ``index_dir=None`` degrades every ranked
    query to the brute DataFrame path (same results, no index)."""

    # Bounded FIFO cache of collected ranked hits per normalized query
    # (the reference caches its SearchHitIterator by the query's
    # Facets hash across paginated requests,
    # DocumentController.scala:284-287). On the indexed path the cache
    # holds the MERGED PER-SHARD HEAPS plus the rank through which that
    # merge is provably exact, so pages 2..n are driver-side slices —
    # the SearchHitIterator.scala:43-58 cursor semantics without the
    # O(k·pages) growing-k re-run the round-3 pager paid.
    HIT_CACHE_MAX = 32
    # Bounded FIFO cache of aggregation results (facet/timeline/
    # network), keyed like the hit cache on (request, index state).
    # The reference enables the ES request cache for every aggregation
    # (ESRequestUtils.scala:68) EXCEPT timelines
    # (TimelineService.scala:140, a date-math staleness concern);
    # here the index-state mtime in the key makes timeline caching
    # safe too, so all three endpoints cache. Only active when an
    # index is attached — the brute path's input DataFrame carries no
    # invalidation signal.
    AGG_CACHE_MAX = 64

    def __init__(
        self,
        spark: SparkSession,
        transcripts: DataFrame,
        index_dir: str | None = None,
        mode: str = "standard",
    ):
        self.spark = spark
        self.transcripts = transcripts
        self.index_dir = index_dir
        self.mode = mode
        self._hit_cache: dict[tuple, tuple[list, float]] = {}
        self._agg_cache: dict[tuple, dict] = {}
        self.topk_runs = 0  # observability: ranked scans actually executed
        self.agg_runs = 0  # observability: aggregation jobs actually executed

    # -- GET /getDocs -----------------------------------------------------

    def get_docs(
        self,
        query: str = "",
        time_range: str | None = None,
        roles: tuple[str, ...] = (),
        tools: tuple[str, ...] = (),
        page: int = 1,
        page_size: int = DEFAULT_PAGE_SIZE,
        highlight: bool = True,
        with_total: bool = True,
    ) -> dict:
        """Ranked page of documents with highlighting + metadata.

        Pagination = top-(page·size) then slice (T2: SearchHitIterator
        re-issues with from=consumed; one growing top-k is the
        distributed equivalent). Highlight: whole doc, <em> tags
        (DocumentService.scala:406-418) — ES-faithful ANALYZED-term
        matching: a surface word is highlighted when its analyzed form
        is a query term, so english-mode 'databases' highlights for the
        stem query 'databas'. Runs driver-side over the <= page_size
        returned bodies only. ``with_total``: on the indexed path the
        count comes from the index alone (engine.count_hits, no text
        scan); brute fallback pays one matching_docs scan."""
        try:
            spec = compile_spec(query, time_range, roles, tools, k=page * page_size, mode=self.mode)
        except ValueError as e:
            return _bad_request(e)
        # boost (should) terms highlight too — the ES highlighter wraps
        # every query term incl. should clauses (DocumentService.scala:406-418)
        targets = set(spec.all_scored_terms()) | set(spec.boost_terms)
        rows = self._ranked_rows(spec)[(page - 1) * page_size :]
        ids = [r["doc_id"] for r in rows]
        scores = {r["doc_id"]: r["score_e6"] / 1e6 for r in rows}
        docs: list[dict] = []
        if ids:
            body = self.transcripts.filter(F.col("doc_id").isin(ids))
            by_id = {r["doc_id"]: r for r in body.collect()}
            for did in ids:  # preserve rank order
                r = by_id.get(did)
                if r is None:
                    # index/table drift (stale index or filtered table):
                    # skip rather than fail the whole request
                    continue
                docs.append(
                    {
                        "id": did,
                        "score": scores[did],
                        "content": r["text"],
                        "highlighted": (
                            _highlight_analyzed(r["text"], targets, self.mode)
                            if highlight and targets
                            else r["text"]
                        ),
                        "metadata": {
                            "conv_id": r["conv_id"],
                            "turn_idx": r["turn_idx"],
                            "role": r["role"],
                            "tool": r["tool"],
                            "ts": str(r["ts"]),
                        },
                    }
                )
        total = None
        if with_total:
            if self.index_dir is not None:
                total = count_hits(self.spark, self.index_dir, spec)
            else:
                total = matching_docs(self.transcripts, spec, self.mode).count()
        return {"hits": total, "page": page, "docs": docs}

    # -- GET /induceSubgraph ----------------------------------------------

    def induce_subgraph(
        self,
        query: str = "",
        time_range: str | None = None,
        n_nodes: int = 10,
        min_edge: int = 1,
    ) -> dict:
        """Top tool nodes over the filtered doc set + every pairwise
        edge in ONE self-join job (vs the reference's O(n²) sequential
        include-filtered aggregations, NetworkService.scala:152-175)."""
        try:
            spec = compile_spec(query, time_range, mode=self.mode)
        except ValueError as e:
            return _bad_request(e)

        def compute() -> dict:
            m = self._matching(spec)
            nodes = facets_mod.facet_counts(m, "tool", k=n_nodes).collect()
            node_vals = [r["value"] for r in nodes]
            edges = (
                facets_mod.cooccurrence(
                    m.filter(F.col("tool").isin(node_vals)).select("conv_id", "tool"),
                    "conv_id",
                    "tool",
                    min_count=min_edge,
                ).collect()
            )
            return {
                "nodes": [{"id": r["value"], "occurrence": r["n_docs"]} for r in nodes],
                "relationships": [
                    {"source": r["source"], "target": r["target"], "weight": r["weight"]}
                    for r in edges
                ],
            }

        from dataclasses import replace

        return self._agg_cached(
            ("subgraph", replace(spec, k=0).cache_key(), n_nodes, min_edge),
            compute,
            spec,
        )

    # -- GET /getTimeline ---------------------------------------------------

    def get_timeline(
        self, query: str = "", time_range: str | None = None, lod: str = "month"
    ) -> dict:
        """Dense date-histogram buckets at the LoD (decade|year|month|day)."""
        try:
            spec = compile_spec(query, time_range, mode=self.mode)
        except ValueError as e:
            return _bad_request(e)

        def compute() -> dict:
            m = self._matching(spec)
            rows = facets_mod.date_histogram(m, lod).collect()
            key = "decade" if lod == "decade" else "bucket"
            return {
                "lod": lod,
                "buckets": [{"key": str(r[key]), "docCount": r["n_docs"]} for r in rows],
            }

        from dataclasses import replace

        return self._agg_cached(
            ("timeline", replace(spec, k=0).cache_key(), lod), compute, spec
        )

    # -- GET /getAggregate ---------------------------------------------------

    def aggregate(
        self,
        facet_key: str,
        query: str = "",
        time_range: str | None = None,
        size: int = DEFAULT_PAGE_SIZE,
        include: list[str] | None = None,
        exclude: list[str] | None = None,
    ) -> dict:
        try:
            spec = compile_spec(query, time_range, mode=self.mode)
        except ValueError as e:
            return _bad_request(e)

        def compute() -> dict:
            m = self._matching(spec)
            rows = facets_mod.facet_counts(
                m, facet_key, k=size, include=include, exclude=exclude
            ).collect()
            return {
                "key": facet_key,
                "buckets": [{"key": r["value"], "docCount": r["n_docs"]} for r in rows],
            }

        from dataclasses import replace

        return self._agg_cached(
            (
                "aggregate", replace(spec, k=0).cache_key(), facet_key, size,
                tuple(include or ()), tuple(exclude or ()),
            ),
            compute,
            spec,
        )

    # -- internals ----------------------------------------------------------

    def _topk(self, spec: QuerySpec) -> DataFrame:
        if self.index_dir is not None:
            return search(self.spark, self.index_dir, spec)
        return bm25_topk(self.transcripts, spec, mode=self.mode)

    def _ranked_rows(self, spec: QuerySpec) -> list:
        """Collected top-k rows for the spec, cache-aware: keyed by the
        spec NORMALIZED WITHOUT k, so any page whose rank is provably
        exact from an already-collected run is served driver-side.
        Indexed path: ONE search_heaps scan caches every shard's top-k
        (n_shards·k rows, bounded); the merged list answers pages up to
        the exactness bound — typically many pages — before any re-run.
        Bounded FIFO."""
        from dataclasses import replace

        # the index state rides in the key: append_index/compaction on
        # this index_dir bumps the manifest/deltas mtime, so stale
        # collected rows age out exactly when the engine reader does
        state = index_state_key(self.index_dir) if self.index_dir is not None else None
        key = (replace(spec, k=0).cache_key(), state)
        cached = self._hit_cache.get(key)
        if cached is not None:
            rows, safe_rank = cached
            # answerable iff the merge is exact through spec.k, or the
            # result set is exhausted (fewer rows than the bound allows)
            if spec.k <= safe_rank or len(rows) < safe_rank:
                return rows[: spec.k]
        self.topk_runs += 1
        if self.index_dir is not None:
            heaps = search_heaps(self.spark, self.index_dir, spec)
        else:
            heaps = None
        if heaps is not None:
            rows, safe_rank = _merge_heaps(heaps.collect(), spec.k)
        else:
            # brute / match_all fallback: plain top-k, exact through k
            rows = self._topk(spec).collect()
            safe_rank = float("inf") if len(rows) < spec.k else spec.k
        if len(self._hit_cache) >= self.HIT_CACHE_MAX:
            self._hit_cache.pop(next(iter(self._hit_cache)))
        self._hit_cache[key] = (rows, safe_rank)
        return rows[: spec.k]

    def _agg_cached(self, key: tuple, compute, spec: QuerySpec):
        """Aggregation result memo (facet/timeline/network): bounded
        FIFO keyed on (request, index state). Only specs that actually
        take the indexed path in _matching (scored/boost terms) are
        cached: a match_all / filters-only spec computes from
        self.transcripts via brute matching_docs, which carries no
        invalidation signal — the index-state key would not notice a
        transcripts-source change, serving stale results."""
        if self.index_dir is None or not (
            spec.all_scored_terms() or spec.boost_terms
        ):
            self.agg_runs += 1
            return compute()
        full_key = (key, index_state_key(self.index_dir))
        hit = self._agg_cache.get(full_key)
        if hit is not None:
            return hit
        self.agg_runs += 1
        out = compute()
        if len(self._agg_cache) >= self.AGG_CACHE_MAX:
            self._agg_cache.pop(next(iter(self._agg_cache)))
        self._agg_cache[full_key] = out
        return out

    def _matching(self, spec: QuerySpec) -> DataFrame:
        """Query-filtered doc set for aggregation endpoints. Indexed
        path: posting-list intersection supplies the doc ids (no text
        re-tokenization), semi-joined back for the facet columns."""
        if self.index_dir is not None and (spec.all_scored_terms() or spec.boost_terms):
            ids = matching_doc_ids(self.spark, self.index_dir, spec)
            return self.transcripts.join(ids, "doc_id", "left_semi")
        return matching_docs(self.transcripts, spec, self.mode)
