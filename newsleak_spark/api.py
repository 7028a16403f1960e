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


class NewsleakAPI:
    """One handle = one collection: the transcripts table plus (when
    built) its segment index. ``index_dir=None`` degrades every ranked
    query to the brute DataFrame path (same results, no index)."""

    # Bounded FIFO cache of collected ranked hits per normalized query
    # (the reference caches its SearchHitIterator by the query's
    # Facets hash across paginated requests,
    # DocumentController.scala:284-287): page 2..n of the same query
    # reuse page 1's collected top-k instead of re-running the scan,
    # re-running only when a deeper page needs a LARGER k.
    HIT_CACHE_MAX = 32

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
        self._hit_cache: dict[tuple, tuple[int, list]] = {}
        self.topk_runs = 0  # observability: ranked scans actually executed

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
        spec = compile_spec(query, time_range, roles, tools, k=page * page_size, mode=self.mode)
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
        spec = compile_spec(query, time_range, mode=self.mode)
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

    # -- GET /getTimeline ---------------------------------------------------

    def get_timeline(
        self, query: str = "", time_range: str | None = None, lod: str = "month"
    ) -> dict:
        """Dense date-histogram buckets at the LoD (decade|year|month|day)."""
        spec = compile_spec(query, time_range, mode=self.mode)
        m = self._matching(spec)
        rows = facets_mod.date_histogram(m, lod).collect()
        key = "decade" if lod == "decade" else "bucket"
        return {
            "lod": lod,
            "buckets": [{"key": str(r[key]), "docCount": r["n_docs"]} for r in rows],
        }

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
        spec = compile_spec(query, time_range, mode=self.mode)
        m = self._matching(spec)
        rows = facets_mod.facet_counts(m, facet_key, k=size, include=include, exclude=exclude).collect()
        return {
            "key": facet_key,
            "buckets": [{"key": r["value"], "docCount": r["n_docs"]} for r in rows],
        }

    # -- internals ----------------------------------------------------------

    def _topk(self, spec: QuerySpec) -> DataFrame:
        if self.index_dir is not None:
            return search(self.spark, self.index_dir, spec)
        return bm25_topk(self.transcripts, spec, mode=self.mode)

    def _ranked_rows(self, spec: QuerySpec) -> list:
        """Collected top-k rows for the spec, cache-aware: keyed by the
        spec NORMALIZED WITHOUT k, so any page whose depth fits an
        already-collected deeper run is served driver-side (a cached
        top-100 answers pages 1..N of size<=100/N). Bounded FIFO."""
        from dataclasses import replace

        # the index state rides in the key: append_index/compaction on
        # this index_dir bumps the manifest/deltas mtime, so stale
        # collected rows age out exactly when the engine reader does
        state = index_state_key(self.index_dir) if self.index_dir is not None else None
        key = (replace(spec, k=0).cache_key(), state)
        cached = self._hit_cache.get(key)
        if cached is not None:
            cached_k, rows = cached
            # a request is fully answerable from cache iff the cached
            # run was truncated at >= spec.k, OR it returned fewer rows
            # than ITS OWN k (the result set is exhausted)
            if cached_k >= spec.k or len(rows) < cached_k:
                return rows[: spec.k]
        self.topk_runs += 1
        rows = self._topk(spec).collect()
        if len(self._hit_cache) >= self.HIT_CACHE_MAX:
            self._hit_cache.pop(next(iter(self._hit_cache)))
        self._hit_cache[key] = (spec.k, rows)
        return rows

    def _matching(self, spec: QuerySpec) -> DataFrame:
        """Query-filtered doc set for aggregation endpoints. Indexed
        path: posting-list intersection supplies the doc ids (no text
        re-tokenization), semi-joined back for the facet columns."""
        if self.index_dir is not None and (spec.all_scored_terms() or spec.boost_terms):
            ids = matching_doc_ids(self.spark, self.index_dir, spec)
            return self.transcripts.join(ids, "doc_id", "left_semi")
        return matching_docs(self.transcripts, spec, self.mode)
