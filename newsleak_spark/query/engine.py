"""Segment-based BM25 query engine (the Elasticsearch replacement).

Execution shape (SURVEY §3.1 "Rebuild shape"):
  parse → QuerySpec → dictionary lookup (df/idf per query term,
  partition-pruned parquet point reads) → segment scan filtered to
  (bucket ∈ query buckets, term ∈ query terms) — parquet PARTITION
  pruning on bucket + row-group stats pruning on the term-sorted rows —
  → per-shard scoring in applyInPandas over Arrow batches (numpy
  decode, block-range intersection for AND, block-max WAND for the
  scored-union path; F2/F5 filters arrive shard-locally via cogroup
  with the filtered docmeta) → per-shard top-k heaps → global
  TakeOrderedAndProject merge.

Correctness contract: rank-identical (doc_id, score_e6) vs
query/brute.py (and hence vs the DuckDB oracle) — enforced by
tests/test_engine_parity.py. Tie-break (score desc, doc_id asc) pinned
on both sides (SURVEY §7.5.1); scores are float64 summed in query-term
order (§7.5.2); N/avgdl/df come from the manifest snapshot, never
recomputed at query time (§7.5.3).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from newsleak_spark.codec import decode_positions_flat, gather_ragged, varint_decode
from newsleak_spark.indexing.manifest import Manifest
from newsleak_spark.query.spec import QuerySpec

K1 = 1.2
B = 0.75

# BMW union decode policy (see _bmw_union): terms with at most this
# many blocks pre-decode in one vectorized pass and use posting-level
# chunk bounds; bigger terms stay byte-encoded until a chunk survives
# θ, switching to a full decode once 1/BMW_LAZY_SWITCH_DEN of their
# blocks were demanded (low observed skip rate).
BMW_SMALL_TERM_BLOCKS = 64
BMW_LAZY_SWITCH_DEN = 8
# If NO chunk was skipped in the first this-many scored rounds, the
# union is dense (every chunk beats θ) and laziness can never pay —
# hot terms then full-decode on first demand instead of per-chunk.
BMW_LAZY_PROBE_ROUNDS = 8


@dataclass
class TermMeta:
    term: str
    df: float
    idf: float
    required: bool


class IndexReader:
    """Driver-side handle on an index (base + registered deltas).

    With deltas present, collection stats are COMBINED at read time
    (N and sum_dl add; df sums per term), so BM25 scores equal a
    from-scratch build's exactly; ``multi`` flags the scorer to use
    stats-independent block bounds (each part's stored max_score was
    computed under that part's own snapshot stats)."""

    def __init__(self, spark: SparkSession, index_dir: str):
        import os

        from newsleak_spark.indexing.build import list_deltas

        self.spark = spark
        self.index_dir = index_dir
        self.parts = [index_dir] + [
            os.path.join(index_dir, d) for d in list_deltas(index_dir)
        ]
        self.man = Manifest(index_dir)
        mans = [self.man] + [Manifest(p) for p in self.parts[1:]]
        for p, m in zip(self.parts, mans):
            # n_docs == 0 is a legal (empty) part; only MISSING stats
            # mean an unfinished build
            if m.stats.get("n_docs") is None:
                raise ValueError(f"no built index at {p}")
            if m.config.get("_hash") != self.man.config.get("_hash"):
                raise ValueError(f"delta {p} was built with a different config")
        self.multi = len(self.parts) > 1
        n = sum(int(m.stats["n_docs"]) for m in mans)
        sum_dl = sum(int(m.stats["sum_dl"]) for m in mans)
        self.n_docs = float(n)
        self.avgdl = sum_dl / n if n else 0.0
        self.n_buckets = int(self.man.config["n_term_buckets"])
        # bigram-sidecar coverage: a pair (a,b) is covered — "bigram
        # absent ⇒ no adjacency anywhere" — only when EVERY part
        # extracted it, i.e. a,b are in the intersection of the parts'
        # extraction-time hot sets (manifest stats.bigram_terms). Any
        # part without the sidecar stage kills coverage (fallback to
        # unigram position verification; results identical either way).
        bts = [m.stats.get("bigram_terms") for m in mans]
        if all(bt is not None for bt in bts):
            self.bigram_cover: frozenset = frozenset(
                set.intersection(*(set(bt) for bt in bts))
            )
        else:
            self.bigram_cover = frozenset()
        self._df_cache: dict[str, DataFrame] = {}
        self._pa_datasets: dict = {}

    def dictionary_rows(self, terms: list[str]) -> dict[str, tuple[int, int]]:
        """term → (df, cf): a driver-side pyarrow point read of ONLY the
        buckets the query terms hash to (hive partition pruning) with a
        term predicate pushed to parquet row groups — the term-dictionary
        lookup of a search engine, not a Spark job. The per-bucket
        dictionary partition stays small at any collection size because
        n_term_buckets scales with the term count."""
        if not terms:
            return {}
        import os

        import pyarrow.dataset as ds

        from newsleak_spark.indexing.build import BIGRAM_SEP

        unigrams = [t for t in terms if BIGRAM_SEP not in t]
        bigrams = [t for t in terms if BIGRAM_SEP in t]
        out: dict[str, tuple[int, int]] = {}
        for sub, ts in (("dictionary", unigrams), ("bigram_dictionary", bigrams)):
            if not ts:
                continue
            buckets = sorted({_bucket(t, self.n_buckets) for t in ts})
            for part in self.parts:
                path = f"{part}/{sub}"
                if not os.path.isdir(path):
                    continue  # part built with no (or empty) sidecar
                dataset = self._pa_datasets.get(path)
                if dataset is None:
                    # dataset discovery walks the hive partition tree —
                    # driver-serial IO worth paying once per reader, not
                    # once per query (invalidation rides the reader's)
                    dataset = ds.dataset(path, format="parquet", partitioning="hive")
                    self._pa_datasets[path] = dataset
                tbl = dataset.to_table(
                    columns=["term", "df", "cf"],
                    filter=ds.field("bucket").isin(buckets) & ds.field("term").isin(ts),
                )
                for t, d, c in zip(
                    tbl["term"].to_pylist(), tbl["df"].to_pylist(), tbl["cf"].to_pylist()
                ):
                    pd_, pc = out.get(t, (0, 0))
                    out[t] = (pd_ + int(d), pc + int(c))
        return out

    def _union_parts(self, sub: str) -> DataFrame:
        # memoized per reader: spark.read.parquet re-lists leaf files and
        # re-reads footers on every call (a driver-serial job per query
        # that no executor count can parallelize). The reader is already
        # invalidated on any index mutation (_cached_reader keys on the
        # manifest generation), so a cached lazy DataFrame is exactly as
        # fresh as the reader itself; per-query filters stack on top and
        # still prune partitions/row groups.
        df = self._df_cache.get(sub)
        if df is None:
            dfs = [self.spark.read.parquet(f"{p}/{sub}") for p in self.parts]
            df = dfs[0]
            for d in dfs[1:]:
                df = df.unionByName(d)
            self._df_cache[sub] = df
        return df

    def docmeta(self) -> DataFrame:
        return self._union_parts("docmeta")

    def segments_for(self, terms: list[str], with_positions: bool = True) -> DataFrame:
        buckets = sorted({_bucket(t, self.n_buckets) for t in terms})
        seg = self._union_parts("segments").filter(
            F.col("bucket").isin(buckets) & F.col("term").isin(terms)
        )
        if not with_positions:
            # positions live in separate columns precisely so term-only
            # queries never pay their IO (SURVEY §7.5.5)
            seg = seg.drop("poscnt", "posflat")
        return seg


def _bucket(term: str, n_buckets: int) -> int:
    # driver-side mirror of F.pmod(F.xxhash64(term), n): pure-Python
    # XXH64 (parity pinned by test_xxh64_matches_spark) — no Spark job
    # for term→bucket routing.
    from newsleak_spark.xxh import term_bucket

    return term_bucket(term, n_buckets)


# ---------------------------------------------------------------------------
# per-shard scorer (runs inside applyInPandas over Arrow batches)
# ---------------------------------------------------------------------------

def _decode_term_blocks(rows: pd.DataFrame, want_positions: bool):
    """Concatenate a term's (possibly salted) block runs into one sorted
    posting list: (docs, tfs, dls, positions|None).

    Varint streams are self-delimiting, so all blocks decode in ONE
    pass per column (``b"".join`` → one vectorized varint_decode) —
    no per-block Python loop. Doc deltas reset to absolute at block
    starts; the reset points are recovered from the per-block ``n``.
    positions is a ragged (counts, flat) pair, never Python lists.
    """
    ns = rows["n"].to_numpy(dtype=np.int64)
    block_starts = np.concatenate(([0], np.cumsum(ns)))[:-1]
    # .view, not .astype: decoded values are < 2^63 (doc ids / tfs /
    # dls), so the reinterpret is exact and skips three full-array
    # copies per term in the bandwidth-bound scoring path
    deltas = varint_decode(b"".join(rows["docs"])).view(np.int64)
    c = np.cumsum(deltas)
    base = c[block_starts] - deltas[block_starts]
    docs = c - np.repeat(base, ns)
    # bigram-sidecar blocks are membership-only (slim encode,
    # build._encode_group): their tf/dl streams are empty bytes —
    # decode as all-ones rather than an empty array so the shared
    # sort/gather below stays shape-correct (the values are never
    # used: sidecar terms are peeled off before any scoring)
    tb, lb = b"".join(rows["tfs"]), b"".join(rows["dls"])
    tfs = varint_decode(tb).view(np.int64) if tb else np.ones(docs.size, np.int64)
    dls = varint_decode(lb).view(np.int64) if lb else np.ones(docs.size, np.int64)
    order = np.argsort(docs, kind="stable")  # salted runs interleave
    docs, tfs, dls = docs[order], tfs[order], dls[order]
    if want_positions:
        counts, flat = decode_positions_flat(
            b"".join(rows["poscnt"]), b"".join(rows["posflat"])
        )
        pos = gather_ragged(counts, flat.astype(np.int64), order)
    else:
        pos = None
    return docs, tfs, dls, pos


def _decode_blocks_lazy(state: dict, idxs: list[int]) -> None:
    """Decode the not-yet-cached blocks ``idxs`` of one term's lazy
    state in ONE varint pass per column (their byte slices are self-
    delimiting, so they batch-concatenate like _decode_term_blocks) and
    cache each block's (docs, tfs, dls). Doc deltas reset to absolute
    at every block start."""
    ns = state["ns"][idxs]
    starts = np.concatenate(([0], np.cumsum(ns)))
    deltas = varint_decode(b"".join(state["docs_b"][i] for i in idxs)).astype(np.int64)
    c = np.cumsum(deltas)
    heads = starts[:-1][ns > 0]
    base = np.zeros(ns.size, dtype=np.int64)
    base[ns > 0] = c[heads] - deltas[heads]
    docs = c - np.repeat(base, ns)
    tfs = varint_decode(b"".join(state["tfs_b"][i] for i in idxs)).astype(np.int64)
    dls = varint_decode(b"".join(state["dls_b"][i] for i in idxs)).astype(np.int64)
    cache = state["cache"]
    for j, i in enumerate(idxs):
        s, e = starts[j], starts[j + 1]
        cache[i] = (docs[s:e], tfs[s:e], dls[s:e])


def _prune_blocks_by_range(rows: pd.DataFrame, cand: np.ndarray) -> pd.DataFrame:
    """Keep only blocks whose [doc_first, doc_last] contains ≥1 candidate
    (the AND-path analog of WAND skipping: candidate-driven block skip)."""
    lo = np.searchsorted(cand, rows["doc_first"].to_numpy())
    hi = np.searchsorted(cand, rows["doc_last"].to_numpy(), side="right")
    return rows[hi > lo]


def _bm25(tf: np.ndarray, dl: np.ndarray, idf: float, avgdl: float) -> np.ndarray:
    return idf * tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))


def _make_shard_scorer(
    metas: list[TermMeta],
    phrases: tuple[tuple[str, ...], ...],
    avgdl: float,
    k: int,
    truncate: bool = True,
    safe_bounds: bool = False,
    neg_terms: tuple[str, ...] = (),
    phrase_plans: tuple | None = None,
    emit_shard: bool = False,
):
    """Returns the applyInPandas function scoring one shard's blocks.

    ``emit_shard`` adds the shard id to the output rows (schema
    "shard int, doc_id long, score double") so the serving layer can
    cache the PER-SHARD top-k heaps and compute how deep the merged
    ranking is exact (deep pagination without growing-k re-runs).

    With metadata/date filters the function is used through cogroup:
    the second frame carries the shard's FILTER-SURVIVING doc_ids, so
    filtering happens shard-locally and per-shard top-k truncation
    stays on — no untruncated candidate set ever leaves a shard.

    ``phrase_plans`` (one per phrase, aligned with ``phrases``):
    (tokens, pairs, fully) where pairs[i] = (i, bigram_term | None) —
    a bigram term is set when the adjacent pair (tokens[i],
    tokens[i+1]) is covered by the index's hot-pair sidecar. Covered
    pairs prune candidates by cheap doc-membership BEFORE any
    position decode (the sidecar stores doc lists only, no
    positions); a fully covered len-2 phrase never decodes positions
    at all — membership IS adjacency. Longer phrases verify with
    unigram positions decoded AFTER the membership pruning, so only
    the surviving (typically tiny) candidate set pays position IO.
    None → every pair uncovered (pure unigram verification, the
    pre-sidecar behavior).
    """
    required = [m for m in metas if m.required]
    if phrase_plans is None:
        phrase_plans = tuple(
            (p, tuple((i, None) for i in range(len(p) - 1)), False) for p in phrases
        )
    # unigram positions are skipped only for fully covered len-2
    # phrases (membership == adjacency); every other phrase verifies
    # with unigram positions over the membership-pruned candidates
    phrase_terms = {
        t
        for toks, _pairs, fully in phrase_plans
        if not (fully and len(toks) == 2)
        for t in toks
    }
    bigram_terms = {bt for _toks, pairs, _f in phrase_plans for _i, bt in pairs if bt}
    idf = {m.term: m.idf for m in metas}
    req_order = sorted(required, key=lambda m: (m.df, m.term))  # rarest first

    def _score(pdf: pd.DataFrame, allowed_pdf: pd.DataFrame | None = None) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_id": pd.Series(dtype="int64"), "score": pd.Series(dtype="float64")})
        if emit_shard:
            empty.insert(0, "shard", pd.Series(dtype="int32"))
        allowed = None
        if allowed_pdf is not None:
            allowed = np.sort(allowed_pdf["doc_id"].to_numpy(dtype=np.int64))
            if allowed.size == 0:
                return empty
        by_term = {t: g for t, g in pdf.groupby("term")}
        # must_not postings never score: peel them off before any path
        # looks at by_term. Their blocks are decoded candidate-pruned
        # (only block ranges overlapping surviving candidates pay IO).
        neg = {t: by_term.pop(t) for t in neg_terms if t in by_term}
        # bigram sidecar postings never score either: they exist only
        # for the phrase filter
        bg = {t: by_term.pop(t) for t in bigram_terms if t in by_term}
        if any(m.term not in by_term for m in required):
            return empty

        if required:
            cand, per_term = _intersect_required(by_term)
            if cand is None or cand.size == 0:
                return empty
            if allowed is not None:
                mask = _member_mask(cand, allowed)
                cand = cand[mask]
                per_term = {t: (v[0][mask], v[1][mask]) for t, v in per_term.items()}
                if cand.size == 0:
                    return empty
            if neg:
                # exclusion BEFORE phrase checks: excluded docs never
                # pay position decode
                mask = ~_excluded_mask(cand, neg)
                cand = cand[mask]
                per_term = {t: (v[0][mask], v[1][mask]) for t, v in per_term.items()}
                if cand.size == 0:
                    return empty
            if phrases:
                cand, per_term = _phrase_apply(cand, per_term, by_term, bg)
                if cand.size == 0:
                    return empty
            score = np.zeros(cand.size, dtype=np.float64)
            # fixed term order (query order) for float determinism
            for m in metas:
                if m.required:
                    tfv, dlv = per_term[m.term]
                    score += _bm25(tfv, dlv, m.idf, avgdl)
                elif m.term in by_term:
                    score += _optional_contrib(by_term[m.term], cand)
            out_docs, out_scores = cand, score
        else:
            # scored union (OR / boost-only): block-max WAND
            # must_not inside the union loop (NOT post-hoc: an excluded
            # doc in the running top-k would raise θ and wrongly prune
            # chunks holding valid docs). Union candidates stream, so
            # the neg lists can't be candidate-pruned — decode each
            # once up front (sorted) and membership-test per chunk.
            neg_arrays = [
                _decode_term_blocks(g, False)[0] for g in neg.values()
            ] if neg else []
            out_docs, out_scores = _bmw_union(
                by_term, [m for m in metas if m.term in by_term], allowed, neg_arrays
            )
            if out_docs.size == 0:
                return empty

        if truncate and out_docs.size > k:
            # per-shard top-k: order by the ROUNDED score (score_e6) the
            # global merge uses, so sub-1e-6 raw-float differences can't
            # drop a doc that ties at e6 precision but wins the doc_id
            # tie-break
            order = np.lexsort((out_docs, -np.round(out_scores * 1e6)))[:k]
            out_docs, out_scores = out_docs[order], out_scores[order]
        out = pd.DataFrame({"doc_id": out_docs.astype(np.int64), "score": out_scores})
        if emit_shard:
            out.insert(0, "shard", np.int32(pdf["shard"].iloc[0]))
        return out

    def _member_mask(docs, allowed):
        idx = np.searchsorted(allowed, docs)
        idx_c = np.minimum(idx, allowed.size - 1)
        return (idx < allowed.size) & (allowed[idx_c] == docs)

    def _excluded_mask(docs, neg):
        """True where a doc appears in ANY must_not term's postings.
        Each neg list decodes only blocks whose [doc_first, doc_last]
        range overlaps a surviving candidate — a hot excluded term
        never pays full decode against a selective query."""
        mask = np.zeros(docs.size, dtype=bool)
        for g in neg.values():
            rows = _prune_blocks_by_range(g, docs)
            if len(rows) == 0:
                continue
            ndocs = _decode_term_blocks(rows, False)[0]
            mask |= _member_mask(docs, ndocs)
        return mask

    # applyInPandas arity is semantic: 1-arg = (pdf), 2-arg = (key, pdf);
    # cogroup 2-arg = (left, right) — expose explicit wrappers
    def score_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        return _score(pdf, None)

    def score_shard_cogrouped(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        return _score(left, right)

    score_shard.cogrouped = score_shard_cogrouped

    # -- helpers bound to closure -------------------------------------------

    def _intersect_required(by_term):
        """Rarest-first sorted intersection with candidate-driven block
        pruning; returns (cand, {term: (tf, dl)}). Positions are NOT
        decoded here — _positions_for runs after the intersection."""
        m0 = req_order[0]
        docs, tfs, dls, _ = _decode_term_blocks(by_term[m0.term], False)
        cand = docs
        per = {m0.term: (tfs, dls)}
        dl_ref = dls
        for m in req_order[1:]:
            rows = _prune_blocks_by_range(by_term[m.term], cand)
            if rows.empty:
                return None, None
            tdocs, ttfs, _tdls, _ = _decode_term_blocks(rows, False)
            idx = np.searchsorted(tdocs, cand)
            idx_c = np.minimum(idx, tdocs.size - 1)
            mask = tdocs[idx_c] == cand
            mask &= idx < tdocs.size
            cand = cand[mask]
            dl_ref = dl_ref[mask]
            for t in per:
                tfv, dlv = per[t]
                per[t] = (tfv[mask], dlv[mask])
            sel = idx_c[mask]
            per[m.term] = (ttfs[sel], dl_ref)
            if cand.size == 0:
                return None, None
        return cand, per

    def _positions_for(rows_by_term, cand, terms):
        """Ragged positions aligned to cand for each term: prune blocks
        to the surviving candidate range, decode, and gather the
        candidate postings (cand ⊆ term docs — phrase terms are
        required; bigram terms membership-pruned cand first)."""
        out = {}
        for t in terms:
            rows = _prune_blocks_by_range(rows_by_term[t], cand)
            tdocs, _ttfs, _tdls, tpos = _decode_term_blocks(rows, True)
            idx = np.searchsorted(tdocs, cand)
            out[t] = gather_ragged(*tpos, idx)
        return out

    def _empty_cand(per_term):
        z = np.empty(0, dtype=np.int64)
        return z, {t: (v[0][:0], v[1][:0]) for t, v in per_term.items()}

    def _phrase_apply(cand, per_term, by_term, bg):
        """Phrase filtering over the candidate set, sidecar-aware.

        Pass 1 — every COVERED adjacent pair prunes cand by membership
        in its bigram doc list (candidate-pruned block decode, no
        positions). A covered pair with no postings in this shard
        means no adjacency in any of this shard's docs → empty.
        Pass 2 — position verification on the reduced cand: fully
        covered len-2 phrases are already exact; every other phrase
        verifies with unigram positions (decoded late, AFTER the
        membership pruning — only surviving candidate blocks pay IO)."""
        for _toks, pairs, _fully in phrase_plans:
            for _off, bt in pairs:
                if bt is None:
                    continue
                g = bg.get(bt)
                if g is None:
                    return _empty_cand(per_term)
                rows = _prune_blocks_by_range(g, cand)
                if len(rows) == 0:
                    return _empty_cand(per_term)
                bdocs = _decode_term_blocks(rows, False)[0]
                mask = _member_mask(cand, bdocs)
                cand = cand[mask]
                per_term = {t: (v[0][mask], v[1][mask]) for t, v in per_term.items()}
                if cand.size == 0:
                    return cand, per_term
        positions = (
            _positions_for(by_term, cand, phrase_terms) if phrase_terms else {}
        )
        keep = np.ones(cand.size, dtype=bool)
        for toks, pairs, fully in phrase_plans:
            if fully and len(toks) == 2:
                continue  # the single bigram's membership IS adjacency
            inter = None
            for off, t in enumerate(toks):
                keys = _phrase_keys(positions[t], off)
                inter = keys if inter is None else np.intersect1d(
                    inter, keys, assume_unique=True
                )
                if inter.size == 0:
                    break
            pkeep = np.zeros(cand.size, dtype=bool)
            if inter is not None and inter.size:
                pkeep[np.unique(inter >> 32)] = True
            keep &= pkeep
        cand = cand[keep]
        per_term = {t: (v[0][keep], v[1][keep]) for t, v in per_term.items()}
        return cand, per_term

    def _phrase_keys(pos_pair, off):
        """Ragged (counts, flat) positions → sorted unique int64 keys
        (cand_idx << 32 | (pos - off + 1)); a key present for every
        token offset of a phrase marks a phrase start. 32-bit position
        field: positions are stored int32, so no document length can
        overflow into the candidate-index field."""
        counts, flat = pos_pair
        if flat.size == 0:
            return np.empty(0, dtype=np.int64)
        docidx = np.repeat(np.arange(counts.size, dtype=np.int64), counts)
        shifted = flat.astype(np.int64) - off + 1  # +1 keeps pos=0,off=1 non-negative
        keys = (docidx << 32) | shifted
        keys = keys[shifted >= 0]
        return np.unique(keys)

    def _optional_contrib(rows, cand):
        rows = _prune_blocks_by_range(rows, cand)
        out = np.zeros(cand.size, dtype=np.float64)
        if rows.empty:
            return out
        tdocs, ttfs, tdls, _ = _decode_term_blocks(rows, False)
        idx = np.searchsorted(tdocs, cand)
        idx_c = np.minimum(idx, tdocs.size - 1)
        mask = (idx < tdocs.size) & (tdocs[idx_c] == cand)
        sel = idx_c[mask]
        t = rows["term"].iloc[0]
        out[mask] = _bm25(ttfs[sel], tdls[sel], idf[t], avgdl)
        return out

    def _bmw_union(by_term, present, allowed=None, neg_arrays=()):
        """Block-max WAND over the union of posting lists.

        Doc space is chunked at the union of block boundaries; a chunk
        is scored only when its upper bound Σ_t ub_t can beat the
        current k-th best (θ). Two term classes:

        * SMALL terms (≤ BMW_SMALL_TERM_BLOCKS blocks): decoded up
          front — one cheap vectorized pass. Their chunk bound uses
          POSTING-level presence (two searchsorted calls): a rare
          term's single block spans the whole doc space, so a
          block-overlap test would fold its (large) idf into EVERY
          chunk's bound and no chunk could ever skip.
        * HOT terms (> BMW_SMALL_TERM_BLOCKS blocks): block-max
          metadata drives the bound, and the posting bytes stay
          ENCODED until a chunk survives the θ test — block-max
          skipping then saves the varint decode too, which at scale is
          the dominant cost of a hot term. Demand-decoded blocks are
          cached; once ≥ 1/BMW_LAZY_SWITCH_DEN of a hot term's blocks
          were demanded anyway (low skip rate), the term switches to
          one vectorized full decode, so a dense union costs the same
          as eager decoding.
        """
        if not present:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
        term_rows = {m.term: by_term[m.term].sort_values("doc_first") for m in present}
        lazy = {}
        blockmeta = {}
        small_ub = {}
        for m in present:
            r = term_rows[m.term]
            if safe_bounds:
                # stats-independent bound: stored max_score was computed
                # under the part's OWN snapshot stats, invalid once
                # deltas change N/avgdl/df. For any dl, avgdl > 0:
                # tf_norm ≤ tf(k1+1)/(tf+k1(1-b)), monotone in tf →
                # bound from stored max_tf.
                mt = r["max_tf"].to_numpy(dtype=np.float64)
                bnds = m.idf * mt * (K1 + 1.0) / (mt + K1 * (1.0 - B))
            else:
                bnds = r["max_score"].to_numpy(dtype=np.float64)
            blockmeta[m.term] = (
                r["doc_first"].to_numpy(dtype=np.int64),
                r["doc_last"].to_numpy(dtype=np.int64),
                bnds,
            )
            if len(r) <= BMW_SMALL_TERM_BLOCKS:
                lazy[m.term] = {"full": _decode_term_blocks(r, False)[:3]}
                small_ub[m.term] = float(bnds.max()) if bnds.size else 0.0
            else:
                lazy[m.term] = {
                    "rows": r,
                    "docs_b": r["docs"].tolist(),
                    "tfs_b": r["tfs"].tolist(),
                    "dls_b": r["dls"].tolist(),
                    "ns": r["n"].to_numpy(dtype=np.int64),
                    "dec": np.zeros(len(r), dtype=bool),
                    "n_dec": 0,
                    "cache": {},
                    "full": None,
                }
        bounds = np.unique(
            np.concatenate(
                [bm[0] for bm in blockmeta.values()]
                + [bm[1] + 1 for bm in blockmeta.values()]
            )
        )
        top_docs = np.empty(0, dtype=np.int64)
        top_scores = np.empty(0, dtype=np.float64)
        theta_e6 = -np.inf  # θ in the rounded score_e6 domain the merge uses
        # batch boundary intervals into ~256 groups: skipping power is
        # slightly coarser (group-max bound instead of block-max) but
        # the Python-level loop shrinks from O(blocks) to ~256 rounds;
        # scoring inside a surviving group is exact either way
        n_iv = bounds.size - 1
        group = max(1, n_iv // 256)
        rounds = 0
        skips = 0
        for ci in range(0, n_iv, group):
            lo = int(bounds[ci])
            hi = int(bounds[min(ci + group, n_iv)]) - 1
            # upper bound for this chunk: posting-level presence for
            # small (pre-decoded) terms, per-block metadata for hot ones
            ub = 0.0
            active = []
            for m in present:
                if m.term in small_ub:
                    docs_s = lazy[m.term]["full"][0]
                    inlo = np.searchsorted(docs_s, lo)
                    if inlo < docs_s.size and docs_s[inlo] <= hi:
                        ub += small_ub[m.term]
                        active.append((m, None))
                    continue
                firsts, lasts, bnds = blockmeta[m.term]
                sel = (firsts <= hi) & (lasts >= lo)
                if sel.any():
                    ub += float(bnds[sel].max())
                    # sel stays a mask: only the pre-switch lazy branch
                    # pays the nonzero() — post-switch rounds match the
                    # eager path's per-chunk cost exactly
                    active.append((m, sel))
            # skip only when every chunk score must round BELOW θ_e6 —
            # an e6-tied score could still win the doc_id tie-break
            if not active or (
                truncate and top_docs.size >= k and ub * 1e6 < theta_e6 - 0.5
            ):
                skips += 1
                continue  # BMW skip — the skipped blocks were never decoded
            rounds += 1
            dense_union = skips == 0 and rounds > BMW_LAZY_PROBE_ROUNDS
            docs_all, contrib_all = [], []
            for m, sel_m in active:
                st = lazy[m.term]
                bidx = None
                if st["full"] is None:
                    bidx = np.nonzero(sel_m)[0]
                    missing = bidx[~st["dec"][bidx]]
                    if missing.size:
                        st["n_dec"] += int(missing.size)
                        if dense_union or (
                            BMW_LAZY_SWITCH_DEN * st["n_dec"] >= st["ns"].size
                        ):
                            # low skip rate for this term: finish with
                            # one vectorized full decode (globally
                            # doc-sorted), drop the per-block cache
                            st["full"] = _decode_term_blocks(st["rows"], False)[:3]
                            st["cache"].clear()
                        else:
                            _decode_blocks_lazy(st, missing)
                            st["dec"][missing] = True
                if st["full"] is not None:
                    tdocs, ttfs, tdls = st["full"]
                    inlo = np.searchsorted(tdocs, lo)
                    inhi = np.searchsorted(tdocs, hi, side="right")
                    if inhi > inlo:
                        docs_all.append(tdocs[inlo:inhi])
                        contrib_all.append(
                            _bm25(ttfs[inlo:inhi], tdls[inlo:inhi], m.idf, avgdl)
                        )
                    continue
                cache = st["cache"]
                parts = [cache[i] for i in bidx]
                tdocs = parts[0][0] if len(parts) == 1 else np.concatenate([p[0] for p in parts])
                # salted runs interleave, so blocks of one term can
                # overlap in doc range: mask, don't searchsorted
                mask = (tdocs >= lo) & (tdocs <= hi)
                if mask.any():
                    ttfs = (parts[0][1] if len(parts) == 1 else np.concatenate([p[1] for p in parts]))[mask]
                    tdls = (parts[0][2] if len(parts) == 1 else np.concatenate([p[2] for p in parts]))[mask]
                    docs_all.append(tdocs[mask])
                    contrib_all.append(_bm25(ttfs, tdls, m.idf, avgdl))
            if not docs_all:
                continue
            docs_cat = np.concatenate(docs_all)
            contrib_cat = np.concatenate(contrib_all)
            uniq, inv = np.unique(docs_cat, return_inverse=True)
            sc = np.zeros(uniq.size, dtype=np.float64)
            np.add.at(sc, inv, contrib_cat)
            if allowed is not None:
                amask = _member_mask(uniq, allowed)
                uniq, sc = uniq[amask], sc[amask]
                if uniq.size == 0:
                    continue
            for narr in neg_arrays:
                if narr.size:
                    keep = ~_member_mask(uniq, narr)
                    uniq, sc = uniq[keep], sc[keep]
                    if uniq.size == 0:
                        break
            if uniq.size == 0:
                continue
            top_docs = np.concatenate([top_docs, uniq])
            top_scores = np.concatenate([top_scores, sc])
            if truncate and top_docs.size > k:
                order = np.lexsort((top_docs, -np.round(top_scores * 1e6)))[:k]
                top_docs, top_scores = top_docs[order], top_scores[order]
                theta_e6 = float(np.round(top_scores * 1e6).min())
        return top_docs, top_scores

    return score_shard


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

_READER_CACHE: dict = {}


def index_state_key(index_dir: str) -> tuple:
    """(manifest generation, manifest mtime, deltas mtime) — changes
    whenever the index mutates (rebuild, append_index, compaction
    registration). Shared invalidation key for the reader cache here
    and the API hit/aggregation caches (api.NewsleakAPI folds it into
    its keys so cached collected rows never outlive the index state
    that produced them). The generation counter (bumped on every
    manifest write) makes invalidation independent of filesystem
    timestamp granularity; mtimes stay in the key for pre-generation
    indexes and for deltas.json registration."""
    import os

    # the generation sidecar is a few bytes — reading its CONTENT per
    # call is as cheap as a stat and never depends on timestamps
    try:
        with open(os.path.join(index_dir, "generation")) as f:
            gen = int(f.read().strip() or 0)
    except (OSError, ValueError):
        gen = 0
    try:
        mtime = os.path.getmtime(os.path.join(index_dir, "manifest.json"))
    except OSError:
        mtime = 0.0
    try:
        dmtime = os.path.getmtime(os.path.join(index_dir, "deltas.json"))
    except OSError:
        dmtime = 0.0
    return (gen, mtime, dmtime)


def _cached_reader(spark: SparkSession, index_dir: str) -> IndexReader:
    """Reader memo per (index_dir, manifest mtime) — repeated queries
    skip manifest/config re-reads; a rebuild (new mtime) invalidates."""
    key = (index_dir, *index_state_key(index_dir))
    rd = _READER_CACHE.get(key)
    if rd is None or rd.spark is not spark:
        rd = IndexReader(spark, index_dir)
        _READER_CACHE.clear()
        _READER_CACHE[key] = rd
    return rd


def _candidates(
    spark: SparkSession, rd: IndexReader, spec: QuerySpec, truncate: bool,
    emit_shard: bool = False,
) -> DataFrame | None:
    """Shared candidate pipeline of search() and matching_doc_ids():
    dictionary lookup → segment scan (bucket-pruned) → shard-local
    scoring applyInPandas (cogrouped with the filtered docmeta when
    F2/F5 filters are present). ``truncate`` keeps the per-shard top-k
    heap on (ranked search) or off (full doc-set). Returns None when a
    required term is absent from the collection (AND → no hits)."""
    if spec.phrases and not rd.man.config.get("with_positions", True):
        raise ValueError(
            f"index at {rd.index_dir} was built with with_positions=False; "
            "phrase queries need a positions-bearing index"
        )
    has_filters = bool(spec.role_filter or spec.tool_filter or spec.ts_from or spec.ts_to)
    required = list(spec.all_scored_terms())
    boost = [t for t in spec.boost_terms if t not in required]
    if any(t in spec.not_terms for t in required):
        return None  # `a -a`: must AND must_not on one term → no hits
    neg = [t for t in spec.not_terms if t not in boost]
    all_terms = required + boost
    # hot-pair bigram sidecar plan: an adjacent phrase pair with BOTH
    # tokens in the index's coverage set is looked up as a synthetic
    # bigram term — membership prunes candidates before any position
    # decode, and a fully covered phrase skips unigram position IO
    # entirely (scoring is untouched: unigrams score BM25 as always,
    # so rank identity with the brute oracle is preserved)
    phrase_plans = None
    bigram_fetch: list[str] = []
    if spec.phrases and rd.bigram_cover:
        from newsleak_spark.indexing.build import BIGRAM_SEP

        plans = []
        for p in spec.phrases:
            pairs = tuple(
                (
                    i,
                    p[i] + BIGRAM_SEP + p[i + 1]
                    if p[i] in rd.bigram_cover and p[i + 1] in rd.bigram_cover
                    else None,
                )
                for i in range(len(p) - 1)
            )
            plans.append((p, pairs, bool(pairs) and all(bt for _i, bt in pairs)))
        phrase_plans = tuple(plans)
        bigram_fetch = sorted({bt for _p, prs, _f in plans for _i, bt in prs if bt})
    dict_rows = rd.dictionary_rows(all_terms + neg + bigram_fetch)
    if any(t not in dict_rows for t in required):
        return None
    if any(bt not in dict_rows for bt in bigram_fetch):
        # a COVERED pair absent from the combined bigram dictionary was
        # extracted by every part and found nowhere → the phrase has no
        # adjacency anywhere in the collection → no hits (phrases are
        # required terms)
        return None
    all_terms = [t for t in all_terms if t in dict_rows]
    # a must_not term absent from the collection excludes nothing; a
    # negated boost term stays in the fetch list only once (the scorer
    # peels its postings into the neg set before any scoring looks)
    neg = tuple(t for t in spec.not_terms if t in dict_rows)
    metas = [
        TermMeta(
            t,
            float(dict_rows[t][0]),
            float(np.log(1.0 + (rd.n_docs - dict_rows[t][0] + 0.5) / (dict_rows[t][0] + 0.5))),
            t in required,
        )
        for t in all_terms
    ]
    fetch_terms = all_terms + [t for t in neg if t not in all_terms] + bigram_fetch
    seg = rd.segments_for(fetch_terms, with_positions=bool(spec.phrases))
    scorer = _make_shard_scorer(
        metas, spec.phrases, rd.avgdl, spec.k, truncate=truncate,
        safe_bounds=rd.multi, neg_terms=neg, phrase_plans=phrase_plans,
        emit_shard=emit_shard,
    )
    schema = ("shard int, " if emit_shard else "") + "doc_id long, score double"
    if has_filters:
        # shard-local filtering: cogroup the shard's blocks with its
        # filter-surviving doc_ids (docmeta is shard-partitioned, so
        # the filter scan prunes columns + pushes predicates); with
        # truncate on, only k rows leave each shard
        meta = _apply_meta_filters(rd.docmeta(), spec).select("shard", "doc_id")
        return (
            seg.groupBy("shard")
            .cogroup(meta.groupBy("shard"))
            .applyInPandas(scorer.cogrouped, schema)
        )
    return seg.groupBy("shard").applyInPandas(scorer, schema)


def search(
    spark: SparkSession, index_dir: str, spec: QuerySpec, reader: IndexReader | None = None
) -> DataFrame:
    """Top-k search against a built index. Returns (doc_id, score_e6)."""
    from newsleak_spark.session import ensure_workers_can_import

    ensure_workers_can_import(spark)
    rd = reader or _cached_reader(spark, index_dir)

    if not spec.all_scored_terms() and not spec.boost_terms:
        # match_all / filters-only: no scoring, pinned score 1.0; a
        # not-only query is match_all minus the neg union doc set
        # (anti-join against the index's postings — text never read)
        out = _apply_meta_filters(rd.docmeta(), spec).select(
            "doc_id", F.lit(1_000_000).cast("long").alias("score_e6")
        )
        if spec.not_terms:
            neg_spec = QuerySpec(boost_terms=tuple(spec.not_terms))
            ex = _candidates(spark, rd, neg_spec, truncate=False)
            if ex is not None:
                out = out.join(ex.select("doc_id"), "doc_id", "left_anti")
        return out.orderBy(F.desc("score_e6"), F.asc("doc_id")).limit(spec.k)

    cand = _candidates(spark, rd, spec, truncate=True)
    if cand is None:
        # a required term is absent from the collection → no hits (AND)
        return spark.createDataFrame([], "doc_id long, score_e6 long")
    out = cand.select("doc_id", F.round(F.col("score") * 1e6).cast("long").alias("score_e6"))
    return out.orderBy(F.desc("score_e6"), F.asc("doc_id")).limit(spec.k)


def search_heaps(
    spark: SparkSession, index_dir: str, spec: QuerySpec, reader: IndexReader | None = None
) -> DataFrame | None:
    """Per-shard top-k heaps for deep pagination: (shard, doc_id,
    score_e6), each shard's top-spec.k by the global sort key. The
    SERVING layer merges these driver-side and can answer any page
    whose rank is provably exact from the heaps alone — the
    distributed analog of the reference's SearchHitIterator cursor
    (SearchHitIterator.scala:43-58): one scan, then O(pages) slicing,
    instead of re-running the whole top-k at growing k per page.

    Exactness bound (computed by the caller from these rows): a doc a
    TRUNCATED shard did not return ranks strictly after that shard's
    k-th returned row, so the merged ranking is exact through every
    position whose key sorts <= the minimum truncated-shard boundary
    key. Returns None for no-scored-term (match_all / filters-only)
    specs — those page through docmeta directly."""
    from newsleak_spark.session import ensure_workers_can_import

    if not spec.all_scored_terms() and not spec.boost_terms:
        return None
    ensure_workers_can_import(spark)
    rd = reader or _cached_reader(spark, index_dir)
    cand = _candidates(spark, rd, spec, truncate=True, emit_shard=True)
    if cand is None:
        return spark.createDataFrame([], "shard int, doc_id long, score_e6 long")
    return cand.select(
        "shard", "doc_id", F.round(F.col("score") * 1e6).cast("long").alias("score_e6")
    )


def matching_doc_ids(
    spark: SparkSession, index_dir: str, spec: QuerySpec, reader: IndexReader | None = None
) -> DataFrame:
    """The UNTRUNCATED matching doc-id set from the INDEX alone — same
    shard-local intersection/filter machinery as search() with the
    per-shard top-k heap off. Never touches the text column (docmeta
    scans are column-pruned), unlike a brute matching_docs() scan which
    re-tokenizes the collection; this is the index-accelerated doc-set
    feed for aggregation endpoints (facets/timeline/network over a
    query-filtered corpus). Returns DataFrame(doc_id long)."""
    from newsleak_spark.session import ensure_workers_can_import

    ensure_workers_can_import(spark)
    rd = reader or _cached_reader(spark, index_dir)

    if not spec.all_scored_terms() and not spec.boost_terms:
        out = _apply_meta_filters(rd.docmeta(), spec).select("doc_id")
        if spec.not_terms:
            neg_spec = QuerySpec(boost_terms=tuple(spec.not_terms))
            ex = _candidates(spark, rd, neg_spec, truncate=False)
            if ex is not None:
                out = out.join(ex.select("doc_id"), "doc_id", "left_anti")
        return out

    cand = _candidates(spark, rd, spec, truncate=False)
    if cand is None:
        return spark.createDataFrame([], "doc_id long")
    return cand.select("doc_id")


def count_hits(
    spark: SparkSession, index_dir: str, spec: QuerySpec, reader: IndexReader | None = None
) -> int:
    """Total matching-doc count (G9 / getTotalHits) from the index."""
    return matching_doc_ids(spark, index_dir, spec, reader).count()


def _apply_meta_filters(meta: DataFrame, spec: QuerySpec) -> DataFrame:
    # single source of truth for F2/F5 semantics: the brute path's
    # filter (the engine's rank-identity oracle) — divergence here would
    # silently break filtered-query parity
    from newsleak_spark.query.brute import _apply_filters

    return _apply_filters(meta, spec)
