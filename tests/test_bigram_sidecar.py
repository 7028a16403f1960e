"""Hot-pair bigram sidecar (phrase acceleration): extraction parity
against a pure-Python adjacency scan, engine-vs-brute rank identity for
fully / partially covered phrases, the covered-pair-absent no-hits fast
path, and the no-sidecar fallback (SURVEY §5.2; the worst-case phrase
is two HOT terms — VERDICT r3 item 2; nextword-index idea from
Williams, Zobel & Bahle, ACM TOIS 2004).

Reference phrase semantics: quoted phrases in queryStringQuery,
ESRequestUtils.scala:295-312 — the sidecar must be invisible to
results, only to position-decode cost.
"""

import datetime as dt
import shutil
from collections import Counter

import pytest
from pyspark.sql import functions as F

from newsleak_spark.analysis import tokens_col
from newsleak_spark.indexing import IndexConfig, build_index
from newsleak_spark.indexing.build import BIGRAM_SEP
from newsleak_spark.query import QuerySpec, bm25_topk
from newsleak_spark.query.engine import IndexReader, search

CFG = IndexConfig(n_shards=4, n_term_buckets=4, block_size=16, hot_df_ratio=0.3, n_salts=4)


# ---------------------------------------------------------------------------
# Constructed-geometry corpus: sf0.001's Zipf text happens to exercise
# every sidecar path, but "happens to" is not a guarantee — this corpus
# is BUILT so that (a) the top-8-by-cf extraction set is exactly the
# eight named hot terms (cf 20-40 vs <=3 for every cold term), (b)
# fully- and partially-covered runs of length 2 and 3 all exist, and
# (c) the covered pair (theta, alpha) is adjacent NOWHERE — theta is
# always followed by a cold token or end-of-text — so the
# dictionary-only no-hits short circuit always has a target. No
# geometry-dependent skips.
# ---------------------------------------------------------------------------

_HOT = ("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta")


def _crafted_rows():
    texts = []
    for i in range(10):
        texts.append(f"alpha beta gamma cold{i} delta theta")
    for i in range(10, 20):
        texts.append(f"delta epsilon cold{i} zeta eta alpha")
    for i in range(20, 30):
        texts.append(f"eta theta cold{i} beta alpha alpha")
    for i in range(30, 40):
        texts.append(f"zeta epsilon gamma delta cold{i} cold{(i * 7) % 40}")
    return [
        (
            i,
            f"conv_{i % 5}",
            i // 5,
            ("user", "assistant", "system", "tool")[i % 4],
            t,
            f"tool_{i % 3}" if i % 4 == 3 else None,
            dt.datetime(2020, 1, 1) + dt.timedelta(hours=i),
        )
        for i, t in enumerate(texts)
    ]


@pytest.fixture(scope="module")
def crafted(spark):
    return spark.createDataFrame(
        _crafted_rows(),
        "doc_id long, conv_id string, turn_idx int, role string, "
        "text string, tool string, ts timestamp",
    ).cache()


@pytest.fixture(scope="module")
def crafted_index(spark, crafted, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("bgcraft"))
    build_index(spark, crafted, d, CFG)
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="module")
def index_dir(spark, transcripts, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("bgidx"))
    build_index(spark, transcripts, d, CFG)
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="module")
def doc_tokens(spark, transcripts):
    """{doc_id: [token,...]} for the whole smoke fixture (500 docs)."""
    rows = transcripts.select(
        "doc_id", tokens_col(F.col("text"), CFG.mode).alias("toks")
    ).collect()
    return {r["doc_id"]: r["toks"] for r in rows}


@pytest.fixture(scope="module")
def cover(spark, index_dir):
    return IndexReader(spark, index_dir).bigram_cover


def test_extraction_matches_python_adjacency(spark, index_dir, doc_tokens, cover):
    """Sidecar postings == brute adjacency scan: per (doc, hot-pair),
    tf = number of adjacent occurrences. Positions are deliberately
    NOT persisted (the sidecar is a membership filter)."""
    assert cover, "fixture must yield covered terms at bigram_df_ratio"
    want: dict[tuple[int, str], int] = {}
    for doc, toks in doc_tokens.items():
        for i in range(len(toks) - 1):
            if toks[i] in cover and toks[i + 1] in cover:
                key = (doc, toks[i] + BIGRAM_SEP + toks[i + 1])
                want[key] = want.get(key, 0) + 1
    rows = spark.read.parquet(f"{index_dir}/bigram_postings").collect()
    got = {(r["doc_id"], r["term"]): r["tf"] for r in rows}
    assert got == want
    assert all(len(r["positions"]) == 0 for r in rows)


def _adjacent_runs(doc_tokens, cover, length, want_covered):
    """Phrases of `length` consecutive tokens present in the fixture;
    want_covered selects all-hot (fully covered) vs mixed runs."""
    out = Counter()
    for toks in doc_tokens.values():
        for i in range(len(toks) - length + 1):
            run = tuple(toks[i : i + length])
            hot = [t in cover for t in run]
            if all(hot) == want_covered and (want_covered or any(hot)):
                out[run] += 1
    return [p for p, _n in out.most_common()]


@pytest.mark.parametrize("length,covered", [(2, True), (3, True), (2, False), (3, False)])
def test_phrase_rank_identity(spark, transcripts, index_dir, doc_tokens, cover, length, covered):
    """Engine == brute for fully-covered (sidecar-only verification,
    incl. len-3 via sidecar positions) and partially-covered (unigram
    position fallback) phrases."""
    runs = _adjacent_runs(doc_tokens, cover, length, covered)
    # sf0.001 is driver-generated and fixed: every run shape exists in
    # it today; a regression here means the fixture or the analyzer
    # changed, not flaky geometry (the crafted-corpus tests below
    # guarantee each shape independently of this data)
    assert runs, "sf0.001 geometry regressed: no such run"
    for phrase in runs[:3]:
        spec = QuerySpec(phrases=(phrase,), k=10)
        got = [(r.doc_id, r.score_e6) for r in search(spark, index_dir, spec).collect()]
        want = [(r.doc_id, r.score_e6) for r in bm25_topk(transcripts, spec).collect()]
        assert got == want, f"phrase {phrase}: {got} vs {want}"


def test_crafted_cover_is_exactly_the_hot_terms(spark, crafted_index):
    """The extraction set is the top-8 terms by (cf desc, term asc):
    the corpus pins cf(hot) in 20..40 vs <=3 for cold fillers, so the
    cover must be exactly the eight named hot terms."""
    assert IndexReader(spark, crafted_index).bigram_cover == frozenset(_HOT)


def test_covered_absent_pair_short_circuits(spark, crafted, crafted_index):
    """A covered pair with NO adjacency anywhere is answered from the
    dictionary alone (no hits) — and the brute oracle agrees. The
    corpus is constructed so (theta, alpha) is such a pair: assert the
    construction, then the short circuit."""
    seen = set()
    for r in crafted.select("text").collect():
        toks = r["text"].split()
        seen.update(zip(toks, toks[1:]))
    pair = ("theta", "alpha")
    assert pair not in seen, "corpus construction broken: pair is adjacent"
    spec = QuerySpec(phrases=(pair,), k=10)
    assert search(spark, crafted_index, spec).count() == 0
    assert bm25_topk(crafted, spec).count() == 0


@pytest.mark.parametrize(
    "phrase,covered",
    [
        (("alpha", "beta"), True),            # fully covered len-2
        (("alpha", "beta", "gamma"), True),    # fully covered len-3
        (("gamma", "cold3"), False),           # mixed len-2 (hot, cold)
        (("gamma", "cold7", "delta"), False),  # mixed len-3
        (("alpha", "alpha"), True),            # covered self-pair, tf>1 docs
    ],
)
def test_crafted_phrase_rank_identity(spark, crafted, crafted_index, phrase, covered):
    """Engine == brute on the constructed corpus for every sidecar
    path; each phrase is guaranteed by construction to have hits."""
    cover = IndexReader(spark, crafted_index).bigram_cover
    assert all(t in cover for t in phrase if not t.startswith("cold"))
    assert covered == all(t in cover for t in phrase)
    spec = QuerySpec(phrases=(phrase,), k=15)
    got = [(r.doc_id, r.score_e6) for r in search(spark, crafted_index, spec).collect()]
    want = [(r.doc_id, r.score_e6) for r in bm25_topk(crafted, spec).collect()]
    assert got and got == want


def test_delta_coverage_shrinks_and_compaction_restores(spark, crafted, tmp_path):
    """Coverage under deltas (VERDICT r4 item 7), measured not assumed:
    multi-part coverage is the INTERSECTION of the parts' hot sets —
    appending a delta whose term head differs shrinks it (results stay
    correct via unigram-position fallback) — and compact_index RESTORES
    it by re-extracting the sidecar from the merged unigram positions
    with the combined collection's own top-K hot set, byte-identical to
    a from-scratch build of the full collection."""
    from newsleak_spark.indexing import append_index, compact_index

    d = str(tmp_path / "cov")
    build_index(spark, crafted, d, CFG)
    assert IndexReader(spark, d).bigram_cover == frozenset(_HOT)

    # delta head: six fresh terms at cf 10 + alpha/beta at cf 4 → the
    # delta's own top-8 shares only {alpha, beta} with the base's
    rows = [
        (
            100 + i,
            f"dconv_{i}",
            i,
            "user",
            (
                f"iota kappa lambda mu nu xi dcold{i}"
                if i < 10
                else f"alpha beta dcold{i}"
            ),
            None,
            dt.datetime(2021, 1, 1) + dt.timedelta(hours=i),
        )
        for i in range(14)
    ]
    delta = spark.createDataFrame(
        rows,
        "doc_id long, conv_id string, turn_idx int, role string, "
        "text string, tool string, ts timestamp",
    )
    append_index(spark, delta, d, CFG)
    assert IndexReader(spark, d).bigram_cover == frozenset({"alpha", "beta"})

    both = crafted.unionByName(delta)
    spec = QuerySpec(phrases=(("alpha", "beta"),), k=30)
    want = [(r.doc_id, r.score_e6) for r in bm25_topk(both, spec).collect()]
    got = [(r.doc_id, r.score_e6) for r in search(spark, d, spec).collect()]
    assert got and got == want  # degraded coverage never changes results

    compact_index(spark, d)
    comp = d + "_compacted"
    assert IndexReader(spark, comp).bigram_cover == frozenset(_HOT)
    got_c = [(r.doc_id, r.score_e6) for r in search(spark, comp, spec).collect()]
    assert got_c == want

    # re-extraction parity: compacted sidecar postings == a from-scratch
    # build of the full collection (same hot set, same (doc, pair, tf))
    fresh = str(tmp_path / "fresh")
    build_index(spark, both, fresh, CFG)
    side = lambda p: sorted(  # noqa: E731
        (r["doc_id"], r["term"], r["tf"])
        for r in spark.read.parquet(f"{p}/bigram_postings").collect()
    )
    assert side(comp) == side(fresh)


def test_rebuild_without_sidecar_clears_stale_coverage(spark, crafted, tmp_path):
    """Regression (ADVICE r4, medium): rebuilding an existing index dir
    with hot_bigrams=False and resume=False — the flow the
    config-mismatch ValueError directs users to — used to leave stale
    stats.bigram_terms in the manifest and a stale sidecar on disk;
    the reader then planned covered pairs against segments with no
    sidecar postings and phrase queries silently returned 0 hits."""
    import os

    from newsleak_spark.indexing.manifest import Manifest

    d = str(tmp_path / "rebuilt")
    build_index(spark, crafted, d, CFG)
    assert IndexReader(spark, d).bigram_cover  # sidecar present

    cfg_off = IndexConfig(**{**CFG.as_dict(), "hot_bigrams": False})
    build_index(spark, crafted, d, cfg_off, resume=False)
    man = Manifest(d)
    assert not man.stats.get("bigram_terms")
    assert int(man.stats.get("n_bigram_postings") or 0) == 0
    assert not os.path.exists(os.path.join(d, "bigram_postings"))
    assert not os.path.exists(os.path.join(d, "bigram_dictionary"))
    rd = IndexReader(spark, d)
    assert rd.bigram_cover == frozenset()
    spec = QuerySpec(phrases=(("alpha", "beta"),), k=15)
    got = [(r.doc_id, r.score_e6) for r in search(spark, d, spec).collect()]
    want = [(r.doc_id, r.score_e6) for r in bm25_topk(crafted, spec).collect()]
    assert got and got == want


def test_no_sidecar_fallback(spark, transcripts, tmp_path):
    """hot_bigrams=False: empty coverage, pure unigram verification,
    identical results."""
    d = str(tmp_path / "nobg")
    cfg = IndexConfig(
        n_shards=4, n_term_buckets=4, block_size=16, hot_df_ratio=0.3,
        n_salts=4, hot_bigrams=False,
    )
    build_index(spark, transcripts, d, cfg)
    rd = IndexReader(spark, d)
    assert rd.bigram_cover == frozenset()
    spec = QuerySpec(phrases=(("fast", "table"),), k=10)
    got = [(r.doc_id, r.score_e6) for r in search(spark, d, spec).collect()]
    want = [(r.doc_id, r.score_e6) for r in bm25_topk(transcripts, spec).collect()]
    assert got == want
