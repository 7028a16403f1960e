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
    if not runs:
        pytest.skip("fixture has no such run")
    for phrase in runs[:3]:
        spec = QuerySpec(phrases=(phrase,), k=10)
        got = [(r.doc_id, r.score_e6) for r in search(spark, index_dir, spec).collect()]
        want = [(r.doc_id, r.score_e6) for r in bm25_topk(transcripts, spec).collect()]
        assert got == want, f"phrase {phrase}: {got} vs {want}"


def test_covered_absent_pair_short_circuits(spark, transcripts, index_dir, doc_tokens, cover):
    """A covered pair with NO adjacency anywhere is answered from the
    dictionary alone (no hits) — and the brute oracle agrees."""
    seen = set()
    for toks in doc_tokens.values():
        seen.update(zip(toks, toks[1:]))
    hot = sorted(cover)
    pair = next(
        ((a, b) for a in hot for b in hot if (a, b) not in seen),
        None,
    )
    if pair is None:
        pytest.skip("every hot pair is adjacent somewhere in the fixture")
    spec = QuerySpec(phrases=(pair,), k=10)
    assert search(spark, index_dir, spec).count() == 0
    assert bm25_topk(transcripts, spec).count() == 0


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
