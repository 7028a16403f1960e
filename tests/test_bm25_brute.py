"""BM25 rank-identity vs an independent pure-Python oracle
(SURVEY §5.2 item 2): same formula, same analyzer, exact top-k
(score, doc_id) with tie-break (score desc, doc_id asc)."""

import datetime as dt
import math

import pytest

from newsleak_spark.analysis import analyze
from newsleak_spark.query import QuerySpec, bm25_topk

K1, B = 1.2, 0.75


def python_bm25_oracle(rows, spec: QuerySpec, mode="standard"):
    """rows: list of dicts with doc_id, text, role, tool, ts."""
    toks = {r["doc_id"]: analyze(r["text"], mode) for r in rows}
    n = len(rows)
    avgdl = sum(len(t) for t in toks.values()) / n
    required = list(spec.all_scored_terms())
    boost = [t for t in spec.boost_terms if t not in required]

    def keep(r):
        if spec.role_filter and r["role"] not in spec.role_filter:
            return False
        if spec.tool_filter and r["tool"] not in spec.tool_filter:
            return False
        d = r["ts"].date()
        if spec.ts_from and d < spec.ts_from:
            return False
        if spec.ts_to and d > spec.ts_to:
            return False
        joined = " " + " ".join(toks[r["doc_id"]]) + " "
        for p in spec.phrases:
            if " " + " ".join(p) + " " not in joined:
                return False
        return True

    if not required and not boost:
        hits = sorted(r["doc_id"] for r in rows if keep(r))
        return [(d, 1_000_000) for d in hits[: spec.k]]

    df = {}
    for t in required + boost:
        df[t] = sum(1 for tt in toks.values() if t in tt)

    out = []
    for r in rows:
        tt = toks[r["doc_id"]]
        if any(t not in tt for t in required):
            continue
        if not keep(r):
            continue
        score = 0.0
        for t in required + boost:
            tf = tt.count(t)
            if tf == 0:
                continue
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            score += idf * tf * (K1 + 1) / (tf + K1 * (1 - B + B * len(tt) / avgdl))
        out.append((r["doc_id"], round(score * 1e6)))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[: spec.k]


SPECS = [
    QuerySpec(terms=("spark",), k=10),
    QuerySpec(terms=("merge", "window"), k=15),
    QuerySpec(terms=("table", "fast", "scan"), k=10),
    QuerySpec(phrases=(("fast", "table"),), k=10),
    QuerySpec(terms=("table",), role_filter=("user",), k=10),
    QuerySpec(terms=("table",), tool_filter=("tool_3",), k=10),
    QuerySpec(
        terms=("row",), ts_from=dt.date(2018, 6, 1), ts_to=dt.date(2020, 6, 30), k=10
    ),
    QuerySpec(terms=("table",), boost_terms=("spark", "merge"), k=10),
    QuerySpec(terms=("nosuchterm",), k=10),
    QuerySpec(k=10),  # match_all
]


@pytest.fixture(scope="module")
def rows(transcripts):
    return [r.asDict() for r in transcripts.collect()]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.cache_key())
def test_rank_identity_vs_python_oracle(spark, transcripts, rows, spec):
    got = [(r.doc_id, r.score_e6) for r in bm25_topk(transcripts, spec).collect()]
    want = python_bm25_oracle(rows, spec)
    assert [g[0] for g in got] == [w[0] for w in want], "docID rank mismatch"
    for (gd, gs), (wd, ws) in zip(got, want):
        assert abs(gs - ws) <= 1, f"score mismatch doc {gd}: {gs} vs {ws}"
