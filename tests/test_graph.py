"""connected_components (large-star/small-star) vs an independent
Python union-find, and the dedup_cluster structural invariants.

The union-find below is the textbook sequential algorithm — it shares
no code or structure with the DataFrame implementation, so agreement
pins the distributed contraction's semantics, not its wording.
"""

import random

import pytest
from pyspark.sql import functions as F

from newsleak_spark.textops import (
    connected_components,
    dedup_cluster,
    dedup_corpus,
    dedup_exact,
    dedup_minhash_lsh,
)

from conftest import SF_SMOKE


def _uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {n: find(n) for n in parent}


def _min_label(comp):
    """node -> min node id of its component (from union-find roots)."""
    groups = {}
    for n, r in comp.items():
        groups.setdefault(r, []).append(n)
    out = {}
    for members in groups.values():
        m = min(members)
        for n in members:
            out[n] = m
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_cc_random_graphs_match_union_find(spark, seed):
    rng = random.Random(seed)
    n = 60
    edges = [
        (rng.randrange(n), rng.randrange(n))
        for _ in range(rng.randrange(20, 80))
    ]
    edges = [(u, v) for u, v in edges if u != v]
    if not edges:
        edges = [(0, 1)]
    df = spark.createDataFrame(edges, "u: long, v: long")
    got = {
        r["node"]: r["comp"] for r in connected_components(df).collect()
    }
    want = _min_label(_uf_components(edges))
    assert got == want


def test_cc_path_graph_high_diameter(spark):
    # worst case for naive propagation: a path relabeled so ids are not
    # monotone along it; star contraction must still converge within
    # max_iter and label every node with the path minimum
    rng = random.Random(7)
    ids = list(range(100, 140))
    rng.shuffle(ids)
    edges = list(zip(ids, ids[1:]))
    df = spark.createDataFrame(edges, "u: long, v: long")
    got = {r["node"]: r["comp"] for r in connected_components(df).collect()}
    assert set(got) == set(ids)
    assert set(got.values()) == {min(ids)}


def test_dedup_cluster_invariants(spark):
    pairs = dedup_minhash_lsh(spark, SF_SMOKE).collect()
    rows = dedup_cluster(spark, SF_SMOKE).collect()
    lbl = {r["doc_id"]: r["cluster_id"] for r in rows}
    # every pair endpoint is labeled, both endpoints share a cluster
    for p in pairs:
        assert lbl[p["doc_a"]] == lbl[p["doc_b"]]
    # exactly one keep per cluster: its minimum member
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, members in by_cluster.items():
        assert cid == min(m["doc_id"] for m in members)
        keeps = [m for m in members if m["is_keep"]]
        assert len(keeps) == 1 and keeps[0]["doc_id"] == cid
        assert all(m["n_docs"] == len(members) for m in members)
    # labels agree with the independent union-find on the same pairs
    want = _min_label(_uf_components([(p["doc_a"], p["doc_b"]) for p in pairs]))
    assert lbl == want


def test_dedup_corpus_decision_consistency(spark):
    rows = dedup_corpus(spark, SF_SMOKE).collect()
    n_docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    assert len(rows) == n_docs  # one decision per document
    by_id = {r["doc_id"]: r for r in rows}
    for r in rows:
        assert r["keep"] == (r["reason"] == "kept")
    # exact groups: exactly the min doc of each multi-doc group is kept
    for g in dedup_exact(spark, SF_SMOKE).collect():
        if g["n_docs"] > 1:
            assert by_id[g["keep_doc_id"]]["reason"] in ("kept", "near_dup")
    # cluster non-canonicals are never kept (unless already exact_dup)
    for c in dedup_cluster(spark, SF_SMOKE).collect():
        if not c["is_keep"]:
            assert by_id[c["doc_id"]]["reason"] in ("exact_dup", "near_dup")
    # the kept set is self-consistent: a kept doc is its own canonical
    kept = {r["doc_id"] for r in rows if r["keep"]}
    for c in dedup_cluster(spark, SF_SMOKE).collect():
        if c["doc_id"] in kept:
            assert c["is_keep"]
