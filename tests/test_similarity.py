"""ANN-LSH recall vs the exact brute baseline.

Two data geometries:

* PLANTED CLUSTERS (real embedding corpora are clustered): points are
  unit-norm cluster centers plus small noise, so a query's true top-k
  lives in its own cluster at cosine ~0.95+. Random-hyperplane LSH must
  recover nearly all of it from a small candidate fraction — this is
  the operating regime the operator is built for.
* The driver fixture's embeddings are UNIFORM RANDOM — max pairwise
  cosine ~0.46, where hyperplane collision probability is provably tiny
  (p_bit = 1 - arccos(sim)/pi ≈ 0.63 → p_bucket = 0.63^12 per table).
  tools/recall_report.py measures that regime; it is a property of the
  data geometry, not of the implementation (BASELINE.md "LSH recall").
"""

import numpy as np
import pytest

from newsleak_spark.similarity import ann_cosine_topk_df, ann_lsh_topk_df


N_CLUSTERS = 40
PER_CLUSTER = 30
DIM = 64
# per-dim noise: total noise power NOISE^2*DIM = 0.058 against unit
# centers → intra-cluster cosine ~0.94 (a realistic near-dup/cluster
# regime; at 0.12 the noise power would EXCEED the signal and
# intra-cluster cosine drops to ~0.5, where no LSH can bucket well)
NOISE = 0.03


@pytest.fixture(scope="module")
def clustered(spark):
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((N_CLUSTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    vid = 0
    for ci in range(N_CLUSTERS):
        pts = centers[ci] + NOISE * rng.standard_normal((PER_CLUSTER, DIM))
        for p in pts:
            rows.append((vid, [float(x) for x in p]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_lsh_recall_on_clustered_data(clustered):
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_cosine_topk_df(clustered, n_queries=5, k=5).collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_lsh_topk_df(
            clustered, n_queries=5, k=5, n_tables=8, n_bits=8
        ).collect()
    }
    recall = len(truth & got) / len(truth)
    assert recall >= 0.9, f"recall {recall} ({len(truth)} true pairs)"


def test_lsh_candidates_are_a_small_fraction(clustered):
    """The clustered win must come from BUCKETING, not from candidates
    degenerating to all-pairs: cross-cluster cosine ~0, so collision
    probability across clusters is ~0.5^12 per table."""
    from newsleak_spark.similarity import _norm, lsh_bucket_udf
    from pyspark.sql import functions as F

    e = clustered.withColumn("nrm", _norm("embedding"))
    udf = lsh_bucket_udf(42, n_tables=8, n_bits=8, dim=DIM)
    b = e.select("vec_id", F.explode(udf("embedding")).alias("bucket"))
    qb = b.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), "bucket"
    )
    n_cand = (
        b.join(qb, "bucket")
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id")
        .distinct()
        .count()
    )
    n_total = 5 * (N_CLUSTERS * PER_CLUSTER - 1)
    frac = n_cand / n_total
    assert frac < 0.25, f"candidate fraction {frac} — bucketing degenerated"


def test_multiprobe_recovers_recall_with_fewer_tables(clustered):
    """1-bit multi-probe: with only 4 tables at 12 bits, single-bucket
    probing misses a substantial recall fraction (per-table collision
    ~0.26 at intra-cluster cosine ~0.94); probing the hamming-1
    neighborhood of each query bucket recovers it — query-side fan-out
    only, no corpus-side storage growth."""
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_cosine_topk_df(clustered, n_queries=5, k=5).collect()
    }

    def recall(probe_bits):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in ann_lsh_topk_df(
                clustered, n_queries=5, k=5, n_tables=4, n_bits=12,
                probe_bits=probe_bits,
            ).collect()
        }
        return len(truth & got) / len(truth)

    r0, r1 = recall(0), recall(1)
    assert r1 >= r0
    assert r1 >= 0.85, f"multi-probe recall {r1} (single-probe {r0})"


def test_ivf_recall_on_clustered_data(clustered):
    """IVF (k-means coarse quantizer, nprobe cells): on clustered data
    the quantizer adapts to the cluster structure, so recall should be
    near-perfect probing a few cells — the data-adaptive counterpart
    to the data-oblivious hyperplane LSH."""
    from newsleak_spark.similarity import ann_ivf_topk_df

    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_cosine_topk_df(clustered, n_queries=5, k=5).collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_ivf_topk_df(
            clustered, n_queries=5, k=5, nlist=16, nprobe=3
        ).collect()
    }
    recall = len(truth & got) / len(truth)
    assert recall >= 0.9, f"IVF recall {recall}"


def test_embedding_lsh_dedup_recall_on_clustered_data(clustered):
    """The LSH near-dup path must find (nearly) every pair the exact
    all-pairs threshold finds, from bucketed candidates only — the
    scale route dedup_embedding_cosine's scoped exact version defers
    to. Threshold 0.85: intra-cluster pairs qualify, cross-cluster
    pairs (~cosine 0) never do."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from newsleak_spark.similarity import (
        _dot, _norm, dedup_embedding_lsh_df,
    )

    thr = 0.85
    # exact truth on a bounded slice (all-pairs over 300 vectors)
    e = clustered.filter(F.col("vec_id") < 300).withColumn("nrm", _norm("embedding"))
    a = e.select(F.col("vec_id").alias("va"), F.col("embedding").alias("ea"), F.col("nrm").alias("na"))
    b = e.select(F.col("vec_id").alias("vb"), F.col("embedding").alias("eb"), F.col("nrm").alias("nb"))
    truth = {
        (r["va"], r["vb"])
        for r in a.join(b, F.col("va") < F.col("vb"))
        .withColumn("sim", _dot("ea", "eb") / (F.col("na") * F.col("nb")))
        .filter(F.col("sim") >= thr)
        .collect()
    }
    assert truth, "fixture must contain near-dup pairs at this threshold"

    got = {
        (r["doc_a"], r["doc_b"])
        for r in dedup_embedding_lsh_df(
            clustered.filter(F.col("vec_id") < 300), threshold=thr,
            n_tables=8, n_bits=8,
        ).collect()
    }
    recall = len(truth & got) / len(truth)
    assert recall >= 0.9, f"LSH near-dup recall {recall} ({len(truth)} true pairs)"
    # precision is exact by construction (candidates are verified
    # against the same threshold before emission)
    assert all(p in truth for p in got), "verified pairs must satisfy the threshold"
