"""Similarity search over the ``embeddings`` table (array<float> column).

Two paths:
  * ``ann_cosine_topk`` — exact brute-force cosine top-k, the baseline.
    Dot/norm fold in array form inside whole-stage codegen
    (zip_with + aggregate over array<double>). The DuckDB oracle sums
    the same doubles in an unspecified order, so raw sims can differ
    at ulp level; BOTH engines therefore rank on the quantized
    ``sim_e4`` (with vec_id tiebreak), making rank order exact.
  * ``ann_ivf_topk`` — the data-ADAPTIVE scale path: a k-means coarse
    quantizer (trained on a sample at scale) assigns every vector a
    cell; queries probe their nprobe nearest cells and re-rank
    exactly. Recall on clustered data pinned in tests.
  * ``ann_lsh_buckets`` / ``ann_lsh_topk`` — the data-OBLIVIOUS
    100TB scale path:
    seed-pinned random-hyperplane LSH (vectorized numpy over Arrow
    batches) buckets vectors; candidates come from ONE equi-join on
    bucket keys and are exactly re-ranked within buckets. Recall vs
    the brute baseline is measured in tests/test_similarity.py on
    planted-cluster data (>=0.9 from a <25% candidate fraction) and by
    tools/recall_report.py on the fixture (no SQL oracle — driver
    records the rows-only check). Recall is a function of the DATA
    GEOMETRY: the fixture's embeddings are uniform random (max
    pairwise cosine ~0.46), where hyperplane collision probability is
    provably tiny and ANY bucketing scheme degenerates; clustered
    corpora — the real operating regime — bucket well (BASELINE.md
    "LSH recall").

At scale: the brute path is O(Q·N) and only for small Q (it broadcasts
the query set); the LSH path shuffles once on the bucket key, with B
independent hyperplane tables trading recall for join fan-out, the
MAX_ANN_BUCKET cap bounding degenerate buckets, and optional 1-bit
multi-probe (probe_bits=1) expanding only the broadcast QUERY side to
the hamming-1 bucket neighborhood — recall per table rises from p^bits
to p^bits + bits·p^(bits-1)·(1-p) with zero corpus-side growth.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

N_QUERIES = 5  # vec_id < 5 are the benchmark query vectors
TOP_K = 5
LSH_BITS = 12
LSH_TABLES = 4
DIM = 64
# Corpus-side LSH buckets larger than this are skipped for candidate
# generation: a degenerate bucket (near-identical vectors, or a bad
# hyperplane draw) would fan the candidate join out Q·m for every
# query landing in it. Multi-table probing recovers the recall.
MAX_ANN_BUCKET = 500


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _dot(a: str, b: str) -> F.Column:
    return F.expr(
        f"aggregate(zip_with(cast({a} as array<double>), cast({b} as array<double>), "
        "(x, y) -> x * y), 0D, (acc, x) -> acc + x)"
    )


def _norm(a: str) -> F.Column:
    return F.sqrt(
        F.expr(
            f"aggregate(transform(cast({a} as array<double>), x -> x * x), 0D, (acc, x) -> acc + x)"
        )
    )


def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ann_cosine_topk_df(_emb(spark, sf_dir))


def ann_cosine_topk_df(
    emb: DataFrame, n_queries: int = N_QUERIES, k: int = TOP_K
) -> DataFrame:
    """Exact cosine top-k for query vectors (vec_id < n_queries) against
    the full table (self excluded). Tie-break (sim desc, neighbor asc).

    Array-form brute force: the Q query vectors broadcast against the
    table and each pair's dot/norms fold inside whole-stage codegen
    (zip_with + aggregate) — one narrow stage over N rows, no ×dim row
    explosion, no position-keyed shuffle."""
    e = emb.withColumn("nrm", _norm("embedding"))
    q = e.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qemb"),
        F.col("nrm").alias("qnrm"),
    )
    sims = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .withColumn("sim", _dot("embedding", "qemb") / (F.col("nrm") * F.col("qnrm")))
        # rank on the QUANTIZED similarity (e4) with vec_id tiebreak:
        # raw doubles differ by summation order between engines, so
        # near-tied neighbors could flip ranks at ulp level
        .withColumn("sim_e4", F.round(F.col("sim") * 10000).cast("long"))
    )
    w = W.partitionBy("qid").orderBy(F.desc("sim_e4"), F.asc("vec_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").cast("long").alias("query_id"),
            F.col("vec_id").alias("neighbor_id"),
            "sim_e4",
            F.col("rank").cast("long").alias("rank"),
        )
        .orderBy("query_id", "rank")
    )


def ann_cosine_topk_oracle() -> str:
    return f"""
WITH flat AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         CAST(unnest(embedding) AS DOUBLE) AS e
  FROM embeddings
),
norms AS (SELECT vec_id, SQRT(SUM(e * e)) AS nrm FROM flat GROUP BY vec_id),
q AS (SELECT vec_id AS qid, i, e AS qe FROM flat WHERE vec_id < {N_QUERIES}),
dots AS (
  SELECT q.qid, f.vec_id, SUM(f.e * q.qe) AS dot
  FROM flat f JOIN q ON f.i = q.i AND f.vec_id <> q.qid
  GROUP BY q.qid, f.vec_id
),
sims AS (
  SELECT d.qid, d.vec_id, d.dot / (n.nrm * qn.nrm) AS sim
  FROM dots d
  JOIN norms n ON n.vec_id = d.vec_id
  JOIN norms qn ON qn.vec_id = d.qid
),
quant AS (
  SELECT qid, vec_id, CAST(ROUND(sim * 10000) AS BIGINT) AS sim_e4 FROM sims
),
ranked AS (
  SELECT qid, vec_id, sim_e4,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim_e4 DESC, vec_id ASC) AS rank
  FROM quant
)
SELECT CAST(qid AS BIGINT) AS query_id, vec_id AS neighbor_id,
       sim_e4, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {TOP_K}
ORDER BY query_id, rank"""


# ---------------------------------------------------------------------------
# LSH scale path (seed-pinned hyperplanes; vectorized pandas UDF)
# ---------------------------------------------------------------------------

def _hyperplanes(seed: int, n_tables: int, n_bits: int, dim: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, n_bits, dim))


def lsh_bucket_udf(seed: int = 42, n_tables: int = LSH_TABLES, n_bits: int = LSH_BITS, dim: int = DIM):
    planes = _hyperplanes(seed, n_tables, n_bits, dim)
    weights = 1 << np.arange(n_bits, dtype=np.int64)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def buckets(emb: pd.Series) -> pd.Series:
        mat = np.asarray([np.asarray(v, dtype=np.float64) for v in emb])
        out = []
        if len(mat) == 0:
            return pd.Series(out)
        # (tables, bits, dim) @ (n, dim)T -> sign bits -> packed ints
        for t in range(n_tables):
            proj = mat @ planes[t].T  # (n, bits)
            bits = (proj > 0).astype(np.int64)
            packed = bits @ weights  # (n,)
            out.append(packed + (t << n_bits))  # disambiguate tables
        stacked = np.stack(out, axis=1)  # (n, tables)
        return pd.Series(list(stacked))

    return buckets


def ann_lsh_buckets(spark: SparkSession, sf_dir: str, seed: int = 42) -> DataFrame:
    """(vec_id, bucket) pairs — one bucket per LSH table per vector."""
    e = _emb(spark, sf_dir)
    udf = lsh_bucket_udf(seed)
    return e.select("vec_id", F.explode(udf("embedding")).alias("bucket")).orderBy(
        "vec_id", "bucket"
    )


def ann_lsh_topk(spark: SparkSession, sf_dir: str, seed: int = 42) -> DataFrame:
    return ann_lsh_topk_df(_emb(spark, sf_dir), seed=seed)


def ann_lsh_topk_df(
    emb: DataFrame,
    seed: int = 42,
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
    n_tables: int = LSH_TABLES,
    n_bits: int = LSH_BITS,
    dim: int = DIM,
    max_bucket: int = MAX_ANN_BUCKET,
    probe_bits: int = 0,
) -> DataFrame:
    """Approximate top-k: candidates from the bucket equi-join, exact
    cosine rerank within candidates. Same output schema as the brute
    path so recall is directly measurable (tests/test_similarity.py
    measures it on planted-cluster data; tools/recall_report.py on the
    fixture — see the BASELINE.md note on recall vs data geometry)."""
    e = emb.withColumn("nrm", _norm("embedding"))
    udf = lsh_bucket_udf(seed, n_tables=n_tables, n_bits=n_bits, dim=dim)
    b = e.select("vec_id", "embedding", "nrm", F.explode(udf("embedding")).alias("bucket"))
    # bucket-size cap (see MAX_ANN_BUCKET): the size agg and filter
    # join reuse the bucket key the candidate join shuffles on
    small = (
        b.groupBy("bucket").agg(F.count("*").alias("m"))
        .filter(F.col("m") <= max_bucket).select("bucket")
    )
    b = b.join(small, "bucket")
    qb = b.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qemb"),
        F.col("nrm").alias("qnrm"),
        "bucket",
    )
    if probe_bits >= 1:
        # MULTI-PROBE (query-side only): also probe every bucket at
        # hamming distance 1 — a near neighbor that disagrees on one
        # hyperplane is still found. The corpus keeps ONE bucket per
        # table (no storage/shuffle growth); only the tiny broadcast
        # query side fans out ×(n_bits+1). Bucket ids pack the table
        # tag above bit n_bits, so flipping the low bits stays within
        # the same table.
        qb = qb.withColumn(
            "bucket",
            F.explode(
                F.array(
                    F.col("bucket"),
                    *[
                        F.col("bucket").bitwiseXOR(F.lit(1 << i))
                        for i in range(n_bits)
                    ],
                )
            ),
        )
    cand = (
        b.join(F.broadcast(qb), "bucket")
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "qemb", "qnrm", "vec_id", "embedding", "nrm")
        .distinct()
    )
    sim = cand.withColumn(
        "sim", _dot("embedding", "qemb") / (F.col("nrm") * F.col("qnrm"))
    ).withColumn("sim_e4", F.round(F.col("sim") * 10000).cast("long"))
    # quantized rank, same rationale as ann_cosine_topk
    w = W.partitionBy("qid").orderBy(F.desc("sim_e4"), F.asc("vec_id"))
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").cast("long").alias("query_id"),
            F.col("vec_id").alias("neighbor_id"),
            "sim_e4",
            F.col("rank").cast("long").alias("rank"),
        )
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-duplicate detection
# ---------------------------------------------------------------------------

NEARDUP_THRESHOLD = 0.40  # fixture embeddings are random (max pairwise cosine ~0.46)
NEARDUP_SCOPE = 300  # vec_id bound for the exact-oracle variant


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by embedding cosine >= NEARDUP_THRESHOLD within
    vec_id < NEARDUP_SCOPE (exact all-pairs; the LSH bucket join of
    ann_lsh_topk is the same plan's scale path — candidates from one
    equi-join instead of the cross product)."""
    e = _emb(spark, sf_dir).filter(F.col("vec_id") < NEARDUP_SCOPE).withColumn(
        "nrm", _norm("embedding")
    )
    a = e.select(
        F.col("vec_id").alias("va"), F.col("embedding").alias("ea"), F.col("nrm").alias("na")
    )
    b = e.select(
        F.col("vec_id").alias("vb"), F.col("embedding").alias("eb"), F.col("nrm").alias("nb")
    )
    return (
        a.join(F.broadcast(b), F.col("va") < F.col("vb"))
        .withColumn("sim", _dot("ea", "eb") / (F.col("na") * F.col("nb")))
        .withColumn("sim_e4", F.round(F.col("sim") * 10000).cast("long"))
        # threshold on the QUANTIZED sim so an ulp of summation-order
        # difference at the boundary can't flip pair membership
        .filter(F.col("sim_e4") >= int(NEARDUP_THRESHOLD * 10000))
        .select(
            F.col("va").alias("doc_a"),
            F.col("vb").alias("doc_b"),
            "sim_e4",
        )
        .orderBy("doc_a", "doc_b")
    )


def dedup_embedding_cosine_oracle() -> str:
    return f"""
WITH flat AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         CAST(unnest(embedding) AS DOUBLE) AS e
  FROM embeddings WHERE vec_id < {NEARDUP_SCOPE}
),
norms AS (SELECT vec_id, SQRT(SUM(e * e)) AS nrm FROM flat GROUP BY vec_id),
dots AS (
  SELECT a.vec_id AS va, b.vec_id AS vb, SUM(a.e * b.e) AS dot
  FROM flat a JOIN flat b ON a.i = b.i AND a.vec_id < b.vec_id
  GROUP BY 1, 2
),
sims AS (
  SELECT va, vb, dot / (na.nrm * nb.nrm) AS sim
  FROM dots JOIN norms na ON na.vec_id = va JOIN norms nb ON nb.vec_id = vb
),
quant AS (
  SELECT va, vb, CAST(ROUND(sim * 10000) AS BIGINT) AS sim_e4 FROM sims
)
SELECT va AS doc_a, vb AS doc_b, sim_e4
FROM quant WHERE sim_e4 >= {int(NEARDUP_THRESHOLD * 10000)}
ORDER BY doc_a, doc_b"""


def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup_embedding_lsh_df(_emb(spark, sf_dir))


def dedup_embedding_lsh_df(
    emb: DataFrame,
    threshold: float = NEARDUP_THRESHOLD,
    seed: int = 42,
    n_tables: int = LSH_TABLES,
    n_bits: int = LSH_BITS,
    dim: int = DIM,
    max_bucket: int = MAX_ANN_BUCKET,
) -> DataFrame:
    """Embedding near-dup pairs AT SCALE: candidates from the LSH
    bucket self-join (pairs sharing any of the n_tables buckets),
    exact quantized-cosine verification on candidates only. This is
    the scale route the exact all-pairs ``dedup_embedding_cosine`` is
    deliberately scoped away from: pair emission is bounded per bucket
    (max_bucket² worst case) instead of N², and the only shuffle is
    the bucket equi-join. Recall vs the exact pairs is pinned on
    clustered data in tests/test_similarity.py (near-dup corpora are
    clustered by construction — that is what makes them near-dups)."""
    e = emb.withColumn("nrm", _norm("embedding"))
    udf = lsh_bucket_udf(seed, n_tables=n_tables, n_bits=n_bits, dim=dim)
    b = e.select("vec_id", "embedding", "nrm", F.explode(udf("embedding")).alias("bucket"))
    small = (
        b.groupBy("bucket").agg(F.count("*").alias("m"))
        .filter(F.col("m") <= max_bucket).select("bucket")
    )
    b = b.join(small, "bucket")
    lhs = b.select(
        F.col("vec_id").alias("va"), F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"), "bucket",
    )
    rhs = b.select(
        F.col("vec_id").alias("vb"), F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"), "bucket",
    )
    cand = (
        lhs.join(rhs, "bucket")
        .filter(F.col("va") < F.col("vb"))
        .select("va", "ea", "na", "vb", "eb", "nb")
        .distinct()
    )
    return (
        cand.withColumn("sim", _dot("ea", "eb") / (F.col("na") * F.col("nb")))
        .withColumn("sim_e4", F.round(F.col("sim") * 10000).cast("long"))
        .filter(F.col("sim_e4") >= int(threshold * 10000))
        .select(F.col("va").alias("doc_a"), F.col("vb").alias("doc_b"), "sim_e4")
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# IVF scale path (k-means coarse quantizer + nprobe cell probing)
# ---------------------------------------------------------------------------

IVF_NLIST = 16
IVF_NPROBE = 4


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ann_ivf_topk_df(_emb(spark, sf_dir))


def ann_ivf_topk_df(
    emb: DataFrame,
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
    nlist: int = IVF_NLIST,
    nprobe: int = IVF_NPROBE,
    seed: int = 42,
    max_iter: int = 5,
) -> DataFrame:
    """IVF-flat approximate top-k: a k-means coarse quantizer assigns
    every vector to one of ``nlist`` cells; each query probes its
    ``nprobe`` nearest cells and is exactly re-ranked within them.

    The second scale path next to LSH: where hyperplane LSH is
    data-oblivious, IVF adapts its partitioning to the data's cluster
    structure — on clustered corpora it reaches the same recall from
    fewer candidates. At 100TB the quantizer trains on a SAMPLE (one
    pass), assignment is one map-side pass adding a cell id, and the
    candidate join is a cell-keyed equi-join; only the Q query vectors
    (small by contract, like the brute path's broadcast) and the nlist
    centroids touch the driver."""
    import numpy as np  # noqa: F811 (module alias for closure clarity)
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    v = emb.withColumn(
        "fv", array_to_vector(F.col("embedding").cast("array<double>"))
    )
    model = KMeans(
        k=nlist, seed=seed, maxIter=max_iter, featuresCol="fv", predictionCol="cell"
    ).fit(v)
    assigned = model.transform(v).select("vec_id", "embedding", "cell").withColumn(
        "nrm", _norm("embedding")
    )

    centroids = np.asarray([np.asarray(c) for c in model.clusterCenters()])
    cnorm = np.linalg.norm(centroids, axis=1)
    qrows = emb.filter(F.col("vec_id") < n_queries).collect()  # Q vectors only
    probe_pairs = []
    for r in qrows:
        qv = np.asarray(r["embedding"], dtype=np.float64)
        sims = centroids @ qv / (cnorm * np.linalg.norm(qv) + 1e-12)
        for cell in np.argsort(-sims)[:nprobe]:
            probe_pairs.append((int(r["vec_id"]), int(cell)))
    spark = emb.sparkSession
    probes = spark.createDataFrame(probe_pairs, "qid long, cell int")
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qemb"),
        _norm("embedding").alias("qnrm"),
    ).join(probes, "qid")

    cand = (
        assigned.join(F.broadcast(q), assigned["cell"] == q["cell"])
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "qemb", "qnrm", "vec_id", "embedding", "nrm")
        .distinct()
    )
    sim = cand.withColumn(
        "sim", _dot("embedding", "qemb") / (F.col("nrm") * F.col("qnrm"))
    ).withColumn("sim_e4", F.round(F.col("sim") * 10000).cast("long"))
    w = W.partitionBy("qid").orderBy(F.desc("sim_e4"), F.asc("vec_id"))
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").cast("long").alias("query_id"),
            F.col("vec_id").alias("neighbor_id"),
            "sim_e4",
            F.col("rank").cast("long").alias("rank"),
        )
        .orderBy("query_id", "rank")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "ann_cosine_topk": ann_cosine_topk,
        "ann_lsh_topk": ann_lsh_topk,  # no SQL oracle: rows-only check
        "ann_ivf_topk": ann_ivf_topk,  # no SQL oracle: rows-only check
        "dedup_embedding_cosine": dedup_embedding_cosine,
        "dedup_embedding_lsh": dedup_embedding_lsh,  # no SQL oracle: rows-only
    }


def oracle_sql() -> dict[str, str]:
    return {
        "ann_cosine_topk": ann_cosine_topk_oracle(),
        "dedup_embedding_cosine": dedup_embedding_cosine_oracle(),
    }
