"""Large-scale training-data pipeline ops over the ``documents`` table.

These extend the reference's text-analysis surface (SURVEY §2.2) with
the operations a 100TB corpus pipeline needs. Everything is pure
Catalyst (built-in functions, hash-aggs, self-joins) — no Python in the
hot path — and every op has a DuckDB-oracle twin built from the same
normalized token expression (analysis.STANDARD_TOKEN_RE).

Ops:
  dedup_exact        content-hash groups (md5 of normalized token join)
  dedup_ngram_jaccard  3-gram shingle self-join → exact Jaccard pairs
  dedup_minhash_lsh  MinHash signatures (lexicographic min of md5-salted
                     shingle hashes) → banded LSH bucket join → pairs
  dedup_cluster      connected components over the LSH pair graph
                     (large-star/small-star) → canonical doc per cluster
  dedup_corpus       the apply step: per-doc keep/drop decision
                     (exact_dup < near_dup < kept precedence)
  dedup_simhash      16-bit SimHash from md5 nibbles (tf-weighted)
  lang_id            char-trigram profile language ID (Cavnar-Trenkle)
  quality_score      length / TTR / stopword-ratio quality features
  token_count        whitespace + BPE-ish regex token counts
  fingerprint        document fingerprint (md5 of canonical token form)
  a7_not_fulltext    newsleak's boilerplate flag (SegmenterICU.java:223-266)
  stratified_sample  deterministic train/eval split + per-language
                     downsampling by content-stable hash (map-only)
  ngram_counts       corpus bigram counts, deterministic top-100
  decontaminate      benchmark n-gram leak detection (eval-set overlap)
  redact_terms       sensitive-term redaction (regex pass + fingerprint)
  domain_mix         per-(source, lang) mixture composition report

Scale notes: shingle/minhash self-joins are bounded by distinct() on
(doc, key) before the join, by the SHINGLE_DF_CAP document-frequency
filter (a shingle in m docs fans the join out m² — boilerplate shingles
are dropped before the self-join), and by the MAX_BUCKET cap on LSH
band buckets (pair emission within a bucket is m²). Both caps filter on
the SAME key the subsequent join shuffles on, so no extra partitioning
is introduced; AQE skew-join splits whatever moderate skew remains.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from newsleak_spark.analysis import STANDARD_TOKEN_RE

N_MINHASH = 12
BAND_SIZE = 3
JACCARD_THRESHOLD = 0.4
# A shingle present in more than this many docs is boilerplate: it
# carries no dedup signal, and the shingle self-join would emit m² pair
# rows for it — quadratic on exactly the data dedup targets. Dropping
# it bounds every join group at DF_CAP (Jaccard is then computed over
# the informative-shingle universe, identically in both engines).
SHINGLE_DF_CAP = 1000
# Same quadratic-guard for LSH buckets: a band bucket with more than
# this many members (boilerplate cluster) is skipped; its near-dup mass
# is already found by dedup_exact / the other bands. Bounds per-bucket
# pair emission at MAX_BUCKET².
MAX_BUCKET = 200

_EN_STOP = "the a and of to in is it that was".split()
_ES_STOP = "el la de que y en un los se del".split()
_DE_STOP = "der die das und ist ein nicht mit sich auf".split()

# --- A8 char-trigram language profiles ------------------------------------
# Cavnar & Trenkle, "N-Gram-Based Text Categorization" (1994) — the
# public technique behind most heuristic language ID; the reference
# uses an OpenNLP MaxEnt model over the first 3,000 chars
# (annotator/LanguageDetector.java:116-138). The profiles are derived
# at import time from the pinned seed paragraphs below (deterministic:
# count trigrams, top N by (count desc, gram asc), integer weight
# PROFILE_SIZE - rank) so the classifier is fully transparent, needs no
# model artifact, and stays integer-exact for the DuckDB oracle.
# Seeds are ASCII (accents transliterated): the normalizer strips
# everything outside [a-z ] identically in both engines.
_LANG_SEEDS = {
    "en": (
        "the quick brown fox jumps over the lazy dog and runs into the woods. "
        "this is a short message about the weather and the news of the day. "
        "we are going to the market in the morning with our friends. "
        "she said that it was the best thing that could have happened. "
        "there is nothing more important than being able to think for yourself. "
        "what do you want to do when the work is finished tonight. "
        "they have been working on this project for more than three years. "
        "it would be better if everyone could agree on what should happen next. "
        "in the evening the children played games in the garden behind the house. "
        "he opened the window and looked out over the quiet city streets. "
        "many people believe that reading books makes life richer and fuller. "
        "the train arrived late because of the heavy snow in the mountains."
    ),
    "es": (
        "el perro corre por el parque con los ninos de la escuela. "
        "esta es una historia sobre la vida en la ciudad y sus calles. "
        "vamos a la playa por la manana con nuestros amigos para nadar. "
        "ella dijo que era lo mejor que podia haber pasado en su vida. "
        "no hay nada mas importante que poder pensar por uno mismo. "
        "que quieres hacer cuando termine el trabajo esta noche. "
        "han estado trabajando en este proyecto durante mas de tres anos. "
        "seria mejor que todos estuvieran de acuerdo en lo que debe pasar. "
        "por la tarde los ninos jugaban en el jardin detras de la casa. "
        "abrio la ventana y miro las calles tranquilas de la ciudad. "
        "mucha gente cree que leer libros hace la vida mas rica y plena. "
        "el tren llego tarde por la nieve intensa en las montanas."
    ),
    "de": (
        "der hund lauft durch den park mit den kindern aus der schule. "
        "das ist eine geschichte uber das leben in der stadt und ihren strassen. "
        "wir gehen am morgen mit unseren freunden an den strand zum schwimmen. "
        "sie sagte dass es das beste war was passieren konnte. "
        "es gibt nichts wichtigeres als selbst denken zu koennen. "
        "was willst du machen wenn die arbeit heute abend fertig ist. "
        "sie arbeiten seit mehr als drei jahren an diesem projekt. "
        "es waere besser wenn sich alle einig waeren was als naechstes geschehen soll. "
        "am abend spielten die kinder im garten hinter dem haus verstecken. "
        "er oeffnete das fenster und schaute auf die stillen strassen der stadt. "
        "viele menschen glauben dass das lesen von buechern das leben reicher macht. "
        "der zug kam wegen des starken schnees in den bergen zu spaet an."
    ),
}
PROFILE_SIZE = 96
LANG_ID_PREFIX = 3000  # reference reads the first 3,000 chars


def _lang_normalize_py(s: str) -> str:
    import re

    return re.sub(" +", " ", re.sub("[^a-z ]", " ", s.lower()))


def lang_profiles() -> list[tuple[str, str, int]]:
    """(lang, trigram, weight) rows — deterministic from the seeds."""
    from collections import Counter

    out: list[tuple[str, str, int]] = []
    for lang in sorted(_LANG_SEEDS):
        txt = _lang_normalize_py(_LANG_SEEDS[lang])
        counts = Counter(txt[i : i + 3] for i in range(len(txt) - 2))
        top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:PROFILE_SIZE]
        out.extend((lang, g, PROFILE_SIZE - r) for r, (g, _n) in enumerate(top))
    return out


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _toks(text=None) -> F.Column:
    if text is None:
        text = F.col("text")
    return F.regexp_extract_all(F.lower(text), F.lit(STANDARD_TOKEN_RE), 0)


_TOKS_SQL = f"regexp_extract_all(lower(text), '{STANDARD_TOKEN_RE}')"


def _shingle_arr(n: int = 3) -> F.Column:
    """array<string> of DISTINCT n-gram shingles of the ``toks`` column.

    Distinctness is per-document, so array_distinct inside the row does
    it — no global distinct() shuffle (the naive explode→distinct plan
    shuffles the entire shingle stream for keys that are already
    row-local)."""
    return F.expr(
        f"CASE WHEN size(toks) >= {n} THEN array_distinct("
        f"transform(sequence(0, size(toks) - {n}), i -> array_join(slice(toks, i + 1, {n}), ' '))) "
        "ELSE array() END"
    )


def _shingles(df: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, sh) distinct n-gram shingles of the normalized tokens."""
    return df.select("doc_id", F.explode(_shingle_arr(n)).alias("sh"))


_SHINGLES_SQL = f"""
sh AS (
  SELECT DISTINCT doc_id, t[i + 1] || ' ' || t[i + 2] || ' ' || t[i + 3] AS sh
  FROM (SELECT doc_id, {_TOKS_SQL} AS t FROM documents) x,
       UNNEST(range(GREATEST(len(t) - 2, 0))) AS u(i)
)"""


# ---------------------------------------------------------------------------

def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: one row per content fingerprint with group size and
    the kept (min) doc_id. At scale: single hash-agg on the fingerprint."""
    d = _docs(spark, sf_dir).select("doc_id", _toks().alias("toks"))
    return (
        d.select("doc_id", F.md5(F.array_join("toks", " ")).alias("fp"))
        .groupBy("fp")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keep_doc_id"))
        .orderBy("fp")
    )


def dedup_ngram_jaccard(
    spark: SparkSession, sf_dir: str, df_cap: int = SHINGLE_DF_CAP
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (threshold 0.4) via shingle
    self-join over shingles with document frequency <= df_cap.

    The df filter is the scale guard: without it, one shingle shared by
    m docs fans the equi-join out to m² rows. The df agg and the filter
    join both shuffle on `sh` — the same key the self-join needs — so
    the plan stays a single sh-partitioned pipeline. Sizes are counted
    over the SAME capped shingle set, so the result is the exact
    Jaccard of the informative-shingle sets (oracle in lockstep)."""
    d = _docs(spark, sf_dir).select("doc_id", _toks().alias("toks"))
    all_sh = _shingles(d)
    keep = (
        all_sh.groupBy("sh")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= df_cap)
        .select("sh")
    )
    sh = all_sh.join(keep, "sh")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    j = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jac", F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter")))
        .filter(F.col("jac") >= JACCARD_THRESHOLD)
    )
    return j.select(
        "doc_a", "doc_b", F.round(F.col("jac") * 10000).cast("long").alias("jaccard_e4")
    ).orderBy("doc_a", "doc_b")


def dedup_minhash_lsh(
    spark: SparkSession, sf_dir: str, max_bucket: int = MAX_BUCKET
) -> DataFrame:
    """MinHash+LSH candidate pairs.

    Signature h_i(doc) = lexicographic min of md5(shingle || '#' || i) —
    md5 is identical in Spark and DuckDB, so the oracle reproduces the
    signatures exactly. Bands of BAND_SIZE rows are hashed and pairs are
    found with ONE equi-join on (band, band_key): the shingle→minhash→
    band→bucket-join plan that replaces an O(n²) all-pairs comparison.
    """
    d = _docs(spark, sf_dir).select("doc_id", _toks().alias("toks"))
    sh = _shingles(d)
    # whole signature in ONE groupBy(doc_id): per-shingle row of the
    # N_MINHASH salted hashes, element-wise MIN via N wide agg exprs
    # with map-side partial aggregation — the shuffle carries one
    # 12-wide row per doc, not |shingles|·N expanded rows. (A fully
    # map-side array_min(transform(shs, ...)) form is SLOWER: projection
    # collapse inlines the shingle-array build into every signature
    # column, and lambda expressions are excluded from common-
    # subexpression elimination, so it recomputes the shingling N times.)
    hs = sh.select(
        "doc_id",
        *[
            F.md5(F.concat_ws("#", "sh", F.lit(str(i)))).alias(f"h{i}")
            for i in range(N_MINHASH)
        ],
    )
    sig = hs.groupBy("doc_id").agg(
        *[F.min(f"h{i}").alias(f"mh{i}") for i in range(N_MINHASH)]
    )
    n_bands = N_MINHASH // BAND_SIZE
    band_structs = [
        F.struct(
            F.lit(b).cast("long").alias("band"),
            F.md5(
                F.concat_ws(
                    "|", *[f"mh{i}" for i in range(b * BAND_SIZE, (b + 1) * BAND_SIZE)]
                )
            ).alias("band_key"),
        )
        for b in range(n_bands)
    ]
    bands = sig.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("bk")
    ).select("doc_id", "bk.band", "bk.band_key")
    # bucket-size cap: a hot bucket (boilerplate cluster of m docs)
    # would emit m² pair rows; skip buckets above MAX_BUCKET. The size
    # agg and filter join share the (band, band_key) shuffle key with
    # the pair join below — one partitioning end to end.
    small = (
        bands.groupBy("band", "band_key")
        .agg(F.count("*").alias("m"))
        .filter(F.col("m") <= max_bucket)
        .select("band", "band_key")
    )
    bands = bands.join(small, ["band", "band_key"])
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    return pairs.orderBy("doc_a", "doc_b")


def connected_components(edges: DataFrame, max_iter: int = 15) -> DataFrame:
    """Distributed connected components over an edge DataFrame
    ``(u, v)`` (any orientation, self-loops ignored) via alternating
    large-star / small-star contraction (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14 — public algorithm).

    Returns ``(node, comp)`` with ``comp`` = the minimum node id of the
    component. Each half-round is ONE groupBy(u) + ONE equi-join on u —
    both shuffle on the same key, so a round is a single partitioning —
    and converges in O(log² n) rounds (near-dup graphs, which are
    unions of LSH-bucket cliques, converge in 2-3). The edge set lives
    entirely in DataFrames (no driver-side graph, no collect); lineage
    is truncated per round with localCheckpoint so the plan does not
    grow with the iteration count. Fixpoint is detected by a monotone
    (count, xxhash-sum) signature: star labels only ever decrease, so a
    stable signature means a stable edge set.
    """

    def _canon(e: DataFrame) -> DataFrame:
        return (
            e.filter(F.col("u") != F.col("v"))
            .select(F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b"))
            .distinct()
        )

    cur = _canon(edges).localCheckpoint()
    prev_sig = None
    for _ in range(max_iter):
        # large-star: every node links its strictly-greater neighbors
        # to m(u) = min(N(u) ∪ {u})
        sym = cur.select(F.col("a").alias("u"), F.col("b").alias("v")).union(
            cur.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        m_ls = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mv"))
            .select("u", F.least("mv", F.col("u")).alias("m"))
        )
        ls = _canon(
            sym.filter(F.col("v") > F.col("u"))
            .join(m_ls, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        # small-star: orient edges larger→smaller; every node links its
        # smaller neighbors (and itself) to the minimum
        ori = ls.select(F.col("b").alias("u"), F.col("a").alias("v"))
        m_ss = ori.groupBy("u").agg(F.min("v").alias("m"))
        ss = ori.join(m_ss, "u").select(F.col("v").alias("u"), F.col("m").alias("v")).union(
            m_ss.select(F.col("u"), F.col("m").alias("v"))
        )
        cur = _canon(ss).localCheckpoint()
        sig = cur.agg(
            F.count("*").alias("n"),
            F.sum(F.xxhash64("a", "b").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        if prev_sig == (sig["n"], sig["h"]):
            break
        prev_sig = (sig["n"], sig["h"])
    # converged edge set is a union of stars (root = component min);
    # min-agg once more so a non-converged max_iter exit still yields a
    # consistent (if unconverged) labeling rather than duplicate rows
    labels = (
        cur.select(F.col("b").alias("node"), F.col("a").alias("comp"))
        .union(cur.select(F.col("a").alias("node"), F.col("a").alias("comp")))
        .groupBy("node")
        .agg(F.min("comp").alias("comp"))
    )
    return labels


def dedup_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate CLUSTERS from the MinHash-LSH candidate pairs:
    the step that turns pairwise dup evidence into a deduplicated
    corpus. Connected components (large-star/small-star, above) over
    the pair graph; each clustered doc maps to its cluster minimum
    (the kept canonical), with the cluster size and a keep flag.

    At 100 TB this is the only sound way to apply pairwise dedup: the
    pair relation is not transitive-closed (a≈b, b≈c but a,c never
    co-bucketed), so keep/drop decisions on raw pairs double-drop or
    double-keep; the component labeling makes one decision per cluster.
    """
    pairs = dedup_minhash_lsh(spark, sf_dir)
    labels = connected_components(
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    )
    sizes = labels.groupBy("comp").agg(F.count("*").alias("n_docs"))
    return (
        labels.join(sizes, "comp")
        .select(
            F.col("node").alias("doc_id"),
            F.col("comp").alias("cluster_id"),
            "n_docs",
            (F.col("node") == F.col("comp")).alias("is_keep"),
        )
        .orderBy("doc_id")
    )


def dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup APPLY step: one keep/drop decision per document,
    combining exact-hash groups and near-dup clusters.

    Deterministic precedence: a doc that is not the minimum of its
    content-fingerprint group is `exact_dup`; else a clustered doc
    that is not its cluster's canonical is `near_dup`; else `kept`.
    This is the row a 100-TB pipeline writes back next to the corpus
    (keep flags, not a filtered copy) — downstream readers anti-join
    or filter on it. Plan: one fp-keyed hash-agg + the CC labeling +
    two doc_id-keyed joins; nothing quadratic, nothing driver-side.
    """
    d = _docs(spark, sf_dir).select("doc_id", _toks().alias("toks"))
    fp = d.select("doc_id", F.md5(F.array_join("toks", " ")).alias("fp"))
    keepfp = fp.groupBy("fp").agg(F.min("doc_id").alias("keep_id"))
    exact = fp.join(keepfp, "fp").select("doc_id", "keep_id")
    labels = connected_components(
        dedup_minhash_lsh(spark, sf_dir).select(
            F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
        )
    ).select(F.col("node").alias("doc_id"), F.col("comp").alias("cluster_id"))
    reason = (
        F.when(F.col("doc_id") != F.col("keep_id"), F.lit("exact_dup"))
        .when(
            F.col("cluster_id").isNotNull() & (F.col("cluster_id") != F.col("doc_id")),
            F.lit("near_dup"),
        )
        .otherwise(F.lit("kept"))
    )
    return (
        exact.join(labels, "doc_id", "left")
        .select("doc_id", reason.alias("reason"))
        .withColumn("keep", F.col("reason") == "kept")
        .orderBy("doc_id")
    )


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash per doc, tf-weighted, bits from md5 nibbles.

    bit_b(term) = bit (3 - b%4) of hex nibble (1 + b/4) of md5(term);
    simhash = Σ 2^b · [Σ_t tf(t) · (2·bit_b(t) − 1) > 0].
    """
    d = _docs(spark, sf_dir).select("doc_id", F.explode(_toks()).alias("term"))
    tf = d.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    # one md5 per posting row and 16 wide agg exprs — no ×16 row
    # expansion, no (doc, bit)-keyed shuffle; signs derived from the
    # hash nibbles inline (hex digit (1 + b/4), bit (3 - b%4))
    nib = [
        F.instr(F.lit("0123456789abcdef"), F.substring(F.md5("term"), q + 1, 1)) - 1
        for q in range(4)
    ]
    signed = tf.select(
        "doc_id",
        *[
            (
                F.col("tf")
                * (2 * (F.floor(nib[b // 4] / F.lit(2 ** (3 - b % 4))) % 2).cast("int") - 1)
            ).alias(f"c{b}")
            for b in range(16)
        ],
    )
    sums = signed.groupBy("doc_id").agg(
        *[F.sum(f"c{b}").alias(f"s{b}") for b in range(16)]
    )
    simhash = sums.select(
        "doc_id",
        sum(
            [F.when(F.col(f"s{b}") > 0, F.lit(float(2**b))).otherwise(F.lit(0.0)) for b in range(16)],
            F.lit(0.0),
        )
        .cast("long")
        .alias("simhash16"),
    )
    return simhash.orderBy("doc_id")


SAMPLE_SALT = "nlsp"
EVAL_E4 = 1000  # 10% eval carve, content-stable
# per-language mixture rates (basis points kept); unlisted = keep all.
# The dominant language is downsampled — the standard mixture-control
# move a training pipeline applies before tokenization.
LANG_RATE_E4 = {"en": 6000}


def _hash_u(col: F.Column, salt: str) -> F.Column:
    """Deterministic uniform [0, 10000) from md5 — identical in Spark
    and DuckDB, so sampling decisions are reproducible across engines,
    reruns, and cluster sizes (no RNG, no partition dependence)."""
    h = F.md5(F.concat_ws("#", col.cast("string"), F.lit(salt)))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % 10000


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/eval split + per-language stratified
    downsampling by content-stable hash.

    Two independent hash draws per doc: one carves a fixed eval slice
    (never downsampled — eval must stay representative), one thins the
    train side to the per-stratum rate. Pure row-local expressions —
    at 100 TB this is a map-only scan with zero shuffles (the orderBy
    here is gate determinism only); the same doc lands in the same
    split at any scale or partitioning because the draw depends only
    on doc_id.
    """
    d = _docs(spark, sf_dir).select("doc_id", "source", "lang")
    us = _hash_u(F.col("doc_id"), SAMPLE_SALT + "-split")
    uk = _hash_u(F.col("doc_id"), SAMPLE_SALT + "-keep")
    rate = F.lit(10000)
    for lang, r in LANG_RATE_E4.items():
        rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)
    split = F.when(us < EVAL_E4, F.lit("eval")).otherwise(F.lit("train"))
    return (
        d.withColumn("split", split)
        .filter((F.col("split") == "eval") | (uk < rate))
        .select("doc_id", "source", "lang", "split")
        .orderBy("doc_id")
    )


NGRAM_TOP = 100


def ngram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram counts, top-100 by (count desc, gram asc).

    explode → hash-agg on the gram (map-side partial agg) → TakeOrdered
    top-k: no full sort, one shuffle keyed on the gram. The total-order
    tie-break makes the limit deterministic for the parity gate.
    """
    d = _docs(spark, sf_dir).select(_toks().alias("toks"))
    grams = d.select(
        F.explode(
            F.expr(
                "CASE WHEN size(toks) >= 2 THEN transform("
                "sequence(0, size(toks) - 2), i -> concat(toks[i], ' ', toks[i + 1])) "
                "ELSE CAST(array() AS ARRAY<STRING>) END"
            )
        ).alias("gram")
    )
    return (
        grams.groupBy("gram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("gram"))
        .limit(NGRAM_TOP)
    )


def _lang_grams(text_col: str = "text"):
    """Char trigrams of the normalized first LANG_ID_PREFIX chars —
    the exact expression the DuckDB oracle mirrors (1-based substring
    in both engines; regexp_replace global in both)."""
    norm = (
        f"regexp_replace(regexp_replace(lower(substring({text_col}, 1, "
        f"{LANG_ID_PREFIX})), '[^a-z ]', ' '), ' +', ' ')"
    )
    return F.expr(
        f"CASE WHEN length({norm}) >= 3 THEN "
        f"transform(sequence(1, length({norm}) - 2), i -> substring({norm}, i, 3)) "
        "ELSE CAST(array() AS ARRAY<STRING>) END"
    )


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 language ID: char-trigram profile classifier (Cavnar &
    Trenkle 1994) over the first 3,000 chars — the reference's OpenNLP
    MaxEnt (LanguageDetector.java:116-138) re-expressed as a pinned,
    SQL-exact profile scorer. Doc trigrams join the broadcast profile
    table; score = Σ weight per language; argmax with ties →
    lexicographically first lang; zero profile hits → 'und'.
    Row-local + one broadcast join + one hash-agg: no data-scale
    shuffle beyond the per-doc aggregation."""
    prof = spark.createDataFrame(lang_profiles(), "lang string, gram string, w int")
    d = _docs(spark, sf_dir).select("doc_id", F.explode(_lang_grams()).alias("gram"))
    hits = (
        d.join(F.broadcast(prof), "gram")
        .groupBy("doc_id", "lang")
        .agg(F.sum("w").alias("s"))
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("doc_id").orderBy(F.desc("s"), F.asc("lang"))
    best = hits.withColumn("rk", F.row_number().over(w)).filter("rk = 1").select("doc_id", "lang")
    docs = _docs(spark, sf_dir).select("doc_id")
    return (
        docs.join(best, "doc_id", "left")
        .select("doc_id", F.coalesce("lang", F.lit("und")).alias("pred_lang"))
        .orderBy("doc_id")
    )


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality features: token count, type/token ratio, stopword ratio."""
    stops = F.array(*[F.lit(w) for w in _EN_STOP])
    d = _docs(spark, sf_dir).select("doc_id", _toks().alias("toks"))
    return (
        d.select(
            "doc_id",
            F.size("toks").cast("long").alias("n_tokens"),
            F.when(
                F.size("toks") > 0,
                F.round(F.size(F.array_distinct("toks")) / F.size("toks") * 10000),
            )
            .otherwise(0)
            .cast("long")
            .alias("ttr_e4"),
            F.when(
                F.size("toks") > 0,
                F.round(
                    F.size(F.expr(f"filter(toks, t -> array_contains(array({','.join(repr(w) for w in _EN_STOP)}), t))"))
                    / F.size("toks")
                    * 10000
                ),
            )
            .otherwise(0)
            .cast("long")
            .alias("stop_e4"),
        )
        .orderBy("doc_id")
    )


def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokens + BPE-ish regex tokens (letter runs / single
    digits / single punctuation)."""
    bpe_re = "[a-z]+|[0-9]|[^a-z0-9 ]"
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.size(F.split(F.trim("text"), " +")).cast("long").alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(bpe_re), 0)).cast("long").alias("bpe_tokens"),
    ).orderBy("doc_id")


def fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical document fingerprint: md5 of the normalized token join
    (first 16 hex chars)."""
    d = _docs(spark, sf_dir).select("doc_id", _toks().alias("toks"))
    return d.select(
        "doc_id", F.substring(F.md5(F.array_join("toks", " ")), 1, 16).alias("fp16")
    ).orderBy("doc_id")


# Deterministic "benchmark/eval set" stand-in for decontamination:
# every 97th doc plays the held-out benchmark whose n-grams must not
# leak into training data.
CONTAM_BENCH_MOD = 97
CONTAM_NGRAM = 4

# Redaction blocklist (the PII-redaction op shape: the fixture text
# carries no emails/IPs, so the blocklist is term-based — the regex
# machinery is identical, word-boundary alternation → placeholder).
REDACT_TERMS = ("customer", "key", "vector")
REDACT_TOKEN = "<redacted>"


def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data decontamination: flag docs sharing at least one
    distinct CONTAM_NGRAM-gram with the benchmark set (doc_id %
    CONTAM_BENCH_MOD == 0), with the overlap count. One equi-join on
    the shingle key; the benchmark side is eval-set-sized (bounded in
    practice), so Catalyst broadcasts it from stats at small scale and
    shuffle-joins at large — no hint either way. Benchmark docs are
    not self-flagged."""
    d = _docs(spark, sf_dir).select("doc_id", _toks().alias("toks"))
    sh = _shingles(d, n=CONTAM_NGRAM)
    bench = (
        sh.filter(F.col("doc_id") % CONTAM_BENCH_MOD == 0)
        .select("sh")
        .distinct()
    )
    return (
        sh.filter(F.col("doc_id") % CONTAM_BENCH_MOD != 0)
        .join(bench, "sh")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_contaminated_ngrams"))
        .orderBy("doc_id")
    )


def redact_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sensitive-term redaction: replace every word-boundary occurrence
    of the blocklist with REDACT_TOKEN in one regexp_replace pass;
    emit the redaction count and a fingerprint of the redacted text
    (the PII-scrub pipeline stage — row-local, no shuffle)."""
    pat = r"\b(" + "|".join(REDACT_TERMS) + r")\b"
    d = _docs(spark, sf_dir)
    red = F.regexp_replace(F.col("text"), pat, REDACT_TOKEN)
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(pat), 0)).cast("long").alias("n_redacted"),
        F.substring(F.md5(red), 1, 16).alias("redacted_fp16"),
    ).orderBy("doc_id")


def domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture report: per (source, lang) doc count, token
    mass and mean doc length — the composition table a data pipeline
    checks before sampling a mixture. One hash-agg (map-side partial),
    facet-shaped output."""
    d = _docs(spark, sf_dir).select(
        "source", "lang", F.size(_toks()).cast("long").alias("n_tokens")
    )
    return (
        d.groupBy("source", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
            F.floor(F.avg("n_tokens")).cast("long").alias("mean_tokens"),
        )
        .orderBy("source", "lang")
    )


def a7_not_fulltext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 boilerplate flag: >100 tokens and TTR < 0.1."""
    d = _docs(spark, sf_dir).select("doc_id", _toks().alias("toks"))
    return d.select(
        "doc_id",
        (
            (F.size("toks") > 100)
            & (F.size(F.array_distinct("toks")) / F.size("toks") < 0.1)
        ).alias("not_fulltext"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# registry + oracles
# ---------------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "dedup_exact": dedup_exact,
        "dedup_ngram_jaccard": dedup_ngram_jaccard,
        "dedup_minhash_lsh": dedup_minhash_lsh,
        "dedup_cluster": dedup_cluster,
        "dedup_corpus": dedup_corpus,
        "dedup_simhash": dedup_simhash,
        "stratified_sample": stratified_sample,
        "ngram_counts": ngram_counts,
        "lang_id": lang_id,
        "quality_score": quality_score,
        "token_count": token_count,
        "fingerprint": fingerprint,
        "a7_not_fulltext": a7_not_fulltext,
        "decontaminate": decontaminate,
        "redact_terms": redact_terms,
        "domain_mix": domain_mix,
    }


def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {}
    o["dedup_exact"] = f"""
SELECT md5(array_to_string({_TOKS_SQL}, ' ')) AS fp,
       COUNT(*) AS n_docs, MIN(doc_id) AS keep_doc_id
FROM documents GROUP BY 1 ORDER BY fp"""

    o["dedup_ngram_jaccard"] = f"""
WITH {_SHINGLES_SQL.strip()},
keep AS (SELECT sh FROM sh GROUP BY sh HAVING COUNT(*) <= {SHINGLE_DF_CAP}),
shc AS (SELECT s.doc_id, s.sh FROM sh s JOIN keep USING (sh)),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shc GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM shc a JOIN shc b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       CAST(ROUND(n_inter * 10000.0 / (sa.n_sh + sb.n_sh - n_inter)) AS BIGINT) AS jaccard_e4
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter) >= {JACCARD_THRESHOLD}
ORDER BY doc_a, doc_b"""

    # MinHash CTE chain shared by the pairs op and the cluster op
    minhash_ctes = f"""{_SHINGLES_SQL.strip()},
sig AS (
  SELECT doc_id, i, MIN(md5(sh || '#' || CAST(i AS VARCHAR))) AS mh
  FROM sh, UNNEST(range({N_MINHASH})) AS u(i)
  GROUP BY doc_id, i
),
bands AS (
  SELECT doc_id, CAST(FLOOR(i / {BAND_SIZE}) AS BIGINT) AS band,
         md5(string_agg(mh, '|' ORDER BY i)) AS band_key
  FROM sig GROUP BY doc_id, 2
),
small AS (
  SELECT band, band_key FROM bands GROUP BY band, band_key
  HAVING COUNT(*) <= {MAX_BUCKET}
),
bc AS (SELECT b.* FROM bands b JOIN small USING (band, band_key)),
mh_pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bc a JOIN bc b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
)"""

    o["dedup_minhash_lsh"] = f"""
WITH {minhash_ctes}
SELECT doc_a, doc_b FROM mh_pairs ORDER BY doc_a, doc_b"""

    # connected components over the pair graph: min-reachable-node
    # label via recursive reachability (small clusters, so enumerating
    # (node, reachable) pairs is cheap at oracle scale)
    cc_ctes = f"""{minhash_ctes},
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM mh_pairs
  UNION ALL SELECT doc_b, doc_a FROM mh_pairs
),
reach(node, comp) AS (
  SELECT DISTINCT u, u FROM edges
  UNION
  SELECT e.v, r.comp FROM reach r JOIN edges e ON e.u = r.node
),
lbl AS (SELECT node AS doc_id, MIN(comp) AS cluster_id FROM reach GROUP BY node)"""

    o["dedup_cluster"] = f"""
WITH RECURSIVE {cc_ctes},
sz AS (SELECT cluster_id, COUNT(*) AS n_docs FROM lbl GROUP BY cluster_id)
SELECT l.doc_id, l.cluster_id, sz.n_docs, l.doc_id = l.cluster_id AS is_keep
FROM lbl l JOIN sz USING (cluster_id) ORDER BY doc_id"""

    o["dedup_corpus"] = f"""
WITH RECURSIVE {cc_ctes},
fp AS (
  SELECT doc_id, md5(array_to_string({_TOKS_SQL}, ' ')) AS fp FROM documents
),
keepfp AS (SELECT fp, MIN(doc_id) AS keep_id FROM fp GROUP BY fp),
dec AS (
  SELECT f.doc_id,
         CASE WHEN f.doc_id <> k.keep_id THEN 'exact_dup'
              WHEN l.cluster_id IS NOT NULL AND l.cluster_id <> f.doc_id THEN 'near_dup'
              ELSE 'kept' END AS reason
  FROM fp f JOIN keepfp k USING (fp)
  LEFT JOIN lbl l ON l.doc_id = f.doc_id
)
SELECT doc_id, reason, reason = 'kept' AS keep FROM dec ORDER BY doc_id"""

    o["dedup_simhash"] = f"""
WITH tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM (
    SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents
  ) GROUP BY doc_id, term
),
contrib AS (
  SELECT doc_id, b,
         tf * (2 * (CAST(FLOOR(
            (instr('0123456789abcdef', substr(md5(term), CAST(FLOOR(b / 4) AS INT) + 1, 1)) - 1)
            / POW(2, 3 - b % 4)) AS INT) % 2) - 1) AS c
  FROM tf, UNNEST(range(16)) AS u(b)
),
bits AS (
  SELECT doc_id, b, CASE WHEN SUM(c) > 0 THEN POW(2, b) ELSE 0 END AS bitval
  FROM contrib GROUP BY doc_id, b
)
SELECT doc_id, CAST(SUM(bitval) AS BIGINT) AS simhash16
FROM bits GROUP BY doc_id ORDER BY doc_id"""

    rate_case = "CASE " + " ".join(
        f"WHEN lang = '{lang}' THEN {r}" for lang, r in LANG_RATE_E4.items()
    ) + " ELSE 10000 END"
    o["stratified_sample"] = f"""
WITH s AS (
  SELECT doc_id, source, lang,
    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || '#{SAMPLE_SALT}-split'), 1, 8)) AS UBIGINT) % 10000 AS us,
    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || '#{SAMPLE_SALT}-keep'), 1, 8)) AS UBIGINT) % 10000 AS uk
  FROM documents
)
SELECT doc_id, source, lang,
       CASE WHEN us < {EVAL_E4} THEN 'eval' ELSE 'train' END AS split
FROM s
WHERE us < {EVAL_E4} OR uk < {rate_case}
ORDER BY doc_id"""

    o["ngram_counts"] = f"""
SELECT gram, COUNT(*) AS n FROM (
  SELECT t[i + 1] || ' ' || t[i + 2] AS gram
  FROM (SELECT {_TOKS_SQL} AS t FROM documents) x,
       UNNEST(range(GREATEST(len(t) - 1, 0))) AS u(i)
) GROUP BY gram ORDER BY n DESC, gram ASC LIMIT {NGRAM_TOP}"""

    prof_vals = ", ".join(
        f"('{lang}', '{gram.replace(chr(39), chr(39) * 2)}', {w})"
        for lang, gram, w in lang_profiles()
    )
    o["lang_id"] = f"""
WITH prof(lang, gram, w) AS (VALUES {prof_vals}),
d AS (
  SELECT doc_id,
         regexp_replace(regexp_replace(lower(substr(text, 1, {LANG_ID_PREFIX})),
                        '[^a-z ]', ' ', 'g'), ' +', ' ', 'g') AS t
  FROM documents
),
g AS (
  SELECT doc_id, substr(t, CAST(i AS INT) + 1, 3) AS gram
  FROM d, UNNEST(range(GREATEST(len(t) - 2, 0))) AS u(i)
),
hits AS (
  SELECT doc_id, lang, SUM(w) AS s FROM g JOIN prof USING (gram) GROUP BY doc_id, lang
),
best AS (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY s DESC, lang ASC) AS rk
  FROM hits
)
SELECT d2.doc_id, COALESCE(b.lang, 'und') AS pred_lang
FROM documents d2 LEFT JOIN (SELECT doc_id, lang FROM best WHERE rk = 1) b USING (doc_id)
ORDER BY d2.doc_id"""

    stop_list = ", ".join(f"'{w}'" for w in _EN_STOP)
    o["quality_score"] = f"""
WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(CASE WHEN len(toks) > 0
            THEN ROUND(len(list_distinct(toks)) * 10000.0 / len(toks)) ELSE 0 END AS BIGINT) AS ttr_e4,
       CAST(CASE WHEN len(toks) > 0
            THEN ROUND(len(list_filter(toks, x -> list_contains([{stop_list}], x))) * 10000.0 / len(toks))
            ELSE 0 END AS BIGINT) AS stop_e4
FROM t ORDER BY doc_id"""

    o["token_count"] = """
SELECT doc_id,
       CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9 ]')) AS BIGINT) AS bpe_tokens
FROM documents ORDER BY doc_id"""

    o["fingerprint"] = f"""
SELECT doc_id, substr(md5(array_to_string({_TOKS_SQL}, ' ')), 1, 16) AS fp16
FROM documents ORDER BY doc_id"""

    o["a7_not_fulltext"] = f"""
WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents)
SELECT doc_id,
       (len(toks) > 100 AND len(list_distinct(toks)) * 1.0 / len(toks) < 0.1) AS not_fulltext
FROM t ORDER BY doc_id"""

    n = CONTAM_NGRAM
    joined = " || ' ' || ".join(f"t[i + {j + 1}]" for j in range(n))
    o["decontaminate"] = f"""
WITH sh AS (
  SELECT DISTINCT doc_id, {joined} AS sh
  FROM (SELECT doc_id, {_TOKS_SQL} AS t FROM documents) x,
       UNNEST(range(GREATEST(len(t) - {n - 1}, 0))) AS u(i)
),
bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id % {CONTAM_BENCH_MOD} = 0)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_contaminated_ngrams
FROM sh JOIN bench USING (sh)
WHERE doc_id % {CONTAM_BENCH_MOD} <> 0
GROUP BY doc_id ORDER BY doc_id"""

    pat = r"\b(" + "|".join(REDACT_TERMS) + r")\b"
    o["redact_terms"] = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS n_redacted,
       substr(md5(regexp_replace(text, '{pat}', '{REDACT_TOKEN}', 'g')), 1, 16) AS redacted_fp16
FROM documents ORDER BY doc_id"""

    o["domain_mix"] = f"""
SELECT source, lang, COUNT(*) AS n_docs,
       CAST(SUM(n) AS BIGINT) AS sum_tokens,
       CAST(FLOOR(AVG(n)) AS BIGINT) AS mean_tokens
FROM (SELECT source, lang, len({_TOKS_SQL}) AS n FROM documents)
GROUP BY 1, 2 ORDER BY 1, 2"""
    return o
