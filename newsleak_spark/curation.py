"""Query-side parity operators not covered by the core BM25 path.

Each op re-expresses a reference behavior (citations into
/root/reference/) over the transcript payload, with a DuckDB oracle
built from the same shared transcripts derivation:

  F3  entity-id conjunction filter   ESRequestUtils.scala:339-343
  F4  keyword conjunction filter     ESRequestUtils.scala:345-349
  F6  time-expression range filter   ESRequestUtils.scala:355-362
  A4  paragraph split                SegmenterICU.java:194-212
  F9  doc-id + multi-field filter    ESRequestUtils.scala:110-128
  F10 match query (single field)     ESRequestUtils.scala:90-108
  F11 blacklist + merge post-filters EntityService.scala:274-305,351-373
  G2  keyword terms aggregation      AggregateService.scala:228-259
  G3  multi-facet aggregate-all      AggregateService.scala:174-177,315-328
  G4  typed entity aggregation       AggregateService.scala:180-188
  T2  from/size pagination           SearchHitIterator.scala:43-58
  U1-U3 boolean doc-set algebra      ESRequestUtils.scala:278-291,330-337
  J1  tags ⋈ labels                  DocumentService.scala:277-285
  J3  duplicates double self-join    EntityService.scala:404-416
  J4  hits ⋈ metadata enrichment     DocumentController.scala:318-343
  A9  keyterm extraction (LL keyness) KeytermExtractor.java:77-130
  A10 regex/dictionary extraction    DictionaryExtractor.java:41-54,111-143,184-230

Side tables (tags/labels/duplicates) don't exist in the transcript
payload, so they are DERIVED deterministically from the transcripts
table by shared SQL-expressible rules — both engines derive the exact
same rows, so join parity is by construction.

All plans are pure Catalyst; the small derived dims are broadcast.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from newsleak_spark.analysis import STANDARD_TOKEN_RE
from newsleak_spark.query import QuerySpec, bm25_topk, bm25_topk_oracle_sql
from newsleak_spark.transcripts import load_transcripts, transcripts_sql

_PRELUDE = f"WITH transcripts AS ({transcripts_sql('duckdb')}),\n"
_TOKS_SQL = f"regexp_extract_all(lower(text), '{STANDARD_TOKEN_RE}')"

_LABELS = [(0, "important"), (1, "todo"), (2, "done")]
_BLACKLIST = ["tool_0"]
_MERGES = [("tool_1", "tool_4")]  # duplicate -> focal alias fold


def _toks(text=None) -> F.Column:
    return F.regexp_extract_all(F.lower(text if text is not None else F.col("text")),
                                F.lit(STANDARD_TOKEN_RE), 0)


# ---------------------------------------------------------------------------
# F-filters
# ---------------------------------------------------------------------------

def f9_docs_multifield(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9: restrict to an explicit doc-id list, then OR of per-field
    membership predicates (content term | role | tool)."""
    ids = list(range(0, 200, 3))
    t = load_transcripts(spark, sf_dir)
    pred = (
        F.array_contains(_toks(), "table")
        | F.col("role").isin(["user"])
        | F.col("tool").isin(["tool_3"])
    )
    return t.filter(F.col("doc_id").isin(ids)).filter(pred).select("doc_id").orderBy("doc_id")


_F3_ENTITIES = ("tool_1", "tool_2")  # doc must carry ALL (bool AND of term filters)
_F4_KEYWORDS = ("merge", "window")


def f3_entity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: entity-id conjunction (ESRequestUtils.scala:339-343 — one
    term filter per id, ANDed: the doc must contain ALL of them). The
    transcript analog of a doc's entity set is its conversation's tool
    set; array_contains conjunction over the per-conv collected array."""
    t = load_transcripts(spark, sf_dir)
    ents = (
        t.filter(F.col("tool").isNotNull())
        .select("conv_id", "tool")
        .distinct()
        .groupBy("conv_id")
        .agg(F.collect_set("tool").alias("ents"))
    )
    pred = None
    for e in _F3_ENTITIES:
        c = F.array_contains("ents", e)
        pred = c if pred is None else (pred & c)
    return (
        t.join(ents, "conv_id")
        .filter(pred)
        .select("doc_id")
        .orderBy("doc_id")
    )


def f4_keyword_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: keyword-term conjunction (ESRequestUtils.scala:345-349) —
    unscored membership filter (unlike F1, which scores): the doc's
    analyzed token array must contain every keyword."""
    t = load_transcripts(spark, sf_dir)
    pred = None
    for kw in _F4_KEYWORDS:
        c = F.array_contains(_toks(), kw)
        pred = c if pred is None else (pred & c)
    return t.filter(pred).select("doc_id").orderBy("doc_id")


# F6 time-expression range filter (ESRequestUtils.scala:355-362): the
# reference filters on simple_time_expressions — normalized dates A11's
# temporal tagger extracted from the TEXT, stored as a per-doc date
# array, with exists(dates, d BETWEEN from AND to) semantics. A11
# itself is out of scope (SURVEY §7.4) and the fixture text carries no
# date strings, so the normalized date-array column is DERIVED by a
# deterministic shared rule (same mechanism as the J1/J3 side tables):
# doc_id % 3 + 1 dates spread over 2018-2021. The FILTER is the
# faithful part — an array-typed date column probed with exists().
F6_FROM, F6_TO = "2019-01-01", "2019-06-30"
_TIMEX_SPARK = (
    "transform(sequence(1, CAST(doc_id % 3 + 1 AS INT)), "
    "k -> date_add(DATE'2018-01-01', CAST((doc_id * 7 + k * 97) % 1460 AS INT)))"
)
_TIMEX_DUCK = (
    "list_transform(generate_series(1, CAST(doc_id % 3 + 1 AS INT)), "
    "k -> DATE '2018-01-01' + CAST((doc_id * 7 + k * 97) % 1460 AS INT))"
)


def f6_timex_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: docs whose time-expression array has a date in [from, to].
    Row-local exists() over the array — no explode, no shuffle; the
    filter runs inside whole-stage codegen right after the scan."""
    t = load_transcripts(spark, sf_dir).withColumn("timex", F.expr(_TIMEX_SPARK))
    hit = F.expr(f"exists(timex, d -> d BETWEEN DATE'{F6_FROM}' AND DATE'{F6_TO}')")
    return (
        t.filter(hit)
        .select("doc_id", F.size("timex").cast("long").alias("n_timex"))
        .orderBy("doc_id")
    )


def split_paragraphs(t: DataFrame) -> DataFrame:
    """A4 paragraph split (SegmenterICU.java:194-212): split each doc's
    text at newline runs into (doc_id, par_idx, par) rows with stable
    ordinals. Row-local posexplode — no shuffle, parallelism follows
    the doc partitioning."""
    return t.select(
        "doc_id", F.posexplode(F.split("text", "\\n+")).alias("par_idx", "par")
    )


def a4_paragraphs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 gate entry: paragraph ordinals + lengths for doc_id < 200.
    Transcript turns rarely contain newlines (usually 1 paragraph per
    turn); the multi-paragraph behavior is unit-tested on synthetic
    text (tests/test_analysis.py)."""
    t = load_transcripts(spark, sf_dir).filter(F.col("doc_id") < 200)
    return split_paragraphs(t).select(
        "doc_id",
        F.col("par_idx").cast("long").alias("par_idx"),
        F.length("par").cast("long").alias("n_chars"),
    ).orderBy("doc_id", "par_idx")


def f10_match_tool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10: match query on a single keyword field, size 100."""
    t = load_transcripts(spark, sf_dir)
    return (
        t.filter(F.col("tool") == "tool_3")
        .select("doc_id", "conv_id", "turn_idx")
        .orderBy("doc_id")
        .limit(100)
    )


def f11_blacklist_merge_facet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11: tool facet with blacklist (anti-join) and duplicate-merge
    (alias map-join folding tool_1 into its focal tool_4), then G1."""
    t = load_transcripts(spark, sf_dir)
    bl = spark.createDataFrame([(v,) for v in _BLACKLIST], "tool string")
    mg = spark.createDataFrame(_MERGES, "src string, dst string")
    folded = (
        t.filter(F.col("tool").isNotNull())
        .join(F.broadcast(bl), "tool", "left_anti")
        .join(F.broadcast(mg), F.col("tool") == F.col("src"), "left")
        .select(F.coalesce("dst", "tool").alias("value"))
    )
    return (
        folded.groupBy("value")
        .agg(F.count("*").alias("n_docs"))
        .orderBy(F.desc("n_docs"), F.asc("value"))
        .limit(50)
    )


# ---------------------------------------------------------------------------
# G-aggregations
# ---------------------------------------------------------------------------

def g2_keyterm_facet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2: doc-count per analyzed term over a filtered doc set (the
    KeyTerm bucket response), top 20."""
    t = load_transcripts(spark, sf_dir).filter(F.col("role") == "assistant")
    dt = t.select("doc_id", F.explode(_toks()).alias("term")).distinct()
    return (
        dt.groupBy("term")
        .agg(F.count("*").alias("n_docs"))
        .orderBy(F.desc("n_docs"), F.asc("term"))
        .limit(20)
    )


# Facet-key discovery exclusions: full-text and identifier-shaped
# columns are never terms-facetable (the reference keeps the same
# split — fulltext vs metadata fields).
FACET_KEY_EXCLUDE = {"text", "conv_id", "doc_id"}


def discover_facet_keys(t: DataFrame) -> list[str]:
    """Runtime facet-key discovery — the reference reads the metadata
    keys per dataset at request time (AggregateService.scala:174-177)
    rather than hardcoding them. Spark analog: every string-typed
    column of the (already-loaded) schema that is not full-text or an
    identifier. A metadata column added to the table shows up in the
    multi-facet output with no code change. Driver-side schema
    inspection only — no job."""
    return sorted(
        c for c, dt in t.dtypes if dt == "string" and c not in FACET_KEY_EXCLUDE
    )


def g3_facet_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3: one pass over the doc set producing every metadata facet
    (discovered at runtime; role + tool on this schema) as stacked
    (facet_key, value, n_docs) rows — the multi-terms-agg request
    expressed as a single explode + hash-agg."""
    t = load_transcripts(spark, sf_dir)
    keys = discover_facet_keys(t)
    kv = t.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(k).alias("facet_key"), F.col(k).alias("value"))
                    for k in keys
                ]
            )
        ).alias("kv")
    ).select("kv.facet_key", "kv.value").filter(F.col("value").isNotNull())
    return (
        kv.groupBy("facet_key", "value")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("facet_key", F.desc("n_docs"), F.asc("value"))
    )


def g4_typed_facet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G4: entity aggregation restricted to one type — facet over tool
    for turns whose role is 'tool' (the Entities<type> analog)."""
    t = load_transcripts(spark, sf_dir).filter(F.col("role") == "tool")
    return (
        t.filter(F.col("tool").isNotNull())
        .groupBy(F.col("tool").alias("value"))
        .agg(F.count("*").alias("n_docs"))
        .orderBy(F.desc("n_docs"), F.asc("value"))
        .limit(50)
    )


# ---------------------------------------------------------------------------
# T2 pagination / U set algebra
# ---------------------------------------------------------------------------

_T2_SPEC = QuerySpec(terms=("table",), k=40)  # pages of 20: ranks 21-40
_T2_PAGE = 20


def t2_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2: page 2 of a ranked query = top-(page·2) with ranks
    (page, 2·page]. The window runs over k rows only (post-limit)."""
    top = bm25_topk(load_transcripts(spark, sf_dir), _T2_SPEC)
    # Unpartitioned window → Spark's single-partition WindowExec
    # warning. Deliberate and bounded: the input is the ALREADY-LIMITED
    # top-k (≤ k·pages rows collected to one partition), never the
    # collection — ranking k rows on one task is the cheapest plan.
    w = W.orderBy(F.desc("score_e6"), F.asc("doc_id"))
    return (
        top.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") > _T2_PAGE)
        .select("doc_id", "score_e6", F.col("rank").cast("long").alias("rank"))
        .orderBy("rank")
    )


def u_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1-U3: doc-set AND / OR / NOT for two terms in one aggregation
    pass (per-doc membership booleans summed)."""
    t = load_transcripts(spark, sf_dir)
    d = t.select(
        F.array_contains(_toks(), "merge").alias("a"),
        F.array_contains(_toks(), "window").alias("b"),
    )
    li = lambda c: c.cast("long")
    return d.agg(
        F.sum(li(F.col("a") & F.col("b"))).alias("n_and"),
        F.sum(li(F.col("a") | F.col("b"))).alias("n_or"),
        F.sum(li(F.col("a") & ~F.col("b"))).alias("n_a_not_b"),
    )


# ---------------------------------------------------------------------------
# J-joins (derived side tables)
# ---------------------------------------------------------------------------

def _tags(t: DataFrame) -> DataFrame:
    """Derived tags: every 7th doc tagged with label_id = doc_id % 3."""
    return t.filter(F.col("doc_id") % 7 == 0).select(
        "doc_id", (F.col("doc_id") % 3).cast("int").alias("label_id")
    )


_TAGS_SQL = (
    "SELECT doc_id, CAST(doc_id % 3 AS INT) AS label_id "
    "FROM transcripts WHERE doc_id % 7 = 0"
)
_LABELS_SQL = "SELECT * FROM (VALUES " + ", ".join(
    f"({i}, '{n}')" for i, n in _LABELS
) + ") AS l(label_id, label)"


def j1_tags_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: tags INNER JOIN labels (broadcast dim)."""
    t = load_transcripts(spark, sf_dir)
    labels = spark.createDataFrame(_LABELS, "label_id int, label string")
    return (
        _tags(t)
        .join(F.broadcast(labels), "label_id")
        .select("doc_id", "label")
        .orderBy("doc_id")
    )


def j3_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: duplicates double self-join — derived duplicate mapping
    (doc folds into the head of its 10-block) joined twice against the
    doc table for both sides' attributes."""
    t = load_transcripts(spark, sf_dir)
    dups = (
        t.filter((F.col("doc_id") % 10 != 0) & (F.col("doc_id") < 100))
        .select(
            F.col("doc_id").alias("dup_id"),
            (F.col("doc_id") - F.col("doc_id") % 10).alias("focal_id"),
        )
    )
    e1 = t.select(F.col("doc_id").alias("dup_id"), F.col("role").alias("dup_role"))
    e2 = t.select(F.col("doc_id").alias("focal_id"), F.col("role").alias("focal_role"))
    return (
        dups.join(e1, "dup_id").join(e2, "focal_id")
        .select("dup_id", "focal_id", "dup_role", "focal_role")
        .orderBy("dup_id")
    )


_EDGE = ("tool_1", "tool_2")


def j6_edge_keyterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge keyterms (NetworkService.scala:226-230): the keyword facet
    of documents where BOTH endpoint entities of a network edge occur
    — convs using both tools, semi-joined twice, then G2 over their
    turns. Top 10."""
    t = load_transcripts(spark, sf_dir)
    tools = t.filter(F.col("tool").isNotNull()).select("conv_id", "tool").distinct()
    convs = (
        tools.filter(F.col("tool") == _EDGE[0])
        .select("conv_id")
        .join(tools.filter(F.col("tool") == _EDGE[1]).select("conv_id"), "conv_id", "left_semi")
    )
    docs = t.join(convs, "conv_id", "left_semi")
    dt = docs.select("doc_id", F.explode(_toks()).alias("term")).distinct()
    return (
        dt.groupBy("term")
        .agg(F.count("*").alias("n_docs"))
        .orderBy(F.desc("n_docs"), F.asc("term"))
        .limit(10)
    )


_J4_SPEC = QuerySpec(terms=("spark",), k=20)
_HL_SPEC = QuerySpec(terms=("merge",), k=10)


def highlight_col(text, words) -> F.Column:
    """Whole-doc highlight: word-boundary matches of ``words`` wrapped
    in <em> tags (DocumentService.scala:406-418: 0 fragments = whole
    doc, <em>). Shared by p2_highlight and api.get_docs."""
    pat = "(?i)\\b(" + "|".join(words) + ")\\b"
    return F.regexp_replace(text, pat, "<em>$1</em>")


def p2_highlight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2/getDocs highlight: top-k hits with the whole document
    highlighted."""
    t = load_transcripts(spark, sf_dir)
    hits = bm25_topk(t, _HL_SPEC)
    return (
        hits.join(t.select("doc_id", "text"), "doc_id")
        .select(
            "doc_id",
            "score_e6",
            highlight_col(F.col("text"), _HL_SPEC.terms).alias("highlighted"),
        )
        .orderBy(F.desc("score_e6"), F.asc("doc_id"))
    )


def j4_hits_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: the getDocs enrich step — top-k hits joined with metadata
    columns in one plan (replaces the ES→Postgres IN-list round trip)."""
    t = load_transcripts(spark, sf_dir)
    hits = bm25_topk(t, _J4_SPEC)
    return (
        hits.join(t.select("doc_id", "conv_id", "turn_idx", "role", "tool"), "doc_id")
        .orderBy(F.desc("score_e6"), F.asc("doc_id"))
    )


# ---------------------------------------------------------------------------
# A9 keyterm extraction (log-likelihood keyness)
# ---------------------------------------------------------------------------

A9_TOP_N = 15
A9_DOC_LIMIT = 30  # keyterms for doc_id < 30 (bounded oracle output)


def a9_keyterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: Dunning log-likelihood keyness of each doc's terms vs the
    rest of the collection, top-15 per doc (KeytermExtractor.java:77-130;
    n=15 per InformationExtraction2Postgres.java:342-343).

    LL = 2·(a·ln(a/E1) + b·ln(b/E2)), a = tf in doc, b = cf elsewhere,
    E1 = (a+b)·dl/T, E2 = (a+b)·(T-dl)/T; only positive keyness
    (a/dl > b/(T-dl)) kept.

    The collection-frequency table is joined on `term` WITHOUT a
    broadcast hint: cf has one row per vocabulary term (10^8-10^9 at
    100TB), so broadcasting it OOMs the driver. tf and cf both derive
    from the same term-keyed aggregation, so the shuffle join co-
    partitions naturally — and at small scale AQE still converts it to
    a broadcast at runtime from observed sizes. Only the 1-row totals
    frame is hint-broadcast.
    """
    t = load_transcripts(spark, sf_dir)
    ex = t.select("doc_id", F.explode(_toks()).alias("term"))
    tf = ex.groupBy("doc_id", "term").agg(F.count("*").cast("double").alias("a"))
    cf = ex.groupBy("term").agg(F.count("*").cast("double").alias("cf"))
    dl = ex.groupBy("doc_id").agg(F.count("*").cast("double").alias("dl"))
    total = ex.agg(F.count("*").cast("double").alias("t_tot"))

    j = (
        tf.filter(F.col("doc_id") < A9_DOC_LIMIT)
        .join(cf, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(total))
        .withColumn("b", F.col("cf") - F.col("a"))
        .withColumn("e1", (F.col("a") + F.col("b")) * F.col("dl") / F.col("t_tot"))
        .withColumn("e2", (F.col("a") + F.col("b")) * (F.col("t_tot") - F.col("dl")) / F.col("t_tot"))
        .withColumn(
            "ll",
            2.0
            * (
                F.col("a") * F.log(F.col("a") / F.col("e1"))
                + F.when(F.col("b") > 0, F.col("b") * F.log(F.col("b") / F.col("e2"))).otherwise(0.0)
            ),
        )
        .filter(F.col("a") / F.col("dl") > F.col("b") / (F.col("t_tot") - F.col("dl")))
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("ll"), F.asc("term"))
    return (
        j.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= A9_TOP_N)
        .select(
            "doc_id",
            "term",
            F.round(F.col("ll") * 10000).cast("long").alias("ll_e4"),
            F.col("rank").cast("long").alias("rank"),
        )
        .orderBy("doc_id", "rank")
    )


# ---------------------------------------------------------------------------
# A10 regex/dictionary extraction
# ---------------------------------------------------------------------------

# Typed extraction regexes (DictionaryExtractor.java:41-54 defines EMAIL/
# URL/IP/PHONE patterns). Kept to syntax shared by Java regex (Spark) and
# RE2 (DuckDB): no lookaround, no backrefs — parity by construction.
A10_PATTERNS = (
    ("EMAIL", r"[a-z0-9._%+\-]+@[a-z0-9.\-]+\.[a-z]{2,}"),
    ("URL", r"https?://[a-z0-9./_\-]+"),
    ("IP", r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"),
    ("PHONE", r"\+[0-9][0-9 \-]{7,}[0-9]"),
)
# Unigram dictionaries: analyzed-token equality (DictionaryExtractor.java:
# 111-143 matches stemmed-lowercase unigrams; oracle-parity mode uses the
# standard analyzer, same as every other shared-SQL op).
A10_UNIGRAMS = (
    ("spark", "TECH"),
    ("merge", "SQLOP"),
    ("window", "SQLOP"),
    ("stream", "SQLOP"),
)
# Multi-word-unit dict entry matched on token adjacency
# (DictionaryExtractor.java:184-230): counted per token WINDOW
# (toks[i..i+1] == MWU), so adjacent repeats each count — a regex scan
# over the space-joined stream consumes the shared boundary space and
# undercounts "... fast table fast table ...".
A10_MWU = ("fast", "table")
A10_DOC_LIMIT = 300


def a10_dict_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10: typed regex + dictionary extraction over doc_id < 300,
    one scan — per-type extraction arrays are struct-tagged, concatenated
    and exploded in a single pass, then counted per (doc, type, value)."""
    t = load_transcripts(spark, sf_dir).filter(F.col("doc_id") < A10_DOC_LIMIT)
    base = t.select(
        "doc_id",
        F.lower("text").alias("lt"),
        F.regexp_extract_all(F.lower("text"), F.lit(STANDARD_TOKEN_RE), 0).alias("tk"),
    )

    mwu_phrase = " ".join(A10_MWU)
    n_mwu = len(A10_MWU)
    # sliding token windows equal to the MWU → one 'fast table' entry
    # per adjacency (adjacent repeats each count)
    mwu_arr = F.expr(
        f"CASE WHEN size(tk) >= {n_mwu} THEN "
        f"filter(transform(sequence(0, size(tk) - {n_mwu}), "
        f"i -> array_join(slice(tk, i + 1, {n_mwu}), ' ')), s -> s = '{mwu_phrase}') "
        "ELSE array() END"
    )

    def tag(typ: str, arr: F.Column) -> F.Column:
        return F.transform(
            arr, lambda v: F.struct(F.lit(typ).alias("ext_type"), v.alias("value"))
        )

    parts = [
        tag(typ, F.regexp_extract_all("lt", F.lit(pat), 0)) for typ, pat in A10_PATTERNS
    ]
    parts.append(tag("MWU", mwu_arr))
    ex = base.select("doc_id", F.explode(F.concat(*parts)).alias("e")).select(
        "doc_id", "e.ext_type", "e.value"
    )
    toks = base.select("doc_id", F.explode("tk").alias("value"))
    dic = spark.createDataFrame(list(A10_UNIGRAMS), "value string, ext_type string")
    dict_hits = toks.join(F.broadcast(dic), "value").select("doc_id", "ext_type", "value")
    return (
        ex.unionByName(dict_hits)
        .groupBy("doc_id", "ext_type", "value")
        .agg(F.count("*").alias("n"))
        .orderBy("doc_id", "ext_type", "value")
    )


def _a10_oracle() -> str:
    mwu_phrase = " ".join(A10_MWU)
    n_mwu = len(A10_MWU)
    regex_selects = "\n  UNION ALL ".join(
        f"SELECT doc_id, '{typ}' AS ext_type, unnest(regexp_extract_all(lt, '{pat}')) AS value FROM base"
        for typ, pat in A10_PATTERNS
    )
    dic_vals = ", ".join(f"('{v}', '{c}')" for v, c in A10_UNIGRAMS)
    return (
        _PRELUDE
        + "base AS (SELECT doc_id, lower(text) AS lt,\n"
        + f"         regexp_extract_all(lower(text), '{STANDARD_TOKEN_RE}') AS tk\n"
        + f"         FROM transcripts WHERE doc_id < {A10_DOC_LIMIT}),\n"
        + "ex AS (\n  " + regex_selects + "\n"
        + "  UNION ALL SELECT doc_id, 'MWU', unnest(\n"
        + f"    CASE WHEN len(tk) >= {n_mwu} THEN list_filter(\n"
        + f"      [array_to_string(tk[i + 1 : i + {n_mwu}], ' ') FOR i IN range(len(tk) - {n_mwu} + 1)],\n"
        + f"      s -> s = '{mwu_phrase}')\n"
        + "    ELSE [] END) FROM base\n"
        + "  UNION ALL SELECT doc_id, d.ext_type, t.value\n"
        + "    FROM (SELECT doc_id, unnest(tk) AS value FROM base) t\n"
        + f"    JOIN (VALUES {dic_vals}) AS d(value, ext_type) USING (value)\n"
        + ")\n"
        + "SELECT doc_id, ext_type, value, COUNT(*) AS n FROM ex\n"
        + "GROUP BY doc_id, ext_type, value ORDER BY doc_id, ext_type, value"
    )


# ---------------------------------------------------------------------------
# registry + oracles
# ---------------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "f3_entity_filter": f3_entity_filter,
        "f4_keyword_filter": f4_keyword_filter,
        "f6_timex_range": f6_timex_range,
        "a4_paragraphs": a4_paragraphs,
        "f9_docs_multifield": f9_docs_multifield,
        "f10_match_tool": f10_match_tool,
        "f11_blacklist_merge_facet": f11_blacklist_merge_facet,
        "g2_keyterm_facet": g2_keyterm_facet,
        "g3_facet_all": g3_facet_all,
        "g4_typed_facet": g4_typed_facet,
        "t2_pagination": t2_pagination,
        "u_set_algebra": u_set_algebra,
        "j1_tags_labels": j1_tags_labels,
        "j3_duplicates": j3_duplicates,
        "j4_hits_metadata": j4_hits_metadata,
        "j6_edge_keyterms": j6_edge_keyterms,
        "p2_highlight": p2_highlight,
        "a9_keyterms": a9_keyterms,
        "a10_dict_extract": a10_dict_extract,
    }


def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {}
    ent_conds = "\n  AND ".join(
        f"conv_id IN (SELECT conv_id FROM tl WHERE tool = '{e}')" for e in _F3_ENTITIES
    )
    o["f3_entity_filter"] = (
        _PRELUDE
        + "tl AS (SELECT DISTINCT conv_id, tool FROM transcripts WHERE tool IS NOT NULL)\n"
        + f"SELECT doc_id FROM transcripts\nWHERE {ent_conds}\nORDER BY doc_id"
    )
    kw_conds = " AND ".join(
        f"list_contains({_TOKS_SQL}, '{kw}')" for kw in _F4_KEYWORDS
    )
    o["f4_keyword_filter"] = (
        _PRELUDE.rstrip(",\n")
        + f"\nSELECT doc_id FROM transcripts WHERE {kw_conds} ORDER BY doc_id"
    )
    o["f6_timex_range"] = (
        _PRELUDE
        + f"tx AS (SELECT doc_id, {_TIMEX_DUCK} AS timex FROM transcripts)\n"
        + "SELECT doc_id, CAST(len(timex) AS BIGINT) AS n_timex FROM tx\n"
        + f"WHERE len(list_filter(timex, d -> d BETWEEN DATE '{F6_FROM}' AND DATE '{F6_TO}')) > 0\n"
        + "ORDER BY doc_id"
    )
    o["a4_paragraphs"] = (
        _PRELUDE
        + "p AS (SELECT doc_id, string_split_regex(text, '\\n+') AS pars\n"
        + "      FROM transcripts WHERE doc_id < 200)\n"
        + "SELECT doc_id, CAST(i AS BIGINT) AS par_idx,\n"
        + "       CAST(len(pars[i + 1]) AS BIGINT) AS n_chars\n"
        + "FROM p, UNNEST(range(len(pars))) AS u(i)\n"
        + "ORDER BY doc_id, par_idx"
    )
    ids = ", ".join(str(i) for i in range(0, 200, 3))
    o["f9_docs_multifield"] = (
        _PRELUDE
        + f"f AS (SELECT doc_id FROM transcripts WHERE doc_id IN ({ids})\n"
        + f"  AND (list_contains({_TOKS_SQL}, 'table') OR role IN ('user') OR tool IN ('tool_3')))\n"
        + "SELECT doc_id FROM f ORDER BY doc_id"
    )
    o["f10_match_tool"] = (
        _PRELUDE.rstrip(",\n")
        + "\nSELECT doc_id, conv_id, turn_idx FROM transcripts WHERE tool = 'tool_3'\n"
        + "ORDER BY doc_id LIMIT 100"
    )
    bl = ", ".join(f"'{v}'" for v in _BLACKLIST)
    merge_case = "CASE " + " ".join(
        f"WHEN tool = '{s}' THEN '{d}'" for s, d in _MERGES
    ) + " ELSE tool END"
    o["f11_blacklist_merge_facet"] = (
        _PRELUDE
        + f"folded AS (SELECT {merge_case} AS value FROM transcripts\n"
        + f"           WHERE tool IS NOT NULL AND tool NOT IN ({bl}))\n"
        + "SELECT value, COUNT(*) AS n_docs FROM folded GROUP BY value\n"
        + "ORDER BY n_docs DESC, value ASC LIMIT 50"
    )
    o["g2_keyterm_facet"] = (
        _PRELUDE
        + f"dt AS (SELECT DISTINCT doc_id, unnest({_TOKS_SQL}) AS term\n"
        + "       FROM transcripts WHERE role = 'assistant')\n"
        + "SELECT term, COUNT(*) AS n_docs FROM dt GROUP BY term\n"
        + "ORDER BY n_docs DESC, term ASC LIMIT 20"
    )
    o["g3_facet_all"] = (
        _PRELUDE
        + "kv AS (SELECT 'role' AS facet_key, role AS value FROM transcripts\n"
        + "       UNION ALL SELECT 'tool', tool FROM transcripts)\n"
        + "SELECT facet_key, value, COUNT(*) AS n_docs FROM kv WHERE value IS NOT NULL\n"
        + "GROUP BY facet_key, value ORDER BY facet_key, n_docs DESC, value ASC"
    )
    o["g4_typed_facet"] = (
        _PRELUDE.rstrip(",\n")
        + "\nSELECT tool AS value, COUNT(*) AS n_docs FROM transcripts\n"
        + "WHERE role = 'tool' AND tool IS NOT NULL GROUP BY tool\n"
        + "ORDER BY n_docs DESC, value ASC LIMIT 50"
    )
    o["t2_pagination"] = (
        f"SELECT doc_id, score_e6, CAST(ROW_NUMBER() OVER "
        f"(ORDER BY score_e6 DESC, doc_id ASC) AS BIGINT) AS rank\n"
        f"FROM ({bm25_topk_oracle_sql(_T2_SPEC)}) top\n"
        f"QUALIFY rank > {_T2_PAGE} ORDER BY rank"
    )
    o["u_set_algebra"] = (
        _PRELUDE
        + f"d AS (SELECT list_contains({_TOKS_SQL}, 'merge') AS a,\n"
        + f"             list_contains({_TOKS_SQL}, 'window') AS b FROM transcripts)\n"
        # outer CASTs: DuckDB's SUM(BIGINT) returns HUGEINT, which
        # hash-mismatches Spark's bigint at the driver even though the
        # values are equal (round-1 gate failure)
        + "SELECT CAST(SUM(CAST(a AND b AS BIGINT)) AS BIGINT) AS n_and,\n"
        + "       CAST(SUM(CAST(a OR b AS BIGINT)) AS BIGINT) AS n_or,\n"
        + "       CAST(SUM(CAST(a AND NOT b AS BIGINT)) AS BIGINT) AS n_a_not_b FROM d"
    )
    o["j1_tags_labels"] = (
        _PRELUDE
        + f"tags AS ({_TAGS_SQL}),\nlabels AS ({_LABELS_SQL})\n"
        + "SELECT doc_id, label FROM tags JOIN labels USING (label_id) ORDER BY doc_id"
    )
    o["j3_duplicates"] = (
        _PRELUDE
        + "dups AS (SELECT doc_id AS dup_id, doc_id - doc_id % 10 AS focal_id\n"
        + "         FROM transcripts WHERE doc_id % 10 <> 0 AND doc_id < 100)\n"
        + "SELECT dup_id, focal_id, e1.role AS dup_role, e2.role AS focal_role\n"
        + "FROM dups JOIN transcripts e1 ON e1.doc_id = dup_id\n"
        + "          JOIN transcripts e2 ON e2.doc_id = focal_id\n"
        + "ORDER BY dup_id"
    )
    o["j4_hits_metadata"] = (
        _PRELUDE.rstrip(",\n")
        + f"\n, hits AS ({bm25_topk_oracle_sql(_J4_SPEC)})\n"
        + "SELECT h.doc_id, h.score_e6, t.conv_id, t.turn_idx, t.role, t.tool\n"
        + "FROM hits h JOIN transcripts t USING (doc_id)\n"
        + "ORDER BY score_e6 DESC, doc_id ASC"
    )
    o["j6_edge_keyterms"] = (
        _PRELUDE
        + "tl AS (SELECT DISTINCT conv_id, tool FROM transcripts WHERE tool IS NOT NULL),\n"
        + f"convs AS (SELECT conv_id FROM tl WHERE tool = '{_EDGE[0]}'\n"
        + f"          INTERSECT SELECT conv_id FROM tl WHERE tool = '{_EDGE[1]}'),\n"
        + "dt AS (SELECT DISTINCT doc_id, unnest(" + _TOKS_SQL + ") AS term\n"
        + "       FROM transcripts WHERE conv_id IN (SELECT conv_id FROM convs))\n"
        + "SELECT term, COUNT(*) AS n_docs FROM dt GROUP BY term\n"
        + "ORDER BY n_docs DESC, term ASC LIMIT 10"
    )
    hl_pat = "(?i)\\b(" + "|".join(_HL_SPEC.terms) + ")\\b"
    o["p2_highlight"] = (
        _PRELUDE.rstrip(",\n")
        + f"\n, hits AS ({bm25_topk_oracle_sql(_HL_SPEC)})\n"
        + "SELECT h.doc_id, h.score_e6,\n"
        + f"       regexp_replace(t.text, '{hl_pat}', '<em>\\1</em>', 'g') AS highlighted\n"
        + "FROM hits h JOIN transcripts t USING (doc_id)\n"
        + "ORDER BY score_e6 DESC, doc_id ASC"
    )
    o["a9_keyterms"] = (
        _PRELUDE
        + f"ex AS (SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM transcripts),\n"
        + "tf AS (SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS a FROM ex GROUP BY 1, 2),\n"
        + "cf AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS cf FROM ex GROUP BY 1),\n"
        + "dl AS (SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS dl FROM ex GROUP BY 1),\n"
        + "tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS t_tot FROM ex),\n"
        + "j AS (\n"
        + "  SELECT tf.doc_id, tf.term, a, cf - a AS b, dl, t_tot,\n"
        + "         (a + (cf - a)) * dl / t_tot AS e1,\n"
        + "         (a + (cf - a)) * (t_tot - dl) / t_tot AS e2\n"
        + f"  FROM tf JOIN cf USING (term) JOIN dl USING (doc_id) CROSS JOIN tot\n"
        + f"  WHERE tf.doc_id < {A9_DOC_LIMIT}\n"
        + "),\n"
        + "ll AS (\n"
        + "  SELECT doc_id, term,\n"
        + "         2.0 * (a * ln(a / e1) + CASE WHEN b > 0 THEN b * ln(b / e2) ELSE 0.0 END) AS ll\n"
        + "  FROM j WHERE a / dl > b / (t_tot - dl)\n"
        + "),\n"
        + "r AS (SELECT doc_id, term, ll,\n"
        + "             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY ll DESC, term ASC) AS rank\n"
        + "      FROM ll)\n"
        + f"SELECT doc_id, term, CAST(ROUND(ll * 10000) AS BIGINT) AS ll_e4,\n"
        + f"       CAST(rank AS BIGINT) AS rank FROM r WHERE rank <= {A9_TOP_N}\n"
        + "ORDER BY doc_id, rank"
    )
    o["a10_dict_extract"] = _a10_oracle()
    return o
