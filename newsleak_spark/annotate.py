"""A11 temporal tagging + A12 NER as deterministic rule annotators.

The reference enriches documents with HeidelTime temporal tagging
(annotator/HeidelTimeOpenNLP.java, ~2877 LoC of rules; normalization
and plausibility filtering in writer/NewsleakTimeFormatter.java:63-160)
and NER via an external HTTP microservice
(annotator/NerMicroservice.java:81,107-189 — PER/ORG/LOC plus an
implausible-entity cleanup pass). Neither a rule corpus of that size
nor an NLP model server exists in this container, so both are rebuilt
as COMPACT deterministic rule sets — a documented deviation: the
*pipeline shape* (per-doc annotation → normalized values → plausibility
filter → entity/date tables feeding F3/F6/G4 and the S5 upsert-as-agg
sink) is the faithful part; the rule inventory is a representative
subset, not HeidelTime.

Scale shape: both annotators are row-local regexp extraction over the
text column — pure JVM expressions inside whole-stage codegen, no
shuffle, no UDF, parallelism follows the scan. The only shuffle is the
final frequency aggregation (map-side partial agg on (type, entity)).

Parity: every expression is built from ONE dialect template
(transcripts.py pattern) rendered for Spark SQL and DuckDB, so the
oracle reproduces the annotator by construction. The regex subset used
((?i), \\b, \\s, [0-9], non-capturing groups) behaves identically in
Java regex and RE2.

Granularity, like the reference's SimpleTimeExpression: day
(yyyy-MM-dd), month (yyyy-MM), year (yyyy) — with coarser values
suppressed when a finer value they prefix is present, and calendar
plausibility enforced via try_cast-to-DATE plus an 1900-2099 window
(NewsleakTimeFormatter.java:105-131 keeps only plausible normalized
dates).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# dialect helpers
# ---------------------------------------------------------------------------

def _rx(dialect: str, pat: str) -> str:
    """Quoted SQL regex literal. Spark's SQL parser processes backslash
    escapes inside string literals ('\\b' would become BACKSPACE);
    DuckDB's does not — so the same pattern needs \\\\ doubling for
    Spark only. Centralized here so parity can't drift per-pattern."""
    if dialect == "spark":
        pat = pat.replace("\\", "\\\\")
    return "'" + pat + "'"


_D = {
    "spark": {
        "extract_all": lambda s, p: f"regexp_extract_all({s}, {_rx('spark', p)}, 0)",
        "transform": lambda a, f: f"transform({a}, x -> {f})",
        "filter": lambda a, f: f"filter({a}, x -> {f})",
        "exists": lambda a, f: f"exists({a}, y -> {f})",
        "concat": lambda *a: "concat(" + ", ".join(a) + ")",
        "distinct": lambda a: f"array_distinct({a})",
        "sort": lambda a: f"array_sort({a})",
    },
    "duckdb": {
        "extract_all": lambda s, p: f"regexp_extract_all({s}, {_rx('duckdb', p)})",
        "transform": lambda a, f: f"list_transform({a}, x -> {f})",
        "filter": lambda a, f: f"list_filter({a}, x -> {f})",
        "exists": lambda a, f: f"len(list_filter({a}, y -> {f})) > 0",
        "concat": lambda *a: "(" + " || ".join(a) + ")",  # list_concat is binary-only
        "distinct": lambda a: f"list_distinct({a})",
        "sort": lambda a: f"list_sort({a})",
    },
}

_MONTHS = [
    "january", "february", "march", "april", "may", "june",
    "july", "august", "september", "october", "november", "december",
]
# abbreviated forms, optional trailing period ("Mar", "Sep.", "Sept.");
# ordered longest-first within a stem so backtracking engines and RE2
# agree on viable alternatives ("sept" before "sep")
_MONTH_ABBRS = [
    ("jan", 1), ("feb", 2), ("mar", 3), ("apr", 4), ("may", 5), ("jun", 6),
    ("jul", 7), ("aug", 8), ("sept", 9), ("sep", 9), ("oct", 10),
    ("nov", 11), ("dec", 12),
]
# full names first: alternation must prefer "march" over its "mar" prefix
_MONTH_ALT = "|".join(_MONTHS + [a + r"\.?" for a, _ in _MONTH_ABBRS])
# month surface → number: re-extract the letter run from the MATCHED
# text (engine-independent of which alternative matched it)
_MONTH_CASE = (
    "CASE lower(regexp_extract(x, '(?i)([a-z]+)', 1)) "
    + " ".join(
        f"WHEN '{m}' THEN '{i + 1:02d}'" for i, m in enumerate(_MONTHS)
    )
    + " "
    + " ".join(f"WHEN '{a}' THEN '{n:02d}'" for a, n in _MONTH_ABBRS)
    + " END"
)

# surface-form patterns (A11 rule subset) — single-backslash form;
# _rx() handles dialect quoting
_P_ISO = r"\b[0-9]{4}-[0-9]{2}-[0-9]{2}\b"
_P_ISO_SLASH = r"\b[0-9]{4}/[0-9]{2}/[0-9]{2}\b"
_P_MDY = rf"(?i)\b(?:{_MONTH_ALT})\s+[0-9]{{1,2}},\s*[0-9]{{4}}\b"
_P_DMY = rf"(?i)\b[0-9]{{1,2}}\s+(?:{_MONTH_ALT})\s+[0-9]{{4}}\b"
_P_MY = rf"(?i)\b(?:{_MONTH_ALT})\s+[0-9]{{4}}\b"
_P_Y = r"\b(?:19|20)[0-9]{2}\b"


def timex_sql(dialect: str, txt: str) -> str:
    """Normalized, plausibility-filtered, granularity-deduped, sorted
    date-expression array for a text column — one expression, shared
    template (reference: TimeX3 → SimpleTimeExpression values)."""
    d = _D[dialect]
    day_num = "lpad(regexp_extract(x, '([0-9]{1,2})', 1), 2, '0')"
    year = "right(x, 4)"

    iso = d["extract_all"](txt, _P_ISO)
    iso_slash = d["transform"](
        d["extract_all"](txt, _P_ISO_SLASH), "replace(x, '/', '-')"
    )
    mdy = d["transform"](
        d["extract_all"](txt, _P_MDY),
        f"{year} || '-' || {_MONTH_CASE} || '-' || {day_num}",
    )
    dmy = d["transform"](
        d["extract_all"](txt, _P_DMY),
        f"{year} || '-' || {_MONTH_CASE} || '-' || {day_num}",
    )
    days = d["concat"](iso, iso_slash, mdy, dmy)
    # calendar plausibility (leap years included via the date cast) +
    # the reference's plausible-year window
    days = d["filter"](
        days,
        "try_cast(x AS DATE) IS NOT NULL AND x >= '1900-01-01' AND x <= '2099-12-31'",
    )
    days = d["distinct"](days)

    months = d["transform"](
        d["extract_all"](txt, _P_MY), f"{year} || '-' || {_MONTH_CASE}"
    )
    months = d["filter"](
        d["distinct"](months),
        f"x >= '1900-01' AND x <= '2099-12' AND NOT {d['exists']('__days', 'left(y, 7) = x')}",
    )
    years = d["filter"](
        d["distinct"](d["extract_all"](txt, _P_Y)),
        f"NOT {d['exists']('__days', 'left(y, 4) = x')} "
        f"AND NOT {d['exists']('__months', 'left(y, 4) = x')}",
    )
    # inline the day/month arrays where the suppression filters refer to them
    months = months.replace("__days", days)
    years = years.replace("__days", days).replace("__months", months)
    return d["sort"](d["concat"](days, months, years))


# ---------------------------------------------------------------------------
# A12: NER rule subset (PER by honorific, ORG by legal suffix, LOC by
# gazetteer) + implausible-entity cleanup
# ---------------------------------------------------------------------------

_LOC_GAZETTEER = [
    "Berlin", "Hamburg", "Paris", "London", "Madrid", "Vienna",
    "Oslo", "Cairo", "Lima", "Tokyo", "Geneva", "Nairobi",
]
_P_PER = r"\b(?:Mr|Mrs|Ms|Dr|Prof)\.\s+([A-Z][a-z]+(?:\s+[A-Z][a-z]+)?)"
_P_ORG = r"\b([A-Z][A-Za-z]*(?:\s+[A-Z][A-Za-z]*)?\s+(?:Corp|Inc|Ltd|GmbH|LLC))\b"
_P_LOC = rf"\b({'|'.join(_LOC_GAZETTEER)})\b"


def _extract_group_all(dialect: str, txt: str, pat: str) -> str:
    # both engines support group-1 extraction in extract_all
    return f"regexp_extract_all({txt}, {_rx(dialect, pat)}, 1)"


def ner_sql(dialect: str, txt: str, ent_type: str) -> str:
    """Entity-surface array for one type, cleaned: whitespace runs
    collapsed, entities with digits or <3 chars dropped
    (NerMicroservice.java:148-189 implausibility cleanup analog)."""
    d = _D[dialect]
    pat = {"PER": _P_PER, "ORG": _P_ORG, "LOC": _P_LOC}[ent_type]
    arr = _extract_group_all(dialect, txt, pat)
    ws = _rx(dialect, r"\s+")
    if dialect == "duckdb":
        arr = d["transform"](arr, f"regexp_replace(x, {ws}, ' ', 'g')")
        arr = d["filter"](arr, "length(x) >= 3 AND NOT regexp_matches(x, '[0-9]')")
    else:
        arr = d["transform"](arr, f"regexp_replace(x, {ws}, ' ')")
        arr = d["filter"](arr, "length(x) >= 3 AND NOT x RLIKE '[0-9]'")
    return arr


def timex_col(txt_col: str = "text") -> F.Column:
    return F.expr(timex_sql("spark", txt_col))


def tag_timex(t: DataFrame, txt_col: str = "text") -> DataFrame:
    """A11: (doc_id, timex) rows — per-doc normalized date expressions."""
    return t.select("doc_id", F.explode(timex_col(txt_col)).alias("timex"))


def extract_entities(t: DataFrame, txt_col: str = "text") -> DataFrame:
    """A12: (doc_id, ent_type, entity) rows for PER/ORG/LOC."""
    parts = [
        t.select(
            "doc_id",
            F.lit(et).alias("ent_type"),
            F.explode(F.expr(ner_sql("spark", txt_col, et))).alias("entity"),
        )
        for et in ("PER", "ORG", "LOC")
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def entity_frequencies(t: DataFrame, txt_col: str = "text") -> DataFrame:
    """The reference's entity table shape (name, type, frequency) via
    upsert-as-aggregation (S5 analog): one map-side-combined hash agg."""
    return (
        extract_entities(t, txt_col)
        .groupBy("ent_type", "entity")
        .agg(F.count("*").alias("frequency"))
        .orderBy(F.desc("frequency"), "ent_type", "entity")
    )


# ---------------------------------------------------------------------------
# Gate fixtures: the synthetic corpus is lowercase word soup with no
# date/entity surface forms, so (multimodal.py pattern) both engines
# append identical deterministic mentions; the ANNOTATOR then has to
# find and normalize them — including planted implausible ones
# (Feb 30, year 1850, "Mr. Al", "X9 Corp") that the cleanup must drop.
# ---------------------------------------------------------------------------

_PER_CASE = (
    "CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'Alice Johnson' "
    "WHEN 1 THEN 'Omar Keller' ELSE 'Lena Moreau' END"
)
_ORG_CASE = (
    "CASE CAST(doc_id % 7 AS INT) % 3 WHEN 0 THEN 'Acme Corp' "
    "WHEN 1 THEN 'Nord GmbH' ELSE 'Vega Data Ltd' END"
)
_LOC_CASE = (
    "CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'Berlin' WHEN 1 THEN 'Tokyo' "
    "WHEN 2 THEN 'Lima' ELSE 'Vienna' END"
)

_FIXTURE_TEMPLATE = f"""
SELECT doc_id,
       text || CASE CAST(doc_id % 5 AS INT)
           WHEN 0 THEN ' released on ' || CAST(2016 + doc_id % 6 AS {{str_t}}) || '-0' || CAST(doc_id % 9 + 1 AS {{str_t}}) || '-1' || CAST(doc_id % 10 AS {{str_t}}) || ' by the team'
           WHEN 1 THEN ' Meeting with Dr. ' || {_PER_CASE} || ' of ' || {_ORG_CASE} || ' on March ' || CAST(doc_id % 28 + 1 AS {{str_t}}) || ', ' || CAST(2017 + doc_id % 4 AS {{str_t}}) || '.'
           WHEN 2 THEN ' shipped 3 September ' || CAST(2018 + doc_id % 3 AS {{str_t}}) || ' from ' || {_LOC_CASE} || ' office of ' || {_ORG_CASE}
           WHEN 3 THEN ' planned for October ' || CAST(2015 + doc_id % 8 AS {{str_t}}) || ' said Ms. Mei  Tanaka in ' || {_LOC_CASE}
           ELSE ' archived in ' || CAST(1998 + doc_id % 7 AS {{str_t}}) || ' note February 30, 2019 and 1850-01-01 by Mr. Al of X9 Corp'
       END AS text
FROM transcripts
WHERE doc_id < 400
"""


def fixture_sql(dialect: str) -> str:
    return _FIXTURE_TEMPLATE.format(
        str_t="VARCHAR" if dialect == "duckdb" else "STRING"
    )


F6_TAG_FROM, F6_TAG_TO = "2018-01-01", "2019-12-31"


def _with_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from newsleak_spark.transcripts import load_transcripts

    load_transcripts(spark, sf_dir).createOrReplaceTempView("transcripts")
    return spark.sql(fixture_sql("spark"))


def _a11_timex_tag(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tag_timex(_with_fixture(spark, sf_dir)).orderBy("doc_id", "timex")


def _f6_timex_tagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 over the A11 tagger output (the reference wiring: HeidelTime
    values → SimpleTimeExpression range filter). Day-granularity probe,
    row-local exists — no explode, no shuffle before the filter."""
    t = _with_fixture(spark, sf_dir).withColumn("timex", timex_col())
    hit = F.expr(
        "exists(timex, d -> length(d) = 10 AND "
        f"d >= '{F6_TAG_FROM}' AND d <= '{F6_TAG_TO}')"
    )
    return (
        t.filter(hit)
        .select("doc_id", F.size("timex").cast("long").alias("n_timex"))
        .orderBy("doc_id")
    )


def _a12_ner(spark: SparkSession, sf_dir: str) -> DataFrame:
    return entity_frequencies(_with_fixture(spark, sf_dir))


_F3_ENTITY = "Alice Johnson"


def _f3_entity_extracted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 over A12 output — the reference wiring (entity filter is a
    terms query on NER-derived per-doc entity ids,
    ESRequestUtils.scala entity filter). Row-local extraction feeds the
    filter, so no join: the doc set is a filtered projection."""
    ents = extract_entities(_with_fixture(spark, sf_dir))
    return (
        ents.filter((F.col("ent_type") == "PER") & (F.col("entity") == _F3_ENTITY))
        .select("doc_id")
        .distinct()
        .orderBy("doc_id")
    )


def _g4_entity_typed_facet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G4 typed facet over A12 output: top locations by document count
    (ES filtered terms agg over one entity type)."""
    ents = extract_entities(_with_fixture(spark, sf_dir))
    return (
        ents.filter(F.col("ent_type") == "LOC")
        .groupBy("entity")
        .agg(F.count_distinct("doc_id").alias("n_docs"))
        .orderBy(F.desc("n_docs"), "entity")
        .limit(10)
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "a11_timex_tag": _a11_timex_tag,
        "f6_timex_tagged": _f6_timex_tagged,
        "a12_ner": _a12_ner,
        "f3_entity_extracted": _f3_entity_extracted,
        "g4_entity_typed_facet": _g4_entity_typed_facet,
    }


def oracle_sql() -> dict[str, str]:
    from newsleak_spark.transcripts import transcripts_sql

    prelude = (
        f"WITH transcripts AS ({transcripts_sql('duckdb')}),\n"
        f"fix AS ({fixture_sql('duckdb')})"
    )
    tx = timex_sql("duckdb", "text")
    o: dict[str, str] = {}
    o["a11_timex_tag"] = (
        f"{prelude},\n"
        f"tagged AS (SELECT doc_id, {tx} AS timex FROM fix)\n"
        "SELECT doc_id, unnest(timex) AS timex FROM tagged\n"
        "ORDER BY doc_id, timex"
    )
    o["f6_timex_tagged"] = (
        f"{prelude},\n"
        f"tagged AS (SELECT doc_id, {tx} AS timex FROM fix)\n"
        "SELECT doc_id, CAST(len(timex) AS BIGINT) AS n_timex FROM tagged\n"
        "WHERE len(list_filter(timex, d -> length(d) = 10 AND "
        f"d >= '{F6_TAG_FROM}' AND d <= '{F6_TAG_TO}')) > 0\n"
        "ORDER BY doc_id"
    )
    ents = "\nUNION ALL\n".join(
        f"SELECT doc_id, '{et}' AS ent_type, unnest({ner_sql('duckdb', 'text', et)}) AS entity FROM fix"
        for et in ("PER", "ORG", "LOC")
    )
    o["a12_ner"] = (
        f"{prelude},\n"
        f"ents AS ({ents})\n"
        "SELECT ent_type, entity, COUNT(*) AS frequency FROM ents\n"
        "GROUP BY ent_type, entity\n"
        "ORDER BY frequency DESC, ent_type, entity"
    )
    o["f3_entity_extracted"] = (
        f"{prelude},\n"
        f"ents AS ({ents})\n"
        "SELECT DISTINCT doc_id FROM ents\n"
        f"WHERE ent_type = 'PER' AND entity = '{_F3_ENTITY}'\n"
        "ORDER BY doc_id"
    )
    o["g4_entity_typed_facet"] = (
        f"{prelude},\n"
        f"ents AS ({ents})\n"
        "SELECT entity, COUNT(DISTINCT doc_id) AS n_docs FROM ents\n"
        "WHERE ent_type = 'LOC'\n"
        "GROUP BY entity ORDER BY n_docs DESC, entity LIMIT 10"
    )
    return o
