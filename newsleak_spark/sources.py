"""External ingestion sources: S2 (Hoover ES export) and S7 (metadata CSV).

S2 — the reference reads documents from a live Hoover Elasticsearch
index via scroll pagination (HooverElasticsearchReader.java:126-266)
and assembles each document's text from the ES ``_source`` fields:
email headers (From/To/Subject) folded into the body with ``<>``
rewritten to ``[]``, the to-list whitespace-collapsed and joined with
"; ", a ``\\n-- \\n\\n`` separator, then the body cleaned of long
blank-line runs and truncated (NewsleakReader.cleanBodyText:51-81).
Scroll pagination is an ES-client concern, not an engine concern, so
the Spark-native source reads the standard *export* form of the same
data — NDJSON, one ``{"_id": ..., "_source": {...}}`` object per line
(what an ES scroll/bulk dump produces). NDJSON is line-splittable, so
a 100-TB export scans as ordinary parallel file partitions; the schema
is EXPLICIT (never inferSchema, which scans the data twice at scale).

The text-assembly semantics live in ONE pair of expressions —
:func:`assembled_text_col` (Spark Column) and
:func:`assembled_text_sql` (DuckDB SQL) — kept side by side so the
oracle reproduces the source byte-for-byte (parity by construction,
same pattern as transcripts.py).

Deviation from the reference, documented: cleanBodyText's scanner
treats whitespace-only lines as blank; the single-pass regexp here
collapses runs of *empty* lines only ("\\n{K,}"). Identical in both
engines, which is the invariant the gate checks.

S7 — the reference bulk-loads per-document metadata into Postgres via
``COPY metadata FROM STDIN WITH CSV``
(InformationExtraction2Postgres.java:139; rows written by
MetadataResource.java as (doc_id, key, value, type) CSV). The Spark
analog is a quoted-CSV read/write pair with an explicit schema —
round-trip-safe for embedded commas/quotes, no schema inference.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from newsleak_spark.transcripts import composite_doc_id

MAX_DOC_LENGTH = 500_000      # newsleak.properties:10 maxdocumentlength
MAX_EMPTY_LINES = 50          # NewsleakReader.java:41

ES_SOURCE_SCHEMA = T.StructType(
    [
        T.StructField("from", T.StringType()),
        T.StructField("to", T.ArrayType(T.StringType())),
        T.StructField("subject", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("date", T.StringType()),
        T.StructField("date-created", T.StringType()),
        T.StructField("filename", T.StringType()),
    ]
)

ES_EXPORT_SCHEMA = T.StructType(
    [
        T.StructField("_id", T.StringType()),
        T.StructField("_source", ES_SOURCE_SCHEMA),
    ]
)

METADATA_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("mkey", T.StringType()),
        T.StructField("mvalue", T.StringType()),
        T.StructField("mtype", T.StringType()),
    ]
)


# ---------------------------------------------------------------------------
# S2: Hoover ES export → documents
# ---------------------------------------------------------------------------


def _angle_to_brackets(col):
    # HooverElasticsearchReader.java:211-212: "<" → "[", ">" → "]"
    return F.replace(F.replace(col, F.lit("<"), F.lit("[")), F.lit(">"), F.lit("]"))


def assembled_text_col(
    src,
    max_doc_length: int = MAX_DOC_LENGTH,
    max_empty_lines: int = MAX_EMPTY_LINES,
):
    """Document text from an ES ``_source`` struct column — the exact
    assembly of HooverElasticsearchReader.getNext (lines 206-240), as
    one JVM-side expression (no Python in the scan)."""
    hdr_from = F.when(
        src["from"].isNotNull(),
        F.concat(F.lit("From: "), _angle_to_brackets(F.trim(src["from"])), F.lit("\n")),
    ).otherwise(F.lit(""))
    to_item = lambda x: F.concat(  # noqa: E731
        F.regexp_replace(F.trim(_angle_to_brackets(x)), r"\s+", " "), F.lit("\n")
    )
    hdr_to = F.when(
        src["to"].isNotNull() & (F.size(src["to"]) > 0),
        F.concat(F.lit("To: "), F.array_join(F.transform(src["to"], to_item), "; ")),
    ).otherwise(F.lit(""))
    hdr_subj = F.when(
        src["subject"].isNotNull(),
        F.concat(F.lit("Subject: "), F.trim(src["subject"]), F.lit("\n")),
    ).otherwise(F.lit(""))
    header = F.concat(hdr_from, hdr_to, hdr_subj)

    # cleanBodyText: collapse >max_empty_lines blank-line runs, ensure
    # the scanner's trailing newline, truncate to max_doc_length.
    keep = max_empty_lines + 2  # n blank lines between content = n+1 '\n'
    body = F.coalesce(F.trim(src["text"]), F.lit(""))
    body = F.regexp_replace(body, r"\n{%d,}" % keep, "\n" * (keep - 1))
    body = F.when(body == "", F.lit("")).otherwise(
        F.when(body.endswith("\n"), body).otherwise(F.concat(body, F.lit("\n")))
    )
    body = F.substring(body, 1, max_doc_length)

    return F.concat(
        F.when(header == "", F.lit("")).otherwise(F.concat(header, F.lit("\n-- \n\n"))),
        body,
    )


def assembled_text_sql(
    source_prefix: str = "",
    max_doc_length: int = MAX_DOC_LENGTH,
    max_empty_lines: int = MAX_EMPTY_LINES,
) -> str:
    """DuckDB twin of :func:`assembled_text_col`, over scalar columns
    ``{p}from_``, ``{p}to_`` (VARCHAR[]), ``{p}subject``, ``{p}text``.
    Newlines via chr(10) (DuckDB string literals don't interpret \\n)."""
    p = source_prefix
    nl = "chr(10)"
    ab = lambda c: f"replace(replace({c}, '<', '['), '>', ']')"  # noqa: E731
    keep = max_empty_lines + 2
    hdr_from = (
        f"CASE WHEN {p}from_ IS NOT NULL THEN 'From: ' || {ab(f'trim({p}from_)')} "
        f"|| {nl} ELSE '' END"
    )
    item = f"regexp_replace(trim({ab('x')}), '\\s+', ' ', 'g') || {nl}"
    hdr_to = (
        f"CASE WHEN {p}to_ IS NOT NULL AND len({p}to_) > 0 THEN 'To: ' || "
        f"array_to_string(list_transform({p}to_, x -> {item}), '; ') ELSE '' END"
    )
    hdr_subj = (
        f"CASE WHEN {p}subject IS NOT NULL THEN 'Subject: ' || trim({p}subject) "
        f"|| {nl} ELSE '' END"
    )
    header = f"({hdr_from} || {hdr_to} || {hdr_subj})"
    collapsed = (
        f"regexp_replace(coalesce(trim({p}text), ''), "
        f"'\\n{{{keep},}}', repeat({nl}, {keep - 1}), 'g')"
    )
    body = (
        f"(CASE WHEN {collapsed} = '' THEN '' "
        f"WHEN ends_with({collapsed}, {nl}) THEN {collapsed} "
        f"ELSE {collapsed} || {nl} END)"
    )
    body = f"substring({body}, 1, {max_doc_length})"
    return (
        f"(CASE WHEN {header} = '' THEN '' ELSE {header} || {nl} || '-- ' || "
        f"{nl} || {nl} END || {body})"
    )


def load_es_export(
    spark: SparkSession,
    path: str,
    max_doc_length: int = MAX_DOC_LENGTH,
    max_empty_lines: int = MAX_EMPTY_LINES,
) -> DataFrame:
    """S2: NDJSON Hoover export → (doc_id, es_id, text, created, filename).

    ``doc_id`` is the deterministic composite id (SURVEY §1.4) — the
    reference instead assigns autoincrement ids in the ES writer
    (HooverElasticsearchReader.java:56-59), which serializes on a
    mutex and cannot scale; the composite id is a pure map.
    ``created`` parses the Hoover ``date`` field
    (yyyy-MM-dd'T'HH:mm:ss, HooverElasticsearchReader.java:105)."""
    raw = spark.read.schema(ES_EXPORT_SCHEMA).json(path)
    src = F.col("_source")
    return raw.select(
        composite_doc_id(F.col("_id"), F.lit(0)).alias("doc_id"),
        F.col("_id").alias("es_id"),
        assembled_text_col(src, max_doc_length, max_empty_lines).alias("text"),
        F.to_timestamp(src["date"], "yyyy-MM-dd'T'HH:mm:ss").alias("created"),
        src["filename"].alias("filename"),
    )


def es_docs_as_transcripts(docs: DataFrame) -> DataFrame:
    """Adapter to the engine's input table: one Hoover document = one
    single-turn conversation (the reference likewise re-wraps Hoover
    docs as newsleak documents with fresh ids)."""
    return docs.select(
        "doc_id",
        F.col("es_id").alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.lit("document").alias("role"),
        "text",
        F.lit(None).cast("string").alias("tool"),
        F.col("created").alias("ts"),
    )


def es_export_metadata(spark: SparkSession, path: str) -> DataFrame:
    """Per-document metadata rows from the export — the fields the
    reference writes through MetadataResource (subject/filename/date
    as Text metadata): (id, mkey, mvalue, mtype)."""
    raw = spark.read.schema(ES_EXPORT_SCHEMA).json(path)
    src = F.col("_source")
    base = raw.select(
        composite_doc_id(F.col("_id"), F.lit(0)).alias("id"),
        src["subject"].alias("subject"),
        src["filename"].alias("filename"),
        src["date"].alias("date"),
    )
    parts = [
        base.select("id", F.lit(k).alias("mkey"), F.col(k).alias("mvalue"),
                    F.lit("Text").alias("mtype")).filter(F.col("mvalue").isNotNull())
        for k in ("subject", "filename", "date")
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# S7: metadata CSV (COPY analog)
# ---------------------------------------------------------------------------

# ignore*WhiteSpace default TRUE on the Spark CSV *writer* and would
# silently trim values; COPY preserves them, so the round trip must too.
# No multiLine: embedded newlines would force a non-splittable scan, so
# values are expected newline-free (the reference's metadata values are).
_CSV_OPTS = {
    "quote": '"',
    "escape": '"',
    "header": "false",
    "ignoreLeadingWhiteSpace": "false",
    "ignoreTrailingWhiteSpace": "false",
}


def write_metadata_csv(meta: DataFrame, path: str) -> None:
    """S7 sink: (id, mkey, mvalue, mtype) → quoted CSV, the exact shape
    ``COPY metadata FROM STDIN WITH CSV`` consumes. Distributed write —
    one file per partition, no driver collect."""
    cols = [f.name for f in METADATA_SCHEMA.fields]
    meta.select(*cols).write.mode("overwrite").options(**_CSV_OPTS).csv(path)


def load_metadata_csv(spark: SparkSession, path: str) -> DataFrame:
    """S7 source: explicit schema (no inference pass), standard quote
    doubling — splittable parallel scan at any scale."""
    return spark.read.schema(METADATA_SCHEMA).options(**_CSV_OPTS).csv(path)


# ---------------------------------------------------------------------------
# Driver-gate fixtures + queries
#
# Both gate entries exercise the PHYSICAL path (NDJSON write→read for
# S2, CSV write→read for S7), not just the expressions: the fixture is
# derived deterministically from the ``documents`` table by the same
# dialect-templated SQL in Spark and DuckDB (transcripts.py pattern),
# Spark round-trips it through /tmp files, and the DuckDB oracle
# computes the expected post-roundtrip value purely relationally — so
# any loss in the writer/reader (escaping, trimming, null handling)
# breaks the hash.
#
# The fixture covers the assembly edge cases: null/blank headers (no
# "-- " separator), <>→[] rewriting, whitespace-run collapse inside
# to-items (incl. a tab), >max_empty_lines blank-line runs, missing
# trailing newline, and body truncation (max_doc_length=400,
# max_empty_lines=2 so the collapse fires at small scale).
# ---------------------------------------------------------------------------

_GATE_MAX_DOC_LENGTH = 400
_GATE_MAX_EMPTY_LINES = 2

_ES_FIXTURE_TEMPLATE = """
SELECT 'doc-' || lpad(CAST(doc_id AS {str_t}), 5, '0') AS es_id,
       CASE WHEN doc_id % 5 = 0 THEN NULL
            ELSE '  <sender' || CAST(doc_id % 7 AS {str_t}) || '@example.com> ' END AS from_,
       CASE WHEN doc_id % 4 = 0 THEN {empty_arr}
            ELSE {to_arr} END AS to_,
       CASE WHEN doc_id % 3 = 0 THEN NULL
            ELSE 'Re: <plan ' || CAST(doc_id % 11 AS {str_t}) || '> ' || substring(text, 1, 24) END AS subject,
       CASE WHEN doc_id % 6 = 0 THEN substring(text, 1, 80) || repeat(chr(10), 8) || 'tail marker'
            WHEN doc_id % 6 = 3 THEN ''
            ELSE text END AS body,
       '2024-03-05T06:07:' || lpad(CAST(doc_id % 60 AS {str_t}), 2, '0') AS date_s
FROM documents
"""

_TO_ARR_ITEMS = [
    "'<alice@example.org>'",
    "'bob' || chr(9) || '  ' || CAST(doc_id % 3 AS {str_t}) || ' <b@example.net> '",
]


def es_fixture_sql(dialect: str) -> str:
    """The shared S2 fixture derivation (expects a ``documents`` view)."""
    if dialect == "duckdb":
        items = ", ".join(i.format(str_t="VARCHAR") for i in _TO_ARR_ITEMS)
        return _ES_FIXTURE_TEMPLATE.format(
            str_t="VARCHAR", empty_arr="[]", to_arr=f"[{items}]"
        )
    if dialect == "spark":
        items = ", ".join(i.format(str_t="STRING") for i in _TO_ARR_ITEMS)
        return _ES_FIXTURE_TEMPLATE.format(
            str_t="STRING",
            empty_arr="CAST(array() AS ARRAY<STRING>)",
            to_arr=f"array({items})",
        )
    raise ValueError(dialect)


def _s2_es_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: fixture → NDJSON export on disk → load_es_export →
    transcript adapter. Output keyed by es_id (the composite doc_id is
    xxhash64-based and intentionally not oracle-reproducible)."""
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView("documents")
    fix = spark.sql(es_fixture_sql("spark"))
    export = fix.select(
        F.col("es_id").alias("_id"),
        F.struct(
            F.col("from_").alias("from"),
            F.col("to_").alias("to"),
            F.col("subject").alias("subject"),
            F.col("body").alias("text"),
            F.col("date_s").alias("date"),
            F.col("date_s").alias("date-created"),
            F.concat(F.col("es_id"), F.lit(".eml")).alias("filename"),
        ).alias("_source"),
    )
    tag = sf_dir.strip("/").replace("/", "_")
    path = f"/tmp/newsleak_es_export_{tag}"
    export.write.mode("overwrite").json(path)
    docs = load_es_export(
        spark, path, _GATE_MAX_DOC_LENGTH, _GATE_MAX_EMPTY_LINES
    )
    t = es_docs_as_transcripts(docs)
    return t.select(
        F.col("conv_id").alias("es_id"),
        "text",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("created_s"),
    ).orderBy("es_id")


def _s2_oracle_sql() -> str:
    txt = assembled_text_sql("f.", _GATE_MAX_DOC_LENGTH, _GATE_MAX_EMPTY_LINES)
    return (
        f"WITH fix AS ({es_fixture_sql('duckdb')}),\n"
        "f AS (SELECT es_id, from_, to_, subject, body AS text, date_s FROM fix)\n"
        f"SELECT f.es_id, {txt} AS text,\n"
        "       strftime(strptime(f.date_s, '%Y-%m-%dT%H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS created_s\n"
        "FROM f ORDER BY es_id"
    )


_META_FIXTURE_TEMPLATE = """
SELECT CAST(doc_id AS BIGINT) AS id, mkey, mvalue, mtype
FROM (
    SELECT doc_id, 'source' AS mkey, source AS mvalue, 'Text' AS mtype FROM documents
    UNION ALL
    SELECT doc_id, 'lang', lang, 'Text' FROM documents
    UNION ALL
    SELECT doc_id, 'n_chars', CAST(n_chars AS {str_t}), 'Number' FROM documents
    UNION ALL
    SELECT doc_id, 'tricky', ' "' || source || '", née, end ', 'Text' FROM documents
) m
WHERE doc_id < 150
"""


def metadata_fixture_sql(dialect: str) -> str:
    """S7 fixture: per-doc metadata rows incl. a value with embedded
    quotes, commas, non-ASCII, and significant lead/trail spaces."""
    return _META_FIXTURE_TEMPLATE.format(
        str_t="VARCHAR" if dialect == "duckdb" else "STRING"
    )


def _s7_metadata_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView("documents")
    meta = spark.sql(metadata_fixture_sql("spark"))
    tag = sf_dir.strip("/").replace("/", "_")
    path = f"/tmp/newsleak_meta_csv_{tag}"
    write_metadata_csv(meta, path)
    return load_metadata_csv(spark, path).orderBy("id", "mkey")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "s2_es_source": _s2_es_source,
        "s7_metadata_csv": _s7_metadata_csv,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "s2_es_source": _s2_oracle_sql(),
        "s7_metadata_csv": metadata_fixture_sql("duckdb").strip()
        + "\nORDER BY id, mkey",
    }
