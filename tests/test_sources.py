"""S2 (Hoover ES export source) and S7 (metadata CSV) tests.

Assembly semantics pinned against hand-computed expected strings on
constructed NDJSON docs (reference: HooverElasticsearchReader.getNext
206-240, NewsleakReader.cleanBodyText 51-81); CSV round-trip pinned to
preserve quotes/commas/whitespace/non-ASCII exactly.
"""

import json

from pyspark.sql import functions as F

from newsleak_spark.sources import (
    es_docs_as_transcripts,
    load_es_export,
    load_metadata_csv,
    write_metadata_csv,
)


def _write_ndjson(tmp_path, docs):
    p = tmp_path / "export"
    p.mkdir(parents=True)
    (p / "part-0.json").write_text(
        "\n".join(json.dumps(d, ensure_ascii=False) for d in docs) + "\n"
    )
    return str(p)


def _load_map(spark, path, **kw):
    rows = load_es_export(spark, path, **kw).collect()
    return {r.es_id: r for r in rows}


def test_full_assembly(spark, tmp_path):
    docs = [
        {
            "_id": "a",
            "_source": {
                "from": " <ann@x.org> ",
                "to": ["<bob@y.org>", "carol   d\t <c@z.org> "],
                "subject": " Hello <world> ",
                "text": "line one\nline two",
                "date": "2021-05-04T10:20:30",
                "filename": "a.eml",
            },
        }
    ]
    m = _load_map(spark, _write_ndjson(tmp_path, docs))
    assert m["a"].text == (
        "From: [ann@x.org]\n"
        "To: [bob@y.org]\n; carol d [c@z.org]\n"
        "Subject: Hello <world>\n"          # subject is NOT bracket-rewritten
        "\n-- \n\n"
        "line one\nline two\n"              # trailing newline ensured
    )
    assert str(m["a"].created) == "2021-05-04 10:20:30"
    assert m["a"].filename == "a.eml"


def test_headerless_doc_has_no_separator(spark, tmp_path):
    docs = [{"_id": "b", "_source": {"text": "just a body"}}]
    m = _load_map(spark, _write_ndjson(tmp_path, docs))
    assert m["b"].text == "just a body\n"
    assert m["b"].created is None


def test_blank_line_collapse_and_truncation(spark, tmp_path):
    body = "top" + "\n" * 10 + "bottom"
    docs = [{"_id": "c", "_source": {"text": body}}]
    # max_empty_lines=2 → runs of ≥4 newlines collapse to 3
    m = _load_map(spark, _write_ndjson(tmp_path, docs), max_empty_lines=2)
    assert m["c"].text == "top\n\n\nbottom\n"
    m2 = _load_map(
        spark, _write_ndjson(tmp_path / "t2", docs), max_empty_lines=2, max_doc_length=5
    )
    assert m2["c"].text == "top\n\n"


def test_empty_body_with_header(spark, tmp_path):
    docs = [{"_id": "d", "_source": {"subject": "s", "text": "   "}}]
    m = _load_map(spark, _write_ndjson(tmp_path, docs))
    assert m["d"].text == "Subject: s\n\n-- \n\n"


def test_transcript_adapter_shape(spark, tmp_path):
    docs = [{"_id": "e", "_source": {"text": "x", "date": "2020-01-01T00:00:00"}}]
    t = es_docs_as_transcripts(load_es_export(spark, _write_ndjson(tmp_path, docs)))
    assert t.columns == ["doc_id", "conv_id", "turn_idx", "role", "text", "tool", "ts"]
    r = t.collect()[0]
    assert (r.conv_id, r.turn_idx, r.role) == ("e", 0, "document")


def test_metadata_csv_roundtrip_exact(spark, tmp_path):
    rows = [
        (1, "subject", ' "quoted", with, commas ', "Text"),
        (2, "name", "née Müller", "Text"),
        (3, "n", "42", "Number"),
        (4, "empty", "", "Text"),
        (5, "null", None, "Text"),
    ]
    meta = spark.createDataFrame(rows, "id long, mkey string, mvalue string, mtype string")
    path = str(tmp_path / "meta_csv")
    write_metadata_csv(meta, path)
    back = load_metadata_csv(spark, path).orderBy("id")
    got = [(r.id, r.mkey, r.mvalue, r.mtype) for r in back.collect()]
    # empty string and NULL both surface as NULL through CSV (documented
    # COPY-analog behavior: no distinct empty-vs-null encoding w/o emptyValue)
    want = [r if r[2] != "" else (r[0], r[1], None, r[3]) for r in rows]
    assert got == want


def test_es_export_feeds_index_engine(spark, tmp_path):
    """End-to-end: S2 export → transcript adapter → build_index →
    engine search finds the assembled text (the reference pipeline:
    Hoover read → ES temp index → fulltext query)."""
    from newsleak_spark.indexing import IndexConfig, build_index
    from newsleak_spark.query import QuerySpec
    from newsleak_spark.query.engine import search

    docs = [
        {"_id": f"m{i}", "_source": {"subject": "quarterly numbers", "text": f"revenue grew {i} percent"}}
        for i in range(20)
    ] + [{"_id": "z", "_source": {"text": "nothing relevant here"}}]
    t = es_docs_as_transcripts(load_es_export(spark, _write_ndjson(tmp_path, docs)))
    d = str(tmp_path / "idx")
    build_index(spark, t, d, IndexConfig(n_shards=2, n_term_buckets=4, block_size=16))
    hits = search(spark, d, QuerySpec(terms=("revenue", "quarterly"), k=30)).collect()
    assert len(hits) == 20  # AND of body+subject terms — the 'z' doc excluded


def test_metadata_csv_is_distributed_write(spark, tmp_path):
    meta = (
        spark.range(100)
        .repartition(4)
        .select(
            F.col("id"),
            F.lit("k").alias("mkey"),
            F.col("id").cast("string").alias("mvalue"),
            F.lit("Number").alias("mtype"),
        )
    )
    path = tmp_path / "meta4"
    write_metadata_csv(meta, str(path))
    parts = [p for p in path.iterdir() if p.name.startswith("part-")]
    assert len(parts) == 4  # one file per partition — no driver funnel
    assert load_metadata_csv(spark, str(path)).count() == 100
