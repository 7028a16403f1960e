"""A8 language ID: char-trigram profile classifier (Cavnar & Trenkle
1994; reference uses OpenNLP MaxEnt over the first 3,000 chars,
annotator/LanguageDetector.java:116-138).

Accuracy table on the held-out labeled fixture below (sentences
disjoint from the training seeds), pinned by test:

    en 4/4   es 4/4   de 4/4   und 1/1   -> 13/13

Also pins Spark == DuckDB oracle on the same fixture (the gate row's
hash parity, end-to-end on adversarial text rather than synthetic
fixture prose).
"""

import duckdb
import pytest

from newsleak_spark.textops import lang_id, oracle_sql

HELD_OUT = [
    ("en", "a small group of people walked along the river before the sun came up."),
    ("en", "nobody knew why the old house at the end of the street was always empty."),
    ("en", "the teacher asked the students to write about their favorite season."),
    ("en", "after dinner they watched a film and talked about their plans."),
    ("es", "un grupo pequeno de personas camino junto al rio antes de salir el sol."),
    ("es", "nadie sabia por que la casa vieja al final de la calle estaba siempre vacia."),
    ("es", "la maestra pidio a los estudiantes que escribieran sobre su estacion favorita."),
    ("es", "despues de cenar vieron una pelicula y hablaron de sus planes."),
    ("de", "eine kleine gruppe von menschen ging am fluss entlang bevor die sonne aufging."),
    ("de", "niemand wusste warum das alte haus am ende der strasse immer leer stand."),
    ("de", "die lehrerin bat die schueler ueber ihre lieblingsjahreszeit zu schreiben."),
    ("de", "nach dem essen sahen sie einen film und sprachen ueber ihre plaene."),
    ("und", "12345 67890 !!! ??? 000"),
]


@pytest.fixture(scope="module")
def fixture_dir(spark, tmp_path_factory):
    """A documents.parquet of the labeled held-out sentences."""
    d = str(tmp_path_factory.mktemp("langfix"))
    rows = [(i, txt, lang) for i, (lang, txt) in enumerate(HELD_OUT)]
    spark.createDataFrame(rows, "doc_id long, text string, true_lang string").write.mode(
        "overwrite"
    ).parquet(f"{d}/documents.parquet")
    return d


def test_held_out_accuracy(spark, fixture_dir):
    got = {r["doc_id"]: r["pred_lang"] for r in lang_id(spark, fixture_dir).collect()}
    wrong = [
        (i, want, got[i]) for i, (want, _txt) in enumerate(HELD_OUT) if got[i] != want
    ]
    assert not wrong, f"misclassified: {wrong}"


def test_oracle_agrees_on_fixture(spark, fixture_dir):
    spark_rows = [
        (r["doc_id"], r["pred_lang"]) for r in lang_id(spark, fixture_dir).collect()
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{fixture_dir}/documents.parquet/*.parquet')"
    )
    duck_rows = [tuple(r) for r in con.execute(oracle_sql()["lang_id"]).fetchall()]
    assert sorted(spark_rows) == sorted(duck_rows)
