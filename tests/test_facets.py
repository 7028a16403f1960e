"""Facet/aggregation semantics (G1/G5/G6/G8, J6) on the smoke table."""

from pyspark.sql import functions as F

from newsleak_spark import facets


def test_facet_counts_order_and_k(transcripts):
    rows = facets.facet_counts(transcripts, "role", k=2).collect()
    assert len(rows) == 2
    assert rows[0].n_docs >= rows[1].n_docs


def test_facet_include_zero_fill(transcripts):
    rows = facets.facet_counts(transcripts, "tool", include=["tool_0", "zzz_missing"]).collect()
    vals = {r.value: r.n_docs for r in rows}
    assert vals["zzz_missing"] == 0
    assert vals["tool_0"] > 0


def test_facet_exclude(transcripts):
    rows = facets.facet_counts(transcripts, "role", exclude=["user"]).collect()
    assert all(r.value != "user" for r in rows)


def test_cardinality_exact_vs_approx(transcripts):
    exact = facets.cardinality(transcripts, "tool", exact=True).collect()[0].n_distinct
    approx = facets.cardinality(transcripts, "tool", exact=False).collect()[0].n_distinct
    assert exact == 7
    assert abs(approx - exact) <= 1


def test_histogram_dense_zero_buckets(transcripts):
    rows = facets.date_histogram(transcripts, "month").collect()
    buckets = [r.bucket for r in rows]
    # dense: consecutive months, no gaps
    assert buckets == sorted(buckets)
    total = sum(r.n_docs for r in rows)
    assert total == transcripts.count()
    # extended bounds: spine covers min..max even where counts are 0
    assert len(buckets) >= 36  # ≥3 calendar years (FIXTURES §1)


def test_decade_histogram(transcripts):
    rows = facets.decade_histogram(transcripts).collect()
    assert [r.decade for r in rows] == [2010, 2020]
    assert sum(r.n_docs for r in rows) == transcripts.count()


def test_hit_count_matches_filter(transcripts):
    n = facets.hit_count(transcripts.filter(F.col("role") == "user")).collect()[0].n_hits
    assert n == transcripts.filter("role = 'user'").count()


def test_tool_network_symmetric_bounds(transcripts):
    edges = facets.tool_network(transcripts).collect()
    assert edges, "expected some tool co-occurrence edges"
    n_convs = transcripts.select("conv_id").distinct().count()
    for e in edges:
        assert e.source < e.target
        assert 1 <= e.weight <= n_convs


def test_top_terms_per_doc_rank(spark, transcripts):
    from newsleak_spark.analysis import tokens_col

    postings = (
        transcripts.filter("doc_id < 5")
        .select("doc_id", F.explode(tokens_col(F.col("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    rows = facets.top_terms_per_doc(postings, n=3).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc, rs in by_doc.items():
        assert len(rs) <= 3
        tfs = [r.tf for r in sorted(rs, key=lambda x: x.rank)]
        assert tfs == sorted(tfs, reverse=True)


def test_discover_facet_keys_follows_schema(spark):
    """G3's key discovery is schema-driven (AggregateService.scala:
    174-177 analog): a new string metadata column appears with no code
    change; text/identifier columns never do."""
    from newsleak_spark.curation import discover_facet_keys

    df = spark.createDataFrame(
        [(1, "c1", "hello", "user", "t0", "prod")],
        "doc_id long, conv_id string, text string, role string, tool string, env string",
    )
    assert discover_facet_keys(df) == ["env", "role", "tool"]


def test_approx_cardinality_error_bound(spark):
    """G5 approx path (HLL, the 100TB-scale cardinality): the estimate
    must land within the default rsd's practical band of the exact
    count on the highest-cardinality categorical column."""
    from newsleak_spark import facets
    from newsleak_spark.transcripts import load_transcripts

    t = load_transcripts(spark, "/root/testdata/sf0.01")
    exact = facets.cardinality(t, "conv_id", exact=True).collect()[0]["n_distinct"]
    approx = facets.cardinality(t, "conv_id", exact=False).collect()[0]["n_distinct"]
    assert abs(approx - exact) / exact < 0.15, (approx, exact)
