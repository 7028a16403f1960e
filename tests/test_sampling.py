"""stratified_sample determinism/stratification and ngram_counts
ordering invariants (the value-level parity is the DuckDB gate's job).
"""

from pyspark.sql import functions as F

from newsleak_spark.textops import (
    EVAL_E4,
    LANG_RATE_E4,
    NGRAM_TOP,
    ngram_counts,
    stratified_sample,
)

from conftest import SF_ORACLE


def test_stratified_sample_deterministic_and_stratified(spark):
    a = stratified_sample(spark, SF_ORACLE).collect()
    b = stratified_sample(spark, SF_ORACLE).collect()
    assert a == b  # hash-driven: no RNG, no partition dependence
    n_total = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").count()
    evals = [r for r in a if r["split"] == "eval"]
    # eval slice ≈ EVAL_E4/1e4 of the corpus (hash-uniform, ±5σ slack)
    import math

    p = EVAL_E4 / 10000
    tol = 5 * math.sqrt(n_total * p * (1 - p))
    assert abs(len(evals) - n_total * p) < tol
    # downsampled stratum keeps roughly its rate of TRAIN candidates;
    # non-listed strata keep every non-eval doc
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    by_lang_total = {
        r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    kept_train = {}
    for r in a:
        if r["split"] == "train":
            kept_train[r["lang"]] = kept_train.get(r["lang"], 0) + 1
    for lang, total in by_lang_total.items():
        rate = LANG_RATE_E4.get(lang, 10000) / 10000
        expect = total * (1 - p) * rate
        sd = math.sqrt(max(total * rate * (1 - rate), total * p * (1 - p), 1))
        assert abs(kept_train.get(lang, 0) - expect) < 5 * sd + 3


def test_ngram_counts_order_and_bound(spark):
    rows = ngram_counts(spark, SF_ORACLE).collect()
    assert 0 < len(rows) <= NGRAM_TOP
    keys = [(-r["n"], r["gram"]) for r in rows]
    assert keys == sorted(keys)  # deterministic total order
