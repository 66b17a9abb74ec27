"""Data-mixing / decontamination operators (functions/sampling.py)."""

import pyspark.sql.functions as F

from pdf_context_extractor_agent_spark.functions.sampling import (
    deterministic_uniform,
    ngram_decontaminate,
    stratified_sample,
)


def test_stratified_sample_deterministic_and_quota(spark):
    docs = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("zh").alias("lang"),
    )
    rates = {"en": 0.3, "zh": 0.9}
    a = stratified_sample(docs, rates).orderBy("doc_id").collect()
    b = stratified_sample(docs, rates).orderBy("doc_id").collect()
    assert a == b  # reruns make identical decisions
    by_lang = {r["lang"]: 0 for r in a}
    for r in a:
        by_lang[r["lang"]] += 1
        assert r["u"] < rates[r["lang"]]
    # quotas hold to within binomial noise (1000 draws per stratum)
    assert 250 <= by_lang["en"] <= 350
    assert 850 <= by_lang["zh"] <= 950


def test_stratified_sample_drops_unlisted_strata(spark):
    docs = spark.range(0, 50).select(
        F.col("id").alias("doc_id"), F.lit("fr").alias("lang")
    )
    assert stratified_sample(docs, {"en": 1.0}).count() == 0


def test_deterministic_uniform_range(spark):
    u = spark.range(0, 500).select(
        deterministic_uniform(F.col("id"), "s1").alias("u")
    ).agg(F.min("u"), F.max("u"), F.count_distinct("u")).first()
    assert 0.0 <= u[0] and u[1] < 1.0 and u[2] > 490


def test_ngram_decontaminate_math(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely different words entirely here now"),
            (3, "the quick brown cat sits"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(99, "the quick brown fox runs")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in ngram_decontaminate(docs, bench, n=3).collect()}
    assert set(out) == {1, 2, 3}  # clean docs still present
    # doc 1: 7 distinct 3-grams, hits = {"the quick brown", "quick brown fox"}
    assert out[1]["n_ngrams"] == 7 and out[1]["n_hit"] == 2
    assert abs(out[1]["contamination"] - round(2 / 7, 6)) < 1e-9
    assert out[2]["n_hit"] == 0 and out[2]["contamination"] == 0.0
    # doc 3: 3 distinct 3-grams, hit = {"the quick brown"}
    assert out[3]["n_ngrams"] == 3 and out[3]["n_hit"] == 1
