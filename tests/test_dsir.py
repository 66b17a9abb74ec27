"""DSIR importance resampling (functions/dsir.py)."""

import pyspark.sql.functions as F

from pdf_context_extractor_agent_spark.functions.dsir import (
    DEFAULT_BUCKETS,
    dsir_log_ratios,
    dsir_score,
    dsir_select,
)


def _toy_corpus(spark):
    # target vocabulary: medical-ish; off-target: cooking-ish
    rows = [
        (1, "patient dose clinical trial dose patient", "tgt"),
        (2, "clinical patient symptoms dose trial", "tgt"),
        (3, "recipe butter flour sugar oven bake", "src"),
        (4, "stir sauce pan butter onion garlic", "src"),
        (5, "patient trial dose clinical symptoms dose", "src"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "kind"])


def test_target_resembling_docs_rank_first(spark):
    docs = _toy_corpus(spark)
    ratios = dsir_log_ratios(docs.filter(F.col("kind") == "tgt"), docs)
    scored = dsir_score(docs, ratios)
    top = dsir_select(scored, 3).select("doc_id").collect()
    # doc 5 shares the target vocabulary and must outrank the cooking docs
    assert {r["doc_id"] for r in top} == {1, 2, 5}
    w = {r["doc_id"]: r["dsir_weight"] for r in scored.collect()}
    assert min(w[1], w[2], w[5]) > max(w[3], w[4])


def test_log_ratios_cover_every_bucket_and_quantize(spark):
    docs = _toy_corpus(spark)
    ratios = dsir_log_ratios(docs.filter(F.col("kind") == "tgt"), docs)
    rows = ratios.collect()
    assert len(rows) == DEFAULT_BUCKETS
    assert {r["bucket"] for r in rows} == set(range(DEFAULT_BUCKETS))
    for r in rows:
        q = r["log_ratio"] * 65536.0
        assert q == int(q)  # exact multiple of 2^-16


def test_score_is_rerun_deterministic(spark):
    docs = _toy_corpus(spark)
    ratios = dsir_log_ratios(docs.filter(F.col("kind") == "tgt"), docs)
    a = dsir_score(docs, ratios).orderBy("doc_id").collect()
    b = dsir_score(docs, ratios).orderBy("doc_id").collect()
    assert a == b
    # weights are means of 2^-16 multiples over n_terms: n_terms * weight
    # must recover an exact 2^-16 multiple (aggregation-order exactness)
    for r in a:
        q = r["dsir_weight"] * r["n_terms"] * 65536.0
        assert abs(q - round(q)) < 1e-6
