"""Linear-classifier apply + unicode NFC normalization."""

from __future__ import annotations

import hashlib
import unicodedata

from pyspark.sql import functions as F

from pdf_context_extractor_agent_spark.functions.classify import (
    apply_linear_model,
    hashed_term_weight,
    vocabulary_model,
)
from pdf_context_extractor_agent_spark.functions.webtext import nfc_normalize


def _py_weight(term: str) -> float:
    return int(hashlib.md5(term.encode()).hexdigest()[:4], 16) / 65536.0 - 0.5


def test_hashed_weight_matches_python(spark):
    terms = ["the", "quick", "fox", "café"]
    df = spark.createDataFrame([(t,) for t in terms], "term string")
    got = {
        r["term"]: r["w"]
        for r in df.select("term", hashed_term_weight(F.col("term")).alias("w")).collect()
    }
    for t in terms:
        assert got[t] == _py_weight(t)


def test_apply_linear_model_margin(spark):
    docs = spark.createDataFrame(
        [(1, "aa bb aa"), (2, "cc")], "doc_id long, text string"
    )
    model = spark.createDataFrame(
        [("aa", 0.5), ("bb", -0.25), ("cc", -1.0)], "term string, weight double"
    )
    out = {r["doc_id"]: r for r in apply_linear_model(docs, model).collect()}
    assert out[1]["n_terms"] == 3
    assert abs(out[1]["margin"] - (0.5 + 0.5 - 0.25) / 3) < 1e-12
    assert out[1]["label"] is True
    assert out[2]["margin"] == -1.0 and out[2]["label"] is False


def test_apply_linear_model_oov_contributes_zero(spark):
    docs = spark.createDataFrame([(1, "known unknown")], "doc_id long, text string")
    model = spark.createDataFrame([("known", 1.0)], "term string, weight double")
    row = apply_linear_model(docs, model).first()
    assert row["n_terms"] == 2 and row["margin"] == 0.5


def test_vocabulary_model_is_distinct_terms(spark):
    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "b c")], "doc_id long, text string"
    )
    vocab = vocabulary_model(docs)
    terms = sorted(r["term"] for r in vocab.collect())
    assert terms == ["a", "b", "c"]
    for r in vocab.collect():
        assert r["weight"] == _py_weight(r["term"])


def test_model_is_broadcast(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    model = spark.createDataFrame([("a", 1.0)], "term string, weight double")
    plan = apply_linear_model(docs, model)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_nfc_normalize_composes(spark):
    decomposed = "café Å"
    df = spark.createDataFrame([(decomposed,), (None,)], "t string")
    got = [r["n"] for r in df.select(nfc_normalize(F.col("t")).alias("n")).collect()]
    assert got[0] == unicodedata.normalize("NFC", decomposed) == "café Å"
    assert got[1] is None
