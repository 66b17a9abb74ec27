"""Full Gopher repetition suite + Table-A1 gate (functions/quality.py).

Reference basis: Rae et al. 2021 (Gopher), §A1.1 repetition rules and
the Table A1 document filters. Known-answer cases hand-computed; the
jumbo test guards the O(g log g) fold against the per-lambda
re-evaluation trap documented on repetition_features.
"""

from __future__ import annotations

import time

import pyspark.sql.functions as F

from pdf_context_extractor_agent_spark.functions.quality import (
    DUP_NGRAM_MAX,
    TOP_NGRAM_MAX,
    gopher_gate,
    gopher_repetition,
)


def _one(spark, text: str) -> dict:
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return gopher_repetition(df).collect()[0].asDict()


def test_dup_line_and_para_fractions(spark):
    # 4 lines, 'aa' repeated once -> dup_line_frac 1/4; chars 2/8
    # paragraphs: ['aa\nbb', 'aa\ncc'] -> no dup paras
    r = _one(spark, "aa\nbb\n\naa\ncc")
    assert r["dup_line_frac"] == 0.25
    assert r["dup_line_char_frac"] == 0.25
    assert r["dup_para_frac"] == 0.0
    assert r["dup_para_char_frac"] == 0.0


def test_dup_para_fraction(spark):
    r = _one(spark, "aa bb\n\naa bb\n\ncc")
    # paras: ['aa bb', 'aa bb', 'cc'] -> dup 1/3; chars 5/12
    assert round(r["dup_para_frac"], 6) == round(1 / 3, 6)
    assert round(r["dup_para_char_frac"], 6) == round(5 / 12, 6)


def test_top_bigram_char_frac_known_answer(spark):
    # words: a b a b  -> bigrams: 'a b', 'b a', 'a b'
    # top = 2 occurrences * 3 chars = 6; total gram chars = 9
    r = _one(spark, "a b a b")
    assert round(r["top_2gram_char_frac"], 6) == round(6 / 9, 6)


def test_dup_5gram_char_frac_known_answer(spark):
    # 'w w w w w w' -> five-grams: 'w w w w w' x2 (9 chars each)
    # dup (beyond first) = 9; tot = 18
    r = _one(spark, "w w w w w w")
    assert round(r["dup_5gram_char_frac"], 6) == 0.5


def test_all_metrics_bounded(spark):
    texts = [
        (i, t)
        for i, t in enumerate(
            [
                "",
                "x",
                "a a a a a a a a a a a a a a a a",
                "the quick brown fox jumps over the lazy dog " * 40,
                "line\n" * 50,
            ]
        )
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    for row in gopher_repetition(df).collect():
        for k, v in row.asDict().items():
            if k != "doc_id":
                assert 0.0 <= v <= 1.0, (row["doc_id"], k, v)


def test_jumbo_doc_completes_fast(spark):
    # 100k words: the naive distinct x scan formulation is ~10^10
    # comparisons and never finishes; the sorted-fold suite must
    # complete in seconds.
    words = [f"w{i % 997}" for i in range(100_000)]
    df = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    t0 = time.monotonic()
    gopher_repetition(df).collect()
    assert time.monotonic() - t0 < 120


def test_gate_rules_fire_individually(spark):
    stop_tail = " the of and to be that have with"
    good = " ".join(f"dist{i}word" for i in range(80)) + stop_tail
    rows = [
        (1, good),
        (2, "word " * 10),  # too short
        (3, good + "\n" + "# " * 200),  # symbol overload
        (4, good + ("\n- bullet" * 400)),  # bullet lines
        (5, good.replace(" ", " 12345 ")),  # low alpha fraction
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in gopher_gate(df).collect()}
    assert out[1]["keep"] is True and out[1]["fail_reasons"] == ""
    assert not out[2]["keep"] and "word_count" in out[2]["fail_reasons"]
    assert not out[3]["pass_symbol_ratio"]
    assert not out[4]["pass_bullet_lines"]
    assert not out[5]["pass_alpha_words"]


def test_gate_repetition_rules(spark):
    stop_tail = "the of and to be that have with "
    # 60 words of pure repetition of one 5-gram
    rep = stop_tail + "alpha beta gamma delta epsilon " * 12
    df = spark.createDataFrame([(1, rep)], "doc_id long, text string")
    row = gopher_gate(df).collect()[0].asDict()
    for n in DUP_NGRAM_MAX:
        assert row[f"pass_dup_{n}gram"] is False, n
    for n in TOP_NGRAM_MAX:
        assert row[f"pass_top_{n}gram"] is False, n
    assert row["keep"] is False


def test_gate_zero_exchange_plan(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    for fn in (gopher_repetition, gopher_gate):
        plan = fn(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, fn.__name__
