"""TextRank extractive summarization."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_context_extractor_agent_spark.functions.summarize import (
    SCALE,
    sentence_edges,
    textrank_sentences,
)
from pdf_context_extractor_agent_spark.functions.webtext import split_sentences


def _doc(spark, text, doc_id=1):
    return spark.createDataFrame([(doc_id, text)], "doc_id int, text string")


def test_textrank_central_sentence_wins(spark):
    # the hub sentence shares terms with every other; satellites only
    # overlap the hub — the hub must rank first
    text = (
        "alpha beta gamma delta. "
        "alpha oak pine elm. "
        "beta rose lily iris. "
        "gamma stone cliff ridge. "
        "delta wave tide foam."
    )
    out = textrank_sentences(_doc(spark, text), top_k=5).collect()
    first = [r for r in out if r["rank_order"] == 1][0]
    assert first["sentence"].startswith("alpha beta gamma delta")
    # all five sentences are returned, ranks strictly ordered
    ranks = [r["rank"] for r in sorted(out, key=lambda r: r["rank_order"])]
    assert ranks == sorted(ranks, reverse=True)


def test_textrank_isolated_sentence_keeps_base(spark):
    text = "alpha beta gamma. alpha beta delta. zzz qqq xxx."
    sents = split_sentences(_doc(spark, text))
    edges = sentence_edges(sents)
    # the isolated sentence has no edges at all
    touched = {r["src"] for r in edges.collect()}
    assert touched == {0, 1}
    out = {r["sent_idx"]: r["rank"]
           for r in textrank_sentences(_doc(spark, text), top_k=3).collect()}
    n = 3
    base = (15 * (SCALE // n)) // 100
    assert out[2] == base  # isolated: rank == base after any iterations
    assert out[0] > out[2] and out[1] > out[2]


def test_textrank_deterministic_tie_break(spark):
    # two identical twin sentences: equal ranks, sent_idx breaks the tie
    text = "alpha beta gamma. alpha beta gamma. unrelated zzz qqq."
    out = sorted(
        textrank_sentences(_doc(spark, text), top_k=3).collect(),
        key=lambda r: r["rank_order"],
    )
    assert out[0]["sent_idx"] == 0 and out[1]["sent_idx"] == 1
    assert out[0]["rank"] == out[1]["rank"]


def test_textrank_runs_repeatably(spark):
    docs = spark.createDataFrame(
        [(i, "the quick brown fox. the lazy dog sleeps. quick dog runs fast.")
         for i in range(20)],
        "doc_id int, text string",
    )
    a = sorted(map(tuple, textrank_sentences(docs).collect()))
    b = sorted(map(tuple, textrank_sentences(docs.repartition(7)).collect()))
    assert a == b  # partitioning must not change integer ranks
