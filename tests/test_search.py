"""Unit tests for BM25 lexical retrieval (functions/search.py) —
hand-computed fixture; cross-engine oracle parity lives in
test_entry_oracle.py (q_bm25)."""

from __future__ import annotations

import math

import pytest

from pdf_context_extractor_agent_spark.functions.search import (
    bm25_index,
    bm25_search,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (0, "cat dog cat"),           # tf(cat)=2, dl=3
            (1, "cat fish"),              # tf(cat)=1, dl=2
            (2, "dog dog dog dog"),       # no cat
            (3, "bird"),                  # no cat
        ],
        "doc_id long, text string",
    )


def _expected_weight(tf, df, dl, n_docs, avgdl, k1=1.2, b=0.75):
    idf = math.log(1 + (n_docs - df + 0.5) / (df + 0.5))
    return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))


def test_search_matches_hand_computation(docs):
    out = {
        r["doc_id"]: (r["bm25"], r["n_terms_matched"])
        for r in bm25_search(docs, ["cat"], k=10).collect()
    }
    avgdl = (3 + 2 + 4 + 1) / 4
    assert set(out) == {0, 1}
    assert out[0][1] == 1 and out[1][1] == 1
    assert out[0][0] == pytest.approx(
        round(_expected_weight(2, 2, 3, 4, avgdl), 4), abs=1e-4
    )
    assert out[1][0] == pytest.approx(
        round(_expected_weight(1, 2, 2, 4, avgdl), 4), abs=1e-4
    )
    # higher tf at comparable length ranks first
    assert out[0][0] > out[1][0]


def test_search_multi_term_sums_and_ranks(docs):
    rows = bm25_search(docs, ["cat", "dog"], k=10).collect()
    ranked = [r["doc_id"] for r in rows]
    # doc 0 matches both terms; docs 1 and 2 match one each
    by_id = {r["doc_id"]: r for r in rows}
    assert by_id[0]["n_terms_matched"] == 2
    assert by_id[1]["n_terms_matched"] == 1
    assert by_id[2]["n_terms_matched"] == 1
    assert ranked[0] == 0
    assert 3 not in by_id


def test_search_scores_equal_full_index(docs):
    """Filtering postings to the query terms must not change scores:
    df/N/avgdl keep full-corpus semantics."""
    idx = bm25_index(docs)
    want = {
        r["doc_id"]: r["s"]
        for r in idx.filter(idx.term.isin(["cat", "dog"]))
        .groupBy("doc_id")
        .sum("weight")
        .withColumnRenamed("sum(weight)", "s")
        .collect()
    }
    got = {r["doc_id"]: r["bm25"] for r in bm25_search(docs, ["cat", "dog"]).collect()}
    assert set(got) == set(want)
    for d, s in want.items():
        assert got[d] == pytest.approx(round(s, 4), abs=1e-4)


def test_index_df_and_tf(docs):
    rows = bm25_index(docs).filter("term = 'dog'").collect()
    assert {r["doc_id"]: r["tf"] for r in rows} == {0: 1, 2: 4}
    assert all(r["df"] == 2 for r in rows)
    assert all(r["weight"] > 0 for r in rows)


def test_term_filter_precedes_shuffle(docs):
    """The query-term filter must sit below the first exchange so only
    matching postings are shuffled (the property that makes search cost
    scale with term frequency, not corpus size)."""
    plan = bm25_search(docs, ["cat"])._jdf.queryExecution().executedPlan().toString()
    first_exchange = plan.find("Exchange")
    gen = plan.find("Generate explode")
    assert first_exchange != -1 and gen != -1
    # the explode+filter appears deeper in the tree than every exchange
    # (toString prints parents first), so the filter is pre-shuffle
    filt = plan.rfind("cat")
    assert filt > first_exchange


# ------------------------------------------------- phrase search


@pytest.fixture(scope="module")
def phrase_docs(spark):
    return spark.createDataFrame(
        [
            (0, "big data big data big"),   # "big data" at 1 and 3
            (1, "data big"),                # reversed — no hit
            (2, "big big data"),            # one hit at 2
            (3, "Big Data rules"),          # case-folded hit at 1
            (4, "unrelated words here"),
        ],
        "doc_id long, text string",
    )


def test_phrase_counts_and_positions(phrase_docs):
    from pdf_context_extractor_agent_spark.functions.search import phrase_search

    got = {
        r["doc_id"]: (r["n_hits"], r["first_pos"])
        for r in phrase_search(phrase_docs, ["big", "data"]).collect()
    }
    assert got == {0: (2, 1), 2: (1, 2), 3: (1, 1)}


def test_phrase_three_words_and_overlaps(phrase_docs, spark):
    from pdf_context_extractor_agent_spark.functions.search import phrase_search

    docs = spark.createDataFrame(
        [(0, "a a a a"), (1, "a a b a a a")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_hits"], r["first_pos"])
        for r in phrase_search(docs, ["a", "a", "a"]).collect()
    }
    # overlapping occurrences all count: doc 0 has [1..3] and [2..4]
    assert got == {0: (2, 1), 1: (1, 4)}


def test_phrase_rejects_single_word(phrase_docs):
    from pdf_context_extractor_agent_spark.functions.search import phrase_search

    with pytest.raises(ValueError):
        phrase_search(phrase_docs, ["solo"])
