"""Unit tests for the bigram-LM scorer (functions/lm.py) and URL
canonicalization (functions/urls.py) — hand-computed fixtures; the
cross-engine oracle parity lives in test_entry_oracle.py
(q_lm_score / q_doc_freq / q_url_canon / q_domain_stats)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from pdf_context_extractor_agent_spark.functions.lm import (
    bigram_lm,
    doc_bigrams,
    doc_frequency,
    lm_doc_scores,
)
from pdf_context_extractor_agent_spark.functions.urls import (
    canonicalize_url,
    domain_stats,
    registered_domain,
    url_host,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (0, "a b a b"),      # bigrams: ab ba ab
            (1, "a b c"),        # ab bc
            (2, "solo"),         # no bigrams
            (3, ""),             # no bigrams
            (4, None),           # no bigrams
        ],
        "doc_id long, text string",
    )


def test_doc_bigrams_instances(docs):
    rows = {(r.doc_id, r.w1, r.w2) for r in doc_bigrams(docs).collect()}
    # instance counts: doc 0 emits (a,b) twice — check the full multiset
    all_rows = [(r.doc_id, r.w1, r.w2) for r in doc_bigrams(docs).collect()]
    assert sorted(all_rows) == [
        (0, "a", "b"), (0, "a", "b"), (0, "b", "a"),
        (1, "a", "b"), (1, "b", "c"),
    ]
    assert (2, "solo", None) not in rows  # short docs emit nothing


def test_bigram_lm_mle_probabilities(docs):
    model = {(r.w1, r.w2): r for r in bigram_lm(doc_bigrams(docs)).collect()}
    # corpus: C(a,b)=3 C(b,a)=1 C(b,c)=1 ; C(a,.)=3 C(b,.)=2
    ab = model[("a", "b")]
    assert (ab.pair_cnt, ab.first_cnt) == (3, 3)
    assert ab.logp == pytest.approx(0.0)
    ba = model[("b", "a")]
    assert (ba.pair_cnt, ba.first_cnt) == (1, 2)
    assert ba.logp == pytest.approx(math.log(0.5))


def test_lm_doc_scores_avg_and_buckets(docs):
    out = {r.doc_id: r for r in lm_doc_scores(docs, buckets=2).collect()}
    assert set(out) == {0, 1}  # sub-two-token docs have no score
    # doc 0: logp(ab)+logp(ab)+logp(ba) = 0 + 0 + ln(.5) over 3
    assert out[0].avg_logp == pytest.approx(math.log(0.5) / 3)
    assert out[0].n_bigrams == 3
    # doc 1: (ln(1) + ln(.5)) / 2
    assert out[1].avg_logp == pytest.approx(math.log(0.5) / 2)
    assert out[1].ppl == pytest.approx(math.exp(-out[1].avg_logp))
    # doc 0 is more fluent (higher avg logp) -> bucket 1
    assert out[0].lm_bucket == 1 and out[1].lm_bucket == 2


def test_doc_frequency_smoothed_idf(docs):
    d = {r.word: r for r in doc_frequency(docs).collect()}
    assert d["a"].df == 2 and d["solo"].df == 1
    # 5 docs total (empty/null text tokenizes to [''] -> word '')
    assert d["a"].n_docs == 5
    assert d["a"].idf == pytest.approx(math.log(6 / 3))


URL_CASES = [
    (
        "https://WWW.Example.COM/Path/Page?utm_source=x&id=7&ref=rss#frag",
        "https://example.com/Path/Page?id=7",
        "example.com",
        "example.com",
    ),
    (
        "http://cdn.news.example.co/a?fbclid=abc123",
        "http://cdn.news.example.co/a",
        "cdn.news.example.co",
        "example.co",
    ),
    (
        "https://site.org/q?id=1&gclid=z&x=2",
        "https://site.org/q?id=1&x=2",
        "site.org",
        "site.org",
    ),
    ("https://plain.net/doc", "https://plain.net/doc", "plain.net", "plain.net"),
]


@pytest.mark.parametrize("raw,canon,host,domain", URL_CASES)
def test_canonicalize_url(spark, raw, canon, host, domain):
    row = (
        spark.createDataFrame([(raw,)], "url string")
        .select(
            canonicalize_url(F.col("url")).alias("c"),
            url_host(F.col("url")).alias("h"),
            registered_domain(F.col("url")).alias("d"),
        )
        .first()
    )
    assert (row.c, row.h, row.d) == (canon, host, domain)


def test_domain_stats_counts_canonical_urls(spark):
    pages = spark.createDataFrame(
        [
            # same page twice via tracking-param variants -> 1 canon url
            ("https://www.a.com/x?utm_source=1", "hello"),
            ("https://a.com/x", "world!"),
            ("https://b.org/y", "text"),
        ],
        "url string, text string",
    )
    out = {r.domain: r for r in domain_stats(pages).collect()}
    assert out["a.com"].n_pages == 2
    assert out["a.com"].n_canon_urls == 1
    assert out["a.com"].text_chars == 11
    assert out["b.org"].n_pages == 1


def test_blocklist_filter_suffix_boundary(spark):
    from pdf_context_extractor_agent_spark.functions.urls import blocklist_filter

    pages = spark.createDataFrame(
        [
            ("https://ads.example.com/x",),       # exact entry host
            ("https://sub.ads.example.com/y",),   # under the entry
            ("https://badads.example.com/z",),    # suffix WITHOUT dot boundary
            ("https://example.com/w",),           # parent of the entry
            ("https://clean.org/v",),             # unrelated domain
        ],
        "url string",
    )
    bl = spark.createDataFrame([("ads.example.com",)], "entry string")
    out = {r.host: r for r in blocklist_filter(pages, bl).collect()}
    assert out["ads.example.com"].is_blocked
    assert out["sub.ads.example.com"].is_blocked
    assert out["sub.ads.example.com"].blocked_by == "ads.example.com"
    assert not out["badads.example.com"].is_blocked
    assert not out["example.com"].is_blocked
    assert not out["clean.org"].is_blocked


def test_domain_cap_ranks_and_flags(spark):
    from pdf_context_extractor_agent_spark.functions.urls import domain_cap

    pages = spark.createDataFrame(
        [
            # big.com: 3 docs, quality 9/5/5 (tie broken by canon url)
            ("https://big.com/a", 9),
            ("https://big.com/b", 5),
            ("https://www.big.com/c", 5),
            ("https://tiny.org/x", 1),
        ],
        "url string, quality int",
    )
    out = {
        r.url: (r.domain, r.domain_rank, r.domain_capped)
        for r in domain_cap(pages, 2, order_col="quality").collect()
    }
    assert out["https://big.com/a"] == ("big.com", 1, False)
    # tie at quality 5 → canonical url ascending: /b before /c
    assert out["https://big.com/b"] == ("big.com", 2, False)
    assert out["https://www.big.com/c"] == ("big.com", 3, True)
    assert out["https://tiny.org/x"] == ("tiny.org", 1, False)


def test_domain_cap_keeps_every_row(spark):
    from pdf_context_extractor_agent_spark.functions.urls import domain_cap

    pages = spark.createDataFrame(
        [(f"https://d{i % 3}.com/p{i}",) for i in range(30)], "url string"
    )
    out = domain_cap(pages, 5)
    assert out.count() == 30  # verdict columns, no silent drops
    assert out.filter("domain_capped").count() == 3 * 5


def test_latest_revision_newest_capture_wins(spark):
    from datetime import datetime

    from pdf_context_extractor_agent_spark.functions.urls import latest_revision

    pages = spark.createDataFrame(
        [
            (0, "https://a.com/x?utm_source=f", datetime(2024, 1, 3)),
            (1, "https://www.a.com/x", datetime(2024, 1, 5)),  # same canon, newest
            (2, "https://a.com/x#frag", datetime(2024, 1, 5)),  # ts tie → doc_id
            (3, "https://b.com/y", datetime(2024, 1, 1)),
        ],
        "doc_id long, url string, warc_ts timestamp",
    )
    out = {r.doc_id: r for r in latest_revision(pages, tie_col="doc_id").collect()}
    # docs 0-2 collapse to one canonical page
    assert len({out[i].canon_url for i in (0, 1, 2)}) == 1
    assert out[1].is_latest and out[1].revision_rank == 1  # ts tie: doc 1 < doc 2
    assert not out[2].is_latest and out[2].revision_rank == 2
    assert not out[0].is_latest and out[0].revision_rank == 3
    assert out[3].is_latest


# --- snapshot diff ----------------------------------------------------


def test_snapshot_diff_classes(spark):
    from pdf_context_extractor_agent_spark.functions.urls import snapshot_diff

    old = spark.createDataFrame(
        [
            ("https://WWW.a.com/p/1?utm_source=x", "d1"),
            ("https://a.com/p/2", "d2"),
            ("https://a.com/p/3", "d3"),
        ],
        "url string, digest string",
    )
    new = spark.createDataFrame(
        [
            ("https://a.com/p/1", "d1"),      # canonical match -> unchanged
            ("https://a.com/p/2", "d2x"),     # changed
            ("https://a.com/p/4", "d4"),      # new
        ],
        "url string, digest string",
    )
    rows = {r["canon_url"]: r["change"] for r in snapshot_diff(old, new).collect()}
    assert rows == {
        "https://a.com/p/1": "unchanged",
        "https://a.com/p/2": "changed",
        "https://a.com/p/3": "gone",
        "https://a.com/p/4": "new",
    }


def test_url_template_families(spark):
    from pdf_context_extractor_agent_spark.functions.urls import url_template
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [
            ("https://a.com/cal/2024/3/17",),
            ("https://a.com/s/0123456789abcdef0123456789abcdef",),
            ("https://a.com/article/item-42",),
            ("https://a.com/about?page=3&q=x",),
            ("https://a.com",),
            ("https://a.com/words/only",),
        ],
        "url string",
    )
    out = [r["t"] for r in df.select(url_template(F.col("url")).alias("t")).collect()]
    assert out == [
        "a.com/cal/{d}/{d}/{d}",
        "a.com/s/{h}",
        "a.com/article/{w}",
        "a.com/about?page&q",
        "a.com/",
        "a.com/words/only",
    ]


def test_url_template_stats_flags_traps(spark):
    from pdf_context_extractor_agent_spark.functions.urls import url_template_stats

    rows = [(f"https://a.com/p/{i}",) for i in range(30)] + [
        ("https://a.com/about",),
        ("https://a.com/about",),  # revisit: canonical-distinct collapses
    ]
    df = spark.createDataFrame(rows, "url string")
    out = {r["template"]: (r["n_urls"], r["is_trap"])
           for r in url_template_stats(df, trap_threshold=10).collect()}
    assert out["a.com/p/{d}"] == (30, True)
    assert out["a.com/about"] == (1, False)


# ------------------------------------------------ STRAND bitext mining


def test_strand_pairs_basic_and_orphans(spark):
    from pdf_context_extractor_agent_spark.functions.urls import strand_pairs

    pages = spark.createDataFrame(
        [
            ("https://a.org/en/item/1/view",),
            ("https://a.org/es/item/1/view",),
            ("https://a.org/fr/item/1/view",),   # 3 langs → 3 pairs
            ("https://a.org/en/item/2/view",),   # no partner
            ("https://b.org/en/item/1/view",),   # other host — no cross-pair
            ("https://a.org/end/item/3/view",),  # not a language segment
            ("https://a.org/plain/item/4/view",),
        ],
        "url string",
    )
    got = {
        (r["lang_a"], r["lang_b"], r["base_key"])
        for r in strand_pairs(pages).collect()
    }
    assert got == {
        ("en", "es", "https://a.org/item/1/view"),
        ("en", "fr", "https://a.org/item/1/view"),
        ("es", "fr", "https://a.org/item/1/view"),
    }


def test_strand_pairs_lang_must_be_whole_segment(spark):
    from pdf_context_extractor_agent_spark.functions.urls import strand_pairs

    pages = spark.createDataFrame(
        [
            ("https://a.org/menu/item/1",),   # 'en' inside a word
            ("https://a.org/zen/item/1",),
            ("https://a.org/en-us/item/1",),  # not the closed set
        ],
        "url string",
    )
    assert strand_pairs(pages).count() == 0


def test_domain_prior_shrinks_small_domains(spark):
    from pdf_context_extractor_agent_spark.functions.urls import domain_prior

    rows = (
        # big.com: 40 docs at 900000 ppm — prior stays near its own mean
        [(f"https://big.com/{i}", 900000) for i in range(40)]
        # tiny.com: 1 doc at 0 ppm — prior pulled hard toward global
        + [("https://tiny.com/x", 0)]
    )
    df = spark.createDataFrame(rows, "url string, score_ppm long")
    got = {r["domain"]: r for r in domain_prior(df, smoothing=10).collect()}
    g = got["big.com"]["global_ppm"]
    assert g == (40 * 900000) // 41
    # exact integer formula on both domains
    assert got["big.com"]["prior_ppm"] == (40 * 900000 + 10 * g) // 50
    assert got["tiny.com"]["prior_ppm"] == (0 + 10 * g) // 11
    # shrinkage direction: tiny sits close to global, big close to 900000
    assert abs(got["tiny.com"]["prior_ppm"] - g) < abs(0 - g)
    assert abs(got["big.com"]["prior_ppm"] - 900000) < abs(g - 900000)


def test_snapshot_drift_report_semantics(spark):
    from pdf_context_extractor_agent_spark.functions.urls import (
        snapshot_drift_report,
    )

    old = spark.createDataFrame(
        [
            ("https://a.com/1", "d1", 500000),
            ("https://a.com/2", "d2", 300000),
            ("https://b.com/1", "d3", 900000),
        ],
        "url string, digest string, score_ppm long",
    )
    new = spark.createDataFrame(
        [
            ("https://a.com/1", "d1", 400000),      # unchanged content
            ("https://a.com/2", "dX", 200000),      # changed
            ("https://a.com/3", "d9", 600000),      # new
            # b.com page gone entirely
        ],
        "url string, digest string, score_ppm long",
    )
    got = {r["domain"]: r for r in snapshot_drift_report(old, new).collect()}
    a = got["a.com"]
    assert (a["n_new"], a["n_changed"], a["n_unchanged"], a["n_gone"]) == (1, 1, 1, 0)
    assert a["old_score_ppm"] == (500000 + 300000) // 2
    assert a["new_score_ppm"] == (400000 + 200000 + 600000) // 3
    assert a["score_delta_ppm"] == a["new_score_ppm"] - a["old_score_ppm"]
    b = got["b.com"]
    assert b["n_gone"] == 1 and b["new_score_ppm"] is None
    assert b["score_delta_ppm"] is None  # one-sided domain → null delta


def test_lm_bucket_has_no_global_ntile_window(spark):
    """lm_doc_scores is a per-DOCUMENT relation: the CCNet bucket must
    come from the two-phase global rank, never ntile over an
    unpartitioned window (one task at 10^12 rows). The only
    no-partition window allowed in the plan is the prefix-sum over the
    one-row-per-partition counts dim."""
    from pdf_context_extractor_agent_spark.functions.lm import lm_doc_scores

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma doc {i % 5}") for i in range(20)],
        "doc_id long, text string",
    )
    plan = lm_doc_scores(docs)._jdf.queryExecution().executedPlan().toString()
    assert "ntile" not in plan


def test_lm_bucket_matches_sql_ntile_semantics(spark):
    """The arithmetic bucket reproduces SQL ntile exactly, including the
    first-(n mod b)-buckets-take-the-extra-row convention and n < b."""
    from pdf_context_extractor_agent_spark.functions.lm import lm_doc_scores

    for n_docs, buckets in ((7, 4), (3, 4), (8, 4), (10, 3)):
        docs = spark.createDataFrame(
            [(i, f"w{i} w{(i * 3) % 7} w{i} w{(i + 1) % 5}") for i in range(n_docs)],
            "doc_id long, text string",
        )
        out = lm_doc_scores(docs, buckets=buckets)
        # independent expectation: REAL F.ntile over a constant-key
        # window (fine at test size; the production path must not use
        # it) on the same order key
        from pyspark.sql import Window
        import pyspark.sql.functions as F

        w = Window.partitionBy(F.lit(1)).orderBy(
            (-F.round("avg_logp", 5)).asc(), F.col("doc_id").asc()
        )
        ref = {
            r.doc_id: r.ref_bucket
            for r in out.withColumn("ref_bucket", F.ntile(buckets).over(w)).collect()
        }
        got = {r.doc_id: r.lm_bucket for r in out.collect()}
        assert got == ref, (n_docs, buckets)
