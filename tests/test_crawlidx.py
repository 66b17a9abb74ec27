"""CDX crawl-index, SURT keys, sitemap parsing, and PQ search tests."""

import pyspark.sql.functions as F
import pytest

from pdf_context_extractor_agent_spark.sources.cdx import (
    cdx_select_latest,
    parse_cdxj,
    surt_key,
)


def test_surt_key_cases(spark):
    df = spark.createDataFrame(
        [
            ("https://www.News.Example.co.uk/A/b?x=1#frag",),
            ("http://example.com:80/",),
            ("https://sub.example.com",),
        ],
        "url string",
    )
    got = [r.surt for r in df.select(surt_key(F.col("url")).alias("surt")).collect()]
    # host case-folded + www dropped + labels reversed; path/query kept
    # case-sensitive; fragment gone; default port gone; empty path → /
    assert got == [
        "uk,co,example,news)/A/b?x=1",
        "com,example)/",
        "com,example,sub)/",
    ]


def test_parse_cdxj_typed_and_malformed(spark):
    good = (
        'com,example)/p 20240101120000 {"url": "https://example.com/p", '
        '"status": "200", "mime": "text/html", "digest": "sha1:AAA", '
        '"length": "1234", "offset": "5678", "filename": "a.warc.gz"}'
    )
    bad = "com,example)/q not-a-timestamp junk"
    df = spark.createDataFrame([(good,), (bad,)], "cdx_line string")
    rows = {r.urlkey: r for r in parse_cdxj(df).collect()}
    g = rows["com,example)/p"]
    assert (g.ts, g.status, g.mime, g.warc_length, g.warc_offset) == (
        "20240101120000", 200, "text/html", 1234, 5678
    )
    # malformed line SURVIVES with null fields (no silent drops)
    b = rows["com,example)/q"]
    assert b.ts == "" and b.url is None and b.status is None


def test_cdx_select_latest_filters_and_ties(spark):
    def line(key, ts, status, mime, fname, off):
        return (
            f'{key} {ts} {{"url": "u", "status": "{status}", "mime": "{mime}", '
            f'"digest": "d", "length": "1", "offset": "{off}", "filename": "{fname}"}}'
        )

    df = spark.createDataFrame(
        [
            (line("k1", "20240101000000", 200, "text/html", "a", 1),),
            (line("k1", "20240301000000", 200, "text/html; charset=utf-8", "a", 2),),
            (line("k1", "20240401000000", 404, "text/html", "a", 3),),  # not 200
            (line("k2", "20240101000000", 200, "application/pdf", "a", 4),),  # wrong mime
            (line("k3", "20240101000000", 200, "text/html", "a", 5),),  # ts tie →
            (line("k3", "20240101000000", 200, "text/html", "b", 6),),  # filename desc
        ],
        "cdx_line string",
    )
    got = {r.urlkey: r for r in cdx_select_latest(parse_cdxj(df)).collect()}
    assert set(got) == {"k1", "k3"}
    assert got["k1"].ts == "20240301000000"  # newest qualifying, 404 excluded
    assert got["k3"].filename == "b"  # deterministic tie-break


def test_sitemap_entries_kinds_and_fields(spark):
    from pdf_context_extractor_agent_spark.functions.robots import sitemap_entries

    body = (
        "<urlset>\n<url>\n  <loc> https://h/a </loc>\n"
        "  <lastmod>2024-01-01</lastmod>\n  <priority>0.8</priority>\n</url>\n"
        "<url><loc>https://h/b</loc></url>\n</urlset>"
    )
    idx = (
        "<sitemapindex><sitemap><loc>https://h/s1.xml</loc></sitemap></sitemapindex>"
    )
    df = spark.createDataFrame(
        [("h", body), ("i", idx), ("j", "")], "host string, sitemap_xml string"
    )
    rows = sitemap_entries(df).collect()
    by_host = {}
    for r in rows:
        by_host.setdefault(r.host, []).append(r)
    a, b = sorted(by_host["h"], key=lambda r: r.pos)
    assert (a.kind, a.loc, a.lastmod, a.priority) == ("url", "https://h/a", "2024-01-01", 0.8)
    assert (b.kind, b.loc, b.lastmod, b.priority) == ("url", "https://h/b", None, None)
    (s1,) = by_host["i"]
    assert (s1.kind, s1.loc) == ("sitemap", "https://h/s1.xml")
    assert "j" not in by_host  # empty body emits nothing


@pytest.fixture(scope="module")
def emb(spark):
    from pdf_context_extractor_agent_spark.sources import load_table

    return load_table(spark, "embeddings", "/root/testdata/sf0.001")


def test_pq_codes_shape_and_determinism(spark, emb):
    from pdf_context_extractor_agent_spark.functions.similarity import (
        pq_codebooks,
        pq_codes,
    )

    books = pq_codebooks(emb, m=8, ksub=16, stride=7)
    n_cent = books.select("cent_id").distinct().count()
    assert books.count() == 8 * n_cent  # every centroid appears in all 8 subspaces
    codes = pq_codes(emb, books, m=8)
    n = emb.count()
    assert codes.count() == n * 8  # m codes per vector
    valid = codes.join(
        books.select("subspace", F.col("cent_id").alias("code")).distinct(),
        ["subspace", "code"],
    )
    assert valid.count() == n * 8  # every code indexes a real centroid
    # repartitioning cannot perturb the assignment
    codes2 = pq_codes(emb.repartition(7), books, m=8)
    assert codes.exceptAll(codes2).count() == 0


def test_pq_topk_self_match_and_recall(spark, emb):
    from pdf_context_extractor_agent_spark.functions.similarity import (
        brute_force_topk,
        pq_topk,
    )

    q = [float(x) for x in emb.filter(F.col("vec_id") == 7).first()["embedding"]]
    top = pq_topk(emb, q, k=10, m=8, ksub=16, stride=7).collect()
    ids = [r.vec_id for r in top]
    # the query's own codes reconstruct it best-in-class: self in top-k
    assert 7 in ids
    # quantized ranking correlates with the exact one: ≥3 of exact top-10
    brute = {r.vec_id for r in brute_force_topk(emb, q, k=10).collect()}
    assert len(brute & set(ids)) >= 3
