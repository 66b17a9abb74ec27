"""Fixed-point PageRank + outlink extraction (functions/graph.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from pdf_context_extractor_agent_spark.functions.graph import (
    RANK_SCALE,
    extract_outlinks,
    page_rank,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_ring_stays_uniform(spark):
    e = _edges(spark, [(0, 1), (1, 2), (2, 0)])
    r = {x["node"]: x["rank"] for x in page_rank(e, 3, n_iter=4).collect()}
    assert len(set(r.values())) == 1
    assert abs(sum(r.values()) - RANK_SCALE) < 10


def test_hub_accumulates_and_dangling_redistributes(spark):
    # 1,2,3 all link to 0; 0 links nowhere (dangling): its mass spreads
    # evenly, so node 0 must end strictly above the satellites, which
    # stay symmetric with each other
    e = _edges(spark, [(1, 0), (2, 0), (3, 0)])
    r = {x["node"]: x["rank"] for x in page_rank(e, 4, n_iter=5).collect()}
    assert r[0] > r[1]
    assert r[1] == r[2] == r[3]
    # fixed-point truncation loses <1e-9 of mass per iteration
    assert abs(sum(r.values()) - RANK_SCALE) < 1000


def test_rank_is_deterministic_across_runs(spark):
    e = _edges(
        spark,
        [(i, (i * i + 1) % 17) for i in range(17)]
        + [(i, i % 5) for i in range(17)],
    )
    a = sorted((x["node"], x["rank"]) for x in page_rank(e, 17, n_iter=3).collect())
    b = sorted(
        (x["node"], x["rank"])
        for x in page_rank(e.repartition(7), 17, n_iter=3).collect()
    )
    assert a == b  # partial-agg order cannot perturb integer sums


def test_extract_outlinks(spark):
    html = (
        '<html><a href="https://x.example/a">A</a>'
        '<p>no link</p><a href="/rel">R</a><a href="">empty</a></html>'
    ).encode()
    pages = spark.createDataFrame(
        [("u1", html), ("u2", b"<html>none</html>")], "url string, html binary"
    )
    out = [(r["url"], r["outlink"]) for r in extract_outlinks(pages).collect()]
    assert sorted(out) == [("u1", "/rel"), ("u1", "https://x.example/a")]


def test_extract_anchor_texts(spark):
    from pdf_context_extractor_agent_spark.functions.graph import (
        extract_anchor_texts,
    )

    html = (
        '<html><a class="x" href="https://x.example/a">Read <b>this</b>\n'
        'report</a><a href="/b"><img src="i.png"/></a>'
        '<a href="/c">plain</a></html>'
    ).encode()
    pages = spark.createDataFrame([("u1", html)], "url string, html binary")
    out = {
        r["outlink"]: r["anchor_text"] for r in extract_anchor_texts(pages).collect()
    }
    # multiline anchor with inner tags stripped; image-only anchor
    # (empty text) dropped
    assert out == {"https://x.example/a": "Read this\nreport", "/c": "plain"}
