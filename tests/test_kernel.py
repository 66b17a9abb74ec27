"""Layout-kernel tests: byte-identity, page/table structure, boilerplate."""

import pyspark.sql.functions as F

from pdf_context_extractor_agent_spark.corpus import make_doc
from pdf_context_extractor_agent_spark.kernels import extracted_text, parse_html_doc


def test_byte_identity_per_url(spark, corpus, page_df):
    """The north-rule invariant: extracted main-content text is
    byte-identical to the oracle ``text`` column for EVERY url."""
    joined = extracted_text(page_df).join(corpus.select("url", "text"), "url")
    total = joined.count()
    matches = joined.filter(F.col("extracted_text") == F.col("text")).count()
    assert total > 0
    assert matches == total


def test_boilerplate_stripped():
    _, _, blob, text, _ = make_doc(6)  # plain webtext doc
    assert b"SiteBanner" in blob and b"advertisement" in blob
    got = "\n".join(p["page_text"] for p in parse_html_doc(blob))
    for noise in ("SiteBanner", "advertisement", "tracker", "console.log", "legal"):
        assert noise not in got
    assert got == text


def test_page_and_table_structure():
    _, _, blob, _, _ = make_doc(0)
    pages = parse_html_doc(blob)
    assert len(pages) == 8
    # balance part 1 lives on page 2 with exactly one table of 11 rows
    p2 = pages[1]
    assert len(p2["tables"]) == 1
    assert len(p2["tables"][0][3]) == 11
    assert p2["tables"][0][3][0] == ["项目", "本期末", "上期末", "附注"]
    # y layout: monotonically increasing, fixed line height
    ys = [y for y, _ in p2["lines"]]
    assert ys == sorted(ys)
    assert ys[1] - ys[0] == 12.0


def test_entity_unescape():
    html = b"<html><body><main><p>a &amp; b &lt;c&gt;</p></main></body></html>"
    pages = parse_html_doc(html)
    assert pages[0]["page_text"] == "a & b <c>"
