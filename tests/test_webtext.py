"""C4 line filter + density-based main-content extraction."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from pdf_context_extractor_agent_spark.functions.webtext import (
    c4_filter,
    classify_blocks,
    main_content,
)
from pdf_context_extractor_agent_spark.kernels.html_blocks import parse_blocks


# ---------------------------------------------------------------------------
# block kernel (pure python — no Spark needed)
# ---------------------------------------------------------------------------

def test_parse_blocks_features():
    html = (
        b"<html><head><title>T</title></head><body>"
        b"<nav><a href='/'>Home</a> <a href='/x'>About</a></nav>"
        b"<h1>The Article</h1>"
        b"<p>This is the body of the article with plenty of words in it "
        b"to be recognized as content by any density rule.</p>"
        b"<div class='footer'><a href='/p'>Privacy</a></div>"
        b"<script>var x = '<p>ghost</p>';</script>"
        b"</body></html>"
    )
    blocks = parse_blocks(html)
    tags = [t for t, _, _ in blocks]
    assert "nav" in tags and "h1" in tags and "p" in tags
    by_tag = {t: (txt, lc) for t, txt, lc in blocks}
    # nav is fully link text
    nav_text, nav_links = by_tag["nav"]
    assert nav_links == len(nav_text.replace(" ", "")) or nav_links >= len(nav_text) - 1
    # the paragraph has zero link chars
    assert by_tag["p"][1] == 0
    assert "ghost" not in " ".join(txt for _, txt, _ in blocks)


def test_parse_blocks_never_raises():
    for blob in (b"", b"\x00\xff\xfe garbage <p", b"<html><p>ok"):
        assert isinstance(parse_blocks(blob), list)


# ---------------------------------------------------------------------------
# classifier semantics
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def blocks_df(spark):
    rows = [
        # url, block_no, tag, text, n_chars, n_words, n_link_chars
        ("u", 0, "nav", "Home About Contact", 18, 3, 17),       # bad: link-dominated
        ("u", 1, "h1", "Article Title", 13, 2, 0),              # heading: next is good
        ("u", 2, "p", "word " * 19 + "word", 99, 20, 0),        # good: long, no links
        ("u", 3, "p", "short aside", 11, 2, 0),                 # short, prev good -> good
        ("u", 4, "div", "More Links Here", 15, 3, 14),          # bad
        ("u", 5, "p", "lonely short", 12, 2, 0),                # short, no good neighbour
        ("u", 6, "h2", "Dangling Heading", 16, 2, 0),           # heading, next bad
        ("u", 7, "div", "Promo Promo", 11, 2, 10),              # bad
    ]
    return spark.createDataFrame(
        rows, "url string, block_no int, tag string, text string,"
              "n_chars int, n_words int, n_link_chars int"
    )


def test_classify_blocks(blocks_df):
    out = {r.block_no: r for r in classify_blocks(blocks_df).collect()}
    assert out[0].label == "bad"
    assert out[1].label == "good" and out[1].base_label == "heading"
    assert out[2].label == "good"
    assert out[3].label == "good" and out[3].base_label == "short"
    assert out[4].label == "bad"
    assert out[5].label == "bad"    # short with no good neighbour
    assert out[6].label == "bad"    # heading before bad block
    assert out[7].label == "bad"


def test_main_content_zero_block_doc_stays_visible(spark):
    """A document whose HTML yields zero parsed blocks must still get a
    row (n_blocks=0, main_text='') — the same null-visibility contract
    as the C4 filter's poison rows — instead of vanishing from output."""
    pages = spark.createDataFrame(
        [("u_ok", b"<html><p>" + b"good words here " * 10 + b"</p></html>"),
         ("u_empty", b""),
         ("u_junk", b"%PDF-truncated junk, no streams")],
        "url string, html binary",
    )
    rows = {r.url: r for r in main_content(pages).collect()}
    assert set(rows) == {"u_ok", "u_empty", "u_junk"}
    for u in ("u_empty", "u_junk"):
        assert rows[u].n_blocks == 0
        assert rows[u].n_content_blocks == 0
        assert rows[u].main_text == ""
    assert rows["u_ok"].n_blocks >= 1


def test_main_content_end_to_end(spark):
    html = (
        "<html><body>"
        "<nav><a href='/'>Home</a> <a href='/b'>Blog</a> <a href='/c'>Contact</a></nav>"
        "<h1>Real Title</h1>"
        "<p>" + "meaningful words forming the actual article body text here. " * 3 + "</p>"
        "<p>tail note</p>"
        "<footer><a href='/p'>Privacy</a> <a href='/t'>Terms</a></footer>"
        "</body></html>"
    ).encode()
    pages = spark.createDataFrame([("u1", html)], "url string, html binary")
    row = main_content(pages).collect()[0]
    assert row.n_blocks >= 4
    assert row.main_text.startswith("Real Title\nmeaningful words")
    assert "tail note" in row.main_text        # short block adjacent to good
    assert "Home" not in row.main_text and "Privacy" not in row.main_text


# ---------------------------------------------------------------------------
# C4 line filter
# ---------------------------------------------------------------------------

def test_c4_filter(spark):
    docs = spark.createDataFrame(
        [
            (0, "This line has enough words and ends well.\n"
                "too short.\n"
                "this long line is missing its terminal punctuation mark\n"
                "Another complete sentence with enough words right here.\n"
                "A third proper sentence keeps this document alive today."),
            (1, "Only one good sentence lives inside this document here.\n"
                "enable javascript to view this content please now.\n"
                "nope\n"),
            (2, "A fine opening sentence with plenty of words here.\n"
                "A second fine sentence with plenty of words too.\n"
                "A third fine sentence { lorem ipsum } appears sadly."),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in c4_filter(docs).collect()}
    assert out[0].n_lines == 5 and out[0].n_kept == 3 and out[0].keep_doc
    assert out[0].kept_text.startswith("This line has enough words")
    assert "too short." not in out[0].kept_text
    # doc 1: javascript line dropped, only 1 kept -> not enough lines
    assert out[1].n_kept == 1 and not out[1].keep_doc
    # doc 2: 3 kept lines but page-level ban (lorem ipsum / '{')
    assert out[2].n_kept == 3 and not out[2].keep_doc


def test_plan_stays_jvm_side(spark):
    """The classifier and filter must compile to pure expressions — no
    BatchEvalPython / ArrowEvalPython stages (UDF-free contract)."""
    docs = spark.createDataFrame([(0, "a.\nb.")], "doc_id long, text string")
    plan = c4_filter(docs)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    blocks = spark.createDataFrame(
        [("u", 0, "p", "x", 1, 1, 0)],
        "url string, block_no int, tag string, text string,"
        "n_chars int, n_words int, n_link_chars int",
    )
    plan2 = classify_blocks(blocks)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan2


def test_parse_blocks_pdf_routes_through_layout_kernel():
    """PDF blobs must not become one garbage 'body' block: they emit one
    block per layout-kernel text line with zero link chars."""
    from pdf_context_extractor_agent_spark.corpus import make_doc

    _, _, blob, text, _ = make_doc(4)
    assert blob.startswith(b"%PDF")
    blocks = parse_blocks(blob)
    assert len(blocks) > 5
    assert all(t == "p" and lc == 0 for t, _, lc in blocks)
    assert "%PDF" not in " ".join(s for _, s, _ in blocks)


def test_c4_filter_null_text_survives(spark):
    """A null-text row must yield a verdict row (keep_doc=False), not
    vanish through posexplode(null) — one poison row in 10^12 must stay
    visible to the pipeline."""
    docs = spark.createDataFrame(
        [(0, None), (1, "A decent sentence with enough words to keep here.")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in c4_filter(docs).collect()}
    assert 0 in out and out[0].n_kept == 0 and not out[0].keep_doc
    assert out[1].n_kept == 1


def test_badwords_filter_counts_and_flags(spark):
    from pdf_context_extractor_agent_spark.functions.webtext import badwords_filter

    docs = spark.createDataFrame(
        [
            (0, "the BAD wolf said bad things"),  # 2 hits, case-folded
            (1, "a perfectly clean document"),
            (2, ""),  # empty text: 0 words, never flagged
            (3, "badge is not a bad-word token either"),  # no exact-token hit
        ],
        "doc_id long, text string",
    )
    bw = spark.createDataFrame([("bad",), ("evil",)], "word string")
    out = {r.doc_id: r for r in badwords_filter(docs, bw).collect()}
    assert (out[0].n_bad_words, out[0].is_flagged) == (2, True)
    assert (out[1].n_bad_words, out[1].is_flagged) == (0, False)
    assert (out[2].n_bad_words, out[2].n_words, out[2].bad_word_frac) == (0, 0, 0.0)
    assert (out[3].n_bad_words, out[3].is_flagged) == (0, False)
    assert abs(out[0].bad_word_frac - 2 / 6) < 1e-9


def test_meta_robots_directives(spark):
    from pdf_context_extractor_agent_spark.functions.webtext import meta_robots

    pages = spark.createDataFrame(
        [
            (0, '<head><meta name="robots" content="noindex"></head>'),
            (1, '<head><meta content="nofollow" name="robots"></head>'),  # attr order
            (2, '<head><META NAME="robots" CONTENT="NOINDEX, NOFOLLOW"></head>'),
            (3, '<head><meta name="robots" content="none"></head>'),  # shorthand
            (4, "<head><title>no directives</title></head>"),
            (5, '<head><meta name="robots" content="noindexing"></head>'),  # not a token
        ],
        "doc_id long, html string",
    )
    out = {
        r.doc_id: (r.robots_noindex, r.robots_nofollow, r.robots_indexable)
        for r in meta_robots(pages, "html", keep_cols=("doc_id",)).collect()
    }
    assert out[0] == (True, False, False)
    assert out[1] == (False, True, True)
    assert out[2] == (True, True, False)
    assert out[3] == (True, True, False)
    assert out[4] == (False, False, True)
    assert out[5] == (False, False, True)


# --- page metadata ---------------------------------------------------


def test_page_metadata_order_insensitive(spark):
    from pdf_context_extractor_agent_spark.functions.webtext import page_metadata

    pages = spark.createDataFrame(
        [
            (
                "u1",
                '<html lang="en"><head><title> A  B\n</title>'
                '<meta charset="UTF-8">'
                '<meta property="og:title" content="OG A"/>'
                '<link rel="canonical" href="https://e.com/a"/>'
                '<meta property="article:published_time" content="2024-01-02"/>'
                "</head></html>",
            ),
            (
                "u2",
                "<html><head><title>B</title>"
                '<meta content="OG B" property="og:title"/>'
                '<link href="https://e.com/b" rel="canonical"/>'
                '<meta http-equiv="Content-Type" content="text/html; charset=GBK">'
                "</head></html>",
            ),
            ("u3", "<html><body>nothing</body></html>"),
        ],
        "url string, html string",
    )
    r = {x["url"]: x for x in page_metadata(pages).collect()}
    assert r["u1"]["title"] == "A B"
    assert r["u1"]["og_title"] == "OG A"
    assert r["u1"]["canonical_link"] == "https://e.com/a"
    assert r["u1"]["published_time"] == "2024-01-02"
    assert r["u1"]["charset"] == "utf-8"
    assert r["u1"]["html_lang"] == "en"
    assert r["u2"]["og_title"] == "OG B"  # content-first attribute order
    assert r["u2"]["canonical_link"] == "https://e.com/b"
    assert r["u2"]["charset"] == "gbk"
    assert r["u2"]["html_lang"] is None
    assert all(r["u3"][c] is None for c in
               ("title", "og_title", "canonical_link", "published_time",
                "charset", "html_lang"))


def test_split_sentences_boundaries_and_nulls(spark):
    from pdf_context_extractor_agent_spark.functions.webtext import split_sentences

    docs = spark.createDataFrame(
        [
            (0, "One two. Three four! Five?  Six"),
            (1, "全角句号。次の文！最後？终"),
            (2, "No terminal punctuation here"),
            (3, "Trailing period."),
            (4, None),
            (5, "Dots... then more.   "),
        ],
        "doc_id long, text string",
    )
    out = split_sentences(docs).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.sent_idx, r.sentence))
    assert [s for _, s in sorted(by_doc[0])] == [
        "One two.", "Three four!", "Five?", "Six"
    ]
    assert [s for _, s in sorted(by_doc[1])] == ["全角句号。次の文！最後？终"]  # no space after CJK punct -> no split
    assert [s for _, s in sorted(by_doc[2])] == ["No terminal punctuation here"]
    assert [s for _, s in sorted(by_doc[3])] == ["Trailing period."]
    assert 4 not in by_doc  # null text -> zero sentences, not a crash
    # "Dots... then more.   " -> boundary after the ellipsis' final dot;
    # the trailing-whitespace fragment is dropped
    assert [s for _, s in sorted(by_doc[5])] == ["Dots...", "then more."]


# ------------------------------------------------- sentence chunking


def test_chunk_sentences_budget_and_order(spark):
    from pdf_context_extractor_agent_spark.functions.webtext import chunk_sentences

    docs = spark.createDataFrame(
        [(0, "one two three. four five. six seven eight. nine.")],
        "doc_id long, text string",
    )
    rows = {
        r["chunk_idx"]: r
        for r in chunk_sentences(docs, budget_tokens=5).collect()
    }
    # s1(3 tok) fills 3 <5 → s2 joins chunk 0 (before=3 <5), s3 starts
    # at before=5 → chunk 1, s4 at before=8 → chunk 1
    assert rows[0]["chunk_text"] == "one two three. four five."
    assert rows[0]["n_tokens"] == 5 and rows[0]["n_sents"] == 2
    assert rows[1]["chunk_text"] == "six seven eight. nine."
    assert rows[1]["n_tokens"] == 4


def test_chunk_sentences_jumbo_sentence_renumbers_densely(spark):
    from pdf_context_extractor_agent_spark.functions.webtext import chunk_sentences

    jumbo = " ".join(f"w{i}" for i in range(20))
    docs = spark.createDataFrame(
        [(0, f"start here. {jumbo}. end now.")],
        "doc_id long, text string",
    )
    rows = sorted(
        chunk_sentences(docs, budget_tokens=4).collect(),
        key=lambda r: r["chunk_idx"],
    )
    # floor ids would be 0, 0|1?, then jump past the jumbo — dense ids
    # must still be consecutive 0..n
    assert [r["chunk_idx"] for r in rows] == list(range(len(rows)))
    assert rows[-1]["chunk_text"].endswith("end now.")


def test_chunk_sentences_sentences_never_split(spark):
    from pdf_context_extractor_agent_spark.functions.webtext import chunk_sentences

    docs = spark.createDataFrame(
        [(7, "alpha beta gamma delta. epsilon zeta. eta theta iota kappa.")],
        "doc_id long, text string",
    )
    out = chunk_sentences(docs, budget_tokens=3).collect()
    joined = " ".join(
        r["chunk_text"] for r in sorted(out, key=lambda r: r["chunk_idx"])
    )
    assert joined == "alpha beta gamma delta. epsilon zeta. eta theta iota kappa."


# ---------------------------------------- corpus-frequency boilerplate


def test_strip_frequent_lines_removes_from_all_docs(spark):
    from pdf_context_extractor_agent_spark.functions.webtext import (
        strip_frequent_lines,
    )

    banner = "accept all cookies"
    docs = spark.createDataFrame(
        [
            (0, f"{banner}\nunique zero"),
            (1, f"{banner}\nunique one"),
            (2, f"{banner}\nunique two"),
            (3, "no banner here"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in strip_frequent_lines(docs, min_docs=3).collect()}
    # unlike owner-dedup, NO document keeps the banner
    for d in (0, 1, 2):
        assert got[d]["kept_text"] == f"unique {['zero','one','two'][d]}"
        assert got[d]["n_removed"] == 1 and got[d]["n_lines"] == 2
    assert got[3]["kept_text"] == "no banner here" and got[3]["n_removed"] == 0


def test_strip_frequent_lines_threshold_and_duplicates_within_doc(spark):
    from pdf_context_extractor_agent_spark.functions.webtext import (
        strip_frequent_lines,
    )

    docs = spark.createDataFrame(
        [
            (0, "twice\ntwice\nkeep a"),  # 2 copies but ONE distinct doc
            (1, "twice\nkeep b"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in strip_frequent_lines(docs, min_docs=3).collect()}
    # distinct-doc count is 2 < 3 → nothing removed
    assert got[0]["n_removed"] == 0 and got[0]["kept_text"] == "twice\ntwice\nkeep a"

    got2 = {r["doc_id"]: r for r in strip_frequent_lines(docs, min_docs=2).collect()}
    assert got2[0]["kept_text"] == "keep a" and got2[0]["n_removed"] == 2
    assert got2[1]["kept_text"] == "keep b"


def test_strip_frequent_lines_all_boiler_doc_survives_empty(spark):
    from pdf_context_extractor_agent_spark.functions.webtext import (
        strip_frequent_lines,
    )

    docs = spark.createDataFrame(
        [(i, "only boiler") for i in range(4)],
        "doc_id long, text string",
    )
    got = strip_frequent_lines(docs, min_docs=3).collect()
    assert len(got) == 4
    assert all(r["kept_text"] == "" and r["n_removed"] == 1 for r in got)


# --------------------------------------------------------------------------
# markdown rendering
# --------------------------------------------------------------------------

def test_render_markdown_block_kinds(spark):
    from pdf_context_extractor_agent_spark.functions.webtext import render_markdown

    blocks = spark.createDataFrame(
        [
            # scrambled seq order on purpose — assembly must sort
            (1, 3, "li", "second item", None),
            (1, 0, "h1", "Title", None),
            (1, 2, "li", "first item", None),
            (1, 1, "p", "A paragraph.", None),
            (1, 4, "h3", "Deep", None),
            (1, 5, "table", None, [["h1", "h2"], ["a", "b"], ["c", "d"]]),
        ],
        "doc_id int, seq int, kind string, text string, cells array<array<string>>",
    )
    md = render_markdown(blocks).collect()[0]["markdown"]
    assert md == (
        "# Title\n\nA paragraph.\n\n- first item\n\n- second item\n\n"
        "### Deep\n\n"
        "| h1 | h2 |\n| --- | --- |\n| a | b |\n| c | d |"
    )


def test_render_markdown_edge_tables(spark):
    from pdf_context_extractor_agent_spark.functions.webtext import render_markdown

    blocks = spark.createDataFrame(
        [
            (1, 0, "table", None, [["only", "header"]]),  # header-only
            (2, 0, "table", None, []),                     # empty → ""
            (3, 0, "table", None, None),                   # null → ""
        ],
        "doc_id int, seq int, kind string, text string, cells array<array<string>>",
    )
    got = {r["doc_id"]: r["markdown"] for r in render_markdown(blocks).collect()}
    assert got[1] == "| only | header |\n| --- | --- |"
    assert got[2] == ""
    assert got[3] == ""


def test_markdown_from_kernel_pages(page_df):
    """Kernel bridge: every parsed doc renders to markdown; table rows
    appear as pipe rows, narrative lines as paragraphs, and no line
    that sits inside a table's y-interval is duplicated."""
    from pdf_context_extractor_agent_spark.functions.webtext import (
        markdown_blocks_from_pages,
        render_markdown,
    )

    blocks = markdown_blocks_from_pages(page_df)
    md = render_markdown(blocks)
    rows = md.collect()
    assert len(rows) == page_df.select("url").distinct().count()
    sample = {r["doc_id"]: r["markdown"] for r in rows}
    any_md = next(iter(sample.values()))
    assert any_md.strip() != ""
    # at least one doc has a rendered pipe table
    assert any("| --- |" in v for v in sample.values())


def test_toc_from_blocks_hierarchy(spark):
    from pdf_context_extractor_agent_spark.functions.webtext import toc_from_blocks

    blocks = spark.createDataFrame(
        [
            # h1 Intro / h2 A / h3 A.a / h3 A.b / h2 B / h1 Outro / h2 C
            (1, 0, "h1", "Intro", None),
            (1, 1, "h2", "A", None),
            (1, 2, "h3", "A.a", None),
            (1, 3, "h3", "A.b", None),
            (1, 4, "h2", "B", None),
            (1, 5, "p", "not a heading", None),
            (1, 6, "h1", "Outro", None),
            (1, 7, "h2", "C", None),
            # doc 2 starts at h3: root may be any level
            (2, 0, "h3", "Deep root", None),
            (2, 1, "h4", "Deeper", None),
        ],
        "doc_id int, seq int, kind string, text string, cells array<array<string>>",
    )
    got = {(r["doc_id"], r["seq"]): (r["parent_seq"], r["sec_label"])
           for r in toc_from_blocks(blocks).collect()}
    assert got[(1, 0)] == (None, "1")
    assert got[(1, 1)] == (0, "1.1")
    assert got[(1, 2)] == (1, "1.1.1")
    assert got[(1, 3)] == (1, "1.1.2")
    assert got[(1, 4)] == (0, "1.2")
    assert got[(1, 6)] == (None, "2")
    assert got[(1, 7)] == (6, "2.1")
    assert (1, 5) not in got  # paragraphs are not outline entries
    assert got[(2, 0)] == (None, "1")
    assert got[(2, 1)] == (0, "1.1")


def test_jsonld_records_extraction(spark):
    from pdf_context_extractor_agent_spark.functions.webtext import jsonld_records

    html_a = (
        '<html><head><script type="application/ld+json">'
        '{"@type":"NewsArticle","headline":"Big News","datePublished":'
        '"2024-03-01","author":{"name":"Ada Lovelace"}}</script>'
        '<script type="application/ld+json">{"@type":"Product",'
        '"name":"Widget"}</script></head><body>x</body></html>'
    )
    html_bad = (
        '<html><script type="application/ld+json">{not json</script>'
        '<script type="application/ld+json">{"noType": 1}</script></html>'
    )
    df = spark.createDataFrame(
        [("a", html_a), ("b", html_bad), ("c", "<html>no ld</html>"),
         ("d", None)],
        "url string, html string",
    )
    rows = {(r["url"], r["ld_idx"]): r for r in jsonld_records(df).collect()}
    assert set(rows) == {("a", 0), ("a", 1)}
    art = rows[("a", 0)]
    assert (art["ld_type"], art["title"], art["published"], art["author"]) == (
        "NewsArticle", "Big News", "2024-03-01", "Ada Lovelace"
    )
    prod = rows[("a", 1)]
    assert (prod["ld_type"], prod["title"], prod["author"]) == (
        "Product", "Widget", None
    )


def test_pagination_chains_and_stitching(spark):
    from pdf_context_extractor_agent_spark.functions.webtext import (
        pagination_chains,
        stitch_paginated,
    )

    links = spark.createDataFrame(
        [
            ("a1", "a2"), ("a2", "a3"), ("a3", "a4"),   # 4-page article
            ("b1", "b2"),                                # 2-page article
            ("x", "y"), ("y", "z"), ("z", "x"),          # cycle → dropped
        ],
        "url string, next_url string",
    )
    got = {r["url"]: (r["root"], r["pos"])
           for r in pagination_chains(links).collect()}
    assert got == {
        "a1": ("a1", 0), "a2": ("a1", 1), "a3": ("a1", 2), "a4": ("a1", 3),
        "b1": ("b1", 0), "b2": ("b1", 1),
    }
    pages = spark.createDataFrame(
        [(u, f"text-{u}") for u in ["a1", "a2", "a3", "a4", "b1", "b2"]],
        "url string, text string",
    )
    st = {r["root"]: (r["n_pages"], r["full_text"])
          for r in stitch_paginated(pages, links).collect()}
    assert st["a1"] == (4, "text-a1\ntext-a2\ntext-a3\ntext-a4")
    assert st["b1"] == (2, "text-b1\ntext-b2")


def test_pagination_long_chain_needs_doubling(spark):
    """A 30-page chain resolves within 5 doubling rounds (2^5 = 32),
    proving the log-round bound rather than one-hop-per-round."""
    from pdf_context_extractor_agent_spark.functions.webtext import (
        pagination_chains,
    )

    links = spark.createDataFrame(
        [(f"p{i}", f"p{i+1}") for i in range(29)], "url string, next_url string"
    )
    got = {r["url"]: r["pos"] for r in pagination_chains(links, rounds=5).collect()}
    assert got[f"p{29}"] == 29 and got["p0"] == 0 and len(got) == 30


def test_pagination_inbound_collision_keeps_min_claimant(spark):
    from pdf_context_extractor_agent_spark.functions.webtext import (
        pagination_chains,
    )

    links = spark.createDataFrame(
        [("a", "shared"), ("b", "shared")], "url string, next_url string"
    )
    got = {r["url"]: (r["root"], r["pos"])
           for r in pagination_chains(links).collect()}
    # 'shared' hangs off the min claimant; both claimants are roots
    assert got["shared"] == ("a", 1)
    assert got["a"] == ("a", 0) and got["b"] == ("b", 0)


def test_line_offsets_invariant(spark):
    from pdf_context_extractor_agent_spark.functions.webtext import line_offsets

    docs = spark.createDataFrame(
        [(1, "first line\nsecond\n\nfourth é line"), (2, ""), (3, None)],
        "doc_id int, text string",
    )
    rows = line_offsets(docs).collect()
    texts = {1: "first line\nsecond\n\nfourth é line", 2: "", 3: ""}
    for r in rows:
        t = texts[r["doc_id"]]
        assert t[r["start"]:r["end"]] == r["line"]
    by1 = sorted((r["line_no"], r["start"], r["end"]) for r in rows
                 if r["doc_id"] == 1)
    assert by1 == [(0, 0, 10), (1, 11, 17), (2, 18, 18), (3, 19, 32)]


def test_domain_frequent_lines_scoping(spark):
    """Per-site nav removed; a line shared 2× across EACH of two
    domains survives (the global rule would kill it at corpus count 4)."""
    from pdf_context_extractor_agent_spark.functions.webtext import (
        domain_frequent_lines,
        strip_frequent_lines,
    )

    rows = []
    for dom in ("alpha.com", "beta.org"):
        for i in range(3):
            rows.append((
                f"https://www.{dom}/p{i}",
                f"NAV-{dom}\n" + ("Terms apply.\n" if i < 2 else "")
                + f"unique body {dom} {i}",
            ))
    df = spark.createDataFrame(rows, "url string, text string")
    out = {r["url"]: r for r in domain_frequent_lines(df, min_docs=3).collect()}
    for dom in ("alpha.com", "beta.org"):
        for i in range(3):
            r = out[f"https://www.{dom}/p{i}"]
            assert r["domain"] == dom
            assert f"NAV-{dom}" not in r["kept_text"]       # per-site chrome
            if i < 2:
                assert "Terms apply." in r["kept_text"]      # 2 < min_docs
    # the corpus-global rule at the same threshold kills the terms line
    glob = strip_frequent_lines(
        df.withColumnRenamed("url", "doc_id"), min_docs=3
    )
    assert all("Terms apply." not in r["kept_text"] for r in glob.collect()
               if "p0" in r["doc_id"] or "p1" in r["doc_id"])


def test_script_ratio_and_meta_refresh(spark):
    from pdf_context_extractor_agent_spark.functions.webtext import (
        meta_refresh_target,
        script_ratio,
    )

    rows = [
        ("plain", "<html><body>hello</body></html>"),
        ("heavy", "<script>a</script><script>bb</script>x"),
        ("redir", "<META HTTP-EQUIV='Refresh' CONTENT='5; URL=https://t.co/x'>"),
        ("none", None),
    ]
    df = spark.createDataFrame(rows, "k string, html string")
    got = {r["k"]: (r["sr"], r["rt"]) for r in df.select(
        "k", script_ratio(F.col("html")).alias("sr"),
        meta_refresh_target(F.col("html")).alias("rt")).collect()}
    assert got["plain"] == (0.0, None)
    h = "<script>a</script><script>bb</script>x"
    expect = int(len("<script>a</script>") + len("<script>bb</script>")
                 ) / len(h)
    assert abs(got["heavy"][0] - (int(expect * 10000) / 10000)) < 1e-12
    assert got["redir"] == (0.0, "https://t.co/x")
    assert got["none"] == (0.0, None)


def test_unescape_docs_entities(spark):
    from pdf_context_extractor_agent_spark.functions.webtext import unescape_docs

    docs = spark.createDataFrame(
        [
            (1, "A &amp; B &lt;x&gt; caf&#233; q&#8217; e&#x1F600;"),
            (2, "&amp;lt; stays literal-once: &#38;lt; too"),
            (3, "bad &#boom; sur &#55296; big &#1114112; zero &#0;"),
            (4, None),
        ],
        "doc_id int, text string",
    )
    got = {r["doc_id"]: r["unescaped"] for r in unescape_docs(docs).collect()}
    assert got[1] == "A & B <x> café q’ e😀"
    # single-decode semantics: both spellings of &amp;lt; → literal &lt;
    assert got[2] == "&lt; stays literal-once: &lt; too"
    # invalid refs stay verbatim
    assert got[3] == "bad &#boom; sur &#55296; big &#1114112; zero &#0;"
    assert got[4] == ""


def test_frequent_lines_never_strip_paragraph_breaks(spark):
    """Blank lines are document structure, not boilerplate: they appear
    in every document, but must never be flagged frequent."""
    from pdf_context_extractor_agent_spark.functions.webtext import (
        strip_frequent_lines,
    )

    docs = spark.createDataFrame(
        [(i, f"unique para one {i}\n\nunique para two {i}\nshared footer line")
         for i in range(5)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in strip_frequent_lines(docs, min_docs=3).collect()}
    for i in range(5):
        # the shared footer goes; the empty line (paragraph break) stays
        assert out[i].n_removed == 1
        assert out[i].kept_text == f"unique para one {i}\n\nunique para two {i}"
