"""XY-cut reading order + column-alignment table detection.

The north-star layout engine (BASELINE.json) clusters glyphs "into
text lines and blocks via XY-cut/whitespace-gap analysis" and detects
tables "from ruling lines and column alignment". These tests cover the
two halves the ruling-grid path doesn't: multi-column reading order
and unruled (alignment-only) tables — plus the corpus slices whose
byte-identity certifies both end-to-end (reference parity target:
pdfplumber's layout/table strategies, src/pdf_reader.py:61-100).
"""

from pdf_context_extractor_agent_spark.corpus import make_doc, doc_content, render_text
from pdf_context_extractor_agent_spark.kernels import minipdf_layout
from pdf_context_extractor_agent_spark.kernels.pdfish_layout import (
    _detect_aligned,
    _xy_cut,
    assemble_pages,
    parse_pdfish,
)


def _page(runs, h=(), v=()):
    return assemble_pages(
        [{"runs": list(runs), "h": list(h), "v": list(v), "width": 612.0, "height": 792.0}]
    )[0]


# ---------------------------------------------------------------- XY-cut


def test_xycut_two_columns_read_left_then_right():
    # two columns at identical Ys; flat Y sort would interleave L1 R1 L2 R2
    runs = [
        (20, 20, "L1"), (340, 20, "R1"),
        (20, 32, "L2"), (340, 32, "R2"),
    ]
    assert _page(runs)["page_text"] == "L1\nL2\nR1\nR2"


def test_xycut_title_band_then_columns():
    # a short full-width-band title reads first, then left column, then right
    runs = [
        (20, 20, "title"),
        (20, 44, "La"), (340, 44, "Ra"),
        (20, 56, "Lb"), (340, 56, "Rb"),
    ]
    assert _page(runs)["page_text"] == "title\nLa\nLb\nRa\nRb"


def test_xycut_nested_bands_inside_column():
    # the right column itself splits into two Y bands ≥ GUTTER_Y apart
    runs = [
        (20, 20, "L1"), (20, 32, "L2"),
        (340, 20, "R1"), (340, 80, "R2"),
    ]
    assert _page(runs)["page_text"] == "L1\nL2\nR1\nR2"


def test_xycut_single_column_is_one_leaf():
    # word gaps (6 px) and leading (12 px) never qualify as cuts
    runs = [(20, 20, "alpha"), (56, 20, "beta"), (20, 32, "gamma")]
    leaves = _xy_cut(runs, [])
    assert len(leaves) == 1
    assert _page(runs)["page_text"] == "alpha beta\ngamma"


def test_xycut_wide_run_blocks_column_cut():
    # a run spanning the gutter fuses the bands: no cut through glyphs
    runs = [
        (20, 20, "a-very-very-long-headline-crossing-the-whole-page-width-here"),
        (20, 32, "L"), (340, 32, "R"),
    ]
    leaves = _xy_cut(runs, [])
    assert len(leaves) == 1  # Y gap is only 12 → no horizontal cut either


def test_xycut_never_slices_table_boxes():
    # box extent covers the gutter band → stays atomic
    box = {"x0": 20, "x1": 400, "y0": 40, "y1": 64,
           "rows_at": [(40, ["a", "b"]), (52, ["c", "d"])]}
    runs = [(20, 20, "L"), (340, 20, "R")]
    leaves = _xy_cut(runs, [box])
    flat_boxes = [b for _rs, bs in leaves for b in bs]
    assert flat_boxes == [box]


# ------------------------------------------- alignment-table detection


def test_aligned_three_rows_two_columns_detected():
    runs = [
        (20, 20, "h1"), (80, 20, "h2"),
        (20, 32, "a1"), (80, 32, "a2"),
        (20, 44, "b1"), (80, 44, "b2"),
    ]
    tables, leftover = _detect_aligned(runs)
    assert leftover == []
    assert len(tables) == 1
    assert [r for _y, r in tables[0]["rows_at"]] == [
        ["h1", "h2"], ["a1", "a2"], ["b1", "b2"]
    ]
    # end-to-end: rows join by tabs, like ruled-grid tables
    assert _page(runs)["page_text"] == "h1\th2\na1\ta2\nb1\tb2"
    assert _page(runs)["tables"][0][3] == [["h1", "h2"], ["a1", "a2"], ["b1", "b2"]]


def test_aligned_needs_min_rows():
    # two aligned lines stay prose (space-joined), not a table
    # (44 - (20 + 2*6) = 12 px gap: below the column-gutter threshold)
    runs = [(20, 20, "a1"), (44, 20, "a2"), (20, 32, "b1"), (44, 32, "b2")]
    tables, leftover = _detect_aligned(runs)
    assert tables == [] and len(leftover) == 4
    assert _page(runs)["page_text"] == "a1 a2\nb1 b2"


def test_aligned_prose_signature_break_stops_group():
    # a line whose anchors differ (word-wrap) breaks the run of rows
    runs = [
        (20, 20, "a1"), (80, 20, "a2"),
        (20, 32, "b1"), (80, 32, "b2"),
        (20, 44, "prose"), (60, 44, "wraps"),
        (20, 56, "c1"), (80, 56, "c2"),
    ]
    tables, _ = _detect_aligned(runs)
    assert tables == []


def test_aligned_single_anchor_lines_immune():
    # every paragraph line shares only the left margin anchor
    runs = [(20, 20 + 12 * k, f"word{k}") for k in range(6)]
    tables, leftover = _detect_aligned(runs)
    assert tables == [] and len(leftover) == 6


# ------------------------------------------------- corpus certification


def test_corpus_twocol_docs_need_xycut_and_match():
    """Slice i%30∈{3,4,14,23} appends a two-column page; byte identity
    holds AND a flat Y re-sort provably differs (the slice genuinely
    exercises XY-cut, it can't pass vacuously)."""
    for i in (3, 23, 33):  # FPDF1 twocol docs
        _u, _t, blob, golden, _l = make_doc(i)
        pages = parse_pdfish(blob)
        assert "\n".join(p["page_text"] for p in pages) == golden
        twocol = next(p for p in pages if "appendix digest" in p["page_text"])
        # columns share Ys: a flat (y, x) interleave provably differs
        ys = [y for y, _t in twocol["lines"]]
        assert ys != sorted(ys)


def test_corpus_twocol_composes_with_cid_minipdf():
    # slice 4: two-column page inside a CID-encoded (Type0/ToUnicode)
    # minipdf; 124 additionally routes /Encoding through a scrambled CMap
    for i in (4, 34, 124):
        _u, _t, blob, golden, _l = make_doc(i)
        pages = minipdf_layout.parse_minipdf(blob)
        assert "\n".join(p["page_text"] for p in pages) == golden


def test_corpus_aligned_table_docs_detected_and_match():
    for i, parse in ((13, parse_pdfish), (23, parse_pdfish),
                     (24, minipdf_layout.parse_minipdf)):
        _u, _t, blob, golden, _l = make_doc(i)
        pages = parse(blob)
        assert "\n".join(p["page_text"] for p in pages) == golden
        # the appended page's table arrived with zero ruling segments
        atable = pages[-1]["tables"][-1][3]
        assert atable[0] == ["metr0", "cur0", "prv0"]
        assert len(atable) == 5


def test_corpus_golden_text_spec_for_new_blocks():
    # render_text: markers vanish, atable rows join by tabs
    pages = [[("p", "t"), ("colstart", None), ("p", "l"),
              ("colbreak", None), ("p", "r"),
              ("atable", [["a", "b"], ["c", "d"]])]]
    assert render_text(pages) == "t\nl\nr\na\tb\nc\td"


def test_statement_parse_unaffected_by_appended_layout_pages():
    # the appended pages carry no statement markers; kinds 3 and 13
    # must keep identical statement content apart from the extra page
    pages3, _ = doc_content(3)
    pages13, _ = doc_content(13)
    assert pages3[:-1] != pages3  # appended page exists
    assert [b for p in pages3[:-1] for b in p if b[0] == "table"] \
        != [b for p in pages13[:-1] for b in p if b[0] == "table"]  # different m
