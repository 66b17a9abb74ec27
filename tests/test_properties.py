"""Property-based tests (hypothesis) — the reference has none
(SURVEY.md §5); these pin algebraic invariants the fuzz/differential
suites don't state explicitly."""

from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_context_extractor_agent_spark.corpus import render_pdfish, render_text
from pdf_context_extractor_agent_spark.kernels import parse_pdfish
from pdf_context_extractor_agent_spark.operators.columns import (
    analyze_columns,
    clean_numeric,
    is_money_format,
)

_CELL = st.sampled_from(
    ["项目", "本期末", "上期末", "附注", "货币资金", "1,000.00", "-5.0",
     "七、1", "", "x y", "123", "资产总计"]
)
_WORD = st.text(
    alphabet="abcdefg数表计净12.5", min_size=1, max_size=6
).filter(lambda w: w.strip() == w and w)


@settings(max_examples=150, deadline=None)
@given(st.lists(_CELL, min_size=1, max_size=6))
def test_analyze_columns_invariants(row):
    cmap = analyze_columns(row)
    # indexes in range; current strictly left of previous when both set
    for v in cmap.values():
        assert 0 <= v < len(row)
    if "current_period" in cmap and "previous_period" in cmap:
        # ≤, not <: a single cell like 上期末 matches BOTH period banks
        # (期末 ⊂ 上期末), so both roles can land on one column — the
        # reference behaves identically (independent keyword passes)
        assert cmap["current_period"] <= cmap["previous_period"]
    # roles map to distinct concepts but may share a column only via
    # the keyword pass; the map itself is a partial function
    assert set(cmap) <= {"item_name", "current_period", "previous_period", "note"}


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="0123456789,.-元 人民币ab", max_size=20))
def test_clean_numeric_idempotent_and_shape(s):
    out = clean_numeric(s)
    if out is not None:
        # idempotence: cleaning a cleaned value is a no-op
        assert clean_numeric(out) == out
        assert all(c in "0123456789.-" for c in out)


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=-10**9, max_value=10**9))
def test_money_format_accepts_rendered_numbers(n):
    assert is_money_format(f"{n}")
    assert is_money_format(f"{n:,}")
    assert is_money_format(f"{n}.25")


@settings(max_examples=60, deadline=None)
@given(
    st.lists(  # pages
        st.lists(  # blocks
            st.one_of(
                st.lists(_WORD, min_size=1, max_size=6).map(lambda ws: ("p", " ".join(ws))),
                # rectangular tables only: a ruling-line grid defines a
                # fixed arity, so ragged logical rows are normalized by
                # the geometry (pdfish is a GRID format, unlike HTML)
                st.integers(min_value=1, max_value=4).flatmap(
                    lambda ncols: st.lists(
                        st.lists(st.one_of(_WORD, st.just("")),
                                 min_size=ncols, max_size=ncols),
                        min_size=1,
                        max_size=4,
                    )
                ).map(lambda rows: ("table", rows)),
            ),
            min_size=1,
            max_size=4,
        ),
        min_size=1,
        max_size=2,
    )
)
def test_pdfish_roundtrip_property(pages):
    """render ∘ parse is the identity on page text for ANY content
    model expressible in the corpus block language."""
    got = "\n".join(p["page_text"] for p in parse_pdfish(render_pdfish(pages)))
    assert got == render_text(pages)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.lists(
            st.one_of(
                st.lists(_WORD, min_size=1, max_size=6).map(lambda ws: ("p", " ".join(ws))),
                st.integers(min_value=1, max_value=4).flatmap(
                    lambda ncols: st.lists(
                        st.lists(st.one_of(_WORD, st.just("")),
                                 min_size=ncols, max_size=ncols),
                        min_size=1,
                        max_size=4,
                    )
                ).map(lambda rows: ("table", rows)),
            ),
            min_size=1,
            max_size=3,
        ),
        min_size=1,
        max_size=2,
    )
)
def test_minipdf_roundtrip_property(pages):
    """The real-PDF writer ∘ content-stream tokenizer is also the
    identity on page text for any content model."""
    from pdf_context_extractor_agent_spark.corpus import render_minipdf_doc
    from pdf_context_extractor_agent_spark.kernels import parse_doc

    got = "\n".join(p["page_text"] for p in parse_doc(render_minipdf_doc(pages)))
    assert got == render_text(pages)


def test_mask_pii_idempotent(spark):
    """Masking already-masked text is a no-op (replacement tokens never
    re-match any PII pattern)."""
    import pyspark.sql.functions as F

    from pdf_context_extractor_agent_spark.functions.quality import mask_pii

    docs = spark.createDataFrame(
        [(0, "a@b.com and +123-456-7890"), (1, "plain"), (2, "x.y%z@q.io t 555-1234-0000")],
        "doc_id long, text string",
    )
    once = docs.select("doc_id", mask_pii(F.col("text")).alias("m"))
    twice = once.select("doc_id", mask_pii(F.col("m")).alias("m"))
    assert [r.m for r in once.orderBy("doc_id").collect()] == [
        r.m for r in twice.orderBy("doc_id").collect()
    ]


def test_chunk_dedup_invariants(spark):
    """Over the real documents table: removals are bounded by chunk
    counts, and every distinct chunk survives in exactly its owner."""
    import pyspark.sql.functions as F

    from pdf_context_extractor_agent_spark.functions.dedup import chunk_dedup, doc_chunks
    from pdf_context_extractor_agent_spark.sources import load_table

    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    out = chunk_dedup(docs)
    assert out.filter((F.col("n_removed") < 0) | (F.col("n_removed") > F.col("n_chunks"))).count() == 0
    # conservation: kept occurrences == occurrences whose doc is the owner
    ch = doc_chunks(docs)
    owners = ch.groupBy("chunk").agg(F.min("doc_id").alias("owner"))
    expect_kept = ch.join(owners, "chunk").filter(F.col("owner") == F.col("doc_id")).count()
    got_kept = out.agg(F.sum(F.col("n_chunks") - F.col("n_removed"))).first()[0]
    assert got_kept == expect_kept


def test_duplicate_spans_invariants(spark):
    """Over the real documents table at k=4: span bounds are sane
    (within token counts, ordered, non-overlapping after the merge),
    canonical exemption keeps at least one copy of every duplicated
    window, and removal token counts equal total span length."""
    import pyspark.sql.functions as F

    from pdf_context_extractor_agent_spark.functions.dedup import (
        _window_occurrences,
        duplicate_spans,
        normalized_text,
        remove_duplicate_spans,
    )
    from pdf_context_extractor_agent_spark.sources import load_table

    k = 4
    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    spans = duplicate_spans(docs, k=k).cache()

    toks = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(F.split(normalized_text(F.col("text")), " ")).alias("n_tok"),
    )
    bad_bounds = (
        spans.join(toks, "doc_id")
        .filter(
            (F.col("span_start") < 0)
            | (F.col("span_end") > F.col("n_tok"))
            | (F.col("span_end") - F.col("span_start") < k)
        )
        .count()
    )
    assert bad_bounds == 0

    # merged spans in one doc never overlap/touch: next start > prev end - 1
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("span_start")
    overlap = (
        spans.withColumn("prev_end", F.lag("span_end").over(w))
        .filter(F.col("prev_end").isNotNull() & (F.col("span_start") <= F.col("prev_end") - k))
        .count()
    )
    assert overlap == 0

    # canonical exemption: the canonical (doc,pos) of every duplicated
    # window never enters the removable set ITSELF — every one of its
    # doc's spans must be justified by a non-canonical removable window
    # at its start position. (A canonical window's TOKENS can still be
    # clipped when other duplicated windows overlap it and their merged
    # span engulfs it — inherent to span-granularity removal.)
    occ = _window_occurrences(docs, "doc_id", "text", k)
    canon = occ.groupBy("h").agg(
        F.count("*").alias("cnt"), F.min(F.struct("doc_id", "pos")).alias("first")
    ).filter("cnt >= 2")
    removable = (
        occ.join(canon, "h")
        .filter(
            (F.col("doc_id") != F.col("first.doc_id"))
            | (F.col("pos") != F.col("first.pos"))
        )
        .select("doc_id", "pos")
    )
    canon_removable = (
        canon.select(
            F.col("first.doc_id").alias("doc_id"), F.col("first.pos").alias("pos")
        )
        .join(removable, ["doc_id", "pos"], "semi")
        .count()
    )
    assert canon_removable == 0
    # ...and every span STARTS at a removable window position
    unjustified = spans.join(
        removable.withColumnRenamed("pos", "span_start"),
        ["doc_id", "span_start"],
        "anti",
    ).count()
    assert unjustified == 0

    # removal conservation: n_removed_tokens == total merged span length
    removed = remove_duplicate_spans(docs, spans)
    lhs = removed.agg(F.sum("n_removed_tokens")).first()[0] or 0
    rhs = spans.agg(F.sum(F.col("span_end") - F.col("span_start"))).first()[0] or 0
    assert lhs == rhs


def test_resolve_choices_partitions_tables(spark):
    """Every compared table lands in exactly one of chosen/skipped, and
    chosen rows always come from the side the log says won."""
    import pyspark.sql.functions as F

    from pdf_context_extractor_agent_spark.operators.compare import (
        compare_column_maps,
        resolve_choices,
    )

    rows_l = [(f"d{i}", "bs", i % 4, (i + 1) % 4, (i + 2) % 4, None) for i in range(40)]
    rows_r = [
        (f"d{i}", "bs", i % 4, (i + 1 + (i % 3 == 0)) % 4, (i + 2) % 4, None)
        for i in range(40)
    ]
    schema = (
        "url string, statement_type string, item_col int, cur_col int, "
        "prev_col int, note_col int"
    )
    left = spark.createDataFrame(rows_l, schema)
    right = spark.createDataFrame(rows_r, schema)
    choices = spark.createDataFrame(
        [(f"d{i}", "bs", ["left", "right", "skip"][i % 3]) for i in range(0, 40, 5)],
        "url string, statement_type string, choice string",
    )
    summary = compare_column_maps(left, right)["summary"]
    res = resolve_choices(left, right, summary, policy="right", choices=choices)
    log = res["choices_log"].cache()
    chosen = res["chosen"].cache()

    assert log.count() == 40
    n_skip = log.filter("choice = 'skip'").count()
    assert chosen.count() == 40 - n_skip
    # chosen_from always equals the logged choice
    mismatch = (
        chosen.join(log.select("url", "statement_type", "choice"), ["url", "statement_type"])
        .filter(F.col("chosen_from") != F.col("choice"))
        .count()
    )
    assert mismatch == 0
    # matched tables are never skipped, whatever history says
    assert log.filter("n_diff = 0 AND choice <> 'left'").count() == 0


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 10),
    color_type=st.sampled_from([0, 2, 4, 6]),
    seed=st.integers(0, 2**31 - 1),
    data=st.data(),
)
def test_png_decoder_roundtrip_fuzz(w, h, color_type, seed, data):
    """Any 8-bit non-interlaced PNG — random pixels, random per-row
    filter choices — decodes to exactly the encoded pixels (grayscale)
    or their BT.601 integer luma (color)."""
    import numpy as np

    from pdf_context_extractor_agent_spark.functions.multimodal import _decode_png
    from tests.test_textops import _encode_png

    channels = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(h, w, channels), dtype=np.uint8)
    filters = data.draw(st.lists(st.integers(0, 4), min_size=1, max_size=h))
    got_w, got_h, gray = _decode_png(_encode_png(arr, color_type, filters))
    assert (got_w, got_h) == (w, h)
    if channels <= 2:
        exp = arr[:, :, 0]
    else:
        a32 = arr.astype(np.uint32)
        exp = ((299 * a32[:, :, 0] + 587 * a32[:, :, 1] + 114 * a32[:, :, 2])
               // 1000).astype(np.uint8)
    assert np.array_equal(gray, exp)
