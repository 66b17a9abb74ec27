"""End-to-end curation plan (plans/curate.py): audit verdicts, stage
composition, optional blocklist stage."""

from __future__ import annotations

from pdf_context_extractor_agent_spark.plans.curate import curate


LONG_A = "alpha beta gamma delta epsilon zeta eta theta " * 4  # 32 words
LONG_B = "one two three four five six seven eight nine ten " * 4


def _docs(spark):
    return spark.createDataFrame(
        [
            (0, LONG_A, "https://good.com/a"),
            (1, LONG_A, "https://good.com/b"),        # exact dup of 0
            (2, LONG_A + "tail word", "https://good.com/c"),  # near dup of 0
            (3, LONG_B, "https://good.com/d"),        # unique survivor
            (4, "too short", "https://good.com/e"),   # gated
            (5, LONG_B + "x y", "https://BAD.com/f"),  # near dup of 3 + blocked
        ],
        "doc_id long, text string, url string",
    )


def test_curate_verdicts_cover_every_input_doc(spark):
    out = curate(_docs(spark), gates={"min_words": 5})
    v = {r.doc_id: r for r in out["verdicts"].collect()}
    assert set(v) == {0, 1, 2, 3, 4, 5}

    assert v[0].kept and not v[0].exact_dup and not v[0].near_dup_shadowed
    assert v[1].exact_dup and not v[1].kept
    assert v[2].near_dup_shadowed and v[2].component == 0 and not v[2].kept
    assert v[3].kept
    # 2 words: short AND its single bigram is 100% of all bigrams
    assert v[4].gate_reasons == ["too_short", "repetitive"] and not v[4].kept
    assert v[5].near_dup_shadowed and v[5].component == 3

    corpus_ids = {r.doc_id for r in out["corpus"].select("doc_id").collect()}
    assert corpus_ids == {0, 3}
    splits = {r.split for r in out["corpus"].collect()}
    assert splits <= {"train", "val", "test"}


def test_curate_blocklist_stage_prepends_gate_reason(spark):
    bl = spark.createDataFrame([("bad.com",)], "entry string")
    out = curate(_docs(spark), gates={"min_words": 5}, blocklist=bl)
    v = {r.doc_id: r for r in out["verdicts"].collect()}
    assert v[5].gate_reasons[0] == "blocked_domain"
    assert not v[5].kept
    # doc 5 no longer shadows anything, and doc 3 still survives alone
    assert not v[5].near_dup_shadowed
    assert v[3].kept
    # unblocked docs unchanged
    assert v[0].kept and v[1].exact_dup
    corpus_ids = {r.doc_id for r in out["corpus"].select("doc_id").collect()}
    assert corpus_ids == {0, 3}
