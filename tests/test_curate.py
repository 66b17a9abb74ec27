"""End-to-end curation plan (plans/curate.py): audit verdicts, stage
composition, optional blocklist stage, optional cross-snapshot Bloom
stage."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_context_extractor_agent_spark.functions.bloom import bloom_build
from pdf_context_extractor_agent_spark.functions.dedup import normalized_text
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


def test_curate_prior_bloom_drops_previously_seen_content(spark):
    docs = _docs(spark)
    # prior snapshot contained LONG_A content: build the history filter
    # over its digest, exactly as a previous curate run would persist it
    prior = spark.createDataFrame([(LONG_A,)], "text string").select(
        F.md5(normalized_text(F.col("text"))).alias("digest")
    )
    bloom = bloom_build(prior, "digest", 1 << 14, 5)
    out = curate(docs, gates={"min_words": 5}, prior_bloom=bloom, bloom_m=1 << 14)
    v = {r.doc_id: r for r in out["verdicts"].collect()}
    # docs 0 and 1 carry the prior snapshot's exact content → gated out
    assert v[0].gate_reasons[0] == "seen_in_prior_snapshot" and not v[0].kept
    assert v[1].gate_reasons[0] == "seen_in_prior_snapshot" and not v[1].kept
    # the near-dup (extra tail word → different digest) sails through
    # the Bloom stage and, with 0/1 gone, becomes its own canonical
    assert v[2].gate_reasons == [] and v[2].kept
    assert v[3].kept
    corpus_ids = {r.doc_id for r in out["corpus"].select("doc_id").collect()}
    assert corpus_ids == {2, 3}


def test_curate_blocked_domain_reason_stays_first_and_gated_docs_skip_probe(spark):
    """Gate-reason ordering contract: blocked_domain first, then
    seen_in_prior_snapshot, then quality flags. And the Bloom stage
    digests only quality-clean docs — a doc already gated on quality
    reports no seen reason (its md5 is never computed)."""
    docs = spark.createDataFrame(
        [
            (0, LONG_A, "https://bad.com/a"),   # blocked AND previously seen
            (1, "too short", "https://good.com/b"),  # quality-gated, seen content
            (2, LONG_B, "https://good.com/c"),  # clean survivor
        ],
        "doc_id long, text string, url string",
    )
    prior = spark.createDataFrame(
        [(LONG_A,), ("too short",)], "text string"
    ).select(F.md5(normalized_text(F.col("text"))).alias("digest"))
    bloom = bloom_build(prior, "digest", 1 << 14, 5)
    bl = spark.createDataFrame([("bad.com",)], "entry string")
    out = curate(
        docs, gates={"min_words": 5}, blocklist=bl,
        prior_bloom=bloom, bloom_m=1 << 14,
    )
    v = {r.doc_id: r for r in out["verdicts"].collect()}
    assert v[0].gate_reasons == ["blocked_domain", "seen_in_prior_snapshot"]
    # quality reasons only — the seen probe was skipped for this doc
    assert v[1].gate_reasons == ["too_short", "repetitive"]
    assert v[2].kept and v[2].gate_reasons == []


def test_run_curation_cli(tmp_path):
    """The curation CLI writes corpus/ + verdicts/ (+ stats/ + packed/)
    and reports an honest kept/drop summary."""
    import subprocess
    import sys

    out = tmp_path / "cur"
    r = subprocess.run(
        [sys.executable, "scripts/run_curation.py",
         "--input", "/root/testdata/sf0.001/documents.parquet",
         "--output", str(out), "--cores", "4", "--stats", "--pack", "256"],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "curated:" in r.stdout and "kept" in r.stdout
    import duckdb

    n_corpus = duckdb.sql(f"SELECT count(*) FROM '{out}/corpus/*.parquet'").fetchone()[0]
    n_verd = duckdb.sql(f"SELECT count(*) FROM '{out}/verdicts/*.parquet'").fetchone()[0]
    n_in = duckdb.sql(
        "SELECT count(*) FROM '/root/testdata/sf0.001/documents.parquet'"
    ).fetchone()[0]
    assert n_verd == n_in          # audit: one verdict per input doc
    assert 0 < n_corpus <= n_in
    assert duckdb.sql(f"SELECT count(*) FROM '{out}/stats/*.parquet'").fetchone()[0] > 0
    assert duckdb.sql(f"SELECT count(*) FROM '{out}/packed/*.parquet'").fetchone()[0] > 0
