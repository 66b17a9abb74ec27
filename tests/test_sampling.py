"""Data-mixing / decontamination operators (functions/sampling.py)."""

import pyspark.sql.functions as F

from pdf_context_extractor_agent_spark.functions.sampling import (
    assign_splits,
    pack_sequences,
    deterministic_uniform,
    ngram_decontaminate,
    stratified_sample,
)


def test_stratified_sample_deterministic_and_quota(spark):
    docs = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("zh").alias("lang"),
    )
    rates = {"en": 0.3, "zh": 0.9}
    a = stratified_sample(docs, rates).orderBy("doc_id").collect()
    b = stratified_sample(docs, rates).orderBy("doc_id").collect()
    assert a == b  # reruns make identical decisions
    by_lang = {r["lang"]: 0 for r in a}
    for r in a:
        by_lang[r["lang"]] += 1
        assert r["u"] < rates[r["lang"]]
    # quotas hold to within binomial noise (1000 draws per stratum)
    assert 250 <= by_lang["en"] <= 350
    assert 850 <= by_lang["zh"] <= 950


def test_stratified_sample_drops_unlisted_strata(spark):
    docs = spark.range(0, 50).select(
        F.col("id").alias("doc_id"), F.lit("fr").alias("lang")
    )
    assert stratified_sample(docs, {"en": 1.0}).count() == 0


def test_deterministic_uniform_range(spark):
    u = spark.range(0, 500).select(
        deterministic_uniform(F.col("id"), "s1").alias("u")
    ).agg(F.min("u"), F.max("u"), F.count_distinct("u")).first()
    assert 0.0 <= u[0] and u[1] < 1.0 and u[2] > 490


def test_ngram_decontaminate_math(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely different words entirely here now"),
            (3, "the quick brown cat sits"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(99, "the quick brown fox runs")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in ngram_decontaminate(docs, bench, n=3).collect()}
    assert set(out) == {1, 2, 3}  # clean docs still present
    # doc 1: 7 distinct 3-grams, hits = {"the quick brown", "quick brown fox"}
    assert out[1]["n_ngrams"] == 7 and out[1]["n_hit"] == 2
    assert abs(out[1]["contamination"] - round(2 / 7, 6)) < 1e-9
    assert out[2]["n_hit"] == 0 and out[2]["contamination"] == 0.0
    # doc 3: 3 distinct 3-grams, hit = {"the quick brown"}
    assert out[3]["n_ngrams"] == 3 and out[3]["n_hit"] == 1


def test_assign_splits_deterministic_partition(spark):
    docs = spark.range(2000).select(F.col("id").alias("doc_id"))
    out = assign_splits(docs, {"train": 0.9, "val": 0.05, "test": 0.05})
    rows = out.collect()
    counts = {}
    for r in rows:
        counts[r["split"]] = counts.get(r["split"], 0) + 1
        # the audited u column alone reproduces the decision
        if r["u"] < 0.9:
            assert r["split"] == "train"
    assert set(counts) <= {"train", "val", "test"}
    assert counts["train"] > 1600 and counts["val"] > 40 and counts["test"] > 40
    # rerun → identical assignment (no RNG anywhere)
    again = {r["doc_id"]: r["split"] for r in assign_splits(
        docs, {"train": 0.9, "val": 0.05, "test": 0.05}).collect()}
    assert all(again[r["doc_id"]] == r["split"] for r in rows)


def test_assign_splits_remainder_labeled_rest(spark):
    docs = spark.range(500).select(F.col("id").alias("doc_id"))
    out = assign_splits(docs, {"train": 0.5})
    labels = {r["split"] for r in out.collect()}
    assert labels == {"train", "rest"}


def test_pack_sequences_offsets_are_global_prefix_sums(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (10 * (i + 1)))) for i in range(40)],
        "doc_id long, text string",
    ).repartition(7)
    out = {r["doc_id"]: r for r in pack_sequences(docs, budget_tokens=64).collect()}
    off = 0
    for i in range(40):
        n = 10 * (i + 1)
        r = out[i]
        assert r["n_tokens"] == n
        assert r["start_offset"] == off
        assert r["first_seq"] == off // 64
        assert r["last_seq"] == (off + n - 1) // 64
        assert r["n_seqs"] == (off + n - 1) // 64 - off // 64 + 1
        off += n


def test_pack_sequences_row_window_is_partitioned(spark):
    """The per-row cumsum window must carry the _pid partition key —
    a global-order window would funnel the whole corpus into one task
    (the offsets window is global but runs over the tiny
    one-row-per-partition dim, which is the point of the design)."""
    import re

    docs = spark.range(100).select(
        F.col("id").alias("doc_id"), F.lit("a b c").alias("text")
    )
    plan = pack_sequences(docs, 16)._jdf.queryExecution().executedPlan().toString()
    # row-level cumsum: partitioned by _pid, ordered by doc_id
    assert re.search(r"windowspecdefinition\(_pid#\d+, doc_id#\d+L ASC", plan), plan
    # and NO window globally ordered by doc_id (no partition key)
    assert not re.search(r"windowspecdefinition\(doc_id#\d+L ASC", plan), plan


def test_stratified_topk_exact_quotas_and_determinism(spark):
    from pdf_context_extractor_agent_spark.functions.sampling import stratified_topk

    docs = spark.range(0, 600).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en")
        .when(F.col("id") % 3 == 1, "zh")
        .otherwise("fr")
        .alias("lang"),
    )
    out = stratified_topk(docs, {"en": 50, "zh": 7, "fr": 500}).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    assert len(by_lang["en"]) == 50
    assert len(by_lang["zh"]) == 7
    # quota above stratum size keeps the whole stratum
    assert len(by_lang["fr"]) == 200
    # ranks are 1..k and selection is rerun-deterministic
    assert sorted(r["rank"] for r in by_lang["zh"]) == list(range(1, 8))
    again = stratified_topk(docs, {"en": 50, "zh": 7, "fr": 500}).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_stratified_topk_drops_unlisted_strata(spark):
    from pdf_context_extractor_agent_spark.functions.sampling import stratified_topk

    docs = spark.range(0, 40).select(
        F.col("id").alias("doc_id"), F.lit("de").alias("lang")
    )
    assert stratified_topk(docs, {"en": 10}).count() == 0


def test_deterministic_shuffle_permutation_and_plan(spark):
    """shuffle_pos is a permutation of 0..n-1, reproducible across
    runs, different under a different salt; the rank window carries
    the _pid partition key (no global-order single-task window)."""
    import re

    from pdf_context_extractor_agent_spark.functions.sampling import (
        deterministic_shuffle,
    )

    docs = spark.range(500).select(F.col("id").alias("doc_id"))
    out = deterministic_shuffle(docs).collect()
    pos = sorted(r["shuffle_pos"] for r in out)
    assert pos == list(range(500))
    again = {r["doc_id"]: r["shuffle_pos"] for r in deterministic_shuffle(docs).collect()}
    assert all(again[r["doc_id"]] == r["shuffle_pos"] for r in out)
    other = {
        r["doc_id"]: r["shuffle_pos"]
        for r in deterministic_shuffle(docs, salt="epoch-2").collect()
    }
    assert any(other[r["doc_id"]] != r["shuffle_pos"] for r in out)
    plan = (
        deterministic_shuffle(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert re.search(r"windowspecdefinition\(_pid#\d+, shuffle_key#\d+ ASC", plan), plan
    assert not re.search(r"windowspecdefinition\(shuffle_key#\d+ ASC", plan), plan


def test_temperature_mix_rates_upweight_low_resource(spark):
    from pdf_context_extractor_agent_spark.functions.sampling import (
        temperature_mix_rates,
    )

    docs = spark.createDataFrame(
        [(i, "en" if i < 900 else "sw") for i in range(1000)],
        "doc_id long, lang string",
    )
    r = {x["stratum"]: x for x in temperature_mix_rates(docs).collect()}
    assert r["en"]["n_docs"] == 900 and r["sw"]["n_docs"] == 100
    # alpha=0.5: sw mix share sqrt(100)/(sqrt(900)+sqrt(100)) = 0.25 —
    # 2.5x its 0.1 proportional share
    assert abs(r["sw"]["p_mix"] - 0.25) < 1e-4
    assert r["en"]["sample_rate"] == 1.0  # max stratum anchors at 1
    assert abs(r["sw"]["sample_rate"] - 1 / 3) < 1e-4  # sqrt(100)/sqrt(900)


def test_sequence_manifest_windows_fill_exactly(spark, tmp_path):
    """Every training window's slices must sum to exactly the token
    budget (except the corpus-final window), slices must tile each doc
    without gaps, and the partitioned shard write must produce one
    directory per shard."""
    from pdf_context_extractor_agent_spark.functions.sampling import (
        sequence_manifest,
        shard_manifest,
        write_shards,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(7 + 13 * i))) for i in range(12)],
        "doc_id long, text string",
    )
    man = sequence_manifest(docs, budget_tokens=32, seqs_per_shard=2)
    rows = man.collect()

    per_seq = {}
    for r in rows:
        per_seq[r.seq_id] = per_seq.get(r.seq_id, 0) + r.tok_len
        assert r.shard_id == r.seq_id // 2
        assert r.tok_len > 0 and r.tok_start >= 0
    last = max(per_seq)
    assert all(per_seq[s] == 32 for s in per_seq if s != last)
    assert 0 < per_seq[last] <= 32

    # slices tile each doc: sorted (tok_start, len) chain covers [0, n)
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.tok_start, r.tok_len))
    n_tok = {i: 7 + 13 * i for i in range(12)}
    for d, slices in by_doc.items():
        pos = 0
        for s, ln in sorted(slices):
            assert s == pos
            pos += ln
        assert pos == n_tok[d]

    sh = {r.shard_id: r for r in shard_manifest(man).collect()}
    assert sum(r.n_seqs for r in sh.values()) == len(per_seq)
    assert all(r.n_tokens == sum(
        tl for row in rows if row.shard_id == k for tl in [row.tok_len]
    ) for k, r in sh.items())

    out = str(tmp_path / "shards")
    write_shards(man, out)
    import os

    dirs = sorted(d for d in os.listdir(out) if d.startswith("shard_id="))
    assert len(dirs) == len(sh)
