"""Training-data mixing and benchmark decontamination.

The two operations every corpus-assembly pipeline runs after cleaning
and dedup (reference scope: the repo's curation layer; these have no
single-document analog in /root/reference — they exist because the
engine's target is corpus assembly at 10^12 documents):

* **stratified sampling** — deterministic per-stratum quota sampling
  ("data mixing": keep 30% of English, 100% of code, 5% of boilerplate).
  A seeded md5 over the document key gives a reproducible uniform in
  [0, 1): the SAME document is kept or dropped in every rerun, on any
  engine, with zero shuffle — the filter lives at the scan, so at
  100 TB this is a column-pruned pushed-down pass, not a job.

* **n-gram decontamination** — flag documents sharing word n-grams with
  a benchmark/eval set (the Lee/Brown-style contamination audit). The
  benchmark side is tiny (thousands of docs) → its distinct-shingle dim
  broadcasts; the corpus side is one explode + two partial-aggregated
  groupBys on doc_id. Nothing all-pairs, nothing python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import shingles


def deterministic_uniform(key: Column, salt: str) -> Column:
    """Reproducible uniform [0, 1) from a key: first 8 hex chars of
    md5(salt:key) over 2^32. Engine-agnostic (the DuckDB oracle uses
    the identical formula), stable across reruns and cluster sizes —
    the property that makes sampling decisions auditable."""
    h = F.substring(F.md5(F.concat_ws(":", F.lit(salt), key.cast("string"))), 1, 8)
    return F.conv(h, 16, 10).cast("double") / F.lit(float(1 << 32))


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "lang",
    key_col: str = "doc_id",
    salt: str = "mix-v1",
) -> DataFrame:
    """Per-stratum quota sampling: keep a row iff its deterministic
    uniform falls under its stratum's rate (strata absent from
    ``rates`` are dropped — rate 0). Adds the draw as ``u`` so the
    decision is auditable downstream."""
    u = deterministic_uniform(F.col(key_col), salt)
    rate: Column = F.lit(0.0)
    for stratum, r in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == stratum, F.lit(float(r))).otherwise(rate)
    return docs.withColumn("u", F.round(u, 6)).filter(F.col("u") < rate)


def temperature_mix_rates(
    docs: DataFrame,
    stratum_col: str = "lang",
    scale: int = 1 << 20,
) -> DataFrame:
    """Temperature-based mixing rates (the mT5/XLM-R α=0.5 recipe):
    mixing weight per stratum ∝ n_s^0.5, which upweights low-resource
    strata relative to proportional sampling.

    Exactness discipline: α is fixed at 0.5 so the power is ``sqrt``
    — the ONE power IEEE requires correctly rounded, bit-identical on
    any engine (generic ``pow`` is not, so an arbitrary-α variant
    could not be oracle-checked).  Weights are floor-quantized to
    2^-20 multiples as BIGINTs BEFORE the normalizing sum, making the
    sum exact and order-independent; the mix proportion and the
    max-normalized sampling rate are then single exact divisions.

    Output per stratum: ``(stratum, n_docs, weight_q, p_mix,
    sample_rate)`` — a DIMENSION (broadcast into the actual sampling
    filter via :func:`stratified_sample`-style draws).  One groupBy on
    the stratum key; nothing else moves.
    """
    from pyspark.sql import Window

    counts = docs.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    wq = F.floor(F.sqrt(F.col("n_docs")) * F.lit(float(scale))).cast("long")
    w = Window.partitionBy()
    out = counts.withColumn("weight_q", wq).withColumns(
        {
            "__tot": F.sum("weight_q").over(w),
            "__max": F.max("weight_q").over(w),
        }
    )
    return out.select(
        "stratum",
        "n_docs",
        "weight_q",
        (F.floor(F.col("weight_q") / F.col("__tot") * 1e6) / 1e6).alias("p_mix"),
        (
            F.expr("weight_q * 1000000 DIV __max") / F.lit(1e6)
        ).alias("sample_rate"),
    )


def stratified_topk(
    docs: DataFrame,
    quotas: dict[str, int],
    stratum_col: str = "lang",
    key_col: str = "doc_id",
    salt: str = "mix-v1",
) -> DataFrame:
    """EXACT per-stratum quotas (keep exactly k of stratum s, not a
    rate): rank each stratum by the deterministic draw and keep the
    first k. Complements ``stratified_sample`` when the mixing recipe
    is written in absolute document counts ("2M docs of code") rather
    than rates.

    The window partitions on the stratum — a handful of partitions,
    each potentially huge, which is exactly the case where a naive
    global sort serializes. That is fine HERE because row_number over
    (stratum, draw) shuffles only (keys, draw), never bodies, and at
    quotas ≪ stratum sizes a production run would pre-filter with
    ``stratified_sample`` at a safe rate first (two-phase: rate-gate
    10× the quota, then exact-rank the survivors — the standard
    top-k-per-group shape)."""
    from pyspark.sql import Window

    u = F.round(deterministic_uniform(F.col(key_col), salt), 6)
    quota: Column = F.lit(0)
    for stratum, k in sorted(quotas.items()):
        quota = F.when(F.col(stratum_col) == stratum, F.lit(int(k))).otherwise(quota)
    w = Window.partitionBy(stratum_col).orderBy("u", key_col)
    return (
        docs.withColumn("u", u)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= quota)
    )


def ngram_decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document contamination against a benchmark set: the fraction
    of the document's distinct word n-grams that appear in ANY
    benchmark document. Returns every input document (0.0 when clean).

    Plan shape: corpus shingles explode once; the benchmark's distinct
    shingle dim is small by construction (eval sets are thousands of
    docs) and broadcast-joins against it; two groupBys on the already-
    partitioned doc key. At 10^12 docs the corpus side never carries
    document text past the shingle projection.
    """
    doc_sh = shingles(docs, id_col=id_col, text_col=text_col, n=n)
    bench_sh = (
        shingles(benchmark, id_col=id_col, text_col=text_col, n=n)
        .select("shingle")
        .distinct()
    )
    totals = doc_sh.groupBy("doc_id").agg(F.count("*").alias("n_ngrams"))
    hits = (
        doc_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hit"))
    )
    return (
        totals.join(hits, "doc_id", "left")
        .fillna(0, subset=["n_hit"])
        .select(
            "doc_id",
            "n_ngrams",
            "n_hit",
            F.round(F.col("n_hit") / F.col("n_ngrams"), 6).alias("contamination"),
        )
    )


def assign_splits(
    docs: DataFrame,
    splits: dict[str, float],
    key_col: str = "doc_id",
    salt: str = "split-v1",
) -> DataFrame:
    """Deterministic train/val/test assignment: each document's seeded
    uniform draw lands in one of the cumulative-fraction intervals
    (fractions must sum to ≤1; any remainder is labeled ``rest``).

    Keyed on the document id — stable across reruns, cluster sizes and
    engines, so val/test membership never drifts between corpus
    rebuilds (the property that keeps eval sets honest). Zero shuffle:
    the label is one projected expression at the scan.
    """
    u = F.round(deterministic_uniform(F.col(key_col), salt), 6)
    expr: Column = F.lit("rest")
    bounds = []
    acc = 0.0
    for name, frac in splits.items():
        acc += float(frac)
        bounds.append((name, acc))
    # compare on the ROUNDED draw (same contract as stratified_sample)
    # so the audited `u` column alone reproduces the decision
    for name, hi in reversed(bounds):
        expr = F.when(F.col("u") < F.lit(hi), F.lit(name)).otherwise(expr)
    return docs.withColumn("u", u).withColumn("split", expr)


def pack_sequences(
    docs: DataFrame,
    budget_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concat-and-chunk sequence packing stats: documents are laid out
    end-to-end in ``id_col`` order and cut into fixed ``budget_tokens``
    context windows (the GPT-style packing that wastes zero tokens and
    lets documents straddle window boundaries).

    → ``(doc_id, n_tokens, start_offset, first_seq, last_seq, n_seqs)``
    — which training sequences each document lands in, and how many
    windows it spans. The corpus-level ``max(last_seq)+1`` is "how many
    sequences does this corpus yield at context length L".

    The global prefix sum is the classic TWO-PHASE scan, never a
    global-ordered window (``Window.orderBy`` with no partition key
    collapses every row into ONE task — the exact single-task
    bottleneck this engine exists to avoid): range-partition by the
    order key, cumsum WITHIN each partition in parallel, then add each
    partition's starting offset from a partition-totals dim that has
    one row per partition and broadcasts for free. In production the
    order key is the curated shard layout, already range-clustered, so
    phase one is a co-located scan.
    """
    from pyspark.sql import Window

    # split('') yields [''] (size 1), so whitespace-only documents would
    # otherwise count a phantom token that shifts every later doc's
    # global offset and emits a manifest slice no shard writer can fill
    trimmed = F.trim(F.col(text_col))
    toks = F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )
    ranged = (
        docs.select(F.col(id_col).alias("doc_id"), toks.alias("n_tokens"))
        .repartitionByRange("doc_id")
        .withColumn("_pid", F.spark_partition_id())
    )
    wloc = Window.partitionBy("_pid").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    loc = ranged.withColumn("_local_end", F.sum("n_tokens").over(wloc))
    # one row per partition → the offsets window is trivially tiny
    wtot = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        loc.groupBy("_pid")
        .agg(F.max("_local_end").alias("_ptotal"))
        .withColumn("_offset", F.coalesce(F.sum("_ptotal").over(wtot), F.lit(0)))
        .select("_pid", "_offset")
    )
    out = loc.join(F.broadcast(offsets), "_pid").withColumn(
        "end_offset", F.col("_local_end") + F.col("_offset")
    )
    start = F.col("end_offset") - F.col("n_tokens")
    b = F.lit(budget_tokens)
    return out.select(
        "doc_id",
        "n_tokens",
        start.alias("start_offset"),
        F.floor(start / b).alias("first_seq"),
        # a doc's last token sits at end_offset-1; empty docs stay in
        # the window they start in
        F.floor(F.greatest(F.col("end_offset") - 1, start) / b).alias("last_seq"),
        (
            F.floor(F.greatest(F.col("end_offset") - 1, start) / b)
            - F.floor(start / b)
            + 1
        ).alias("n_seqs"),
    )


def deterministic_shuffle(
    docs: DataFrame, id_col: str = "doc_id", salt: str = "shuffle-v1"
) -> DataFrame:
    """Reproducible global shuffle for training-data layout: every doc
    gets ``shuffle_key = md5(salt ':' id)`` and ``shuffle_pos`` = its
    rank in key order — the order a dataloader reads. Re-running with
    the same salt reproduces the epoch exactly; a new salt is a fresh
    epoch permutation. No RNG state, so any engine (and any retry)
    agrees on the layout.

    The global rank is the same TWO-PHASE scan as ``pack_sequences``
    (range-partition by key → parallel local row_number → one-row-per-
    partition count offsets broadcast back), never a global-ordered
    window: ``Window.orderBy`` without a partition key is one task at
    10^12 rows. Downstream, writing ordered by ``shuffle_pos`` range-
    clusters the corpus so sequence packing reads it co-located.
    """
    from pyspark.sql import Window

    key = F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    ranged = (
        docs.select(F.col(id_col).alias("doc_id"), key.alias("shuffle_key"))
        .repartitionByRange("shuffle_key", "doc_id")
        .withColumn("_pid", F.spark_partition_id())
    )
    wloc = Window.partitionBy("_pid").orderBy("shuffle_key", "doc_id")
    loc = ranged.withColumn("_local_rank", F.row_number().over(wloc))
    wtot = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        loc.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_pcnt"))
        .withColumn("_offset", F.coalesce(F.sum("_pcnt").over(wtot), F.lit(0)))
        .select("_pid", "_offset")
    )
    return (
        loc.join(F.broadcast(offsets), "_pid")
        .select(
            "doc_id",
            "shuffle_key",
            (F.col("_local_rank") - 1 + F.col("_offset")).alias("shuffle_pos"),
        )
    )


def sequence_manifest(
    docs: DataFrame,
    budget_tokens: int,
    seqs_per_shard: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Training-shard slice manifest: for every (training sequence ×
    document) intersection, WHICH token slice of WHICH document fills
    the window — the WebDataset/MDS-style index a shard writer consumes
    to materialize fixed-context training shards without re-scanning
    the corpus.

    Builds on :func:`pack_sequences` (two-phase global prefix sum):
    each doc explodes into one row per window it straddles (bounded by
    ``ceil(n_tokens / budget) + 1`` — narrow, no shuffle), the slice
    bounds are pure arithmetic on the global offsets, and
    ``shard_id = seq_id // seqs_per_shard`` groups windows into
    fixed-size output shards. The only exchange downstream consumers
    need is a repartition on ``shard_id`` — which is exactly the
    partitioned write :func:`write_shards` performs.

    → ``(seq_id, shard_id, doc_id, tok_start, tok_len)`` where
    ``tok_start`` is 0-based within the document and every window's
    slices concatenate (ordered by global offset) to exactly
    ``budget_tokens`` tokens, except the corpus-final window.
    """
    b = F.lit(budget_tokens)
    packed = pack_sequences(docs, budget_tokens, id_col, text_col)
    rows = packed.filter(F.col("n_tokens") > 0).select(
        "doc_id",
        "n_tokens",
        "start_offset",
        F.explode(F.sequence("first_seq", "last_seq")).alias("seq_id"),
    )
    win_lo = F.col("seq_id") * b
    win_hi = win_lo + b
    doc_lo = F.col("start_offset")
    doc_hi = doc_lo + F.col("n_tokens")
    lo = F.greatest(win_lo, doc_lo)
    hi = F.least(win_hi, doc_hi)
    return rows.select(
        "seq_id",
        F.floor(F.col("seq_id") / F.lit(seqs_per_shard)).alias("shard_id"),
        "doc_id",
        (lo - doc_lo).alias("tok_start"),
        (hi - lo).alias("tok_len"),
    )


def shard_manifest(seq_manifest: DataFrame) -> DataFrame:
    """Per-shard summary over :func:`sequence_manifest` output — the
    artifact a training launcher reads to size its data loader: one
    groupBy on the shard key (the partition key the write already
    clusters by), counting windows, distinct contributing documents,
    and total tokens per shard."""
    return (
        seq_manifest.groupBy("shard_id")
        .agg(
            F.countDistinct("seq_id").alias("n_seqs"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.sum("tok_len").alias("n_tokens"),
            F.min("seq_id").alias("first_seq"),
            F.max("seq_id").alias("last_seq"),
        )
    )


def write_shards(seq_manifest: DataFrame, path: str) -> None:
    """Materialize the manifest partitioned by ``shard_id`` — one
    directory per training shard, slices ordered within each file by
    (seq_id, tok_start). ``repartition("shard_id")`` first so each
    shard is one task's single file, not a fragment per upstream
    partition (10^5 shards × 10^3 upstream partitions would otherwise
    write 10^8 small files)."""
    (
        seq_manifest.repartition("shard_id")
        .sortWithinPartitions("seq_id", "doc_id", "tok_start")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(path)
    )
