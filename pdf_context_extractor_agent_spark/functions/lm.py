"""Statistical language-model scoring for training-data curation, in
the spirit of CCNet's perplexity-bucket quality filter (Wenzek et al.,
2020) — but trained and scored entirely inside Spark, with no external
model artifact: the corpus itself is the training set.

Pipeline shape (the one that survives 100 TB):

1. tokenize per row (narrow, zero shuffle);
2. explode bigram instances;
3. ``groupBy(bigram)`` count — ONE shuffle on the n-gram key, partial
   aggregation map-side;
4. derive first-word continuation totals from the bigram table itself
   (``groupBy(w1)``) so the conditional probability
   ``p(w2 | w1) = C(w1,w2) / C(w1, ·)`` needs no second corpus pass;
5. build a probability dim ``(w1, w2, logp)`` and join doc bigrams to
   it ONCE on the (w1, w2) key;
6. ``groupBy(doc_id)`` average — the doc key the corpus is already
   organized around.

The probability dim is |vocab²∩corpus| rows — orders of magnitude
smaller than the corpus — so AQE picks broadcast-vs-shuffle from
runtime stats; nothing is hinted. Every expression has an exact
ANSI-SQL twin (the DuckDB oracle in ``__spark_entry__.oracle_sql``).

Reference parity note: the reference has no statistical LM (its quality
gate is the LLM call, ``src/analyzers/llm_analyzer.py``); this module is
part of the beyond-reference web-curation surface the engine adds for
LLM-training pipelines (C4 / Gopher / CCNet family).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "word_array",
    "doc_bigrams",
    "bigram_lm",
    "lm_doc_scores",
    "doc_frequency",
]


def word_array(text: Column) -> Column:
    """Whitespace tokenization over case-folded text. Matches DuckDB's
    ``string_split_regex(lower(trim(text)), '\\s+')`` byte for byte."""
    return F.split(F.lower(F.trim(F.coalesce(text, F.lit("")))), r"\s+")


def doc_bigrams(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One row per bigram INSTANCE: (doc_id, w1, w2).

    ``element_at`` is 1-based, mirroring DuckDB list subscripts, so the
    oracle can zip ``unnest(w[1:n-1])`` with ``unnest(w[2:n])``. The
    transform runs over ``slice(w, 1, n-1)`` — naturally empty for
    sub-two-token docs (``sequence(1, n-1)`` would count DOWN for
    n < 2, so slicing is the safe spelling).
    """
    pairs = F.expr(
        "transform(slice(__w, 1, greatest(size(__w) - 1, 0)),"
        " (x, i) -> struct(x AS w1, element_at(__w, i + 2) AS w2))"
    )
    return (
        docs.withColumn("__w", word_array(F.col(text_col)))
        .select("doc_id", F.explode(pairs).alias("bg"))
        .select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )


def bigram_lm(bigrams: DataFrame) -> DataFrame:
    """Train the MLE bigram model: ``(w1, w2, pair_cnt, first_cnt,
    logp)`` where ``logp = ln(pair_cnt / first_cnt)``.

    ``first_cnt`` (continuations of w1) comes from re-aggregating the
    already-tiny bigram count table, not from a second corpus scan.
    """
    pair_counts = bigrams.groupBy("w1", "w2").agg(F.count("*").alias("pair_cnt"))
    first_counts = pair_counts.groupBy("w1").agg(F.sum("pair_cnt").alias("first_cnt"))
    return pair_counts.join(first_counts, "w1").withColumn(
        "logp", F.log(F.col("pair_cnt") / F.col("first_cnt"))
    )


def lm_doc_scores(docs: DataFrame, text_col: str = "text", buckets: int = 4) -> DataFrame:
    """Per-document LM statistics + CCNet-style quality bucket.

    Output: ``doc_id, n_bigrams, sum_pair_cnt, sum_first_cnt`` (exact
    integer evidence — hash-stable across engines), ``avg_logp``
    (mean conditional log-probability; higher = more typical text),
    ``ppl`` (perplexity ``exp(-avg_logp)``), and ``lm_bucket``
    (``ntile`` over ascending perplexity: bucket 1 = most fluent, the
    CCNet head/middle/tail split generalized to *n* buckets).

    The ntile orders by the score ROUNDED to 5 decimals with a doc_id
    tie-break: float sums aggregate in partition order, so two docs
    with equal true scores (exact-duplicate texts exist in any crawl)
    could flip order run-to-run on raw doubles — rounding collapses
    the ulp noise and makes the bucket assignment deterministic.

    The bucket rank is the TWO-PHASE global scan (range-partition by
    the order key → parallel local row_number → one-row-per-partition
    offsets broadcast back), NEVER ``ntile`` over an unpartitioned
    window — that is a per-DOCUMENT relation, and a global-order window
    on it collapses 10^12 rows into one task. The ntile bucket-size
    convention (first ``n mod b`` buckets take the extra row) is
    reproduced arithmetically from the global rank, so the result is
    bit-identical to SQL ``ntile``.
    """
    bg = doc_bigrams(docs, text_col)
    model = bigram_lm(bg)
    scored = bg.join(model, ["w1", "w2"])  # every doc bigram is in the model: train set == corpus
    per_doc = scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.sum("pair_cnt").alias("sum_pair_cnt"),
        F.sum("first_cnt").alias("sum_first_cnt"),
        F.avg("logp").alias("avg_logp"),
    )
    # order key: score desc (negated rounded score asc), doc_id asc
    ranged = (
        per_doc.withColumn("_k", -F.round(F.col("avg_logp"), 5))
        .repartitionByRange("_k", "doc_id")
        .withColumn("_pid", F.spark_partition_id())
    )
    wloc = Window.partitionBy("_pid").orderBy("_k", "doc_id")
    loc = ranged.withColumn("_lr", F.row_number().over(wloc))
    wtot = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    counts = loc.groupBy("_pid").agg(F.count(F.lit(1)).alias("_pc"))
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_pc").over(wtot), F.lit(0))
    ).select("_pid", "_off")
    total = counts.agg(F.sum("_pc").alias("_n"))
    q = F.expr(f"_n DIV {buckets}")
    rem = F.col("_n") % buckets
    r0 = F.col("_lr") - 1 + F.col("_off")  # 0-based global rank
    bucket = (
        F.when(r0 < rem * (q + 1), F.expr(f"(_lr - 1 + _off) DIV (_n DIV {buckets} + 1)"))
        .otherwise(
            rem
            + F.expr(
                f"((_lr - 1 + _off) - (_n % {buckets}) * (_n DIV {buckets} + 1)) "
                f"DIV greatest(_n DIV {buckets}, 1)"
            )
        )
        + 1
    )
    return (
        loc.join(F.broadcast(offsets), "_pid")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "n_bigrams",
            "sum_pair_cnt",
            "sum_first_cnt",
            F.col("avg_logp"),
            F.exp(-F.col("avg_logp")).alias("ppl"),
            bucket.cast("int").alias("lm_bucket"),
        )
    )


def doc_frequency(docs: DataFrame, text_col: str = "text", min_df: int = 1) -> DataFrame:
    """Corpus vocabulary statistics: per-word document frequency and
    smoothed IDF ``ln((1 + N) / (1 + df))``.

    Shape: distinct (doc, word) — one shuffle — then ``groupBy(word)``.
    N arrives via a broadcast cross-join of a single-row aggregate, not
    a driver ``.count()`` round-trip, so the whole thing stays one job.
    """
    words = docs.select(
        "doc_id", F.explode(F.array_distinct(word_array(F.col(text_col)))).alias("word")
    )
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    return (
        words.groupBy("word")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") >= min_df)
        .crossJoin(F.broadcast(n_docs))
        .withColumn("idf", F.log((1 + F.col("n_docs")) / (1 + F.col("df"))))
    )
