"""TextRank extractive summarization (Mihalcea & Tarau 2004), the
per-document "pick the k most central sentences" pass a training-data
pipeline runs to build short-context variants / preview fields of long
documents.

Pipeline, all DataFrame algebra keyed by (doc_id, sent_idx):

1. sentence segmentation (:func:`..webtext.split_sentences`);
2. per-sentence DISTINCT term sets (lowercased alnum runs);
3. sentence-pair similarity by term overlap — Dice scaled to exact
   integer ppm, ``w = (2·|A∩B|·10^6) DIV (|A|+|B|)`` (the classic
   TextRank log-length normalizer is replaced by Dice: same intent,
   but exact integer arithmetic instead of floats, so every engine
   computes bit-identical weights — the module-wide determinism rule,
   see sketch.py);
4. weighted power iteration with scaled-integer ranks::

       share(u→v) = (w_uv · rank_u) DIV outw_u
       rank'(v)   = base + (damping · Σ share) DIV 100
       base       = ((100-damping) · SCALE DIV n) DIV 100   (per doc)

   Sentences with no edges (no overlap with any other sentence) keep
   ``base`` — the dangling mass is dropped rather than redistributed,
   which only rescales ranks within a doc and cannot change the
   ordering TextRank is used for.
5. top-k per document by (rank DESC, sent_idx ASC — deterministic).

Scale shape: the overlap self-join shuffles on (doc_id, term) — within
a document only, never across the corpus — and every later stage
re-keys on (doc_id, sent) which AQE coalesces; SCALE = 10^9 bounds
``w·rank`` at 10^15, far inside long range even under corpus-scale
sums. n_iter is a small constant (3): the loop unrolls into one plan,
no driver-side data motion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**9


def sentence_terms(sents: DataFrame) -> DataFrame:
    """(doc_id, sent_idx, term) — distinct lowercased alnum runs."""
    toks = F.array_distinct(
        F.filter(
            F.split(F.lower("sentence"), "[^a-z0-9]+"), lambda x: x != ""
        )
    )
    return sents.select(
        "doc_id", "sent_idx", F.explode(toks).alias("term")
    )


def sentence_edges(sents: DataFrame) -> DataFrame:
    """Symmetric weighted sentence graph per document:
    (doc_id, src, dst, w) with Dice-ppm weights, zero-weight pairs
    dropped."""
    terms = sentence_terms(sents)
    nlen = terms.groupBy("doc_id", "sent_idx").agg(
        F.count("*").alias("n_terms")
    )
    a = terms.select("doc_id", F.col("sent_idx").alias("sa"), "term")
    b = terms.select("doc_id", F.col("sent_idx").alias("sb"), "term")
    ov = (
        a.join(b, ["doc_id", "term"])
        .filter(F.col("sa") < F.col("sb"))
        .groupBy("doc_id", "sa", "sb")
        .agg(F.count("*").alias("ov"))
    )
    na = nlen.select("doc_id", F.col("sent_idx").alias("sa"),
                     F.col("n_terms").alias("na"))
    nb = nlen.select("doc_id", F.col("sent_idx").alias("sb"),
                     F.col("n_terms").alias("nb"))
    pw = (
        ov.join(na, ["doc_id", "sa"])
        .join(nb, ["doc_id", "sb"])
        .select(
            "doc_id", "sa", "sb",
            F.expr("(2 * ov * 1000000) DIV (na + nb)").alias("w"),
        )
        .filter(F.col("w") > 0)
    )
    return pw.select("doc_id", F.col("sa").alias("src"),
                     F.col("sb").alias("dst"), "w").unionByName(
        pw.select("doc_id", F.col("sb").alias("src"),
                  F.col("sa").alias("dst"), "w")
    )


def textrank_sentences(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_iter: int = 3,
    top_k: int = 3,
    damping_pct: int = 85,
) -> DataFrame:
    """Top-k TextRank summary sentences per document:
    ``(doc_id, rank_order, sent_idx, rank, sentence)``."""
    from pyspark.sql import Window

    from .webtext import split_sentences

    sents = split_sentences(docs, id_col, text_col)
    edges = sentence_edges(sents)
    outw = edges.groupBy("doc_id", "src").agg(F.sum("w").alias("outw"))
    n = sents.groupBy("doc_id").agg(F.count("*").alias("n"))
    rank = sents.join(n, "doc_id").select(
        "doc_id", "sent_idx",
        F.expr(f"CAST({SCALE} DIV n AS LONG)").alias("rank"),
        F.expr(
            f"CAST((({100 - damping_pct} * ({SCALE} DIV n)) DIV 100) AS LONG)"
        ).alias("base"),
    )
    for _ in range(n_iter):
        contrib = (
            edges.join(
                rank.select("doc_id", F.col("sent_idx").alias("src"),
                            F.col("rank").alias("r_src")),
                ["doc_id", "src"],
            )
            .join(outw, ["doc_id", "src"])
            .select("doc_id", "dst",
                    F.expr("(w * r_src) DIV outw").alias("share"))
            .groupBy("doc_id", "dst")
            .agg(F.sum("share").alias("contrib"))
        )
        rank = (
            rank.join(
                contrib.select("doc_id", F.col("dst").alias("sent_idx"),
                               "contrib"),
                ["doc_id", "sent_idx"], "left",
            )
            .select(
                "doc_id", "sent_idx",
                F.expr(
                    f"CAST(base + ({damping_pct} * coalesce(contrib, 0L))"
                    f" DIV 100 AS LONG)"
                ).alias("rank"),
                "base",
            )
        )
    w_ord = Window.partitionBy("doc_id").orderBy(
        F.col("rank").desc(), F.col("sent_idx").asc()
    )
    ranked = rank.withColumn("rank_order", F.row_number().over(w_ord)).filter(
        F.col("rank_order") <= top_k
    )
    return ranked.join(sents, ["doc_id", "sent_idx"]).select(
        "doc_id", "rank_order", "sent_idx", "rank", "sentence"
    )
