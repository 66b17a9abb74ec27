"""Lexical full-text retrieval (BM25) over the documents corpus.

A training-data pipeline needs *lexical* search next to the embedding
ANN in ``functions/similarity.py``: audits ("show me every document
scoring high for these leak keywords"), targeted decontamination, and
quality triage are all term-driven. This is the classic two-relation
inverted-index shape, expressed as DataFrame algebra so Catalyst keeps
the term filter *ahead* of the only wide shuffle:

1. tokenize per row (narrow — ``word_array``, the same case-folded
   whitespace tokenizer the LM/IDF modules use, so all lexical modules
   share one vocabulary);
2. explode term instances and — for search — filter to the query terms
   IMMEDIATELY, while the relation is still narrow. At 100 TB this is
   the difference between shuffling the whole corpus's postings and
   shuffling only the query terms' postings (a few thousand rows per
   term);
3. ``groupBy(doc_id, term)`` → tf: ONE shuffle, map-side partial agg;
4. per-term document frequency from the already-tiny tf relation;
5. doc length + corpus stats (N, avgdl) from a narrow second pass over
   the base table — a single-row aggregate cross-joined in (AQE
   broadcasts it), never a driver ``.count()`` round-trip;
6. Lucene-style BM25 weight per (doc, term), summed per doc, top-k by
   the ROUNDED score with a doc_id tie-break (float sums aggregate in
   partition order; rounding collapses the ulp noise so the ranking is
   deterministic and hash-stable across engines).

``bm25_index`` materializes the corpus-wide postings relation (term →
(doc, tf, weight)) for repeated queries; bucketing it by ``term`` at
write time gives shuffle-free per-term lookups at scale.

Reference parity note: the reference has no retrieval surface (its
lookups are per-document dict scans, e.g. ``src/parsers/
item_matcher.py``); this module is part of the beyond-reference
web-curation surface (audit/search over curated corpora).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pdf_context_extractor_agent_spark.functions.lm import word_array

__all__ = [
    "bm25_index",
    "bm25_search",
    "phrase_search",
    "positional_postings",
    "tfidf_keywords",
]


def _doc_stats(docs: DataFrame, text_col: str) -> tuple[DataFrame, DataFrame]:
    """(per-doc length relation, single-row (n_docs, avgdl) relation)."""
    dl = docs.select(
        "doc_id", F.size(word_array(F.col(text_col))).alias("dl")
    )
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    return dl, stats


def _bm25_weight(k1: float, b: float):
    """Lucene BM25: idf = ln(1 + (N - df + 0.5)/(df + 0.5)) — always
    positive, so a term in >half the corpus still contributes."""
    idf = F.log(
        1.0
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    norm = F.col("tf") * (k1 + 1.0) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    )
    return (idf * norm).alias("weight")


def bm25_index(
    docs: DataFrame, text_col: str = "text", k1: float = 1.2, b: float = 0.75
) -> DataFrame:
    """Corpus-wide BM25 postings: ``(term, doc_id, tf, df, weight)``.

    One wide shuffle on ``(doc_id, term)`` for tf, one on ``term`` for
    df; everything else is narrow or a broadcast single-row aggregate.
    Persist with ``.write.bucketBy(n, "term")`` and per-term queries
    become shuffle-free joins against the bucket layout.
    """
    dl, stats = _doc_stats(docs, text_col)
    tf = (
        docs.select(
            "doc_id", F.explode(word_array(F.col(text_col))).alias("term")
        )
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_rel = tf.groupBy("term").agg(F.count("*").alias("df"))
    return (
        tf.join(df_rel, "term")
        .join(dl, "doc_id")
        .crossJoin(stats)
        .select("term", "doc_id", "tf", "df", _bm25_weight(k1, b))
    )


def bm25_search(
    docs: DataFrame,
    terms: list[str],
    k: int = 10,
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents for a bag-of-terms query.

    Output: ``(doc_id, bm25, n_terms_matched)`` — score rounded to 4
    decimals BEFORE ranking so ties order identically across engines
    (tie-break: doc_id ascending).

    The query-term filter lands directly after the explode, while the
    relation is narrow — only matching postings ever reach the shuffle,
    so cost scales with the query terms' document frequency, not corpus
    size. df/idf are computed over the full corpus semantics (df of a
    query term is unchanged by the filter; N comes from the stats
    relation), so scores equal an unfiltered index's.
    """
    terms = sorted({t.lower() for t in terms})
    dl, stats = _doc_stats(docs, text_col)
    tf = (
        docs.select(
            "doc_id", F.explode(word_array(F.col(text_col))).alias("term")
        )
        .filter(F.col("term").isin(terms))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_rel = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        tf.join(df_rel, "term")
        .join(dl, "doc_id")
        .crossJoin(stats)
        .select("doc_id", _bm25_weight(k1, b))
        .groupBy("doc_id")
        .agg(
            F.round(F.sum("weight"), 4).alias("bm25"),
            F.count("*").alias("n_terms_matched"),
        )
    )
    return scored.orderBy(F.col("bm25").desc(), "doc_id").limit(k)


def positional_postings(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """1-based positional postings ``(doc_id, pos, term)`` — the
    phrase/proximity layer of the inverted index (1-based to mirror
    DuckDB/SQL list subscripts, like the bigram module)."""
    return docs.select(
        "doc_id", F.posexplode(word_array(F.col(text_col))).alias("pos0", "term")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "term")


def phrase_search(
    docs: DataFrame, phrase: list[str], text_col: str = "text"
) -> DataFrame:
    """Exact-phrase search over positional postings.

    Output ``(doc_id, n_hits, first_pos)`` — one row per document that
    contains the phrase, with its occurrence count and the position of
    its first word at the earliest occurrence.

    Scale shape: postings are filtered to the phrase's terms while the
    relation is still narrow (the same move as ``bm25_search``), then
    each adjacent term is aligned by shifting its position back
    (``pos - i``) and equi-joining on ``(doc_id, anchor_pos)``. All
    k−1 joins share the one hash partitioning on ``doc_id``, so a
    k-word phrase costs one shuffle of the phrase terms' postings —
    never a positions-array explosion against the whole corpus.
    """
    terms = [t.lower() for t in phrase]
    if len(terms) < 2:
        raise ValueError("phrase_search needs at least two words")
    posts = positional_postings(docs, text_col)
    matched = posts.filter(F.col("term") == terms[0]).select(
        "doc_id", F.col("pos").alias("anchor_pos")
    )
    for i, term in enumerate(terms[1:], start=1):
        nxt = posts.filter(F.col("term") == term).select(
            "doc_id", (F.col("pos") - i).alias("anchor_pos")
        )
        matched = matched.join(nxt, ["doc_id", "anchor_pos"])
    return matched.groupBy("doc_id").agg(
        F.count("*").alias("n_hits"), F.min("anchor_pos").alias("first_pos")
    )


def tfidf_keywords(
    docs: DataFrame, k: int = 5, text_col: str = "text"
) -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF — the
    dataset-card / corpus-inspection primitive ("what is this document
    about, relative to the corpus").

    Output: ``(doc_id, term, tf, tfidf, rank)``. Uses the same smoothed
    IDF as ``lm.doc_frequency`` (``ln((1+N)/(1+df))``) so vocabulary
    statistics agree across the lexical modules. The per-doc ranking
    window orders by the ROUNDED score with a term tie-break — float
    products are deterministic here, but rounding first keeps the rank
    stable against future expression reshuffles and makes the oracle
    comparison exact.

    Shape: one shuffle on (doc_id, term) for tf, one tiny re-agg on
    term for df, one window partitioned by the doc key — the corpus'
    natural partitioning, so at 100 TB the window never sees a global
    sort, only per-doc top-k heaps.
    """
    tf = (
        docs.select(
            "doc_id", F.explode(word_array(F.col(text_col))).alias("term")
        )
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    # df counts documents CONTAINING the term: tf is already one row
    # per (doc, term), so a plain count is the document frequency
    df_rel = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df_rel, "term")
        .crossJoin(n_docs)
        .select(
            "doc_id",
            "term",
            "tf",
            F.round(
                F.col("tf") * F.log((1.0 + F.col("n_docs")) / (1.0 + F.col("df"))),
                5,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
