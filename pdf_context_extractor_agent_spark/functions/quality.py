"""Text analysis for training-data pipelines over the ``documents``
table: language-ID heuristic, quality scoring, token counting, document
fingerprinting. All pure `pyspark.sql.functions` — every expression has
an exact ANSI-SQL twin used as the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# marker-word banks for the n-gram language heuristic (tiny, broadcast
# as literals inside the expression; counts are whole-word regex hits)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "is"],
    "es": ["el", "la", "de", "que", "los"],
    "de": ["der", "die", "das", "und", "ist"],
}

EN_STOPWORDS = ["the", "a", "of", "and", "is", "to", "in", "that", "it", "on"]

# BPE-ish token regex: word pieces, numbers, or single non-space symbols
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _marker_hits(text: Column, words: list[str]) -> Column:
    """Whole-word occurrence count of any marker word."""
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.regexp_count(text, F.lit(pat))


def cjk_char_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(r"[一-鿿]"))


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language marker density (hits per token)."""
    tokens = F.greatest(F.size(F.split(F.trim(text), r"\s+")), F.lit(1))
    out = {lang: _marker_hits(text, ws) / tokens for lang, ws in LANG_MARKERS.items()}
    out["zh"] = cjk_char_count(text) / F.greatest(F.length(text), F.lit(1))
    return out


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: argmax marker density (deterministic
    tie-break by language name)."""
    scores = lang_scores(F.col(text_col))
    pairs = F.array(
        *[F.struct(s.alias("score"), F.lit(lang).alias("lang")) for lang, s in sorted(scores.items())]
    )
    best = F.array_max(pairs)
    return docs.withColumn("lang_pred", best["lang"]).withColumn("lang_score", best["score"])


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio / word-length features and
    a composite quality score (heuristics in the spirit of C4/Gopher
    text-quality rules, computed fully JVM-side)."""
    t = F.col(text_col)
    n_chars = F.length(t)
    words = F.split(F.trim(t), r"\s+")
    n_words = F.size(words)
    n_stop = _marker_hits(t, EN_STOPWORDS)
    n_punct = F.regexp_count(t, F.lit(r"[^\w\s]"))
    mean_word_len = n_chars / F.greatest(n_words, F.lit(1))
    stop_ratio = n_stop / F.greatest(n_words, F.lit(1))
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))
    score = (
        F.when(n_words >= 50, F.lit(0.4)).otherwise(n_words / F.lit(125.0))
        + F.when((mean_word_len >= 3) & (mean_word_len <= 10), F.lit(0.3)).otherwise(F.lit(0.0))
        + F.least(stop_ratio * 2, F.lit(0.3))
    )
    return (
        docs.withColumn("n_words", n_words)
        .withColumn("mean_word_len", mean_word_len)
        .withColumn("stop_ratio", stop_ratio)
        .withColumn("punct_ratio", punct_ratio)
        .withColumn("quality_score", score)
    )


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish regex token count."""
    t = F.col(text_col)
    return docs.withColumn(
        "ws_tokens", F.size(F.split(F.trim(t), r"\s+"))
    ).withColumn("re_tokens", F.regexp_count(t, F.lit(TOKEN_REGEX)))


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Content fingerprint: md5 over whitespace-normalized lowercase
    text (the exact-dedup key), plus a 64-bit prefix for compact joins."""
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    fp = F.md5(norm)
    return docs.withColumn("fp_md5", fp).withColumn(
        "fp64", F.conv(F.substring(fp, 1, 16), 16, 10).cast("decimal(20,0)")
    )


# ---------------------------------------------------------------------------
# Repetition metrics (Gopher-style quality rules) — pure per-row array
# expressions, NO shuffle: the correct 100 TB shape for per-document
# quality filtering is a narrow map, not an explode+groupBy.
# ---------------------------------------------------------------------------

def _words(text: Column) -> Column:
    return F.split(F.lower(F.regexp_replace(F.trim(text), r"\s+", " ")), " ")


def repetition_features(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document repetition signals:

    * ``distinct_word_ratio`` — |unique words| / |words|
    * ``top_bigram_frac``     — occurrences of the most frequent word
                                bigram / total bigrams

    O(n log n) PER ROW (``array_sort`` + one linear fold): the most
    frequent bigram's count equals the longest run of equal adjacent
    elements in the SORTED bigram array, so a jumbo 10⁵-word document is
    ~10⁶ comparisons in one task, not the 10¹⁰ of the naive
    distinct×scan formulation — no straggler factory, and still zero
    exchanges (the correct 100 TB shape for per-document quality
    filtering is a narrow map, not explode+groupBy).

    The word and bigram arrays are MATERIALIZED as intermediate columns
    (separate projections) before anything iterates over them: an
    expression-tree ``split()`` referenced inside a ``transform`` lambda
    is re-evaluated per element (Catalyst does not CSE across lambda
    invocations), which silently turns any downstream "linear" pass into
    O(n²) — re-splitting a 10⁵-word text 10⁵ times pegged a single task
    for 40+ minutes. CollapseProject keeps the split materialized
    because it is non-cheap and multiply-referenced.
    """
    ws = docs.select(
        F.col(id_col).alias("doc_id"), _words(F.col(text_col)).alias("_w")
    )
    w = F.col("_w")
    bgs = ws.withColumn(
        "_bg",
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(w) - 1, F.lit(1))),
            lambda i: F.concat_ws(
                " ", F.try_element_at(w, i), F.try_element_at(w, i + 1)
            ),
        ),
    )
    bg = F.col("_bg")
    top = F.aggregate(
        F.array_sort(bg),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    return bgs.select(
        "doc_id",
        (F.size(F.array_distinct(w)) / F.size(w)).alias("distinct_word_ratio"),
        (top / F.size(bg)).alias("top_bigram_frac"),
    )


# ---------------------------------------------------------------------------
# PII detection / masking — regex families shared verbatim between the
# Spark expressions and the DuckDB oracle (no lookarounds, both engines
# agree). Real pipelines extend PII_PATTERNS; the plan shape is fixed.
# ---------------------------------------------------------------------------

PII_PATTERNS: dict[str, tuple[str, str]] = {
    # name -> (regex, replacement token)
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    "phone": (r"\+?[0-9]{3}-[0-9]{3,4}-[0-9]{4}", "[PHONE]"),
}


def pii_counts(text: Column) -> dict[str, Column]:
    return {name: F.regexp_count(text, F.lit(pat)) for name, (pat, _) in PII_PATTERNS.items()}


def mask_pii(text: Column) -> Column:
    out = text
    for pat, token in PII_PATTERNS.values():
        out = F.regexp_replace(out, pat, token)
    return out


# ---------------------------------------------------------------------------
# Unicode script composition (CCNet-style): the fraction of characters
# in each major script. Script ratios are what cleanly separates
# zh/ja/ko/ru/ar text where Latin marker-word densities say nothing,
# and they catch mixed-script spam (Latin text stuffed with CJK SEO
# tokens). Pure regexp_count projections — zero shuffle, codegen'd.
# Explicit code-point ranges (not \p{script=...}) so the Java and RE2
# engines count identically.
# ---------------------------------------------------------------------------

_SCRIPT_RANGES = {
    # BMP ranges; the main blocks per script, enough for ratio features
    "latin": r"A-Za-zÀ-ɏ",
    "han": r"一-鿿㐀-䶿",
    "kana": r"぀-ヿ",
    "hangul": r"가-힯ᄀ-ᇿ",
    "cyrillic": r"Ѐ-ӿ",
    "arabic": r"؀-ۿ",
    "greek": r"Ͱ-Ͽ",
    "digit": r"0-9",
}


def script_ratios(text: Column) -> dict[str, Column]:
    """script → fraction of (non-space) characters in that script."""
    base = F.greatest(
        F.length(F.regexp_replace(text, r"\s+", "")), F.lit(1)
    ).cast("double")
    return {
        name: F.regexp_count(text, F.lit(f"[{rng}]")) / base
        for name, rng in _SCRIPT_RANGES.items()
    }


def script_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document script-composition columns + the dominant script.

    → input + ``<script>_frac`` per script + ``main_script`` (argmax,
    deterministic name tie-break) + ``script_other_frac`` (characters
    outside every known range — high values flag encoding mojibake).
    """
    ratios = script_ratios(F.col(text_col))
    cols = {f"{k}_frac": F.round(v, 6) for k, v in ratios.items()}
    pairs = F.array(
        *[
            F.struct(v.alias("frac"), F.lit(k).alias("script"))
            for k, v in sorted(ratios.items())
        ]
    )
    out = docs.withColumns(cols)
    return out.withColumns(
        {
            "main_script": F.array_max(pairs)["script"],
            "script_other_frac": F.round(
                F.greatest(
                    F.lit(0.0),
                    1.0 - sum(ratios.values(), F.lit(0.0)),
                ),
                6,
            ),
        }
    )
