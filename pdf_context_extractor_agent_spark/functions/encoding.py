"""Mojibake detection and repair (the ftfy core, deterministic subset).

Crawl corpora are full of double-encoded text: a page authored in
UTF-8, mis-decoded once as Windows-1252/Latin-1 somewhere in the
serving or archiving chain, then re-encoded — ``é`` becomes ``Ã©``,
``’`` becomes ``â€™``.  Production pipelines run ftfy over every
document; this module is the table-driven deterministic subset of that
repair, chosen so Spark and any SQL oracle compute the identical
result:

* :data:`MOJIBAKE_PAIRS` — (mojibake, fixed) pairs GENERATED from the
  encoding tables themselves (UTF-8 bytes of each target codepoint,
  re-decoded as "sloppy" Windows-1252: the 5 undefined cp1252 bytes
  fall back to Latin-1, exactly the Windows-API / ftfy behavior).
  Covered targets: the Latin-1 supplement letters (U+00A1–U+00FF) and
  the common cp1252 punctuation block (curly quotes, dashes, ellipsis,
  euro, trademark, bullet, NBSP).  Longest-mojibake-first ordering
  makes the chain confluent: 3-byte sequences (``â€™``) are consumed
  before any 2-byte prefix could split them.
* :func:`fix_mojibake` — one projection chaining ``replace`` per pair;
  zero shuffles, rides whatever scan feeds it.
* :func:`mojibake_score` — repair shrinkage ``(len - len_fixed) /
  len``: every repaired sequence shrinks by ≥1 char, so the score is
  0.0 exactly for clean text and grows with corruption density — a
  gate signal costing nothing beyond the repair expression itself.

Scale: pure string expressions, no UDF, no shuffle.  The replace chain
is ~100 simple calls — well inside codegen's method-size budget
(each ``replace`` is one library call, not inlined byte logic).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# cp1252's 0x80-0x9F block (the bytes where it differs from Latin-1);
# the 5 holes (0x81 8D 8F 90 9D) use the Latin-1 fallback ("sloppy"
# decode) — a plain `bytes.decode("cp1252")` would raise on them.
_CP1252_HIGH = {
    0x80: "€", 0x82: "‚", 0x83: "ƒ", 0x84: "„",
    0x85: "…", 0x86: "†", 0x87: "‡", 0x88: "ˆ",
    0x89: "‰", 0x8a: "Š", 0x8b: "‹", 0x8c: "Œ",
    0x8e: "Ž", 0x91: "‘", 0x92: "’", 0x93: "“",
    0x94: "”", 0x95: "•", 0x96: "–", 0x97: "—",
    0x98: "˜", 0x99: "™", 0x9a: "š", 0x9b: "›",
    0x9c: "œ", 0x9e: "ž", 0x9f: "Ÿ",
}


def _sloppy_cp1252(b: int) -> str:
    return _CP1252_HIGH.get(b, chr(b))


def _mojibake_of(cp: int) -> str:
    """The string produced when cp's UTF-8 bytes are mis-decoded as
    sloppy Windows-1252 — i.e. what the corrupted document shows."""
    return "".join(_sloppy_cp1252(b) for b in chr(cp).encode("utf-8"))


# repair targets: cp1252 punctuation + Latin-1 supplement (letters,
# signs, NBSP→space is deliberately NOT here: NBSP is a legitimate
# character; only multi-byte mis-decodes are repaired)
_TARGETS = sorted(_CP1252_HIGH.values()) + [chr(c) for c in range(0xA1, 0x100)]

#: (mojibake, fixed), longest mojibake first then lexicographic — a
#: fixed total order so the chain is identical everywhere.
MOJIBAKE_PAIRS: list[tuple[str, str]] = sorted(
    ((_mojibake_of(ord(t)), t) for t in _TARGETS),
    key=lambda p: (-len(p[0]), p[0]),
)

__all__ = ["MOJIBAKE_PAIRS", "fix_mojibake", "mojibake_score", "mojibake_stats"]


def fix_mojibake(text: Column) -> Column:
    """Repair chained onto ``text`` — one expression, no shuffle."""
    out = text
    for moji, fixed in MOJIBAKE_PAIRS:
        out = F.replace(out, F.lit(moji), F.lit(fixed))
    return out


def mojibake_score(text: Column) -> Column:
    """Repair shrinkage in [0, 1): 0.0 exactly iff no table sequence
    occurs; each repaired occurrence contributes ≥1/len."""
    fixed = fix_mojibake(text)
    n = F.length(text)
    return (
        (n - F.length(fixed)) / F.greatest(n, F.lit(1))
    ).cast("double")


def mojibake_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document repair relation: ``(id, fixed_len, repaired_chars,
    moji_score, fixed_md5)`` — the compact projection a curation run
    keeps (the repaired body itself flows on to the next stage; the
    md5 keys byte-exact cross-engine verification)."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    fixed = fix_mojibake(text)
    n = F.length(text)
    return docs.select(
        id_col,
        F.length(fixed).cast("long").alias("fixed_len"),
        (n - F.length(fixed)).cast("long").alias("repaired_chars"),
        F.floor((n - F.length(fixed)) / F.greatest(n, F.lit(1)) * 1e6)
        .cast("long")
        .alias("moji_score_ppm"),
        F.md5(fixed).alias("fixed_md5"),
    )
