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

__all__ = [
    "MOJIBAKE_PAIRS",
    "fix_mojibake",
    "mojibake_score",
    "mojibake_stats",
    "detect_and_decode",
    "decode_html",
    "decode_pages",
]


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


# --------------------------------------------------------------------------
# charset-aware byte → text decoding (the step BEFORE any text operator)
# --------------------------------------------------------------------------
#
# The pages table stores the crawl payload as raw bytes (html binary);
# everything downstream (kernel, quality, dedup) consumes TEXT. Real
# crawls mix utf-8, windows-1252 mislabeled as iso-8859-1, BOM'd files
# and utf-16 exports, so production pipelines run an explicit
# detect+decode pass (WET generation does exactly this). Detection here
# is the HTML standard's deterministic prefix algorithm — BOM first,
# then a meta-charset declaration scanned in the first 1024 bytes —
# with utf-8-strict-else-sloppy-cp1252 as the unlabeled fallback (the
# WHATWG default for western content). No statistical guessing: the
# same bytes always decode identically, which is what lets an SQL
# oracle restate the result.
#
# Scale: one narrow Arrow-batched pandas UDF (charset decode has no JVM
# builtin), zero shuffle; the 1024-byte sniff window bounds per-row
# header work regardless of document size.

_SNIFF = 1024

#: alias → (python codec, canonical label)
_CHARSET_ALIASES: dict[str, tuple[str, str]] = {
    "utf-8": ("utf-8", "utf-8"),
    "utf8": ("utf-8", "utf-8"),
    "us-ascii": ("ascii", "us-ascii"),
    "ascii": ("ascii", "us-ascii"),
    "iso-8859-1": ("latin-1", "iso-8859-1"),
    "iso8859-1": ("latin-1", "iso-8859-1"),
    "latin-1": ("latin-1", "iso-8859-1"),
    "latin1": ("latin-1", "iso-8859-1"),
    "windows-1252": ("cp1252", "windows-1252"),
    "cp1252": ("cp1252", "windows-1252"),
    "x-cp1252": ("cp1252", "windows-1252"),
    "utf-16": ("utf-16", "utf-16"),
    "utf-16le": ("utf-16-le", "utf-16le"),
    "utf-16be": ("utf-16-be", "utf-16be"),
}

import re as _re

import pandas as pd  # module-level: pandas_udf type-hint resolution needs it

_META_CHARSET_RE = _re.compile(rb"""charset\s*=\s*["']?\s*([A-Za-z0-9_\-]+)""", _re.I)

#: sloppy cp1252: the 5 undefined bytes fall back to Latin-1 (ftfy /
#: Windows-API behavior) — a total function, never raises
_SLOPPY_1252_TABLE = {b: ord(c) if len(c) == 1 else c for b, c in
                      ((k, v) for k, v in _CP1252_HIGH.items())}


def _sloppy_1252_decode(blob: bytes) -> str:
    return blob.decode("latin-1").translate(_SLOPPY_1252_TABLE)


def detect_and_decode(blob: bytes | None) -> tuple[str, str]:
    """(canonical_charset, decoded_text) for one payload. Order: BOM
    (utf-8 / utf-16le / utf-16be, consumed) → meta charset declaration
    in the first 1024 bytes → utf-8 strict → sloppy cp1252 fallback."""
    if blob is None:
        return ("utf-8", "")
    blob = bytes(blob)
    if blob[:3] == b"\xef\xbb\xbf":
        return ("utf-8", blob[3:].decode("utf-8", "replace"))
    if blob[:2] == b"\xff\xfe":
        return ("utf-16le", blob[2:].decode("utf-16-le", "replace"))
    if blob[:2] == b"\xfe\xff":
        return ("utf-16be", blob[2:].decode("utf-16-be", "replace"))
    m = _META_CHARSET_RE.search(blob[:_SNIFF])
    if m:
        alias = m.group(1).decode("ascii", "replace").lower()
        hit = _CHARSET_ALIASES.get(alias)
        if hit:
            codec, label = hit
            if codec == "cp1252":
                return (label, _sloppy_1252_decode(blob))
            return (label, blob.decode(codec, "replace"))
    try:
        return ("utf-8", blob.decode("utf-8", "strict"))
    except UnicodeDecodeError:
        return ("windows-1252", _sloppy_1252_decode(blob))


def decode_html(col: Column) -> Column:
    """``binary → struct<charset:string, text:string>`` as an
    Arrow-batched pandas UDF (vectorized transfer; charset decode has
    no JVM builtin)."""

    @F.pandas_udf("charset string, text string")
    def _decode(s: pd.Series) -> pd.DataFrame:
        out = [detect_and_decode(b) for b in s]
        return pd.DataFrame(out, columns=["charset", "text"])

    return _decode(col)


def decode_pages(
    pages: DataFrame, html_col: str = "html", keep: tuple[str, ...] = ("url",)
) -> DataFrame:
    """Pages-table decode pass: (``keep`` columns, charset, text).
    Narrow map — rides the scan partitioning, no shuffle."""
    dec = decode_html(F.col(html_col)).alias("_dec")
    return pages.select(*keep, dec).select(
        *keep, F.col("_dec.charset").alias("charset"),
        F.col("_dec.text").alias("text"),
    )
