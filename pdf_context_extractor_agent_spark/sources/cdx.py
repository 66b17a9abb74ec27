"""CDX(J) crawl-index ingestion: the Common-Crawl/Wayback capture
index → a typed selection relation.

The CDX index is how real crawl processing AVOIDS touching WARC bytes:
one ~300-byte line per capture (``urlkey timestamp {json}``) describes
a record's url, status, mime, digest, and byte range inside its
archive, so selection queries (latest 200/text-html capture per URL,
dedup by digest, per-domain sampling) run over the index — 3-4 orders
of magnitude smaller than the corpus — and only the selected ranges
are ever fetched. This module parses CDXJ lines into that relation and
provides the SURT key that makes per-site ranges contiguous.

* ``surt_key`` — Sort-friendly URI Reordering Transform (deterministic
  subset): lowercase the host, drop one leading ``www.`` label,
  reverse the remaining labels comma-joined, append ``)`` + path +
  query. Sorting by SURT clusters every page of a site (and every
  subdomain of a domain) into contiguous index ranges — the property
  the real CDX format exists for, and the natural Iceberg partition /
  sort key for the index table at 10^12 captures.
* ``parse_cdxj`` — one regexp split + JSON field extraction per line;
  narrow, rides the scan, malformed lines yield null fields rather
  than dropped rows (verdict columns over silent drops).
* ``cdx_select_latest`` — the canonical selection: newest capture per
  urlkey among status-200 HTML rows; ONE shuffle on the urlkey the
  index is already sorted by.

Reference parity note: the reference pipeline is file-driven
(``src/main.py``) with no crawl-index surface; this module is part of
the beyond-reference web-curation layer for crawl-scale corpora.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["surt_key", "parse_cdxj", "cdx_select_latest"]


def surt_key(url: Column) -> Column:
    """SURT form of ``url`` (deterministic subset, documented above).

    ``https://www.News.Example.co.uk/A/b?x=1`` →
    ``uk,co,example,news)/A/b?x=1`` (host case-folded, path/query kept
    case-sensitive, fragment dropped, default ports dropped).
    """
    host = F.regexp_replace(
        F.lower(F.regexp_extract(url, r"^[a-zA-Z]+://([^/?#]*)", 1)),
        r"(^www\.|:(80|443)$)",
        "",
    )
    tail = F.regexp_replace(
        F.regexp_extract(url, r"^[a-zA-Z]+://[^/?#]*([^#]*)", 1), r"^$", "/"
    )
    return F.concat(
        F.array_join(F.reverse(F.split(host, r"\.")), ","), F.lit(")"), tail
    )


def parse_cdxj(
    lines: DataFrame, line_col: str = "cdx_line"
) -> DataFrame:
    """Parse CDXJ lines into the typed capture relation.

    Line format: ``<urlkey> <14-digit-timestamp> <json>`` where the
    json block carries ``url, status, mime, digest, length, offset,
    filename`` (all strings in the wire format — numerics cast here).
    Output columns: ``urlkey, ts (string, sortable), url, status (int),
    mime, digest, warc_length (long), warc_offset (long), filename``.
    Unparseable fields are null; the row always survives.
    """
    line = F.col(line_col)
    jsonb = F.regexp_extract(line, r"^\S+\s+\d{14}\s+(\{.*\})\s*$", 1)
    j = F.when(jsonb != "", jsonb)
    return lines.select(
        F.regexp_extract(line, r"^(\S+)", 1).alias("urlkey"),
        F.regexp_extract(line, r"^\S+\s+(\d{14})", 1).alias("ts"),
        F.get_json_object(j, "$.url").alias("url"),
        F.get_json_object(j, "$.status").cast("int").alias("status"),
        F.get_json_object(j, "$.mime").alias("mime"),
        F.get_json_object(j, "$.digest").alias("digest"),
        F.get_json_object(j, "$.length").cast("long").alias("warc_length"),
        F.get_json_object(j, "$.offset").cast("long").alias("warc_offset"),
        F.get_json_object(j, "$.filename").alias("filename"),
    )


def cdx_select_latest(
    captures: DataFrame,
    statuses: tuple[int, ...] = (200,),
    mime_prefix: str = "text/html",
) -> DataFrame:
    """Newest qualifying capture per urlkey — the fetch list.

    Filter (status ∈ ``statuses``, mime prefix) runs BEFORE the
    shuffle; the winner per urlkey is the max (ts, filename, offset)
    struct — one groupBy + self-join-free semantics via max_by-style
    struct aggregation, deterministic under capture-timestamp ties.
    """
    q = captures.filter(
        F.col("status").isin(*statuses)
        & F.col("mime").startswith(mime_prefix)
    )
    w = Window.partitionBy("urlkey").orderBy(
        F.col("ts").desc(), F.col("filename").desc(), F.col("warc_offset").desc()
    )
    return (
        q.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
