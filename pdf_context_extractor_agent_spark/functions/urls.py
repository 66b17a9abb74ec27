"""URL canonicalization + domain analytics for Common-Crawl-style
corpora: the first stage of every web-scale dedup/curation pipeline is
collapsing the URL key-space (scheme/host case, ``www.`` prefixes,
fragments, tracking parameters) so that url-keyed joins, per-domain
quotas, and blocklist filters hit one canonical key per page.

Everything is per-row ``regexp_replace``/``regexp_extract`` algebra —
zero shuffles, whole-stage-codegen'd, and with exact DuckDB twins (the
only dialect difference is DuckDB's explicit ``'g'`` flag; Spark's
``regexp_replace`` is global by default).

Reference parity note: the reference keys its pipeline on file paths
(single-node, ``src/main.py``); url canonicalization is part of the
beyond-reference web-curation surface for crawl-scale corpora.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["canonicalize_url", "url_host", "registered_domain", "domain_stats"]

# query parameters that never affect page identity (Google/Facebook/
# generic referrer trackers); stripped wholesale by the canonicalizer
_TRACKING_PARAM_RE = r"(utm_[a-z]+|fbclid|gclid|ref)=[^&#]*"


def canonicalize_url(url: Column) -> Column:
    """Normalize a URL to its canonical dedup key.

    Steps (each a single global regexp pass):
    1. case-fold scheme + authority (path/query stay case-sensitive);
    2. drop a leading ``www.`` label;
    3. drop the fragment;
    4. drop tracking parameters (``utm_*``, ``fbclid``, ``gclid``,
       ``ref``) wherever they sit in the query string;
    5. sweep the separator debris that step 4 leaves behind
       (``?&`` → ``?``, ``&&`` → ``&``, trailing ``?`` / ``&``).
    """
    head = F.lower(F.regexp_extract(url, r"^([a-zA-Z]+://[^/?#]*)", 1))
    tail = F.regexp_extract(url, r"^[a-zA-Z]+://[^/?#]*(.*)$", 1)
    u = F.concat(head, tail)
    u = F.regexp_replace(u, r"^([a-z]+://)www\.", r"$1")
    u = F.regexp_replace(u, r"#.*$", "")
    u = F.regexp_replace(u, _TRACKING_PARAM_RE, "")
    u = F.regexp_replace(u, r"\?&+", "?")
    u = F.regexp_replace(u, r"&&+", "&")
    return F.regexp_replace(u, r"[?&]+$", "")


def url_host(url: Column) -> Column:
    """Case-folded authority with any ``www.`` prefix removed."""
    host = F.lower(F.regexp_extract(url, r"^[a-zA-Z]+://([^/?#:]*)", 1))
    return F.regexp_replace(host, r"^www\.", "")


def registered_domain(url: Column) -> Column:
    """Last two dot-labels of the host — the registered domain under
    the simple-suffix heuristic (a full public-suffix list is a data
    file, not a code change: swap the regex for a suffix-table join)."""
    return F.regexp_extract(url_host(url), r"([^.]+\.[^.]+)$", 1)


def domain_stats(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-registered-domain corpus statistics: page count, distinct
    canonical URLs (post-canonicalization dedup key-space), total text
    bytes. ONE shuffle on the domain key; at crawl scale the domain
    distribution is zipfian, so this aggregate is exactly the place
    AQE's skew handling earns its keep (the engine leaves it on).
    """
    t = F.coalesce(F.col("text"), F.lit(""))
    return (
        pages.select(
            registered_domain(F.col(url_col)).alias("domain"),
            canonicalize_url(F.col(url_col)).alias("canon_url"),
            F.length(t).alias("text_len"),
        )
        .groupBy("domain")
        .agg(
            F.count("*").alias("n_pages"),
            F.countDistinct("canon_url").alias("n_canon_urls"),
            F.sum("text_len").alias("text_chars"),
        )
    )
