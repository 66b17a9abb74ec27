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

__all__ = [
    "canonicalize_url",
    "strand_pairs",
    "url_host",
    "registered_domain",
    "domain_stats",
    "domain_cap",
    "latest_revision",
    "blocklist_filter",
]

# query parameters that never affect page identity (Google/Facebook/
# generic referrer trackers); stripped wholesale by the canonicalizer.
# The name is ANCHORED at a ? or & separator (kept via $1) — unanchored,
# 'ref=' matched inside other parameter NAMES ('?href=abc' → '?h'),
# collapsing distinct pages onto one canonical dedup key
_TRACKING_PARAM_RE = r"([?&])(utm_[a-z]+|fbclid|gclid|ref)=[^&#]*"


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
    # scheme-less input (protocol-relative links, bare hosts) must pass
    # through, not collapse to '' — '' as the canonical key would alias
    # every such row onto ONE dedup/revision identity
    u = F.when(head == "", url).otherwise(F.concat(head, tail))
    u = F.regexp_replace(u, r"^([a-z]+://)www\.", r"$1")
    u = F.regexp_replace(u, r"#.*$", "")
    u = F.regexp_replace(u, _TRACKING_PARAM_RE, r"$1")
    u = F.regexp_replace(u, r"\?&+", "?")
    u = F.regexp_replace(u, r"&&+", "&")
    return F.regexp_replace(u, r"[?&]+$", "")


def url_host(url: Column) -> Column:
    """Case-folded authority with any ``www.`` prefix removed; NULL for
    scheme-less input (an empty-string host would silently merge every
    such row into one fake domain in caps/stats/blocklists)."""
    host = F.lower(F.regexp_extract(url, r"^[a-zA-Z]+://([^/?#:]*)", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    return F.when(host == "", F.lit(None).cast("string")).otherwise(host)


def registered_domain(url: Column) -> Column:
    """Last two dot-labels of the host — the registered domain under
    the simple-suffix heuristic (a full public-suffix list is a data
    file, not a code change: swap the regex for a suffix-table join)."""
    return F.regexp_extract(url_host(url), r"([^.]+\.[^.]+)$", 1)


def domain_stats(
    pages: DataFrame, url_col: str = "url", text_col: str = "text"
) -> DataFrame:
    """Per-registered-domain corpus statistics: page count, distinct
    canonical URLs (post-canonicalization dedup key-space), total text
    bytes. ONE shuffle on the domain key; at crawl scale the domain
    distribution is zipfian, so this aggregate is exactly the place
    AQE's skew handling earns its keep (the engine leaves it on).
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
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


def domain_cap(
    pages: DataFrame,
    n_per_domain: int,
    url_col: str = "url",
    order_col: str | None = None,
) -> DataFrame:
    """FineWeb-style per-domain document cap: rank each registered
    domain's documents deterministically and flag everything past rank
    ``n_per_domain``. A handful of template-heavy mega-domains otherwise
    dominate any crawl corpus; capping them is the standard
    source-diversity gate (FineWeb, RefinedWeb, Dolma all apply one).

    Ranking: ``order_col`` DESCENDING when given (cap keeps the
    highest-quality docs), canonical URL ascending as the always-present
    deterministic tie-break. Output keeps EVERY input row with
    ``domain``, ``domain_rank``, ``domain_capped`` verdict columns —
    audit, not silent drops.

    Scale shape: ONE shuffle on the registered domain (zipfian —
    exactly where AQE skew handling earns its keep). The window sorts
    only within a domain; for a true mega-domain (10^8 pages) a
    production refinement pre-counts domains and windows only those
    over the cap — same output, noted here because the count dim is a
    one-aggregate prepass, not a plan change.
    """
    order = [F.col("_canon").asc()]
    if order_col is not None:
        order = [F.col(order_col).desc()] + order
    from pyspark.sql import Window

    w = Window.partitionBy("domain").orderBy(*order)
    return (
        pages.withColumn("domain", registered_domain(F.col(url_col)))
        .withColumn("_canon", canonicalize_url(F.col(url_col)))
        .withColumn("domain_rank", F.row_number().over(w))
        .withColumn("domain_capped", F.col("domain_rank") > n_per_domain)
        .drop("_canon")
    )


def latest_revision(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    tie_col: str | None = None,
) -> DataFrame:
    """Cross-snapshot URL revisit dedup: a crawl refresh re-fetches
    pages it already holds; training corpora keep exactly one revision
    per page — the NEWEST capture wins (the CommonCrawl convention).

    Ranks revisions per CANONICAL url (tracking params/fragments never
    distinguish revisions) by ``ts_col`` descending, ``tie_col``
    ascending as the deterministic tie-break for identical capture
    timestamps. Output keeps EVERY input row with ``canon_url``,
    ``revision_rank`` and ``is_latest`` verdict columns.

    Scale shape: ONE shuffle on the canonical url — the key the
    extraction pipeline already partitions by, so at 10^12 rows AQE
    reuses the exchange; nothing else moves.
    """
    order = [F.col(ts_col).desc()]
    if tie_col is not None:
        order.append(F.col(tie_col).asc())
    from pyspark.sql import Window

    w = Window.partitionBy("canon_url").orderBy(*order)
    return (
        pages.withColumn("canon_url", canonicalize_url(F.col(url_col)))
        .withColumn("revision_rank", F.row_number().over(w))
        .withColumn("is_latest", F.col("revision_rank") == 1)
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    url_col: str = "url",
    digest_col: str = "digest",
) -> DataFrame:
    """Cross-snapshot delta: classify every CANONICAL url across two
    crawl snapshots as ``new`` / ``changed`` / ``unchanged`` / ``gone``
    — the overlap statistic crawl projects publish per release, and
    the planning input for incremental extraction (only ``new`` +
    ``changed`` need the kernel; ``gone`` feeds link-rot metrics).

    Inputs are (url, digest) relations — digest any content hash (the
    pipeline's md5(normalized_text)).  Each side is first collapsed to
    one row per canonical url (min digest as the deterministic pick
    for within-snapshot revisits), then FULL OUTER joined on the
    canonical key.  Output: ``(canon_url, old_digest, new_digest,
    change)``.

    Scale shape: two groupBys and one full-outer join, all on the same
    canonical-url key the pipeline partitions by — three reuses of one
    exchange under AQE; the shuffle carries 16-byte digests, never
    bodies.
    """
    def canon(df: DataFrame, out: str) -> DataFrame:
        return (
            df.select(
                canonicalize_url(F.col(url_col)).alias("canon_url"),
                F.col(digest_col).alias(out),
            )
            .groupBy("canon_url")
            .agg(F.min(out).alias(out))
        )

    o = canon(old, "old_digest")
    n = canon(new, "new_digest")
    change = (
        F.when(F.col("old_digest").isNull(), F.lit("new"))
        .when(F.col("new_digest").isNull(), F.lit("gone"))
        .when(F.col("old_digest") == F.col("new_digest"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return o.join(n, "canon_url", "full_outer").select(
        "canon_url", "old_digest", "new_digest", change.alias("change")
    )


def url_template(url: Column) -> Column:
    """Generalize a URL's path into its TEMPLATE: every path segment
    that is all digits → ``{d}``, all hex (with at least one digit,
    len ≥ 8) → ``{h}``, mixed word-digit → ``{w}``; literal segments
    stay.  Query string is reduced to its sorted-less key skeleton
    (names kept, values dropped).  ``host + template`` is the
    crawler-trap / infinite-space detection key."""
    host = F.lower(F.regexp_extract(url, r"^[a-zA-Z]+://([^/?#:]*)", 1))
    path = F.regexp_extract(url, r"^[a-zA-Z]+://[^/?#]*(/[^?#]*)?", 1)
    # per-SEGMENT classification (split/transform/join, not lookarounds
    # — RE2 oracles have none): all-digits, long-hex-with-digit, then
    # mixed letter+digit slug; literal segments stay
    seg = lambda s: (  # noqa: E731
        F.when(s.rlike("^[0-9]+$"), F.lit("{d}"))
        .when(s.rlike("^[0-9a-f]{8,}$") & s.rlike("[0-9]"), F.lit("{h}"))
        .when(
            s.rlike("^[0-9a-z_-]+$") & s.rlike("[0-9]") & s.rlike("[a-z]"),
            F.lit("{w}"),
        )
        .otherwise(s)
    )
    p = F.array_join(F.transform(F.split(path, "/"), seg), "/")
    q = F.regexp_replace(
        F.regexp_extract(url, r"\?([^#]*)", 1), r"=[^&]*", ""
    )
    return F.concat(
        host,
        F.when(p == "", F.lit("/")).otherwise(p),
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
    )


def url_template_stats(
    pages: DataFrame, url_col: str = "url", trap_threshold: int = 1000
) -> DataFrame:
    """Crawler-trap detection: count distinct URLs per (host, url
    template).  Calendars, session-id paths, faceted search and other
    infinite URL spaces collapse to one template with a huge count —
    the frontier then caps or drops the template (the Heritrix/
    Nutch-style trap heuristic, relationally).

    Output: ``(template, n_urls, is_trap)``, one shuffle on the
    template key; the count is over the already-canonicalized url so
    revisits don't inflate it.
    """
    t = pages.select(
        url_template(F.col(url_col)).alias("template"),
        canonicalize_url(F.col(url_col)).alias("canon"),
    )
    return (
        t.groupBy("template")
        .agg(F.countDistinct("canon").alias("n_urls"))
        .withColumn("is_trap", F.col("n_urls") >= trap_threshold)
    )


def _host_registered_domain(host: Column) -> Column:
    return F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)


def blocklist_filter(
    pages: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    entry_col: str = "entry",
    broadcast: bool = True,
) -> DataFrame:
    """UT1-style domain blocklist: a page is blocked when its host IS a
    blocklist entry or sits under one (``host == e`` or
    ``host ends with "." + e``) — so the entry ``ads.example`` blocks
    every subdomain without a false hit on ``badads.example``.

    Plan shape for 10^12 pages: entries group per registered domain
    into a tiny dim (one array per domain), the pages side joins it on
    its OWN registered domain — a broadcast equi-join, no shuffle of
    the crawl — and the suffix check runs as an ``exists`` lambda over
    the few entries sharing that domain. Output keeps EVERY input row
    with ``is_blocked`` + the matched entry (``blocked_by``): verdict
    columns, not silent drops (the C4-filter visibility contract).
    """
    bl = (
        # entries normalize like page hosts do (url_host strips www.),
        # or a 'www.badsite.com' list entry — common in UT1 dumps —
        # would never match anything
        blocklist.select(
            F.regexp_replace(
                F.lower(F.trim(F.col(entry_col))), r"^www\.", ""
            ).alias("e")
        )
        .withColumn("_bl_reg", _host_registered_domain(F.col("e")))
        .groupBy("_bl_reg")
        .agg(F.collect_set("e").alias("_bl_entries"))
    )
    if broadcast:
        bl = F.broadcast(bl)
    host = F.col("_host")
    hit = lambda e: (host == e) | host.endswith(F.concat(F.lit("."), e))  # noqa: E731
    return (
        pages.withColumn("_host", url_host(F.col(url_col)))
        .withColumn("_bl_reg", _host_registered_domain(F.col("_host")))
        .join(bl, "_bl_reg", "left")
        .withColumn(
            "blocked_by",
            F.array_min(F.filter(F.coalesce("_bl_entries", F.array()), hit)),
        )
        .withColumn("is_blocked", F.col("blocked_by").isNotNull())
        .drop("_bl_reg", "_bl_entries")
        .withColumnRenamed("_host", "host")
    )


# language markers STRAND looks for as a whole path segment; kept to a
# fixed closed set so the extraction regex is RE2-portable (the DuckDB
# oracle) and can't mistake /end/ or /staging/ for a language
_STRAND_LANGS = ("en", "es", "fr", "de", "zh", "ja", "pt", "it", "ru")
_STRAND_SEG_RE = r"/(%s)/" % "|".join(_STRAND_LANGS)


def strand_pairs(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """URL-structure bitext candidate mining (STRAND, Resnik & Smith
    2003): two pages whose URLs are identical after removing a
    language path segment are translation candidates.

    → ``(base_key, lang_a, url_a, lang_b, url_b)`` with ``lang_a <
    lang_b`` (one row per unordered pair). Candidates feed
    ``similarity.margin_bitext_pairs`` for content verification — URL
    mining recalls pairs whose embeddings are missing, embedding
    mining recalls pairs whose sites don't mirror paths; a curation
    pipeline wants both.

    Scale shape: the language segment extraction is a narrow regex
    projection; the only shuffle is the self-equi-join on ``base_key``
    (the language-stripped URL). Multilingual mirrors put 2-10 pages
    per key, so the join explodes nothing; pages with no language
    segment are filtered BEFORE the shuffle.
    """
    marked = (
        pages.withColumn(
            "_lang", F.regexp_extract(F.col(url_col), _STRAND_SEG_RE, 1)
        )
        .filter(F.col("_lang") != "")
        .withColumn(
            "base_key",
            F.regexp_replace(F.col(url_col), _STRAND_SEG_RE, "/"),
        )
        .select("base_key", F.col("_lang").alias("lang"), F.col(url_col).alias("url"))
    )
    a = marked.select(
        "base_key", F.col("lang").alias("lang_a"), F.col("url").alias("url_a")
    )
    b = marked.select(
        "base_key", F.col("lang").alias("lang_b"), F.col("url").alias("url_b")
    )
    return a.join(b, "base_key").filter(F.col("lang_a") < F.col("lang_b"))


def domain_prior(
    docs: DataFrame,
    url_col: str = "url",
    score_col: str = "score_ppm",
    smoothing: int = 10,
) -> DataFrame:
    """Bayesian-shrunk per-domain quality prior (the FineWeb-style
    "domain reputation" rollup): documents carry an integer quality
    score in parts-per-million (e.g. ``classifier`` output × 1e6, or a
    gopher-gate pass rate); the domain prior is the score mean shrunk
    toward the corpus mean by ``smoothing`` pseudo-observations::

        prior_ppm = (sum_ppm + smoothing * global_ppm) div (n + smoothing)

    so a 2-document domain stays near the corpus mean while a
    10^6-document domain converges to its own mean — the standard fix
    for small-domain variance before using the prior as a sampling or
    gating signal.

    ALL-INTEGER arithmetic: long sums and ``div`` (exact integer
    division) make the result bit-identical on any engine — no float
    association-order hazards (see sketch.py's determinism notes).
    Plan shape: one shuffle on the registered domain (zipfian → AQE
    skew territory), plus a one-row global aggregate broadcast back
    via cross join; output is domain-dimension-sized.
    """
    keyed = docs.select(
        registered_domain(F.col(url_col)).alias("domain"),
        F.col(score_col).cast("long").alias("_s"),
    )
    per_dom = keyed.groupBy("domain").agg(
        F.count("*").alias("n_docs"), F.sum("_s").alias("sum_ppm")
    )
    glob = keyed.agg(
        F.expr("sum(_s) div count(*)").alias("_global_ppm")
    )
    return (
        per_dom.crossJoin(F.broadcast(glob))
        .select(
            "domain",
            "n_docs",
            F.col("_global_ppm").alias("global_ppm"),
            F.expr(
                f"(sum_ppm + {int(smoothing)} * _global_ppm)"
                f" div (n_docs + {int(smoothing)})"
            ).alias("prior_ppm"),
        )
    )


def snapshot_drift_report(
    old: DataFrame,
    new: DataFrame,
    url_col: str = "url",
    digest_col: str = "digest",
    score_col: str = "score_ppm",
) -> DataFrame:
    """Per-domain crawl-drift report — the release dashboard a crawl
    project publishes between snapshots and the alarm input for
    curation regressions::

        (domain, n_new, n_changed, n_unchanged, n_gone,
         old_score_ppm, new_score_ppm, score_delta_ppm)

    built from :func:`snapshot_diff` (canonical-url deltas) plus each
    side's integer quality score (``score_ppm``, e.g. classifier
    output × 1e6): score means are exact ``sum DIV count`` per domain
    and side — a drop in ``score_delta_ppm`` on a big domain between
    snapshots is the classic sign of a template change breaking
    extraction. ALL-INTEGER, same discipline as :func:`domain_prior`.

    Scale shape: the diff's full-outer join runs on the canonical-url
    key; the report is one further groupBy on the registered domain
    (zipfian → AQE skew territory). Null-safe: a domain present on one
    side only reports that side's mean and a null delta.
    """
    diff = snapshot_diff(old, new, url_col, digest_col)
    dom = registered_domain(F.col("canon_url"))
    counts = diff.groupBy(dom.alias("domain")).agg(
        F.count(F.when(F.col("change") == "new", 1)).alias("n_new"),
        F.count(F.when(F.col("change") == "changed", 1)).alias("n_changed"),
        F.count(F.when(F.col("change") == "unchanged", 1)).alias("n_unchanged"),
        F.count(F.when(F.col("change") == "gone", 1)).alias("n_gone"),
    )

    def side_mean(df: DataFrame, out: str) -> DataFrame:
        return (
            df.select(
                registered_domain(canonicalize_url(F.col(url_col)))
                .alias("domain"),
                F.col(score_col).cast("long").alias("_s"),
            )
            .groupBy("domain")
            .agg(F.expr("sum(_s) div count(*)").alias(out))
        )

    o = side_mean(old, "old_score_ppm")
    n = side_mean(new, "new_score_ppm")
    return (
        counts.join(o, "domain", "left")
        .join(n, "domain", "left")
        .withColumn(
            "score_delta_ppm",
            F.col("new_score_ppm") - F.col("old_score_ppm"),
        )
    )
