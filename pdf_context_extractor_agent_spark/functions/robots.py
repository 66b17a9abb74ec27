"""robots.txt crawl policy: parse, match, schedule.

The third leg of the crawl-policy family (URL blocklists in
``urls.blocklist_filter``, in-page ``<meta name="robots">`` in
``webtext.meta_robots``): parse raw ``robots.txt`` bodies into a
per-host RULES DIMENSION, check candidate URLs against it with
longest-path-match semantics, and turn ``Crawl-delay`` directives into
a politeness-scheduled fetch frontier.

Scale shape: robots bodies are one per HOST — even a 10^12-page crawl
has ~10^8 hosts, so the parsed rules relation is a dimension table
next to the pages fact. Parsing is narrow per-host work (split +
windows partitioned by host); the URL check is an equi-join on host
with a prefix predicate, where AQE picks broadcast-vs-shuffle from the
dimension's runtime size. Nothing here touches page bodies.

Parsing semantics (the deterministic subset of REP / RFC 9309 that is
cross-engine exact — documented simplifications at each function):

* lines split on ``\\n``; ``#`` comments stripped; fields are
  ``directive: value`` with a case-insensitive directive name;
* consecutive ``User-agent`` lines form one group header; the rules
  that follow belong to every agent named in that header run;
* a group applies to the target agent if it names it exactly
  (case-insensitive); if any group on the host does, ``*`` groups are
  ignored (most-specific-agent wins, per RFC 9309 §2.2.1);
* ``Disallow:`` with an empty value is "allow everything" — it emits
  no rule;
* path matching is LITERAL PREFIX match (no ``*``/``$`` wildcards —
  the reference subset; a wildcard-to-regex pass would slot into the
  same join predicate);
* longest matched path wins; on a length tie ``allow`` beats
  ``disallow``; a URL with no matching rule is allowed.

Reference parity note: the reference pipeline is file-driven
(``src/main.py``) and has no crawler surface; this module is part of
the beyond-reference web-curation layer for crawl-scale corpora.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "robots_lines",
    "robots_rules",
    "robots_crawl_delay",
    "robots_check",
    "frontier_schedule",
    "sitemap_entries",
    "feed_entries",
]


def _url_path(url: Column) -> Column:
    """Path-and-query component of ``url`` (no fragment), ``/`` if
    empty. RFC 9309 / Google matching compares rules against the path
    INCLUDING the query — with the query stripped, the very common
    ``Disallow: /search?`` (or wildcard ``/*?sort=``) rules could never
    match anything."""
    p = F.regexp_extract(url, r"^[a-zA-Z]+://[^/?#]*(/[^#]*)", 1)
    return F.when(p == "", F.lit("/")).otherwise(p)


def robots_lines(
    robots: DataFrame, host_col: str = "host", body_col: str = "robots_txt"
) -> DataFrame:
    """Tokenize robots bodies into directive lines with group ids.

    One row per recognized directive line: ``host, pos, directive
    (lowercased), value, group_id`` where ``group_id`` numbers the
    rule groups per host (a group starts at a ``User-agent`` line whose
    predecessor directive line is NOT a ``User-agent`` line, so a run
    of consecutive agent lines shares one header).

    Narrow until the per-host window — and that window sorts a few
    dozen lines per host, never page-scale data.
    """
    w = Window.partitionBy(host_col).orderBy("pos")
    lines = (
        robots.select(
            host_col,
            F.posexplode(F.split(F.coalesce(F.col(body_col), F.lit("")), "\n")).alias(
                "pos", "raw"
            ),
        )
        .withColumn("line", F.trim(F.regexp_replace("raw", r"#.*$", "")))
        .withColumn(
            "directive",
            F.lower(F.regexp_extract("line", r"^([A-Za-z][A-Za-z-]*)\s*:", 1)),
        )
        .withColumn("value", F.trim(F.regexp_extract("line", r"^[A-Za-z][A-Za-z-]*\s*:(.*)$", 1)))
        .filter(
            F.col("directive").isin("user-agent", "allow", "disallow", "crawl-delay")
        )
        .drop("raw", "line")
    )
    is_ua = (F.col("directive") == "user-agent").cast("int")
    new_group = (
        (F.col("__is_ua") == 1)
        & (F.coalesce(F.lag("__is_ua").over(w), F.lit(0)) == 0)
    ).cast("int")
    return (
        lines.withColumn("__is_ua", is_ua)
        .withColumn("__new_group", new_group)
        .withColumn(
            "group_id",
            F.sum("__new_group").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .drop("__is_ua", "__new_group")
    )


def _applicable_groups(
    lines: DataFrame, agent: str, host_col: str = "host"
) -> DataFrame:
    """Groups whose header names ``agent`` — or ``*`` groups when no
    group on the host names it (most-specific-agent wins)."""
    flags = (
        lines.filter(F.col("directive") == "user-agent")
        .groupBy(host_col, "group_id")
        .agg(
            F.max((F.lower(F.col("value")) == agent.lower()).cast("int")).alias(
                "has_specific"
            ),
            F.max((F.col("value") == "*").cast("int")).alias("has_star"),
        )
    )
    wh = Window.partitionBy(host_col)
    return (
        flags.withColumn("__any_specific", F.max("has_specific").over(wh))
        .filter(
            (F.col("has_specific") == 1)
            | ((F.col("__any_specific") == 0) & (F.col("has_star") == 1))
        )
        .select(host_col, "group_id")
    )


def robots_rules(
    robots: DataFrame,
    agent: str = "*",
    host_col: str = "host",
    body_col: str = "robots_txt",
) -> DataFrame:
    """Parse robots bodies into the rules dimension for ``agent``.

    Output: ``host, rule ('allow'|'disallow'), path, path_len`` — one
    row per non-empty allow/disallow rule in the groups that apply to
    ``agent``. Empty ``Disallow:`` (allow-all) emits nothing by design.
    """
    lines = robots_lines(robots, host_col, body_col)
    groups = _applicable_groups(lines, agent, host_col)
    return (
        lines.join(groups, [host_col, "group_id"])
        .filter(F.col("directive").isin("allow", "disallow") & (F.col("value") != ""))
        .select(
            host_col,
            F.col("directive").alias("rule"),
            F.col("value").alias("path"),
            F.length("value").alias("path_len"),
        )
    )


def robots_crawl_delay(
    robots: DataFrame,
    agent: str = "*",
    host_col: str = "host",
    body_col: str = "robots_txt",
) -> DataFrame:
    """Per-host ``Crawl-delay`` (seconds, double) for ``agent``.

    Hosts whose applicable groups carry no parseable delay are absent
    (callers coalesce a default). Multiple delays (several applicable
    groups) resolve to the MAXIMUM — the polite reading.
    """
    lines = robots_lines(robots, host_col, body_col)
    groups = _applicable_groups(lines, agent, host_col)
    delay = F.col("value").cast("double")
    return (
        lines.join(groups, [host_col, "group_id"])
        .filter((F.col("directive") == "crawl-delay") & delay.isNotNull())
        .groupBy(host_col)
        .agg(F.max(delay).alias("crawl_delay"))
    )


def _wildcard_pattern(rpath) -> "F.Column":
    """RFC 9309 path pattern → anchored regex: ``*`` matches any run,
    a TRAILING ``$`` anchors end-of-path (elsewhere ``$`` is literal);
    every other regex metacharacter is escaped."""
    anchored = rpath.endswith("$")
    base = F.when(anchored, rpath.substr(F.lit(1), F.length(rpath) - 1)) \
        .otherwise(rpath)
    esc = F.regexp_replace(base, r"([.^$+?(){}\[\]|\\])", r"\\$1")
    starred = F.replace(esc, F.lit("*"), F.lit(".*"))
    return F.concat(
        F.lit("^"), starred,
        F.when(anchored, F.lit("$")).otherwise(F.lit("")),
    )


def robots_check(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    wildcards: bool = False,
) -> DataFrame:
    """Verdict every URL against the parsed rules dimension.

    Longest-matched-path wins; ties go to ``allow``; no match (or no
    rules for the host) ⇒ allowed. Output keeps every input row plus
    ``host, path, matched_rule, matched_path, allowed`` — audit
    columns, not silent drops.

    ``wildcards=True`` enables RFC 9309 §2.2.3 pattern matching:
    ``*`` in a rule path matches any character run and a trailing
    ``$`` anchors the end of the path (Google/Bing semantics — most
    real robots files use them). Specificity stays the spec's rule:
    longest RAW pattern wins (``path_len`` over the original rule
    text, wildcards counted). The default prefix mode is untouched —
    it is the faster join (literal startswith vs per-row-compiled
    RLIKE on the dimension side) and exactly RFC-minimal.

    Plan shape: derive host+path narrowly, ONE equi-join on host with
    the match predicate pushed into the join condition, then a
    per-URL window to pick the winning rule. The rules side is a
    dimension (per-host, not per-page): AQE broadcasts it when small.
    """
    from .urls import url_host

    keyed = (
        urls
        # a stable per-row identity: the winner window otherwise
        # partitions on the column VALUES, so two identical input rows
        # (a frontier with repeated candidates) would collapse to one
        # verdict — violating the keeps-every-input-row contract
        .withColumn("__rid", F.monotonically_increasing_id())
        .withColumn("host", url_host(F.col(url_col)))
        .withColumn("path", _url_path(F.col(url_col)))
    )
    r = rules.select(
        F.col(host_col).alias("__rhost"),
        F.col("rule").alias("__rule"),
        F.col("path").alias("__rpath"),
        F.col("path_len").alias("__rlen"),
    )
    if wildcards:
        r = r.withColumn("__rpat", _wildcard_pattern(F.col("__rpath")))
        match = F.expr("path RLIKE __rpat")
    else:
        match = F.col("path").startswith(F.col("__rpath"))
    joined = keyed.join(
        r,
        (F.col("host") == F.col("__rhost")) & match,
        "left",
    )
    w = (
        Window.partitionBy("__rid")
        .orderBy(
            F.col("__rlen").desc_nulls_last(),
            F.col("__rule").asc_nulls_last(),  # 'allow' < 'disallow': ties go to allow
        )
    )
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            *urls.columns,
            "host",
            "path",
            F.col("__rule").alias("matched_rule"),
            F.col("__rpath").alias("matched_path"),
            (F.coalesce(F.col("__rule"), F.lit("allow")) == "allow").alias("allowed"),
        )
    )


def frontier_schedule(
    urls: DataFrame,
    delays: DataFrame,
    url_col: str = "url",
    priority_col: str | None = None,
    default_delay: float = 1.0,
    host_col: str = "host",
) -> DataFrame:
    """Politeness-scheduled fetch frontier.

    Orders each host's candidate URLs (``priority_col`` DESCENDING when
    given, canonical URL ascending as the deterministic tie-break) and
    assigns ``fetch_seq`` (1-based per host) and ``scheduled_offset_secs
    = (fetch_seq - 1) × crawl_delay`` — the earliest polite fetch time
    relative to the host's first request. Hosts absent from ``delays``
    use ``default_delay``.

    ONE shuffle on the host key (zipfian — AQE skew handling applies);
    the delay dim joins per host, broadcast when small.
    """
    from .urls import canonicalize_url, url_host

    keyed = urls.withColumn("host", url_host(F.col(url_col))).withColumn(
        "__canon", canonicalize_url(F.col(url_col))
    )
    order = [F.col("__canon").asc()]
    if priority_col is not None:
        order = [F.col(priority_col).desc()] + order
    w = Window.partitionBy("host").orderBy(*order)
    d = delays.select(
        F.col(host_col).alias("host"), F.col("crawl_delay").alias("__delay")
    )
    return (
        keyed.withColumn("fetch_seq", F.row_number().over(w))
        .join(d, "host", "left")
        .withColumn(
            "crawl_delay", F.coalesce(F.col("__delay"), F.lit(float(default_delay)))
        )
        .withColumn(
            "scheduled_offset_secs",
            (F.col("fetch_seq") - F.lit(1)) * F.col("crawl_delay"),
        )
        .select(
            *urls.columns,
            "host",
            "fetch_seq",
            "crawl_delay",
            "scheduled_offset_secs",
        )
    )


def sitemap_entries(
    sitemaps: DataFrame, host_col: str = "host", body_col: str = "sitemap_xml"
) -> DataFrame:
    """Parse sitemap XML bodies into a URL-discovery relation.

    Handles both document kinds in one pass: ``<urlset>`` page entries
    (kind ``url``) and ``<sitemapindex>`` child-sitemap entries (kind
    ``sitemap``).  Output: ``host, kind, loc, lastmod (string|null),
    priority (double|null)`` — one row per ``<url>``/``<sitemap>``
    element, element order preserved per host via ``posexplode``.

    Pure regexp algebra over the body ((?s) non-greedy element capture,
    then per-element ``<loc>``/``<lastmod>``/``<priority>`` extraction)
    — zero shuffles, rides the fetch scan.  Like robots bodies,
    sitemaps are per-HOST dimension data: even a 10^12-page crawl
    parses ~10^8 of them.  Entities and CDATA are NOT decoded (the
    deterministic subset; a decode pass would slot in per-element).
    """
    body = F.coalesce(F.col(body_col), F.lit(""))
    urls = F.transform(
        F.regexp_extract_all(body, F.lit(r"(?s)<url>(.*?)</url>"), 1),
        lambda e: F.struct(F.lit("url").alias("kind"), e.alias("raw")),
    )
    maps = F.transform(
        F.regexp_extract_all(body, F.lit(r"(?s)<sitemap>(.*?)</sitemap>"), 1),
        lambda e: F.struct(F.lit("sitemap").alias("kind"), e.alias("raw")),
    )
    exploded = sitemaps.select(
        host_col, F.posexplode(F.concat(urls, maps)).alias("pos", "e")
    )
    raw = F.col("e.raw")
    loc = F.trim(F.regexp_extract(raw, r"(?s)<loc>(.*?)</loc>", 1))
    lastmod = F.trim(F.regexp_extract(raw, r"(?s)<lastmod>(.*?)</lastmod>", 1))
    priority = F.trim(F.regexp_extract(raw, r"(?s)<priority>(.*?)</priority>", 1))
    return (
        exploded.select(
            host_col,
            "pos",
            F.col("e.kind").alias("kind"),
            loc.alias("loc"),
            F.when(lastmod != "", lastmod).alias("lastmod"),
            F.when(priority != "", priority.cast("double")).alias("priority"),
        )
        .filter(F.col("loc") != "")
    )


def feed_entries(
    feeds: DataFrame, host_col: str = "host", body_col: str = "feed_xml"
) -> DataFrame:
    """Parse RSS/Atom feed bodies into a URL-discovery relation — the
    third discovery channel next to sitemaps and outlinks (feeds carry
    the freshest per-site URLs plus publication timestamps, the
    recency signal crawl scheduling keys on).

    Both dialects in one pass: RSS ``<item>`` blocks (``<link>`` text
    element, ``<pubDate>``) and Atom ``<entry>`` blocks (``<link
    href="..."/>`` attribute, ``<updated>``).  Output: ``host, pos,
    kind ('rss'|'atom'), link, title (string|null), published
    (string|null)`` — element order preserved per host.

    Same scale posture as :func:`sitemap_entries`: pure regexp algebra,
    zero shuffles, and feeds are per-HOST dimension data — even a
    10^12-page crawl parses ~10^8 of them.  Entities/CDATA are not
    decoded (deterministic subset).
    """
    body = F.coalesce(F.col(body_col), F.lit(""))
    items = F.transform(
        F.regexp_extract_all(body, F.lit(r"(?s)<item>(.*?)</item>"), 1),
        lambda e: F.struct(F.lit("rss").alias("kind"), e.alias("raw")),
    )
    entries = F.transform(
        F.regexp_extract_all(body, F.lit(r"(?s)<entry>(.*?)</entry>"), 1),
        lambda e: F.struct(F.lit("atom").alias("kind"), e.alias("raw")),
    )
    exploded = feeds.select(
        host_col, F.posexplode(F.concat(items, entries)).alias("pos", "e")
    )
    raw = F.col("e.raw")
    rss_link = F.trim(F.regexp_extract(raw, r"(?s)<link>(.*?)</link>", 1))
    atom_link = F.regexp_extract(raw, r'(?s)<link\s+[^>]*href\s*=\s*"([^"]*)"', 1)
    link = F.when(F.col("e.kind") == "rss", rss_link).otherwise(atom_link)
    title = F.trim(F.regexp_extract(raw, r"(?s)<title>(.*?)</title>", 1))
    published = F.trim(
        F.coalesce(
            F.when(
                (p := F.regexp_extract(raw, r"(?s)<pubDate>(.*?)</pubDate>", 1)) != "",
                p,
            ),
            F.regexp_extract(raw, r"(?s)<updated>(.*?)</updated>", 1),
        )
    )
    return (
        exploded.select(
            host_col,
            "pos",
            F.col("e.kind").alias("kind"),
            link.alias("link"),
            F.when(title != "", title).alias("title"),
            F.when(published != "", published).alias("published"),
        )
        .filter(F.col("link") != "")
    )


def robots_sitemaps(
    robots: DataFrame, host_col: str = "host", body_col: str = "robots_txt"
) -> DataFrame:
    """``Sitemap:`` directives → ``(host, pos, sitemap_url)`` — the
    discovery bridge from a host's robots.txt into
    :func:`sitemap_entries`. Sitemap is a GLOBAL directive (RFC 9309
    §2.3 treats it as outside any user-agent group), so this is a
    plain line scan, deliberately not routed through the group
    machinery of :func:`robots_lines` (which drops it). Case-
    insensitive directive match, comments stripped, absolute URLs
    only (the spec requires absolute; relative lines are junk and
    skipped)."""
    lines = robots.select(
        host_col,
        F.posexplode(
            F.split(F.coalesce(F.col(body_col), F.lit("")), "\n")
        ).alias("pos", "raw"),
    ).withColumn("line", F.trim(F.regexp_replace("raw", r"#.*$", "")))
    url = F.trim(F.regexp_extract("line", r"(?i)^sitemap\s*:(.*)$", 1))
    return (
        lines.select(host_col, "pos", url.alias("sitemap_url"))
        .filter(F.col("sitemap_url").rlike("^[a-zA-Z][a-zA-Z0-9+.-]*://"))
    )


def sitemap_recrawl(
    entries: DataFrame,
    crawled: DataFrame,
    loc_col: str = "loc",
    lastmod_col: str = "lastmod",
    url_col: str = "url",
    fetch_ts_col: str = "last_fetch_ts",
) -> DataFrame:
    """Recrawl planning from sitemap freshness: join discovered page
    entries against the crawl ledger and emit a due-verdict per url::

        never_fetched          not in the ledger            → due
        modified_since_fetch   lastmod > last fetch         → due
        fresh                  lastmod ≤ last fetch         → not due
        no_lastmod             entry has no parseable date  → not due
                               (conservative: without a freshness
                               signal, recrawl cadence belongs to the
                               frontier's politeness budget instead)

    ``staleness_secs`` (lastmod − last fetch, exact integer epoch
    difference) orders the due set for budgeted recrawls; feed the
    result into :func:`frontier_schedule` for the politeness pass.
    Timestamps parse via try_cast — sitemap lastmod is W3C datetime in
    the wild, frequently truncated to a bare date; unparseable values
    classify as ``no_lastmod`` rather than erroring the plan.

    One equi-join on the url key. The sitemap side is discovery-dim
    data; the ledger is url-keyed like every other pipeline relation.
    """
    e = entries.select(
        F.col(loc_col).alias("url"),
        F.expr(f"try_cast({lastmod_col} AS timestamp)").alias("lastmod_ts"),
    )
    c = crawled.select(
        F.col(url_col).alias("url"),
        F.col(fetch_ts_col).alias("last_fetch_ts"),
    )
    j = e.join(c, "url", "left")
    due = (
        F.when(F.col("last_fetch_ts").isNull(), F.lit("never_fetched"))
        .when(F.col("lastmod_ts").isNull(), F.lit("no_lastmod"))
        .when(F.col("lastmod_ts") > F.col("last_fetch_ts"),
              F.lit("modified_since_fetch"))
        .otherwise(F.lit("fresh"))
    )
    return j.select(
        "url", "lastmod_ts", "last_fetch_ts",
        due.alias("reason"),
        due.isin("never_fetched", "modified_since_fetch").alias("due"),
        F.when(
            F.col("lastmod_ts").isNotNull() & F.col("last_fetch_ts").isNotNull(),
            F.col("lastmod_ts").cast("long") - F.col("last_fetch_ts").cast("long"),
        ).alias("staleness_secs"),
    )


def politeness_audit(
    fetches: DataFrame,
    delays: DataFrame,
    host_col: str = "host",
    ts_col: str = "fetch_ts",
    delay_col: str = "crawl_delay_secs",
    default_delay_secs: int = 1,
) -> DataFrame:
    """Post-hoc politeness compliance over a fetch log: for every fetch
    after a host's first, the gap to the previous fetch on that host
    must be ≥ the host's Crawl-delay (default 1 s where no directive —
    :func:`frontier_schedule`'s convention). Output keeps every fetch
    with ``prev_ts``, ``gap_secs`` (exact epoch difference),
    ``required_secs`` and a ``violation`` verdict — the audit a crawl
    operator runs before a politeness complaint does.

    One window over the (host, ts) order the fetch log is naturally
    keyed by, plus a broadcast-sized join against the per-host delay
    dim. First fetches have null gap and never violate."""
    w = Window.partitionBy(host_col).orderBy(ts_col)
    d = delays.select(
        F.col(host_col),
        F.col(delay_col).cast("long").alias("required_secs"),
    )
    out = (
        fetches.withColumn("prev_ts", F.lag(ts_col).over(w))
        .join(d, host_col, "left")
        .withColumn(
            "required_secs",
            F.coalesce("required_secs", F.lit(int(default_delay_secs))),
        )
        .withColumn(
            "gap_secs",
            F.when(
                F.col("prev_ts").isNotNull(),
                F.col(ts_col).cast("long") - F.col("prev_ts").cast("long"),
            ),
        )
        .withColumn(
            "violation",
            F.coalesce(F.col("gap_secs") < F.col("required_secs"),
                       F.lit(False)),
        )
    )
    return out
