"""End-to-end crawl-planning plan: the fetch-side assembly line.

Composes the engine's crawl operators into the standard pre-fetch
sequence (the politeness/discovery loop every production crawler runs)
in ONE call, mirroring :mod:`plans.curate`'s shape for the content
side:

    robots parse → rules + crawl-delay dims
    sitemap freshness → due-recrawl URLs
    candidates ∪ due → robots verdicts (audited, not silently dropped)
    allowed → politeness-scheduled frontier

Plan-shape invariants (inherited from the operator modules —
functions/robots.py):

* robots.txt bodies are a PER-HOST dimension (~10^7 rows at full crawl
  scale, KBs each): rules/delays derive narrowly from it and join the
  10^12-row URL side on the host key, broadcast while they fit.
* The URL side shuffles at most twice: once for the per-URL winning
  rule window (co-keyed with the join), once for the per-host frontier
  sequence window. Bodies never enter this plan at all.
* Every discarded URL stays visible: ``verdicts`` keeps one row per
  input URL with the matched rule, exactly like ``curate``'s
  ``verdicts`` relation — at crawl scale "filter silently" is how
  politeness incidents ship.

Reference scope note: the reference repo has no crawler — this plan is
part of the beyond-reference training-data surface (SURVEY.md §2.9)
the brief mandates for a 10^12-page corpus engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.robots import (
    frontier_schedule,
    robots_check,
    robots_crawl_delay,
    robots_rules,
    sitemap_recrawl,
)


def crawl_plan(
    candidates: DataFrame,
    robots: DataFrame,
    sitemap_pages: DataFrame | None = None,
    crawl_ledger: DataFrame | None = None,
    agent: str = "*",
    url_col: str = "url",
    priority_col: str | None = None,
    default_delay: float = 1.0,
    wildcards: bool = False,
) -> dict[str, DataFrame]:
    """Candidates + robots bodies (+ optional sitemap/ledger) → the
    scheduled fetch frontier, with every intermediate relation exposed.

    Returns ``{rules, delays, recrawl, verdicts, frontier}``:

    * ``rules`` / ``delays`` — the per-host robots dimensions for
      ``agent`` (most-specific-agent-wins group selection).
    * ``recrawl`` — sitemap-freshness verdicts (None when no sitemap
      input); its ``due`` URLs join the candidate set with a null
      priority (freshness decides *whether* to fetch, the caller's
      priority decides *when* — due-but-unprioritized URLs sort after
      prioritized ones under the frontier's ``DESC NULLS LAST``).
    * ``verdicts`` — one row per candidate∪due URL with the winning
      robots rule and ``allowed``.
    * ``frontier`` — allowed URLs, per-host politeness-sequenced with
      Crawl-delay-spaced offsets.
    """
    rules = robots_rules(robots, agent=agent)
    delays = robots_crawl_delay(robots, agent=agent)

    if crawl_ledger is not None and sitemap_pages is None:
        raise ValueError(
            "crawl_ledger given without sitemap_pages: the ledger is only "
            "consumed by the sitemap-freshness stage — silently ignoring "
            "it would hide the misuse"
        )
    urls = candidates
    recrawl = None
    if sitemap_pages is not None:
        if crawl_ledger is None:
            # first crawl: no ledger yet means NOTHING has been fetched,
            # so every sitemap entry is due as never_fetched — silently
            # dropping discovery here would be exactly the filter-
            # silently failure mode this module bans
            spark = candidates.sparkSession
            crawl_ledger = spark.createDataFrame(
                [], "url string, last_fetch_ts timestamp"
            )
        recrawl = sitemap_recrawl(sitemap_pages, crawl_ledger)
        due = (
            recrawl.filter(F.col("due"))
            .select(F.col("url").alias(url_col))
            # a URL that is both a candidate and due keeps its candidate
            # row (it carries the caller's priority); a bag union would
            # give it two verdict rows and two frontier slots — fetched
            # twice, with every later offset inflated by one crawl_delay
            .join(candidates.select(url_col), url_col, "left_anti")
        )
        urls = candidates.unionByName(due, allowMissingColumns=True)

    verdicts = robots_check(urls, rules, url_col=url_col, wildcards=wildcards)
    allowed_cols = [url_col] + (
        [priority_col] if priority_col is not None else []
    )
    frontier = frontier_schedule(
        verdicts.filter(F.col("allowed")).select(*allowed_cols),
        delays,
        url_col=url_col,
        priority_col=priority_col,
        default_delay=default_delay,
    )
    return {
        "rules": rules,
        "delays": delays,
        "recrawl": recrawl,
        "verdicts": verdicts,
        "frontier": frontier,
    }
