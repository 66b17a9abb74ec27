"""robots.txt crawl policy: parsing groups, agent specificity,
longest-match verdicts, crawl-delay frontier scheduling."""

from __future__ import annotations

from pdf_context_extractor_agent_spark.functions.robots import (
    frontier_schedule,
    robots_check,
    robots_crawl_delay,
    robots_rules,
)


def _robots(spark, rows):
    return spark.createDataFrame(rows, "host string, robots_txt string")


def _urls(spark, rows):
    return spark.createDataFrame([(u,) for u in rows], "url string")


def test_star_group_rules_and_comments(spark):
    body = "# hi\nUSER-AGENT: *\nDisallow: /private/\nAllow: /private/pub\nDISALLOW:\n"
    rules = robots_rules(_robots(spark, [("h.com", body)]), agent="anybot")
    got = {(r.rule, r.path, r.path_len) for r in rules.collect()}
    # empty Disallow emits nothing; comment line ignored; case-folded directives
    assert got == {("disallow", "/private/", 9), ("allow", "/private/pub", 12)}


def test_specific_agent_beats_star(spark):
    body = (
        "User-agent: ccbot\nDisallow: /no-cc/\n\n"
        "User-agent: *\nDisallow: /\n"
    )
    df = _robots(spark, [("h.com", body)])
    cc = {(r.rule, r.path) for r in robots_rules(df, agent="CCBot").collect()}
    assert cc == {("disallow", "/no-cc/")}  # star group ignored for ccbot
    other = {(r.rule, r.path) for r in robots_rules(df, agent="otherbot").collect()}
    assert other == {("disallow", "/")}  # falls back to the * group


def test_multi_agent_header_run_shares_rules(spark):
    body = "User-agent: a\nUser-agent: b\nDisallow: /x/\n\nUser-agent: c\nDisallow: /y/\n"
    df = _robots(spark, [("h.com", body)])
    for agent in ("a", "b"):
        got = {(r.rule, r.path) for r in robots_rules(df, agent=agent).collect()}
        assert got == {("disallow", "/x/")}, agent
    got_c = {(r.rule, r.path) for r in robots_rules(df, agent="c").collect()}
    assert got_c == {("disallow", "/y/")}


def test_check_longest_match_and_tie_goes_to_allow(spark):
    body = "User-agent: *\nDisallow: /a/\nAllow: /a/\nDisallow: /a/b\n"
    rules = robots_rules(_robots(spark, [("h.com", body)]), agent="bot")
    urls = _urls(
        spark,
        [
            "https://h.com/a/zz",  # tie /a/ vs /a/ -> allow
            "https://h.com/a/b/c",  # /a/b (len 4) disallow wins
            "https://h.com/other",  # no match -> allowed
            "https://www.H.COM/a/b",  # host canonicalization still matches
        ],
    )
    got = {r.url: (r.allowed, r.matched_path) for r in robots_check(urls, rules).collect()}
    assert got["https://h.com/a/zz"] == (True, "/a/")
    assert got["https://h.com/a/b/c"] == (False, "/a/b")
    assert got["https://h.com/other"] == (True, None)
    assert got["https://www.H.COM/a/b"] == (False, "/a/b")


def test_check_host_without_rules_is_allowed(spark):
    rules = robots_rules(
        _robots(spark, [("h.com", "User-agent: *\nDisallow: /\n")]), agent="bot"
    )
    got = robots_check(_urls(spark, ["https://open.org/p"]), rules).collect()
    assert got[0].allowed is True and got[0].matched_rule is None


def test_crawl_delay_max_of_applicable_groups(spark):
    body = (
        "User-agent: bot\nCrawl-delay: 3\n\n"
        "User-agent: bot\nCrawl-delay: 7\n\n"
        "User-agent: *\nCrawl-delay: 99\n"
    )
    d = robots_crawl_delay(_robots(spark, [("h.com", body)]), agent="bot").collect()
    assert len(d) == 1 and d[0].crawl_delay == 7.0  # max over bot groups, * ignored


def test_frontier_schedule_politeness(spark):
    delays = robots_crawl_delay(
        _robots(spark, [("slow.com", "User-agent: *\nCrawl-delay: 10\n")]), agent="*"
    )
    urls = spark.createDataFrame(
        [
            ("https://slow.com/b", 1),
            ("https://slow.com/a", 1),
            ("https://slow.com/c", 5),
            ("https://fast.com/x", 0),
        ],
        "url string, prio int",
    )
    out = {
        r.url: (r.fetch_seq, r.crawl_delay, r.scheduled_offset_secs)
        for r in frontier_schedule(urls, delays, priority_col="prio").collect()
    }
    # slow.com: priority 5 first, then canon ascending among the prio-1 ties
    assert out["https://slow.com/c"] == (1, 10.0, 0.0)
    assert out["https://slow.com/a"] == (2, 10.0, 10.0)
    assert out["https://slow.com/b"] == (3, 10.0, 20.0)
    # no delay directive -> default 1s spacing
    assert out["https://fast.com/x"] == (1, 1.0, 0.0)


# --- feed discovery --------------------------------------------------


def test_feed_entries_rss_and_atom(spark):
    from pdf_context_extractor_agent_spark.functions.robots import feed_entries

    feeds = spark.createDataFrame(
        [
            (
                "h0",
                "<rss><channel><item><title>T</title><link> /a </link>"
                "<pubDate>Mon, 01 Jan 2024</pubDate></item>"
                "<item><link>/b</link></item>"
                "<item><title>linkless</title></item></channel></rss>"
                '<feed><entry><link rel="alt" href="/c"/>'
                "<updated>2024-05-06</updated></entry></feed>",
            ),
            ("h1", None),
        ],
        "host string, feed_xml string",
    )
    rows = sorted(
        (r["host"], r["pos"], r["kind"], r["link"], r["title"], r["published"])
        for r in feed_entries(feeds).collect()
    )
    assert rows == [
        ("h0", 0, "rss", "/a", "T", "Mon, 01 Jan 2024"),
        ("h0", 1, "rss", "/b", None, None),
        # pos 2 = linkless item, filtered; atom entry keeps pos 3
        ("h0", 3, "atom", "/c", None, "2024-05-06"),
    ]


def test_sitemap_recrawl_verdicts(spark):
    import datetime as dt

    from pdf_context_extractor_agent_spark.functions.robots import sitemap_recrawl

    entries = spark.createDataFrame(
        [
            ("https://a.com/new", "2024-02-01"),
            ("https://a.com/stale", "2024-03-01 12:00:00"),
            ("https://a.com/fresh", "2024-01-01"),
            ("https://a.com/nodate", ""),
            ("https://a.com/junkdate", "next tuesday"),
        ],
        "loc string, lastmod string",
    )
    crawled = spark.createDataFrame(
        [(u, dt.datetime(2024, 2, 15)) for u in
         ["https://a.com/stale", "https://a.com/fresh",
          "https://a.com/nodate", "https://a.com/junkdate"]],
        "url string, last_fetch_ts timestamp",
    )
    got = {r["url"]: r for r in sitemap_recrawl(entries, crawled).collect()}
    assert got["https://a.com/new"]["reason"] == "never_fetched"
    assert got["https://a.com/new"]["due"]
    assert got["https://a.com/stale"]["reason"] == "modified_since_fetch"
    assert got["https://a.com/stale"]["staleness_secs"] == int(
        (dt.datetime(2024, 3, 1, 12) - dt.datetime(2024, 2, 15)).total_seconds()
    )
    assert got["https://a.com/fresh"]["reason"] == "fresh"
    assert not got["https://a.com/fresh"]["due"]
    assert got["https://a.com/nodate"]["reason"] == "no_lastmod"
    assert got["https://a.com/junkdate"]["reason"] == "no_lastmod"


def test_robots_sitemaps_directive_scan(spark):
    from pdf_context_extractor_agent_spark.functions.robots import robots_sitemaps

    r = spark.createDataFrame(
        [
            ("a.com", "User-agent: *\nDisallow: /x\n"
                      "Sitemap: https://a.com/s.xml  # trailing comment\n"
                      "sitemap:https://a.com/s2.xml.gz\n"
                      "Sitemap: not-a-url"),
            ("b.com", None),
        ],
        "host string, robots_txt string",
    )
    got = sorted((r_["host"], r_["sitemap_url"])
                 for r_ in robots_sitemaps(r).collect())
    assert got == [
        ("a.com", "https://a.com/s.xml"),
        ("a.com", "https://a.com/s2.xml.gz"),
    ]


def test_politeness_audit_flags_fast_fetches(spark):
    import datetime as dt

    from pdf_context_extractor_agent_spark.functions.robots import (
        politeness_audit,
    )

    base = dt.datetime(2024, 1, 1)
    fetches = spark.createDataFrame(
        [
            ("a.com", base),
            ("a.com", base + dt.timedelta(seconds=5)),   # gap 5 ≥ 4 ok
            ("a.com", base + dt.timedelta(seconds=7)),   # gap 2 < 4 BAD
            ("nodim.com", base),
            ("nodim.com", base + dt.timedelta(seconds=0, microseconds=500000)),
        ],
        "host string, fetch_ts timestamp",
    )
    delays = spark.createDataFrame([("a.com", 4)],
                                   "host string, crawl_delay_secs int")
    rows = sorted(politeness_audit(fetches, delays).collect(),
                  key=lambda r: (r["host"], r["fetch_ts"]))
    a = [r for r in rows if r["host"] == "a.com"]
    assert [r["violation"] for r in a] == [False, False, True]
    assert a[2]["gap_secs"] == 2 and a[2]["required_secs"] == 4
    nd = [r for r in rows if r["host"] == "nodim.com"]
    # default 1s delay; sub-second gap truncates to 0 < 1 → violation
    assert [r["violation"] for r in nd] == [False, True]


def test_robots_wildcard_matching(spark):
    from pdf_context_extractor_agent_spark.functions.robots import robots_check

    rules = spark.createDataFrame(
        [
            ("a.com", "disallow", "/*.pdf$", 7),
            ("a.com", "allow", "/pub/*.pdf$", 11),
            ("a.com", "disallow", "/x+y(1)", 7),   # regex metas literal
            ("a.com", "disallow", "/q$", 3),
        ],
        "host string, rule string, path string, path_len int",
    )
    urls = spark.createDataFrame(
        [
            (1, "https://a.com/doc/paper.pdf"),     # *.pdf$ → blocked
            (2, "https://a.com/doc/paper.pdf?x=1"), # $ anchors PATH+QUERY
            #    → NOT blocked (Google: '/*.pdf$' does not match '.pdf?x')
            (3, "https://a.com/pub/ok.pdf"),        # longer allow wins
            (4, "https://a.com/doc/paper.pdfx"),    # $ anchor → NOT blocked
            (5, "https://a.com/x+y(1)z"),           # literal metas prefix
            (6, "https://a.com/q"),                 # /q$ exact
            (7, "https://a.com/q2"),                # anchor blocks only /q
        ],
        "doc_id int, url string",
    )
    got = {r["doc_id"]: (r["allowed"], r["matched_path"])
           for r in robots_check(urls, rules, wildcards=True).collect()}
    assert got[1] == (False, "/*.pdf$")
    assert got[2] == (True, None)  # spec: $ fails against '?x=1' tail
    assert got[3] == (True, "/pub/*.pdf$")
    assert got[4] == (True, None)
    assert got[5] == (False, "/x+y(1)")
    assert got[6] == (False, "/q$")
    assert got[7] == (True, None)
    # prefix mode unchanged: the wildcard rules match literally there
    pre = {r["doc_id"]: r["allowed"]
           for r in robots_check(urls, rules, wildcards=False).collect()}
    assert pre[1] is True  # literal '/*.pdf$' is not a prefix of the path


def test_crawl_plan_composition(spark):
    """plans.crawl.crawl_plan: due recrawls join the candidates, robots
    verdicts keep every URL (audit, not silent drop), only allowed URLs
    reach the frontier, and the no-sitemap variant skips recrawl."""
    from pdf_context_extractor_agent_spark.plans.crawl import crawl_plan

    robots = spark.createDataFrame(
        [("h0.example.com", "User-agent: *\nDisallow: /private/\nCrawl-delay: 2")],
        "host string, robots_txt string",
    )
    candidates = spark.createDataFrame(
        [
            ("https://h0.example.com/a", 5),
            ("https://h0.example.com/private/x", 9),  # disallowed
            ("https://h0.example.com/b", 1),
        ],
        "url string, priority int",
    )
    entries = spark.createDataFrame(
        [
            ("https://h0.example.com/new", "2024-02-01"),       # never fetched → due
            ("https://h0.example.com/old", "2024-01-01"),       # fresh
            ("https://h0.example.com/private/new", "2024-02-01"),  # due but disallowed
        ],
        "loc string, lastmod string",
    )
    from pyspark.sql import functions as F

    ledger = spark.createDataFrame(
        [("https://h0.example.com/old", "2024-01-15 00:00:00")],
        "url string, last_fetch_ts string",
    ).withColumn("last_fetch_ts", F.col("last_fetch_ts").cast("timestamp"))

    plan = crawl_plan(
        candidates, robots, sitemap_pages=entries, crawl_ledger=ledger,
        priority_col="priority",
    )
    verdicts = {r.url: r.allowed for r in plan["verdicts"].collect()}
    # every candidate AND every due recrawl has an audited verdict
    assert len(verdicts) == 5  # 3 candidates + 2 due
    assert verdicts["https://h0.example.com/private/x"] is False
    assert verdicts["https://h0.example.com/private/new"] is False
    front = {r.url: (r.fetch_seq, r.crawl_delay, r.scheduled_offset_secs, r.priority)
             for r in plan["frontier"].collect()}
    # disallowed URLs never reach the frontier; fresh URLs are not due
    assert set(front) == {
        "https://h0.example.com/a",
        "https://h0.example.com/b",
        "https://h0.example.com/new",
    }
    # priority DESC, null-priority recrawl last; offsets spaced by delay
    assert front["https://h0.example.com/a"] == (1, 2.0, 0.0, 5)
    assert front["https://h0.example.com/b"] == (2, 2.0, 2.0, 1)
    assert front["https://h0.example.com/new"][0] == 3
    assert front["https://h0.example.com/new"][3] is None

    lean = crawl_plan(candidates, robots, priority_col="priority")
    assert lean["recrawl"] is None
    assert lean["frontier"].count() == 2


def test_crawl_plan_first_crawl_and_dup_url(spark):
    """First crawl (no ledger): every sitemap entry is due as
    never_fetched. A URL that is both candidate and due keeps ONE
    frontier slot (the candidate's priority)."""
    from pyspark.sql import functions as F

    from pdf_context_extractor_agent_spark.plans.crawl import crawl_plan

    robots = spark.createDataFrame(
        [("h0.example.com", "User-agent: *\nDisallow: /private/")],
        "host string, robots_txt string",
    )
    candidates = spark.createDataFrame(
        [("https://h0.example.com/both", 7)], "url string, priority int"
    )
    entries = spark.createDataFrame(
        [("https://h0.example.com/both", "2024-02-01"),
         ("https://h0.example.com/fresh", "2024-02-01")],
        "loc string, lastmod string",
    )
    plan = crawl_plan(candidates, robots, sitemap_pages=entries,
                      priority_col="priority")  # NO ledger → first crawl
    front = {r.url: (r.fetch_seq, r.priority) for r in plan["frontier"].collect()}
    # both sitemap URLs due (never_fetched); /both deduped to ONE slot
    # with the candidate's priority
    assert front == {
        "https://h0.example.com/both": (1, 7),
        "https://h0.example.com/fresh": (2, None),
    }
    assert plan["verdicts"].count() == 2  # one verdict row per unique URL


def test_robots_rules_match_query_string(spark):
    """RFC 9309 / Google semantics compare rules against path+query:
    'Disallow: /search?' and wildcard '/*?sort=' must block URLs whose
    disallowed part lives in the query string."""
    from pdf_context_extractor_agent_spark.functions.robots import (
        robots_check,
        robots_rules,
    )

    robots = spark.createDataFrame(
        [("h.com", "User-agent: *\nDisallow: /search?\nDisallow: /*?sort=")],
        "host string, robots_txt string",
    )
    rules = robots_rules(robots)
    urls = spark.createDataFrame(
        [("https://h.com/search?q=x",),
         ("https://h.com/list?sort=price",),
         ("https://h.com/search",),       # no query → prefix '/search?' no match
         ("https://h.com/list?page=2",)],
        "url string",
    )
    plain = {r.url: r.allowed for r in robots_check(urls, rules).collect()}
    assert plain["https://h.com/search?q=x"] is False   # prefix match incl '?'
    assert plain["https://h.com/search"] is True
    wc = {r.url: r.allowed
          for r in robots_check(urls, rules, wildcards=True).collect()}
    assert wc["https://h.com/search?q=x"] is False
    assert wc["https://h.com/list?sort=price"] is False  # wildcard over path+query
    assert wc["https://h.com/list?page=2"] is True


def test_robots_check_keeps_duplicate_rows(spark):
    """Two identical input rows must yield two verdict rows (the window
    previously partitioned on column values and collapsed them)."""
    from pdf_context_extractor_agent_spark.functions.robots import (
        robots_check,
        robots_rules,
    )

    robots = spark.createDataFrame(
        [("h.com", "User-agent: *\nDisallow: /x")], "host string, robots_txt string"
    )
    urls = spark.createDataFrame(
        [("https://h.com/a",), ("https://h.com/a",), ("https://h.com/x",)],
        "url string",
    )
    out = robots_check(urls, robots_rules(robots)).collect()
    assert len(out) == 3
    assert sum(1 for r in out if r.url == "https://h.com/a") == 2
