"""Link-graph analytics: outlink extraction + fixed-point PageRank.

A crawl-curation pipeline ranks pages by link structure (seed
prioritization, spam demotion — the OPIC/Harmonic/PageRank family that
CommonCrawl publishes per snapshot). Two engine pieces:

* :func:`extract_outlinks` — hrefs from raw HTML as one
  ``regexp_extract_all`` projection (no DOM pass needed for edges);
* :func:`page_rank` — power iteration over the (src, dst) edge list.

PageRank here is FIXED-POINT (scaled-integer) arithmetic, not float:
every operation is integer add / multiply / truncating divide, so the
result is bit-identical regardless of partial-aggregation order.
Float PageRank sums contributions in whatever order the shuffle
delivers them — two runs of the same job (let alone two engines)
disagree in the last ulps, which poisons exact-match verification and
makes reruns non-reproducible. With ranks scaled by 10^12 the
quantization error per iteration is ~1e-12 of total mass — far below
any ranking decision — and the distributed sum becomes exact.

Scale shape: one groupBy(src) for out-degrees, then per iteration one
join rank⋈edges (co-partitioned on src) + one groupBy(dst). The rank
relation is two longs per node. Dangling mass is a one-row aggregate
cross-joined back (broadcast), never a driver fetch inside the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RANK_SCALE = 10**12


def extract_outlinks(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """(url, outlink) pairs from raw HTML bytes — one projection, no
    kernel pass: edges need only the href values."""
    html = F.col(html_col).cast("string")
    return pages.select(
        "url",
        F.explode(
            F.regexp_extract_all(html, F.lit(r'href="([^"]*)"'), F.lit(1))
        ).alias("outlink"),
    ).filter(F.col("outlink") != "")


def extract_anchor_texts(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """(url, outlink, anchor_text) triples — the anchor-text corpus
    (link descriptions are high-quality natural supervision; the
    DeepMind/Google anchor-data recipe). One ``regexp_extract_all`` of
    whole ``<a>`` elements, then per-element href/text projection with
    inner tags stripped — all expressions, no DOM pass."""
    html = F.col(html_col).cast("string")
    tags = F.regexp_extract_all(
        html, F.lit(r'(?s)(<a\s[^>]*href="[^"]+"[^>]*>.*?</a>)'), F.lit(1)
    )
    triples = F.transform(
        tags,
        lambda t: F.struct(
            F.regexp_extract(t, r'href="([^"]*)"', 1).alias("outlink"),
            F.trim(
                F.regexp_replace(
                    F.regexp_extract(t, r"(?s)>(.*)</a>$", 1), r"<[^>]*>", ""
                )
            ).alias("anchor_text"),
        ),
    )
    return (
        pages.select("url", F.explode(triples).alias("a"))
        .select("url", "a.outlink", "a.anchor_text")
        .filter((F.col("outlink") != "") & (F.col("anchor_text") != ""))
    )


def page_rank(
    edges: DataFrame,
    n_nodes: int,
    n_iter: int = 3,
    damping_pct: int = 85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Power-iteration PageRank over an edge list whose nodes are
    ``0..n_nodes-1`` → ``(node, rank)`` with ``rank`` the scaled-integer
    score (sum ≈ RANK_SCALE).

    Per iteration (all integer arithmetic, ``DIV`` truncation):

        contrib(v) = Σ_{u→v} rank(u) DIV outdeg(u)
        dang       = Σ_{u: outdeg(u)=0} rank(u)
        rank'(v)   = base + damping_pct * (contrib(v) + dang DIV n) DIV 100

    with ``base = (100-damping_pct) * RANK_SCALE DIV n DIV 100``.
    ``n_nodes`` is a plan constant (the graph cardinality), like a
    context length or a band count — not data fetched per iteration.
    """
    spark = edges.sparkSession
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = spark.range(n_nodes).select(F.col("id").alias("node"))
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    base = (100 - damping_pct) * RANK_SCALE // n_nodes // 100
    rank = nodes.withColumn(
        "rank", F.lit(RANK_SCALE // n_nodes).cast("long")
    )
    for it in range(n_iter):
        r = rank.join(outdeg, rank["node"] == outdeg["src"], "left").select(
            "node", "rank", F.coalesce("outdeg", F.lit(0)).alias("outdeg")
        )
        contrib = (
            r.filter(F.col("outdeg") > 0)
            .select("node", F.expr("rank DIV outdeg").alias("share"))
            .join(e, F.col("node") == e["src"])
            .groupBy("dst")
            .agg(F.sum("share").alias("contrib"))
        )
        dang = r.filter(F.col("outdeg") == 0).agg(
            F.coalesce(F.sum("rank"), F.lit(0)).alias("dang")
        )
        rank = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .select("node", F.coalesce("contrib", F.lit(0)).alias("contrib"))
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                F.expr(
                    f"CAST({base} + {damping_pct} * (contrib + dang DIV {n_nodes}) "
                    f"DIV 100 AS LONG)"
                ).alias("rank"),
            )
        )
        if (it + 1) % 4 == 0:
            rank = rank.localCheckpoint(eager=False)
    return rank
