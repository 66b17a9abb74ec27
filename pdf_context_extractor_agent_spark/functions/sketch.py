"""Distributed cardinality / frequency sketches: HyperLogLog and
count-min, the two aggregate artifacts a 100 TB curation pipeline
keeps per snapshot (distinct-token cardinality for vocabulary growth
tracking; approximate token frequencies for heavy-hitter detection
without materializing the full term dictionary).

Scale shape — both sketches are AGGREGATES, never joins:

* **HLL build** is one ``groupBy(bucket)`` max over 2^p buckets —
  shuffle output is 2^p rows (256 here) no matter the corpus size, and
  map-side partial ``max`` collapses everything before the exchange.
* **count-min build** is one ``groupBy(row, col)`` count — shuffle
  output ≤ depth × width rows (4096 here), again corpus-independent.
  Point queries probe the d cells of a key and take the min; estimates
  only ever OVER-count (the safe direction for heavy-hitter cuts).

Determinism: hashing is md5-positional (first 15 hex nibbles → 60-bit
int, the :mod:`bloom` convention) so Spark, DuckDB and Python agree
exactly; the HLL register sum is kept in INTEGER space
(``Σ 2^(53-M_j)`` as a bigint, missing registers contributing 2^53)
so the harmonic mean needs no float summation at all — one double
division at the end, identical on any IEEE engine.

Why not Spark's built-ins: ``approx_count_distinct`` (HLL++) and
``count_min_sketch`` are engine-private binary formats with no
cross-engine twin — fine in production, unverifiable against an
oracle. These sketches trade a few percent of accuracy tuning for a
bit-exact spec.

Reference parity note: the reference has no sketching (per-document
dict pipeline); this is beyond-reference curation surface, like
``bloom`` / ``lm`` / ``dsir``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .lm import word_array

__all__ = [
    "md5_hash60",
    "hll_registers",
    "hll_estimate_keys",
    "hll_estimate",
    "hll_doc_term_estimate",
    "cm_build",
    "cm_query",
    "cm_heavy_hitters",
    "hll_union_estimate",
]

# standard bias constant for m = 256 registers (Flajolet et al. 2007),
# spelled as the same literal expression on both engines
_ALPHA_EXPR = "0.7213 / (1.0 + 1.079 / {m}.0)"


def md5_hash60(key: Column, seed: int) -> Column:
    """First 15 hex nibbles of md5('<seed>:<key>') as a 60-bit long —
    exact in Spark (conv), DuckDB ('0x'||… cast) and Python."""
    h = F.md5(F.concat(F.lit(f"{seed}:"), key))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long")


def _tokens(docs: DataFrame, text_col: str) -> DataFrame:
    """One row per token INSTANCE (whitespace words, case-folded —
    the ``lm.word_array`` convention)."""
    return docs.select(
        F.explode(word_array(F.col(text_col))).alias("token")
    ).filter(F.col("token") != "")


def hll_registers(keys: DataFrame, key_col: str = "token", p: int = 8) -> DataFrame:
    """HLL registers ``(bucket, rho_max)`` over a key column.

    60-bit hash splits into bucket = h mod 2^p and a (60-p)-bit
    remainder w; rho = leading-zero count of w within its field + 1,
    computed EXACTLY via base-2 string length (no float log). One
    groupBy; output 2^p rows max.
    """
    m = 1 << p
    wbits = 60 - p
    h = md5_hash60(F.col(key_col), 0)
    # shiftright, NOT (h / m).cast(long): the float division converts h
    # long→double, which rounds for h ≥ 2^53 (~99% of 60-bit hashes) and
    # can put w off by ±1 — divergent rho when that crosses a power of
    # two. shiftright is the exact integer h // 2^p (h is nonnegative).
    w = F.shiftright(h, p)
    rho = F.when(w == 0, F.lit(wbits + 1)).otherwise(
        F.lit(wbits + 1) - F.length(F.conv(w, 10, 2))
    )
    return (
        keys.select((h % m).alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho_max"))
    )


def hll_estimate_keys(
    keys: DataFrame, key_col: str = "token", p: int = 8
) -> DataFrame:
    """One-row distinct-key estimate: ``(m, nonzero_registers,
    register_sum, hll_estimate, exact_distinct, rel_error)``.

    The register sum Σ 2^((wbits+1) - M_j) is a BIGINT (missing
    registers contribute the M=0 term), so the only float ops are one
    division and the small-range linear-counting branch — both
    deterministic across engines; outputs rounded to 4 dp. The exact
    distinct count rides along as the built-in accuracy check (at
    10^12 rows one would drop it — the sketch is the point).
    """
    m = 1 << p
    wbits = 60 - p
    toks = keys
    regs = hll_registers(toks, key_col, p)
    agg = regs.agg(
        F.count("*").alias("nonzero_registers"),
        F.sum(F.expr(f"shiftleft(1L, {wbits + 1} - rho_max)")).alias("present_sum"),
    )
    exact = toks.agg(F.countDistinct(key_col).alias("exact_distinct"))
    out = agg.crossJoin(exact).select(
        F.lit(m).alias("m"),
        "nonzero_registers",
        (
            F.col("present_sum")
            + (F.lit(m) - F.col("nonzero_registers"))
            * F.lit(1 << (wbits + 1)).cast("long")
        ).alias("register_sum"),
        "exact_distinct",
    )
    raw = (
        F.expr(_ALPHA_EXPR.format(m=m))
        * F.lit(float(m) * float(m) * float(1 << (wbits + 1)))
        / F.col("register_sum")
    )
    zeros = F.lit(m) - F.col("nonzero_registers")
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0), F.lit(float(m)) * F.log(F.lit(m) / zeros)
    ).otherwise(raw)
    # floor-truncate to 4 dp instead of round(): Spark rounds via the
    # shortest-decimal BigDecimal (HALF_UP) while DuckDB rounds the raw
    # double, so a value landing on a .xxxx5 boundary diverges in the
    # last digit. floor(x * 1e4) / 1e4 is the same double on any IEEE
    # engine.
    trunc4 = lambda c: F.floor(c * 10000.0) / 10000.0  # noqa: E731
    return out.select(
        "m",
        "nonzero_registers",
        "register_sum",
        trunc4(est).alias("hll_estimate"),
        "exact_distinct",
        trunc4(est / F.col("exact_distinct") - 1.0).alias("rel_error"),
    )


def hll_estimate(docs: DataFrame, text_col: str = "text", p: int = 8) -> DataFrame:
    """Distinct-TOKEN estimate over a documents relation (tokenized by
    the ``lm.word_array`` convention)."""
    return hll_estimate_keys(_tokens(docs, text_col), "token", p)


def hll_doc_term_estimate(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", p: int = 8
) -> DataFrame:
    """Distinct (document, token) INCIDENCE estimate — the
    vocabulary-spread statistic (how many postings a full inverted
    index would hold). Thousands of distinct keys even on a tiny
    corpus, so this exercises the raw harmonic-mean estimator rather
    than the small-range linear-counting branch."""
    pairs = (
        docs.select(id_col, F.explode(word_array(F.col(text_col))).alias("tok"))
        .filter(F.col("tok") != "")
        .select(
            F.concat(F.col(id_col).cast("string"), F.lit(":"), F.col("tok")).alias(
                "token"
            )
        )
    )
    return hll_estimate_keys(pairs, "token", p)


def hll_union_estimate(
    a: DataFrame, b: DataFrame, key_col: str = "token", p: int = 8
) -> DataFrame:
    """Cross-snapshot sketch MERGE: distinct-key estimates for two key
    relations and for their union, where the union estimate comes from
    merging the two REGISTER sets (element-wise max) — never from
    re-scanning the data.  This is the property that makes HLL the
    per-snapshot artifact at 100 TB: each crawl keeps its 2^p
    registers, and any union across snapshots/partitions is a
    dimension-sized max-merge.

    Output: ``(side 'a'|'b'|'union', m, nonzero_registers,
    register_sum, hll_estimate, exact_distinct)`` — the exact count
    rides along as the built-in accuracy check (dropped at production
    scale).
    """
    m = 1 << p
    wbits = 60 - p
    ra = hll_registers(a, key_col, p)
    rb = hll_registers(b, key_col, p)
    rm = (
        ra.unionByName(rb)
        .groupBy("bucket")
        .agg(F.max("rho_max").alias("rho_max"))
    )

    def one(regs: DataFrame, keys: DataFrame, side: str) -> DataFrame:
        agg = regs.agg(
            F.count("*").alias("nonzero_registers"),
            F.sum(F.expr(f"shiftleft(1L, {wbits + 1} - rho_max)")).alias("ps"),
        )
        exact = keys.agg(F.countDistinct(key_col).alias("exact_distinct"))
        comb = agg.crossJoin(exact).select(
            F.lit(side).alias("side"),
            F.lit(m).alias("m"),
            "nonzero_registers",
            (
                F.col("ps")
                + (F.lit(m) - F.col("nonzero_registers"))
                * F.lit(1 << (wbits + 1)).cast("long")
            ).alias("register_sum"),
            "exact_distinct",
        )
        raw = (
            F.expr(_ALPHA_EXPR.format(m=m))
            * F.lit(float(m) * float(m) * float(1 << (wbits + 1)))
            / F.col("register_sum")
        )
        zeros = F.lit(m) - F.col("nonzero_registers")
        est = F.when(
            (raw <= 2.5 * m) & (zeros > 0),
            F.lit(float(m)) * F.log(F.lit(m) / zeros),
        ).otherwise(raw)
        return comb.select(
            "side",
            "m",
            "nonzero_registers",
            "register_sum",
            (F.floor(est * 10000.0) / 10000.0).alias("hll_estimate"),
            "exact_distinct",
        )

    u = a.select(key_col).unionByName(b.select(key_col))
    return one(ra, a, "a").unionByName(one(rb, b, "b")).unionByName(
        one(rm, u, "union")
    )


def cm_build(
    keys: DataFrame, key_col: str = "token", width: int = 1024, depth: int = 4
) -> DataFrame:
    """Count-min sketch ``(row, col, cnt)`` over key INSTANCES: explode
    the depth positions per instance, one groupBy — output ≤
    depth × width rows with map-side partial counts."""
    pos = keys.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("row"),
                        (md5_hash60(F.col(key_col), j) % width).alias("col"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("rc")
    )
    return (
        pos.select("rc.row", "rc.col").groupBy("row", "col").agg(
            F.count("*").alias("cnt")
        )
    )


def cm_query(
    sketch: DataFrame,
    queries: DataFrame,
    key_col: str = "token",
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Point-query estimates ``(key_col, est)``: min over the key's
    depth cells. The sketch is ≤ depth×width rows → broadcast join;
    the only shuffle is the per-key min groupBy on the (small) query
    relation."""
    probes = queries.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("row"),
                        (md5_hash60(F.col(key_col), j) % width).alias("col"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("rc"),
    ).select(key_col, "rc.row", "rc.col")
    return (
        probes.join(F.broadcast(sketch), ["row", "col"])
        .groupBy(key_col)
        .agg(F.min("cnt").alias("est"))
    )


def cm_heavy_hitters(
    docs: DataFrame,
    text_col: str = "text",
    width: int = 1024,
    depth: int = 4,
    k: int = 20,
) -> DataFrame:
    """Top-k tokens with their count-min estimate next to the exact
    count: ``(token, est, exact)`` ordered by exact desc. est ≥ exact
    always (count-min only over-counts). The exact counts double as
    the query key set here; a production pipeline would probe a
    candidate stream instead."""
    toks = _tokens(docs, text_col)
    sketch = cm_build(toks, "token", width, depth)
    exact = toks.groupBy("token").agg(F.count("*").alias("exact"))
    est = cm_query(sketch, exact.select("token"), "token", width, depth)
    return (
        exact.join(est, "token")
        .orderBy(F.desc("exact"), "token")
        .limit(k)
        .select("token", "est", "exact")
    )
