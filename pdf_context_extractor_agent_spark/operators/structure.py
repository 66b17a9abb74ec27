"""SI1-SI4: statement structure identification.

Reference: src/parsers/statement_structure_identifier.py:103-372.

Single-pass design: one projection evaluates every anchor/end regex as
a LITERAL (codegen compiles each once per task) and emits per-row hit
structs; ONE groupBy(url, statement_type) collects them; a second tiny
groupBy(url) carries max-row + header-candidate rows. Everything else —
completeness, canonical-order check, header/end location with their
lookback/lookahead windows and fallbacks — is pure array-expression
arithmetic on the collected hit lists (≤ a few dozen entries per doc).
Two shuffles total for all three statement types; compare the
reference's three parser objects × per-row Python scans.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import name_from_cell, nonempty_row_text
from ..functions.text import fast_match
from ..patterns import (
    HEADER_ALSO_MATCH,
    HEADER_MUST_MATCH,
    _ANCHOR_SPEC,
    STATEMENT_END_PATTERNS,
    anchor_counts,
)

HEADER_LOOKBACK = 20   # identifier.py:282
END_LOOKAHEAD = 50     # identifier.py:347
END_FALLBACK = 30      # identifier.py:370


_HIT_TYPE = "array<struct<stmt:string,kind:string,ord:int,req:boolean>>"


def _guardable(p: str) -> bool:
    """True iff the first-char trigger guard is sound for pattern ``p``:
    '^' followed by a literal character, so a row can match only if its
    first character IS that literal. Anything else ('^(A|B)…',
    unanchored, '^.*…') must bypass the guard or it would be silently
    dropped for most rows."""
    return len(p) > 1 and p[0] == "^" and p[1] not in "\\.[](|)?*+{^$"


def _hit(stmt: str, kind: str, ord_: int, req: bool, cond: Column) -> Column:
    return F.when(
        cond,
        F.struct(
            F.lit(stmt).alias("stmt"),
            F.lit(kind).alias("kind"),
            F.lit(ord_).alias("ord"),
            F.lit(req).alias("req"),
        ),
    )


@lru_cache(maxsize=8)
def _hit_structs_cached(statement_types: tuple[str, ...]) -> Column:
    """Process-wide cache of the ~70-regex anchor/end bank expression —
    keyed by statement tuple; saves ~0.7 s of serial py4j construction
    per plan build after the first. NOTE: tests that monkeypatch
    patterns._ANCHOR_SPEC must clear this cache."""
    name0 = name_from_cell(F.try_element_at(F.col("cells"), F.lit(1)))
    name1 = name_from_cell(F.try_element_at(F.col("cells"), F.lit(2)))
    return _hit_structs(name0, name1, statement_types)


def _hit_structs(name0: Column, name1: Column, statement_types: tuple[str, ...]) -> Column:
    """Per-row array of anchor/end hits, all regexes literal.

    Anchors match either of columns 0/1 (identifier.py:191-208); end
    markers match column 0 only (:357-366).

    Every anchor pattern (and all but income's wildcard end pattern) is
    ^-anchored on a literal character, so a name can only match a
    pattern whose first literal char equals the name's first char. That
    makes the bank DISPATCHABLE: a ~22-way CASE on substring(name, 1, 1)
    jumps straight to the ≤4-pattern bucket sharing that first char, so
    each row evaluates its bucket only — instead of the full ~50-pattern
    bank behind a single coarse any-char trigger (which ~40% of corpus
    rows pass, since item names and anchors draw from the same leading
    characters). Wildcard-prefixed (unguardable) patterns are evaluated
    on every row, outside the dispatch.

    Duplicate (stmt, kind, ord) hits — from name0/name1 both matching,
    or the guarded/unguarded split — merge downstream (``amins`` keeps
    the first row per ord; end hits take the min), so per-name split
    emission is safe.
    """
    buckets: dict[str, list[tuple[str, str, int, bool, str]]] = {}
    unguarded: list[tuple[str, str, int, bool, str]] = []
    for stmt in statement_types:
        for anchor_ord, (_name, required, pats) in enumerate(_ANCHOR_SPEC[stmt]):
            for p in pats:
                entry = (stmt, "a", anchor_ord, required, p)
                (buckets.setdefault(p[1], []) if _guardable(p) else unguarded).append(entry)
        for p in STATEMENT_END_PATTERNS[stmt]:
            entry = (stmt, "e", -1, False, p)
            (buckets.setdefault(p[1], []) if _guardable(p) else unguarded).append(entry)

    empty = F.array().cast(_HIT_TYPE)

    def dispatch(name: Column, anchors_only: bool) -> Column:
        first = F.substring(name, 1, 1)
        chain: Column | None = None
        for c in sorted(buckets):
            hits = [
                _hit(stmt, kind, ord_, req, fast_match(name, p))
                for (stmt, kind, ord_, req, p) in buckets[c]
                # end markers match column 0 only
                if not (anchors_only and kind == "e")
            ]
            if not hits:
                continue
            arr = F.array(*hits)
            chain = F.when(first == c, arr) if chain is None else chain.when(first == c, arr)
        return chain.otherwise(empty) if chain is not None else empty

    parts = [dispatch(name0, anchors_only=False), dispatch(name1, anchors_only=True)]
    for stmt, kind, ord_, req, p in unguarded:
        cond = (
            fast_match(name0, p)
            if kind == "e"
            else fast_match(name0, p) | fast_match(name1, p)
        )
        parts.append(F.array(_hit(stmt, kind, ord_, req, cond)))
    # non-hits stay as NULL entries, dropped by the caller AFTER explode:
    # array_compact desugars to the higher-order ArrayFilter, a
    # CodegenFallback expression that would knock this ENTIRE bank
    # projection off whole-stage codegen (~6× slower interpreted eval of
    # every pattern predicate); a scalar h IS NOT NULL filter post-
    # explode keeps the stage fully codegen'd
    return F.concat(*parts)


def identify_structures(
    clean_rows: DataFrame,
    spark: SparkSession,
    statement_types: tuple[str, ...] = ("balance_sheet", "income_statement", "cash_flow"),
) -> DataFrame:
    """→ (url, statement_type, is_valid, confidence, header_row,
    parse_start, parse_end, first_anchor, last_anchor, max_row).

    A url appears for a statement type iff ≥1 anchor of that type was
    found. Invalid structures fall back to full-table parse with a null
    header row, exactly like the reference (balance_sheet.py:187-196 →
    get_header_info default).
    """
    # try_element_at (inside the cached bank): ANSI mode (Spark 4
    # default) makes plain element_at THROW on rows shorter than the
    # index — one ragged 1-cell table row must not abort a 10^12-row job
    row_text = nonempty_row_text(F.col("cells"))
    hdr_flag = fast_match(row_text, HEADER_MUST_MATCH) & fast_match(row_text, HEADER_ALSO_MATCH)

    hits = (
        # two-step on purpose: the bank array is evaluated in its own
        # Project (whole-stage codegen SPLITS big projections into
        # many small methods), and the Generate explodes a plain
        # column reference. Inlining the bank into explode(...) itself
        # would blow Janino's 64KB method limit inside Generate's
        # doConsume — the stage then silently falls back to interpreted
        # eval, ~6× slower on this hottest projection of the pipeline.
        clean_rows.select(
            "url",
            "row_idx",
            _hit_structs_cached(tuple(statement_types)).alias("harr"),
        )
        .select("url", "row_idx", F.explode("harr").alias("h"))
        # the bank emits NULL entries for non-hits (keeps the projection
        # codegen-able, see _hit_structs); drop them scalar-wise here
        .filter(F.col("h").isNotNull())
        .select("url", "row_idx", "h.stmt", "h.kind", "h.ord", "h.req")
    )

    per_stmt = hits.groupBy("url", "stmt").agg(
        F.collect_list(F.struct("kind", "ord", "req", "row_idx")).alias("hs")
    )

    per_url = clean_rows.groupBy("url").agg(
        F.max("row_idx").alias("max_row"),
        F.sort_array(F.collect_list(F.when(hdr_flag, F.col("row_idx")))).alias("hdr_rows"),
    )

    # both sides are one-or-few rows per url — PER-DOCUMENT cardinality,
    # so no broadcast hint (it would ship the whole corpus's per-url rows
    # to every executor at 10^12 scale); AQE chooses from runtime stats
    df = per_stmt.join(per_url, "url")

    e = _si_exprs(tuple(statement_types))
    # single withColumns per dependency layer: every chained withColumn
    # re-analyzes the (large) logical plan JVM-side — on the full
    # pipeline these chains were ~0.3 s of serial driver time per build
    df = df.withColumns({"amins": e["amins"]})
    df = df.withColumns(
        {
            "found_total": e["found_total"],
            "found_required": e["found_required"],
            "first_anchor": e["first_anchor"],
            "last_anchor": e["last_anchor"],
            "order_ok": e["order_ok"],
            "req_anchors": e["counts_required"],
            "tot_anchors": e["counts_total"],
        }
    )
    df = df.withColumns(
        {
            "is_valid": (F.col("found_required") == F.col("req_anchors"))
            & F.col("order_ok"),
            "confidence": F.when(
                F.col("found_required") < F.col("req_anchors"),
                F.col("found_total") / F.col("req_anchors"),
            )
            .when(~F.col("order_ok"), F.lit(0.5))
            .otherwise(F.col("found_total") / F.col("tot_anchors")),
        }
    )

    return df.select(
        "url",
        F.col("stmt").alias("statement_type"),
        "is_valid",
        "confidence",
        F.when(F.col("is_valid"), e["header_row"]).alias("header_row"),
        F.when(F.col("is_valid"), F.col("first_anchor")).otherwise(F.lit(0)).alias("parse_start"),
        F.when(F.col("is_valid"), e["end_row"]).otherwise(F.col("max_row")).alias("parse_end"),
        "first_anchor",
        "last_anchor",
        "max_row",
    )


@lru_cache(maxsize=8)
def _si_exprs(statement_types: tuple[str, ...]) -> dict[str, Column]:
    """SI2-SI4 expression block, memoized per process (pure by-name
    column references — reuse across plans is safe and saves ~0.8 s of
    serial py4j construction per subsequent plan build)."""
    # ---- expression-level SI2-SI4 over the collected hit lists ----
    anchors = F.filter(F.col("hs"), lambda h: h["kind"] == F.lit("a"))
    # per-anchor first row: sort by (ord, row), keep first per ord
    sorted_by_ord = F.array_sort(
        F.transform(anchors, lambda h: F.struct(h["ord"].alias("o"), h["row_idx"].alias("r"), h["req"].alias("q")))
    )
    amins = F.aggregate(
        sorted_by_ord,
        F.array().cast("array<struct<o:int,r:int,q:boolean>>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0) & (F.try_element_at(acc, F.lit(-1))["o"] == x["o"]), acc
        ).otherwise(F.concat(acc, F.array(x))),
    )

    found_total = F.size(F.col("amins"))
    found_required = F.size(F.filter(F.col("amins"), lambda a: a["q"]))
    first_anchor = F.array_min(F.transform(F.col("amins"), lambda a: a["r"]))
    last_anchor = F.array_max(F.transform(F.col("amins"), lambda a: a["r"]))
    # canonical order (SI2): anchors sorted by first row must have
    # strictly increasing anchor_ord (identifier.py:236-255)
    by_row = F.array_sort(
        F.transform(F.col("amins"), lambda a: F.struct(a["r"].alias("r"), a["o"].alias("o")))
    )
    order_ok = F.aggregate(
        by_row,
        F.struct(F.lit(True).alias("ok"), F.lit(-1).alias("prev")),
        lambda acc, x: F.struct((acc["ok"] & (x["o"] > acc["prev"])).alias("ok"), x["o"].alias("prev")),
        lambda acc: acc["ok"],
    )

    counts_total = F.lit(None).cast("int")
    counts_required = F.lit(None).cast("int")
    for s in statement_types:
        tot, req = anchor_counts(s)
        counts_total = F.when(F.col("stmt") == s, F.lit(tot)).otherwise(counts_total)
        counts_required = F.when(F.col("stmt") == s, F.lit(req)).otherwise(counts_required)

    # SI3 header: nearest candidate ≤20 rows above the first anchor;
    # fallback = first_anchor-1 (identifier.py:278-308)
    hdr_found = F.array_max(
        F.filter(
            F.col("hdr_rows"),
            lambda r: (r < F.col("first_anchor"))
            & (r >= F.greatest(F.lit(0), F.col("first_anchor") - HEADER_LOOKBACK)),
        )
    )
    header_row = F.coalesce(
        hdr_found, F.when(F.col("first_anchor") - 1 >= 0, F.col("first_anchor") - 1)
    )

    # SI4 end: first end-marker hit in [last_anchor, last_anchor+50);
    # fallback min(max_row, last_anchor+30) (identifier.py:327-372)
    end_hits = F.transform(
        F.filter(F.col("hs"), lambda h: h["kind"] == F.lit("e")), lambda h: h["row_idx"]
    )
    end_found = F.array_min(
        F.filter(
            end_hits,
            lambda r: (r >= F.col("last_anchor"))
            & (r < F.col("last_anchor") + END_LOOKAHEAD),
        )
    )
    end_row = F.coalesce(end_found, F.least(F.col("max_row"), F.col("last_anchor") + END_FALLBACK))

    return {
        "amins": amins,
        "found_total": found_total,
        "found_required": found_required,
        "first_anchor": first_anchor,
        "last_anchor": last_anchor,
        "order_ok": order_ok,
        "counts_total": counts_total,
        "counts_required": counts_required,
        "header_row": header_row,
        "end_row": end_row,
    }
