"""SI1-SI4: statement structure identification.

Reference: src/parsers/statement_structure_identifier.py:103-372.
Anchors become a broadcast dimension table; "find the first row matching
each anchor" is a groupBy-min; header/end location are windowed range
scans. All three statement types resolve in ONE pass over the rows —
the reference runs three parser objects, we run one plan keyed by
``statement_type``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import name_from_cell, nonempty_row_text, rlike_any
from ..patterns import (
    HEADER_ALSO_MATCH,
    HEADER_MUST_MATCH,
    STATEMENT_END_PATTERNS,
    anchor_counts,
    anchor_df,
)

HEADER_LOOKBACK = 20   # identifier.py:282
END_LOOKAHEAD = 50     # identifier.py:347
END_FALLBACK = 30      # identifier.py:370


def _row_names(clean_rows: DataFrame) -> DataFrame:
    """Candidate item names from columns 0 and 1 (identifier.py:191-199)."""
    return clean_rows.select(
        "url",
        "row_idx",
        F.explode(
            F.array(
                name_from_cell(F.element_at(F.col("cells"), 1)),
                name_from_cell(F.element_at(F.col("cells"), 2)),
            )
        ).alias("name"),
    ).filter(F.col("name") != "")


def identify_structures(
    clean_rows: DataFrame,
    spark: SparkSession,
    statement_types: tuple[str, ...] = ("balance_sheet", "income_statement", "cash_flow"),
) -> DataFrame:
    """→ (url, statement_type, is_valid, confidence, header_row,
    parse_start, parse_end, first_anchor, last_anchor).

    A url appears for a statement type iff ≥1 anchor of that type was
    found (a document without any trace of the statement contributes no
    rows downstream). Invalid structures fall back to full-table parse
    with a null header row, exactly like the reference
    (balance_sheet.py:187-196 → get_header_info default).
    """
    anchors = F.broadcast(
        anchor_df(spark).filter(F.col("statement_type").isin(*statement_types))
    )
    names = _row_names(clean_rows)

    # SI1: first row matching each anchor (any pattern, any of cols 0/1)
    hits = names.join(anchors, F.expr("name rlike pattern"), "inner")
    key_pos = hits.groupBy("url", "statement_type", "anchor_name", "anchor_ord", "required").agg(
        F.min("row_idx").alias("anchor_row")
    )

    # SI2: completeness + canonical-order check
    w = Window.partitionBy("url", "statement_type").orderBy("anchor_row", "anchor_ord")
    kp = key_pos.withColumn("prev_ord", F.lag("anchor_ord").over(w))
    per_stmt = kp.groupBy("url", "statement_type").agg(
        F.count("*").alias("found_total"),
        F.sum(F.when(F.col("required"), 1).otherwise(0)).alias("found_required"),
        F.min("anchor_row").alias("first_anchor"),
        F.max("anchor_row").alias("last_anchor"),
        F.min(
            F.when(F.col("prev_ord").isNull(), True).otherwise(F.col("prev_ord") < F.col("anchor_ord"))
        ).alias("order_ok"),
    )
    counts = spark.createDataFrame(
        [(s, *anchor_counts(s)) for s in statement_types],
        "statement_type string, total_anchors int, required_anchors int",
    )
    per_stmt = per_stmt.join(F.broadcast(counts), "statement_type")
    per_stmt = per_stmt.withColumn(
        "is_valid",
        (F.col("found_required") == F.col("required_anchors")) & F.col("order_ok"),
    ).withColumn(
        "confidence",
        F.when(
            F.col("found_required") < F.col("required_anchors"),
            F.col("found_total") / F.col("required_anchors"),
        )
        .when(~F.col("order_ok"), F.lit(0.5))
        .otherwise(F.col("found_total") / F.col("total_anchors")),
    )

    # SI3: header row — nearest row above first anchor (≤20 back) whose
    # non-empty-cell text contains 项目 AND a period keyword.
    hdr_cand = clean_rows.select(
        "url", "row_idx", nonempty_row_text(F.col("cells")).alias("row_text")
    ).filter(
        F.col("row_text").rlike(HEADER_MUST_MATCH) & F.col("row_text").rlike(HEADER_ALSO_MATCH)
    )
    hdr = per_stmt.join(hdr_cand, "url", "left").filter(
        F.col("row_text").isNull()
        | (
            (F.col("row_idx") < F.col("first_anchor"))
            & (F.col("row_idx") >= F.greatest(F.lit(0), F.col("first_anchor") - HEADER_LOOKBACK))
        )
    ).groupBy("url", "statement_type").agg(F.max("row_idx").alias("header_found"))
    per_stmt = per_stmt.join(hdr, ["url", "statement_type"], "left").withColumn(
        "header_row",
        F.coalesce(
            "header_found",
            F.when(F.col("first_anchor") - 1 >= 0, F.col("first_anchor") - 1),
        ),
    )

    # SI4: end row — first row in [last_anchor, last_anchor+50) whose
    # COLUMN-0 name matches the statement's end pattern.
    end_pats = spark.createDataFrame(
        [(s, p) for s in statement_types for p in STATEMENT_END_PATTERNS[s]],
        "statement_type string, end_pattern string",
    )
    name0 = clean_rows.select(
        "url", "row_idx", name_from_cell(F.element_at(F.col("cells"), 1)).alias("name0")
    ).filter(F.col("name0") != "")
    end_hits = name0.join(F.broadcast(end_pats), F.expr("name0 rlike end_pattern"), "inner")
    ends = per_stmt.join(end_hits, ["url", "statement_type"], "left").filter(
        F.col("row_idx").isNull()
        | (
            (F.col("row_idx") >= F.col("last_anchor"))
            & (F.col("row_idx") < F.col("last_anchor") + END_LOOKAHEAD)
        )
    ).groupBy("url", "statement_type").agg(F.min("row_idx").alias("end_found"))

    max_rows = clean_rows.groupBy("url").agg(F.max("row_idx").alias("max_row"))
    per_stmt = (
        per_stmt.join(ends, ["url", "statement_type"], "left")
        .join(max_rows, "url")
        .withColumn(
            "end_row",
            F.coalesce("end_found", F.least(F.col("max_row"), F.col("last_anchor") + END_FALLBACK)),
        )
    )

    return per_stmt.select(
        "url",
        "statement_type",
        "is_valid",
        "confidence",
        F.when(F.col("is_valid"), F.col("header_row")).alias("header_row"),
        F.when(F.col("is_valid"), F.col("first_anchor")).otherwise(F.lit(0)).alias("parse_start"),
        F.when(F.col("is_valid"), F.col("end_row")).otherwise(F.col("max_row")).alias("parse_end"),
        "first_anchor",
        "last_anchor",
        "max_row",
    )
