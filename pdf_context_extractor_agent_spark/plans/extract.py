"""End-to-end extraction plans.

Two lifecycles, mirroring the reference's entry points (SURVEY.md §3):

* :func:`parse_statements` — the ``tools/export_all_statements.py``
  path (reference :58-92): all page tables concatenated per document,
  structure identification bounds each statement, all three statement
  types resolved in ONE parameterized plan grouped by
  (url, statement_type).
* :func:`parse_balance_via_boundary` — the ``main.py`` balance path
  (reference main.py:44-108): P2-P4 page/table boundary filtering
  before the merge, balance sheet only.

Both return the same bundle of DataFrames; nothing is collected —
callers write or further compose. Plan shape: one shuffle to establish
per-url row order, broadcast joins for every dimension table (pattern
banks and the per-doc structure rows — see SCALE.md for when the
latter flips to a co-partitioned join), window functions for all
ordering logic. Row extraction runs as codegen'd column expressions for
the standard header-map path; only arity-mismatch/headerless rows take
the Arrow kernel (plus a one-row-per-document header-analysis hop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..kernels import extract_pages
from ..operators.boundary import balance_boundaries, prune_rows_to_boundary
from ..operators.columns import extract_items, header_maps
from ..operators.match import match_items
from ..operators.merge import merged_clean_rows, rows_long, tables_long
from ..operators.structure import identify_structures
from ..operators.validate import completeness, validation_checks, validation_summary

ALL_STATEMENTS = ("balance_sheet", "income_statement", "cash_flow")


def statement_rows(page_df: DataFrame) -> DataFrame:
    """pages → globally ordered clean rows (M1-M3 over all tables)."""
    return merged_clean_rows(rows_long(tables_long(page_df)))


def _parse_from_rows(
    rows: DataFrame, spark: SparkSession, statement_types: tuple[str, ...]
) -> dict[str, DataFrame]:
    # rows and structure each feed 3-4 downstream branches; without a
    # persist every branch would recompute the kernel + merge lineage.
    # At 10^12-row scale these become checkpointed Iceberg stage tables;
    # in-memory/disk persist is the single-job analog.
    rows = rows.persist()
    structure = identify_structures(rows, spark, statement_types).persist()

    # header column map per (url, statement): C1-C3 over the header row
    # cells (a tiny Arrow hop — one row per document-statement).
    # ``structure`` and ``hmaps`` have ONE-ROW-PER-DOCUMENT cardinality:
    # they must NOT carry a broadcast hint (at 10^12 input rows a forced
    # broadcast ships billions of rows to every executor and OOMs the
    # driver). Left unhinted, AQE picks broadcast-vs-shuffle from runtime
    # stats — broadcast at test scale, co-partitioned shuffle join at
    # corpus scale. Only the genuinely tiny pattern/anchor/label dims
    # keep explicit hints (operators/match.py, operators/structure.py).
    hdr_rows = (
        structure.filter(F.col("header_row").isNotNull())
        .select("url", "statement_type", F.col("header_row").alias("row_idx"))
        .join(rows.select("url", "row_idx", "cells"), ["url", "row_idx"])
        .select("url", "statement_type", "cells")
    )
    hmaps = header_maps(hdr_rows)

    # bounded statement range per (url, statement) + header map
    ranged = (
        rows.select("url", "row_idx", "cells")
        .join(
            structure.select("url", "statement_type", "parse_start", "parse_end"),
            "url",
        )
        .filter(F.col("row_idx").between(F.col("parse_start"), F.col("parse_end")))
        .join(hmaps, ["url", "statement_type"], "left")
        .select("url", "statement_type", "row_idx", "cells",
                "item_col", "cur_col", "prev_col", "note_col")
    )
    items = extract_items(ranged)
    m = match_items(items, spark)
    # slots feed checks + completeness + summary
    m["slots"] = m["slots"].persist()

    total_rows = rows.groupBy("url").agg((F.max("row_idx") + 1).alias("total_rows"))
    parsing_info = (
        m["matched"].groupBy("url", "statement_type").agg(F.count("*").alias("matched_items"))
        .join(
            m["unmatched"].groupBy("url", "statement_type").agg(F.count("*").alias("unmatched_items")),
            ["url", "statement_type"],
            "outer",
        )
        .join(total_rows, "url", "left")
        .fillna(0, subset=["matched_items", "unmatched_items"])
    )

    checks = validation_checks(m["slots"])
    comp = completeness(m["slots"], spark)
    summary = validation_summary(checks, comp, parsing_info)

    return {
        "rows": rows,
        "structure": structure,
        "items": items,
        "parsed": m["parsed"],
        "slots": m["slots"],
        "unmatched": m["unmatched"],
        "parsing_info": parsing_info,
        "checks": checks,
        "completeness": comp,
        "summary": summary,
    }


def parse_statements(
    page_df: DataFrame,
    spark: SparkSession,
    statement_types: tuple[str, ...] = ALL_STATEMENTS,
) -> dict[str, DataFrame]:
    """Unified SI-driven plan for all statement types."""
    return _parse_from_rows(statement_rows(page_df), spark, statement_types)


def parse_balance_via_boundary(page_df: DataFrame, spark: SparkSession) -> dict[str, DataFrame]:
    """main.py lifecycle: P2 boundary → P3 prune → P4 split → M → parse."""
    bounds = balance_boundaries(page_df)
    raw = rows_long(tables_long(page_df))
    pruned = prune_rows_to_boundary(raw, bounds)
    rows = merged_clean_rows(pruned)
    return _parse_from_rows(rows, spark, ("balance_sheet",))


def extraction_result(
    pages_tbl: DataFrame, spark: SparkSession, repartition: bool = True
) -> dict[str, DataFrame]:
    """Full pipeline from the raw pages table: kernel → statements.

    ``repartition=True`` routes the input through the skew lanes
    (salted dense partitions + one-doc partitions for oversized
    documents — sources/pages.py) before the layout kernel, so a single
    500-page annual report (the reference's
    tools/export_all_statements.py:19-55 case) can only delay itself,
    never a partition of small pages.

    ``page_df`` is persisted because three independent consumers read it
    (statements, notes, text reassembly); at 10^12-row scale this would
    be a checkpointed Iceberg stage table instead of executor memory.
    """
    from ..sources import skew_partitioned

    if repartition:
        pages_tbl = skew_partitioned(pages_tbl)
    page_df = extract_pages(pages_tbl).persist()
    out = parse_statements(page_df, spark)
    out["pages"] = page_df
    return out
