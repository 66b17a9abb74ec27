"""Sinks S6-S8: JSON / CSV / nested-document views of the parsed
relation, plus the driver-side Excel presentation step.

Reference: main.py:110-441 (`save_result` JSON :125-127, `_save_to_csv`
:392-441, `_save_to_excel` :144-390). The engine's canonical output is
the long-format ``parsed`` relation; the nested per-document JSON the
reference emits is a pivoted VIEW of it (J5, balance_sheet.py:130-159),
built here with ``collect_list``/``to_json`` — distributed, no driver
loop. Excel is a presentation concern: a ``toPandas().to_excel`` helper
guarded by an openpyxl import-try (absent in this container).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_parsed_csv(parsed: DataFrame, path: str) -> None:
    """S8: the reference's CSV rows (section, standard, original, cur,
    prev, note) — our long format already IS this shape (main.py:392-441)."""
    (
        parsed.select(
            "url", "statement_type", "section_path", "standard_name",
            "original_name", "current_period", "previous_period", "note", "row_order",
        )
        .write.mode("overwrite")
        .option("header", True)
        .csv(path)
    )


def nested_document_json(parsed: DataFrame) -> DataFrame:
    """S6/J5: one JSON document per (url, statement) — the reference's
    nested result dict as a pivoted view of the ordered long format."""
    item = F.struct(
        "section_path", "standard_name", "original_name",
        "current_period", "previous_period", "note", "row_order",
    )
    return (
        parsed.groupBy("url", "statement_type")
        .agg(
            F.to_json(
                F.struct(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct(F.col("row_order"), item.alias("i")))),
                        lambda s: s["i"],
                    ).alias("ordered_items")
                )
            ).alias("document_json")
        )
    )


def write_parsed_json(parsed: DataFrame, path: str) -> None:
    nested_document_json(parsed).write.mode("overwrite").json(path)


def to_excel(parsed: DataFrame, path: str) -> bool:
    """S7 driver-side presentation (out of engine scope per SURVEY §2.1
    S7): requires openpyxl; returns False when unavailable."""
    try:
        import openpyxl  # noqa: F401
    except Exception:
        return False
    pdf = parsed.orderBy("url", "statement_type", "row_order").toPandas()
    with __import__("pandas").ExcelWriter(path) as xl:  # pragma: no cover
        for stmt, grp in pdf.groupby("statement_type"):
            grp.to_excel(xl, sheet_name=stmt[:31], index=False)
    return True
