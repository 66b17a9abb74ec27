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


# ---------------------------------------------------------------------------
# S7: the reference's ordered-walk Excel sheet (main.py:144-390)
# ---------------------------------------------------------------------------

_XL_COLS = ["部分", "类别", "项目名称", "原始名称", "本期末金额", "上期末金额", "附注"]


def _xl_row(section="", category="", item_name="", original_name="",
            current_period="", previous_period="", note=""):
    return {
        "部分": section, "类别": category, "项目名称": item_name,
        "原始名称": original_name, "本期末金额": current_period,
        "上期末金额": previous_period, "附注": note,
    }


def balance_excel_rows(items: list[dict]) -> list[dict]:
    """The reference's ordered-items walk (main.py:166-370): title +
    blank row, then section/category header rows inserted at each
    section-path transition, item rows in original document order.
    Pure function over row_order-sorted item dicts with keys
    (section_path, original_name, current_period, previous_period,
    note) so the workbook structure is testable without openpyxl.
    """
    rows = [_xl_row(section="合并资产负债表"), _xl_row()]
    section = category = None

    def enter(sec: str, cat: str | None, blank_before: bool) -> None:
        nonlocal section, category
        if section != sec:
            if blank_before:
                rows.append(_xl_row())
            rows.append(_xl_row(section=sec))
            section = sec
        if cat is not None and category != cat:
            rows.append(_xl_row(category=cat))
        category = cat

    for it in items:
        p = it.get("section_path") or ""
        if p.startswith("assets.current_assets"):
            enter("资产", "流动资产", blank_before=False)
        elif p.startswith("assets.non_current_assets"):
            enter("资产", "非流动资产", blank_before=False)
        elif p == "assets.assets_total":
            category = None  # totals carry no category (main.py:249)
        elif p.startswith("liabilities.current_liabilities"):
            enter("负债和所有者权益", "流动负债", blank_before=True)
        elif p.startswith("liabilities.non_current_liabilities"):
            enter("负债和所有者权益", "非流动负债", blank_before=True)
        elif p.startswith("equity"):
            enter("负债和所有者权益", "所有者权益", blank_before=True)
        elif p in ("liabilities.liabilities_total", "liabilities_and_equity_total"):
            category = None
        rows.append(_xl_row(
            item_name=it.get("original_name") or "",
            original_name=it.get("original_name") or "",
            current_period=it.get("current_period") or "",
            previous_period=it.get("previous_period") or "",
            note=it.get("note") or "",
        ))
    return rows


def to_excel_ordered(parsed: DataFrame, path: str, url: str) -> bool:
    """S7 full parity for one document: Summary sheet + 资产负债表 sheet
    built by the ordered walk, with the reference's column widths
    (main.py:144-390). Requires openpyxl; returns False when absent."""
    try:
        import openpyxl  # noqa: F401
    except Exception:
        return False
    import pandas as pd  # pragma: no cover (openpyxl absent in CI container)

    items = [
        r.asDict()
        for r in parsed.filter(
            (F.col("url") == url) & (F.col("statement_type") == "balance_sheet")
        ).orderBy("row_order").collect()
    ]
    with pd.ExcelWriter(path, engine="openpyxl") as writer:  # pragma: no cover
        pd.DataFrame({"url": [url], "success": [bool(items)]}).to_excel(
            writer, sheet_name="Summary", index=False
        )
        pd.DataFrame(balance_excel_rows(items), columns=_XL_COLS).to_excel(
            writer, sheet_name="资产负债表", index=False
        )
        ws = writer.sheets["资产负债表"]
        for col, width in zip("ABCDEFG", (15, 15, 20, 20, 15, 15, 10)):
            ws.column_dimensions[col].width = width
    return True
