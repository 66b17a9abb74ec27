"""N2-N8: footnote (附注) extraction — titles, hierarchy, positional
table assignment, text slices, numbering continuity.

Reference: src/parsers/batch_notes_extractor.py (candidate pre-filter
:130-144, positional hierarchy + assignment :264-556, text slice
:558-597) and src/parsers/notes_extractor.py (title grammar spec inside
the LLM prompts :244-334, continuity :482-518). The reference delegates
title recognition to an LLM whose prompt spells out an exact grammar;
per the LLM-free mandate the grammar runs as regexes (patterns.py
NOTE_L1_TITLE / NOTE_L2_TITLE), making the whole stage deterministic
DataFrame algebra: window ``lead`` for interval bounds, a range join
for table→note assignment, ``lag`` for continuity.

Faithful quirk: the reference's batch ``_extract_note_text`` accepts a
next-title bound but never uses it — text is simply the next ≤10
non-empty lines after the title line (:584-591). Reproduced as-is as
``text_mode="batch"`` (the default). The reference's single-page
variant (notes_extractor.py:17-54 ``extract_text_between_titles``)
slices ALL lines strictly between the current title and the next title
of any level, uncapped — available as ``text_mode="between_titles"``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..patterns import NOTE_L1_TITLE, NOTE_L2_TITLE

CANDIDATE_LINE_LIMIT = 100  # batch_notes_extractor.py:131
CANDIDATE_KEEP = 20         # :144
TEXT_LINE_CAP = 10          # :589


def _lines_long(page_df: DataFrame) -> DataFrame:
    return page_df.select(
        "url", "page", F.posexplode("lines").alias("line_no", "l")
    ).select("url", "page", "line_no", F.col("l.y").alias("y"), F.col("l.text").alias("text"))


def _title_candidates(lines: DataFrame) -> DataFrame:
    """N2: first 100 lines; keeps lines opening with a digit or a
    (（-wrapped digit; first 20 kept per page."""
    cand = lines.filter(
        (F.col("line_no") < CANDIDATE_LINE_LIMIT)
        & F.col("text").rlike(r"^(\d|[（(]\d)")
    )
    w = Window.partitionBy("url", "page").orderBy("line_no")
    return cand.withColumn("_rk", F.row_number().over(w)).filter(
        F.col("_rk") <= CANDIDATE_KEEP
    ).drop("_rk")


def extract_notes(page_df: DataFrame, text_mode: str = "batch") -> DataFrame:
    """→ (url, page, number, level, title, full_title, text, tables,
    table_count, has_table, y).

    ``text_mode``: "batch" = the ≤10-line slice of the batch extractor
    (default); "between_titles" = the single-page extractor's uncapped
    slice bounded by the next title of any level.
    """
    if text_mode not in ("batch", "between_titles"):
        raise ValueError(f"unknown text_mode: {text_mode!r}")
    lines = _lines_long(page_df)
    cand = _title_candidates(lines)

    l1 = cand.filter(F.col("text").rlike(NOTE_L1_TITLE)).select(
        "url", "page", "y",
        F.regexp_extract("text", NOTE_L1_TITLE, 1).alias("number"),
        F.regexp_extract("text", NOTE_L1_TITLE, 2).alias("title"),
        F.col("text").alias("full_title"),
    )
    l2 = cand.filter(F.col("text").rlike(NOTE_L2_TITLE)).select(
        "url", "page", "y",
        F.regexp_extract("text", NOTE_L2_TITLE, 1).alias("number"),
        F.regexp_extract("text", NOTE_L2_TITLE, 2).alias("title"),
        F.col("text").alias("full_title"),
    )

    # interval bounds for level-1 titles (N6 upper bound = next L1's y)
    w1 = Window.partitionBy("url", "page").orderBy("y")
    l1 = l1.withColumn("next_l1_y", F.lead("y").over(w1))

    # level-2 → parent assignment by position (batch_notes_extractor.py:300-318)
    l1p = l1.select(
        "url", "page",
        F.col("y").alias("parent_y"),
        F.col("next_l1_y").alias("parent_next_y"),
    )
    l2a = l2.join(l1p, ["url", "page"], "inner").filter(
        (F.col("y") >= F.col("parent_y"))
        & (F.col("parent_next_y").isNull() | (F.col("y") < F.col("parent_next_y")))
    )
    w2 = Window.partitionBy("url", "page", "parent_y").orderBy("y")
    l2a = l2a.withColumn(
        "bound_y", F.coalesce(F.lead("y").over(w2), F.col("parent_next_y"))
    )

    parents_with_children = l2a.select("url", "page", F.col("parent_y").alias("y")).distinct()

    tables = page_df.select("url", "page", F.explode("tables").alias("t")).select(
        "url", "page",
        F.col("t.y_top").alias("y_top"),
        F.col("t.rows").alias("rows"),
    )

    def _assign(notes: DataFrame, lo: str, hi: str) -> DataFrame:
        """N6 interval join: table belongs to note iff lo ≤ y_top < hi.

        LEFT join with the interval predicate IN the join condition so a
        note whose interval holds no tables still survives (empty list).
        """
        t = tables.select(
            F.col("url").alias("t_url"), F.col("page").alias("t_page"), "y_top", "rows"
        )
        cond = (
            (notes["url"] == t["t_url"]) & (notes["page"] == t["t_page"])
            & (t["y_top"] >= notes[lo])
            & (notes[hi].isNull() | (t["y_top"] < notes[hi]))
        )
        j = notes.join(t, cond, "left")
        return j.groupBy(*[notes[c] for c in notes.columns]).agg(
            F.array_sort(
                F.collect_list(F.when(F.col("y_top").isNotNull(), F.struct("y_top", "rows")))
            ).alias("_ts"),
        ).withColumn("tables", F.transform("_ts", lambda s: s["rows"])).drop("_ts")

    # childless level-1 notes own their interval's tables; parents with
    # children own none (tables go to the children, :324-343)
    l1_childless = l1.join(parents_with_children, ["url", "page", "y"], "left_anti")
    l1_childless = _assign(l1_childless, "y", "next_l1_y").withColumn("level", F.lit(1))

    l1_parents = (
        l1.join(parents_with_children, ["url", "page", "y"], "left_semi")
        .withColumn("tables", F.array().cast("array<array<array<string>>>"))
        .withColumn("level", F.lit(1))
    )
    l2_assigned = _assign(
        l2a.select("url", "page", "y", "number", "title", "full_title", "bound_y"),
        "y", "bound_y",
    ).withColumn("level", F.lit(2))

    notes = (
        l1_childless.select("url", "page", "y", "number", "title", "full_title", "level", "tables")
        .unionByName(l1_parents.select("url", "page", "y", "number", "title", "full_title", "level", "tables"))
        .unionByName(l2_assigned.select("url", "page", "y", "number", "title", "full_title", "level", "tables"))
    )

    # N7 text slice. batch: next ≤10 lines strictly after the title
    # line; between_titles: every line up to the next title of ANY level
    # (notes_extractor.py:36-50 break condition), uncapped.
    w_titles = Window.partitionBy("url", "page").orderBy("note_y")
    note_bounds = notes.select("url", "page", F.col("y").alias("note_y")).withColumn(
        "next_title_y", F.lead("note_y").over(w_titles)
    )
    after = note_bounds.join(lines, ["url", "page"], "inner").filter(
        F.col("y") > F.col("note_y")
    )
    if text_mode == "between_titles":
        after = after.filter(
            F.col("next_title_y").isNull() | (F.col("y") < F.col("next_title_y"))
        )
    w_after = Window.partitionBy("url", "page", "note_y").orderBy("y")
    after = after.withColumn("_rk", F.row_number().over(w_after))
    if text_mode == "batch":
        after = after.filter(F.col("_rk") <= TEXT_LINE_CAP)
    texts = (
        after
        .groupBy("url", "page", "note_y")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("y", "text"))), lambda s: s["text"]
                ),
                "\n",
            ).alias("text")
        )
    )
    notes = notes.join(
        texts.withColumnRenamed("note_y", "y"), ["url", "page", "y"], "left"
    ).withColumn("text", F.coalesce("text", F.lit("")))

    return notes.select(
        "url", "page", "number", "level", "title", "full_title", "text",
        "tables",
        F.size("tables").alias("table_count"),
        (F.size("tables") > 0).alias("has_table"),
        F.lit(True).alias("is_complete"),
        "y",
    )


def notes_continuity(notes: DataFrame) -> DataFrame:
    """N8 (notes_extractor.py:482-518): the first level-1 number on a
    page must be the previous notes-page's last number + 1."""
    l1 = notes.filter(F.col("level") == 1).withColumn("num", F.col("number").cast("int"))
    per_page = l1.groupBy("url", "page").agg(
        F.min_by("num", "y").alias("first_num"),
        F.max_by("num", "y").alias("last_num"),
    )
    w = Window.partitionBy("url").orderBy("page")
    return per_page.withColumn("prev_last", F.lag("last_num").over(w)).select(
        "url", "page", "first_num", "last_num",
        F.when(F.col("prev_last").isNull(), F.lit(True))
        .otherwise(F.col("first_num") == F.col("prev_last") + 1)
        .alias("continuity_ok"),
    )


def merge_cross_page_notes(notes: DataFrame, page_df: DataFrame) -> DataFrame:
    """Cross-page note continuation (the reference's ``is_complete=False``
    case, notes_extractor.py:474 — there judged by the LLM; here the
    deterministic contract is positional): lines on the NEXT notes page
    that precede its first title are the spilled tail of the previous
    page's last note. Those notes get the continuation appended to
    ``text`` and ``is_complete=False``; everything else passes through.

    Designed for ``text_mode="between_titles"`` output (the uncapped
    slice); chains longer than one page (a full page with no titles) are
    out of scope, matching the reference's ±1-page batch context window.
    """
    lines = _lines_long(page_df)
    bounds = notes.groupBy("url", "page").agg(
        F.min("y").alias("first_title_y"), F.max("y").alias("last_title_y")
    )
    cont = (
        lines.join(bounds, ["url", "page"])
        .filter(F.col("y") < F.col("first_title_y"))
        .groupBy("url", "page")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("y", "text"))), lambda s: s["text"]
                ),
                "\n",
            ).alias("cont_text")
        )
    )
    # attach page p+1's continuation to page p's LAST note
    w = Window.partitionBy("url").orderBy("page")
    nxt = (
        bounds.withColumn("next_page", F.lead("page").over(w))
        .join(
            cont.select("url", F.col("page").alias("next_page"), "cont_text"),
            ["url", "next_page"],
        )
        .filter(F.col("next_page") == F.col("page") + 1)  # adjacent pages only
        .select("url", "page", "last_title_y", "cont_text")
    )
    merged = notes.join(
        nxt.withColumnRenamed("last_title_y", "y"), ["url", "page", "y"], "left"
    )
    spilled = F.col("cont_text").isNotNull()
    return (
        merged.withColumn(
            "text",
            F.when(
                spilled,
                F.when(F.col("text") == "", F.col("cont_text")).otherwise(
                    F.concat_ws("\n", "text", "cont_text")
                ),
            ).otherwise(F.col("text")),
        )
        .withColumn("is_complete", ~spilled)
        .drop("cont_text")
    )
