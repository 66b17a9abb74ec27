"""Text/number column expressions shared by the operators.

Everything here compiles to Catalyst expressions (whole-stage codegen);
no Python runs per row.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..patterns import HEADER_KEYWORD_PAIRS


def rlike_any(col: Column, patterns: list[str]) -> Column:
    """OR-fold of rlike over a literal pattern bank (constant-folded)."""
    out = F.lit(False)
    for p in patterns:
        out = out | col.rlike(p)
    return out


_REGEX_META = set(".^$*+?()[]{}|\\")


def fast_match(col: Column, pattern: str) -> Column:
    """rlike-equivalent that compiles the common literal pattern shapes
    to cheap string predicates instead of Java regex:

    * ``^lit$`` → equality, ``^lit`` → startswith, ``lit$`` → endswith,
      ``lit`` → contains (rlike is an unanchored FIND, so these are
      exact semantic equivalents for metacharacter-free bodies);
    * anything containing regex syntax falls back to ``rlike``.

    The pattern banks are hundreds of mostly-literal Chinese account
    names evaluated against every item row — indexOf beats a regex
    engine by ~5-10× on that hot path.

    Caveat: Java's ``$`` also matches before one trailing newline;
    equality/endswith do not. Callers feed M3-cleaned cells or
    name_from_cell output (both newline-free), so the shapes agree.
    """
    body = pattern
    anchored_start = body.startswith("^")
    if anchored_start:
        body = body[1:]
    anchored_end = body.endswith("$")
    if anchored_end:
        body = body[:-1]
    if body and not (set(body) & _REGEX_META):
        if anchored_start and anchored_end:
            return col == body
        if anchored_start:
            return col.startswith(body)
        if anchored_end:
            return col.endswith(body)
        return col.contains(body)
    # unanchored top-level alternation of pure literals → OR of contains
    if not anchored_start and not anchored_end and "|" in body:
        parts = body.split("|")
        if all(p and not (set(p) & _REGEX_META) for p in parts):
            out = F.lit(False)
            for p in parts:
                out = out | col.contains(p)
            return out
    return col.rlike(pattern)


def clean_cells(cells: Column) -> Column:
    """M3 cell cleaning (reference table_extractor.py:336-347):
    null→'', strip, collapse internal whitespace runs to one space."""
    return F.transform(
        cells, lambda c: F.trim(F.regexp_replace(F.coalesce(c, F.lit("")), r"\s+", " "))
    )


def joined_row_text(cells: Column) -> Column:
    """All cells (null→'') joined by spaces — the reference's row/table
    text used for boundary and header checks (table_extractor.py:216,242,303)."""
    return F.array_join(F.transform(cells, lambda c: F.coalesce(c, F.lit(""))), " ")


def nonempty_row_text(cells: Column) -> Column:
    """Only truthy cells joined by spaces (identifier.py:293)."""
    return F.array_join(F.filter(cells, lambda c: F.coalesce(c, F.lit("")) != ""), " ")


def is_header_row(cells: Column) -> Column:
    """M2 duplicate-header predicate: any keyword *pair* both contained
    in the joined row text (table_extractor.py:306-310)."""
    txt = joined_row_text(cells)
    out = F.lit(False)
    for a, b in HEADER_KEYWORD_PAIRS:
        out = out | (txt.contains(a) & txt.contains(b))
    return out


def name_from_cell(cell: Column) -> Column:
    """Item-name cleanup: drop CR/LF then strip (identifier.py:195-196,
    base_statement_parser.py:189-190)."""
    return F.trim(F.regexp_replace(F.coalesce(cell, F.lit("")), r"[\n\r]", ""))


def matched_pattern_ids(col: Column, patterns: list[tuple[int, str]]) -> Column:
    """Array of pattern ids whose LITERAL regex matches ``col``.

    The scale-critical trick behind every pattern-bank join: joining on
    ``rlike(pattern_column)`` forces a broadcast nested-loop join that
    recompiles each regex per row-pair. Because the banks are constants
    known at plan time, we instead emit one codegen'd ``rlike`` per
    literal pattern (compiled once per task), collect the matching ids,
    explode, and equi-join the tiny id→metadata dimension — same
    result, hash join instead of nested loop.
    """
    return F.array_compact(
        F.array(*[F.when(fast_match(col, p), F.lit(i)) for i, p in patterns])
    )


def to_num(value: Column) -> Column:
    """V14 numeric coercion (balance_sheet.py:808-829): keep only
    ``[0-9.\\-]``, cast to double, '-'/'--' and empties → null."""
    cleaned = F.regexp_replace(F.coalesce(value, F.lit("")), r"[^0-9.\-]", "")
    return F.when(
        (cleaned == "") | cleaned.isin("-", "--"), F.lit(None).cast("double")
    ).otherwise(cleaned.try_cast("double"))
