"""PDF-style content-stream layout kernel.

The north-star layout engine (BASELINE.json): tokenize a content
stream of positioned glyph runs and ruling-line segments, cluster runs
into text lines by Y proximity, detect tables from ruling-line grids,
resolve cells by geometric containment, and emit reading order by
(y, x) — the deterministic stand-in for pdfplumber's
extract_text/extract_tables/find_tables layer (reference
src/pdf_reader.py:61-100, batch_notes_extractor.py:483-517).

Container format (``FPDF1``), produced by ``corpus.render_pdfish``:

    FPDF1
    P <width> <height>          -- begin page
    T <x> <y> <utf8 text run>   -- positioned glyph run
    L <x1> <y1> <x2> <y2>       -- ruling segment (axis-aligned)

The renderer emits only positions — no line/table/row structure — so
everything the relational stratum consumes here is genuinely
RECONSTRUCTED:

* line clustering: runs whose Y differs by ≤ ``Y_TOL`` merge into one
  line (the renderer deterministically jitters run Y by ±1 to keep the
  clustering honest); within a line, runs sort by X and join with
  single spaces;
* table detection: horizontal + vertical ruling segments form grids;
  distinct Ys are row boundaries, distinct Xs column boundaries; a cell
  is the text of all runs whose anchor falls inside its rectangle
  (empty cells exist — they simply contain no glyphs); tables with no
  rulings are detected by column alignment (consecutive lines sharing
  an identical ≥2-anchor X signature);
* reading order: XY-cut whitespace-gap segmentation (column gutters
  first, then horizontal bands); within a leaf block, non-table lines
  and table rows interleave by Y — single-column pages degenerate to
  the flat Y interleave.

Integer coordinates end-to-end — no float nondeterminism (SURVEY.md §7
risk 1).
"""

from __future__ import annotations

MAGIC = b"FPDF1\n"
Y_TOL = 2
# Nominal fixed-pitch glyph advance: every positioned-glyph container
# this kernel reads (FPDF1, the minipdf writer) lays text out on a
# 6-px/char grid, so a run's X extent is reconstructable from its
# anchor + length. Real-PDF generalization would read per-font widths.
CHAR_W = 6
# Whitespace-gap thresholds for XY-cut segmentation. Word gaps render
# at CHAR_W (6) and table-cell padding at 8, while column gutters are
# laid out ≥ 100 px wide — 24 px cleanly separates "intra-block
# spacing" from "layout whitespace" on both axes (leading is 12).
GUTTER_X = 24
GUTTER_Y = 24
# Column-alignment table detection: this many consecutive lines whose
# runs anchor at one identical tuple of ≥2 X positions form an
# unruled table (paragraph lines share at most the left margin anchor).
MIN_ALIGN_ROWS = 3


def is_pdfish(blob: bytes) -> bool:
    return blob[: len(MAGIC)] == MAGIC


# a following run starting within this of the previous run's computed
# right edge (x + len·CHAR_W) continues the SAME word — the analog of
# pdfplumber's char-merge x-tolerance. Real writers emit text in many
# small show-runs positioned by font-metric advance (one per kern pair
# or style change); coalescing them back into words must happen before
# any layout analysis (line text, cell assignment, alignment anchors).
JOIN_TOL = 1


def _coalesce_runs(
    runs: list[tuple[int, int, str]],
) -> list[tuple[int, int, str]]:
    """Merge x-contiguous same-line show-runs into single word runs.

    Two runs merge when their Ys are within ``Y_TOL`` and the second
    starts within ``JOIN_TOL`` of the first's computed right edge —
    i.e. the writer continued the same word via width advance rather
    than repositioning. Downstream (grid cells, aligned-table anchors,
    line clustering) then sees one run per word exactly as if the text
    had been shown in one operation.
    """
    out: list[tuple[int, int, str]] = []
    for x, y, t in sorted(runs, key=lambda r: (r[1], r[0])):
        if out:
            px, py, pt = out[-1]
            gap = x - (px + len(pt) * CHAR_W)
            if abs(y - py) <= Y_TOL and 0 <= gap <= JOIN_TOL:
                out[-1] = (px, py, pt + t)
                continue
        out.append((x, y, t))
    return out


def _cluster_lines(runs: list[tuple[int, int, str]]) -> list[tuple[int, str]]:
    """Y-cluster glyph runs → (y, text) lines, reading order resolved.

    Runs sort by (y, x); a run joins the current line while its Y is
    within Y_TOL of the line's anchor Y, else a new line starts. Text
    within a line is the X-sorted runs joined by single spaces.
    """
    out: list[tuple[int, str]] = []
    cur: list[tuple[int, int, str]] = []
    cur_y: int | None = None
    for x, y, text in sorted(runs, key=lambda r: (r[1], r[0])):
        if cur_y is not None and abs(y - cur_y) <= Y_TOL:
            cur.append((x, y, text))
        else:
            if cur:
                out.append((cur_y, " ".join(t for _x, _y, t in sorted(cur))))
            cur = [(x, y, text)]
            cur_y = y
    if cur:
        out.append((cur_y, " ".join(t for _x, _y, t in sorted(cur))))
    return out


def _x_extent(run: tuple[int, int, str]) -> tuple[int, int]:
    x, _y, text = run
    return x, x + len(text) * CHAR_W


def _cluster_rows(
    runs: list[tuple[int, int, str]],
) -> list[tuple[int, list[tuple[int, int, str]]]]:
    """Y-cluster runs like ``_cluster_lines`` but keep the run tuples
    per line (alignment detection needs the X anchors, not the text)."""
    out: list[tuple[int, list[tuple[int, int, str]]]] = []
    cur: list[tuple[int, int, str]] = []
    cur_y: int | None = None
    for run in sorted(runs, key=lambda r: (r[1], r[0])):
        if cur_y is not None and abs(run[1] - cur_y) <= Y_TOL:
            cur.append(run)
        else:
            if cur:
                out.append((cur_y, cur))
            cur = [run]
            cur_y = run[1]
    if cur:
        out.append((cur_y, cur))
    return out


def _detect_aligned(
    free_runs: list[tuple[int, int, str]],
) -> tuple[list[dict], list[tuple[int, int, str]]]:
    """Column-alignment (unruled) table detection.

    The north-star layout engine detects tables "from ruling lines and
    column alignment" (BASELINE.json; the reference gets both from
    pdfplumber's table strategies, src/pdf_reader.py:61-100). Ruling
    grids are handled by ``_detect_grids``; this is the alignment half:
    ``MIN_ALIGN_ROWS``+ consecutive Y-lines whose runs all anchor at one
    identical tuple of ≥2 X positions are an unruled table — the shared
    anchors are column starts, each line a row, the run at each anchor
    that row's cell. Two prose immunities: word-wrap makes anchor
    tuples differ line to line (only the left margin is shared), and —
    because short or verbatim-repeated lines CAN align (hypothesis
    found ``p0='1 1'`` rows doing exactly that) — every inter-run gap
    in a candidate line must exceed one glyph advance (``> CHAR_W``):
    prose word gaps render at exactly CHAR_W, while table cells carry
    padding (≥ CHAR_W + 2), so only true gutters qualify as column
    breaks.

    Returns (tables, leftover_runs); each table is a box dict with
    ``rows_at`` = [(y, [cell, ...]), ...] at the lines' real Ys.
    """
    lines = _cluster_rows(free_runs)
    sigs: list[tuple[int, ...] | None] = []
    for _y, runs in lines:
        sr = sorted(runs)
        xs = tuple(x for x, _ry, _t in sr)
        # ≥2 distinct anchors, no duplicate anchor (two runs at one X
        # cannot both start a column), and every inter-run gap wider
        # than a word space (see docstring)
        ok = (
            len(xs) >= 2
            and len(xs) == len(set(xs))
            and all(
                sr[k + 1][0] - _x_extent(sr[k])[1] > CHAR_W
                for k in range(len(sr) - 1)
            )
        )
        sigs.append(xs if ok else None)
    tables: list[dict] = []
    consumed: set[int] = set()
    i = 0
    while i < len(lines):
        if sigs[i] is None:
            i += 1
            continue
        j = i + 1
        while j < len(lines) and sigs[j] == sigs[i]:
            j += 1
        if j - i >= MIN_ALIGN_ROWS:
            rows_at: list[tuple[int, list[str]]] = []
            x1 = 0
            for k in range(i, j):
                y, runs = lines[k]
                runs = sorted(runs)
                rows_at.append((y, [t for _x, _ry, t in runs]))
                x1 = max(x1, max(_x_extent(r)[1] for r in runs))
            tables.append(
                {
                    "x0": sigs[i][0],
                    "x1": x1,
                    "y0": lines[i][0],
                    "y1": lines[j - 1][0],
                    "rows_at": rows_at,
                }
            )
            consumed.update(range(i, j))
            i = j
        else:
            i += 1
    leftover = [
        run
        for k, (_y, runs) in enumerate(lines)
        if k not in consumed
        for run in runs
    ]
    return tables, leftover


def _band_gaps(extents: list[tuple[int, int]], min_gap: int) -> list[int]:
    """Midpoints of every maximal empty band ≥ ``min_gap`` strictly
    inside the coverage of ``extents`` (a classic projection-profile
    valley scan on integer intervals)."""
    ivs = sorted(extents)
    cuts: list[int] = []
    hi = ivs[0][1]
    for a, b in ivs[1:]:
        if a - hi >= min_gap:
            cuts.append((hi + a) // 2)
        hi = max(hi, b)
    return cuts


def _split_bands(
    runs: list[tuple[int, int, str]],
    boxes: list[dict],
    cuts: list[int],
    axis: int,
) -> list[tuple[list[tuple[int, int, str]], list[dict]]]:
    """Partition elements into the bands delimited by ``cuts`` on
    ``axis`` (0 = X, 1 = Y). A cut midpoint lies in genuinely empty
    whitespace, so an element's low coordinate places it whole."""

    def band(v: int) -> int:
        n = 0
        for c in cuts:
            if v > c:
                n += 1
        return n

    groups: list[tuple[list, list]] = [([], []) for _ in range(len(cuts) + 1)]
    for r in runs:
        groups[band(r[axis])][0].append(r)
    for b in boxes:
        groups[band(b["x0"] if axis == 0 else b["y0"])][1].append(b)
    return [g for g in groups if g[0] or g[1]]


def _xy_cut(
    runs: list[tuple[int, int, str]], boxes: list[dict]
) -> list[tuple[list[tuple[int, int, str]], list[dict]]]:
    """Recursive whitespace-gap (XY-cut) page segmentation.

    The north-star engine clusters glyphs "into text lines and blocks
    via XY-cut/whitespace-gap analysis" and resolves reading order
    (BASELINE.json). Runs project with their fixed-pitch X extents,
    detected tables (ruled or aligned) ride along as atomic boxes so a
    cut can never slice through one. Vertical gutter cuts take priority
    — a column is read in full before its right neighbour — then
    horizontal cuts order bands top-to-bottom; recursion continues until
    neither axis has a gap ≥ the gutter thresholds. Single-column pages
    have no qualifying gaps, so they stay one leaf and reading order
    degenerates to the flat (y, x) interleave.
    """
    if not runs and not boxes:
        return []
    ext_x = [_x_extent(r) for r in runs] + [(b["x0"], b["x1"]) for b in boxes]
    cuts = _band_gaps(ext_x, GUTTER_X)
    if cuts:
        return [
            leaf
            for group in _split_bands(runs, boxes, cuts, 0)
            for leaf in _xy_cut(*group)
        ]
    ext_y = [(r[1], r[1]) for r in runs] + [(b["y0"], b["y1"]) for b in boxes]
    cuts = _band_gaps(ext_y, GUTTER_Y)
    if cuts:
        return [
            leaf
            for group in _split_bands(runs, boxes, cuts, 1)
            for leaf in _xy_cut(*group)
        ]
    return [(runs, boxes)]


def _detect_grids(
    h_segs: list[tuple[int, int, int, int]], v_segs: list[tuple[int, int, int, int]]
) -> list[dict]:
    """Group ruling segments into disjoint grid bounding boxes and
    derive row/column boundaries from the distinct segment positions."""
    grids: list[dict] = []
    for x1, y1, x2, y2 in h_segs + v_segs:
        lo_x, hi_x = min(x1, x2), max(x1, x2)
        lo_y, hi_y = min(y1, y2), max(y1, y2)
        target = None
        for g in grids:
            if not (hi_x < g["x0"] - Y_TOL or lo_x > g["x1"] + Y_TOL
                    or hi_y < g["y0"] - Y_TOL or lo_y > g["y1"] + Y_TOL):
                target = g
                break
        if target is None:
            target = {"x0": lo_x, "x1": hi_x, "y0": lo_y, "y1": hi_y, "h": [], "v": []}
            grids.append(target)
        target["x0"] = min(target["x0"], lo_x)
        target["x1"] = max(target["x1"], hi_x)
        target["y0"] = min(target["y0"], lo_y)
        target["y1"] = max(target["y1"], hi_y)
        if y1 == y2:
            target["h"].append(y1)
        else:
            target["v"].append(x1)
    # merge grids that became adjacent after growth
    merged = True
    while merged:
        merged = False
        for i in range(len(grids)):
            for j in range(i + 1, len(grids)):
                a, b = grids[i], grids[j]
                if not (b["x1"] < a["x0"] - Y_TOL or b["x0"] > a["x1"] + Y_TOL
                        or b["y1"] < a["y0"] - Y_TOL or b["y0"] > a["y1"] + Y_TOL):
                    a["x0"] = min(a["x0"], b["x0"]); a["x1"] = max(a["x1"], b["x1"])
                    a["y0"] = min(a["y0"], b["y0"]); a["y1"] = max(a["y1"], b["y1"])
                    a["h"] += b["h"]; a["v"] += b["v"]
                    grids.pop(j)
                    merged = True
                    break
            if merged:
                break
    for g in grids:
        g["rows_y"] = sorted(set(g["h"]))
        g["cols_x"] = sorted(set(g["v"]))
    return [g for g in grids if len(g["rows_y"]) >= 2 and len(g["cols_x"]) >= 2]


def parse_pdfish(blob: bytes) -> list[dict]:
    """content stream → the same per-page structs as the HTML kernel
    (page_text, lines with y, tables with extents + rows×cells)."""
    text = blob[len(MAGIC):].decode("utf-8")
    pages_raw: list[dict] = []
    page = None
    for raw in text.split("\n"):
        if not raw:
            continue
        op, rest = raw[0], raw[2:] if len(raw) > 2 else ""
        if op == "P":
            w, h = (int(v) for v in rest.split(" "))
            page = {"runs": [], "h": [], "v": [], "width": float(w), "height": float(h)}
            pages_raw.append(page)
        elif op == "T" and page is not None:
            xs, ys, run_text = rest.split(" ", 2)
            page["runs"].append((int(xs), int(ys), run_text))
        elif op == "L" and page is not None:
            x1, y1, x2, y2 = (int(v) for v in rest.split(" "))
            (page["h"] if y1 == y2 else page["v"]).append((x1, y1, x2, y2))
    return assemble_pages(pages_raw)


def assemble_pages(pages_raw: list[dict]) -> list[dict]:
    """Layout reconstruction shared by every positioned-glyph format
    (FPDF1 and the minimal real-PDF tokenizer): runs + ruling segments →
    tables (ruling-grid AND column-alignment detected), lines
    (Y-clustered), reading order (XY-cut: columns before Y interleave)."""
    out = []
    for page_no, p in enumerate(pages_raw, start=1):
        grids = _detect_grids(p["h"], p["v"])
        page_runs = _coalesce_runs(p["runs"])

        def grid_of(x: int, y: int):
            for g in grids:
                if g["x0"] <= x <= g["x1"] and g["y0"] <= y <= g["y1"]:
                    return g
            return None

        free_runs = [r for r in page_runs if grid_of(r[0], r[1]) is None]
        aligned, free_runs = _detect_aligned(free_runs)

        boxes: list[dict] = list(aligned)
        for g in grids:
            rows_y, cols_x = g["rows_y"], g["cols_x"]
            cells = [
                [[] for _ in range(len(cols_x) - 1)] for _ in range(len(rows_y) - 1)
            ]
            for x, y, t in page_runs:
                if not (g["x0"] <= x <= g["x1"] and g["y0"] <= y <= g["y1"]):
                    continue
                ri = next(
                    (i for i in range(len(rows_y) - 1) if rows_y[i] <= y < rows_y[i + 1]),
                    None,
                )
                ci = next(
                    (i for i in range(len(cols_x) - 1) if cols_x[i] <= x < cols_x[i + 1]),
                    None,
                )
                if ri is not None and ci is not None:
                    cells[ri][ci].append((x, t))
            rows = [
                [" ".join(t for _x, t in sorted(c)) for c in row] for row in cells
            ]
            n_rows = len(rows)
            boxes.append(
                {
                    "x0": g["x0"],
                    "x1": g["x1"],
                    "y0": g["y0"],
                    "y1": g["y1"],
                    # grid row Y = interpolated band top (the anchor the
                    # reading-order interleave has always used); aligned
                    # tables carry their lines' real Ys already
                    "rows_at": [
                        (
                            g["y0"] + (g["y1"] - g["y0"]) * i // max(n_rows, 1),
                            row,
                        )
                        for i, row in enumerate(rows)
                    ],
                }
            )
        boxes.sort(key=lambda b: (b["y0"], b["x0"]))
        tables = [
            {
                "y_top": b["y0"],
                "y_bottom": b["y1"],
                "rows": [row for _ry, row in b["rows_at"]],
            }
            for b in boxes
        ]

        # reading order: XY-cut leaves in cut order; within a leaf,
        # free lines and table rows interleave by Y (single-column
        # pages are one leaf — identical to the flat Y interleave)
        elements: list[tuple[int, str]] = []
        for leaf_runs, leaf_boxes in _xy_cut(free_runs, boxes):
            leaf_el: list[tuple[int, str]] = list(_cluster_lines(leaf_runs))
            for b in sorted(leaf_boxes, key=lambda b: (b["y0"], b["x0"])):
                leaf_el.extend((ry, "\t".join(row)) for ry, row in b["rows_at"])
            leaf_el.sort(key=lambda e: e[0])
            elements.extend(leaf_el)

        out.append(
            {
                "page": page_no,
                "width": p["width"],
                "height": p["height"],
                # reference get_page_info (src/pdf_reader.py:102-136)
                # exposes page rotation; positioned-glyph formats carry
                # it in the page dict (minipdf /Rotate), default 0
                "rotation": int(p.get("rotation", 0)),
                "page_text": "\n".join(t for _y, t in elements),
                "lines": [(float(y), t) for y, t in elements],
                "tables": [
                    (i, float(t["y_top"]), float(t["y_bottom"]), t["rows"])
                    for i, t in enumerate(tables)
                ],
            }
        )
    return out
