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
  (empty cells exist — they simply contain no glyphs);
* reading order: non-table lines and table rows interleave by Y.

Integer coordinates end-to-end — no float nondeterminism (SURVEY.md §7
risk 1).
"""

from __future__ import annotations

MAGIC = b"FPDF1\n"
Y_TOL = 2


def is_pdfish(blob: bytes) -> bool:
    return blob[: len(MAGIC)] == MAGIC


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
    lines (Y-clustered), tables (grid-detected), reading order."""
    out = []
    for page_no, p in enumerate(pages_raw, start=1):
        grids = _detect_grids(p["h"], p["v"])

        def grid_of(x: int, y: int):
            for g in grids:
                if g["x0"] <= x <= g["x1"] and g["y0"] <= y <= g["y1"]:
                    return g
            return None

        free_runs = [r for r in p["runs"] if grid_of(r[0], r[1]) is None]
        lines = _cluster_lines(free_runs)

        tables = []
        for g in sorted(grids, key=lambda g: g["y0"]):
            rows_y, cols_x = g["rows_y"], g["cols_x"]
            cells = [
                [[] for _ in range(len(cols_x) - 1)] for _ in range(len(rows_y) - 1)
            ]
            for x, y, t in p["runs"]:
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
            tables.append({"y_top": g["y0"], "y_bottom": g["y1"], "rows": rows})

        # reading order: free lines and table rows interleave by Y
        elements: list[tuple[int, str]] = list(lines)
        for t in tables:
            n_rows = len(t["rows"])
            for i, row in enumerate(t["rows"]):
                ry = t["y_top"] + (t["y_bottom"] - t["y_top"]) * i // max(n_rows, 1)
                elements.append((ry, "\t".join(row)))
        elements.sort(key=lambda e: e[0])

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
