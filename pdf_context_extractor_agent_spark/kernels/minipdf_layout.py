"""Minimal REAL-PDF content-stream kernel.

The north-star brief calls for "tokenizing content streams" of PDF byte
streams. This module handles a structurally genuine PDF subset —
``%PDF-1.4`` header, numbered objects, page tree, per-page
uncompressed content streams, xref table, trailer — whose streams use
the real PDF operator vocabulary:

    BT … ET                 text object
    a b c d e f Tm          text matrix (absolute positioning; e,f = x,y)
    tx ty Td                relative line displacement
    n TL   T*   (s) '       leading / next-line / next-line-and-show
    (string) Tj             show text
    [(a) -250 (b)] TJ       show with kerning (gap ≤ KERN_SPACE → space)
    x y m   x y l   S       path moveto/lineto/stroke (ruling lines)

Streams may be /FlateDecode-compressed (zlib, stdlib); uncompressed
streams pass through untouched. The tokenizer walks each stream, tracks
the text matrix, and emits positioned glyph runs + ruling segments;
PDF's bottom-left origin is flipped to layout (top-down) Y.
Reconstruction — Y-clustering into lines, ruling-grid table detection,
reading order — is shared with the FPDF1 kernel
(`pdfish_layout.assemble_pages`), so both formats satisfy the same
byte-identity oracle.

Simplifications vs full PDF (documented contract of the subset): one
content stream per page in document order, text strings UTF-8 inside
literal-string syntax (real CJK PDFs use CID font CMaps —
encoding-layer work orthogonal to layout reconstruction).
"""

from __future__ import annotations

import re
import zlib

from .pdfish_layout import assemble_pages

PAGE_W, PAGE_H = 612, 792

# TJ kerning adjustments are in thousandths of an em, negative = closer;
# a gap at or below this (i.e. adjustment ≤ -KERN_SPACE) renders as an
# inter-word space — the same heuristic pdfminer/pdfplumber apply
KERN_SPACE = 180.0

# object dict + stream body: the dict tells us the /Filter
_STREAM_RE = re.compile(rb"<<((?:[^<>]|<<[^>]*>>)*?)>>\s*stream\r?\n(.*?)endstream", re.S)

# content-stream token classes (group index = token kind, dispatched
# via match.lastindex — cheaper than re-inspecting the lexeme)
_TOKEN_RE = re.compile(
    r"""(\((?:\\.|[^\\()])*\))   # 1: literal string
      | ([-+]?\d+(?:\.\d+)?)     # 2: number
      | (/[A-Za-z0-9]+)          # 3: name
      | ([A-Za-z']{1,3}\*?)      # 4: operator
    """,
    re.X,
)


def is_minipdf(blob: bytes) -> bool:
    return blob[:5] == b"%PDF-"


def _unescape(s: str) -> str:
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            out.append(s[i + 1])
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _tokenize_stream(data: str) -> dict:
    """One content stream → {runs, h, v} in layout (top-down) coords."""
    runs: list[tuple[int, int, str]] = []
    h_segs: list[tuple[int, int, int, int]] = []
    v_segs: list[tuple[int, int, int, int]] = []
    stack: list = []
    tx = ty = 0.0          # current text position (PDF coords)
    leading = 12.0         # TL text leading (T* / ' displacement)
    path_pt: tuple[float, float] | None = None
    pending_seg: tuple[float, float, float, float] | None = None

    def flip(y: float) -> int:
        return int(PAGE_H - y)

    def lit(tok: str) -> str:
        s = tok[1:-1]
        if "\\" in s:  # escape processing only when present
            s = _unescape(s)
        return s

    def show_top() -> None:
        if stack and isinstance(stack[-1], str) and stack[-1].startswith("("):
            runs.append((int(tx), flip(ty), lit(stack[-1])))

    for m in _TOKEN_RE.finditer(data):
        kind = m.lastindex
        if kind == 2:  # number (the most frequent token)
            stack.append(m.group(2))
        elif kind == 1:  # literal string
            stack.append(m.group(1))
        elif kind == 3:  # name
            stack.append(None)
        else:
            tok = m.group(4)
            if tok == "Tj":
                show_top()
            elif tok == "TJ":
                # [(a) -250 (b)] TJ — brackets are not tokens, so the
                # stack holds the strings and kern numbers in order
                parts: list[str] = []
                for item in stack:
                    if isinstance(item, str) and item.startswith("("):
                        parts.append(lit(item))
                    elif item is not None:
                        try:
                            if float(item) <= -KERN_SPACE:
                                parts.append(" ")
                        except ValueError:
                            pass
                text = "".join(parts)
                if text:
                    runs.append((int(tx), flip(ty), text))
            elif tok == "TL":
                if stack:
                    try:
                        leading = float(stack[-1])
                    except (TypeError, ValueError):
                        pass
            elif tok == "T*":
                ty -= leading
            elif tok == "'":
                ty -= leading
                show_top()
            elif tok == "Tm":
                if len(stack) >= 6:
                    tx, ty = float(stack[-2]), float(stack[-1])
            elif tok == "Td":
                if len(stack) >= 2:
                    tx += float(stack[-2])
                    ty += float(stack[-1])
            elif tok == "m":
                if len(stack) >= 2:
                    path_pt = (float(stack[-2]), float(stack[-1]))
            elif tok == "l":
                if len(stack) >= 2 and path_pt is not None:
                    x1, y1 = path_pt
                    x2, y2 = float(stack[-2]), float(stack[-1])
                    pending_seg = (x1, y1, x2, y2)
                    path_pt = (x2, y2)
            elif tok == "S":
                if pending_seg is not None:
                    x1, y1, x2, y2 = pending_seg
                    seg = (int(x1), flip(y1), int(x2), flip(y2))
                    if seg[1] == seg[3]:
                        h_segs.append(seg)
                    else:
                        v_segs.append(seg)
                    pending_seg = None
                path_pt = None
            stack.clear()
    return {"runs": runs, "h": h_segs, "v": v_segs,
            "width": float(PAGE_W), "height": float(PAGE_H)}


_PAGE_OBJ_RE = re.compile(rb"/Type\s*/Page(?![a-zA-Z])")


def _page_rotations(blob: bytes) -> list[int]:
    """/Rotate values of the page objects in document order (reference
    get_page_info rotation metadata, src/pdf_reader.py:102-136)."""
    rotations = []
    for m in _PAGE_OBJ_RE.finditer(blob):
        obj = blob[m.start():blob.find(b"endobj", m.start())]
        r = re.search(rb"/Rotate\s+(-?\d+)", obj)
        rotations.append(int(r.group(1)) if r else 0)
    return rotations


def _decode_stream(obj_dict: bytes, data: bytes) -> str:
    """Apply /FlateDecode when declared; pass through otherwise. A
    corrupt deflate stream degrades to raw bytes (never raises)."""
    if b"/FlateDecode" in obj_dict:
        try:
            # decompressobj ignores the EOL padding PDF writers leave
            # between the deflate data and `endstream`
            data = zlib.decompressobj().decompress(data)
        except zlib.error:
            pass
    return data.decode("utf-8", errors="replace")


_LENGTH_RE = re.compile(rb"/Length\s+(\d+)")


def parse_minipdf(blob: bytes) -> list[dict]:
    """PDF bytes → per-page structs via the shared layout reconstruction."""
    pages_raw = []
    for m in _STREAM_RE.finditer(blob):
        obj_dict, data = m.group(1), m.group(2)
        lm = _LENGTH_RE.search(obj_dict)
        if lm:
            # authoritative byte count: binary (Flate) data may contain
            # the literal 'endstream', which the regex would stop at
            n = int(lm.group(1))
            data = blob[m.start(2): m.start(2) + n]
        pages_raw.append(_tokenize_stream(_decode_stream(obj_dict, data)))
    rotations = _page_rotations(blob)
    if len(rotations) == len(pages_raw):  # malformed trees default to 0
        for p, r in zip(pages_raw, rotations):
            p["rotation"] = r
    return assemble_pages(pages_raw)


# ---------------------------------------------------------------------------
# writer (used by the corpus generator)
# ---------------------------------------------------------------------------

def _escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def render_minipdf(
    pages_streams: list[str],
    rotations: list[int] | None = None,
    compress: bool = False,
) -> bytes:
    """Assemble a structurally valid PDF around per-page content streams
    (catalog, page tree, MediaBox, Length-tagged streams, xref, trailer).
    ``rotations`` optionally sets per-page /Rotate entries; ``compress``
    Flate-encodes the content streams (real-world writers' default)."""
    objects: list[bytes] = []
    n_pages = len(pages_streams)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objects.append(f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode())
    for i, content in enumerate(pages_streams):
        rot = rotations[i] if rotations else 0
        rot_entry = f"/Rotate {rot} " if rot else ""
        objects.append(
            (
                f"<< /Type /Page /Parent 2 0 R {rot_entry}/MediaBox [0 0 {PAGE_W} {PAGE_H}] "
                f"/Contents {4 + 2 * i} 0 R /Resources << /Font << /F1 {3 + 2 * n_pages} 0 R >> >> >>"
            ).encode()
        )
        data = content.encode("utf-8")
        if compress:
            data = zlib.compress(data)
            objects.append(
                b"<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream"
                % (len(data), data)
            )
        else:
            objects.append(
                b"<< /Length %d >>\nstream\n%s\nendstream" % (len(data), data)
            )
    objects.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, obj in enumerate(objects, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + obj + b"\nendobj\n"
    xref_pos = len(out)
    out += b"xref\n0 %d\n" % (len(objects) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objects) + 1, xref_pos)
    )
    return bytes(out)
