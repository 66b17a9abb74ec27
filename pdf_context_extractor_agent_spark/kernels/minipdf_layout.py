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

CID text (the encoding every real CJK PDF uses — reference dependency:
pdfplumber, src/pdf_reader.py:17-29) is supported through the
Identity-H + /ToUnicode path: hex show-strings ``<0001 0002> Tj`` carry
2-byte CIDs, the page's /Resources /Font dict routes ``/Fx`` names to
Type0 font objects, and each font's embedded /ToUnicode CMap stream
(bfchar + bfrange, scalar and array forms, optionally Flate-compressed)
maps CIDs to Unicode — including multi-code-unit UTF-16BE targets
(surrogate pairs). ``Tf`` switches the active font mid-stream. Fonts
without a ToUnicode CMap fall back to code=codepoint (true Identity).
When /Encoding is an embedded CMap STREAM (not the /Identity-H name),
its cidrange/cidchar entries add the code→CID layer — show-string hex
then carries codes, decoded code→CID→unicode, the full two-layer walk
real non-Identity CJK encodings require (its codespaceranges override
ToUnicode's, their canonical home per §9.7.5.3).

Simplifications vs full PDF (documented contract of the subset): one
content stream per page in document order, literal strings UTF-8.
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
      | (<[0-9A-Fa-f\s]*>)       # 2: hex string (CID show text)
      | ([-+]?\d+(?:\.\d+)?)     # 3: number
      | (/[A-Za-z0-9]+)          # 4: name
      | ([A-Za-z']{1,3}\*?)      # 5: operator
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


def _tokenize_stream(
    data: str,
    font_cmaps: dict[str, CMapTable] | None = None,
    font_widths: dict[str, "WidthTable"] | None = None,
) -> dict:
    """One content stream → {runs, h, v} in layout (top-down) coords.

    ``font_cmaps`` maps resource names ("/F2") to (ToUnicode CID→str
    table, codespace ranges); ``Tf`` selects the active table, hex
    show-strings decode through it (variable-byte codespace-driven
    codes, code=codepoint fallback).

    ``font_widths`` maps resource names to simple-font /Widths tables;
    when the active font carries one, every show operator advances the
    text position by the shown glyphs' widths × font size / 1000 (and
    TJ kern adjustments subtract adj/1000 × size), so consecutive
    shows with no intervening Tm/Td land where a metrics-aware
    renderer puts them. Fonts without /Widths keep the no-advance
    behavior (every show explicitly positioned).
    """
    runs: list[tuple[int, int, str]] = []
    h_segs: list[tuple[int, int, int, int]] = []
    v_segs: list[tuple[int, int, int, int]] = []
    stack: list = []
    tx = ty = 0.0          # current show position (text matrix, PDF coords)
    lx = ly = 0.0          # current LINE start (text line matrix): Td, T*
    #                        and ' translate THIS matrix (§9.4.2) — show
    #                        operators advance only tx, so a Td after a
    #                        metrics-advanced show must not inherit the
    #                        advance
    leading = 12.0         # TL text leading (T* / ' displacement)
    cur_cmap: CMapTable | None = None
    cur_widths: WidthTable | None = None
    cur_size = 10.0        # Tf size operand (scales /Widths advances)
    path_pt: tuple[float, float] | None = None
    pending_seg: tuple[float, float, float, float] | None = None

    def flip(y: float) -> int:
        return int(PAGE_H - y)

    def lit(tok: str) -> str:
        s = tok[1:-1]
        if "\\" in s:  # escape processing only when present
            s = _unescape(s)
        return s

    def hexs(tok: str) -> str:
        """<XXXX…> hex string → text, decoded through the active font's
        codespace ranges (variable byte length: e.g. 1-byte ASCII +
        2-byte CID regions) and its ToUnicode CMap; chr(code) when a
        code has no mapping (the Identity interpretation). Odd final
        digit pads with 0 (spec). Unmatched byte sequences consume the
        shortest declared code length — the spec's error recovery."""
        hx = "".join(tok[1:-1].split())
        if len(hx) % 2:
            hx += "0"
        bs = bytes.fromhex(hx)
        cmap, ranges, code2cid = (
            cur_cmap if cur_cmap else ({}, _DEFAULT_CODESPACE, None)
        )
        min_n = ranges[0][0]
        out = []
        i, L = 0, len(bs)
        while i < L:
            code, used = None, None
            for n, lo, hi in ranges:
                if i + n <= L:
                    c = int.from_bytes(bs[i:i + n], "big")
                    if lo <= c <= hi:
                        code, used = c, n
                        break
            if used is None:
                used = min(min_n, L - i)
                code = int.from_bytes(bs[i:i + used], "big")
            cid = _apply_code2cid(code, code2cid)
            mapped = cmap.get(cid)
            out.append(mapped if mapped is not None else chr(cid))
            i += used
        return "".join(out)

    def shown(tok: str) -> str:
        return lit(tok) if tok[0] == "(" else hexs(tok)

    def advance(text: str) -> None:
        """Move tx past ``text`` by the active simple font's metrics."""
        nonlocal tx
        if cur_widths is None:
            return
        first, widths, missing = cur_widths
        n = len(widths)
        total = 0
        for ch in text:
            i = ord(ch) - first
            total += widths[i] if 0 <= i < n else missing
        tx += total * cur_size / 1000.0

    def show_top() -> None:
        if stack and isinstance(stack[-1], str) and stack[-1][:1] in "(<":
            text = shown(stack[-1])
            runs.append((int(tx), flip(ty), text))
            advance(text)

    for m in _TOKEN_RE.finditer(data):
        kind = m.lastindex
        if kind == 3:  # number (the most frequent token)
            stack.append(m.group(3))
        elif kind == 1:  # literal string
            stack.append(m.group(1))
        elif kind == 2:  # hex string
            stack.append(m.group(2))
        elif kind == 4:  # name (kept verbatim: Tf reads it)
            stack.append(m.group(4))
        else:
            tok = m.group(5)
            if tok == "Tj":
                show_top()
            elif tok == "Tf":
                # /Fx size Tf — switch the active ToUnicode table and
                # width metrics; remember the size for advance scaling
                if len(stack) >= 2 and isinstance(stack[-2], str):
                    if font_cmaps:
                        cur_cmap = font_cmaps.get(stack[-2])
                    if font_widths:
                        cur_widths = font_widths.get(stack[-2])
                    else:
                        cur_widths = None
                    try:
                        cur_size = float(stack[-1])
                    except (TypeError, ValueError):
                        pass
            elif tok == "TJ":
                # [(a) -250 (b)] TJ — brackets are not tokens, so the
                # stack holds the strings and kern numbers in order
                parts: list[str] = []
                adv = 0.0  # total advance in 1/1000-em units × size
                for item in stack:
                    if isinstance(item, str) and item[:1] in "(<":
                        s = shown(item)
                        parts.append(s)
                        if cur_widths is not None:
                            first_c, widths_a, missing = cur_widths
                            nw = len(widths_a)
                            for ch in s:
                                i2 = ord(ch) - first_c
                                adv += widths_a[i2] if 0 <= i2 < nw else missing
                    elif item is not None and not (
                        isinstance(item, str) and item.startswith("/")
                    ):
                        try:
                            k = float(item)
                        except ValueError:
                            continue
                        if k <= -KERN_SPACE:
                            parts.append(" ")
                        # a TJ adjustment moves the glyph origin by
                        # -adj/1000 × size regardless of whether it
                        # rendered as a space (spec §9.4.3)
                        adv -= k
                text = "".join(parts)
                if text:
                    runs.append((int(tx), flip(ty), text))
                if cur_widths is not None:
                    tx += adv * cur_size / 1000.0
            elif tok == "TL":
                if stack:
                    try:
                        leading = float(stack[-1])
                    except (TypeError, ValueError):
                        pass
            elif tok == "T*":
                ly -= leading
                tx, ty = lx, ly
            elif tok == "'":
                ly -= leading
                tx, ty = lx, ly
                show_top()
            elif tok == "Tm":
                if len(stack) >= 6:
                    tx, ty = float(stack[-2]), float(stack[-1])
                    lx, ly = tx, ty
            elif tok == "Td":
                if len(stack) >= 2:
                    lx += float(stack[-2])
                    ly += float(stack[-1])
                    tx, ty = lx, ly
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


def _objstm_page_bodies(blob: bytes) -> list[bytes]:
    """Page-object bodies packed in /ObjStm streams, in pack order
    (the writer's page order; a full /Kids tree walk is unnecessary for
    the single-tree subset this kernel handles)."""
    return [
        body
        for body in _objstm_lookup_all(blob).values()
        if _PAGE_OBJ_RE.search(body)
    ]


def _page_rotations(blob: bytes) -> list[int]:
    """/Rotate values of the page objects in document order (reference
    get_page_info rotation metadata, src/pdf_reader.py:102-136)."""
    rotations = []
    objs = [
        blob[m.start(): blob.find(b"endobj", m.start())]
        for m in _PAGE_OBJ_RE.finditer(blob)
    ] or _objstm_page_bodies(blob)
    for obj in objs:
        r = re.search(rb"/Rotate\s+(-?\d+)", obj)
        rotations.append(int(r.group(1)) if r else 0)
    return rotations


# ---------------------------------------------------------------------------
# standard security handler (PDF 1.7 §7.6.3): RC4 decryption for
# empty-user-password files — the overwhelmingly common "encrypted"
# annual-report case pdfplumber opens silently (reference dep:
# src/pdf_reader.py:17-29; such files restrict printing/copying, not
# reading). AES (/V 4+) and password-protected files raise honestly.
# ---------------------------------------------------------------------------

# the spec's 32-byte password pad (§7.6.3.3 algorithm 2, step a)
_PW_PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
])


def _rc4(key: bytes, data: bytes) -> bytes:
    """Plain RC4 (the /V 1-2 stream cipher); length-preserving, so
    in-place stream decryption never perturbs xref offsets/Lengths."""
    S = list(range(256))
    j = 0
    kl = len(key)
    for i in range(256):
        j = (j + S[i] + key[i % kl]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for n, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[n] = c ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


_ENCRYPT_REF_RE = re.compile(rb"/Encrypt\s+(\d+)\s+0\s+R")
_ID_RE = re.compile(rb"/ID\s*\[\s*<([0-9A-Fa-f]*)>")
_HEXVAL_RE = {
    k: re.compile(rb"/" + k + rb"\s*<([0-9A-Fa-f]*)>")
    for k in (b"O", b"U")
}
_INTVAL_RE = {
    k: re.compile(rb"/" + k + rb"\s+(-?\d+)")
    for k in (b"V", b"R", b"P", b"Length")
}


def _encryption_key(blob: bytes) -> bytes | None:
    """File encryption key for an empty user password, or None when the
    file is unencrypted. Raises NotImplementedError for handlers this
    subset does not cover (AES, non-Standard filters) and ValueError
    when the empty password does not verify (a genuinely
    password-protected file — unreadable without secrets, like
    pdfplumber's PDFPasswordIncorrect)."""
    # only honor /Encrypt inside the TRAILER dict: matching it anywhere
    # would let an unencrypted document whose content stream merely
    # contains the text '/Encrypt N 0 R' trigger the decryption tier
    # and degrade to an empty page
    tp = blob.rfind(b"trailer")
    if tp < 0:
        return None  # xref-stream layouts in this subset are never encrypted
    em = _ENCRYPT_REF_RE.search(blob, tp)
    if em is None:
        return None
    loc = _object_slice(blob, int(em.group(1)))
    if loc is None:
        raise NotImplementedError("/Encrypt points at a missing object")
    ed = loc[1]
    if b"/Standard" not in ed:
        raise NotImplementedError("non-Standard security handler")
    ints = {
        k.decode(): (int(m.group(1)) if (m := _INTVAL_RE[k].search(ed)) else None)
        for k in _INTVAL_RE
    }
    v, r = ints["V"] or 1, ints["R"] or 2
    if v not in (1, 2) or r not in (2, 3):
        raise NotImplementedError(f"encryption V={v} R={r} (RC4 V1/V2 only)")
    om = _HEXVAL_RE[b"O"].search(ed)
    um = _HEXVAL_RE[b"U"].search(ed)
    if om is None or um is None:
        raise NotImplementedError("/O //U not in hex-string form")
    o_val = bytes.fromhex(om.group(1).decode())
    u_val = bytes.fromhex(um.group(1).decode())
    p = ints["P"] if ints["P"] is not None else -1
    n = (ints["Length"] or 40) // 8
    idm = _ID_RE.search(blob)
    id0 = bytes.fromhex(idm.group(1).decode()) if idm else b""
    import hashlib

    h = hashlib.md5(
        _PW_PAD + o_val + (p & 0xFFFFFFFF).to_bytes(4, "little") + id0
    ).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h[:n]).digest()
    key = h[:n]
    # verify the empty user password (algorithm 6): R2 compares RC4 of
    # the pad; R3 compares the first 16 bytes of the double-hash form
    if r == 2:
        ok = _rc4(key, _PW_PAD) == u_val
    else:
        chk = hashlib.md5(_PW_PAD + id0).digest()
        for i in range(20):
            chk = _rc4(bytes(b ^ i for b in key), chk)
        ok = chk == u_val[:16]
    if not ok:
        raise ValueError("PDF is password-protected (empty password rejected)")
    return key


def _object_key(key: bytes, num: int, gen: int = 0) -> bytes:
    import hashlib

    return hashlib.md5(
        key + num.to_bytes(3, "little") + gen.to_bytes(2, "little")
    ).digest()[: min(len(key) + 5, 16)]


_TOPOBJ_RE = re.compile(rb"(?<![0-9])(\d+)\s+(\d+)\s+obj\b")


def decrypt_pdf(blob: bytes) -> bytes:
    """qpdf-style whole-file decrypt: every top-level stream body is
    RC4-decrypted in place with its per-object key. RC4 preserves
    length, so offsets, /Length values and the xref stay valid and the
    rest of the parser runs untouched. No-op for unencrypted files."""
    key = _encryption_key(blob)
    if key is None:
        return blob
    out = bytearray(blob)
    for m in _TOPOBJ_RE.finditer(blob):
        num, gen = int(m.group(1)), int(m.group(2))
        endobj = blob.find(b"endobj", m.end())
        sm = _STREAM_RE.search(blob, m.end())
        if sm is None or (0 <= endobj < sm.start()):
            continue  # this object carries no stream
        start = sm.start(2)
        n = _stream_length(sm.group(1), blob)
        ln = n if n is not None else len(sm.group(2))
        out[start:start + ln] = _rc4(
            _object_key(key, num, gen), blob[start:start + ln]
        )
    # drop the /Encrypt reference IN THE TRAILER (decrypted content may
    # legitimately contain the same byte run): the bytes are plaintext now
    tp = blob.rfind(b"trailer")
    return bytes(out[:tp]) + bytes(out[tp:]).replace(b"/Encrypt", b"/Decrypt", 1)


def _decode_stream_bytes(obj_dict: bytes, data: bytes) -> bytes:
    """Apply /FlateDecode when declared; pass through otherwise. A
    corrupt deflate stream degrades to raw bytes (never raises)."""
    if b"/FlateDecode" in obj_dict:
        try:
            # decompressobj ignores the EOL padding PDF writers leave
            # between the deflate data and `endstream`
            data = zlib.decompressobj().decompress(data)
        except zlib.error:
            pass
    return data


def _decode_stream(obj_dict: bytes, data: bytes) -> str:
    return _decode_stream_bytes(obj_dict, data).decode("utf-8", errors="replace")


# direct /Length only: the (?![0-9]) stops backtracking from shaving
# digits off an indirect reference ('/Length 80 0 R' must NOT parse as
# 8), and the trailing lookahead rejects the indirect 'N g R' form
# outright — indirect lengths resolve through _stream_length below
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?![0-9])(?!\s+\d+\s+R)")
_LENGTH_REF_RE = re.compile(rb"/Length\s+(\d+)\s+\d+\s+R")
_INT_RE = re.compile(rb"(\d+)")


def _stream_length(obj_dict: bytes, blob: bytes | None = None) -> int | None:
    """Declared stream length: direct value, or — when ``blob`` is
    given — an indirect '/Length N g R' reference resolved through the
    object scan (Acrobat/Distiller writers routinely indirect it)."""
    lm = _LENGTH_RE.search(obj_dict)
    if lm is not None:
        return int(lm.group(1))
    if blob is not None:
        rm = _LENGTH_REF_RE.search(obj_dict)
        if rm is not None:
            loc = _object_slice(blob, int(rm.group(1)))
            if loc is not None:
                im = _INT_RE.search(loc[1])
                if im is not None:
                    return int(im.group(1))
    return None


_CONTENTS_RE = re.compile(rb"/Contents\s+(\d+)\s+0\s+R")
_FONT_RES_RE = re.compile(rb"/Font\s*<<((?:[^<>]|<[^<][^>]*>)*)>>")
_FONT_REF_RE = re.compile(rb"/([A-Za-z][A-Za-z0-9]*)\s+(\d+)\s+0\s+R")
_TOUNICODE_RE = re.compile(rb"/ToUnicode\s+(\d+)\s+0\s+R")
# /Encoding as an indirect STREAM ref (embedded CMap); the /Identity-H
# name form deliberately does not match
_ENCODING_REF_RE = re.compile(rb"/Encoding\s+(\d+)\s+0\s+R")
_FIRSTCHAR_RE = re.compile(rb"/FirstChar\s+(\d+)")
_WIDTHS_RE = re.compile(rb"/Widths\s*\[([^\]]*)\]")
_WIDTHS_REF_RE = re.compile(rb"/Widths\s+(\d+)\s+0\s+R")
_WIDTHS_ARR_RE = re.compile(rb"\[([^\]]*)\]")

# ToUnicode CMap syntax (PDF 32000 §9.10.3): bfchar pairs and bfrange
# triples, the range destination either a scalar start or an array
_BFCHAR_RE = re.compile(r"beginbfchar(.*?)endbfchar", re.S)
_CODESPACE_RE = re.compile(r"begincodespacerange(.*?)endcodespacerange", re.S)
_BFRANGE_RE = re.compile(r"beginbfrange(.*?)endbfrange", re.S)
_HEX_PAIR_RE = re.compile(r"<([0-9A-Fa-f\s]+)>\s*<([0-9A-Fa-f\s]+)>")
_BFRANGE_ITEM_RE = re.compile(
    r"<([0-9A-Fa-f\s]+)>\s*<([0-9A-Fa-f\s]+)>\s*"
    r"(?:<([0-9A-Fa-f\s]+)>|\[((?:\s*<[0-9A-Fa-f\s]+>)+)\s*\])"
)


# an Identity-H CMap without an explicit codespacerange: uniform
# 2-byte codes (PDF 32000 §9.7.5.2)
_DEFAULT_CODESPACE: tuple[tuple[int, int, int], ...] = ((2, 0x0000, 0xFFFF),)

# (cid→unicode map, codespace ranges (nbytes, lo, hi) sorted shortest-first,
#  code→CID mapping from an embedded /Encoding CMap — None = Identity-H,
#  else ({code: cid} singles, ((lo, hi, cid0), …) ranges))
CMapTable = tuple  # tuple[dict[int, str], tuple[...], tuple | None]

Code2Cid = tuple  # tuple[dict[int, int], tuple[tuple[int, int, int], ...]]


def _apply_code2cid(code: int, code2cid: Code2Cid | None) -> int:
    """Embedded-/Encoding CMap lookup: cidchar singles first, then
    cidrange offsets; unmapped codes pass through (Identity — the
    spec's behavior for codes outside every cidrange is .notdef, but
    pass-through keeps hand-rolled fragments readable)."""
    if code2cid is None:
        return code
    singles, ranges = code2cid
    cid = singles.get(code)
    if cid is not None:
        return cid
    for lo, hi, cid0 in ranges:
        if lo <= code <= hi:
            return cid0 + (code - lo)
    return code


def _parse_tounicode(text: str) -> CMapTable:
    """ToUnicode CMap body → ({CID: unicode string}, codespace ranges).

    Destinations are UTF-16BE hex (multi-code-unit targets — surrogate
    pairs — decode to one Python string); bfrange scalar form increments
    the LAST code unit across the range (spec behavior). Codespace
    ranges carry the BYTE LENGTH of each code region (§9.7.6.2) —
    real CJK encodings mix 1-byte ASCII codes with 2-byte CID codes, so
    show-string decoding must be range-driven, not fixed-width; absent
    ranges default to uniform 2-byte Identity-H."""
    def _u(hx: str) -> str:
        hx = "".join(hx.split())
        try:
            return bytes.fromhex(hx).decode("utf-16-be", errors="replace")
        except ValueError:
            return ""

    def _code(hx: str) -> int:
        return int("".join(hx.split()), 16)

    cmap: dict[int, str] = {}
    for block in _BFRANGE_RE.findall(text):
        for lo_h, hi_h, dst_h, arr_h in _BFRANGE_ITEM_RE.findall(block):
            lo, hi = _code(lo_h), _code(hi_h)
            if arr_h:
                dsts = re.findall(r"<([0-9A-Fa-f\s]+)>", arr_h)
                for i, d in enumerate(dsts[: hi - lo + 1]):
                    cmap[lo + i] = _u(d)
            else:
                base = _u(dst_h)
                if not base:
                    continue
                last = ord(base[-1])
                for c in range(lo, min(hi, lo + 0xFFFF) + 1):
                    cmap[c] = base[:-1] + chr(last + (c - lo))
    for block in _BFCHAR_RE.findall(text):
        for src, dst in _HEX_PAIR_RE.findall(block):
            cmap[_code(src)] = _u(dst)
    return cmap, _parse_codespaces(text) or _DEFAULT_CODESPACE, None


def _parse_codespaces(text: str) -> tuple[tuple[int, int, int], ...]:
    ranges: list[tuple[int, int, int]] = []
    for block in _CODESPACE_RE.findall(text):
        for lo_h, hi_h in _HEX_PAIR_RE.findall(block):
            nbytes = max(1, len("".join(lo_h.split())) // 2)
            ranges.append((nbytes, int("".join(lo_h.split()), 16),
                           int("".join(hi_h.split()), 16)))
    ranges.sort()
    return tuple(ranges)


# embedded /Encoding CMap syntax (PDF 32000 §9.7.5.3): cidchar pairs and
# cidrange triples — destinations are DECIMAL CIDs, unlike ToUnicode's hex
_CIDRANGE_RE = re.compile(r"begincidrange(.*?)endcidrange", re.S)
_CIDCHAR_RE = re.compile(r"begincidchar(.*?)endcidchar", re.S)
_CIDRANGE_ITEM_RE = re.compile(r"<([0-9A-Fa-f\s]+)>\s*<([0-9A-Fa-f\s]+)>\s*(\d+)")
_CIDCHAR_ITEM_RE = re.compile(r"<([0-9A-Fa-f\s]+)>\s*(\d+)")


def _parse_encoding_cmap(
    text: str,
) -> tuple[Code2Cid | None, tuple[tuple[int, int, int], ...]]:
    """Embedded /Encoding CMap body → (code→CID mapping, codespaces).

    This is the layer real non-Identity CJK PDFs route through: the
    show-string carries CODES, the Encoding CMap maps codes to CIDs
    (cidrange offset runs + cidchar singles), and only then does
    /ToUnicode map CIDs to text. Codespaceranges canonically live HERE
    (§9.7.5.3) — when present they override the ToUnicode ones."""
    def _code(hx: str) -> int:
        return int("".join(hx.split()), 16)

    singles: dict[int, int] = {}
    ranges: list[tuple[int, int, int]] = []
    for block in _CIDRANGE_RE.findall(text):
        for lo_h, hi_h, cid0 in _CIDRANGE_ITEM_RE.findall(block):
            ranges.append((_code(lo_h), _code(hi_h), int(cid0)))
    for block in _CIDCHAR_RE.findall(text):
        for src_h, cid in _CIDCHAR_ITEM_RE.findall(block):
            singles[_code(src_h)] = int(cid)
    code2cid = (singles, tuple(ranges)) if (singles or ranges) else None
    return code2cid, _parse_codespaces(text)


_OBJSTM_N_RE = re.compile(rb"/N\s+(\d+)")
_OBJSTM_FIRST_RE = re.compile(rb"/First\s+(\d+)")


def _iter_streams(blob: bytes):
    """Yield (obj_dict, raw stream bytes, end pos) for every stream in
    document order, /Length authoritative — the same manual-resume scan
    parse_minipdf's fallback path uses (a lazy regex alone stops at a
    literal 'endstream' INSIDE binary Flate data)."""
    pos = 0
    while True:
        m = _STREAM_RE.search(blob, pos)
        if m is None:
            return
        obj_dict, data = m.group(1), m.group(2)
        pos = m.end()
        n = _stream_length(obj_dict, blob)
        if n is not None:
            data = blob[m.start(2): m.start(2) + n]
            end = blob.find(b"endstream", m.start(2) + n)
            pos = end + len(b"endstream") if end >= 0 else len(blob)
        yield obj_dict, data, pos


def _objstm_index(blob: bytes) -> dict[int, bytes]:
    """Object-stream (PDF 1.5 §7.5.7) index: {objnum: body bytes} for
    every object packed inside a /Type /ObjStm stream — the layout
    every modern real-world writer emits (dict-type objects compressed
    together; content/CMap streams stay top-level by spec). The stream
    body is ``num₁ off₁ num₂ off₂ …`` header pairs, then the object
    bodies starting at /First, offsets relative to it.

    Cached per blob: object resolution is called per font/page and the
    index costs one Flate pass (bytes hashes memoize in CPython, so the
    lru key is cheap after the first call)."""
    idx: dict[int, bytes] = {}
    if b"/ObjStm" not in blob:
        return idx
    for obj_dict, data, _ in _iter_streams(blob):
        if b"/ObjStm" not in obj_dict:
            continue
        nm, fm = _OBJSTM_N_RE.search(obj_dict), _OBJSTM_FIRST_RE.search(obj_dict)
        if nm is None or fm is None:
            continue
        body = _decode_stream_bytes(obj_dict, data)
        n, first = int(nm.group(1)), int(fm.group(1))
        toks = body[:first].split()
        pairs = [
            (int(toks[2 * i]), int(toks[2 * i + 1]))
            for i in range(min(n, len(toks) // 2))
        ]
        for i, (num, off) in enumerate(pairs):
            end = pairs[i + 1][1] if i + 1 < len(pairs) else len(body) - first
            idx[num] = body[first + off: first + end]
    return idx


# tiny per-blob memo for the ObjStm index: parse_minipdf resolves many
# objects against the same blob sequentially, and tasks process docs
# one at a time, so a 4-slot cache gives hit-rate ≈ 1 with no footprint
_OBJSTM_CACHE: dict[int, tuple[bytes, dict[int, bytes]]] = {}


def _objstm_lookup_all(blob: bytes) -> dict[int, bytes]:
    slot = hash(blob) & 3
    hit = _OBJSTM_CACHE.get(slot)
    if hit is None or hit[0] is not blob:
        hit = (blob, _objstm_index(blob))
        _OBJSTM_CACHE[slot] = hit
    return hit[1]


def _objstm_lookup(blob: bytes, num: int) -> bytes | None:
    return _objstm_lookup_all(blob).get(num)


def _object_slice(blob: bytes, num: int) -> tuple[int, bytes] | None:
    """(start offset, bytes) of ``num 0 obj … endobj``; None if absent.
    The endobj bound is advisory only (stream bodies may contain the
    literal) — callers that read streams re-bound via /Length. Objects
    not at the top level resolve through the ObjStm index (offset -1:
    packed objects have no top-level position)."""
    m = re.search(rb"(?<![0-9])" + str(num).encode() + rb"\s+0\s+obj\b", blob)
    if m is None:
        body = _objstm_lookup(blob, num)
        return (-1, body) if body is not None else None
    end = blob.find(b"endobj", m.end())
    return m.end(), blob[m.end(): end if end >= 0 else len(blob)]


def _object_stream(blob: bytes, num: int) -> tuple[bytes, bytes] | None:
    """(dict bytes, raw stream bytes) of object ``num``, /Length
    authoritative when declared (binary data may contain 'endstream')."""
    loc = _object_slice(blob, num)
    if loc is None or loc[0] < 0:
        # ObjStm-packed objects carry no stream by spec (§7.5.7)
        return None
    start, _ = loc
    m = _STREAM_RE.search(blob, start)
    if m is None:
        return None
    obj_dict, data = m.group(1), m.group(2)
    n = _stream_length(obj_dict, blob)
    if n is not None:
        data = blob[m.start(2): m.start(2) + n]
    return obj_dict, data


_EMPTY_CMAP: CMapTable = ({}, _DEFAULT_CODESPACE, None)


def _font_cmap(blob: bytes, font_num: int) -> CMapTable:
    """Resolve a font object's CMap layers: /ToUnicode (CID → text) and,
    when /Encoding is an embedded CMap STREAM rather than the
    /Identity-H name, the code → CID layer too. Encoding-CMap
    codespaceranges override ToUnicode's (§9.7.5.3 — that is their
    canonical home). Empty table when neither is declared (simple
    fonts, or Identity without a mapping)."""
    loc = _object_slice(blob, font_num)
    if loc is None:
        return _EMPTY_CMAP
    cid2uni, spaces, _ = _EMPTY_CMAP
    tm = _TOUNICODE_RE.search(loc[1])
    if tm is not None:
        s = _object_stream(blob, int(tm.group(1)))
        if s is not None:
            cid2uni, spaces, _ = _parse_tounicode(_decode_stream(*s))
    code2cid = None
    em = _ENCODING_REF_RE.search(loc[1])
    if em is not None:
        s = _object_stream(blob, int(em.group(1)))
        if s is not None:
            code2cid, enc_spaces = _parse_encoding_cmap(_decode_stream(*s))
            if enc_spaces:
                spaces = enc_spaces
    return cid2uni, spaces, code2cid


def _page_font_cmaps(blob: bytes, page_obj: bytes,
                     cache: dict[int, CMapTable]) -> dict[str, CMapTable]:
    """Page /Resources /Font dict → {"/Fx": cmap table} for fonts that
    carry a ToUnicode table, a non-default codespace, or an embedded
    Encoding CMap (fonts with none stay absent → Identity path)."""
    fm = _FONT_RES_RE.search(page_obj)
    if fm is None:
        return {}
    out: dict[str, CMapTable] = {}
    for name, fnum in _FONT_REF_RE.findall(fm.group(1)):
        fnum = int(fnum)
        if fnum not in cache:
            cache[fnum] = _font_cmap(blob, fnum)
        cid2uni, spaces, code2cid = cache[fnum]
        if cid2uni or spaces != _DEFAULT_CODESPACE or code2cid is not None:
            out["/" + name.decode("ascii")] = cache[fnum]
    return out


# glyph-width table of a SIMPLE (non-CID Type1/TrueType) embedded font:
# (first_char, widths-per-code, missing_width).  Units are 1/1000 em,
# the /Widths convention; codes outside [first, first+len) take the
# missing width (spec default 0 — /MissingWidth lives in the
# FontDescriptor, outside this subset's contract).
WidthTable = tuple[int, tuple[int, ...], int]


def _font_widths(blob: bytes, font_num: int) -> WidthTable | None:
    """``/FirstChar``/``/Widths`` metrics of a simple font object, or
    None when the font declares neither (CID fonts carry /W instead;
    the built-in 14 carry nothing — both keep the no-advance path).

    This is the non-CID half of pdfplumber's glyph-metric handling
    (reference dep: src/pdf_reader.py:17-29): successive show-runs with
    no intervening Tm/Td are positioned purely by these advances, so a
    kernel that ignores them mis-places every run after the first."""
    loc = _object_slice(blob, font_num)
    if loc is None:
        return None
    fm = _FIRSTCHAR_RE.search(loc[1])
    if fm is None:
        return None
    wm = _WIDTHS_RE.search(loc[1])
    if wm is None:
        # real writers frequently indirect the array: /Widths 12 0 R
        rm = _WIDTHS_REF_RE.search(loc[1])
        if rm is None:
            return None
        wloc = _object_slice(blob, int(rm.group(1)))
        if wloc is None:
            return None
        wm = _WIDTHS_ARR_RE.search(wloc[1])
        if wm is None:
            return None
    try:
        widths = tuple(int(float(t)) for t in wm.group(1).split())
    except ValueError:
        return None
    return int(fm.group(1)), widths, 0


def _page_font_widths(blob: bytes, page_obj: bytes,
                      cache: dict[int, WidthTable | None]) -> dict[str, WidthTable]:
    """Page /Resources /Font dict → {"/Fx": width table} for simple
    fonts that declare /FirstChar + /Widths."""
    fm = _FONT_RES_RE.search(page_obj)
    if fm is None:
        return {}
    out: dict[str, WidthTable] = {}
    for name, fnum in _FONT_REF_RE.findall(fm.group(1)):
        fnum = int(fnum)
        if fnum not in cache:
            cache[fnum] = _font_widths(blob, fnum)
        wt = cache[fnum]
        if wt is not None:
            out["/" + name.decode("ascii")] = wt
    return out


def parse_minipdf(blob: bytes) -> list[dict]:
    """PDF bytes → per-page structs via the shared layout reconstruction.

    Structured path: walk /Type /Page objects in document order and
    resolve each page's /Contents stream by object reference — so
    non-content streams (ToUnicode CMaps, XObjects) are never mistaken
    for pages — threading the page's font CMaps into the tokenizer.
    Blobs without a resolvable page tree (truncated or hand-rolled
    fragments) fall back to scanning every stream as a page.
    """
    # tier 0: strip standard-handler RC4 encryption (empty password) so
    # every later stage sees plaintext — offsets unchanged (RC4
    # preserves length), no other code path knows encryption exists
    blob = decrypt_pdf(blob)
    pages_raw = []
    page_objs: list[tuple[int | None, bytes]] = []
    for m in _PAGE_OBJ_RE.finditer(blob):
        end = blob.find(b"endobj", m.start())
        obj = blob[m.start(): end if end >= 0 else len(blob)]
        cm = _CONTENTS_RE.search(obj)
        page_objs.append((int(cm.group(1)) if cm else None, obj))
    if not page_objs:
        # PDF 1.5 layout: page dicts live inside /ObjStm object streams
        # (the modern writers' default) — walk the unpacked index in
        # stream order; content streams stay top-level by spec
        for obj in _objstm_page_bodies(blob):
            cm = _CONTENTS_RE.search(obj)
            page_objs.append((int(cm.group(1)) if cm else None, obj))

    structured = bool(page_objs) and all(c is not None for c, _ in page_objs)
    if structured:
        font_cache: dict[int, CMapTable] = {}
        width_cache: dict[int, WidthTable | None] = {}
        for contents_num, obj in page_objs:
            s = _object_stream(blob, contents_num)
            if s is None:
                structured = False
                pages_raw = []
                break
            cmaps = _page_font_cmaps(blob, obj, font_cache)
            widths = _page_font_widths(blob, obj, width_cache)
            pages_raw.append(
                _tokenize_stream(
                    _decode_stream(*s), cmaps or None, widths or None
                )
            )

    if not structured:
        pos = 0
        while True:
            # manual scan (not finditer): after a /Length override the true
            # stream end can lie PAST the regex's lazy 'endstream' match, and
            # a resumed finditer would re-enter the residual binary bytes —
            # where a spurious '<<...>>stream' can emit a garbage page
            m = _STREAM_RE.search(blob, pos)
            if m is None:
                break
            obj_dict, data = m.group(1), m.group(2)
            pos = m.end()
            n = _stream_length(obj_dict, blob)
            if n is not None:
                # authoritative byte count: binary (Flate) data may contain
                # the literal 'endstream', which the regex would stop at
                data = blob[m.start(2): m.start(2) + n]
                end = blob.find(b"endstream", m.start(2) + n)
                pos = end + len(b"endstream") if end >= 0 else len(blob)
            # non-content streams are never pages: ObjStm/XRef carry
            # packed objects or binary xref rows, CMap streams carry
            # /CIDInit procsets — tokenizing any of them emits garbage
            if (
                b"/ObjStm" in obj_dict
                or b"/XRef" in obj_dict
                or b"CIDInit" in data[:64]
            ):
                continue
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


def cid_hex(s: str, cid_of: dict[str, int], nbytes_of: dict[str, int] | None = None) -> str:
    """Text → ``<XXXX…>`` hex show-string via a char→CID map.
    ``nbytes_of`` gives each char's code byte length (mixed-codespace
    encodings); absent → uniform 2-byte Identity-H."""
    if nbytes_of is None:
        return "<" + "".join(f"{cid_of[c]:04X}" for c in s) + ">"
    return "<" + "".join(f"{cid_of[c]:0{2 * nbytes_of[c]}X}" for c in s) + ">"


def tounicode_cmap(
    cmap: dict[int, str],
    codespace: list[tuple[int, int, int]] | None = None,
) -> str:
    """{CID: unicode} → a ToUnicode CMap stream body. Contiguous
    CID-runs whose (single-BMP-char) targets are also contiguous
    compress to bfrange entries; everything else is bfchar — so a
    generated document exercises both parser paths. Blocks are capped at
    100 entries (spec limit). ``codespace`` emits explicit
    codespacerange entries (nbytes, lo, hi) — mixed 1-/2-byte regions —
    and each bf entry's source hex is formatted at its region's byte
    width; absent → the uniform 2-byte Identity-H declaration."""
    def _hx(s: str) -> str:
        return s.encode("utf-16-be").hex().upper()

    cs = codespace or [(2, 0x0000, 0xFFFF)]

    def _w(code: int) -> int:
        for n, lo, hi in cs:
            if lo <= code <= hi:
                return n
        return 2

    def _src(code: int) -> str:
        return f"{code:0{2 * _w(code)}X}"

    ranges: list[tuple[int, int, str]] = []       # (lo, hi, dst_start)
    chars: list[tuple[int, str]] = []
    for cid in sorted(cmap):
        dst = cmap[cid]
        if (
            ranges
            and ranges[-1][1] == cid - 1
            and len(ranges[-1][2]) == 1
            and len(dst) == 1
            and ord(dst) == ord(ranges[-1][2]) + (cid - ranges[-1][0])
            and (cid & 0xFF) != 0  # don't span the low-byte wrap
            and _w(cid) == _w(ranges[-1][0])  # nor a codespace width change
        ):
            lo, _, d0 = ranges[-1]
            ranges[-1] = (lo, cid, d0)
        elif len(dst) == 1:
            ranges.append((cid, cid, dst))
        else:
            chars.append((cid, dst))
    # singleton "ranges" read better (and parse) as bfchar entries
    chars.extend((lo, d) for lo, hi, d in ranges if lo == hi)
    ranges = [r for r in ranges if r[0] != r[1]]
    chars.sort()

    parts = [
        "/CIDInit /ProcSet findresource begin",
        "12 dict begin",
        "begincmap",
        "/CIDSystemInfo << /Registry (Adobe) /Ordering (UCS) /Supplement 0 >> def",
        "/CMapName /Adobe-Identity-UCS def",
        "/CMapType 2 def",
        f"{len(cs)} begincodespacerange",
        *[f"<{lo:0{2 * n}X}> <{hi:0{2 * n}X}>" for n, lo, hi in cs],
        "endcodespacerange",
    ]
    for i in range(0, len(ranges), 100):
        chunk = ranges[i:i + 100]
        parts.append(f"{len(chunk)} beginbfrange")
        for lo, hi, d0 in chunk:
            parts.append(f"<{_src(lo)}> <{_src(hi)}> <{_hx(d0)}>")
        parts.append("endbfrange")
    for i in range(0, len(chars), 100):
        chunk = chars[i:i + 100]
        parts.append(f"{len(chunk)} beginbfchar")
        for cid, d in chunk:
            parts.append(f"<{_src(cid)}> <{_hx(d)}>")
        parts.append("endbfchar")
    parts += [
        "endcmap",
        "CMapName currentdict /CMap defineresource pop",
        "end",
        "end",
    ]
    return "\n".join(parts)


def encoding_cmap(
    code2cid: dict[int, int],
    codespace: list[tuple[int, int, int]] | None = None,
) -> str:
    """{code: CID} → an embedded /Encoding CMap stream body (CMapType 1).
    Contiguous code runs with contiguous CIDs compress to cidrange
    triples (decimal CID start, per spec); everything else is cidchar —
    so a generated document exercises both parser paths. Blocks capped
    at 100 entries (spec limit)."""
    cs = codespace or [(2, 0x0000, 0xFFFF)]

    def _w(code: int) -> int:
        for n, lo, hi in cs:
            if lo <= code <= hi:
                return n
        return 2

    def _src(code: int) -> str:
        return f"{code:0{2 * _w(code)}X}"

    ranges: list[tuple[int, int, int]] = []      # (lo, hi, cid_start)
    chars: list[tuple[int, int]] = []
    for code in sorted(code2cid):
        cid = code2cid[code]
        if (
            ranges
            and ranges[-1][1] == code - 1
            and cid == ranges[-1][2] + (code - ranges[-1][0])
            and (code & 0xFF) != 0  # don't span the low-byte wrap
            and _w(code) == _w(ranges[-1][0])
        ):
            lo, _, c0 = ranges[-1]
            ranges[-1] = (lo, code, c0)
        else:
            ranges.append((code, code, cid))
    chars.extend((lo, c0) for lo, hi, c0 in ranges if lo == hi)
    ranges = [r for r in ranges if r[0] != r[1]]
    chars.sort()

    parts = [
        "/CIDInit /ProcSet findresource begin",
        "12 dict begin",
        "begincmap",
        "/CIDSystemInfo << /Registry (Test) /Ordering (Scrambled) /Supplement 0 >> def",
        "/CMapName /Test-Scrambled-H def",
        "/CMapType 1 def",
        f"{len(cs)} begincodespacerange",
        *[f"<{lo:0{2 * n}X}> <{hi:0{2 * n}X}>" for n, lo, hi in cs],
        "endcodespacerange",
    ]
    for i in range(0, len(ranges), 100):
        chunk = ranges[i:i + 100]
        parts.append(f"{len(chunk)} begincidrange")
        for lo, hi, c0 in chunk:
            parts.append(f"<{_src(lo)}> <{_src(hi)}> {c0}")
        parts.append("endcidrange")
    for i in range(0, len(chars), 100):
        chunk = chars[i:i + 100]
        parts.append(f"{len(chunk)} begincidchar")
        for code, cid in chunk:
            parts.append(f"<{_src(code)}> {cid}")
        parts.append("endcidchar")
    parts += [
        "endcmap",
        "CMapName currentdict /CMap defineresource pop",
        "end",
        "end",
    ]
    return "\n".join(parts)


def render_minipdf(
    pages_streams: list[str],
    rotations: list[int] | None = None,
    compress: bool = False,
    cid_cmap: dict[int, str] | None = None,
    compress_cmap: bool = False,
    cid_codespace: list[tuple[int, int, int]] | None = None,
    cid_encoding: dict[int, int] | None = None,
    objstm: bool = False,
    simple_widths: tuple[int, list[int]] | None = None,
    encrypt: bool = False,
) -> bytes:
    """Assemble a structurally valid PDF around per-page content streams
    (catalog, page tree, MediaBox, Length-tagged streams, xref, trailer).
    ``rotations`` optionally sets per-page /Rotate entries; ``compress``
    Flate-encodes the content streams (real-world writers' default).
    ``cid_cmap`` ({CID: unicode}) adds an Identity-H Type0 font ``/F2``
    with an embedded /ToUnicode CMap stream (Flate'd when
    ``compress_cmap``) — content streams may then show text as
    ``/F2 … Tf <hex> Tj`` (see ``cid_hex``). ``cid_encoding``
    ({code: CID}) additionally routes /F2's /Encoding through an
    embedded CMap stream object (cidrange/cidchar) instead of the
    /Identity-H name — show-string hex then carries CODES, not CIDs.
    ``objstm=True`` emits the PDF 1.5 layout modern writers default to:
    every dict-type object (catalog, page tree, page dicts, fonts)
    packs into one Flate'd /ObjStm object stream, content/CMap streams
    stay top-level (§7.5.7 forbids streams in ObjStm), and the classic
    xref table + trailer are replaced by a binary cross-reference
    STREAM with type-2 (packed) entries (§7.5.8)."""
    objects: list[bytes] = []
    n_pages = len(pages_streams)
    f1_num = 3 + 2 * n_pages
    font_res = f"/F1 {f1_num} 0 R"
    if cid_cmap is not None:
        font_res += f" /F2 {f1_num + 1} 0 R"
    if simple_widths is not None:
        # /F3 lands after every CID-related object (F2 + its CMap
        # stream(s)) so existing object numbering is untouched
        f3_num = f1_num + 1
        if cid_cmap is not None:
            f3_num += 2 + (1 if cid_encoding is not None else 0)
        font_res += f" /F3 {f3_num} 0 R"
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objects.append(f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode())
    for i, content in enumerate(pages_streams):
        rot = rotations[i] if rotations else 0
        rot_entry = f"/Rotate {rot} " if rot else ""
        objects.append(
            (
                f"<< /Type /Page /Parent 2 0 R {rot_entry}/MediaBox [0 0 {PAGE_W} {PAGE_H}] "
                f"/Contents {4 + 2 * i} 0 R /Resources << /Font << {font_res} >> >> >>"
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
    if cid_cmap is not None:
        enc = (
            "/Identity-H"
            if cid_encoding is None
            else f"{f1_num + 3} 0 R"
        )
        objects.append(
            (
                f"<< /Type /Font /Subtype /Type0 /BaseFont /STSong-Identity-H "
                f"/Encoding {enc} /ToUnicode {f1_num + 2} 0 R >>"
            ).encode()
        )

        def _cmap_stream(body: str) -> bytes:
            cm = body.encode("utf-8")
            if compress_cmap:
                cm = zlib.compress(cm)
                return (
                    b"<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream"
                    % (len(cm), cm)
                )
            return b"<< /Length %d >>\nstream\n%s\nendstream" % (len(cm), cm)

        objects.append(_cmap_stream(tounicode_cmap(cid_cmap, cid_codespace)))
        if cid_encoding is not None:
            objects.append(
                _cmap_stream(encoding_cmap(cid_encoding, cid_codespace))
            )
    if simple_widths is not None:
        first_char, widths = simple_widths
        objects.append(
            (
                f"<< /Type /Font /Subtype /TrueType /BaseFont /ArialMT "
                f"/FirstChar {first_char} /LastChar {first_char + len(widths) - 1} "
                f"/Widths [{' '.join(str(w) for w in widths)}] >>"
            ).encode()
        )

    if objstm:
        if encrypt:
            raise ValueError("encrypt is classic-layout only (xref streams "
                             "must stay plaintext per §7.5.8.2)")
        return _assemble_objstm(objects)

    trailer_extra = b""
    if encrypt:
        # standard security handler, R2/V1 (40-bit RC4), empty user and
        # owner passwords, all permissions — the "restrict printing, not
        # reading" shape real encrypted annual reports use
        import hashlib

        id0 = hashlib.md5(b"".join(objects)).digest()
        o_val = _rc4(hashlib.md5(_PW_PAD).digest()[:5], _PW_PAD)
        p = -1
        key = hashlib.md5(
            _PW_PAD + o_val + (p & 0xFFFFFFFF).to_bytes(4, "little") + id0
        ).digest()[:5]
        u_val = _rc4(key, _PW_PAD)
        objects = [
            _encrypt_object_streams(obj, num, key)
            for num, obj in enumerate(objects, start=1)
        ]
        enc_num = len(objects) + 1
        objects.append(
            (
                f"<< /Filter /Standard /V 1 /R 2 /P {p} "
                f"/O <{o_val.hex()}> /U <{u_val.hex()}> >>"
            ).encode()
        )
        trailer_extra = (
            b" /Encrypt %d 0 R /ID [<%s> <%s>]"
            % (enc_num, id0.hex().encode(), id0.hex().encode())
        )

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
        b"trailer\n<< /Size %d /Root 1 0 R%s >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objects) + 1, trailer_extra, xref_pos)
    )
    return bytes(out)


def _encrypt_object_streams(obj: bytes, num: int, key: bytes) -> bytes:
    """RC4-encrypt the stream body of one assembled object (writer-side
    twin of :func:`decrypt_pdf`'s per-object decrypt)."""
    m = _STREAM_RE.search(obj)
    if m is None:
        return obj
    start = m.start(2)
    lm = _LENGTH_RE.search(m.group(1))
    ln = int(lm.group(1)) if lm else len(m.group(2))
    return obj[:start] + _rc4(_object_key(key, num), obj[start:start + ln]) + obj[start + ln:]


def _assemble_objstm(objects: list[bytes]) -> bytes:
    """PDF 1.5 assembly: dict objects → one Flate'd /ObjStm; stream
    objects top-level; binary cross-reference stream instead of the
    classic xref table + trailer (W [1 4 2]: type byte, 4-byte offset/
    objstm-number, 2-byte gen/index)."""
    packed = [(i + 1, obj) for i, obj in enumerate(objects) if b"stream\n" not in obj]
    top = [(i + 1, obj) for i, obj in enumerate(objects) if b"stream\n" in obj]
    s_num = len(objects) + 1  # the ObjStm object
    x_num = len(objects) + 2  # the XRef stream object

    header = " ".join(f"{num} {off}" for num, off in _objstm_offsets(packed))
    first = len(header) + 1
    body = (header + "\n" + "".join(o.decode("latin-1") for _, o in packed)).encode(
        "latin-1"
    )
    zbody = zlib.compress(body)
    objstm_obj = (
        b"<< /Type /ObjStm /N %d /First %d /Length %d /Filter /FlateDecode >>"
        b"\nstream\n%s\nendstream" % (len(packed), first, len(zbody), zbody)
    )

    out = bytearray(b"%PDF-1.5\n")
    offsets: dict[int, int] = {}
    for num, obj in top + [(s_num, objstm_obj)]:
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + obj + b"\nendobj\n"

    xref_pos = len(out)
    packed_idx = {num: i for i, (num, _) in enumerate(packed)}
    rows = bytearray()
    for num in range(x_num + 1):
        if num == 0:
            t, f2, f3 = 0, 0, 65535
        elif num in packed_idx:
            t, f2, f3 = 2, s_num, packed_idx[num]
        elif num == x_num:
            t, f2, f3 = 1, xref_pos, 0
        else:
            t, f2, f3 = 1, offsets[num], 0
        rows += bytes([t]) + f2.to_bytes(4, "big") + f3.to_bytes(2, "big")
    zrows = zlib.compress(bytes(rows))
    out += (
        b"%d 0 obj\n<< /Type /XRef /Size %d /W [1 4 2] /Root 1 0 R "
        b"/Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream\nendobj\n"
        % (x_num, x_num + 1, len(zrows), zrows)
    )
    out += b"startxref\n%d\n%%%%EOF\n" % xref_pos
    return bytes(out)


def _objstm_offsets(packed: list[tuple[int, bytes]]) -> list[tuple[int, int]]:
    pairs, off = [], 0
    for num, obj in packed:
        pairs.append((num, off))
        off += len(obj)
    return pairs
