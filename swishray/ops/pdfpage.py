"""PDF page text interpreter — fonts, ToUnicode CMaps, the content
stream text state machine, and reading-order layout assembly
(ISO 32000-1 §9 "Text").

Takes the structured document model from pdfcos.py and produces
per-page text in reading order: the content stream is interpreted
with the real text state (Tm/Tlm, Tf, TL, Tc, Tw, Tz), glyph codes
decode through the font's ToUnicode CMap, /Differences table or base
encoding (simple fonts) or the descendant CID machinery (Type0),
advances come from /Widths // /W so inter-chunk gaps are measurable,
and chunks assemble into lines by device-space y-clustering.  Form
XObjects are followed (depth- and cycle-guarded); inline images are
skipped structurally.

Everything a crawl needs to be resilient against — bad operands,
unknown operators, broken fonts, cyclic forms — degrades to skipped
tokens, never an exception out of :func:`page_chunks`.
"""
from __future__ import annotations

import re
from typing import Any

from ._pdf_glyphs import base_encoding, glyph_to_unicode
from .pdfcos import Name, PdfDocument, PdfError, Ref, Stream, _Parser

__all__ = ["Font", "page_chunks", "assemble_text", "page_text"]


# ---------------------------------------------------------------------
# ToUnicode CMap (§9.10.3) — bfchar / bfrange over hex strings

_CMAP_TOK_RE = re.compile(
    rb"<([0-9A-Fa-f]+)>|\[((?:[^][])*)\]|(begincodespacerange|"
    rb"endcodespacerange|beginbfchar|endbfchar|beginbfrange|"
    rb"endbfrange)")


def _utf16be(b: bytes) -> str:
    try:
        return b.decode("utf-16-be", "replace")
    except Exception:  # noqa: BLE001
        return "�"


def parse_tounicode(data: bytes) -> tuple[dict[int, str], list[int]]:
    """-> (code -> unicode map, sorted list of code byte-lengths)."""
    out: dict[int, str] = {}
    lens: set[int] = set()
    mode = None
    pend: list[bytes] = []
    for m in _CMAP_TOK_RE.finditer(data):
        if m.group(3) is not None:
            kw = m.group(3)
            if kw.startswith(b"begin"):
                mode = kw[5:]
                pend = []
            else:
                mode = None
            continue
        if mode is None:
            continue
        if m.group(1) is not None:
            h = m.group(1)
            if len(h) % 2:
                h += b"0"
            pend.append(bytes.fromhex(h.decode()))
        else:  # [...] array of hex dst strings (bfrange form 2)
            arr = [bytes.fromhex(x.decode())
                   for x in re.findall(rb"<([0-9A-Fa-f]+)>",
                                       m.group(2))]
            pend.append(arr)  # type: ignore[arg-type]
        if mode == b"codespacerange" and len(pend) == 2:
            if isinstance(pend[0], bytes):
                lens.add(len(pend[0]))
            pend = []
        elif mode == b"bfchar" and len(pend) == 2:
            src, dst = pend
            if isinstance(src, bytes) and isinstance(dst, bytes):
                lens.add(len(src))
                out[int.from_bytes(src, "big")] = _utf16be(dst)
            pend = []
        elif mode == b"bfrange" and len(pend) == 3:
            lo, hi, dst = pend
            if isinstance(lo, bytes) and isinstance(hi, bytes):
                lens.add(len(lo))
                lo_i = int.from_bytes(lo, "big")
                hi_i = min(int.from_bytes(hi, "big"), lo_i + 65535)
                if isinstance(dst, list):
                    for i, d in enumerate(dst):
                        if lo_i + i > hi_i:
                            break
                        out[lo_i + i] = _utf16be(d)
                elif isinstance(dst, bytes):
                    base = int.from_bytes(dst, "big") if dst else 0
                    blen = max(len(dst), 2)
                    for i in range(hi_i - lo_i + 1):
                        out[lo_i + i] = _utf16be(
                            (base + i).to_bytes(blen, "big"))
            pend = []
    return out, sorted(lens) or [1]


# ---------------------------------------------------------------------
# fonts

class Font:
    """Decoded view of a /Font dictionary: code -> (unicode, width).

    Simple fonts are one byte per code; Type0 descendants use the
    code lengths the ToUnicode codespace declares (Identity-H is two
    bytes)."""

    def __init__(self, doc: PdfDocument, fdict: dict) -> None:
        self.subtype = str(doc.get(fdict.get("Subtype")) or "")
        self.to_unicode: dict[int, str] = {}
        self.code_lens = [1]
        tu = doc.get(fdict.get("ToUnicode"))
        if isinstance(tu, Stream):
            try:
                self.to_unicode, self.code_lens = parse_tounicode(
                    doc.stream_data(tu))
            except PdfError:
                pass
        if self.subtype == "Type0":
            self._init_type0(doc, fdict)
        else:
            self._init_simple(doc, fdict)

    # -- simple fonts --------------------------------------------------
    def _init_simple(self, doc: PdfDocument, fdict: dict) -> None:
        self.is_cid = False
        self.code_lens = [1]
        enc_obj = doc.get(fdict.get("Encoding"))
        base: list[str | None]
        if isinstance(enc_obj, dict):
            base = list(base_encoding(
                str(doc.get(enc_obj.get("BaseEncoding")) or "") or
                None))
            diffs = doc.get(enc_obj.get("Differences"))
            if isinstance(diffs, list):
                code = 0
                for item in diffs:
                    if isinstance(item, (int, float)):
                        code = int(item)
                    elif isinstance(item, Name) and 0 <= code < 256:
                        base[code] = glyph_to_unicode(str(item))
                        code += 1
        elif isinstance(enc_obj, Name):
            base = base_encoding(str(enc_obj))
        else:
            base = base_encoding(None)
        self.enc = base
        # widths
        self.widths = [0.0] * 256
        self.default_w = 500.0
        fd = doc.get(fdict.get("FontDescriptor"))
        if isinstance(fd, dict):
            mw = doc.get(fd.get("MissingWidth"))
            if isinstance(mw, (int, float)):
                self.default_w = float(mw)
        first = doc.get(fdict.get("FirstChar"))
        warr = doc.get(fdict.get("Widths"))
        if isinstance(first, int) and isinstance(warr, list):
            for i, w in enumerate(warr):
                w = doc.get(w)
                c = first + i
                if 0 <= c < 256 and isinstance(w, (int, float)):
                    self.widths[c] = float(w)
        else:
            self.widths = [self.default_w] * 256
        sw = self.widths[32] or self.default_w
        self.space_w = sw if sw > 0 else 500.0

    # -- Type0 / CID ----------------------------------------------------
    def _init_type0(self, doc: PdfDocument, fdict: dict) -> None:
        self.is_cid = True
        if self.code_lens == [1] and not self.to_unicode:
            self.code_lens = [2]  # Identity-H default
        enc = doc.get(fdict.get("Encoding"))
        if isinstance(enc, Name) and str(enc).startswith("Identity"):
            self.code_lens = [2]
        self.cid_widths: dict[int, float] = {}
        self.default_w = 1000.0
        desc = doc.get(fdict.get("DescendantFonts"))
        if isinstance(desc, list) and desc:
            d0 = doc.get(desc[0])
            if isinstance(d0, dict):
                dw = doc.get(d0.get("DW"))
                if isinstance(dw, (int, float)):
                    self.default_w = float(dw)
                warr = doc.get(d0.get("W"))
                if isinstance(warr, list):
                    self._parse_w(doc, warr)
        self.space_w = 500.0

    def _parse_w(self, doc: PdfDocument, warr: list) -> None:
        i = 0
        n = len(warr)
        while i < n:
            c = doc.get(warr[i])
            if not isinstance(c, (int, float)):
                break
            c = int(c)
            if i + 1 >= n:
                break
            nxt = doc.get(warr[i + 1])
            if isinstance(nxt, list):
                for j, w in enumerate(nxt):
                    w = doc.get(w)
                    if isinstance(w, (int, float)):
                        self.cid_widths[c + j] = float(w)
                i += 2
            elif isinstance(nxt, (int, float)) and i + 2 < n:
                w = doc.get(warr[i + 2])
                hi = int(nxt)
                if isinstance(w, (int, float)) and hi >= c \
                        and hi - c <= 65535:
                    for cid in range(c, hi + 1):
                        self.cid_widths[cid] = float(w)
                i += 3
            else:
                break

    # -- decoding -------------------------------------------------------
    def decode(self, s: bytes) -> list[tuple[str, float, int]]:
        """-> [(unicode, width_1000, raw_code), ...]."""
        out = []
        if not self.is_cid:
            for code in s:
                u = self.to_unicode.get(code)
                if u is None:
                    u = self.enc[code]
                if u is None:
                    u = "�"
                out.append((u, self.widths[code] or self.default_w,
                            code))
            return out
        # CID: consume by declared code length (shortest-match over
        # the codespace lengths; Identity-H is uniformly 2)
        lens = self.code_lens
        i = 0
        n = len(s)
        while i < n:
            code = None
            for ln in lens:
                if i + ln <= n:
                    cand = int.from_bytes(s[i:i + ln], "big")
                    if cand in self.to_unicode or ln == lens[-1]:
                        code = cand
                        i += ln
                        break
            if code is None:
                code = s[i]
                i += 1
            u = self.to_unicode.get(code, "�")
            w = self.cid_widths.get(code, self.default_w)
            out.append((u, w, code))
        return out


# ---------------------------------------------------------------------
# matrices (row-vector convention: p' = p @ M, M = [a b; c d; e f])

_ID = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)


def _mmul(m: tuple, n: tuple) -> tuple:
    a, b, c, d, e, f = m
    A, B, C, D, E, F = n
    return (a * A + b * C, a * B + b * D,
            c * A + d * C, c * B + d * D,
            e * A + f * C + E, e * B + f * D + F)


def _apply(m: tuple, x: float, y: float) -> tuple[float, float]:
    a, b, c, d, e, f = m
    return (a * x + c * y + e, b * x + d * y + f)


# ---------------------------------------------------------------------
# the interpreter

class _Chunk:
    __slots__ = ("x0", "y0", "x1", "text", "size", "space")

    def __init__(self, x0, y0, size, space):
        self.x0 = x0
        self.y0 = y0
        self.x1 = x0
        self.text: list[str] = []
        self.size = size
        self.space = space


_OBJ_START = frozenset(b"/([<+-.0123456789")
_EI_RE = re.compile(rb"\sEI(?=[\x00\t\n\x0c\r ]|$)")


def _content_tokens(data: bytes):
    """Yield ('obj', value) and ('op', bytes) tokens; skips inline
    images and junk bytes."""
    p = _Parser(data, 0)
    n = p.n
    while True:
        p.skip_ws()
        if p.pos >= n:
            return
        c = data[p.pos]
        if c in _OBJ_START:  # covers '<' (hex string AND '<<' dict)
            try:
                yield ("obj", p.parse())
                continue
            except PdfError:
                p.pos += 1
                continue
        start = p.pos
        while p.pos < n and data[p.pos] not in \
                b"\x00\t\n\x0c\r ()<>[]{}/%":
            p.pos += 1
        if p.pos == start:
            p.pos += 1  # stray delimiter
            continue
        kw = data[start:p.pos]
        if kw == b"BI":
            # inline image: skip to ID, then past the binary to EI
            idp = data.find(b"ID", p.pos)
            if idp < 0:
                return
            m = _EI_RE.search(data, idp + 3)
            if m is None:
                return
            p.pos = m.end()
            continue
        yield ("op", kw)


def page_chunks(doc: PdfDocument, page: dict,
                max_form_depth: int = 8,
                skipped: list | None = None) -> list[_Chunk]:
    """Interpret the page's content; -> positioned text chunks."""
    font_cache: dict[int, Font] = getattr(doc, "_font_cache", None)
    if font_cache is None:
        font_cache = {}
        doc._font_cache = font_cache  # type: ignore[attr-defined]
    chunks: list[_Chunk] = []
    content = doc.page_content(page, skipped)
    resources = doc.get(page.get("Resources")) or {}
    _run(doc, content, resources, _ID, chunks, font_cache,
         max_form_depth, set())
    return chunks


def _get_font(doc: PdfDocument, resources: dict, name: str,
              cache: dict) -> Font | None:
    fonts = doc.get(resources.get("Font")) if isinstance(
        resources, dict) else None
    if not isinstance(fonts, dict):
        return None
    ref = fonts.get(name)
    key = ref.num if isinstance(ref, Ref) else id(ref)
    if key in cache:
        return cache[key]
    fd = doc.get(ref)
    font = None
    if isinstance(fd, dict):
        try:
            font = Font(doc, fd)
        except Exception:  # noqa: BLE001 — broken font, crawl case
            font = None
    cache[key] = font
    return font


def _run(doc: PdfDocument, content: bytes, resources: Any,
         ctm: tuple, chunks: list, font_cache: dict,
         depth: int, visiting: set) -> None:
    gs_stack: list[tuple] = []
    tm = tlm = _ID
    font: Font | None = None
    tfs = 12.0
    tl = tc = tw = 0.0
    th = 1.0
    operands: list[Any] = []
    cur: _Chunk | None = None

    def flush() -> None:
        nonlocal cur
        if cur is not None and cur.text:
            chunks.append(cur)
        cur = None

    def nums(k: int) -> list[float] | None:
        if len(operands) < k:
            return None
        vals = operands[-k:]
        if not all(isinstance(v, (int, float)) for v in vals):
            return None
        return [float(v) for v in vals]

    def show(s: Any) -> None:
        nonlocal tm, cur
        if not isinstance(s, bytes) or font is None:
            return
        trm = _mmul((tfs * th, 0.0, 0.0, tfs, 0.0, 0.0),
                    _mmul(tm, ctm))
        x, y = trm[4], trm[5]
        size_dev = abs(trm[3]) or abs(trm[1]) or 1.0
        space_dev = font.space_w / 1000.0 * abs(trm[0] or trm[2]
                                                or tfs)
        if cur is None or abs(y - cur.y0) > 0.1 or \
                x - cur.x1 > 0.3 * max(space_dev, 1.0) or \
                x < cur.x1 - 1.0:
            flush()
            cur = _Chunk(x, y, size_dev, space_dev)
        adv = 0.0
        for u, w, code in font.decode(s):
            cur.text.append(u)
            a = (w / 1000.0 * tfs
                 + tc + (tw if code == 32 and not font.is_cid
                         else 0.0)) * th
            adv += a
        tm = _mmul((1.0, 0.0, 0.0, 1.0, adv, 0.0), tm)
        ex, _ = _apply(_mmul(tm, ctm), 0.0, 0.0)
        cur.x1 = ex

    def kern(val: float) -> None:
        nonlocal tm
        dx = -val / 1000.0 * tfs * th
        if cur is not None and font is not None and \
                dx > 0.4 * (font.space_w / 1000.0 * tfs * th):
            cur.text.append(" ")
        tm = _mmul((1.0, 0.0, 0.0, 1.0, dx, 0.0), tm)

    def newline(ty: float) -> None:
        nonlocal tm, tlm
        tlm = _mmul((1.0, 0.0, 0.0, 1.0, 0.0, ty), tlm)
        tm = tlm
        flush()

    for kind, tok in _content_tokens(content):
        if kind == "obj":
            operands.append(tok)
            continue
        op = tok
        try:
            if op == b"BT":
                tm = tlm = _ID
                flush()
            elif op == b"ET":
                flush()
            elif op == b"Tf":
                if len(operands) >= 2 and isinstance(
                        operands[-2], Name) and isinstance(
                            operands[-1], (int, float)):
                    font = _get_font(doc, resources,
                                     str(operands[-2]), font_cache)
                    tfs = float(operands[-1])
            elif op == b"Td":
                v = nums(2)
                if v:
                    tlm = _mmul((1.0, 0.0, 0.0, 1.0, v[0], v[1]),
                                tlm)
                    tm = tlm
            elif op == b"TD":
                v = nums(2)
                if v:
                    tl = -v[1]
                    tlm = _mmul((1.0, 0.0, 0.0, 1.0, v[0], v[1]),
                                tlm)
                    tm = tlm
            elif op == b"Tm":
                v = nums(6)
                if v:
                    tm = tlm = tuple(v)
                    flush()
            elif op == b"T*":
                newline(-tl)
            elif op == b"TL":
                v = nums(1)
                if v:
                    tl = v[0]
            elif op == b"Tc":
                v = nums(1)
                if v:
                    tc = v[0]
            elif op == b"Tw":
                v = nums(1)
                if v:
                    tw = v[0]
            elif op == b"Tz":
                v = nums(1)
                if v:
                    th = v[0] / 100.0
            elif op == b"Tj":
                if operands:
                    show(operands[-1])
            elif op == b"'":
                newline(-tl)
                if operands:
                    show(operands[-1])
            elif op == b'"':
                if len(operands) >= 3:
                    if isinstance(operands[-3], (int, float)):
                        tw = float(operands[-3])
                    if isinstance(operands[-2], (int, float)):
                        tc = float(operands[-2])
                    newline(-tl)
                    show(operands[-1])
            elif op == b"TJ":
                if operands and isinstance(operands[-1], list):
                    for item in operands[-1]:
                        if isinstance(item, bytes):
                            show(item)
                        elif isinstance(item, (int, float)):
                            kern(float(item))
            elif op == b"cm":
                v = nums(6)
                if v:
                    ctm = _mmul(tuple(v), ctm)
            elif op == b"q":
                gs_stack.append(ctm)
            elif op == b"Q":
                if gs_stack:
                    ctm = gs_stack.pop()
            elif op == b"Do":
                if operands and isinstance(operands[-1], Name) \
                        and depth > 0:
                    _do_xobject(doc, resources, str(operands[-1]),
                                ctm, chunks, font_cache, depth,
                                visiting)
                    flush()
        except Exception:  # noqa: BLE001 — skip the broken operator
            pass
        operands.clear()
    flush()


def _do_xobject(doc: PdfDocument, resources: Any, name: str,
                ctm: tuple, chunks: list, font_cache: dict,
                depth: int, visiting: set) -> None:
    xo = doc.get(resources.get("XObject")) if isinstance(
        resources, dict) else None
    if not isinstance(xo, dict):
        return
    ref = xo.get(name)
    key = ref.num if isinstance(ref, Ref) else id(ref)
    if key in visiting:
        return
    st = doc.get(ref)
    if not isinstance(st, Stream) or \
            str(doc.get(st.dict.get("Subtype")) or "") != "Form":
        return
    try:
        body = doc.stream_data(st)
    except PdfError:
        return
    mtx = doc.get(st.dict.get("Matrix"))
    m = tuple(float(x) for x in mtx) if (
        isinstance(mtx, list) and len(mtx) == 6
        and all(isinstance(x, (int, float)) for x in mtx)) else _ID
    res = doc.get(st.dict.get("Resources")) or resources
    visiting.add(key)
    try:
        _run(doc, body, res, _mmul(m, ctm), chunks, font_cache,
             depth - 1, visiting)
    finally:
        visiting.discard(key)


# ---------------------------------------------------------------------
# layout assembly

def _detect_column_split(lines: list[list[tuple]]) -> float | None:
    """Find a vertical gutter: if most multi-chunk lines share their
    largest inter-chunk gap over a common x-interval, the page is
    two-column and reading order is column-major.  Returns the split
    x, or None for single-column layout."""
    gaps = []
    for line in lines:
        if len(line) < 2:
            continue
        best = None
        for a, b in zip(line, line[1:]):
            g0, g1 = max(a[2], a[1]), b[1]
            width = g1 - g0
            if width > 4.0 * max(a[5], 1.0) and (
                    best is None or width > best[1] - best[0]):
                best = (g0, g1)
        if best:
            gaps.append(best)
    multi = sum(1 for line in lines if len(line) >= 2)
    if len(gaps) < 3 or multi == 0 or len(gaps) < 0.6 * multi \
            or len(gaps) < 0.4 * len(lines):
        return None
    lo = max(g[0] for g in gaps)
    hi = min(g[1] for g in gaps)
    if hi <= lo:  # gaps don't overlap: ragged, not a gutter
        return None
    return (lo + hi) / 2.0


def assemble_text(chunks: list[_Chunk]) -> str:
    """Device-space reading order: cluster chunks into lines by y,
    sort lines top-down, chunks left-to-right, gaps become spaces.
    A consistent vertical gutter across most lines triggers the
    two-column path: left column fully, then right (column-major
    reading order)."""
    if not chunks:
        return ""
    items = [(c.y0, c.x0, c.x1, "".join(c.text), c.size, c.space)
             for c in chunks if c.text]
    if not items:
        return ""
    items.sort(key=lambda t: (-t[0], t[1]))
    lines: list[list[tuple]] = []
    anchor = None
    for it in items:
        tol = 0.5 * max(it[4], 1.0)
        if anchor is None or anchor - it[0] > tol:
            lines.append([it])
            anchor = it[0]
        else:
            lines[-1].append(it)
    for line in lines:
        line.sort(key=lambda t: t[1])
    split = _detect_column_split(lines)
    if split is not None:
        left = [[c for c in line if c[1] < split] for line in lines]
        right = [[c for c in line if c[1] >= split]
                 for line in lines]
        ordered = [ln for ln in left if ln] + \
            [ln for ln in right if ln]
    else:
        ordered = lines
    out_lines = []
    for line in ordered:
        buf = []
        prev_x1 = None
        for y, x0, x1, text, size, space in line:
            if prev_x1 is not None and \
                    x0 - prev_x1 > 0.3 * max(space, 1.0) and \
                    buf and not buf[-1].endswith(" ") and \
                    not text.startswith(" "):
                buf.append(" ")
            buf.append(text)
            prev_x1 = max(x1, x0)
        out_lines.append("".join(buf))
    return "\n".join(out_lines)


def page_text(doc: PdfDocument, page: dict,
              skipped: list | None = None) -> str:
    return assemble_text(page_chunks(doc, page, skipped=skipped))


def document_text(data: bytes,
                  password: bytes = b"") -> tuple[str, int, int]:
    """Whole-document structured extraction.
    -> (text, n_pages, n_skipped_streams); raises PdfError when the
    file has no parseable structure (callers fall back to the
    syntactic scan tier)."""
    doc = PdfDocument(data, password=password)
    skipped: list[int] = []
    parts = []
    n_pages = 0
    for page in doc.pages():
        n_pages += 1
        if n_pages > 10_000:
            break
        parts.append(page_text(doc, page, skipped))
    if n_pages == 0:
        raise PdfError("no pages")
    return "\n\n".join(parts), n_pages, sum(skipped)
