"""ctypes bindings to the system libxml2 — the exact library the
reference drives (parser.c:2450-2597), so HTML tag-soup recovery,
entity substitution, encoding switching and event ordering are
byte-identical by construction.

We register the same SAX slots the reference registers
(parser.c:1453-1488 ``my_parser``): startDocument/endDocument,
startElement/endElement (SAX1, used by the HTML parser),
startElementNs/endElementNs (SAX2, used by the XML parser),
characters, comment; cdataBlock is left NULL so CDATA falls back to
characters, and ignorableWhitespace is left NULL so the HTML parser
drops "blank" runs — both exactly as the reference behaves.

Entry points mirror parser.c:
  * xml_parse(buffer, target)  — xmlSAXUserParseMemory with SAX2 magic
    and global entity substitution on (parser.c:287-288, 2450-2535)
  * html_parse(buffer, target) — htmlSAXParseDoc with NUL-terminated
    buffer (htmlCreateMemoryParserCtxt(buf, xmlStrlen(buf)),
    parser.c:2553)
  * check_utf8(data)           — xmlCheckUTF8 (set_encoding,
    parser.c:2725)
  * html_tag_is_inline(tag)    — htmlTagLookup()->isinline, the
    bump_word table (bake_tag, parser.c:395-425)

The library handle and callback thunks are process-global (one per Ray
worker process; built once at import, mirroring xmlInitParser() in
swish_parser_init).
"""

from __future__ import annotations

import ctypes
from ctypes import (
    CFUNCTYPE, POINTER, Structure, c_char_p, c_int, c_uint, c_void_p,
    c_ushort, string_at, cast,
)

_lib = None


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        for name in ("libxml2.so.2", "libxml2.so"):
            try:
                _lib = ctypes.CDLL(name)
                break
            except OSError:
                continue
        if _lib is None:
            raise OSError("libxml2 shared library not found")
        _lib.xmlInitParser()
        # parser.c:288 — resolve text entities globally
        _lib.xmlSubstituteEntitiesDefault(1)
    return _lib


# SAX callback signatures (libxml2/parser.h, stable ABI)
_startDocumentF = CFUNCTYPE(None, c_void_p)
_endDocumentF = CFUNCTYPE(None, c_void_p)
_startElementF = CFUNCTYPE(None, c_void_p, c_char_p, POINTER(c_char_p))
_endElementF = CFUNCTYPE(None, c_void_p, c_char_p)
_charactersF = CFUNCTYPE(None, c_void_p, POINTER(ctypes.c_char), c_int)
_commentF = CFUNCTYPE(None, c_void_p, c_char_p)
_startElementNsF = CFUNCTYPE(
    None, c_void_p, c_char_p, c_char_p, c_char_p, c_int,
    POINTER(c_char_p), c_int, c_int, POINTER(c_void_p))
_endElementNsF = CFUNCTYPE(None, c_void_p, c_char_p, c_char_p, c_char_p)

_XML_SAX2_MAGIC = 0xDEEDBEAF


class _xmlSAXHandler(Structure):
    _fields_ = [
        ("internalSubset", c_void_p),
        ("isStandalone", c_void_p),
        ("hasInternalSubset", c_void_p),
        ("hasExternalSubset", c_void_p),
        ("resolveEntity", c_void_p),
        ("getEntity", c_void_p),
        ("entityDecl", c_void_p),
        ("notationDecl", c_void_p),
        ("attributeDecl", c_void_p),
        ("elementDecl", c_void_p),
        ("unparsedEntityDecl", c_void_p),
        ("setDocumentLocator", c_void_p),
        ("startDocument", _startDocumentF),
        ("endDocument", _endDocumentF),
        ("startElement", _startElementF),
        ("endElement", _endElementF),
        ("reference", c_void_p),
        ("characters", _charactersF),
        ("ignorableWhitespace", c_void_p),
        ("processingInstruction", c_void_p),
        ("comment", _commentF),
        ("warning", c_void_p),
        ("error", c_void_p),
        ("fatalError", c_void_p),
        ("getParameterEntity", c_void_p),
        ("cdataBlock", c_void_p),
        ("externalSubset", c_void_p),
        ("initialized", c_uint),
        ("_private", c_void_p),
        ("startElementNs", _startElementNsF),
        ("endElementNs", _endElementNsF),
        ("serror", c_void_p),
    ]


class SaxTarget:
    """Interface the extraction state machine implements."""

    def start_document(self) -> None: ...
    def end_document(self) -> None: ...

    def start_element(self, name: bytes,
                      atts: list[bytes | None] | None) -> None:
        """SAX1 (HTML). ``atts`` is the FLAT (name, value, ...) array —
        flat because bake_tag's HTML <meta> scan walks it by 1,
        matching attribute *values* too (parser.c:434-449)."""

    def end_element(self, name: bytes) -> None: ...

    def start_element_ns(self, localname: bytes, prefix: bytes | None,
                         uri: bytes | None,
                         atts: list[bytes] | None) -> None:
        """SAX2 (XML). ``atts`` is flat (name, value, ...) truncated at
        the first empty-valued attribute (parser.c:898-911)."""

    def end_element_ns(self, localname: bytes, prefix: bytes | None) -> None: ...

    def characters(self, data: bytes) -> None: ...
    def comment(self, data: bytes) -> None: ...


class _Dispatcher:
    """Holds the ctypes thunks; routes events to the current target.

    One instance per process: the parse calls are reentrant-safe
    because parsing is synchronous (the target is swapped around each
    parse; XInclude-style nested parses are not used by the engine).
    """

    def __init__(self) -> None:
        self.target: SaxTarget | None = None
        self.error: BaseException | None = None

        # callbacks must never unwind an exception through C; each one
        # inlines the error latch (a decorator indirection here costs a
        # measurable fraction of parse time at ~100k events/doc)
        def _start_doc(ctx):
            if self.error is None:
                try:
                    self.target.start_document()
                except BaseException as e:
                    self.error = e

        def _end_doc(ctx):
            if self.error is None:
                try:
                    self.target.end_document()
                except BaseException as e:
                    self.error = e

        def _start_el(ctx, name, atts):
            # SAX1: NULL-terminated flat (name, value, ...) array;
            # values may be NULL for valueless attributes
            if self.error is not None:
                return
            try:
                alist = None
                if atts:
                    alist = []
                    i = 0
                    while atts[i] is not None:
                        alist.append(atts[i])
                        alist.append(atts[i + 1])  # may be None
                        i += 2
                    if not alist:
                        alist = None
                self.target.start_element(name, alist)
            except BaseException as e:
                self.error = e

        def _end_el(ctx, name):
            if self.error is not None:
                return
            try:
                self.target.end_element(name)
            except BaseException as e:
                self.error = e

        def _chars(ctx, ch, length):
            if self.error is not None:
                return
            try:
                self.target.characters(string_at(ch, length))
            except BaseException as e:
                self.error = e

        def _comment(ctx, data):
            if self.error is not None:
                return
            try:
                self.target.comment(data or b"")
            except BaseException as e:
                self.error = e

        def _start_el_ns_inner(ctx, localname, prefix, uri, nb_ns,
                               namespaces, nb_attrs, nb_defaulted,
                               attributes):
            # mystartElementNs (parser.c:876-961): 5 pointers per attr
            # (localname, prefix, URI, value_start, value_end); an attr
            # with an EMPTY value truncates the list at that position
            # (parser.c:898-911 sets atts[j]=NULL on len<=0).
            alist = None
            if nb_attrs > 0:
                alist = []
                arr = cast(attributes, POINTER(c_void_p))
                for i in range(0, nb_attrs * 5, 5):
                    aname = cast(arr[i], c_char_p).value
                    vstart = arr[i + 3]
                    vend = arr[i + 4]
                    vlen = (vend or 0) - (vstart or 0)
                    if vlen <= 0:
                        break  # reference truncates the atts array here
                    alist.append(aname)
                    alist.append(string_at(vstart, vlen))
                if not alist:
                    alist = None
            self.target.start_element_ns(localname, prefix or None,
                                         uri or None, alist)

        def _start_el_ns(ctx, localname, prefix, uri, nb_ns, namespaces,
                         nb_attrs, nb_defaulted, attributes):
            if self.error is not None:
                return
            try:
                _start_el_ns_inner(ctx, localname, prefix, uri, nb_ns,
                                   namespaces, nb_attrs, nb_defaulted,
                                   attributes)
            except BaseException as e:
                self.error = e

        def _end_el_ns(ctx, localname, prefix, uri):
            if self.error is not None:
                return
            try:
                self.target.end_element_ns(localname, prefix or None)
            except BaseException as e:
                self.error = e

        self._thunks = dict(
            startDocument=_startDocumentF(_start_doc),
            endDocument=_endDocumentF(_end_doc),
            startElement=_startElementF(_start_el),
            endElement=_endElementF(_end_el),
            characters=_charactersF(_chars),
            comment=_commentF(_comment),
            startElementNs=_startElementNsF(_start_el_ns),
            endElementNs=_endElementNsF(_end_el_ns),
        )
        self.sax = _xmlSAXHandler()
        for k, v in self._thunks.items():
            setattr(self.sax, k, v)
        self.sax.initialized = _XML_SAX2_MAGIC


_dispatcher: _Dispatcher | None = None


def _get_dispatcher() -> _Dispatcher:
    global _dispatcher
    if _dispatcher is None:
        _load()
        _dispatcher = _Dispatcher()
    return _dispatcher


def _xml_parse_ctypes(buffer: bytes, target: SaxTarget) -> int:
    lib = _load()
    d = _get_dispatcher()
    prev_t, prev_e = d.target, d.error
    d.target, d.error = target, None
    try:
        ret = lib.xmlSAXUserParseMemory(
            ctypes.byref(d.sax), None, buffer, len(buffer))
        if d.error is not None:
            raise d.error
        return ret
    finally:
        d.target, d.error = prev_t, prev_e


def _html_parse_ctypes(buffer: bytes, target: SaxTarget) -> int:
    lib = _load()
    d = _get_dispatcher()
    prev_t, prev_e = d.target, d.error
    d.target, d.error = target, None
    try:
        lib.htmlSAXParseDoc.restype = c_void_p
        doc = lib.htmlSAXParseDoc(buffer, None, ctypes.byref(d.sax), None)
        if doc:
            lib.xmlFreeDoc(c_void_p(doc))
        if d.error is not None:
            raise d.error
        return 0
    finally:
        d.target, d.error = prev_t, prev_e


def _replay(events: list, target: SaxTarget) -> None:
    """Feed a swishsax event batch through the SaxTarget interface —
    same calls, same order, same payloads as the ctypes thunks (the
    shim merges only CONSECUTIVE characters events, an equivalence of
    buffer_characters; see swishsax.c). An exception stops the replay
    exactly where the ctypes error latch would have frozen state."""
    replay = getattr(target, "replay", None)
    if replay is not None:
        # targets may provide a fused consumer (ExtractionState.replay)
        replay(events)
        return
    chars = target.characters
    start_el = target.start_element
    end_el = target.end_element
    start_ns = target.start_element_ns
    end_ns = target.end_element_ns
    for ev in events:
        t = ev[0]
        if t == 3:
            chars(ev[1])
        elif t == 1:
            start_el(ev[1], ev[2])
        elif t == 2:
            end_el(ev[1])
        elif t == 5:
            start_ns(ev[1], ev[2], ev[3], ev[4])
        elif t == 6:
            end_ns(ev[1], ev[2])
        elif t == 4:
            target.comment(ev[1])
        elif t == 7:
            target.start_document()
        elif t == 8:
            target.end_document()


def xml_parse(buffer: bytes, target: SaxTarget) -> int:
    """SAX2 parse of an in-memory XML document (parser.c:2450-2535).
    Returns 0 if well-formed, else the libxml2 errNo; SAX events fired
    for whatever prefix parsed (no recovery flag, like the reference).
    Uses the C event-batching front-end when available (same libxml2,
    A/B-verified at import)."""
    if _sax_native is not None:
        rc, events = _sax_native.parse_xml(buffer)
        _replay(events, target)
        return rc
    if not isinstance(buffer, (bytes, bytearray)):
        buffer = bytes(buffer)  # ctypes path needs a bytes object
    return _xml_parse_ctypes(buffer, target)


def html_parse(buffer: bytes, target: SaxTarget) -> int:
    """HTML tag-soup SAX parse (parser.c:2537-2597): NUL-terminated
    buffer, libxml2's own meta-charset detection, default encoding
    ISO-8859-1 per the HTML spec — all inside libxml2."""
    if _sax_native is not None:
        rc, events = _sax_native.parse_html(buffer)
        _replay(events, target)
        return rc
    if not isinstance(buffer, (bytes, bytearray)):
        buffer = bytes(buffer)  # ctypes path needs a bytes object
    return _html_parse_ctypes(buffer, target)


def check_utf8(data: bytes) -> bool:
    """xmlCheckUTF8 (set_encoding, parser.c:2725)."""
    return bool(_load().xmlCheckUTF8(data))


class _htmlElemDesc(Structure):
    # libxml2/HTMLparser.h htmlElemDesc — stable public struct
    _fields_ = [
        ("name", c_char_p),
        ("startTag", ctypes.c_char),
        ("endTag", ctypes.c_char),
        ("saveEndTag", ctypes.c_char),
        ("empty", ctypes.c_char),
        ("depr", ctypes.c_char),
        ("dtd", ctypes.c_char),
        ("isinline", ctypes.c_char),
        ("desc", c_char_p),
    ]


_inline_cache: dict[bytes, int | None] = {}


def html_tag_lookup_isinline(tag: bytes) -> int | None:
    """htmlTagLookup(tag)->isinline; None when the tag is not a known
    HTML element (bake_tag, parser.c:400-425)."""
    v = _inline_cache.get(tag)
    if v is None and tag not in _inline_cache:
        lib = _load()
        lib.htmlTagLookup.restype = POINTER(_htmlElemDesc)
        p = lib.htmlTagLookup(tag)
        v = ord(p.contents.isinline) if p else None
        _inline_cache[tag] = v
    return v


class _RecordingTarget(SaxTarget):
    """Self-test capture: records the normalized call stream."""

    def __init__(self) -> None:
        self.calls: list = []

    def _chars(self, data: bytes) -> None:
        # normalize: merge consecutive characters (the shim's merge is
        # an equivalence; comparison must be over the merged form)
        if self.calls and self.calls[-1][0] == "chars":
            self.calls[-1] = ("chars", self.calls[-1][1] + data)
        else:
            self.calls.append(("chars", data))

    def start_document(self) -> None:
        self.calls.append(("startdoc",))

    def end_document(self) -> None:
        self.calls.append(("enddoc",))

    def start_element(self, name, atts) -> None:
        self.calls.append(("start", name, atts))

    def end_element(self, name) -> None:
        self.calls.append(("end", name))

    def start_element_ns(self, localname, prefix, uri, atts) -> None:
        self.calls.append(("startns", localname, prefix, uri, atts))

    def end_element_ns(self, localname, prefix) -> None:
        self.calls.append(("endns", localname, prefix))

    def characters(self, data: bytes) -> None:
        self._chars(data)

    def comment(self, data: bytes) -> None:
        self.calls.append(("comment", data))


_SAX_SELFTEST_DOCS = [
    ("html", b"<html><head><title>T &amp; t</title>"
             b"<meta name=\"a\" content=\"b\"></head>"
             b"<body class=x checked>Hello <b>world</b>"
             b"<!-- note --> tail</body></html>"),
    ("html", b"<p>broken <div unclosed>soup &lt;tag"),
    ("xml", b"<?xml version=\"1.0\"?>\n<doc xmlns:n=\"urn:x\">"
            b"<n:a k=\"v\" empty=\"\" later=\"skipped\">body</n:a>"
            b"<![CDATA[cd &amp; ata]]><!-- c --></doc>"),
    ("xml", b"<doc><open>no close"),
    ("xml", b"<a><b x=\"1\" y=\"2\">t1</b>t2<c/></a>"),
]


def _sax_selftest() -> bool:
    for kind, doc in _SAX_SELFTEST_DOCS:
        ct, nt = _RecordingTarget(), _RecordingTarget()
        try:
            if kind == "html":
                rc1 = _html_parse_ctypes(doc, ct)
                rc2, events = _sax_native.parse_html(doc)
            else:
                rc1 = _xml_parse_ctypes(doc, ct)
                rc2, events = _sax_native.parse_xml(doc)
            _replay(events, nt)
        except Exception:
            return False
        if rc1 != rc2 or ct.calls != nt.calls:
            return False
    return True


try:  # optional C event-batching front-end (see _native/swishsax.c)
    from ._native import swishsax as _sax_native
except Exception:  # pragma: no cover
    _sax_native = None

if _sax_native is not None:
    try:
        if not _sax_selftest():  # pragma: no cover - host-dependent
            _sax_native = None
    except Exception:  # pragma: no cover
        _sax_native = None
