"""Per-document extraction driver: sniff -> decode -> parse -> record.

Mirrors the reference's document lifecycle (SURVEY.md §3.1):
docinfo resolution (docinfo.c:202-258), IO scrub (io.c:43-73), gzip
(io.c:154-219), parser dispatch (docparser, parser.c:1490-1557), the
TXT parser (parser.c:2599-2710) and encoding bookkeeping
(parser.c:2712-2759) — producing one ExtractionRecord per input row.

The engine consumes table rows (url + body bytes) rather than files;
``extract_document`` is the pure per-row function the Ray actor calls.
"""

from __future__ import annotations

import gzip as _gzip
from dataclasses import dataclass, field

from . import constants as C
from .config import Config
from .libxml import check_utf8, html_parse, xml_parse
from .mime import file_ext, get_mime_type, get_parser
from .sax import ExtractionState, ParseAbort, concat_buffers
from .text import scrub_nulls


@dataclass
class DocInfo:
    """swish_DocInfo (libswish3.h:321-334) minus filesystem-only bits."""
    uri: str = ""
    size: int = 0
    mime: str = ""
    encoding: str = C.DEFAULT_ENCODING
    ext: str = ""
    parser: str = ""
    nwords: int = 0
    is_gzipped: bool = False
    mtime: int = 0


@dataclass
class ExtractionRecord:
    docinfo: DocInfo
    metanames: dict[str, bytes] = field(default_factory=dict)
    properties: dict[str, bytes] = field(default_factory=dict)
    # token columns (parallel lists)
    token_values: list[bytes] = field(default_factory=list)
    token_positions: list[int] = field(default_factory=list)
    token_metas: list[str] = field(default_factory=list)
    token_contexts: list[str] = field(default_factory=list)
    token_offsets: list[int] = field(default_factory=list)
    error: str | None = None


def resolve_docinfo(cfg: Config, uri: str, size: int,
                    mime: str | None = None,
                    parser: str | None = None) -> DocInfo:
    """swish_docinfo_from_filesystem semantics applied to a url
    (docinfo.c:202-258): ext from the uri, gz detection strips to the
    inner ext, ext->MIME->parser via config tables. Explicit
    ``mime``/``parser`` columns override (the stdin-header path,
    docinfo.c:123-199)."""
    di = DocInfo(uri=uri, size=size)
    ext = file_ext(uri)
    if ext == "gz":
        di.is_gzipped = True
        inner = uri[:-3]
        ext = file_ext(inner)
    di.ext = ext if ext else "none"
    di.mime = mime if mime else get_mime_type(cfg, di.ext)
    di.parser = parser if parser else get_parser(cfg, di.mime)
    return di


class DocumentExtractor:
    """Stateful per-worker extractor: build once (config + libxml2 init
    + tokenizer tables), call per document. This is the object a Ray
    actor holds (swish_3 equivalent, swish.c:47-70)."""

    def __init__(self, config: Config | None = None,
                 swish_encoding: str = C.DEFAULT_ENCODING,
                 tokenizer=None, stemmer=None, xinclude_resolver=None):
        self.config = config if config is not None else Config.default()
        # $SWISH_ENCODING equivalent (parser.c:2610, set_encoding)
        self.swish_encoding = swish_encoding
        # analyzer hooks (libswish3.h:411-412): a custom tokenizer
        # replaces swish_tokenize (signature: fn(token_list, data,
        # meta, context) -> n_added); a stemmer maps each token value
        # (bytes -> bytes) after tokenization, like the Xapian
        # program's Xapian::Stem wiring
        self.tokenizer = tokenizer
        self.stemmer = stemmer
        # XInclude seam (process_xinclude, parser.c:990-1079): the
        # reference resolves hrefs against the filesystem; a table-
        # scale engine reads bodies from columns, so the caller
        # provides ``fn(resolved_uri: str) -> bytes | None`` (None =
        # skip, mirroring SWISH_WARN "Skipping XInclude"). With no
        # resolver, xi:include elements record an error marker row.
        self.xinclude_resolver = xinclude_resolver

    # -- encoding helpers ----------------------------------------------

    def _set_encoding(self, data: bytes) -> str:
        """set_encoding (parser.c:2712-2731)."""
        if check_utf8(data):
            return C.DEFAULT_ENCODING
        return self.swish_encoding

    @staticmethod
    def _xml_declared_encoding(data: bytes) -> str | None:
        """The encoding libxml2 records in ctxt->encoding: the XML
        declaration's encoding value, verbatim (document_encoding,
        parser.c:2733-2759)."""
        head = bytes(data[:256])  # tiny copy; data may be a view
        i = head.find(b"<?xml")
        if i < 0:
            return None
        end = head.find(b"?>", i)
        decl = head[i:end if end > 0 else len(head)]
        for quote in (b'"', b"'"):
            key = b"encoding="
            k = decl.find(key)
            if k >= 0:
                rest = decl[k + len(key):]
                if rest[:1] == quote:
                    close = rest.find(quote, 1)
                    if close > 0:
                        return rest[1:close].decode("latin-1")
        return None

    # -- main entry -----------------------------------------------------

    def extract(self, uri: str, body: bytes | memoryview,
                mime: str | None = None,
                parser: str | None = None) -> ExtractionRecord:
        """Parse one document; never raises — failures land in
        record.error (the per-row error side-channel, SURVEY.md §4).

        ``body`` may be a ZERO-COPY buffer view (pipeline's Arrow
        slice path) under the contract that a view is NUL-free — the
        no_nulls scrub (io.c:43-73) triggers only on NUL bytes, so
        the view path skips it exactly when the reference would
        no-op; NUL-carrying rows arrive as bytes (see
        pipeline._binary_views)."""
        cfg = self.config
        di = resolve_docinfo(cfg, uri, len(body), mime, parser)
        state = ExtractionState(cfg, uri=uri, tokenizer=self.tokenizer)
        if self.xinclude_resolver is not None and cfg.follow_xinclude:
            state.xinclude_cb = self._xinclude_cb(state, 0)
        rec = ExtractionRecord(docinfo=di)

        try:
            self._docparse(body, state, di)
        except ParseAbort as e:
            rec.error = str(e)
        except Exception as e:  # defensive: never kill the batch
            rec.error = f"{type(e).__name__}: {e}"

        self._finish(rec, state)
        return rec

    def _docparse(self, body: bytes, state: ExtractionState,
                  di: DocInfo) -> None:
        """docparser (parser.c:2450-2535): gunzip, NUL scrub, dispatch
        to the HTML/XML/TXT parser. Shared by extract() and XInclude
        child parses; raises ParseAbort on unparseable input."""
        if di.is_gzipped:
            try:
                body = _gzip.decompress(body)
            except Exception as e:
                raise ParseAbort(f"gzip: {e}") from e
        # io.c no_nulls: NUL and \x03 -> newline (only when a NUL
        # exists, matching the reference's guard). A memoryview body
        # is NUL-free by the zero-copy contract (extract docstring)
        # so the scrub is the same no-op it would be on the bytes.
        if isinstance(body, (bytes, bytearray)):
            body = scrub_nulls(body)
        if di.is_gzipped:
            di.size = len(body)  # docparser resets size post-gunzip

        if not body:
            # docparser: empty doc -> warn, no parse, empty record
            raise ParseAbort("empty-document")

        p0 = di.parser[:1].upper()
        if p0 == "H":
            state.is_html = True
            # html_parser (parser.c:2537-2597): docinfo encoding is
            # the env default — libxml2 does its own charset
            # switching internally
            di.encoding = self.swish_encoding
            # post-scrub bytes and contract-clean views are both
            # NUL-free, so the reference's NUL cut is a no-op split
            body_h = (body.split(b"\x00")[0]
                      if isinstance(body, (bytes, bytearray)) else body)
            html_parse(body_h, state)
        elif p0 == "X":
            xml_parse(body, state)
            enc = self._xml_declared_encoding(body)
            di.encoding = enc if enc else self.swish_encoding
        elif p0 == "T":
            self._txt_parse(body, state, di)
        else:
            raise ParseAbort(
                f"no parser known for MIME '{di.mime}' "
                f"parser '{di.parser}'")

    # -- XInclude (process_xinclude / xinclude_handler) ------------------

    _XINCLUDE_MAX_DEPTH = 16

    def _xinclude_cb(self, state: ExtractionState, depth: int):
        def cb(href: str, is_text: bool) -> None:
            self._process_xinclude(state, href, is_text, depth)
        return cb

    def _process_xinclude(self, parent: ExtractionState, href: str,
                          is_text: bool, depth: int) -> None:
        """parser.c:990-1079 (process_xinclude) + :964-988
        (xinclude_handler): flush the parent's pending buffer, parse
        the referenced doc with a fresh state sharing the parent's
        doc-local config view (the reference shares s3->config, so
        child-vivified metanames are visible to the parent), then merge
        tokens (renumbered into the parent stream), nwords, and the
        \\x03-joined buffers. The depth cap is an engine guard the
        reference lacks (a self-including doc recurses it to death)."""
        head = parent.metastack.head
        parent.flush_buffer(head.baked, head.context)
        if depth >= self._XINCLUDE_MAX_DEPTH:
            if parent.parse_error is None:
                parent.parse_error = "xinclude-depth-exceeded"
            return
        if href.startswith("/"):
            xuri = href
        else:
            # xmlBuildURI(href, dirname-with-trailing-sep) equivalent
            from urllib.parse import urljoin
            i = parent.uri.rfind("/")
            base = parent.uri[:i + 1] if i >= 0 else "./"
            xuri = urljoin(base, href)
        try:
            body = self.xinclude_resolver(xuri)
        except Exception:
            body = None
        if body is None:
            return  # SWISH_WARN("Skipping XInclude %s") — skip row-local

        di = resolve_docinfo(parent.config, xuri, len(body))
        if is_text and di.parser != C.PARSER_TXT:
            # parse="text" forces the TXT parser (parser.c:1048-1051)
            di.parser = C.PARSER_TXT
        parent._own_config()
        child = ExtractionState(parent.config, uri=xuri,
                                tokenizer=self.tokenizer)
        # share the parent's (already copied) doc-local config view so
        # vivifications propagate BOTH ways, like the reference's
        # single s3->config — while the top-level CoW still isolates
        # this whole document cluster from the actor's pristine config
        child._cfg_copied = True
        child.xinclude_cb = self._xinclude_cb(child, depth + 1)
        try:
            self._docparse(body, child, di)
        except ParseAbort:
            pass  # reference merges whatever parsed (rc is ignored)
        except Exception:
            pass

        # xinclude_handler: child tokens append with fresh consecutive
        # parent positions (swish_token_list_add_token ++pos)
        tl = child.token_list
        for v, m, c in zip(tl.values, tl.metas, tl.contexts):
            parent.token_list.add(v, m, c)
        parent.nwords += child.nwords
        concat_buffers(parent.metanames, child.metanames)
        concat_buffers(parent.properties, child.properties)
        # bubble the engine's own xinclude guard markers to the root
        # record; other child parse errors stay silent like the
        # reference (docparser rc is ignored there)
        if (child.parse_error is not None and parent.parse_error is None
                and child.parse_error.startswith("xinclude-")):
            parent.parse_error = child.parse_error

    def _txt_parse(self, body: bytes, state: ExtractionState,
                   di: DocInfo) -> None:
        """txt_parser (parser.c:2599-2710)."""
        if not isinstance(body, (bytes, bytearray)):
            body = bytes(body)  # TXT transcodes/decodes: needs bytes
        di.encoding = self._set_encoding(body)
        if di.encoding != C.DEFAULT_ENCODING:
            # reference transcodes only when the declared/env encoding
            # is latin1-ish; any other non-UTF-8 reaches the tokenizer
            # raw (and crashes the reference — we record an error and
            # transcode the same way latin1 would)
            body = body.decode("latin-1").encode("utf-8")
        elif not check_utf8(body):
            # reference would croak in swish_locale_to_wchar
            # (string.c:656-677); engine records the error row instead
            raise ParseAbort("invalid UTF-8 in TXT document under "
                             f"SWISH_ENCODING={self.swish_encoding}")
        state.metastack.push(C.DEFAULT_METANAME, C.DEFAULT_METANAME)
        state.buffer_characters(body)
        state.flush_buffer(C.DEFAULT_METANAME, C.DEFAULT_METANAME)
        state.metastack.push(C.TITLE_METANAME, C.TITLE_METANAME)
        state.buffer_characters(di.uri.encode("utf-8"))
        state.flush_buffer(C.TITLE_METANAME, C.TITLE_METANAME)

    def _finish(self, rec: ExtractionRecord,
                state: ExtractionState) -> None:
        rec.docinfo.nwords = state.nwords
        rec.metanames = {k: bytes(v) for k, v in state.metanames.items()}
        rec.properties = {k: bytes(v) for k, v in state.properties.items()}
        if self.config.enforce_property_max:
            # engine extension: truncate stored property values to
            # Property.max CHARACTERS (Swish-e 2.x
            # PropertyNamesMaxLength intent). Off by default — the
            # reference binary stores the full value even with
            # max=N configured (header.c parses it, nothing reads it).
            for name, val in rec.properties.items():
                prop = self.config.properties.get(name)
                if prop is not None and prop.max > 0:
                    try:
                        txt = val.decode("utf-8")
                        if len(txt) > prop.max:
                            rec.properties[name] = \
                                txt[:prop.max].encode("utf-8")
                    except UnicodeDecodeError:
                        rec.properties[name] = val[:prop.max]
        tl = state.token_list
        if self.stemmer is not None and tl.values:
            try:
                stem = self.stemmer
                tl.values = [stem(v) for v in tl.values]
                off = 0
                offs = []
                for v in tl.values:
                    offs.append(off)
                    off += len(v) + 1
                tl.offsets = offs
            except Exception as e:  # extract() never raises per-row
                if rec.error is None:
                    rec.error = f"stemmer: {type(e).__name__}: {e}"
        rec.token_values = tl.values
        rec.token_positions = tl.positions
        rec.token_metas = tl.metas
        rec.token_contexts = tl.contexts
        rec.token_offsets = tl.offsets
        if rec.error is None and state.parse_error is not None:
            rec.error = state.parse_error
