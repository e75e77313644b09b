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
from .sax import ExtractionState, ParseAbort
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
                 tokenizer=None, stemmer=None):
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
        head = data[:256]
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

    def extract(self, uri: str, body: bytes,
                mime: str | None = None,
                parser: str | None = None) -> ExtractionRecord:
        """Parse one document; never raises — failures land in
        record.error (the per-row error side-channel, SURVEY.md §4)."""
        cfg = self.config
        di = resolve_docinfo(cfg, uri, len(body), mime, parser)
        state = ExtractionState(cfg, uri=uri, tokenizer=self.tokenizer)
        rec = ExtractionRecord(docinfo=di)

        try:
            if di.is_gzipped:
                try:
                    body = _gzip.decompress(body)
                except Exception as e:
                    raise ParseAbort(f"gzip: {e}") from e
            # io.c no_nulls: NUL and \x03 -> newline (only when a NUL
            # exists, matching the reference's guard)
            body = scrub_nulls(body)
            if di.is_gzipped:
                di.size = len(body)  # docparser resets size post-gunzip

            if not body:
                # docparser: empty doc -> warn, no parse, empty record
                rec.error = "empty-document"
                self._finish(rec, state)
                return rec

            p0 = di.parser[:1].upper()
            if p0 == "H":
                state.is_html = True
                # html_parser (parser.c:2537-2597): docinfo encoding is
                # the env default — libxml2 does its own charset
                # switching internally
                di.encoding = self.swish_encoding
                html_parse(body.split(b"\x00")[0], state)
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
        except ParseAbort as e:
            rec.error = str(e)
        except Exception as e:  # defensive: never kill the batch
            rec.error = f"{type(e).__name__}: {e}"

        self._finish(rec, state)
        return rec

    def _txt_parse(self, body: bytes, state: ExtractionState,
                   di: DocInfo) -> None:
        """txt_parser (parser.c:2599-2710)."""
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
