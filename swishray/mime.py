"""ext -> MIME -> parser resolution (mime_types.c:235-274)."""

from __future__ import annotations

from . import constants as C
from .config import Config


def get_mime_type(cfg: Config, ext: str) -> str:
    """mime_types.c:235-249 — unknown ext falls back to text/html."""
    return cfg.mimes.get(ext, C.DEFAULT_MIME)


def get_parser(cfg: Config, mime: str) -> str:
    """mime_types.c:252-274 — unknown MIME falls back to the 'default'
    parser entry (HTML)."""
    p = cfg.parsers.get(mime)
    if p is None:
        return cfg.parsers.get(C.DEFAULT_PARSER, C.DEFAULT_PARSER_TYPE)
    return p


def file_ext(uri: str) -> str:
    """swish_fs_get_file_ext (fs.c:130-159): lowercased text after the
    last '.' in the last path segment; '' when missing (docinfo.c
    fills 'none')."""
    seg = uri.rsplit("/", 1)[-1]
    if "." in seg:
        from .text import glibc_lower
        return glibc_lower(seg.rsplit(".", 1)[-1])
    return ""
