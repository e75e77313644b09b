"""Scalar text helpers with reference-exact semantics.

These reproduce the byte-level behavior of src/libswish3/string.c and
src/libswish3/io.c under the authoritative C.utf8 locale.  All buffer
operations are on *bytes* (the extraction buffers are byte-exact
deliverables); str-level helpers exist for tag names and tokens.
"""

from __future__ import annotations

from ._uniprops import LOWER_MAP

# Byte-level whitespace per glibc isspace() in C/C.utf8 for bytes
# (string.c:542-590 uses byte-wise isspace; bytes >= 0x80 are never
# whitespace in this locale).
_ASCII_WS = b" \t\n\v\f\r"
_WS_SET = frozenset(_ASCII_WS)

# ctrl_to_ws table: bytes < 32 -> space (string.c:592-607)
_CTRL_TO_WS = bytes(0x20 if b < 32 else b for b in range(256))

# no_nulls table: NUL and \x03 -> newline (io.c:43-73)
_NO_NULLS = bytes.maketrans(b"\x00\x03", b"\n\n")


def is_ascii(data: bytes) -> bool:
    """string.c:259 swish_is_ascii — no byte >= 0x80."""
    return data.isascii()


def str_all_ws(data: bytes) -> bool:
    """string.c:569-590 — every byte is ASCII whitespace.

    Caller note: the reference uses xmlStrlen, stopping at the first
    NUL; our buffers never contain NULs (scrubbed at the IO layer).
    """
    return all(b in _WS_SET for b in data)


def skip_ws(data: bytes) -> bytes:
    """string.c:542-550 — drop leading ASCII whitespace."""
    return data.lstrip(_ASCII_WS)


def trim_ws(data: bytes) -> bytes:
    """string.c:558-567 — drop trailing ASCII whitespace."""
    return data.rstrip(_ASCII_WS)


def ctrl_to_ws(data: bytes) -> bytes:
    """string.c:592-607 — control bytes (<32) become spaces, but ONLY
    when the string is pure ASCII (the reference early-returns for
    non-ASCII input: "TODO utf8-safe")."""
    if not data.isascii():
        return data
    return data.translate(_CTRL_TO_WS)


def clean_wsp(data: bytes) -> bytes:
    """The cleanwsp sequence of namedbuffer.c:221-232:
    ctrl_to_ws, then skip leading ws, then trim trailing ws."""
    return trim_ws(skip_ws(ctrl_to_ws(data)))


def scrub_nulls(data: bytes) -> bytes:
    """io.c:43-73 no_nulls — replace embedded NUL and \\x03 bytes with
    newlines, but ONLY when at least one NUL exists (the reference
    scans only if xmlStrlen(buffer) < bytes_read)."""
    if b"\x00" in data:
        return data.translate(_NO_NULLS)
    return data


def glibc_lower(s: str) -> str:
    """swish_str_tolower (string.c:478-531): ASCII fast path tolower,
    else per-codepoint glibc towlower (never expands)."""
    if s.isascii():
        return s.lower()
    return s.translate(LOWER_MAP)
