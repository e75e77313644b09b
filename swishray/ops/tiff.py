"""From-scratch baseline-TIFF codec (TIFF 6.0, public spec).

Decoder: both byte orders, strip-based baseline images — compression
none (1), LZW (5, MSB-first variable-width codes with the early-change
rule and the horizontal-differencing predictor), Deflate (8 "Adobe"
and the legacy 32946, per-strip zlib streams via the stdlib, same
predictor path as LZW), and PackBits (32773) — over bilevel (1-bit),
8-bit grayscale (MinIsWhite and MinIsBlack), RGB/RGBA, and
palette-color photometrics, chunky planar layout, first IFD (page 0)
of a multi-page file. Tiled layout, separate planes, 16-bit samples
and the CCITT/JPEG compressions raise NotImplementedError;
structurally corrupt files of supported flavors raise ValueError
(same two-class error taxonomy as ops/codecs.py and ops/jpeg.py,
surfaced in the multimodal stages' error column).

Encoder: minimal chunky writer (none/PackBits/LZW/Deflate + optional
predictor 2) for tests and analytic oracles; round trips are exact
(all supported compressions are lossless).

Scale shape: per-row CPU work with zero driver state, identical to
the other codecs — decode parallelizes embarrassingly under
map_batches actor pools (ops/multimodal.py).

A/B oracle: tests/test_tiff.py drives the container's libtiff.so.6
via ctypes in BOTH directions (libtiff-written strips decoded by this
module; this module's output read back via TIFFReadRGBAImage).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# tag ids (TIFF 6.0 section 8)
_T_WIDTH = 256
_T_LENGTH = 257
_T_BPS = 258
_T_COMPRESSION = 259
_T_PHOTOMETRIC = 262
_T_STRIP_OFFSETS = 273
_T_SPP = 277
_T_ROWS_PER_STRIP = 278
_T_STRIP_COUNTS = 279
_T_PLANAR = 284
_T_PREDICTOR = 317
_T_COLORMAP = 320
_T_TILE_WIDTH = 322
_T_TILE_LENGTH = 323
_T_SAMPLE_FORMAT = 339

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2,
              9: 4, 10: 8, 11: 4, 12: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i"}


def _read_ifd(blob: bytes, off: int, e: str) -> tuple[dict, int]:
    """One IFD -> ({tag: (type, count, raw_values_tuple)}, next_off)."""
    if off + 2 > len(blob):
        raise ValueError("truncated TIFF IFD")
    (n,) = struct.unpack_from(e + "H", blob, off)
    entries: dict[int, tuple] = {}
    if off + 2 + 12 * n + 4 > len(blob):
        raise ValueError("truncated TIFF IFD")
    for i in range(n):
        tag, typ, cnt = struct.unpack_from(e + "HHI",
                                           blob, off + 2 + 12 * i)
        vpos = off + 2 + 12 * i + 8
        size = _TYPE_SIZE.get(typ, 0) * cnt
        if size > 4:
            (vpos,) = struct.unpack_from(e + "I", blob, vpos)
            if vpos + size > len(blob):
                raise ValueError("TIFF tag value out of range")
        if typ in _TYPE_FMT:
            vals = struct.unpack_from(e + str(cnt) + _TYPE_FMT[typ],
                                      blob, vpos)
        elif typ == 5:  # RATIONAL
            raw = struct.unpack_from(e + f"{2 * cnt}I", blob, vpos)
            vals = tuple(zip(raw[0::2], raw[1::2]))
        else:
            vals = (blob[vpos:vpos + size],)
        entries[tag] = (typ, cnt, vals)
    (nxt,) = struct.unpack_from(e + "I", blob, off + 2 + 12 * n)
    return entries, nxt


def _tag(entries: dict, tag: int, default=None):
    if tag not in entries:
        return default
    return entries[tag][2]


try:  # optional C LZW kernel (A/B-gated at module end)
    from .._native import swishlzw as _native_lzw
except Exception:  # pragma: no cover - import-time environment
    _native_lzw = None


def _tiff_lzw(data: bytes, expected: int) -> bytes:
    if _native_lzw is not None:
        return _native_lzw.tiff_decode(data, expected)
    return _tiff_lzw_py(data, expected)


def _tiff_lzw_py(data: bytes, expected: int) -> bytes:
    """TIFF-variant LZW: MSB-first variable-width codes, clear=256,
    EOI=257, EARLY code-width change (at table size 2^w - 1, spec
    section 13 / the libtiff convention)."""
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    width = 9
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    prev: bytes | None = None
    while len(out) < expected:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated TIFF LZW strip")
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        acc &= (1 << nbits) - 1  # keep the accumulator bounded
        if code == 256:  # clear
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if code == 257:  # EOI
            break
        if prev is None:
            if code > 255:
                raise ValueError("corrupt TIFF LZW stream")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt TIFF LZW code")
        out += entry
        prev = entry
        # TIFF's "early change": the width bump lands one entry
        # earlier than GIF-style LZW (libtiff convention, probed
        # empirically against libtiff.so.6 — tests/test_tiff.py)
        if len(table) == (1 << width) - 1 and width < 12:
            width += 1
    return bytes(out[:expected])


def _packbits(data: bytes, expected: int) -> bytes:
    """PackBits (TIFF 6.0 section 9): n >= 0 -> n+1 literals,
    -127..-1 -> repeat next byte 1-n times, -128 -> no-op."""
    out = bytearray()
    pos = 0
    while len(out) < expected and pos < len(data):
        n = data[pos]
        pos += 1
        if n < 128:
            if pos + n + 1 > len(data):
                raise ValueError("truncated TIFF PackBits literal run")
            out += data[pos:pos + n + 1]
            pos += n + 1
        elif n > 128:
            if pos >= len(data):
                raise ValueError("truncated TIFF PackBits repeat run")
            out += bytes([data[pos]]) * (257 - n)
            pos += 1
    if len(out) < expected:
        raise ValueError("short TIFF PackBits strip")
    return bytes(out[:expected])


def decode_tiff(blob: bytes) -> tuple[np.ndarray, dict]:
    """Decode page 0 of a baseline strip TIFF to (h, w) grayscale or
    (h, w, 3|4) RGB(A) uint8. Palette images are expanded through
    their 16-bit ColorMap (high byte); MinIsWhite grayscale is
    inverted to the usual 0=black convention."""
    if blob[:4] == b"II*\x00":
        e = "<"
    elif blob[:4] == b"MM\x00*":
        e = ">"
    else:
        raise ValueError("not a TIFF (bad magic)")
    (ifd0,) = struct.unpack_from(e + "I", blob, 4)
    entries, nxt = _read_ifd(blob, ifd0, e)
    n_pages = 1
    seen = {ifd0}
    while nxt and nxt not in seen and n_pages < 10000:
        seen.add(nxt)
        n_pages += 1
        _, nxt = _read_ifd(blob, nxt, e)

    if _T_TILE_WIDTH in entries or _T_TILE_LENGTH in entries:
        raise NotImplementedError("tiled TIFF not supported")
    w = _tag(entries, _T_WIDTH, (0,))[0]
    h = _tag(entries, _T_LENGTH, (0,))[0]
    if not w or not h:
        raise ValueError("bad TIFF dimensions")
    spp = _tag(entries, _T_SPP, (1,))[0]
    bps = _tag(entries, _T_BPS, (1,) * spp)
    comp = _tag(entries, _T_COMPRESSION, (1,))[0]
    photo = _tag(entries, _T_PHOTOMETRIC, (1,))[0]
    planar = _tag(entries, _T_PLANAR, (1,))[0]
    predictor = _tag(entries, _T_PREDICTOR, (1,))[0]
    fmt = _tag(entries, _T_SAMPLE_FORMAT, (1,) * spp)
    if planar != 1:
        raise NotImplementedError("separate-plane TIFF not supported")
    if any(f not in (1, 4) for f in fmt):
        raise NotImplementedError("non-unsigned TIFF sample format")
    if comp in (2, 3, 4):
        raise NotImplementedError("CCITT-compressed TIFF")
    if comp in (6, 7):
        raise NotImplementedError("JPEG-in-TIFF")
    if comp not in (1, 5, 8, 32773, 32946):
        raise NotImplementedError(f"TIFF compression {comp}")
    bilevel = tuple(bps) == (1,) and spp == 1 and photo in (0, 1)
    if not bilevel and set(bps) != {8}:
        raise NotImplementedError(
            f"{max(bps)}-bit TIFF samples (only 8-bit/bilevel)")
    if photo not in (0, 1, 2, 3):
        raise NotImplementedError(
            f"TIFF photometric {photo} (YCbCr/CMYK/Lab unsupported)")
    if photo == 2 and spp not in (3, 4):
        raise ValueError("RGB TIFF needs 3 or 4 samples per pixel")
    if photo in (0, 1, 3) and spp != 1:
        raise ValueError("gray/palette TIFF needs 1 sample per pixel")

    offsets = _tag(entries, _T_STRIP_OFFSETS)
    counts = _tag(entries, _T_STRIP_COUNTS)
    if offsets is None or counts is None or len(offsets) != len(counts):
        raise ValueError("TIFF missing strip layout")
    rps = _tag(entries, _T_ROWS_PER_STRIP, (h,))[0] or h
    row_bytes = (w + 7) // 8 if bilevel else w * spp
    rows_done = 0
    rows = bytearray()
    for off, cnt in zip(offsets, counts):
        if off + cnt > len(blob):
            raise ValueError("TIFF strip out of range")
        nrows = min(rps, h - rows_done)
        if nrows <= 0:
            break
        expected = nrows * row_bytes
        raw = blob[off:off + cnt]
        if comp == 1:
            if len(raw) < expected:
                raise ValueError("short TIFF strip")
            strip = raw[:expected]
        elif comp == 5:
            strip = _tiff_lzw(raw, expected)
        elif comp in (8, 32946):
            try:
                strip = zlib.decompress(raw)
            except zlib.error as exc:
                raise ValueError(f"corrupt TIFF deflate strip: {exc}")
            if len(strip) < expected:
                raise ValueError("short TIFF deflate strip")
            strip = strip[:expected]
        else:
            strip = _packbits(raw, expected)
        if predictor == 2:
            if bilevel:
                raise ValueError("predictor on bilevel TIFF")
            a = np.frombuffer(strip, np.uint8).reshape(
                nrows, w, spp).copy()
            np.cumsum(a, axis=1, dtype=np.uint8, out=a)
            strip = a.tobytes()
        elif predictor != 1:
            raise NotImplementedError(f"TIFF predictor {predictor}")
        rows += strip
        rows_done += nrows
    if rows_done < h:
        raise ValueError("TIFF strips cover too few rows")

    meta = {"width": w, "height": h, "photometric": photo,
            "compression": comp, "n_pages": n_pages}
    if bilevel:
        bits = np.unpackbits(
            np.frombuffer(rows, np.uint8).reshape(h, row_bytes),
            axis=1)[:, :w]
        if photo == 0:  # MinIsWhite
            bits = 1 - bits
        return (bits * np.uint8(255)).astype(np.uint8), meta
    arr = np.frombuffer(rows, np.uint8).reshape(h, w, spp)
    if photo == 0:
        return (255 - arr[:, :, 0]).astype(np.uint8), meta
    if photo == 1:
        return arr[:, :, 0].copy(), meta
    if photo == 3:
        cmap = _tag(entries, _T_COLORMAP)
        if cmap is None or len(cmap) < 3 * 256:
            raise ValueError("palette TIFF missing ColorMap")
        cm = (np.asarray(cmap[:3 * 256], np.uint16)
              .reshape(3, 256).T >> 8).astype(np.uint8)
        return cm[arr[:, :, 0]], meta
    return arr.copy(), meta


# ---------------------------------------------------------------------------
# encoder (tests + analytic oracles)


def _packbits_encode(row: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(row)
    while i < n:
        j = i
        while j + 1 < n and row[j + 1] == row[j] and j - i < 127:
            j += 1
        if j > i:  # run of j-i+1 identical bytes
            out.append(257 - (j - i + 1))
            out.append(row[i])
            i = j + 1
            continue
        j = i
        while (j + 1 < n and row[j + 1] != row[j]
               and j - i < 126):
            j += 1
        if j + 1 == n:
            j = min(n - 1, i + 126)
        out.append(j - i)
        out += row[i:j + 1]
        i = j + 1
    return bytes(out)


def _tiff_lzw_encode(data: bytes) -> bytes:
    out = bytearray()
    acc = 0
    nbits = 0
    width = 9

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
        acc &= (1 << nbits) - 1

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    nxt = 258
    emit(256)  # clear
    cur = b""
    for byte in data:
        cand = cur + bytes([byte])
        if cand in table:
            cur = cand
            continue
        emit(table[cur])
        table[cand] = nxt
        nxt += 1
        # early change: the encoder table leads the decoder's by one
        # entry, so its bump lands at 2^w (decoder's at 2^w - 1)
        if nxt == (1 << width) and width < 12:
            width += 1
        if nxt >= 4094:
            emit(256)
            table = {bytes([i]): i for i in range(256)}
            nxt = 258
            width = 9
        cur = bytes([byte])
    if cur:
        emit(table[cur])
    emit(257)  # EOI
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def encode_tiff(arr: np.ndarray, compression: str = "none",
                predictor: bool = False,
                rows_per_strip: int | None = None) -> bytes:
    """Encode (h, w) grayscale or (h, w, 3|4) RGB(A) uint8 as a
    little-endian chunky strip TIFF. ``compression``: "none",
    "packbits", "lzw" or "deflate"; ``predictor`` applies horizontal
    differencing (LZW/Deflate, tag 317=2)."""
    a = np.asarray(arr, np.uint8)
    gray = a.ndim == 2
    if not gray and (a.ndim != 3 or a.shape[2] not in (3, 4)):
        raise ValueError("encode_tiff wants (h,w) or (h,w,3|4) uint8")
    comp = {"none": 1, "packbits": 32773, "lzw": 5,
            "deflate": 8}.get(compression)
    if comp is None:
        raise ValueError(f"unknown compression {compression!r}")
    if predictor and comp not in (5, 8):
        raise ValueError("predictor is an LZW/Deflate option")
    h, w = a.shape[:2]
    spp = 1 if gray else a.shape[2]
    rps = rows_per_strip or h
    pix = a.reshape(h, w, spp)
    strips = []
    for y0 in range(0, h, rps):
        chunk = pix[y0:y0 + rps]
        if predictor:
            chunk = np.concatenate(
                [chunk[:, :1], np.diff(chunk.astype(np.int16),
                                       axis=1).astype(np.uint8)],
                axis=1).astype(np.uint8)
        raw = chunk.tobytes()
        if comp == 1:
            strips.append(raw)
        elif comp == 32773:
            rb = w * spp
            strips.append(b"".join(
                _packbits_encode(raw[i:i + rb])
                for i in range(0, len(raw), rb)))
        elif comp == 8:
            strips.append(zlib.compress(raw, 6))
        else:
            strips.append(_tiff_lzw_encode(raw))

    tags = [
        (_T_WIDTH, 4, 1, [w]),
        (_T_LENGTH, 4, 1, [h]),
        (_T_BPS, 3, spp, [8] * spp),
        (_T_COMPRESSION, 3, 1, [comp]),
        (_T_PHOTOMETRIC, 3, 1, [1 if gray else 2]),
        (_T_STRIP_OFFSETS, 4, len(strips), None),  # patched below
        (_T_SPP, 3, 1, [spp]),
        (_T_ROWS_PER_STRIP, 4, 1, [rps]),
        (_T_STRIP_COUNTS, 4, len(strips), [len(s) for s in strips]),
        (_T_PLANAR, 3, 1, [1]),
    ]
    if spp == 4:
        tags.append((338, 3, 1, [2]))  # ExtraSamples: unassoc alpha
    if predictor:
        tags.append((_T_PREDICTOR, 3, 1, [2]))
    tags.sort()
    n = len(tags)
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * n + 4  # overflow values, then strips
    overflow = bytearray()
    body = bytearray(b"II*\x00" + struct.pack("<I", ifd_off))
    body += struct.pack("<H", n)
    # first pass: compute overflow placement
    strip_base = data_off
    for tag, typ, cnt, vals in tags:
        size = _TYPE_SIZE[typ] * cnt
        if size > 4:
            strip_base += size
    strip_offsets = []
    pos = strip_base
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)
    over_pos = data_off
    for tag, typ, cnt, vals in tags:
        if vals is None:
            vals = strip_offsets
        fmt = {3: "H", 4: "I"}[typ]
        size = _TYPE_SIZE[typ] * cnt
        body += struct.pack("<HHI", tag, typ, cnt)
        if size > 4:
            body += struct.pack("<I", over_pos)
            overflow += struct.pack(f"<{cnt}{fmt}", *vals)
            over_pos += size
        else:
            packed = struct.pack(f"<{cnt}{fmt}", *vals)
            body += packed + b"\x00" * (4 - len(packed))
    body += struct.pack("<I", 0)  # no next IFD
    body += overflow
    for s in strips:
        body += s
    return bytes(body)


def _native_selftest() -> bool:
    import numpy as _np
    rng = _np.random.default_rng(7)
    for n in (0, 1, 500, 20000):
        data = bytes(rng.integers(0, 8, n).astype(_np.uint8) * 31)
        enc = _tiff_lzw_encode(data)
        if _native_lzw.tiff_decode(enc, n) != _tiff_lzw_py(enc, n):
            return False
    return True


if _native_lzw is not None:
    try:
        if not _native_selftest():  # pragma: no cover
            _native_lzw = None
    except Exception:  # pragma: no cover
        _native_lzw = None
