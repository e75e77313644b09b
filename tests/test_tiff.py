"""From-scratch TIFF codec conformance (ops/tiff.py).

A/B against the container's libtiff.so.6 through ctypes, in BOTH
directions (no dev headers needed): libtiff-written strip files must
decode bit-exactly through our decoder (all supported compressions,
with and without the horizontal predictor), and our encoder's files
must read back bit-exactly through TIFFReadRGBAImage. All supported
compressions are lossless, so every comparison is exact — the one
wrinkle is that TIFFReadRGBAImage premultiplies unassociated alpha,
which the RGBA expectation reproduces.

Plus: pure roundtrips (incl. LZW code-width growth past 9/10/11 bits
and the early-change rule), big-endian + palette + bilevel +
MinIsWhite fixtures built by hand, and the corrupt-vs-uncoded error
taxonomy."""

import ctypes
import ctypes.util
import struct

import numpy as np
import pytest

from swishray.ops.tiff import (_tiff_lzw, _tiff_lzw_encode,
                               decode_tiff, encode_tiff)


@pytest.fixture(scope="module")
def libtiff():
    try:
        lt = ctypes.CDLL("libtiff.so.6")
    except OSError:
        name = ctypes.util.find_library("tiff")
        if name is None:
            pytest.skip("libtiff not available for the A/B oracle")
        lt = ctypes.CDLL(name)
    lt.TIFFOpen.restype = ctypes.c_void_p
    lt.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lt.TIFFSetWarningHandler(None)
    return lt


def _lt_write(lt, path, arr, comp, pred=False, rps=None):
    a = np.asarray(arr, np.uint8)
    gray = a.ndim == 2
    h, w = a.shape[:2]
    spp = 1 if gray else a.shape[2]
    tif = lt.TIFFOpen(str(path).encode(), b"w")
    assert tif
    for tag, val in [(256, ctypes.c_uint32(w)),
                     (257, ctypes.c_uint32(h)),
                     (258, ctypes.c_int(8)),
                     (277, ctypes.c_int(spp)),
                     (259, ctypes.c_int(comp)),
                     (262, ctypes.c_int(1 if gray else 2)),
                     (284, ctypes.c_int(1)),
                     (278, ctypes.c_uint32(rps or h))]:
        lt.TIFFSetField(ctypes.c_void_p(tif), ctypes.c_uint32(tag),
                        val)
    if pred:
        lt.TIFFSetField(ctypes.c_void_p(tif), ctypes.c_uint32(317),
                        ctypes.c_int(2))
    flat = a.reshape(h, -1)
    for y in range(h):
        r = lt.TIFFWriteScanline(ctypes.c_void_p(tif),
                                 flat[y].tobytes(),
                                 ctypes.c_uint32(y),
                                 ctypes.c_uint16(0))
        assert r == 1
    lt.TIFFClose(ctypes.c_void_p(tif))


def _lt_read_rgba(lt, path):
    tif = lt.TIFFOpen(str(path).encode(), b"r")
    assert tif
    w = ctypes.c_uint32()
    h = ctypes.c_uint32()
    lt.TIFFGetField(ctypes.c_void_p(tif), ctypes.c_uint32(256),
                    ctypes.byref(w))
    lt.TIFFGetField(ctypes.c_void_p(tif), ctypes.c_uint32(257),
                    ctypes.byref(h))
    raster = (ctypes.c_uint32 * (w.value * h.value))()
    assert lt.TIFFReadRGBAImage(ctypes.c_void_p(tif), w, h, raster,
                                ctypes.c_int(0))
    lt.TIFFClose(ctypes.c_void_p(tif))
    packed = np.frombuffer(raster, np.uint32).reshape(h.value, w.value)
    rgba = np.stack([packed & 0xFF, (packed >> 8) & 0xFF,
                     (packed >> 16) & 0xFF, (packed >> 24) & 0xFF],
                    axis=2).astype(np.uint8)
    return rgba[::-1]  # RGBAImage rasters are bottom-up


def _as_rgba(img: np.ndarray) -> np.ndarray:
    """What TIFFReadRGBAImage should produce for our encoder's file
    (4-channel input is unassociated alpha, which it premultiplies)."""
    if img.ndim == 2:
        a = np.full_like(img, 255)
        return np.stack([img, img, img, a], 2)
    if img.shape[2] == 3:
        a = np.full(img.shape[:2] + (1,), 255, np.uint8)
        return np.concatenate([img, a], 2)
    pm = np.floor(img[..., :3].astype(np.float64)
                  * img[..., 3:4].astype(np.float64) / 255.0
                  + 0.5).astype(np.uint8)
    return np.concatenate([pm, img[..., 3:4]], 2)


# ---------------------------------------------------------------------------
# roundtrips (exact: every supported compression is lossless)


@pytest.mark.parametrize("kw", [
    dict(),
    dict(compression="packbits"),
    dict(compression="lzw"),
    dict(compression="lzw", predictor=True),
    dict(compression="lzw", predictor=True, rows_per_strip=3),
    dict(compression="packbits", rows_per_strip=2),
    dict(compression="deflate"),
    dict(compression="deflate", predictor=True, rows_per_strip=3),
])
def test_roundtrip_param(kw):
    rng = np.random.default_rng(13)
    for shape in [(9, 14), (11, 7, 3), (8, 5, 4)]:
        img = rng.integers(0, 256, shape).astype(np.uint8)
        out, meta = decode_tiff(encode_tiff(img, **kw))
        assert np.array_equal(out, img)
        assert (meta["width"], meta["height"]) == (shape[1], shape[0])


def test_roundtrip_lzw_width_growth_and_reset():
    rng = np.random.default_rng(17)
    noisy = rng.integers(0, 256, (200, 300, 3)).astype(np.uint8)
    out, _ = decode_tiff(encode_tiff(noisy, compression="lzw"))
    assert np.array_equal(out, noisy)
    # raw LZW stream long enough to force the 4094 table reset
    data = bytes(rng.integers(0, 256, 60000).astype(np.uint8))
    assert _tiff_lzw(_tiff_lzw_encode(data), len(data)) == data


# ---------------------------------------------------------------------------
# hand-built fixtures for flavors our encoder doesn't emit


def _hand_tiff(e: str, tags: list[tuple[int, int, int, list[int]]],
               payload: bytes) -> bytes:
    """Minimal single-IFD TIFF with inline-or-overflow tag values;
    payload lands right after the IFD and overflow area."""
    fmtc = {3: "H", 4: "I"}
    n = len(tags)
    head = b"II*\x00" + struct.pack("<I", 8) if e == "<" \
        else b"MM\x00*" + struct.pack(">I", 8)
    over_base = 8 + 2 + 12 * n + 4
    over = bytearray()
    body = bytearray(struct.pack(e + "H", n))
    sizes = {3: 2, 4: 4}
    for tag, typ, cnt, vals in sorted(tags):
        body += struct.pack(e + "HHI", tag, typ, cnt)
        size = sizes[typ] * cnt
        if size > 4:
            body += struct.pack(e + "I", over_base + len(over))
            over += struct.pack(e + f"{cnt}{fmtc[typ]}", *vals)
        else:
            packed = struct.pack(e + f"{cnt}{fmtc[typ]}", *vals)
            body += packed + b"\x00" * (4 - len(packed))
    body += struct.pack(e + "I", 0)
    return head + bytes(body) + bytes(over) + payload


def test_big_endian_gray():
    img = np.arange(24, dtype=np.uint8).reshape(4, 6) * 10
    payload_off = 8 + 2 + 12 * 8 + 4
    blob = _hand_tiff(">", [
        (256, 4, 1, [6]), (257, 4, 1, [4]), (258, 3, 1, [8]),
        (259, 3, 1, [1]), (262, 3, 1, [1]),
        (273, 4, 1, [payload_off]), (278, 4, 1, [4]),
        (279, 4, 1, [24])], img.tobytes())
    out, meta = decode_tiff(blob)
    assert np.array_equal(out, img)


def test_min_is_white_inverts():
    img = np.array([[0, 100], [200, 255]], np.uint8)
    payload_off = 8 + 2 + 12 * 8 + 4
    blob = _hand_tiff("<", [
        (256, 4, 1, [2]), (257, 4, 1, [2]), (258, 3, 1, [8]),
        (259, 3, 1, [1]), (262, 3, 1, [0]),  # MinIsWhite
        (273, 4, 1, [payload_off]), (278, 4, 1, [2]),
        (279, 4, 1, [4])], img.tobytes())
    out, _ = decode_tiff(blob)
    assert np.array_equal(out, 255 - img)


def test_bilevel_unpacks_bits():
    # 2 rows x 10 cols of 1-bit pixels, row-padded to whole bytes
    rows = bytes([0b10110000, 0b01000000,
                  0b00000001, 0b11000000])
    payload_off = 8 + 2 + 12 * 8 + 4
    blob = _hand_tiff("<", [
        (256, 4, 1, [10]), (257, 4, 1, [2]), (258, 3, 1, [1]),
        (259, 3, 1, [1]), (262, 3, 1, [1]),
        (273, 4, 1, [payload_off]), (278, 4, 1, [2]),
        (279, 4, 1, [4])], rows)
    out, _ = decode_tiff(blob)
    want = np.array([[1, 0, 1, 1, 0, 0, 0, 0, 0, 1],
                     [0, 0, 0, 0, 0, 0, 0, 1, 1, 1]]) * 255
    assert np.array_equal(out, want.astype(np.uint8))


def test_palette_colormap():
    idx = np.array([[0, 1], [2, 3]], np.uint8)
    cmap = [0] * 768
    for i, (r, g, b) in enumerate([(255, 0, 0), (0, 255, 0),
                                   (0, 0, 255), (128, 128, 128)]):
        cmap[i] = r << 8
        cmap[256 + i] = g << 8
        cmap[512 + i] = b << 8
    payload_off = 8 + 2 + 12 * 9 + 4 + 768 * 2
    blob = _hand_tiff("<", [
        (256, 4, 1, [2]), (257, 4, 1, [2]), (258, 3, 1, [8]),
        (259, 3, 1, [1]), (262, 3, 1, [3]),
        (273, 4, 1, [payload_off]), (278, 4, 1, [2]),
        (279, 4, 1, [4]), (320, 3, 768, cmap)], idx.tobytes())
    out, _ = decode_tiff(blob)
    want = np.array([[[255, 0, 0], [0, 255, 0]],
                     [[0, 0, 255], [128, 128, 128]]], np.uint8)
    assert np.array_equal(out, want)


# ---------------------------------------------------------------------------
# A/B vs libtiff


def test_ab_libtiff_writes_we_decode(libtiff, tmp_path):
    rng = np.random.default_rng(9)
    cases = [
        (rng.integers(0, 256, (19, 23)).astype(np.uint8), 1, False,
         None),
        (rng.integers(0, 256, (60, 80)).astype(np.uint8), 5, False,
         9),
        (rng.integers(0, 256, (30, 41, 3)).astype(np.uint8), 5, True,
         7),
        (rng.integers(0, 3, (30, 41, 3)).astype(np.uint8) * 100,
         32773, False, 4),
        ((np.add.outer(np.arange(64), np.arange(96)) % 256)
         .astype(np.uint8), 5, True, None),
        (rng.integers(0, 256, (33, 27)).astype(np.uint8), 8, False,
         None),
        (rng.integers(0, 256, (40, 52, 3)).astype(np.uint8), 8, True,
         5),
    ]
    for i, (img, comp, pred, rps) in enumerate(cases):
        p = tmp_path / f"ref{i}.tif"
        _lt_write(libtiff, p, img, comp, pred, rps)
        out, meta = decode_tiff(p.read_bytes())
        assert meta["compression"] == comp
        assert np.array_equal(out, img), f"case {i}"


def test_ab_we_encode_libtiff_reads(libtiff, tmp_path):
    rng = np.random.default_rng(21)
    cases = [
        (rng.integers(0, 256, (49, 53)).astype(np.uint8),
         dict(compression="lzw")),
        (rng.integers(0, 256, (30, 41, 3)).astype(np.uint8),
         dict(compression="lzw", predictor=True, rows_per_strip=6)),
        (rng.integers(0, 256, (12, 9, 4)).astype(np.uint8),
         dict(compression="packbits")),
        (rng.integers(0, 256, (100, 120, 3)).astype(np.uint8),
         dict(compression="lzw")),
        (rng.integers(0, 256, (7, 11)).astype(np.uint8), dict()),
        (rng.integers(0, 256, (25, 33)).astype(np.uint8),
         dict(compression="deflate")),
        (rng.integers(0, 256, (18, 22, 3)).astype(np.uint8),
         dict(compression="deflate", predictor=True,
              rows_per_strip=4)),
    ]
    for i, (img, kw) in enumerate(cases):
        p = tmp_path / f"own{i}.tif"
        p.write_bytes(encode_tiff(img, **kw))
        assert np.array_equal(_lt_read_rgba(libtiff, p),
                              _as_rgba(img)), f"case {i}"


# ---------------------------------------------------------------------------
# error taxonomy + dispatch


def test_error_taxonomy():
    img = np.zeros((4, 4), np.uint8)
    good = encode_tiff(img)
    with pytest.raises(ValueError, match="magic"):
        decode_tiff(b"XX\x00\x00")
    with pytest.raises(ValueError):
        decode_tiff(good[:20])  # truncated IFD
    with pytest.raises(ValueError, match="strip"):
        decode_tiff(good[:-8])  # strip data out of range
    payload_off = 8 + 2 + 12 * 9 + 4

    def variant(override):
        tags = dict([(256, (4, 1, [4])), (257, (4, 1, [4])),
                     (258, (3, 1, [8])), (259, (3, 1, [1])),
                     (262, (3, 1, [1])), (273, (4, 1, [payload_off])),
                     (277, (3, 1, [1])), (278, (4, 1, [4])),
                     (279, (4, 1, [16]))])
        tags.update(override)
        return _hand_tiff("<", [(t, *v) for t, v in tags.items()],
                          bytes(16))

    with pytest.raises(NotImplementedError, match="tiled"):
        decode_tiff(variant({322: (4, 1, [16])}))
    with pytest.raises(NotImplementedError, match="16-bit"):
        decode_tiff(variant({258: (3, 1, [16])}))
    with pytest.raises(NotImplementedError, match="CCITT"):
        decode_tiff(variant({259: (3, 1, [4])}))
    with pytest.raises(ValueError, match="deflate"):
        decode_tiff(variant({259: (3, 1, [8])}))  # garbage zlib strip
    with pytest.raises(NotImplementedError, match="JPEG"):
        decode_tiff(variant({259: (3, 1, [7])}))
    with pytest.raises(NotImplementedError, match="photometric 6"):
        decode_tiff(variant({262: (3, 1, [6])}))
    with pytest.raises(NotImplementedError, match="separate-plane"):
        decode_tiff(variant({284: (3, 1, [2])}))


def test_dispatch_from_decode_image():
    from swishray.ops.codecs import decode_image, sniff_image
    img = np.arange(64, dtype=np.uint8).reshape(8, 8) * 3
    blob = encode_tiff(img, compression="lzw")
    assert sniff_image(blob) == "tiff"
    arr, meta = decode_image(blob)
    assert meta["format"] == "tiff"
    assert np.array_equal(arr, img)


def test_lzw_decode_is_linear_time():
    """Regression: the decode bit-accumulator must stay bounded — an
    unmasked accumulator makes decode QUADRATIC (a 0.26 MP noise
    image took 250+ s before the fix, ~0.5 s after)."""
    import time
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (512, 512, 3)).astype(np.uint8)
    blob = encode_tiff(img, compression="lzw")
    t0 = time.time()
    out, _ = decode_tiff(blob)
    assert np.array_equal(out, img)
    assert time.time() - t0 < 15  # generous; quadratic took >250 s
