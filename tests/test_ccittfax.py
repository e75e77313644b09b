"""CCITT T.4/T.6 fax codec unit tests (ops/ccittfax.py).

The authoritative conformance tests are the libtiff A/B suites in
tests/test_tiff.py (including an exhaustive run-length table sweep in
both directions); this file covers the pure-codec surface: roundtrips
across densities and widths, multi-make-up runs, the error taxonomy,
and fill-order reversal."""

import numpy as np
import pytest

from swishray.ops.ccittfax import (decode_ccitt, encode_g4, encode_mh,
                                   reverse_fill_order)


def _rand(rng, shape, density):
    return (rng.random(shape) < density).astype(np.uint8)


@pytest.mark.parametrize("comp,enc", [(2, encode_mh), (4, encode_g4)])
def test_roundtrip_densities(comp, enc):
    rng = np.random.default_rng(3)
    for shape in [(1, 1), (3, 7), (20, 64), (17, 301)]:
        for density in (0.0, 0.02, 0.5, 0.95, 1.0):
            img = _rand(rng, shape, density)
            out = decode_ccitt(enc(img), shape[1], shape[0], comp)
            assert np.array_equal(out, img), (comp, shape, density)


def test_multi_makeup_runs():
    # runs > 2560 need repeated extended make-up codes
    for r in (2560, 2561, 2623, 2624, 5200, 6000):
        w = r + 7
        img = np.zeros((1, w), np.uint8)
        img[0, 2:2 + r] = 1
        for comp, enc in [(2, encode_mh), (4, encode_g4)]:
            out = decode_ccitt(enc(img), w, 1, comp)
            assert np.array_equal(out, img), (comp, r)


def test_vertical_and_pass_modes_exercised():
    # staircase exercises every vertical offset; checker forces
    # horizontal; embedded islands force pass mode
    w = 40
    img = np.zeros((12, w), np.uint8)
    for y in range(12):
        img[y, 5 + y:15 + 2 * y] = 1  # drifting edges: V/VR/VL
    img[3, 25:30] = 1  # island above empty row: pass on next row
    out = decode_ccitt(encode_g4(img), w, 12, 4)
    assert np.array_equal(out, img)


def test_g3_1d_with_eols_via_tiff():
    # G3 decode is driven through decode_tiff in test_tiff.py (libtiff
    # writes the EOL-framed streams); here: EOL-prefixed MH rows decode
    from swishray.ops.ccittfax import _BitWriter, _emit_run
    img = np.array([[1, 1, 0, 0, 1], [0, 1, 1, 1, 0]], np.uint8)
    bw = _BitWriter()
    for y in range(2):
        bw.write(1, 12)  # EOL
        pos = 0
        white = True
        row = img[y]
        # white run / black run alternation
        runs = []
        cur = 0
        val = 0
        for x in range(5):
            if row[x] == val:
                cur += 1
            else:
                runs.append(cur)
                cur = 1
                val = row[x]
        runs.append(cur)
        for r in runs:
            _emit_run(bw, r, white)
            white = not white
    bw.byte_align()
    out = decode_ccitt(bytes(bw.out), 5, 2, 3)
    assert np.array_equal(out, img)


def test_error_taxonomy():
    img = (np.arange(24).reshape(4, 6) % 2).astype(np.uint8)
    good = encode_g4(img)
    with pytest.raises(ValueError):
        decode_ccitt(good[:1], 6, 4, 4)  # truncated
    with pytest.raises(ValueError):
        # horizontal mode (001) followed by a 12-zero run prefix,
        # which is no valid white code (EOL prefix mid-row)
        decode_ccitt(b"\x20\x00", 6, 4, 4)
    with pytest.raises(ValueError):
        decode_ccitt(b"\x00\x00", 6, 1, 2)  # MH row with EOL prefix
    with pytest.raises(ValueError):
        decode_ccitt(good, 6, 4, 99)  # not a fax compression id
    with pytest.raises(ValueError):
        decode_ccitt(good, 0, 4, 4)  # bad dims
    # T.6 extension code 0000001xxx -> uncompressed mode unsupported
    ext = bytes([0b00000010, 0b00000000])
    with pytest.raises(NotImplementedError, match="uncompressed"):
        decode_ccitt(ext, 6, 1, 4)


def test_mh_rows_are_byte_aligned():
    # each MH row starts on a byte boundary: decoding rows of a
    # 2-row image separately from the split stream must agree
    rng = np.random.default_rng(9)
    img = _rand(rng, (2, 37), 0.5)
    blob = encode_mh(img)
    one = encode_mh(img[:1])
    assert blob[:len(one)] == one  # row 0 encodes identically alone


def test_reverse_fill_order():
    assert reverse_fill_order(b"\x01\x80\xf0") == b"\x80\x01\x0f"
    assert reverse_fill_order(b"") == b""
    rng = np.random.default_rng(11)
    data = bytes(rng.integers(0, 256, 64).astype(np.uint8))
    assert reverse_fill_order(reverse_fill_order(data)) == data
