"""From-scratch VP8L (WebP lossless) decoder conformance
(ops/webp.py), A/B against the container's libwebp.so.7 via ctypes:
libwebp encodes a content matrix chosen to exercise every bitstream
feature (plain literals, LZ77 + color cache, meta prefix groups on
large images, predictor + color transforms on smooth content,
subtract-green, palette packing at 1/2/4/8 indices per byte), and our
decoder must match libwebp's own decode BIT-EXACTLY. The comparison
target is libwebp's decode, not the source pixels — with the default
(non-exact) encoder, fully-transparent pixels may legally change RGB.

Also pins the generated 120-entry LZ77 distance-mapping table against
libwebp's kCodeToPlane bytes, and the corrupt-vs-uncoded taxonomy."""

import ctypes
import ctypes.util

import numpy as np
import pytest

from swishray.ops.webp import _DIST_MAP, decode_webp


@pytest.fixture(scope="module")
def libwebp():
    try:
        lw = ctypes.CDLL("libwebp.so.7")
    except OSError:
        name = ctypes.util.find_library("webp")
        if name is None:
            pytest.skip("libwebp not available for the A/B oracle")
        lw = ctypes.CDLL(name)
    lw.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
    lw.WebPEncodeLosslessRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_void_p)]
    lw.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
    return lw


def _encode(lw, img: np.ndarray) -> bytes:
    h, w = img.shape[:2]
    rgba = img if img.shape[2] == 4 else np.concatenate(
        [img, np.full((h, w, 1), 255, np.uint8)], 2)
    out = ctypes.c_void_p()
    size = lw.WebPEncodeLosslessRGBA(rgba.tobytes(), w, h, w * 4,
                                     ctypes.byref(out))
    assert size > 0
    return ctypes.string_at(out, size)


def _ref_decode(lw, blob: bytes) -> np.ndarray:
    w = ctypes.c_int()
    h = ctypes.c_int()
    buf = lw.WebPDecodeRGBA(blob, ctypes.c_size_t(len(blob)),
                            ctypes.byref(w), ctypes.byref(h))
    assert buf
    return np.ctypeslib.as_array(
        buf, shape=(h.value, w.value, 4)).copy()


def _cases():
    rng = np.random.default_rng(11)
    grad = np.add.outer(np.arange(50), np.arange(60)) % 256
    return {
        "noise_rgba": rng.integers(0, 256, (10, 12, 4)),
        "noise_rgb": rng.integers(0, 256, (24, 17, 3)),
        "gradient": (np.add.outer(np.arange(60), np.arange(80))
                     [..., None] * np.array([1, 2, 3]) // 3 % 256),
        "palette_2": rng.integers(0, 2, (33, 51, 3)) * 255,
        "palette_4": rng.integers(0, 4, (40, 30, 3)) * 85,
        "palette_16": rng.integers(0, 16, (23, 37, 3)) * 17,
        "palette_200": (rng.integers(0, 200, (40, 40))[..., None]
                        * np.array([1, 1, 1])),
        "photoish": np.clip(np.cumsum(np.cumsum(
            rng.normal(0, 2, (100, 150, 3)), 0), 1) % 256, 0, 255),
        "big_noise_meta": rng.integers(0, 256, (300, 400, 3)),
        "big_photoish": np.clip(np.cumsum(np.cumsum(
            rng.normal(0, 1.5, (256, 384, 3)), 0), 1) % 256, 0, 255),
        "alpha_gradient": np.dstack(
            [rng.integers(0, 256, (50, 60, 3)).astype(np.uint8),
             grad.astype(np.uint8)]),
        "one_pixel": np.array([[[7, 8, 9, 200]]]),
        "tall": rng.integers(0, 3, (200, 3, 3)) * 100,
        "wide_runs": rng.integers(0, 5, (2, 500, 3)) * 50,
    }


def test_ab_vs_libwebp(libwebp):
    seen_transforms = set()
    for name, img in _cases().items():
        blob = _encode(libwebp, img.astype(np.uint8))
        ref = _ref_decode(libwebp, blob)
        got, meta = decode_webp(blob)
        assert got.shape == ref.shape, name
        assert np.array_equal(got, ref), name
        seen_transforms.add(meta["n_transforms"])
    # the matrix must exercise both transform-free and multi-transform
    # streams, else the A/B is weaker than it claims
    assert 0 in seen_transforms and 2 in seen_transforms


def test_distance_map_matches_libwebp_table():
    """The generated table must equal libwebp's kCodeToPlane (each
    byte (dy << 4) | (8 - dx)); search the shared object for the
    120-byte sequence."""
    import pathlib
    so = pathlib.Path("/lib/x86_64-linux-gnu/libwebp.so.7")
    if not so.exists():
        pytest.skip("no libwebp shared object to scan")
    enc = bytes(((dy << 4) | (8 - dx)) & 0xFF for dx, dy in _DIST_MAP)
    assert len(enc) == 120
    assert enc in so.read_bytes()


def test_error_taxonomy():
    with pytest.raises(ValueError, match="RIFF"):
        decode_webp(b"NOPE")
    with pytest.raises(ValueError, match="image chunk"):
        decode_webp(b"RIFF\x00\x00\x00\x00WEBP")
    with pytest.raises(ValueError, match="truncated VP8"):
        decode_webp(b"RIFF\x10\x00\x00\x00WEBP"
                    b"VP8 \x04\x00\x00\x00abcd")
    with pytest.raises(NotImplementedError, match="interframe"):
        # odd tag byte = inter frame; stills are always keyframes
        decode_webp(b"RIFF\x16\x00\x00\x00WEBP"
                    b"VP8 \x0a\x00\x00\x00\x01\x00\x00"
                    b"\x9d\x01\x2a\x10\x00\x10\x00")
    with pytest.raises(ValueError, match="signature"):
        decode_webp(b"RIFF\x0c\x00\x00\x00WEBP"
                    b"VP8L\x04\x00\x00\x00zzzz")
    with pytest.raises(ValueError, match="truncated"):
        decode_webp(b"RIFF\x0c\x00\x00\x00WEBP"
                    b"VP8L\x04\x00\x00\x00\x2f\x01\x00\x10")


def test_dispatch_from_decode_image(libwebp):
    from swishray.ops.codecs import decode_image, sniff_image
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (9, 11, 3)).astype(np.uint8)
    blob = _encode(libwebp, img)
    assert sniff_image(blob) == "webp"
    arr, meta = decode_image(blob)
    assert meta["format"] == "webp"
    assert np.array_equal(arr, _ref_decode(libwebp, blob))


def test_native_and_pure_paths_agree(libwebp):
    import swishray.ops.webp as W
    if W._native_webp is None:
        pytest.skip("native kernel unavailable")
    native = W._native_webp
    try:
        for name, img in _cases().items():
            blob = _encode(libwebp, img.astype(np.uint8))
            got, _ = decode_webp(blob)
            W._native_webp = None
            want, _ = decode_webp(blob)
            W._native_webp = native
            assert np.array_equal(got, want), name
    finally:
        W._native_webp = native


def test_own_encoder_roundtrip_and_conformance(libwebp):
    """encode_webp (literal-only VP8L) must roundtrip exactly through
    OUR decoder and through libwebp — a second independent writer for
    the code-length-coded prefix path, alongside libwebp's output."""
    from swishray.ops.webp import encode_webp
    rng = np.random.default_rng(9)
    cases = [rng.integers(0, 256, (13, 17)),
             rng.integers(0, 256, (40, 33, 3)),
             rng.integers(0, 256, (18, 28, 4)),
             np.dstack([rng.integers(0, 256, (5, 5, 3)),
                        np.full((5, 5), 200)]),
             np.array([[[1, 2, 3, 4]]])]
    for img in (c.astype(np.uint8) for c in cases):
        blob = encode_webp(img)
        got, _ = decode_webp(blob)
        if img.ndim == 2:
            want = np.dstack([img] * 3 + [np.full_like(img, 255)])
        elif img.shape[2] == 3:
            want = np.concatenate(
                [img, np.full(img.shape[:2] + (1,), 255, np.uint8)], 2)
        else:
            want = img
        assert np.array_equal(got, want)
        assert np.array_equal(_ref_decode(libwebp, blob), want)
