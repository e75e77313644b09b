"""From-scratch JPEG codec conformance (ops/jpeg.py).

Three independent angles:

1. **A/B vs libjpeg-turbo** — ``tools/jpeg_dump.c`` (compiled on
   demand against the container's libjpeg62-turbo) decodes the same
   streams with fancy upsampling off and a float IDCT; our decoder
   must match within ±1 level (IDCT rounding tolerance — measured 0
   on every corpus file). This covers REAL encoder output (the
   system's progressive and baseline JPEGs) and OUR encoder's output
   (conformance of the emitted stream itself).
2. **Progressive == sequential** — a test-only progressive encoder
   (spectral selection + successive approximation, T.81 Annex G)
   re-codes the exact quantized coefficients of a baseline stream;
   both decodes must be byte-identical, pinning the DC-first /
   DC-refine / AC-first / AC-refine decode paths deterministically
   with no dependency on system files.
3. **Error taxonomy** — corrupt streams of supported flavors raise
   ValueError; recognized-but-uncoded flavors (12-bit, lossless,
   arithmetic) raise NotImplementedError. CMYK/YCCK decodes (§5),
   A/B'd against libjpeg's raw JCS_CMYK output via the P7-4 dump.
"""

import shutil
import subprocess
import tempfile
from pathlib import Path

import numpy as np
import pytest

from swishray.ops import jpeg as J
from swishray.ops.jpeg import (ZIGZAG, decode_jpeg, encode_jpeg,
                               encode_jpeg_progressive)

# real-world JPEGs shipped with the container's system packages
# (novel inputs in the same spirit as the /usr/share/doc HTML corpus
# used by the extraction A/B) — 3 progressive + 2 baseline
_SYSTEM_JPEGS = [p for p in map(Path, [
    "/usr/share/doc/nodejs/thin-white-stripe.jpg",
    "/usr/share/doc/nodejs/full-white-stripe.jpg",
    "/usr/lib/google-cloud-sdk/platform/gsutil/third_party/requests"
    "/ext/flower-of-life.jpg",
    "/usr/lib/google-cloud-sdk/platform/google_appengine/google"
    "/appengine/tools/java/jetty12/jetty-home/modules/demo.d/root"
    "/images/webtide_logo.jpg",
]) if p.exists()]

# ITU-T T.81 Annex K.1 luminance table (quality 50), zigzag order
_Q50 = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113,
    92, 49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112,
    100, 103, 99], np.int32)[ZIGZAG]


@pytest.fixture(scope="module")
def jpeg_dump(tmp_path_factory):
    """Compile the libjpeg ground-truth dumper; skip A/B tests when
    the toolchain or libjpeg dev files are absent."""
    src = Path(__file__).resolve().parent.parent / "tools/jpeg_dump.c"
    exe = tmp_path_factory.mktemp("jpegdump") / "jpeg_dump"
    gcc = shutil.which("gcc") or shutil.which("cc")
    if gcc is None:
        pytest.skip("no C compiler for the libjpeg A/B oracle")
    r = subprocess.run([gcc, "-O2", "-o", str(exe), str(src),
                        "-ljpeg"], capture_output=True)
    if r.returncode != 0:
        pytest.skip(f"libjpeg unavailable: {r.stderr.decode()[:200]}")
    return str(exe)


def _ref_decode(exe: str, blob: bytes) -> np.ndarray:
    with tempfile.NamedTemporaryFile(suffix=".jpg") as f:
        f.write(blob)
        f.flush()
        out = subprocess.run([exe, f.name], capture_output=True,
                             check=True).stdout
    magic, dims, _maxv, data = out.split(b"\n", 3)
    w, h = map(int, dims.split())
    nc = 1 if magic == b"P5" else 3
    return np.frombuffer(data, np.uint8, h * w * nc) \
        .reshape(h, w, nc).squeeze()


def _ab(exe: str, blob: bytes, tol: int = 1) -> None:
    ref = _ref_decode(exe, blob)
    mine, _ = decode_jpeg(blob)
    assert ref.shape == mine.shape
    d = np.abs(ref.astype(np.int32) - mine.astype(np.int32))
    assert d.max() <= tol, f"max diff {d.max()} vs libjpeg"


# ---------------------------------------------------------------------------
# 1. A/B vs libjpeg


def test_ab_real_system_jpegs(jpeg_dump):
    if not _SYSTEM_JPEGS:
        pytest.skip("no system JPEGs on this container")
    progressive_seen = False
    for p in _SYSTEM_JPEGS:
        blob = p.read_bytes()
        _ab(jpeg_dump, blob)
        _, meta = decode_jpeg(blob)
        progressive_seen |= meta["progressive"]
    assert progressive_seen, "corpus lost its progressive samples"


def test_ab_own_encoder_output(jpeg_dump):
    rng = np.random.default_rng(7)
    cases = [
        (rng.integers(0, 256, (23, 37)).astype(np.uint8), {}),
        (rng.integers(0, 256, (16, 16, 3)).astype(np.uint8),
         {"subsampling": "444"}),
        (rng.integers(0, 256, (31, 33, 3)).astype(np.uint8),
         {"subsampling": "420"}),
        (rng.integers(0, 256, (40, 48, 3)).astype(np.uint8),
         {"subsampling": "420", "dri": 2}),
        (rng.integers(0, 256, (64, 64)).astype(np.uint8),
         {"qtable": _Q50}),
    ]
    for img, kw in cases:
        _ab(jpeg_dump, encode_jpeg(img, **kw))


# ---------------------------------------------------------------------------
# 2. flat-block exactness (the decode_jpeg oracle contract)


def test_flat_blocks_roundtrip_exact():
    # constant 8x8 blocks + all-8 quantizer -> bit-exact roundtrip
    rng = np.random.default_rng(3)
    vals = rng.integers(0, 256, (3, 5)).astype(np.uint8)
    img = np.repeat(np.repeat(vals, 8, 0), 8, 1)
    out, meta = decode_jpeg(encode_jpeg(img))
    assert meta == {"width": 40, "height": 24, "n_components": 1,
                    "progressive": False}
    assert np.array_equal(out, img)


def test_restart_markers_do_not_change_pixels():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (24, 40, 3)).astype(np.uint8)
    plain, _ = decode_jpeg(encode_jpeg(img))
    with_dri, _ = decode_jpeg(encode_jpeg(img, dri=1))
    assert np.array_equal(plain, with_dri)


# ---------------------------------------------------------------------------
# 3. progressive == sequential on identical coefficients (the library
# progressive encoder re-codes the baseline encoder's exact quantized
# coefficients, so both decodes must be byte-identical)


@pytest.mark.parametrize("shape", [(24, 40), (17, 25), (16, 24, 3)])
def test_progressive_equals_sequential(shape):
    rng = np.random.default_rng(sum(shape))
    img = rng.integers(0, 256, shape).astype(np.uint8)
    base, bmeta = decode_jpeg(encode_jpeg(img, qtable=_Q50))
    prog, pmeta = decode_jpeg(encode_jpeg_progressive(img, _Q50))
    assert not bmeta["progressive"] and pmeta["progressive"]
    assert np.array_equal(base, prog)


def test_progressive_stream_is_conformant(jpeg_dump):
    # libjpeg must agree with our decoder on our progressive stream
    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, (24, 24, 3)).astype(np.uint8)
    _ab(jpeg_dump, encode_jpeg_progressive(img, _Q50))


def _img_from_zigzag(zzvals) -> np.ndarray:
    """8x8 uint8 image whose flat-qtable (all-8) quantized zigzag
    coefficients are exactly ``zzvals`` (list of (zigzag_idx, coef))
    — inverse DCT of the dequantized spectrum, mid-gray DC."""
    zz = np.zeros(64, np.int32)
    for k, v in zzvals:
        zz[k] = v
    nat = np.empty(64, np.float64)
    nat[ZIGZAG] = zz * 8.0
    block = J._DCT_M.T @ nat.reshape(8, 8) @ J._DCT_M + 128.0
    img = np.clip(np.round(block), 0, 255).astype(np.uint8)
    got = J._fdct_quant(img, np.full(64, 8, np.int32))[0, 0]
    assert np.array_equal(got, zz), "crafted spectrum did not roundtrip"
    return img


def test_ac_refine_zrl_before_buffered_correction():
    """Regression: a correction bit for an already-significant coef
    (abs>=2) buffered while >15 zero-history positions are pending
    must be emitted AFTER draining the ZRLs (libjpeg
    encode_mcu_AC_refine order), or the decoder's ZRL span won't
    consume it and the stray bit corrupts the next Huffman code.
    zz[21..36] = 16 zeros, zz[37] = +-3, zz[38] = +-1 inside the
    AC 21..63 band is the minimal trigger."""
    cases = [
        [(37, 3), (38, 1)],
        [(37, -3), (38, -1)],
        [(22, 5), (40, 2), (41, 1)],          # multiple pend bits
        [(2, 3), (19, 1)],                    # band 1..20 variant
        [(21, 2), (39, 3), (56, 1)],
        [(37, 3)],                            # no later newly-sig: folds to EOB
        [(1, 2), (18, 1), (37, 3), (55, 1)],
    ]
    for c in cases:
        img = _img_from_zigzag(c)
        prog, _ = decode_jpeg(encode_jpeg_progressive(img))
        base, _ = decode_jpeg(encode_jpeg(img))
        assert np.array_equal(prog, base), c


def test_ac_refine_sparse_spectrum_fuzz():
    # random sparse zigzag spectra -- the shape that exercises long
    # zero-history runs around significant coefficients in refinement
    rng = np.random.default_rng(7)
    for _ in range(120):
        n = int(rng.integers(1, 7))
        ks = rng.choice(np.arange(1, 64), n, replace=False)
        vals = rng.integers(-6, 7, n)
        zzvals = [(int(k), int(v)) for k, v in zip(ks, vals) if v]
        img = _img_from_zigzag(zzvals)
        prog, _ = decode_jpeg(encode_jpeg_progressive(img))
        base, _ = decode_jpeg(encode_jpeg(img))
        assert np.array_equal(prog, base), zzvals


def test_ac_refine_trigger_stream_vs_libjpeg(jpeg_dump):
    # the crafted trigger stream must also decode in libjpeg itself
    img = _img_from_zigzag([(37, 3), (38, 1)])
    _ab(jpeg_dump, encode_jpeg_progressive(img))


# ---------------------------------------------------------------------------
# 4. error taxonomy


def test_error_taxonomy():
    img = np.zeros((8, 8), np.uint8)
    good = encode_jpeg(img)
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00\x00")
    with pytest.raises(ValueError):
        decode_jpeg(good[:len(good) // 2])  # truncated mid-stream
    with pytest.raises(ValueError, match="no scan"):
        decode_jpeg(good[:2] + b"\xff\xd9")
    # component count 4 with a 3-component body -> corrupt, not
    # NotImplementedError (CMYK decodes now)
    sof = good.index(b"\xff\xc0")
    cmyk = bytearray(good)
    cmyk[sof + 9] = 4
    with pytest.raises(ValueError):
        decode_jpeg(bytes(cmyk))
    prec12 = bytearray(good)
    prec12[sof + 4] = 12
    with pytest.raises(NotImplementedError, match="12-bit"):
        decode_jpeg(bytes(prec12))
    lossless = bytearray(good)
    lossless[sof + 1] = 0xC3
    with pytest.raises(NotImplementedError, match="SOF3"):
        decode_jpeg(bytes(lossless))
    # drop the DQT segment -> scan references a missing quant table
    dqt = good.index(b"\xff\xdb")
    with pytest.raises(ValueError, match="quant"):
        decode_jpeg(good[:dqt] + good[dqt + 69:])


def test_dispatch_from_decode_image():
    from swishray.ops.codecs import decode_image, sniff_image
    img = np.full((8, 16), 200, np.uint8)
    blob = encode_jpeg(img)
    assert sniff_image(blob) == "jpeg"
    arr, meta = decode_image(blob)
    assert np.array_equal(arr, img)


def test_native_and_pure_paths_agree_on_progressive():
    """The C entropy kernel's import selftest covers sequential
    streams; pin the PROGRESSIVE modes (DC/AC first + refinement)
    against the pure-Python path explicitly."""
    if J._native_jpeg is None:
        pytest.skip("native kernel unavailable")
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (24, 24, 3)).astype(np.uint8)
    blobs = [encode_jpeg_progressive(img, _Q50)]
    blobs += [p.read_bytes() for p in _SYSTEM_JPEGS[:1]]
    native = J._native_jpeg
    try:
        for blob in blobs:
            got, _ = decode_jpeg(blob)
            J._native_jpeg = None
            want, _ = decode_jpeg(blob)
            J._native_jpeg = native
            assert np.array_equal(got, want)
    finally:
        J._native_jpeg = native


def test_collector_vectorized_matches_reference_fuzz():
    rng = np.random.default_rng(3)
    for _ in range(300):
        n = int(rng.integers(0, 300))
        blob = bytes(rng.integers(0, 256, n).astype(np.uint8))
        blob = blob.replace(b"\x01", b"\xff") \
                   .replace(b"\x02", b"\xff\x00") \
                   .replace(b"\x03", b"\xff\xd3")
        for pos in (0, min(5, len(blob))):
            assert J._collect_scan_data(blob, pos) == \
                J._collect_scan_data_py(blob, pos)


# ---------------------------------------------------------------------------
# 5. CMYK / YCCK (Adobe APP14)


def _ref_decode_any(exe: str, blob: bytes):
    """Like _ref_decode but also parses the P7-4 CMYK output."""
    with tempfile.NamedTemporaryFile(suffix=".jpg") as f:
        f.write(blob)
        f.flush()
        out = subprocess.run([exe, f.name], capture_output=True,
                             check=True).stdout
    magic, dims, _maxv, data = out.split(b"\n", 3)
    w, h = map(int, dims.split())
    nc = {b"P5": 1, b"P6": 3, b"P7 4": 4}[magic]
    return np.frombuffer(data, np.uint8, h * w * nc) \
        .reshape(h, w, nc).squeeze()


def test_cmyk_flat_roundtrip_exact():
    rng = np.random.default_rng(13)
    flat = rng.integers(0, 256, (2, 3, 4)).astype(np.uint8) \
        .repeat(8, 0).repeat(8, 1)
    out, meta = decode_jpeg(encode_jpeg(flat))
    assert meta["n_components"] == 4
    assert meta["adobe_transform"] == 0
    assert np.array_equal(out, flat)


def test_ycck_roundtrip_near_exact():
    rng = np.random.default_rng(14)
    flat = rng.integers(0, 256, (2, 3, 4)).astype(np.uint8) \
        .repeat(8, 0).repeat(8, 1)
    out, meta = decode_jpeg(encode_jpeg(flat, ycck=True))
    assert meta["adobe_transform"] == 2
    d = np.abs(out.astype(np.int32) - flat.astype(np.int32))
    assert d.max() <= 1  # color-transform rounding only


@pytest.mark.parametrize("ycck", [False, True])
def test_cmyk_ab_vs_libjpeg(jpeg_dump, ycck):
    rng = np.random.default_rng(15)
    img = rng.integers(0, 256, (24, 33, 4)).astype(np.uint8)
    blob = encode_jpeg(img, ycck=ycck)
    ref = _ref_decode_any(jpeg_dump, blob)
    mine, meta = decode_jpeg(blob)
    assert ref.shape == mine.shape == (24, 33, 4)
    d = np.abs(ref.astype(np.int32) - mine.astype(np.int32))
    assert d.max() <= 1, f"max diff {d.max()} vs libjpeg (ycck={ycck})"


def test_cmyk_via_decode_image():
    from swishray.ops.codecs import decode_image
    rng = np.random.default_rng(16)
    img = rng.integers(0, 256, (16, 16, 4)).astype(np.uint8)
    arr, meta = decode_image(encode_jpeg(img))
    # documented Adobe-inverted conversion to RGB
    assert arr.shape == (16, 16, 3)
    assert meta["n_components"] == 4
