"""From-scratch codec conformance (ops/codecs.py): spec-level PNG
filter math against hand-computed expectations, real-world corpus
sweeps, independent cross-checks (stdlib ``wave`` as the WAV writer),
and the corrupt-vs-unsupported error taxonomy."""

import struct
import zlib
from pathlib import Path

import numpy as np
import pytest

from swishray.ops import codecs
from swishray.ops.codecs import (PNG_SIG, _png_chunk, _unfilter_py,
                                 decode_bmp, decode_image, decode_png,
                                 decode_ppm, decode_wav, decode_y4m,
                                 encode_png, encode_y4m)


# ---------------------------------------------------------------------------
# PNG filter inverses: hand-computed per the spec (section 9)


def _recon(filter_type: int, row: bytes, prev: bytes, fbpp: int):
    raw = bytes([0]) + prev + bytes([filter_type]) + row
    return _unfilter_py(raw, 2, len(row), fbpp)[1]


def test_filter_sub_by_hand():
    # recon[x] = filt[x] + recon[x - fbpp]; fbpp=2
    # filt = 10 20 30 40 50 60 -> recon = 10 20 40 60 90 120
    out = _recon(1, bytes([10, 20, 30, 40, 50, 60]), bytes(6), 2)
    assert list(out) == [10, 20, 40, 60, 90, 120]
    # wraparound mod 256
    out = _recon(1, bytes([200, 200, 200]), bytes(3), 1)
    assert list(out) == [200, 144, 88]


def test_filter_up_by_hand():
    out = _recon(2, bytes([5, 250, 7]), bytes([10, 10, 10]), 1)
    assert list(out) == [15, 4, 17]


def test_filter_average_by_hand():
    # recon[x] = filt[x] + floor((left + up) / 2); fbpp=1
    # prev = 4 8 12; filt = 1 2 3
    # x0: 1 + (0+4)//2 = 3; x1: 2 + (3+8)//2 = 7; x2: 3 + (7+12)//2 = 12
    out = _recon(3, bytes([1, 2, 3]), bytes([4, 8, 12]), 1)
    assert list(out) == [3, 7, 12]


def test_filter_paeth_by_hand():
    # prev = 10 20 30; filt = 1 1 1; fbpp=1
    # x0: a=0 b=10 c=0 -> p=10, pa=10 pb=0 pc=10 -> pred=b=10 -> 11
    # x1: a=11 b=20 c=10 -> p=21, pa=10 pb=1 pc=11 -> pred=b=20 -> 21
    # x2: a=21 b=30 c=20 -> p=31, pa=10 pb=1 pc=11 -> pred=b=30 -> 31
    out = _recon(4, bytes([1, 1, 1]), bytes([10, 20, 30]), 1)
    assert list(out) == [11, 21, 31]
    # tie-break order: a wins ties, then b (spec)
    # a=5 b=5 c=5 -> p=5, all distances 0 -> pred=a
    raw = bytes([1, 5, 4, 0])  # row0: Sub -> recon 5; row1 Paeth...
    out = _recon(4, bytes([100]), bytes([0]), 1)
    # a=0 b=0 c=0 -> pred=0 -> 100
    assert list(out) == [100]


def test_native_unfilter_matches_python_fuzz():
    if codecs._native_png is None:
        pytest.skip("no C compiler on host")
    rng = np.random.RandomState(20260819)
    for _ in range(25):
        h = int(rng.randint(1, 12))
        fbpp = int(rng.choice([1, 2, 3, 4, 6, 8]))
        w = int(rng.randint(1, 20))
        stride = w * fbpp
        raw = bytearray()
        for _y in range(h):
            raw.append(int(rng.randint(0, 5)))
            raw += rng.randint(0, 256, stride, dtype=np.uint8).tobytes()
        want = _unfilter_py(bytes(raw), h, stride, fbpp)
        got = np.frombuffer(
            codecs._native_png.unfilter(bytes(raw), h, stride, fbpp),
            np.uint8).reshape(h, stride)
        assert (want == got).all()


# ---------------------------------------------------------------------------
# PNG end-to-end


def test_png_roundtrip_all_channel_counts():
    rng = np.random.RandomState(0)
    for c in (1, 2, 3, 4):
        a = rng.randint(0, 256, (13, 17, c), dtype=np.uint8)
        d, meta = decode_png(encode_png(a))
        assert (d == a).all() and meta["width"] == 17
    a16 = rng.randint(0, 65536, (5, 7, 3)).astype(np.uint16)
    d, _ = decode_png(encode_png(a16))
    assert d.dtype == np.uint16 and (d == a16).all()


def _hand_png(ihdr_args, chunks, idat_raw):
    """Build a PNG byte-by-byte (independent of encode_png's layout
    choices): explicit IHDR fields, extra chunks, raw filtered data."""
    out = bytearray(PNG_SIG)
    out += _png_chunk(b"IHDR", struct.pack(">IIBBBBB", *ihdr_args))
    for typ, data in chunks:
        out += _png_chunk(typ, data)
    out += _png_chunk(b"IDAT", zlib.compress(idat_raw))
    out += _png_chunk(b"IEND", b"")
    return bytes(out)


def test_png_palette_and_trns():
    # 3x2, 8-bit palette, 3 entries; tRNS covers the first 2
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    idat = bytes([0, 0, 1, 2, 0, 2, 1, 0])  # two filtered rows
    blob = _hand_png((3, 2, 8, 3, 0, 0, 0),
                     [(b"PLTE", plte), (b"tRNS", bytes([10, 200]))],
                     idat)
    arr, meta = decode_png(blob)
    assert arr.shape == (2, 3, 4)
    assert arr[0, 0].tolist() == [255, 0, 0, 10]
    assert arr[0, 1].tolist() == [0, 255, 0, 200]
    assert arr[0, 2].tolist() == [0, 0, 255, 255]  # alpha defaults 255
    assert arr[1].tolist() == [[0, 0, 255, 255], [0, 255, 0, 200],
                               [255, 0, 0, 10]]


def test_png_1bit_gray_scaling():
    # 10 pixels of 1-bit gray in one row: bits 1100110011 -> 255/0
    row = np.packbits([1, 1, 0, 0, 1, 1, 0, 0, 1, 1]).tobytes()
    blob = _hand_png((10, 1, 1, 0, 0, 0, 0), [], bytes([0]) + row)
    arr, _ = decode_png(blob)
    assert arr[0, :, 0].tolist() == [255, 255, 0, 0, 255, 255, 0, 0,
                                     255, 255]


def test_png_4bit_palette():
    plte = b"".join(bytes([i * 16, i, 0]) for i in range(16))
    # 3 pixels -> nibbles 0xA, 0x3, 0x7 packed into 2 bytes
    row = bytes([0xA3, 0x70])
    blob = _hand_png((3, 1, 4, 3, 0, 0, 0), [(b"PLTE", plte)],
                     bytes([0]) + row)
    arr, _ = decode_png(blob)
    assert arr[0].tolist() == [[160, 10, 0], [48, 3, 0], [112, 7, 0]]


def test_png_gray_trns_key():
    idat = bytes([0, 7, 9, 7])
    blob = _hand_png((3, 1, 8, 0, 0, 0, 0),
                     [(b"tRNS", struct.pack(">H", 7))], idat)
    arr, _ = decode_png(blob)
    assert arr.shape == (1, 3, 2)
    assert arr[0, :, 1].tolist() == [0, 255, 0]


def test_png_interlaced_real_file():
    p = Path("/usr/share/doc/libpng-dev/examples/pngtest.png")
    if not p.exists():
        pytest.skip("fixture PNG not on host")
    arr, meta = decode_png(p.read_bytes())
    assert meta["interlaced"] and arr.shape == (69, 91, 4)
    # pin the decoded content; re-encode/decode must agree
    assert int(arr.astype(np.int64).sum()) == 1407977
    d2, _ = decode_png(encode_png(arr))
    assert (d2 == arr).all()


def test_png_real_corpus_sample():
    paths = sorted(Path("/usr/share").rglob("*.png"))[::13][:300]
    if not paths:
        pytest.skip("no PNGs on host")
    for p in paths:
        arr, meta = decode_png(p.read_bytes())
        assert arr.shape[0] == meta["height"]
        assert arr.shape[1] == meta["width"]


def test_png_corruption_taxonomy():
    good = encode_png(np.zeros((4, 4, 3), np.uint8))
    # flipped IDAT byte -> CRC mismatch -> ValueError
    bad = bytearray(good)
    bad[len(good) // 2] ^= 0xFF
    with pytest.raises(ValueError):
        decode_png(bytes(bad))
    with pytest.raises(ValueError):
        decode_png(good[:30])  # truncated
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"\x89PNG but not really")
    # bad filter type inside valid zlib/chunks
    blob = _hand_png((2, 1, 8, 0, 0, 0, 0), [], bytes([9, 1, 2]))
    with pytest.raises(ValueError, match="filter"):
        decode_png(blob)
    # JPEG/GIF/TIFF/WebP are SUPPORTED: corrupt file -> ValueError
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0 fake jpeg")
    with pytest.raises(ValueError):
        decode_image(b"GIF89a fake")
    with pytest.raises(ValueError):
        decode_image(b"II*\x00 fake tiff")
    with pytest.raises(ValueError):
        decode_image(b"RIFF\x00\x00\x00\x00WEBP")  # no image chunk
    # ...lossy (VP8) WebP is SUPPORTED now: corrupt -> ValueError
    with pytest.raises(ValueError, match="truncated VP8"):
        decode_image(b"RIFF\x10\x00\x00\x00WEBP"
                     b"VP8 \x04\x00\x00\x00abcd")
    # animated WebP stays recognized-and-uncoded
    with pytest.raises(NotImplementedError, match="animated"):
        decode_image(b"RIFF\x10\x00\x00\x00WEBP"
                     b"ANIM\x04\x00\x00\x00abcd")
    with pytest.raises(NotImplementedError):
        decode_image(b"\x00\x01unknown")


# ---------------------------------------------------------------------------
# BMP


def _hand_bmp24(pixels, top_down=False):
    h, w, _ = pixels.shape
    rowsize = ((24 * w + 31) // 32) * 4
    body = bytearray()
    rows = pixels if top_down else pixels[::-1]
    for y in range(h):
        r = rows[y][..., ::-1].tobytes()  # BGR
        body += r + bytes(rowsize - len(r))
    hdr_h = -h if top_down else h
    dib = struct.pack("<IiiHHIIiiII", 40, w, hdr_h, 1, 24, 0,
                      len(body), 2835, 2835, 0, 0)
    off = 14 + 40
    head = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    return head + dib + bytes(body)


def test_bmp_24bit_bottom_up_and_top_down():
    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, (5, 3, 3), dtype=np.uint8)
    for td in (False, True):
        arr, meta = decode_bmp(_hand_bmp24(px, top_down=td))
        assert (arr == px).all()
        assert meta["width"] == 3 and meta["height"] == 5


def test_bmp_8bit_palette():
    # 2x2 indexed image, palette entries stored BGRA
    pal = bytes([0, 0, 255, 0,  0, 255, 0, 0])  # red, green (as RGB)
    idx_rows = bytes([1, 0, 0, 0]) + bytes([0, 1, 0, 0])  # padded to 4
    dib = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 8, 0, 8,
                      0, 0, 2, 0)
    off = 14 + 40 + 8
    blob = (b"BM" + struct.pack("<IHHI", off + 8, 0, 0, off)
            + dib + pal + idx_rows)
    arr, _ = decode_bmp(blob)
    # bottom-up: file row 0 is image row 1
    assert arr[1].tolist() == [[0, 255, 0], [255, 0, 0]]
    assert arr[0].tolist() == [[255, 0, 0], [0, 255, 0]]


def test_bmp_errors():
    with pytest.raises(ValueError, match="magic"):
        decode_bmp(b"XX")
    good = _hand_bmp24(np.zeros((2, 2, 3), np.uint8))
    with pytest.raises(ValueError):
        decode_bmp(good[:40])


# ---------------------------------------------------------------------------
# PPM / PGM


def test_ppm_binary_and_ascii_agree():
    rng = np.random.RandomState(5)
    px = rng.randint(0, 256, (4, 6, 3), dtype=np.uint8)
    p6 = b"P6\n# a comment\n6 4\n255\n" + px.tobytes()
    vals = " ".join(str(v) for v in px.reshape(-1))
    p3 = f"P3\n6 4 # dims\n255\n{vals}\n".encode()
    a6, _ = decode_ppm(p6)
    a3, _ = decode_ppm(p3)
    assert (a6 == px).all() and (a3 == px).all()


def test_pgm_maxval_scaling_and_16bit():
    p5 = b"P5\n3 1\n15\n" + bytes([0, 7, 15])
    arr, meta = decode_ppm(p5)
    assert arr[0, :, 0].tolist() == [0, 119, 255]  # *255//15
    big = np.array([[0, 1000, 65535]], np.uint16)
    p5_16 = b"P5\n3 1\n65535\n" + big.astype(">u2").tobytes()
    a16, _ = decode_ppm(p5_16)
    assert a16.dtype == np.uint16 and (a16[..., 0] == big).all()


# ---------------------------------------------------------------------------
# WAV — stdlib `wave` is the INDEPENDENT writer


def _stdlib_wav(samples: np.ndarray, rate: int, sampwidth: int,
                ch: int) -> bytes:
    import io
    import wave
    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(ch)
    w.setsampwidth(sampwidth)
    w.setframerate(rate)
    w.writeframes(samples.tobytes())
    w.close()
    return buf.getvalue()


def test_wav_16bit_stereo_cross_check():
    rng = np.random.RandomState(11)
    s = rng.randint(-32768, 32768, (500, 2)).astype("<i2")
    arr, meta = decode_wav(_stdlib_wav(s, 16000, 2, 2))
    assert meta["sample_rate"] == 16000 and meta["channels"] == 2
    assert (arr == s).all()


def test_wav_8_and_24_bit():
    rng = np.random.RandomState(12)
    s8 = rng.randint(0, 256, 100, dtype=np.uint8)
    arr, meta = decode_wav(_stdlib_wav(s8, 8000, 1, 1))
    assert meta["bits_per_sample"] == 8 and (arr[:, 0] == s8).all()
    # 24-bit: stdlib wave writes sampwidth-3 frames verbatim
    vals = np.array([0, 1, -1, 8388607, -8388608, 123456], np.int32)
    le = vals.astype("<i4").view(np.uint8).reshape(-1, 4)[:, :3]
    arr, meta = decode_wav(_stdlib_wav(le, 44100, 3, 1))
    assert meta["bits_per_sample"] == 24
    assert arr[:, 0].tolist() == vals.tolist()


def test_wav_float_and_errors():
    # hand-build an IEEE-float WAV (fmt tag 3)
    s = np.array([0.5, -0.25, 1.0], "<f4")
    fmt = struct.pack("<HHIIHH", 3, 1, 48000, 48000 * 4, 4, 32)
    data = s.tobytes()
    blob = (b"RIFF" + struct.pack("<I", 4 + 24 + 8 + len(data))
            + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    arr, meta = decode_wav(blob)
    assert arr[:, 0].tolist() == [0.5, -0.25, 1.0]
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"nope")
    with pytest.raises(ValueError, match="fmt"):
        decode_wav(b"RIFF\x04\x00\x00\x00WAVE")


# ---------------------------------------------------------------------------
# Y4M


def test_y4m_roundtrip_mono():
    rng = np.random.RandomState(13)
    frames = rng.randint(0, 256, (4, 6, 8), dtype=np.uint8)
    y, meta = decode_y4m(encode_y4m(frames, fps=(25, 1)))
    assert (y == frames).all()
    assert meta["fps_num"] == 25 and meta["chroma"] == "mono"


def test_y4m_420_skips_chroma():
    w, h = 4, 2
    yplane = np.arange(w * h, dtype=np.uint8)
    chroma = bytes((w // 2) * (h // 2)) * 2
    blob = (f"YUV4MPEG2 W{w} H{h} F30:1 C420jpeg\n".encode()
            + b"FRAME\n" + yplane.tobytes() + chroma
            + b"FRAME\n" + yplane[::-1].tobytes() + chroma)
    y, meta = decode_y4m(blob)
    assert meta["n_frames"] == 2
    assert (y[0].reshape(-1) == yplane).all()
    assert (y[1].reshape(-1) == yplane[::-1]).all()
    with pytest.raises(ValueError, match="truncated"):
        decode_y4m(blob[:-3])


# ---------------------------------------------------------------------------
# GIF


def test_gif_roundtrip_and_palette():
    from swishray.ops.codecs import decode_gif, encode_gif
    rng = np.random.RandomState(21)
    pal = rng.randint(0, 256, (8, 3), dtype=np.uint8)
    idx = rng.randint(0, 8, (3, 5, 7), dtype=np.uint8)  # 3 frames
    frames, meta = decode_gif(encode_gif(idx, pal))
    assert meta["n_frames"] == 3 and frames.shape == (3, 5, 7, 4)
    for i in range(3):
        assert (frames[i, ..., :3] == pal[idx[i]]).all()
        assert (frames[i, ..., 3] == 255).all()


def test_gif_decode_image_first_frame():
    from swishray.ops.codecs import decode_image, encode_gif
    pal = np.array([[255, 0, 0], [0, 255, 0]], np.uint8)
    idx = np.array([[[0, 1], [1, 0]]], np.uint8)
    arr, meta = decode_image(encode_gif(idx, pal))
    assert meta["format"] == "gif"
    assert arr[0, 0, :3].tolist() == [255, 0, 0]
    assert arr[0, 1, :3].tolist() == [0, 255, 0]


def test_gif_lzw_growing_table():
    """Hand-built LZW stream exercising real dict growth (the
    uncompressed encoder never grows the table): spec-style encode of
    a repeating pattern, decoded against the expected pixels."""
    from swishray.ops.codecs import _gif_lzw

    # min_code=2: literals 0-3, CLEAR=4, EOI=5, first dict entry 6.
    # The canonical KwKwK case: codes CLEAR,0,6,5 where 6 == the
    # not-yet-defined next entry -> entry = prev + prev[0] = "00";
    # decodes to pixels 0,0,0 (spec appendix, deferred-entry rule).
    codes = [4, 0, 6, 5]
    width = 3
    bits = 0
    nbits = 0
    payload = bytearray()
    for c in codes:
        bits |= c << nbits
        nbits += width
        while nbits >= 8:
            payload.append(bits & 0xFF)
            bits >>= 8
            nbits -= 8
    if nbits:
        payload.append(bits & 0xFF)
    out = _gif_lzw(bytes(payload), 2, 3)
    assert out.tolist() == [0, 0, 0]


def test_gif_transparency_and_disposal():
    """Frame 2 has a transparent index: prior canvas must show
    through; a restore-background frame clears its region after."""
    from swishray.ops.codecs import decode_gif, encode_gif

    pal = np.array([[10, 10, 10], [200, 200, 200]], np.uint8)
    base = encode_gif(np.zeros((1, 2, 2), np.uint8), pal)
    # splice a graphic-control extension (transparent index 0) before
    # a second frame whose pixels are [[0,1],[0,1]]
    second = encode_gif(np.array([[[0, 1], [0, 1]]], np.uint8), pal)
    img_desc_at = second.index(b"\x2c")
    gce = bytes([0x21, 0xF9, 4, 0x01, 0, 0, 0, 0])  # transparent=0
    blob = base[:-1] + gce + second[img_desc_at:]
    frames, meta = decode_gif(blob)
    assert meta["n_frames"] == 2
    # transparent-0 pixels keep frame 1's color 10; index-1 paints 200
    assert frames[1][0, 0, 0] == 10 and frames[1][0, 1, 0] == 200


def test_gif_video_frame_sampling(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from swishray.ops.codecs import encode_gif
    from swishray.ops.multimodal import sample_video_frames

    pal = np.stack([np.arange(0, 240, 16, dtype=np.uint8)] * 3, axis=1)
    rng = np.random.RandomState(5)
    idx = rng.randint(0, 15, (6, 4, 4), dtype=np.uint8)
    ds = rd.from_arrow(pa.table({
        "media_id": pa.array([0], pa.int64()),
        "payload": pa.array([encode_gif(idx, pal)], pa.binary())}))
    r = sample_video_frames(ds, every_n=2).take_all()[0]
    assert r["error"] is None and r["n_frames"] == 6
    assert r["n_sampled"] == 3
    want = int((pal[idx[::2]].astype(np.uint16).sum(axis=3) // 3)
               .astype(np.int64).sum())
    assert r["y_sum"] == want


# ---------------------------------------------------------------------------
# AVI / Motion-JPEG (compressed video through the from-scratch JPEG
# codec inside a from-scratch RIFF-AVI walker)


def test_gif_lzw_premature_eoi_raises():
    """EOI before n_pixels are produced must raise (not return an
    uninitialized tail) in both the pure and native paths."""
    from swishray.ops.codecs import _gif_lzw, _gif_lzw_py, _native_lzw
    # min_code=2: CLEAR=4, EOI=5; codes CLEAR,0,1,EOI -> 2 of 10 pixels
    codes, width = [4, 0, 1, 5], 3
    bits = nbits = 0
    payload = bytearray()
    for c in codes:
        bits |= c << nbits
        nbits += width
        while nbits >= 8:
            payload.append(bits & 0xFF)
            bits >>= 8
            nbits -= 8
    if nbits:
        payload.append(bits & 0xFF)
    enc = bytes(payload)
    with pytest.raises(ValueError, match="short GIF LZW"):
        _gif_lzw_py(enc, 2, 10)
    with pytest.raises(ValueError, match="short GIF LZW"):
        _gif_lzw(enc, 2, 10)
    if _native_lzw is not None:
        with pytest.raises(ValueError, match="short GIF LZW"):
            _native_lzw.gif_decode(enc, 2, 10)
    # exactly-complete stream still decodes
    assert _gif_lzw(enc, 2, 2).tolist() == [0, 1]


def test_avi_mjpeg_blank_strh_handler_uses_strf():
    """Real-world MJPEG AVIs often carry a zero/blank fccHandler in
    strh with MJPG only in strf biCompression — must decode."""
    from swishray.ops.codecs import decode_avi_mjpeg, encode_avi_mjpeg
    rng = np.random.default_rng(9)
    frames = rng.integers(0, 256, (3, 16, 16, 3)).astype(np.uint8)
    good = encode_avi_mjpeg(frames)
    want, _ = decode_avi_mjpeg(good)
    for repl in (b"\x00\x00\x00\x00", b"    "):
        patched = good.replace(b"vidsMJPG", b"vids" + repl, 1)
        assert patched != good
        got, meta = decode_avi_mjpeg(patched)
        assert np.array_equal(got, want)
        assert meta["n_frames"] == 3
    # unsupported codec in BOTH strh and strf still raises
    bad = good.replace(b"vidsMJPG", b"vidsXVID", 1) \
              .replace(b"MJPG", b"XVID")
    with pytest.raises(NotImplementedError, match="XVID"):
        decode_avi_mjpeg(bad)


def test_avi_mjpeg_roundtrip_exact():
    from swishray.ops.codecs import decode_avi_mjpeg, encode_avi_mjpeg
    rng = np.random.default_rng(2)
    # flat 8x8 blocks + default quantizer -> per-frame EXACT roundtrip
    vals = rng.integers(0, 256, (5, 2, 3)).astype(np.uint8)
    frames = vals.repeat(8, 1).repeat(8, 2)  # (5, 16, 24)
    out, meta = decode_avi_mjpeg(encode_avi_mjpeg(frames, fps=(25, 1)))
    assert np.array_equal(out, frames)
    assert meta == {"n_frames": 5, "height": 16, "width": 24,
                    "fps_num": 25, "fps_den": 1}


def test_avi_mjpeg_errors():
    from swishray.ops.codecs import decode_avi_mjpeg, encode_avi_mjpeg
    with pytest.raises(ValueError, match="RIFF"):
        decode_avi_mjpeg(b"nope")
    with pytest.raises(ValueError, match="stream header"):
        decode_avi_mjpeg(b"RIFF\x04\x00\x00\x00AVI ")
    good = encode_avi_mjpeg([np.zeros((8, 8), np.uint8)])
    bad = bytearray(good)
    i = bad.find(b"MJPG")
    bad[i:i + 4] = b"H264"
    with pytest.raises(NotImplementedError, match="H264"):
        decode_avi_mjpeg(bytes(bad))
    # truncated chunk inside movi
    with pytest.raises(ValueError):
        decode_avi_mjpeg(good[:len(good) - 9])


def test_avi_video_frame_sampling(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from swishray.ops.codecs import encode_avi_mjpeg
    from swishray.ops.multimodal import sample_video_frames

    rng = np.random.default_rng(7)
    vals = rng.integers(0, 256, (6, 2, 2)).astype(np.uint8)
    frames = vals.repeat(8, 1).repeat(8, 2)  # (6, 16, 16) exact
    ds = rd.from_arrow(pa.table({
        "media_id": pa.array([0], pa.int64()),
        "payload": pa.array([encode_avi_mjpeg(frames)], pa.binary())}))
    r = sample_video_frames(ds, every_n=2).take_all()[0]
    assert r["error"] is None and r["n_frames"] == 6
    assert r["n_sampled"] == 3
    assert r["y_sum"] == int(frames[::2].astype(np.int64).sum())


# ---------------------------------------------------------------------------
# native LZW kernel A/B (GIF variant with real table growth)


def _gif_lzw_encode_growth(data: bytes, min_code: int) -> bytes:
    """Independent GIF-LZW encoder WITH table growth (encode_gif
    deliberately avoids growth via clear-per-literal, so this is the
    only generator that exercises the width-change and
    code==len(table) decoder paths)."""
    clear = 1 << min_code
    out = bytearray()
    bits = 0
    nbits = 0
    width = min_code + 1

    def emit(code: int) -> None:
        nonlocal bits, nbits
        bits |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(bits & 0xFF)
            bits >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    nxt = clear + 2
    emit(clear)
    cur = b""
    for byte in data:
        cand = cur + bytes([byte])
        if cand in table:
            cur = cand
            continue
        emit(table[cur])
        table[cand] = nxt
        nxt += 1
        if nxt == (1 << width) + 1 and width < 12:
            width += 1
        if nxt >= 4096:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            nxt = clear + 2
            width = min_code + 1
        cur = bytes([byte])
    if cur:
        emit(table[cur])
    emit(clear + 1)  # EOI
    if nbits:
        out.append(bits & 0xFF)
    return bytes(out)


def test_gif_lzw_native_matches_pure_on_growth_streams():
    from swishray.ops.codecs import _gif_lzw_py, _native_lzw
    rng = np.random.RandomState(3)
    for trial in range(12):
        mc = int(rng.choice([2, 4, 8]))
        n = int(rng.randint(1, 30000))
        # mixed runs + noise to drive real compression
        data = rng.randint(0, 1 << mc, n, dtype=np.uint8)
        data[::3] = data[0]
        enc = _gif_lzw_encode_growth(data.tobytes(), mc)
        pure = _gif_lzw_py(enc, mc, n)
        assert np.array_equal(pure, data), "test encoder is wrong"
        if _native_lzw is not None:
            nat = np.frombuffer(
                _native_lzw.gif_decode(enc, mc, n), np.uint8)
            assert np.array_equal(nat, data), f"trial {trial}"


def test_tiff_lzw_native_matches_pure_fuzz():
    from swishray.ops.tiff import (_native_lzw, _tiff_lzw_encode,
                                   _tiff_lzw_py)
    if _native_lzw is None:
        pytest.skip("native kernel unavailable")
    rng = np.random.RandomState(5)
    for n in (0, 1, 7, 4096, 60000):
        data = bytes(rng.randint(0, 17, n, dtype=np.uint8) * 15)
        enc = _tiff_lzw_encode(data)
        assert _native_lzw.tiff_decode(enc, n) == \
            _tiff_lzw_py(enc, n) == data


# ---------------------------------------------------------------------------
# resource-bomb guards (round 5): attacker-controlled headers must
# raise ValueError cheaply, never allocate from unverified dims


def test_dimension_bombs_raise_cheaply():
    import struct
    import time
    from swishray.ops.codecs import decode_image
    from swishray.ops.jpeg import encode_jpeg
    t0 = time.time()
    # JPEG SOF claiming 65000x65000
    j = bytearray(encode_jpeg(np.zeros((8, 8), np.uint8)))
    i = bytes(j).find(b"\xff\xc0")
    struct.pack_into(">HH", j, i + 5, 65000, 65000)
    with pytest.raises(ValueError, match="safety cap"):
        decode_image(bytes(j))
    # GIF logical screen 65535x65535
    g = (b"GIF89a" + struct.pack("<HHBBB", 65535, 65535, 0, 0, 0)
         + b"\x3b")
    with pytest.raises(ValueError, match="safety cap"):
        decode_image(g)
    # BMP 200000x200000
    b = bytearray(b"BM" + bytes(52))
    struct.pack_into("<I", b, 10, 54)
    struct.pack_into("<I", b, 14, 40)
    struct.pack_into("<ii", b, 18, 200000, 200000)
    struct.pack_into("<HH", b, 26, 1, 24)
    with pytest.raises(ValueError, match="safety cap"):
        decode_image(bytes(b))
    assert time.time() - t0 < 5  # all header-stage rejections


def test_png_deflate_bomb_is_bounded():
    """A 4x4 PNG whose IDAT inflates to 200 MB must fail the length
    check WITHOUT inflating the whole stream (bounded_inflate)."""
    import struct
    import zlib as _z
    from swishray.ops.codecs import PNG_SIG, decode_image

    def chunk(t, d):
        return (struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", _z.crc32(t + d)))

    ihdr = chunk(b"IHDR",
                 struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0))
    bomb = _z.compress(bytes(200_000_000), 9)
    png = PNG_SIG + ihdr + chunk(b"IDAT", bomb) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="length mismatch"):
        decode_image(png)


def test_tiff_deflate_bomb_is_bounded():
    import zlib as _z
    from swishray.ops.tiff import decode_tiff, encode_tiff
    img = np.zeros((4, 4), np.uint8)
    good = encode_tiff(img, compression="deflate")
    bomb = _z.compress(bytes(200_000_000), 9)
    # splice the bomb in as the strip payload (counts updated)
    strip_off = good.rfind(_z.compress(img.tobytes(), 6))
    blob = bytearray(good[:strip_off] + bomb)
    import struct
    n = struct.unpack_from("<H", blob, 8)[0]
    for i in range(n):
        off = 10 + 12 * i
        tag = struct.unpack_from("<H", blob, off)[0]
        if tag == 279:  # StripByteCounts
            struct.pack_into("<I", blob, off + 8, len(bomb))
    # decodes the 16 expected bytes only — lossless prefix semantics
    out, _ = decode_tiff(bytes(blob))
    assert np.array_equal(out, img)
