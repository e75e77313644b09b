/* swishwebp — C kernel for the VP8L pixel loop
 * (swishray/ops/webp.py::_decode_entropy), the from-scratch WebP
 * lossless decoder's hot path: per-pixel prefix decoding, LZ77
 * copies, color-cache lookups and meta-group selection.
 *
 * Prefix-code READING (code lengths, canonical build) stays in
 * Python; this kernel consumes the prebuilt lookup tables. Semantics
 * mirror the Python loop exactly; webp._native_selftest A/B-gates the
 * module at import and tests/test_webp.py pins both paths against
 * libwebp.
 *
 * decode_pixels(data, bitpos, w, h, cache_bits, prec,
 *               meta,        # int64 ndarray (mh*mw) or None
 *               mw,          # meta row stride (0 when meta is None)
 *               luts,        # uint32 ndarray: all LUTs concatenated
 *               lut_offs,    # int64 ndarray: ngroups*5+1 boundaries
 *               params,      # int32 ndarray: (maxlen, single) per
 *                            # code, single = -1 when none
 *               dist_map,    # int32 ndarray: 120 x (dx, dy)
 *               out)         # uint32 ndarray (w*h), writable
 * -> new absolute bit position (int)
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

typedef struct {
    const uint8_t *data;
    Py_ssize_t nbits_total;
    Py_ssize_t bitpos;
} Bits;

static int bits_read(Bits *b, int n, uint32_t *out)
{
    if (b->bitpos + n > b->nbits_total)
        return -1;
    Py_ssize_t p = b->bitpos;
    uint64_t v = 0;
    Py_ssize_t first = p >> 3;
    Py_ssize_t last = (p + n + 7) >> 3; /* exclusive */
    int i;
    for (i = 0; i < last - first && i < 8; i++)
        v |= (uint64_t)b->data[first + i] << (8 * i);
    b->bitpos = p + n;
    *out = (uint32_t)((v >> (p & 7)) & ((n == 32) ? 0xFFFFFFFFu
                                                  : ((1u << n) - 1u)));
    return 0;
}

typedef struct {
    const uint32_t *lut;
    int maxlen;
    int single; /* >= 0: zero-bit code */
} Code;

static int code_decode(Bits *b, const Code *c, int *sym)
{
    if (c->single >= 0) {
        *sym = c->single;
        return 0;
    }
    Py_ssize_t remaining = b->nbits_total - b->bitpos;
    int n = c->maxlen < remaining ? c->maxlen : (int)remaining;
    if (n <= 0)
        return -1;
    /* peek maxlen bits (zero-padded past the end) */
    Py_ssize_t p = b->bitpos;
    uint64_t v = 0;
    Py_ssize_t first = p >> 3;
    Py_ssize_t avail = ((b->nbits_total + 7) >> 3) - first;
    int i;
    for (i = 0; i < 8 && i < avail; i++)
        v |= (uint64_t)b->data[first + i] << (8 * i);
    uint32_t window = (uint32_t)((v >> (p & 7))
                                 & ((1u << c->maxlen) - 1u));
    uint32_t entry = c->lut[window];
    int ln = (int)(entry & 15u);
    if (ln == 0 || ln > n)
        return -1;
    b->bitpos = p + ln;
    *sym = (int)(entry >> 4);
    return 0;
}

static int prefix_value(Bits *b, int sym, int *out)
{
    if (sym < 4) {
        *out = sym + 1;
        return 0;
    }
    int extra = (sym - 2) >> 1;
    int offset = (2 + (sym & 1)) << extra;
    uint32_t bits;
    if (bits_read(b, extra, &bits) < 0)
        return -1;
    *out = offset + (int)bits + 1;
    return 0;
}

static PyObject *decode_pixels(PyObject *self, PyObject *args)
{
    Py_buffer data = {0}, meta = {0}, luts = {0}, lut_offs = {0};
    Py_buffer params = {0}, dist_map = {0}, out = {0};
    PyObject *meta_obj;
    Py_ssize_t bitpos;
    int w, h, cache_bits, prec, mw;
    PyObject *ret = NULL;
    uint32_t *cache = NULL;
    Code *codes = NULL;

    if (!PyArg_ParseTuple(args, "y*niiiiOiy*y*y*y*y*",
                          &data, &bitpos, &w, &h, &cache_bits, &prec,
                          &meta_obj, &mw, &luts, &lut_offs, &params,
                          &dist_map, &out))
        return NULL;
    if (meta_obj != Py_None &&
        PyObject_GetBuffer(meta_obj, &meta, PyBUF_C_CONTIGUOUS) < 0)
        goto done;

    {
        const int64_t *offs = (const int64_t *)lut_offs.buf;
        const int32_t *prm = (const int32_t *)params.buf;
        const uint32_t *lut_base = (const uint32_t *)luts.buf;
        const int32_t *dmap = (const int32_t *)dist_map.buf;
        const int64_t *meta_p =
            meta.buf ? (const int64_t *)meta.buf : NULL;
        uint32_t *px = (uint32_t *)out.buf;
        int ncodes = (int)(lut_offs.len / sizeof(int64_t)) - 1;
        int ngroups = ncodes / 5;
        long n = (long)w * h;
        long pos = 0;
        int cache_size = cache_bits ? (1 << cache_bits) : 0;
        int shift = cache_bits ? 32 - cache_bits : 0;
        Bits br = {(const uint8_t *)data.buf, (Py_ssize_t)data.len * 8,
                   bitpos};
        const char *err = NULL;
        int gi = 0;
        int i;

        if ((Py_ssize_t)out.len < n * (Py_ssize_t)sizeof(uint32_t) ||
            dist_map.len < 240 * (Py_ssize_t)sizeof(int32_t) ||
            params.len < ncodes * 2 * (Py_ssize_t)sizeof(int32_t) ||
            ngroups < 1) {
            PyErr_SetString(PyExc_ValueError, "bad vp8l buffers");
            goto done;
        }
        codes = malloc(sizeof(Code) * ncodes);
        if (!codes) {
            PyErr_NoMemory();
            goto done;
        }
        for (i = 0; i < ncodes; i++) {
            codes[i].lut = lut_base + offs[i];
            codes[i].maxlen = prm[2 * i];
            codes[i].single = prm[2 * i + 1];
            if (codes[i].maxlen < 0 || codes[i].maxlen > 15 ||
                offs[i] < 0 || offs[i] > offs[i + 1] ||
                (Py_ssize_t)offs[i + 1] * 4 > luts.len ||
                (codes[i].single < 0 &&
                 offs[i + 1] - offs[i] < (1 << codes[i].maxlen))) {
                PyErr_SetString(PyExc_ValueError, "bad vp8l luts");
                goto done;
            }
        }
        if (meta_p) {
            Py_ssize_t need =
                ((Py_ssize_t)((h - 1) >> prec) * mw
                 + ((w - 1) >> prec) + 1) * (Py_ssize_t)sizeof(int64_t);
            if (mw < 1 || meta.len < need) {
                PyErr_SetString(PyExc_ValueError,
                                "vp8l meta buffer too small");
                goto done;
            }
        }
        if (cache_size) {
            cache = calloc(cache_size, sizeof(uint32_t));
            if (!cache) {
                PyErr_NoMemory();
                goto done;
            }
        }

        while (pos < n) {
            if (meta_p) {
                long y = pos / w, x = pos % w;
                long mi = (y >> prec) * mw + (x >> prec);
                gi = (int)meta_p[mi];
                if (gi < 0 || gi >= ngroups) {
                    err = "VP8L meta group out of range";
                    goto stream_err;
                }
            }
            const Code *G = &codes[gi * 5];
            int s;
            if (code_decode(&br, &G[0], &s) < 0) {
                err = "corrupt VP8L prefix code";
                goto stream_err;
            }
            if (s < 256) {
                int r, bch, a;
                uint32_t v;
                if (code_decode(&br, &G[1], &r) < 0 ||
                    code_decode(&br, &G[2], &bch) < 0 ||
                    code_decode(&br, &G[3], &a) < 0) {
                    err = "corrupt VP8L prefix code";
                    goto stream_err;
                }
                v = ((uint32_t)a << 24) | ((uint32_t)r << 16)
                    | ((uint32_t)s << 8) | (uint32_t)bch;
                px[pos++] = v;
                if (cache_size)
                    cache[(0x1E35A7BDu * v) >> shift] = v;
            } else if (s < 280) {
                int length, dsym, dcode, dist;
                if (prefix_value(&br, s - 256, &length) < 0) {
                    err = "truncated VP8L stream";
                    goto stream_err;
                }
                if (code_decode(&br, &G[4], &dsym) < 0) {
                    err = "corrupt VP8L prefix code";
                    goto stream_err;
                }
                if (prefix_value(&br, dsym, &dcode) < 0) {
                    err = "truncated VP8L stream";
                    goto stream_err;
                }
                if (dcode > 120) {
                    dist = dcode - 120;
                } else {
                    int dx = dmap[2 * (dcode - 1)];
                    int dy = dmap[2 * (dcode - 1) + 1];
                    dist = dy * w + dx;
                    if (dist < 1)
                        dist = 1;
                }
                if (dist > pos || pos + length > n) {
                    err = "VP8L copy out of range";
                    goto stream_err;
                }
                if (cache_size) {
                    long k;
                    for (k = 0; k < length; k++) {
                        uint32_t v = px[pos - dist];
                        px[pos++] = v;
                        cache[(0x1E35A7BDu * v) >> shift] = v;
                    }
                } else {
                    long k;
                    for (k = 0; k < length; k++) {
                        px[pos] = px[pos - dist];
                        pos++;
                    }
                }
            } else {
                int idx = s - 280;
                if (!cache_size || idx >= cache_size) {
                    err = "VP8L cache reference without cache";
                    goto stream_err;
                }
                px[pos++] = cache[idx];
            }
        }
        ret = PyLong_FromSsize_t(br.bitpos);
        goto done;

stream_err:
        PyErr_SetString(PyExc_ValueError, err);
    }

done:
    free(cache);
    free(codes);
    if (data.obj)
        PyBuffer_Release(&data);
    if (meta.obj)
        PyBuffer_Release(&meta);
    if (luts.obj)
        PyBuffer_Release(&luts);
    if (lut_offs.obj)
        PyBuffer_Release(&lut_offs);
    if (params.obj)
        PyBuffer_Release(&params);
    if (dist_map.obj)
        PyBuffer_Release(&dist_map);
    if (out.obj)
        PyBuffer_Release(&out);
    return ret;
}

/* ---- inverse transforms (spec 4.2.2 / 4.2.3) ----------------------
 * Words are little-endian ARGB: byte0=B, byte1=G, byte2=R, byte3=A.
 */

static uint32_t avg2(uint32_t a, uint32_t b)
{
    return (((a ^ b) & 0xFEFEFEFEu) >> 1) + (a & b);
}

static uint32_t add_pixels(uint32_t a, uint32_t b)
{
    /* per-byte mod-256 add */
    uint32_t lo = (a & 0x00FF00FFu) + (b & 0x00FF00FFu);
    uint32_t hi = ((a >> 8) & 0x00FF00FFu) + ((b >> 8) & 0x00FF00FFu);
    return (lo & 0x00FF00FFu) | ((hi & 0x00FF00FFu) << 8);
}

static int clip255(int v)
{
    return v < 0 ? 0 : (v > 255 ? 255 : v);
}

static uint32_t clamped_add_sub_full(uint32_t a, uint32_t b,
                                     uint32_t c)
{
    uint32_t out = 0;
    int sh;
    for (sh = 0; sh < 32; sh += 8) {
        int v = (int)((a >> sh) & 0xFF) + (int)((b >> sh) & 0xFF)
                - (int)((c >> sh) & 0xFF);
        out |= (uint32_t)clip255(v) << sh;
    }
    return out;
}

static uint32_t clamped_add_sub_half(uint32_t a, uint32_t b,
                                     uint32_t c)
{
    uint32_t ave = avg2(a, b);
    uint32_t out = 0;
    int sh;
    for (sh = 0; sh < 32; sh += 8) {
        int av = (int)((ave >> sh) & 0xFF);
        int cv = (int)((c >> sh) & 0xFF);
        int d = av - cv;
        int half = d >= 0 ? d / 2 : -((-d) / 2);
        out |= (uint32_t)clip255(av + half) << sh;
    }
    return out;
}

static uint32_t select_pred(uint32_t T, uint32_t L, uint32_t TL)
{
    int pl = 0, pt = 0, sh;
    for (sh = 0; sh < 32; sh += 8) {
        int l = (int)((L >> sh) & 0xFF);
        int t = (int)((T >> sh) & 0xFF);
        int tl = (int)((TL >> sh) & 0xFF);
        pl += abs(l - tl);
        pt += abs(t - tl);
    }
    return pl <= pt ? T : L;
}

static PyObject *inv_predictor(PyObject *self, PyObject *args)
{
    Py_buffer px = {0}, modes = {0};
    int w, h, bits, mw;
    if (!PyArg_ParseTuple(args, "y*y*iiii", &px, &modes, &w, &h,
                          &bits, &mw))
        return NULL;
    if ((Py_ssize_t)px.len < (Py_ssize_t)w * h * 4 || px.readonly) {
        PyErr_SetString(PyExc_ValueError, "bad pixel buffer");
        PyBuffer_Release(&px);
        PyBuffer_Release(&modes);
        return NULL;
    }
    uint32_t *P = (uint32_t *)px.buf;
    const int32_t *M = (const int32_t *)modes.buf;
    int x, y;
    int bad_mode = -1;
    if (mw < 1 || (Py_ssize_t)modes.len <
        (((Py_ssize_t)((h - 1) >> bits) * mw + ((w - 1) >> bits) + 1)
         * (Py_ssize_t)sizeof(int32_t))) {
        PyErr_SetString(PyExc_ValueError, "modes buffer too small");
        PyBuffer_Release(&px);
        PyBuffer_Release(&modes);
        return NULL;
    }
    for (y = 0; y < h; y++) {
        for (x = 0; x < w; x++) {
            long i = (long)y * w + x;
            uint32_t pred;
            if (x == 0 && y == 0) {
                pred = 0xFF000000u;
            } else if (y == 0) {
                pred = P[i - 1];
            } else if (x == 0) {
                pred = P[i - w];
            } else {
                uint32_t L = P[i - 1];
                uint32_t T = P[i - w];
                uint32_t TL = P[i - w - 1];
                uint32_t TR = (x + 1 < w) ? P[i - w + 1]
                                          : P[(long)y * w];
                switch (M[(y >> bits) * mw + (x >> bits)]) {
                case 0: pred = 0xFF000000u; break;
                case 1: pred = L; break;
                case 2: pred = T; break;
                case 3: pred = TR; break;
                case 4: pred = TL; break;
                case 5: pred = avg2(avg2(L, TR), T); break;
                case 6: pred = avg2(L, TL); break;
                case 7: pred = avg2(L, T); break;
                case 8: pred = avg2(TL, T); break;
                case 9: pred = avg2(T, TR); break;
                case 10: pred = avg2(avg2(L, TL), avg2(T, TR)); break;
                case 11: pred = select_pred(T, L, TL); break;
                case 12: pred = clamped_add_sub_full(L, T, TL); break;
                case 13: pred = clamped_add_sub_half(L, T, TL); break;
                default:
                    bad_mode = M[(y >> bits) * mw + (x >> bits)];
                    goto out;
                }
            }
            P[i] = add_pixels(P[i], pred);
        }
    }
out:
    PyBuffer_Release(&px);
    PyBuffer_Release(&modes);
    if (bad_mode >= 0) {
        PyErr_Format(PyExc_ValueError, "VP8L predictor mode %d",
                     bad_mode);
        return NULL;
    }
    Py_RETURN_NONE;
}

static PyObject *inv_color(PyObject *self, PyObject *args)
{
    Py_buffer px = {0}, ctes = {0};
    int w, h, bits, mw;
    if (!PyArg_ParseTuple(args, "y*y*iiii", &px, &ctes, &w, &h,
                          &bits, &mw))
        return NULL;
    if ((Py_ssize_t)px.len < (Py_ssize_t)w * h * 4 || px.readonly) {
        PyErr_SetString(PyExc_ValueError, "bad pixel buffer");
        PyBuffer_Release(&px);
        PyBuffer_Release(&ctes);
        return NULL;
    }
    uint32_t *P = (uint32_t *)px.buf;
    const uint32_t *C = (const uint32_t *)ctes.buf;
    int x, y;
    if (mw < 1 || (Py_ssize_t)ctes.len <
        (((Py_ssize_t)((h - 1) >> bits) * mw + ((w - 1) >> bits) + 1)
         * (Py_ssize_t)sizeof(uint32_t))) {
        PyErr_SetString(PyExc_ValueError, "ctes buffer too small");
        PyBuffer_Release(&px);
        PyBuffer_Release(&ctes);
        return NULL;
    }
    for (y = 0; y < h; y++) {
        const uint32_t *crow = C + (long)(y >> bits) * mw;
        for (x = 0; x < w; x++) {
            long i = (long)y * w + x;
            uint32_t v = P[i];
            uint32_t cte = crow[x >> bits];
            int g2r = (int8_t)(cte & 0xFF);
            int g2b = (int8_t)((cte >> 8) & 0xFF);
            int r2b = (int8_t)((cte >> 16) & 0xFF);
            int green = (int8_t)((v >> 8) & 0xFF);
            int red = (int)((v >> 16) & 0xFF);
            int blue = (int)(v & 0xFF);
            red = (red + ((g2r * green) >> 5)) & 0xFF;
            blue = (blue + ((g2b * green) >> 5)
                    + ((r2b * (int)(int8_t)red) >> 5)) & 0xFF;
            P[i] = (v & 0xFF00FF00u) | ((uint32_t)red << 16)
                   | (uint32_t)blue;
        }
    }
    PyBuffer_Release(&px);
    PyBuffer_Release(&ctes);
    Py_RETURN_NONE;
}

static PyMethodDef methods[] = {
    {"decode_pixels", decode_pixels, METH_VARARGS,
     "Run the VP8L entropy pixel loop (see swishray/ops/webp.py)."},
    {"inv_predictor", inv_predictor, METH_VARARGS,
     "In-place inverse predictor transform over uint32 ARGB words."},
    {"inv_color", inv_color, METH_VARARGS,
     "In-place inverse color transform over uint32 ARGB words."},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef mod = {
    PyModuleDef_HEAD_INIT, "swishwebp",
    "VP8L pixel-loop kernel (see swishray/ops/webp.py)", -1, methods,
};

PyMODINIT_FUNC PyInit_swishwebp(void)
{
    return PyModule_Create(&mod);
}
