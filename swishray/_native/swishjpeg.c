/* swishjpeg — C kernel for the JPEG entropy-decode scan loop
 * (swishray/ops/jpeg.py::_decode_scan / _decode_block), the hot path
 * of the from-scratch decoder: per-block Huffman decoding is serial
 * bit twiddling that Python runs ~60x slower than C.
 *
 * Semantics mirror the Python implementation EXACTLY (same LUT
 * format, same T.81 sequential + progressive G.1.2 modes, same error
 * conditions -> ValueError). The Python side A/B-verifies this
 * module against its own pure path at import (jpeg._native_selftest)
 * and falls back to Python on any mismatch; tests/test_jpeg.py
 * additionally pins both paths against libjpeg-turbo.
 *
 * decode_scan(data, offsets, hdr, coefs, dcluts, acluts) -> None
 *   data:    de-stuffed entropy bytes of ALL restart segments,
 *            concatenated (bytes / buffer)
 *   offsets: int64 ndarray, nseg+1 boundaries into data
 *   hdr:     int32 ndarray:
 *            [0]=ncomp [1]=ss [2]=se [3]=ah [4]=al [5]=progressive
 *            [6]=mcux [7]=mcuy [8]=dri [9]=interleaved
 *            then per comp i at 10+6*i: h, v, nbw, nbh,
 *            bw (block-row stride), bh
 *   coefs:   tuple of ncomp writable int32 ndarrays (bh, bw, 64)
 *   dcluts / acluts: tuples of ncomp uint32[65536] ndarrays (entry =
 *            (symbol << 8) | code_length), any entry may be None
 *            when the scan does not use that table
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <stdint.h>
#include <string.h>

typedef struct {
    const uint8_t *base;
    const int64_t *offs;
    int nseg;
    int iseg;
    Py_ssize_t pos;  /* absolute position within current segment */
    Py_ssize_t end;
    uint64_t acc;
    int nbits;
} Reader;

static int rd_init(Reader *r, const uint8_t *base, const int64_t *offs,
                   int nseg)
{
    if (nseg < 1)
        return -1;
    r->base = base;
    r->offs = offs;
    r->nseg = nseg;
    r->iseg = 0;
    r->pos = offs[0];
    r->end = offs[1];
    r->acc = 0;
    r->nbits = 0;
    return 0;
}

static int rd_read(Reader *r, int n, uint32_t *out)
{
    while (r->nbits < n) {
        if (r->pos >= r->end)
            return -1; /* truncated */
        r->acc = (r->acc << 8) | r->base[r->pos++];
        r->nbits += 8;
    }
    r->nbits -= n;
    *out = (uint32_t)((r->acc >> r->nbits) & ((1u << n) - 1u));
    r->acc &= ((uint64_t)1 << r->nbits) - 1;
    return 0;
}

static int rd_decode(Reader *r, const uint32_t *lut, int *sym)
{
    uint32_t window, entry;
    int length;
    while (r->nbits < 16 && r->pos < r->end) {
        r->acc = (r->acc << 8) | r->base[r->pos++];
        r->nbits += 8;
    }
    if (r->nbits >= 16)
        window = (uint32_t)((r->acc >> (r->nbits - 16)) & 0xFFFF);
    else /* end of segment: zero-pad the peek only */
        window = (uint32_t)((r->acc << (16 - r->nbits)) & 0xFFFF);
    entry = lut[window];
    length = (int)(entry & 0xFF);
    if (length == 0 || length > r->nbits)
        return -1; /* invalid Huffman code */
    r->nbits -= length;
    r->acc &= ((uint64_t)1 << r->nbits) - 1;
    *sym = (int)(entry >> 8);
    return 0;
}

static int rd_restart(Reader *r)
{
    r->iseg++;
    if (r->iseg >= r->nseg)
        return -1; /* missing restart segment */
    r->pos = r->offs[r->iseg];
    r->end = r->offs[r->iseg + 1];
    r->acc = 0;
    r->nbits = 0;
    return 0;
}

static int extend(uint32_t v, int s)
{
    if (s == 0)
        return 0;
    return (v >= (1u << (s - 1))) ? (int)v
                                  : (int)v - (1 << s) + 1;
}

typedef struct {
    int h, v, nbw, nbh, bw, bh;
    int32_t *coefs;
    const uint32_t *dc_lut;
    const uint32_t *ac_lut;
    int pred;
} Comp;

/* returns 0 ok, -1 stream error (msg set by caller) */
static int decode_block(Reader *r, Comp *c, int32_t *blk,
                        int ss, int se, int ah, int al,
                        int progressive, int *eobrun,
                        const char **err)
{
    int sym, k, rsh, s;
    uint32_t bits;
    if (!progressive) {
        if (c->dc_lut == NULL || c->ac_lut == NULL) {
            *err = "JPEG scan references missing DHT";
            return -1;
        }
        if (rd_decode(r, c->dc_lut, &sym) < 0) {
            *err = "invalid JPEG Huffman code";
            return -1;
        }
        if (sym > 11) {
            *err = "corrupt JPEG DC code";
            return -1;
        }
        if (rd_read(r, sym, &bits) < 0) {
            *err = "truncated JPEG entropy stream";
            return -1;
        }
        c->pred += extend(bits, sym);
        blk[0] = c->pred;
        k = 1;
        while (k < 64) {
            if (rd_decode(r, c->ac_lut, &sym) < 0) {
                *err = "invalid JPEG Huffman code";
                return -1;
            }
            rsh = sym >> 4;
            s = sym & 15;
            if (s == 0) {
                if (rsh == 15) {
                    k += 16;
                    continue;
                }
                break; /* EOB */
            }
            k += rsh;
            if (k > 63) {
                *err = "JPEG AC run past block end";
                return -1;
            }
            if (rd_read(r, s, &bits) < 0) {
                *err = "truncated JPEG entropy stream";
                return -1;
            }
            blk[k] = extend(bits, s);
            k++;
        }
        return 0;
    }
    if (ss == 0) { /* DC scan */
        if (ah == 0) {
            if (c->dc_lut == NULL) {
                *err = "JPEG scan references missing DHT";
                return -1;
            }
            if (rd_decode(r, c->dc_lut, &sym) < 0) {
                *err = "invalid JPEG Huffman code";
                return -1;
            }
            if (sym > 11) {
                *err = "corrupt JPEG DC code";
                return -1;
            }
            if (rd_read(r, sym, &bits) < 0) {
                *err = "truncated JPEG entropy stream";
                return -1;
            }
            c->pred += extend(bits, sym);
            blk[0] = c->pred << al;
        } else {
            if (rd_read(r, 1, &bits) < 0) {
                *err = "truncated JPEG entropy stream";
                return -1;
            }
            if (bits)
                blk[0] |= (int32_t)1 << al;
        }
        return 0;
    }
    /* AC scans (non-interleaved per spec) */
    if (c->ac_lut == NULL) {
        *err = "JPEG scan references missing DHT";
        return -1;
    }
    if (ah == 0) { /* AC first (G.1.2.2) */
        if (*eobrun > 0) {
            (*eobrun)--;
            return 0;
        }
        k = ss;
        while (k <= se) {
            if (rd_decode(r, c->ac_lut, &sym) < 0) {
                *err = "invalid JPEG Huffman code";
                return -1;
            }
            rsh = sym >> 4;
            s = sym & 15;
            if (s == 0) {
                if (rsh == 15) {
                    k += 16;
                    continue;
                }
                *eobrun = (1 << rsh) - 1;
                if (rsh) {
                    if (rd_read(r, rsh, &bits) < 0) {
                        *err = "truncated JPEG entropy stream";
                        return -1;
                    }
                    *eobrun += (int)bits;
                }
                return 0;
            }
            k += rsh;
            if (k > se) {
                *err = "JPEG AC run past band end";
                return -1;
            }
            if (rd_read(r, s, &bits) < 0) {
                *err = "truncated JPEG entropy stream";
                return -1;
            }
            blk[k] = extend(bits, s) << al;
            k++;
        }
        *eobrun = 0;
        return 0;
    }
    /* AC refinement (G.1.2.3) */
    {
        const int p1 = 1 << al;
        const int m1 = -(1 << al);
        int val, cur;
        k = ss;
        if (*eobrun == 0) {
            while (k <= se) {
                if (rd_decode(r, c->ac_lut, &sym) < 0) {
                    *err = "invalid JPEG Huffman code";
                    return -1;
                }
                rsh = sym >> 4;
                s = sym & 15;
                if (s == 0) {
                    if (rsh != 15) {
                        *eobrun = 1 << rsh;
                        if (rsh) {
                            if (rd_read(r, rsh, &bits) < 0) {
                                *err = "truncated JPEG entropy stream";
                                return -1;
                            }
                            *eobrun += (int)bits;
                        }
                        break;
                    }
                    val = 0; /* ZRL */
                } else {
                    if (s != 1) {
                        *err = "corrupt JPEG AC refinement code";
                        return -1;
                    }
                    if (rd_read(r, 1, &bits) < 0) {
                        *err = "truncated JPEG entropy stream";
                        return -1;
                    }
                    val = bits ? p1 : m1;
                }
                while (k <= se) {
                    cur = blk[k];
                    if (cur != 0) {
                        if (rd_read(r, 1, &bits) < 0) {
                            *err = "truncated JPEG entropy stream";
                            return -1;
                        }
                        if (bits && (cur & p1) == 0)
                            blk[k] = cur + (cur > 0 ? p1 : m1);
                    } else {
                        if (rsh == 0)
                            break;
                        rsh--;
                    }
                    k++;
                }
                if (val != 0 && k <= se)
                    blk[k] = val;
                k++;
            }
        }
        if (*eobrun > 0) {
            while (k <= se) {
                cur = blk[k];
                if (cur != 0) {
                    if (rd_read(r, 1, &bits) < 0) {
                        *err = "truncated JPEG entropy stream";
                        return -1;
                    }
                    if (bits && (cur & p1) == 0)
                        blk[k] = cur + (cur > 0 ? p1 : m1);
                }
                k++;
            }
            (*eobrun)--;
        }
        return 0;
    }
}

static int get_buf(PyObject *obj, Py_buffer *view, int writable,
                   const char *what)
{
    int flags = writable ? (PyBUF_C_CONTIGUOUS | PyBUF_WRITABLE)
                         : PyBUF_C_CONTIGUOUS;
    if (PyObject_GetBuffer(obj, view, flags) < 0) {
        PyErr_Format(PyExc_TypeError, "bad %s buffer", what);
        return -1;
    }
    return 0;
}

static PyObject *decode_scan(PyObject *self, PyObject *args)
{
    Py_buffer data = {0}, offs = {0}, hdr = {0};
    PyObject *coefs_t, *dcluts_t, *acluts_t;
    Py_buffer cviews[4] = {{0}};
    Py_buffer dviews[4] = {{0}};
    Py_buffer aviews[4] = {{0}};
    Comp comps[4];
    const char *err = NULL;
    int ok = -1;
    int i;

    if (!PyArg_ParseTuple(args, "y*y*y*OOO", &data, &offs, &hdr,
                          &coefs_t, &dcluts_t, &acluts_t))
        return NULL;

    const int32_t *H = (const int32_t *)hdr.buf;
    if (hdr.len < (Py_ssize_t)(10 * sizeof(int32_t))) {
        PyErr_SetString(PyExc_ValueError, "short jpeg scan header");
        goto done;
    }
    int ncomp = H[0], ss = H[1], se = H[2], ah = H[3], al = H[4];
    int progressive = H[5], mcux = H[6], mcuy = H[7], dri = H[8];
    int interleaved = H[9];
    if (ncomp < 1 || ncomp > 4 ||
        hdr.len < (Py_ssize_t)((10 + 6 * ncomp) * sizeof(int32_t))) {
        PyErr_SetString(PyExc_ValueError, "bad jpeg scan header");
        goto done;
    }
    if (!PyTuple_Check(coefs_t) || PyTuple_Size(coefs_t) != ncomp ||
        !PyTuple_Check(dcluts_t) || PyTuple_Size(dcluts_t) != ncomp ||
        !PyTuple_Check(acluts_t) || PyTuple_Size(acluts_t) != ncomp) {
        PyErr_SetString(PyExc_ValueError, "bad jpeg scan tuples");
        goto done;
    }
    for (i = 0; i < ncomp; i++) {
        const int32_t *m = H + 10 + 6 * i;
        comps[i].h = m[0];
        comps[i].v = m[1];
        comps[i].nbw = m[2];
        comps[i].nbh = m[3];
        comps[i].bw = m[4];
        comps[i].bh = m[5];
        comps[i].pred = 0;
        if (get_buf(PyTuple_GET_ITEM(coefs_t, i), &cviews[i], 1,
                    "coefs") < 0)
            goto done;
        if ((Py_ssize_t)cviews[i].len <
            (Py_ssize_t)comps[i].bh * comps[i].bw * 64
                * (Py_ssize_t)sizeof(int32_t)) {
            PyErr_SetString(PyExc_ValueError, "coefs buffer too small");
            goto done;
        }
        comps[i].coefs = (int32_t *)cviews[i].buf;
        PyObject *d = PyTuple_GET_ITEM(dcluts_t, i);
        PyObject *a = PyTuple_GET_ITEM(acluts_t, i);
        comps[i].dc_lut = NULL;
        comps[i].ac_lut = NULL;
        if (d != Py_None) {
            if (get_buf(d, &dviews[i], 0, "dc lut") < 0)
                goto done;
            if (dviews[i].len < 65536 * (Py_ssize_t)sizeof(uint32_t)) {
                PyErr_SetString(PyExc_ValueError, "short dc lut");
                goto done;
            }
            comps[i].dc_lut = (const uint32_t *)dviews[i].buf;
        }
        if (a != Py_None) {
            if (get_buf(a, &aviews[i], 0, "ac lut") < 0)
                goto done;
            if (aviews[i].len < 65536 * (Py_ssize_t)sizeof(uint32_t)) {
                PyErr_SetString(PyExc_ValueError, "short ac lut");
                goto done;
            }
            comps[i].ac_lut = (const uint32_t *)aviews[i].buf;
        }
    }
    if (offs.len < 2 * (Py_ssize_t)sizeof(int64_t)) {
        PyErr_SetString(PyExc_ValueError, "bad segment offsets");
        goto done;
    }
    int nseg = (int)(offs.len / sizeof(int64_t)) - 1;
    const int64_t *offp = (const int64_t *)offs.buf;
    for (i = 0; i <= nseg; i++) {
        if (offp[i] < 0 || offp[i] > (int64_t)data.len ||
            (i > 0 && offp[i] < offp[i - 1])) {
            PyErr_SetString(PyExc_ValueError, "bad segment offsets");
            goto done;
        }
    }

    Reader r;
    if (rd_init(&r, (const uint8_t *)data.buf, offp, nseg) < 0) {
        PyErr_SetString(PyExc_ValueError, "empty jpeg scan");
        goto done;
    }
    long total;
    if (interleaved)
        total = (long)mcux * mcuy;
    else
        total = (long)comps[0].nbw * comps[0].nbh;
    int eobrun = 0;
    long mcu;
    for (mcu = 0; mcu < total; mcu++) {
        if (dri && mcu && mcu % dri == 0) {
            if (rd_restart(&r) < 0) {
                err = "missing JPEG restart segment";
                goto stream_err;
            }
            for (i = 0; i < ncomp; i++)
                comps[i].pred = 0;
            eobrun = 0;
        }
        if (interleaved) {
            long my = mcu / mcux, mx = mcu % mcux;
            for (i = 0; i < ncomp; i++) {
                Comp *c = &comps[i];
                int u, v;
                for (v = 0; v < c->v; v++) {
                    for (u = 0; u < c->h; u++) {
                        int32_t *blk = c->coefs +
                            (((my * c->v + v) * c->bw)
                             + (mx * c->h + u)) * 64;
                        if (decode_block(&r, c, blk, ss, se, ah, al,
                                         progressive, &eobrun,
                                         &err) < 0)
                            goto stream_err;
                    }
                }
            }
        } else {
            Comp *c = &comps[0];
            long by = mcu / c->nbw, bx = mcu % c->nbw;
            int32_t *blk = c->coefs + (by * c->bw + bx) * 64;
            if (decode_block(&r, c, blk, ss, se, ah, al,
                             progressive, &eobrun, &err) < 0)
                goto stream_err;
        }
    }
    ok = 0;
    goto done;

stream_err:
    PyErr_SetString(PyExc_ValueError,
                    err ? err : "corrupt JPEG entropy stream");

done:
    if (data.obj)
        PyBuffer_Release(&data);
    if (offs.obj)
        PyBuffer_Release(&offs);
    if (hdr.obj)
        PyBuffer_Release(&hdr);
    for (i = 0; i < 4; i++) {
        if (cviews[i].obj)
            PyBuffer_Release(&cviews[i]);
        if (dviews[i].obj)
            PyBuffer_Release(&dviews[i]);
        if (aviews[i].obj)
            PyBuffer_Release(&aviews[i]);
    }
    if (ok < 0)
        return NULL;
    Py_RETURN_NONE;
}

static PyMethodDef methods[] = {
    {"decode_scan", decode_scan, METH_VARARGS,
     "Decode one JPEG scan's entropy data into coefficient buffers."},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef mod = {
    PyModuleDef_HEAD_INIT, "swishjpeg",
    "JPEG entropy-decode kernel (see swishray/ops/jpeg.py)", -1,
    methods,
};

PyMODINIT_FUNC PyInit_swishjpeg(void)
{
    return PyModule_Create(&mod);
}
