/* swishlzw — C kernels for the two LZW variants the from-scratch
 * codecs decode (swishray/ops/codecs.py::_gif_lzw LSB-first with the
 * late width change, swishray/ops/tiff.py::_tiff_lzw MSB-first with
 * TIFF's early change). Semantics mirror the Python reference
 * implementations exactly (same error conditions -> ValueError);
 * both modules A/B-gate the kernel at import and keep the pure path
 * as fallback.
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#define MAX_CODES 4096

typedef struct {
    uint16_t prefix[MAX_CODES]; /* 0xFFFF = root */
    uint8_t suffix[MAX_CODES];
    int size;
} Table;

static int expand(const Table *t, int code, uint8_t *stack,
                  uint8_t **first)
{
    /* write the string for `code` into stack (reversed walk);
       returns length, sets *first to its first byte position */
    int n = 0;
    while (code != 0xFFFF && n < MAX_CODES) {
        stack[MAX_CODES - 1 - n] = t->suffix[code];
        code = t->prefix[code];
        n++;
    }
    *first = stack + MAX_CODES - n;
    return n;
}

static PyObject *gif_decode(PyObject *self, PyObject *args)
{
    Py_buffer data = {0};
    int min_code;
    Py_ssize_t n_pixels;
    if (!PyArg_ParseTuple(args, "y*in", &data, &min_code, &n_pixels))
        return NULL;
    if (min_code < 1 || min_code > 11) {
        PyBuffer_Release(&data);
        PyErr_SetString(PyExc_ValueError, "bad GIF LZW min code");
        return NULL;
    }
    PyObject *out_obj = PyBytes_FromStringAndSize(NULL, n_pixels);
    if (!out_obj) {
        PyBuffer_Release(&data);
        return NULL;
    }
    uint8_t *out = (uint8_t *)PyBytes_AS_STRING(out_obj);
    const uint8_t *d = (const uint8_t *)data.buf;
    Py_ssize_t dn = data.len;
    const int clear = 1 << min_code;
    const int eoi = clear + 1;
    Table t;
    uint8_t stack[MAX_CODES];
    uint8_t *s;
    Py_ssize_t n_out = 0;
    uint64_t bits = 0;
    int nbits = 0;
    Py_ssize_t pos = 0;
    int width = min_code + 1;
    int prev = -1;
    const char *err = NULL;
    int i;
    for (i = 0; i < clear; i++) {
        t.prefix[i] = 0xFFFF;
        t.suffix[i] = (uint8_t)i;
    }
    t.size = clear + 2;
    while (n_out < n_pixels) {
        int code, len;
        while (nbits < width) {
            if (pos >= dn) {
                err = "truncated GIF LZW stream";
                goto fail;
            }
            bits |= (uint64_t)d[pos++] << nbits;
            nbits += 8;
        }
        code = (int)(bits & ((1u << width) - 1));
        bits >>= width;
        nbits -= width;
        if (code == clear) {
            t.size = clear + 2;
            width = min_code + 1;
            prev = -1;
            continue;
        }
        if (code == eoi) {
            /* premature EOI: n_out < n_pixels here (loop condition),
               so returning would leak an uninitialized tail */
            err = "short GIF LZW stream";
            goto fail;
        }
        if (prev < 0) {
            if (code >= t.size || code >= clear) {
                /* table[code] for clear/eoi slots is b"" in Python:
                   emits nothing but sets prev; mirror that */
                if (code >= t.size) {
                    err = "corrupt GIF LZW code";
                    goto fail;
                }
                prev = code;
                continue;
            }
            len = expand(&t, code, stack, &s);
        } else if (code < t.size) {
            len = expand(&t, code, stack, &s);
            if (t.size < MAX_CODES && prev >= 0) {
                /* entry = prev + first byte of code's string */
                t.prefix[t.size] = (uint16_t)prev;
                t.suffix[t.size] = (code < clear || code >= clear + 2)
                                       ? s[0]
                                       : 0;
                t.size++;
            }
        } else if (code == t.size && prev >= 0) {
            uint8_t *ps;
            int pl = expand(&t, prev, stack, &ps);
            (void)pl;
            if (t.size < MAX_CODES) {
                t.prefix[t.size] = (uint16_t)prev;
                t.suffix[t.size] = ps[0];
                t.size++;
            }
            len = expand(&t, t.size - 1, stack, &s);
        } else {
            err = "corrupt GIF LZW code";
            goto fail;
        }
        {
            Py_ssize_t take = len;
            if (take > n_pixels - n_out)
                take = n_pixels - n_out;
            memcpy(out + n_out, s, (size_t)take);
            n_out += len; /* Python counts full entry length */
        }
        prev = code;
        if (t.size == (1 << width) && width < 12)
            width++;
    }
    PyBuffer_Release(&data);
    return out_obj;
fail:
    PyBuffer_Release(&data);
    Py_DECREF(out_obj);
    PyErr_SetString(PyExc_ValueError, err);
    return NULL;
}

static PyObject *tiff_decode(PyObject *self, PyObject *args)
{
    Py_buffer data = {0};
    Py_ssize_t expected;
    if (!PyArg_ParseTuple(args, "y*n", &data, &expected))
        return NULL;
    PyObject *out_obj = PyBytes_FromStringAndSize(NULL, expected);
    if (!out_obj) {
        PyBuffer_Release(&data);
        return NULL;
    }
    uint8_t *out = (uint8_t *)PyBytes_AS_STRING(out_obj);
    const uint8_t *d = (const uint8_t *)data.buf;
    Py_ssize_t dn = data.len;
    Table t;
    uint8_t stack[MAX_CODES];
    uint8_t *s;
    Py_ssize_t n_out = 0;
    uint64_t acc = 0;
    int nbits = 0;
    Py_ssize_t pos = 0;
    int width = 9;
    int prev = -1;
    const char *err = NULL;
    int i;
    for (i = 0; i < 256; i++) {
        t.prefix[i] = 0xFFFF;
        t.suffix[i] = (uint8_t)i;
    }
    t.size = 258;
    while (n_out < expected) {
        int code, len;
        while (nbits < width) {
            if (pos >= dn) {
                err = "truncated TIFF LZW strip";
                goto fail;
            }
            acc = (acc << 8) | d[pos++];
            nbits += 8;
        }
        code = (int)((acc >> (nbits - width)) & ((1u << width) - 1));
        nbits -= width;
        acc &= ((uint64_t)1 << nbits) - 1;
        if (code == 256) {
            t.size = 258;
            width = 9;
            prev = -1;
            continue;
        }
        if (code == 257)
            break;
        if (prev < 0) {
            if (code > 255) {
                err = "corrupt TIFF LZW stream";
                goto fail;
            }
            len = expand(&t, code, stack, &s);
        } else if (code < t.size) {
            len = expand(&t, code, stack, &s);
            if (t.size < MAX_CODES) {
                t.prefix[t.size] = (uint16_t)prev;
                t.suffix[t.size] = s[0];
                t.size++;
            }
        } else if (code == t.size) {
            uint8_t *ps;
            (void)expand(&t, prev, stack, &ps);
            if (t.size < MAX_CODES) {
                t.prefix[t.size] = (uint16_t)prev;
                t.suffix[t.size] = ps[0];
                t.size++;
            }
            len = expand(&t, t.size - 1, stack, &s);
        } else {
            err = "corrupt TIFF LZW code";
            goto fail;
        }
        {
            Py_ssize_t take = len;
            if (take > expected - n_out)
                take = expected - n_out;
            memcpy(out + n_out, s, (size_t)take);
            n_out += take;
        }
        prev = code;
        /* TIFF early change: bump at 2^w - 1 (decoder side) */
        if (t.size == (1 << width) - 1 && width < 12)
            width++;
    }
    if (n_out < expected) {
        err = "short TIFF LZW strip";
        goto fail;
    }
    PyBuffer_Release(&data);
    return out_obj;
fail:
    PyBuffer_Release(&data);
    Py_DECREF(out_obj);
    PyErr_SetString(PyExc_ValueError, err);
    return NULL;
}

static PyMethodDef methods[] = {
    {"gif_decode", gif_decode, METH_VARARGS,
     "GIF-variant LZW decode (see swishray/ops/codecs.py)."},
    {"tiff_decode", tiff_decode, METH_VARARGS,
     "TIFF-variant LZW decode (see swishray/ops/tiff.py)."},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef mod = {
    PyModuleDef_HEAD_INIT, "swishlzw",
    "LZW decode kernels (GIF + TIFF variants)", -1, methods,
};

PyMODINIT_FUNC PyInit_swishlzw(void)
{
    return PyModule_Create(&mod);
}
