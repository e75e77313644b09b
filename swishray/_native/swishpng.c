/* PNG scanline un-filter accelerator for swishray.ops.codecs.
 *
 * Original implementation of the five scanline filter inverses from
 * the public PNG specification (W3C PNG / ISO-IEC 15948 section 9,
 * "Filtering"); no code derives from libpng or any other decoder.
 * The pure-numpy path in codecs._unfilter_py is the reference — the
 * module A/B-verifies this kernel against it on import (see
 * codecs._native_selftest) and falls back if they ever disagree.
 *
 * unfilter(raw: bytes, h: int, stride: int, fbpp: int) -> bytes
 *   raw is h rows of (1 filter byte + stride data bytes); returns
 *   h*stride reconstructed bytes. Raises ValueError on a bad filter
 *   type or length mismatch.
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <string.h>

static int paeth(int a, int b, int c) {
    int p = a + b - c;
    int pa = p > a ? p - a : a - p;
    int pb = p > b ? p - b : b - p;
    int pc = p > c ? p - c : c - p;
    if (pa <= pb && pa <= pc) return a;
    if (pb <= pc) return b;
    return c;
}

static PyObject *unfilter(PyObject *self, PyObject *args) {
    Py_buffer raw;
    Py_ssize_t h, stride, fbpp;
    if (!PyArg_ParseTuple(args, "y*nnn", &raw, &h, &stride, &fbpp))
        return NULL;
    if (fbpp < 1 || stride < 0 || h < 0 ||
        raw.len != h * (1 + stride)) {
        PyBuffer_Release(&raw);
        PyErr_SetString(PyExc_ValueError,
                        "PNG pixel data length mismatch");
        return NULL;
    }
    PyObject *out = PyBytes_FromStringAndSize(NULL, h * stride);
    if (!out) { PyBuffer_Release(&raw); return NULL; }
    unsigned char *dst = (unsigned char *)PyBytes_AS_STRING(out);
    const unsigned char *src = (const unsigned char *)raw.buf;
    const unsigned char *prev = NULL;
    int bad = -1;
    for (Py_ssize_t y = 0; y < h; y++) {
        unsigned ft = *src++;
        unsigned char *rec = dst + y * stride;
        switch (ft) {
        case 0:
            memcpy(rec, src, stride);
            break;
        case 1: /* Sub */
            for (Py_ssize_t i = 0; i < stride; i++)
                rec[i] = (unsigned char)(src[i] +
                          (i >= fbpp ? rec[i - fbpp] : 0));
            break;
        case 2: /* Up */
            if (prev)
                for (Py_ssize_t i = 0; i < stride; i++)
                    rec[i] = (unsigned char)(src[i] + prev[i]);
            else
                memcpy(rec, src, stride);
            break;
        case 3: /* Average */
            for (Py_ssize_t i = 0; i < stride; i++) {
                int a = i >= fbpp ? rec[i - fbpp] : 0;
                int b = prev ? prev[i] : 0;
                rec[i] = (unsigned char)(src[i] + ((a + b) >> 1));
            }
            break;
        case 4: /* Paeth */
            for (Py_ssize_t i = 0; i < stride; i++) {
                int a = i >= fbpp ? rec[i - fbpp] : 0;
                int b = prev ? prev[i] : 0;
                int c = (prev && i >= fbpp) ? prev[i - fbpp] : 0;
                rec[i] = (unsigned char)(src[i] + paeth(a, b, c));
            }
            break;
        default:
            bad = (int)ft;
        }
        if (bad >= 0) break;
        src += stride;
        prev = rec;
    }
    PyBuffer_Release(&raw);
    if (bad >= 0) {
        Py_DECREF(out);
        PyErr_Format(PyExc_ValueError, "bad PNG filter type %d", bad);
        return NULL;
    }
    return out;
}

static PyMethodDef Methods[] = {
    {"unfilter", unfilter, METH_VARARGS,
     "reverse PNG scanline filtering"},
    {NULL, NULL, 0, NULL}};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "swishpng", NULL, -1, Methods};

PyMODINIT_FUNC PyInit_swishpng(void) {
    return PyModule_Create(&moduledef);
}
