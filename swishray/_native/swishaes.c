/* swishaes — AES-128/192/256 ECB/CBC kernel for the PDF standard
 * security handler (swishray/ops/pdfcrypt.py).
 *
 * From scratch over FIPS-197: the S-box is GENERATED at module init
 * from the GF(2^8) multiplicative inverse + affine transform (same
 * derivation as the pure-Python fallback, which A/B-gates this
 * kernel at import against the FIPS Appendix C vectors and random
 * round-trips).  Encryption shows up per 16-byte block on every
 * encrypted object of every encrypted PDF in a crawl — the R6
 * key-derivation hash alone runs ~25k blocks per file — so the hot
 * loop must not be Python.
 *
 * API:
 *   expand(key: bytes) -> bytes            # round keys blob
 *   ecb(rk: bytes, data: bytes, enc: int) -> bytes   # n*16 bytes
 *   cbc_encrypt(rk: bytes, iv: bytes, data: bytes) -> bytes
 *   cbc_decrypt(rk: bytes, iv: bytes, data: bytes) -> bytes
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdint.h>
#include <string.h>

static uint8_t SBOX[256], INV_SBOX[256];
static uint8_t GMUL2[256], GMUL3[256], GMUL9[256], GMUL11[256],
               GMUL13[256], GMUL14[256];

static uint8_t gf_exp[512], gf_log[256];

static uint8_t gmul(uint8_t a, uint8_t b) {
    if (!a || !b) return 0;
    return gf_exp[gf_log[a] + gf_log[b]];
}

static void init_tables(void) {
    int x = 1;
    for (int i = 0; i < 255; i++) {
        gf_exp[i] = (uint8_t)x;
        gf_log[x] = (uint8_t)i;
        x ^= (x << 1) ^ ((x & 0x80) ? 0x11B : 0);
        x &= 0xFF;
    }
    for (int i = 255; i < 512; i++) gf_exp[i] = gf_exp[i - 255];
    for (int i = 0; i < 256; i++) {
        uint8_t inv = i ? gf_exp[255 - gf_log[i]] : 0;
        uint8_t s = inv;
        for (int r = 0; r < 4; r++) {
            inv = (uint8_t)((inv << 1) | (inv >> 7));
            s ^= inv;
        }
        SBOX[i] = s ^ 0x63;
    }
    for (int i = 0; i < 256; i++) INV_SBOX[SBOX[i]] = (uint8_t)i;
    for (int i = 0; i < 256; i++) {
        GMUL2[i] = gmul(i, 2);  GMUL3[i] = gmul(i, 3);
        GMUL9[i] = gmul(i, 9);  GMUL11[i] = gmul(i, 11);
        GMUL13[i] = gmul(i, 13); GMUL14[i] = gmul(i, 14);
    }
}

static const uint8_t RCON[14] = {0x01,0x02,0x04,0x08,0x10,0x20,0x40,
                                 0x80,0x1B,0x36,0x6C,0xD8,0xAB,0x4D};

/* round keys: (nr+1) * 16 bytes, column-major like the state */
static int expand_key(const uint8_t *key, Py_ssize_t klen,
                      uint8_t *rk /* out, up to 15*16 */) {
    int nk = (int)(klen / 4);
    int nr = nk + 6;
    uint8_t w[60][4];
    for (int i = 0; i < nk; i++) memcpy(w[i], key + 4 * i, 4);
    for (int i = nk; i < 4 * (nr + 1); i++) {
        uint8_t t[4];
        memcpy(t, w[i - 1], 4);
        if (i % nk == 0) {
            uint8_t tmp = t[0];
            t[0] = SBOX[t[1]]; t[1] = SBOX[t[2]];
            t[2] = SBOX[t[3]]; t[3] = SBOX[tmp];
            t[0] ^= RCON[i / nk - 1];
        } else if (nk > 6 && i % nk == 4) {
            for (int j = 0; j < 4; j++) t[j] = SBOX[t[j]];
        }
        for (int j = 0; j < 4; j++) w[i][j] = w[i - nk][j] ^ t[j];
    }
    for (int r = 0; r <= nr; r++)
        for (int c = 0; c < 4; c++)
            memcpy(rk + 16 * r + 4 * c, w[4 * r + c], 4);
    return nr;
}

/* state: flat 16 bytes, column-major (s[4*c + r]) */
static void encrypt_block(const uint8_t *rk, int nr,
                          const uint8_t *in, uint8_t *out) {
    uint8_t s[16], t[16];
    for (int i = 0; i < 16; i++) s[i] = in[i] ^ rk[i];
    for (int rnd = 1; rnd < nr; rnd++) {
        /* SubBytes + ShiftRows */
        for (int c = 0; c < 4; c++)
            for (int r = 0; r < 4; r++)
                t[4 * c + r] = SBOX[s[r + 4 * ((c + r) & 3)]];
        /* MixColumns + AddRoundKey */
        const uint8_t *k = rk + 16 * rnd;
        for (int c = 0; c < 4; c++) {
            uint8_t a0 = t[4*c], a1 = t[4*c+1], a2 = t[4*c+2],
                    a3 = t[4*c+3];
            s[4*c+0] = GMUL2[a0] ^ GMUL3[a1] ^ a2 ^ a3 ^ k[4*c+0];
            s[4*c+1] = a0 ^ GMUL2[a1] ^ GMUL3[a2] ^ a3 ^ k[4*c+1];
            s[4*c+2] = a0 ^ a1 ^ GMUL2[a2] ^ GMUL3[a3] ^ k[4*c+2];
            s[4*c+3] = GMUL3[a0] ^ a1 ^ a2 ^ GMUL2[a3] ^ k[4*c+3];
        }
    }
    const uint8_t *k = rk + 16 * nr;
    for (int c = 0; c < 4; c++)
        for (int r = 0; r < 4; r++)
            out[4 * c + r] =
                SBOX[s[r + 4 * ((c + r) & 3)]] ^ k[4 * c + r];
}

static void decrypt_block(const uint8_t *rk, int nr,
                          const uint8_t *in, uint8_t *out) {
    uint8_t s[16], t[16];
    for (int i = 0; i < 16; i++) s[i] = in[i] ^ rk[16 * nr + i];
    for (int rnd = nr - 1; rnd > 0; rnd--) {
        /* InvShiftRows + InvSubBytes + AddRoundKey */
        const uint8_t *k = rk + 16 * rnd;
        for (int c = 0; c < 4; c++)
            for (int r = 0; r < 4; r++)
                t[4 * c + r] =
                    INV_SBOX[s[r + 4 * ((c - r) & 3)]] ^ k[4*c+r];
        /* InvMixColumns */
        for (int c = 0; c < 4; c++) {
            uint8_t a0 = t[4*c], a1 = t[4*c+1], a2 = t[4*c+2],
                    a3 = t[4*c+3];
            s[4*c+0] = GMUL14[a0]^GMUL11[a1]^GMUL13[a2]^GMUL9[a3];
            s[4*c+1] = GMUL9[a0]^GMUL14[a1]^GMUL11[a2]^GMUL13[a3];
            s[4*c+2] = GMUL13[a0]^GMUL9[a1]^GMUL14[a2]^GMUL11[a3];
            s[4*c+3] = GMUL11[a0]^GMUL13[a1]^GMUL9[a2]^GMUL14[a3];
        }
    }
    for (int c = 0; c < 4; c++)
        for (int r = 0; r < 4; r++)
            out[4 * c + r] =
                INV_SBOX[s[r + 4 * ((c - r) & 3)]] ^ rk[4*c+r];
}

/* ------------------------------------------------------------------ */

static PyObject *py_expand(PyObject *self, PyObject *args) {
    Py_buffer key;
    if (!PyArg_ParseTuple(args, "y*", &key)) return NULL;
    if (key.len != 16 && key.len != 24 && key.len != 32) {
        PyBuffer_Release(&key);
        PyErr_SetString(PyExc_ValueError, "bad AES key length");
        return NULL;
    }
    uint8_t rk[15 * 16];
    int nr = expand_key((const uint8_t *)key.buf, key.len, rk);
    PyBuffer_Release(&key);
    return PyBytes_FromStringAndSize((char *)rk, 16 * (nr + 1));
}

static int rounds_of(Py_ssize_t rklen) { return (int)(rklen/16) - 1; }

static PyObject *py_ecb(PyObject *self, PyObject *args) {
    Py_buffer rk, data;
    int enc;
    if (!PyArg_ParseTuple(args, "y*y*i", &rk, &data, &enc))
        return NULL;
    if (rk.len % 16 || rk.len < 11*16 || data.len % 16) {
        PyBuffer_Release(&rk); PyBuffer_Release(&data);
        PyErr_SetString(PyExc_ValueError, "bad lengths");
        return NULL;
    }
    PyObject *out = PyBytes_FromStringAndSize(NULL, data.len);
    if (!out) { PyBuffer_Release(&rk); PyBuffer_Release(&data);
                return NULL; }
    uint8_t *o = (uint8_t *)PyBytes_AS_STRING(out);
    const uint8_t *d = (const uint8_t *)data.buf;
    int nr = rounds_of(rk.len);
    for (Py_ssize_t i = 0; i < data.len; i += 16) {
        if (enc) encrypt_block((const uint8_t*)rk.buf, nr, d+i, o+i);
        else     decrypt_block((const uint8_t*)rk.buf, nr, d+i, o+i);
    }
    PyBuffer_Release(&rk); PyBuffer_Release(&data);
    return out;
}

static PyObject *py_cbc_encrypt(PyObject *self, PyObject *args) {
    Py_buffer rk, iv, data;
    if (!PyArg_ParseTuple(args, "y*y*y*", &rk, &iv, &data))
        return NULL;
    if (rk.len % 16 || rk.len < 11*16 || iv.len != 16
            || data.len % 16) {
        PyBuffer_Release(&rk); PyBuffer_Release(&iv);
        PyBuffer_Release(&data);
        PyErr_SetString(PyExc_ValueError, "bad lengths");
        return NULL;
    }
    PyObject *out = PyBytes_FromStringAndSize(NULL, data.len);
    if (!out) { PyBuffer_Release(&rk); PyBuffer_Release(&iv);
                PyBuffer_Release(&data); return NULL; }
    uint8_t *o = (uint8_t *)PyBytes_AS_STRING(out);
    const uint8_t *d = (const uint8_t *)data.buf;
    uint8_t prev[16], blk[16];
    memcpy(prev, iv.buf, 16);
    int nr = rounds_of(rk.len);
    for (Py_ssize_t i = 0; i < data.len; i += 16) {
        for (int j = 0; j < 16; j++) blk[j] = d[i + j] ^ prev[j];
        encrypt_block((const uint8_t *)rk.buf, nr, blk, o + i);
        memcpy(prev, o + i, 16);
    }
    PyBuffer_Release(&rk); PyBuffer_Release(&iv);
    PyBuffer_Release(&data);
    return out;
}

static PyObject *py_cbc_decrypt(PyObject *self, PyObject *args) {
    Py_buffer rk, iv, data;
    if (!PyArg_ParseTuple(args, "y*y*y*", &rk, &iv, &data))
        return NULL;
    Py_ssize_t n = data.len - data.len % 16;  /* tolerate ragged tail */
    if (rk.len % 16 || rk.len < 11*16 || iv.len != 16) {
        PyBuffer_Release(&rk); PyBuffer_Release(&iv);
        PyBuffer_Release(&data);
        PyErr_SetString(PyExc_ValueError, "bad lengths");
        return NULL;
    }
    PyObject *out = PyBytes_FromStringAndSize(NULL, n);
    if (!out) { PyBuffer_Release(&rk); PyBuffer_Release(&iv);
                PyBuffer_Release(&data); return NULL; }
    uint8_t *o = (uint8_t *)PyBytes_AS_STRING(out);
    const uint8_t *d = (const uint8_t *)data.buf;
    uint8_t prev[16];
    memcpy(prev, iv.buf, 16);
    int nr = rounds_of(rk.len);
    for (Py_ssize_t i = 0; i < n; i += 16) {
        decrypt_block((const uint8_t *)rk.buf, nr, d + i, o + i);
        for (int j = 0; j < 16; j++) o[i + j] ^= prev[j];
        memcpy(prev, d + i, 16);
    }
    PyBuffer_Release(&rk); PyBuffer_Release(&iv);
    PyBuffer_Release(&data);
    return out;
}

static PyMethodDef Methods[] = {
    {"expand", py_expand, METH_VARARGS, "expand(key) -> round keys"},
    {"ecb", py_ecb, METH_VARARGS, "ecb(rk, data, enc) -> bytes"},
    {"cbc_encrypt", py_cbc_encrypt, METH_VARARGS,
     "cbc_encrypt(rk, iv, data) -> bytes"},
    {"cbc_decrypt", py_cbc_decrypt, METH_VARARGS,
     "cbc_decrypt(rk, iv, data) -> bytes"},
    {NULL, NULL, 0, NULL}
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "swishaes", NULL, -1, Methods
};

PyMODINIT_FUNC PyInit_swishaes(void) {
    init_tables();
    return PyModule_Create(&moduledef);
}
