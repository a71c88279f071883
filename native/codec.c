/* codec.c — CPython extension: memcmp-order key codec for scalar values.
 *
 * The hot 35% of every OLTP op and every scan is encode/decode of the
 * order-preserving tuple encoding (cozo_tpu/data/memcmp.py; reference
 * cozo-core/src/data/memcmp.rs).  This module handles the scalar subset
 * (None, Bool, Int, Float, Str, Bytes) in C and returns Python `None`
 * for anything it does not handle — the Python caller falls back to the
 * reference implementation, so error messages and complex-type behavior
 * stay canonical.  Byte-for-byte parity with the Python encoder is
 * enforced by tests/test_value_codec.py::test_c_codec_parity.
 *
 * Build: gcc -O2 -shared -fPIC $(python-config --includes) \
 *        -o codec$(python3-config --extension-suffix) codec.c
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdint.h>
#include <string.h>

#define NULL_TAG 0x01
#define FALSE_TAG 0x02
#define TRUE_TAG 0x03
#define NUM_TAG 0x05
#define STR_TAG 0x06
#define BYTES_TAG 0x07

/* ------------------------------------------------------------- buffer */

typedef struct {
    uint8_t* p;
    Py_ssize_t len, cap;
} Buf;

static int buf_init(Buf* b, Py_ssize_t cap) {
    b->p = PyMem_Malloc(cap);
    if (!b->p) return -1;
    b->len = 0;
    b->cap = cap;
    return 0;
}

static int buf_reserve(Buf* b, Py_ssize_t extra) {
    if (b->len + extra <= b->cap) return 0;
    Py_ssize_t ncap = b->cap * 2;
    while (ncap < b->len + extra) ncap *= 2;
    uint8_t* np = PyMem_Realloc(b->p, ncap);
    if (!np) return -1;
    b->p = np;
    b->cap = ncap;
    return 0;
}

static inline void put_u8(Buf* b, uint8_t v) { b->p[b->len++] = v; }

static inline void put_be64(Buf* b, uint64_t v) {
    uint8_t* p = b->p + b->len;
    p[0] = (uint8_t)(v >> 56);
    p[1] = (uint8_t)(v >> 48);
    p[2] = (uint8_t)(v >> 40);
    p[3] = (uint8_t)(v >> 32);
    p[4] = (uint8_t)(v >> 24);
    p[5] = (uint8_t)(v >> 16);
    p[6] = (uint8_t)(v >> 8);
    p[7] = (uint8_t)v;
    b->len += 8;
}

static inline uint64_t f64_order_bits(double d) {
    uint64_t bits;
    memcpy(&bits, &d, 8);
    if (bits & 0x8000000000000000ULL) return ~bits;
    return bits | 0x8000000000000000ULL;
}

static inline double f64_from_order_bits(uint64_t key) {
    uint64_t bits;
    if (key & 0x8000000000000000ULL)
        bits = key & 0x7FFFFFFFFFFFFFFFULL;
    else
        bits = ~key;
    double d;
    memcpy(&d, &bits, 8);
    return d;
}

/* escaped payload: 0x00 -> 0x00 0x01, terminator 0x00 0x00 */
static int put_escaped(Buf* b, const uint8_t* s, Py_ssize_t n) {
    if (buf_reserve(b, 2 * n + 2) < 0) return -1;
    uint8_t* p = b->p + b->len;
    for (Py_ssize_t i = 0; i < n; i++) {
        uint8_t c = s[i];
        *p++ = c;
        if (c == 0) *p++ = 1;
    }
    *p++ = 0;
    *p++ = 0;
    b->len = p - b->p;
    return 0;
}

/* returns: 0 ok, 1 unsupported (caller falls back), -1 error set */
static int enc_value(Buf* b, PyObject* v) {
    if (v == Py_None) {
        if (buf_reserve(b, 1) < 0) return -1;
        put_u8(b, NULL_TAG);
        return 0;
    }
    if (PyBool_Check(v)) {
        if (buf_reserve(b, 1) < 0) return -1;
        put_u8(b, v == Py_True ? TRUE_TAG : FALSE_TAG);
        return 0;
    }
    if (PyLong_CheckExact(v)) {
        int overflow = 0;
        long long ll = PyLong_AsLongLongAndOverflow(v, &overflow);
        if (overflow) return 1;  /* out of i64: canonical error from Python */
        if (ll == -1 && PyErr_Occurred()) return -1;
        if (buf_reserve(b, 18) < 0) return -1;
        put_u8(b, NUM_TAG);
        put_be64(b, f64_order_bits((double)ll));
        put_u8(b, 0);
        put_be64(b, (uint64_t)ll ^ 0x8000000000000000ULL);
        return 0;
    }
    if (PyFloat_CheckExact(v)) {
        if (buf_reserve(b, 10) < 0) return -1;
        put_u8(b, NUM_TAG);
        put_be64(b, f64_order_bits(PyFloat_AS_DOUBLE(v)));
        put_u8(b, 1);
        return 0;
    }
    if (PyUnicode_CheckExact(v)) {
        Py_ssize_t n;
        const char* s = PyUnicode_AsUTF8AndSize(v, &n);
        if (!s) return -1;
        if (buf_reserve(b, 1) < 0) return -1;
        put_u8(b, STR_TAG);
        return put_escaped(b, (const uint8_t*)s, n);
    }
    if (PyBytes_CheckExact(v)) {
        if (buf_reserve(b, 1) < 0) return -1;
        put_u8(b, BYTES_TAG);
        return put_escaped(b, (const uint8_t*)PyBytes_AS_STRING(v),
                           PyBytes_GET_SIZE(v));
    }
    return 1; /* complex / unknown type: Python fallback */
}

/* encode_tuple(seq[, prefix: bytes]) -> bytes | None */
static PyObject* py_encode_tuple(PyObject* self, PyObject* args) {
    PyObject* seq;
    Py_buffer prefix = {0};
    if (!PyArg_ParseTuple(args, "O|y*", &seq, &prefix)) return NULL;
    PyObject* fast = PySequence_Fast(seq, "encode_tuple expects a sequence");
    if (!fast) {
        if (prefix.obj) PyBuffer_Release(&prefix);
        return NULL;
    }
    Py_ssize_t n = PySequence_Fast_GET_SIZE(fast);
    PyObject** items = PySequence_Fast_ITEMS(fast);
    Buf b;
    if (buf_init(&b, 64 + (prefix.obj ? prefix.len : 0) + n * 24) < 0) {
        Py_DECREF(fast);
        if (prefix.obj) PyBuffer_Release(&prefix);
        return PyErr_NoMemory();
    }
    if (prefix.obj) {
        memcpy(b.p, prefix.buf, prefix.len);
        b.len = prefix.len;
        PyBuffer_Release(&prefix);
    }
    for (Py_ssize_t i = 0; i < n; i++) {
        int rc = enc_value(&b, items[i]);
        if (rc != 0) {
            PyMem_Free(b.p);
            Py_DECREF(fast);
            if (rc < 0) return NULL;
            Py_RETURN_NONE; /* unsupported element: fall back */
        }
    }
    Py_DECREF(fast);
    PyObject* out = PyBytes_FromStringAndSize((const char*)b.p, b.len);
    PyMem_Free(b.p);
    return out;
}

/* ------------------------------------------------------------- decode */

static inline uint64_t get_be64(const uint8_t* p) {
    return ((uint64_t)p[0] << 56) | ((uint64_t)p[1] << 48) |
           ((uint64_t)p[2] << 40) | ((uint64_t)p[3] << 32) |
           ((uint64_t)p[4] << 24) | ((uint64_t)p[5] << 16) |
           ((uint64_t)p[6] << 8) | (uint64_t)p[7];
}

/* decode escaped payload; returns new pos or -1 (corrupt; error set),
 * sets *out (new ref) */
static Py_ssize_t dec_escaped(const uint8_t* d, Py_ssize_t pos, Py_ssize_t n,
                              int as_str, PyObject** out) {
    /* fast path: find the 0x00 terminator; if the byte after the first
     * 0x00 is 0x00 the payload had no embedded zeros */
    const uint8_t* z = memchr(d + pos, 0, n - pos);
    if (!z || (z - d) + 1 >= n) goto corrupt;
    if (z[1] == 0) {
        Py_ssize_t len = z - (d + pos);
        *out = as_str
                   ? PyUnicode_DecodeUTF8((const char*)d + pos, len, NULL)
                   : PyBytes_FromStringAndSize((const char*)d + pos, len);
        return *out ? (z - d) + 2 : -1;
    }
    {
        Buf b;
        if (buf_init(&b, 64) < 0) { PyErr_NoMemory(); return -1; }
        for (;;) {
            Py_ssize_t chunk = z - (d + pos);
            if (buf_reserve(&b, chunk + 1) < 0) {
                PyMem_Free(b.p); PyErr_NoMemory(); return -1;
            }
            memcpy(b.p + b.len, d + pos, chunk);
            b.len += chunk;
            uint8_t nxt = z[1];
            if (nxt == 0) {
                *out = as_str ? PyUnicode_DecodeUTF8((const char*)b.p, b.len,
                                                     NULL)
                              : PyBytes_FromStringAndSize((const char*)b.p,
                                                          b.len);
                PyMem_Free(b.p);
                return *out ? (z - d) + 2 : -1;
            }
            if (nxt != 1) { PyMem_Free(b.p); goto corrupt; }
            b.p[b.len++] = 0;
            pos = (z - d) + 2;
            z = memchr(d + pos, 0, n - pos);
            if (!z || (z - d) + 1 >= n) { PyMem_Free(b.p); goto corrupt; }
        }
    }
corrupt:
    PyErr_SetString(PyExc_ValueError, "corrupt escaped encoding");
    return -1;
}

/* decode_tuple(data[, pos[, end]]) -> list | None (unsupported tag) */
static PyObject* py_decode_tuple(PyObject* self, PyObject* args) {
    Py_buffer data;
    Py_ssize_t pos = 0, end = -1;
    if (!PyArg_ParseTuple(args, "y*|nn", &data, &pos, &end)) return NULL;
    const uint8_t* d = data.buf;
    Py_ssize_t n = (end < 0) ? data.len : end;
    PyObject* out = PyList_New(0);
    if (!out) {
        PyBuffer_Release(&data);
        return NULL;
    }
    while (pos < n) {
        uint8_t tag = d[pos++];
        PyObject* v = NULL;
        switch (tag) {
            case NULL_TAG:
                v = Py_None;
                Py_INCREF(v);
                break;
            case FALSE_TAG:
                v = Py_False;
                Py_INCREF(v);
                break;
            case TRUE_TAG:
                v = Py_True;
                Py_INCREF(v);
                break;
            case NUM_TAG: {
                if (pos + 9 > n) goto corrupt;
                uint64_t bits = get_be64(d + pos);
                pos += 8;
                uint8_t disc = d[pos++];
                if (disc == 0) {
                    if (pos + 8 > n) goto corrupt;
                    uint64_t raw = get_be64(d + pos);
                    pos += 8;
                    v = PyLong_FromLongLong(
                        (long long)(raw ^ 0x8000000000000000ULL));
                } else {
                    v = PyFloat_FromDouble(f64_from_order_bits(bits));
                }
                break;
            }
            case STR_TAG:
            case BYTES_TAG: {
                Py_ssize_t np =
                    dec_escaped(d, pos, n, tag == STR_TAG, &v);
                if (np < 0) goto fail;
                pos = np;
                break;
            }
            default:
                /* complex tag: whole-tuple fallback to Python */
                Py_DECREF(out);
                PyBuffer_Release(&data);
                Py_RETURN_NONE;
        }
        if (!v) goto fail;
        if (PyList_Append(out, v) < 0) {
            Py_DECREF(v);
            goto fail;
        }
        Py_DECREF(v);
    }
    PyBuffer_Release(&data);
    return out;
corrupt:
    PyErr_SetString(PyExc_ValueError, "truncated tuple encoding");
fail:
    Py_DECREF(out);
    PyBuffer_Release(&data);
    return NULL;
}

static PyMethodDef methods[] = {
    {"encode_tuple", py_encode_tuple, METH_VARARGS,
     "encode_tuple(seq[, prefix]) -> bytes | None (unsupported element)"},
    {"decode_tuple", py_decode_tuple, METH_VARARGS,
     "decode_tuple(data[, pos[, end]]) -> list | None (unsupported tag)"},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "cozo_ccodec",
    "C scalar codec for cozo_tpu memcmp tuples", -1, methods,
};

PyMODINIT_FUNC PyInit_codec(void) { return PyModule_Create(&moduledef); }
