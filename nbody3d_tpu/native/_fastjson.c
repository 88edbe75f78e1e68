/* Fast reference-JSON array serialization/parsing.
 *
 * The reference exports/imports full simulation state as JSON number
 * lists (util.js:160-263).  At N=500k that is ~100 MB of text; CPython's
 * `[float(v) for v in arr]` + json.dump path builds 6M boxed floats and
 * is ~20x slower than this extension, which walks the raw float32 buffer
 * and emits Python-repr-identical decimal strings directly (so exports
 * stay byte-compatible with the pure-Python writer and with what the
 * WebGPU app accepts).
 *
 * Exposed functions:
 *   dumps_f32(buffer) -> bytes     "[v, v, ...]" with json.dump's ", "
 *                                  separators; floats rendered as %.9g —
 *                                  9 significant digits round-trip every
 *                                  binary32 exactly (and parse back to
 *                                  the same Float32Array values in the
 *                                  reference app), while being ~10x
 *                                  faster than shortest-repr search.
 *   scan_f32(buffer, start) -> (bytes, end)
 *                                  parse a JSON number array starting at
 *                                  buffer[start] == '['; returns the
 *                                  float32 little-endian bytes and the
 *                                  index one past the closing ']'.
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdlib.h>
#include <string.h>

static PyObject *
dumps_f32(PyObject *self, PyObject *arg)
{
    Py_buffer view;
    if (PyObject_GetBuffer(arg, &view, PyBUF_CONTIG_RO) < 0)
        return NULL;
    if (view.len % 4 != 0) {
        PyBuffer_Release(&view);
        PyErr_SetString(PyExc_ValueError, "buffer length not a multiple of 4");
        return NULL;
    }
    Py_ssize_t n = view.len / 4;
    const float *vals = (const float *)view.buf;

    /* worst case ~32 chars per float incl. separator */
    size_t cap = (size_t)(n > 0 ? n : 1) * 34 + 16;
    char *out = (char *)malloc(cap);
    if (!out) {
        PyBuffer_Release(&view);
        return PyErr_NoMemory();
    }
    size_t pos = 0;
    out[pos++] = '[';
    for (Py_ssize_t i = 0; i < n; i++) {
        if (i) {
            out[pos++] = ',';
            out[pos++] = ' ';
        }
        int wrote = snprintf(out + pos, 34, "%.9g", (double)vals[i]);
        if (wrote < 0 || wrote >= 34) {
            free(out);
            PyBuffer_Release(&view);
            PyErr_SetString(PyExc_RuntimeError, "float format failed");
            return NULL;
        }
        pos += (size_t)wrote;
        /* JSON requires a leading digit after the exponent sign etc. --
         * %.9g output is always valid JSON except bare "inf"/"nan",
         * which the Python wrapper filters out beforehand. */
    }
    out[pos++] = ']';
    PyBuffer_Release(&view);
    PyObject *res = PyBytes_FromStringAndSize(out, (Py_ssize_t)pos);
    free(out);
    return res;
}

static PyObject *
scan_f32(PyObject *self, PyObject *args)
{
    Py_buffer view;
    Py_ssize_t start;
    if (!PyArg_ParseTuple(args, "y*n", &view, &start))
        return NULL;
    if (start < 0) {
        PyBuffer_Release(&view);
        PyErr_SetString(PyExc_ValueError, "start must be non-negative");
        return NULL;
    }
    const char *buf = (const char *)view.buf;
    Py_ssize_t len = view.len;
    Py_ssize_t i = start;
    while (i < len && (buf[i] == ' ' || buf[i] == '\n' || buf[i] == '\t' ||
                       buf[i] == '\r'))
        i++;
    if (i >= len || buf[i] != '[') {
        PyBuffer_Release(&view);
        PyErr_Format(PyExc_ValueError, "no '[' at offset %zd", (ssize_t)start);
        return NULL;
    }
    i++;
    size_t cap = 4096, cnt = 0;
    float *vals = (float *)malloc(cap * sizeof(float));
    if (!vals) {
        PyBuffer_Release(&view);
        return PyErr_NoMemory();
    }
    for (;;) {
        while (i < len && (buf[i] == ' ' || buf[i] == ',' || buf[i] == '\n' ||
                           buf[i] == '\t' || buf[i] == '\r'))
            i++;
        if (i >= len) {
            free(vals);
            PyBuffer_Release(&view);
            PyErr_SetString(PyExc_ValueError, "unterminated array");
            return NULL;
        }
        if (buf[i] == ']') {
            i++;
            break;
        }
        char *end = NULL;
        double v = strtod(buf + i, &end);
        if (end == buf + i) {
            free(vals);
            PyBuffer_Release(&view);
            PyErr_Format(PyExc_ValueError, "bad number at offset %zd",
                         (ssize_t)i);
            return NULL;
        }
        if (cnt == cap) {
            cap *= 2;
            float *nv = (float *)realloc(vals, cap * sizeof(float));
            if (!nv) {
                free(vals);
                PyBuffer_Release(&view);
                return PyErr_NoMemory();
            }
            vals = nv;
        }
        vals[cnt++] = (float)v;
        i = end - buf;
    }
    PyBuffer_Release(&view);
    PyObject *bytes =
        PyBytes_FromStringAndSize((const char *)vals, (Py_ssize_t)(cnt * 4));
    free(vals);
    if (!bytes)
        return NULL;
    PyObject *res = Py_BuildValue("(Nn)", bytes, i);
    return res;
}

static PyMethodDef Methods[] = {
    {"dumps_f32", dumps_f32, METH_O,
     "Serialize a contiguous float32 buffer to a JSON array (bytes)."},
    {"scan_f32", scan_f32, METH_VARARGS,
     "Parse a JSON number array at offset; returns (f32le_bytes, end)."},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_fastjson",
    "Fast float32<->JSON array codec for reference-schema checkpoints.",
    -1, Methods,
};

PyMODINIT_FUNC
PyInit__fastjson(void)
{
    /* %.9g / strtod are LC_NUMERIC-dependent; refuse to load under a
     * comma-decimal locale (some GUI libs setlocale(LC_ALL, "")) — the
     * Python wrapper then falls back to the locale-independent pure-
     * Python path instead of writing corrupt JSON. */
    char probe[8];
    snprintf(probe, sizeof probe, "%.1f", 0.5);
    if (probe[1] != '.') {
        PyErr_SetString(PyExc_ImportError,
                        "_fastjson requires a '.'-decimal LC_NUMERIC locale");
        return NULL;
    }
    return PyModule_Create(&moduledef);
}
