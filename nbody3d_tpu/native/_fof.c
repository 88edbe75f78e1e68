/* Friends-of-friends group finder core: spatial-hash + union-find.
 *
 * The analysis suite's halo/clump catalog (analysis.py::fof_groups)
 * needs the connected components of the "within linking length b" graph.
 * The classic algorithm is a cell grid of size b (so all partners live
 * in the 27 neighboring cells) walked with a union-find — pointer-chasing
 * and data-dependent branching that Python executes ~1e5 bodies/s and C
 * ~1e7/s.  Like the other native components this is host runtime, not
 * device math: the per-pair work is one f32 distance compare.
 *
 * Cells are identified by a mixed 64-bit key of the integer cell coords
 * (open-addressed table, chained bodies).  Key collisions between
 * distinct cells are HARMLESS for correctness: a merged chain only adds
 * distance checks, and every real neighbor cell's bodies are always
 * reached through its exact key — the linking decision itself is purely
 * the r^2 <= b^2 test (minimum-image under a periodic box).
 *
 * fof_labels(pos, cell, n, nx, ny, nz, ll2, lx, ly, lz, labels)
 *   pos:    n*3 float32 positions
 *   cell:   n*3 int32 integer cell coords (precomputed by the caller,
 *           each in [0, n?) of its axis)
 *   nx/y/z: cells per axis (int64)
 *   ll2:    squared linking length (double)
 *   lx/y/z: periodic box edge per axis, 0 = isolated (no wrap)
 *   labels: writable n int32 — receives the union-find root per body
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <math.h>
#include <stdint.h>
#include <stdlib.h>

static inline uint64_t mix_key(int64_t cx, int64_t cy, int64_t cz) {
  uint64_t k = (uint64_t)cx * 0x9E3779B97F4A7C15ULL;
  k ^= (uint64_t)cy * 0xC2B2AE3D27D4EB4FULL;
  k ^= (uint64_t)cz * 0x165667B19E3779F9ULL;
  /* splitmix finalizer so table probing sees all bits */
  k ^= k >> 30;
  k *= 0xBF58476D1CE4E5B9ULL;
  k ^= k >> 27;
  return k;
}

static inline int32_t uf_find(int32_t *parent, int32_t i) {
  while (parent[i] != i) {
    parent[i] = parent[parent[i]]; /* path halving */
    i = parent[i];
  }
  return i;
}

static PyObject *fof_labels(PyObject *self, PyObject *args) {
  Py_buffer posb, cellb, outb;
  Py_ssize_t n;
  long long nx, ny, nz;
  double ll2, lx, ly, lz;
  if (!PyArg_ParseTuple(args, "y*y*nLLLddddw*", &posb, &cellb, &n, &nx, &ny,
                        &nz, &ll2, &lx, &ly, &lz, &outb))
    return NULL;
  if (posb.len < n * 3 * (Py_ssize_t)sizeof(float) ||
      cellb.len < n * 3 * (Py_ssize_t)sizeof(int32_t) ||
      outb.len < n * (Py_ssize_t)sizeof(int32_t) || n > INT32_MAX) {
    PyBuffer_Release(&posb);
    PyBuffer_Release(&cellb);
    PyBuffer_Release(&outb);
    PyErr_SetString(PyExc_ValueError, "fof_labels: buffer sizes disagree");
    return NULL;
  }
  const float *pos = (const float *)posb.buf;
  const int32_t *cell = (const int32_t *)cellb.buf;
  int32_t *labels = (int32_t *)outb.buf;

  /* open-addressed cell table, size = next pow2 >= 2n */
  size_t tsize = 16;
  while (tsize < (size_t)(2 * n)) tsize <<= 1;
  const size_t tmask = tsize - 1;
  uint64_t *tkey = malloc(tsize * sizeof(uint64_t));
  int32_t *thead = malloc(tsize * sizeof(int32_t));
  int32_t *next = malloc((size_t)n * sizeof(int32_t));
  int32_t *parent = malloc((size_t)n * sizeof(int32_t));
  int fail = (!tkey || !thead || !next || !parent);
  if (fail) {
    free(tkey);
    free(thead);
    free(next);
    free(parent);
    PyBuffer_Release(&posb);
    PyBuffer_Release(&cellb);
    PyBuffer_Release(&outb);
    return PyErr_NoMemory();
  }

  Py_BEGIN_ALLOW_THREADS;
  for (size_t t = 0; t < tsize; t++) thead[t] = -1;

  /* build: one chain per occupied cell key */
  for (Py_ssize_t i = 0; i < n; i++) {
    parent[i] = (int32_t)i;
    const uint64_t key =
        mix_key(cell[3 * i], cell[3 * i + 1], cell[3 * i + 2]);
    size_t s = (size_t)key & tmask;
    while (thead[s] != -1 && tkey[s] != key) s = (s + 1) & tmask;
    if (thead[s] == -1) tkey[s] = key;
    next[i] = thead[s];
    thead[s] = (int32_t)i;
  }

  const int periodic = (lx > 0.0);
  for (Py_ssize_t i = 0; i < n; i++) {
    const float xi = pos[3 * i], yi = pos[3 * i + 1], zi = pos[3 * i + 2];
    const int64_t cx = cell[3 * i], cy = cell[3 * i + 1], cz = cell[3 * i + 2];
    for (int dz = -1; dz <= 1; dz++) {
      for (int dy = -1; dy <= 1; dy++) {
        for (int dx = -1; dx <= 1; dx++) {
          int64_t ax = cx + dx, ay = cy + dy, az = cz + dz;
          if (periodic) {
            if (ax < 0) ax += nx;
            if (ax >= nx) ax -= nx;
            if (ay < 0) ay += ny;
            if (ay >= ny) ay -= ny;
            if (az < 0) az += nz;
            if (az >= nz) az -= nz;
          } else {
            if (ax < 0 || ax >= nx || ay < 0 || ay >= ny || az < 0 || az >= nz)
              continue;
          }
          const uint64_t key = mix_key(ax, ay, az);
          size_t s = (size_t)key & tmask;
          while (thead[s] != -1 && tkey[s] != key) s = (s + 1) & tmask;
          if (thead[s] == -1) continue;
          for (int32_t j = thead[s]; j != -1; j = next[j]) {
            if (j >= (int32_t)i) continue; /* each unordered pair once */
            double ddx = (double)xi - (double)pos[3 * j];
            double ddy = (double)yi - (double)pos[3 * j + 1];
            double ddz = (double)zi - (double)pos[3 * j + 2];
            if (periodic) { /* minimum image */
              ddx -= lx * floor(ddx / lx + 0.5);
              ddy -= ly * floor(ddy / ly + 0.5);
              ddz -= lz * floor(ddz / lz + 0.5);
            }
            if (ddx * ddx + ddy * ddy + ddz * ddz <= ll2) {
              int32_t ri = uf_find(parent, (int32_t)i);
              int32_t rj = uf_find(parent, j);
              if (ri != rj) parent[ri < rj ? ri : rj] = ri < rj ? rj : ri;
            }
          }
        }
      }
    }
  }
  for (Py_ssize_t i = 0; i < n; i++) labels[i] = uf_find(parent, (int32_t)i);
  Py_END_ALLOW_THREADS;

  free(tkey);
  free(thead);
  free(next);
  free(parent);
  PyBuffer_Release(&posb);
  PyBuffer_Release(&cellb);
  PyBuffer_Release(&outb);
  Py_RETURN_NONE;
}

static PyMethodDef Methods[] = {
    {"fof_labels", fof_labels, METH_VARARGS,
     "Friends-of-friends union-find labels over a spatial hash grid."},
    {NULL, NULL, 0, NULL}};

static struct PyModuleDef mod = {PyModuleDef_HEAD_INIT, "_fof",
                                 "native friends-of-friends core", -1,
                                 Methods};

PyMODINIT_FUNC PyInit__fof(void) { return PyModule_Create(&mod); }
