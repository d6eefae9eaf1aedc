/* fastpoints — native PointCloud2 field extraction.
 *
 * The host side of the serving pipeline decodes ~300 MB/s of PointCloud2
 * payloads at the target frame rate on a single core; the numpy path
 * (strided view + copy per field) pays one pass per field plus python
 * overhead. This extension fuses the strided gather of all requested
 * fields into one C pass writing float32 rows.
 *
 * Pure CPython C API (no pybind11 in this image); the python shim wraps
 * the returned bytes with numpy. Falls back transparently when unbuilt —
 * see tpufusion/native/__init__.py.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdint.h>
#include <string.h>
#include <stdlib.h>

/* PointField datatype codes (sensor_msgs/PointField) */
enum {
  PF_INT8 = 1, PF_UINT8 = 2, PF_INT16 = 3, PF_UINT16 = 4,
  PF_INT32 = 5, PF_UINT32 = 6, PF_FLOAT32 = 7, PF_FLOAT64 = 8
};

static inline float read_field(const uint8_t *p, int code) {
  switch (code) {
    case PF_INT8:    return (float)*(const int8_t *)p;
    case PF_UINT8:   return (float)*(const uint8_t *)p;
    case PF_INT16:   { int16_t v;  memcpy(&v, p, 2); return (float)v; }
    case PF_UINT16:  { uint16_t v; memcpy(&v, p, 2); return (float)v; }
    case PF_INT32:   { int32_t v;  memcpy(&v, p, 4); return (float)v; }
    case PF_UINT32:  { uint32_t v; memcpy(&v, p, 4); return (float)v; }
    case PF_FLOAT32: { float v;    memcpy(&v, p, 4); return v; }
    case PF_FLOAT64: { double v;   memcpy(&v, p, 8); return (float)v; }
    default:         return 0.0f;
  }
}

/* unpack(data: bytes, n: int, point_step: int,
 *        offsets: tuple[int], codes: tuple[int]) -> bytes (n*nf float32)
 * offset < 0 marks an absent field -> NaN column. */
static PyObject *unpack(PyObject *self, PyObject *args) {
  Py_buffer data;
  Py_ssize_t n, point_step;
  PyObject *offsets_obj, *codes_obj;
  if (!PyArg_ParseTuple(args, "y*nnOO", &data, &n, &point_step,
                        &offsets_obj, &codes_obj))
    return NULL;

  Py_ssize_t nf = PyTuple_Size(offsets_obj);
  if (nf < 0 || PyTuple_Size(codes_obj) != nf) {
    PyBuffer_Release(&data);
    PyErr_SetString(PyExc_ValueError, "offsets/codes mismatch");
    return NULL;
  }
  long offsets[16];
  int codes[16];
  if (nf > 16) {
    PyBuffer_Release(&data);
    PyErr_SetString(PyExc_ValueError, "too many fields (max 16)");
    return NULL;
  }
  static const int field_size[9] = {0, 1, 1, 2, 2, 4, 4, 4, 8};
  for (Py_ssize_t j = 0; j < nf; j++) {
    offsets[j] = PyLong_AsLong(PyTuple_GetItem(offsets_obj, j));
    codes[j] = (int)PyLong_AsLong(PyTuple_GetItem(codes_obj, j));
    if (offsets[j] >= 0) {
      if (codes[j] < 1 || codes[j] > 8 ||
          offsets[j] + field_size[codes[j]] > point_step) {
        PyBuffer_Release(&data);
        PyErr_SetString(PyExc_ValueError,
                        "field offset/type exceeds point_step");
        return NULL;
      }
    }
  }
  if ((Py_ssize_t)(n * point_step) > data.len) {
    PyBuffer_Release(&data);
    PyErr_SetString(PyExc_ValueError, "data shorter than n*point_step");
    return NULL;
  }

  PyObject *out_bytes = PyBytes_FromStringAndSize(NULL, n * nf * 4);
  if (!out_bytes) {
    PyBuffer_Release(&data);
    return NULL;
  }
  float *out = (float *)PyBytes_AS_STRING(out_bytes);
  const uint8_t *src = (const uint8_t *)data.buf;
  const float nanf_ = __builtin_nanf("");

  Py_BEGIN_ALLOW_THREADS
  for (Py_ssize_t i = 0; i < n; i++) {
    const uint8_t *row = src + i * point_step;
    float *dst = out + i * nf;
    for (Py_ssize_t j = 0; j < nf; j++) {
      dst[j] = offsets[j] < 0 ? nanf_ : read_field(row + offsets[j], codes[j]);
    }
  }
  Py_END_ALLOW_THREADS

  PyBuffer_Release(&data);
  return out_bytes;
}

/* lz4_decompress(src: bytes, hint: int = -1) -> bytes
 *
 * LZ4 *block* format decode (the payload of roslz4 frame blocks): per
 * sequence a token byte (literal-length high nibble, match-length low
 * nibble), 255-continuation extensions, literals, LE u16 match offset,
 * match length + 4. `hint` preallocates the output (bag chunks carry
 * their decompressed size) and acts as a HARD output bound: a crafted
 * high-expansion stream errors out instead of growing past the declared
 * size (a few-MB chunk could otherwise allocate gigabytes before the
 * caller's post-hoc length check). Without a hint, growth doubles. Mirrors
 * tpufusion/data/lz4.py::lz4_block_decompress, which stays the
 * fallback when the extension is unbuilt. */
static PyObject *lz4_decompress(PyObject *self, PyObject *args) {
  Py_buffer data;
  Py_ssize_t hint = -1;
  if (!PyArg_ParseTuple(args, "y*|n", &data, &hint))
    return NULL;
  const uint8_t *src = (const uint8_t *)data.buf;
  Py_ssize_t n = data.len;

  Py_ssize_t cap = hint > 0 ? hint : (n * 3 + 64);
  uint8_t *dst = (uint8_t *)malloc(cap);
  if (!dst) {
    PyBuffer_Release(&data);
    return PyErr_NoMemory();
  }
  Py_ssize_t len = 0;
  const char *err = NULL;

  Py_BEGIN_ALLOW_THREADS
  Py_ssize_t i = 0;
  while (i < n) {
    unsigned token = src[i++];
    Py_ssize_t lit = token >> 4;
    if (lit == 15) {
      unsigned b;
      do {
        if (i >= n) { err = "lz4: truncated literal length"; goto done; }
        b = src[i++];
        lit += b;
      } while (b == 255);
    }
    if (i + lit > n) { err = "lz4: literal run past end of input"; goto done; }
    if (len + lit > cap) {
      if (hint > 0) { err = "lz4: output exceeds declared size"; goto done; }
      Py_ssize_t nc = cap * 2 + lit;
      uint8_t *nd = (uint8_t *)realloc(dst, nc);
      if (!nd) { err = "oom"; goto done; }
      dst = nd; cap = nc;
    }
    memcpy(dst + len, src + i, lit);
    len += lit; i += lit;
    if (i >= n) break; /* last sequence has no match */

    if (i + 2 > n) { err = "lz4: truncated match offset"; goto done; }
    Py_ssize_t off = src[i] | ((Py_ssize_t)src[i + 1] << 8);
    i += 2;
    if (off == 0 || off > len) { err = "lz4: invalid match offset"; goto done; }
    Py_ssize_t mlen = (token & 15);
    if (mlen == 15) {
      unsigned b;
      do {
        if (i >= n) { err = "lz4: truncated match length"; goto done; }
        b = src[i++];
        mlen += b;
      } while (b == 255);
    }
    mlen += 4;
    if (len + mlen > cap) {
      if (hint > 0) { err = "lz4: output exceeds declared size"; goto done; }
      Py_ssize_t nc = cap * 2 + mlen;
      uint8_t *nd = (uint8_t *)realloc(dst, nc);
      if (!nd) { err = "oom"; goto done; }
      dst = nd; cap = nc;
    }
    if (off >= mlen) {
      memcpy(dst + len, dst + len - off, mlen);
      len += mlen;
    } else {
      /* overlapping match: RLE-style byte copy */
      for (Py_ssize_t k = 0; k < mlen; k++, len++)
        dst[len] = dst[len - off];
    }
  }
done:;
  Py_END_ALLOW_THREADS

  PyBuffer_Release(&data);
  if (err) {
    free(dst);
    if (err[0] == 'o')
      return PyErr_NoMemory();
    PyErr_SetString(PyExc_ValueError, err);
    return NULL;
  }
  PyObject *out = PyBytes_FromStringAndSize((const char *)dst, len);
  free(dst);
  return out;
}

static PyMethodDef Methods[] = {
    {"unpack", unpack, METH_VARARGS,
     "Fused strided PointCloud2 field extraction to float32 rows."},
    {"lz4_decompress", lz4_decompress, METH_VARARGS,
     "LZ4 block decode (roslz4 chunk payloads)."},
    {NULL, NULL, 0, NULL}};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_fastpoints",
    "native PointCloud2 decoding", -1, Methods};

PyMODINIT_FUNC PyInit__fastpoints(void) {
  return PyModule_Create(&moduledef);
}
