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

/* ---- LZ4 frame walk + block compressor (the rest of the bag chunk
 * codec). The pure-python frame walk measured 44 MB/s on raw-block
 * frames (1600 block slices + bytearray appends per 100 MB chunk) and
 * the python greedy compressor 2 MB/s — both byte-granular loops, both
 * native now. tpufusion/data/lz4.py keeps the fallbacks. */

/* growable output buffer shared by the frame decoder */
typedef struct {
  uint8_t *buf;
  Py_ssize_t len, cap;
  int fixed; /* hint given: cap is a HARD bound (see lz4_decompress) */
} lz4_out_t;

static const char *out_reserve(lz4_out_t *o, Py_ssize_t extra) {
  if (o->len + extra <= o->cap) return NULL;
  if (o->fixed) return "lz4: output exceeds declared size";
  Py_ssize_t nc = o->cap * 2 + extra;
  uint8_t *nd = (uint8_t *)realloc(o->buf, nc);
  if (!nd) return "oom";
  o->buf = nd;
  o->cap = nc;
  return NULL;
}

/* Decode one LZ4 block appending to `o`. Match offsets may reach back
 * across earlier blocks in the same output (superset of
 * block-independent streams; also decodes block-linked frames). */
static const char *lz4_block_into(const uint8_t *src, Py_ssize_t n,
                                  lz4_out_t *o) {
  Py_ssize_t i = 0;
  while (i < n) {
    unsigned token = src[i++];
    Py_ssize_t lit = token >> 4;
    if (lit == 15) {
      unsigned b;
      do {
        if (i >= n) return "lz4: truncated literal length";
        b = src[i++];
        lit += b;
      } while (b == 255);
    }
    if (i + lit > n) return "lz4: literal run past end of input";
    const char *err = out_reserve(o, lit);
    if (err) return err;
    memcpy(o->buf + o->len, src + i, lit);
    o->len += lit;
    i += lit;
    if (i >= n) break; /* last sequence has no match */

    if (i + 2 > n) return "lz4: truncated match offset";
    Py_ssize_t off = src[i] | ((Py_ssize_t)src[i + 1] << 8);
    i += 2;
    if (off == 0 || off > o->len) return "lz4: invalid match offset";
    Py_ssize_t mlen = (token & 15);
    if (mlen == 15) {
      unsigned b;
      do {
        if (i >= n) return "lz4: truncated match length";
        b = src[i++];
        mlen += b;
      } while (b == 255);
    }
    mlen += 4;
    err = out_reserve(o, mlen);
    if (err) return err;
    if (off >= mlen) {
      memcpy(o->buf + o->len, o->buf + o->len - off, mlen);
      o->len += mlen;
    } else {
      for (Py_ssize_t k = 0; k < mlen; k++, o->len++)
        o->buf[o->len] = o->buf[o->len - off];
    }
  }
  return NULL;
}

#define LZ4_FRAME_MAGIC 0x184D2204u

/* lz4_frame_decompress(src: bytes, hint: int = -1) -> bytes
 *
 * Full roslz4/LZ4-Frame walk: magic, FLG/BD, optional content size,
 * header-checksum byte (skipped, matching the python fallback), then
 * <u32 size><block> records (high bit = stored raw) until the zero
 * EndMark. `hint` (the bag chunk record's declared uncompressed size)
 * preallocates the output once and hard-bounds it. */
static PyObject *lz4_frame_decompress_c(PyObject *self, PyObject *args) {
  Py_buffer data;
  Py_ssize_t hint = -1;
  if (!PyArg_ParseTuple(args, "y*|n", &data, &hint))
    return NULL;
  const uint8_t *src = (const uint8_t *)data.buf;
  Py_ssize_t n = data.len;
  const char *err = NULL;
  lz4_out_t o = {NULL, 0, 0, hint > 0};
  o.cap = hint > 0 ? hint : (n * 3 + 4096);
  o.buf = (uint8_t *)malloc(o.cap);
  if (!o.buf) {
    PyBuffer_Release(&data);
    return PyErr_NoMemory();
  }

  Py_BEGIN_ALLOW_THREADS
  if (n < 7) {
    err = "lz4 frame too short";
    goto done;
  }
  uint32_t magic;
  memcpy(&magic, src, 4);
  if (magic != LZ4_FRAME_MAGIC) {
    err = "bad lz4 frame magic";
    goto done;
  }
  unsigned flg = src[4];
  if ((flg >> 6) != 1) {
    err = "unsupported lz4 frame version";
    goto done;
  }
  int block_checksum = (flg >> 4) & 1;
  Py_ssize_t pos = 6; /* magic + FLG + BD */
  if ((flg >> 3) & 1) pos += 8; /* content size */
  pos += 1;                     /* header checksum byte (not validated) */
  while (pos + 4 <= n) {
    uint32_t bsize;
    memcpy(&bsize, src + pos, 4);
    pos += 4;
    if (bsize == 0) break; /* EndMark; content checksum ignored */
    int is_raw = bsize >> 31;
    bsize &= 0x7FFFFFFFu;
    if (pos + (Py_ssize_t)bsize > n) {
      err = "lz4: truncated block";
      goto done;
    }
    if (is_raw) {
      err = out_reserve(&o, bsize);
      if (err) goto done;
      memcpy(o.buf + o.len, src + pos, bsize);
      o.len += bsize;
    } else {
      err = lz4_block_into(src + pos, bsize, &o);
      if (err) goto done;
    }
    pos += bsize;
    if (block_checksum) pos += 4;
  }
done:;
  Py_END_ALLOW_THREADS

  PyBuffer_Release(&data);
  if (err) {
    free(o.buf);
    if (err[0] == 'o') return PyErr_NoMemory();
    PyErr_SetString(PyExc_ValueError, err);
    return NULL;
  }
  PyObject *out = PyBytes_FromStringAndSize((const char *)o.buf, o.len);
  free(o.buf);
  return out;
}

/* ---- greedy block compressor (hash-table matcher, format-spec
 * implementation mirroring lz4.py::lz4_block_compress semantics:
 * last 5 bytes literals, no match starting in the final 12). */

#define LZ4_HASH_LOG 14
#define LZ4_MFLIMIT 12
#define LZ4_LAST_LITERALS 5

static inline uint32_t lz4_hash4(const uint8_t *p) {
  uint32_t v;
  memcpy(&v, p, 4);
  return (v * 2654435761u) >> (32 - LZ4_HASH_LOG);
}

static void emit_length(uint8_t *dst, Py_ssize_t *dl, Py_ssize_t extra) {
  while (extra >= 255) {
    dst[(*dl)++] = 255;
    extra -= 255;
  }
  dst[(*dl)++] = (uint8_t)extra;
}

/* Compress src[0:n] into dst (caller guarantees worst-case capacity
 * n + n/255 + 16). Returns the compressed length. */
static Py_ssize_t lz4_block_compress_c(const uint8_t *src, Py_ssize_t n,
                                       uint8_t *dst) {
  Py_ssize_t dl = 0;
  if (n == 0) {
    dst[dl++] = 0; /* empty block: one zero token */
    return dl;
  }
  int32_t table[1 << LZ4_HASH_LOG];
  for (Py_ssize_t k = 0; k < (1 << LZ4_HASH_LOG); k++) table[k] = -1;
  Py_ssize_t i = 0, anchor = 0;
  Py_ssize_t limit = n - LZ4_MFLIMIT;
  /* miss acceleration: on low-match data (float noise hits the hash on
   * repetitive exponent bytes but fails the 4-byte check) advance by a
   * growing stride instead of 1 — the standard LZ4-fast scheme; costs a
   * little ratio on such data, 3-4x the speed. */
  Py_ssize_t misses = 0;
  while (i < limit) {
    uint32_t h = lz4_hash4(src + i);
    Py_ssize_t j = table[h];
    table[h] = (int32_t)i;
    if (j >= 0 && i - j <= 0xFFFF &&
        memcmp(src + j, src + i, 4) == 0) {
      misses = 0;
      Py_ssize_t mlen = 4;
      Py_ssize_t stop = n - LZ4_LAST_LITERALS;
      while (i + mlen < stop && src[j + mlen] == src[i + mlen]) mlen++;
      /* emit sequence: token, literal run, offset, match extension */
      Py_ssize_t lit = i - anchor;
      Py_ssize_t token_lit = lit < 15 ? lit : 15;
      Py_ssize_t token_m = (mlen - 4) < 15 ? (mlen - 4) : 15;
      dst[dl++] = (uint8_t)((token_lit << 4) | token_m);
      if (token_lit == 15) emit_length(dst, &dl, lit - 15);
      memcpy(dst + dl, src + anchor, lit);
      dl += lit;
      Py_ssize_t off = i - j;
      dst[dl++] = (uint8_t)(off & 0xFF);
      dst[dl++] = (uint8_t)(off >> 8);
      if (token_m == 15) emit_length(dst, &dl, mlen - 4 - 15);
      i += mlen;
      anchor = i;
    } else {
      i += 1 + (misses++ >> 6);
    }
  }
  /* trailing literals */
  Py_ssize_t lit = n - anchor;
  Py_ssize_t token_lit = lit < 15 ? lit : 15;
  dst[dl++] = (uint8_t)(token_lit << 4);
  if (token_lit == 15) emit_length(dst, &dl, lit - 15);
  memcpy(dst + dl, src + anchor, lit);
  dl += lit;
  return dl;
}

/* lz4_compress(src: bytes) -> bytes — one LZ4 block. */
static PyObject *lz4_compress_c(PyObject *self, PyObject *args) {
  Py_buffer data;
  if (!PyArg_ParseTuple(args, "y*", &data))
    return NULL;
  Py_ssize_t n = data.len;
  uint8_t *dst = (uint8_t *)malloc(n + n / 255 + 16);
  if (!dst) {
    PyBuffer_Release(&data);
    return PyErr_NoMemory();
  }
  Py_ssize_t dl;
  Py_BEGIN_ALLOW_THREADS
  dl = lz4_block_compress_c((const uint8_t *)data.buf, n, dst);
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&data);
  PyObject *out = PyBytes_FromStringAndSize((const char *)dst, dl);
  free(dst);
  return out;
}

/* lz4_frame_compress(src: bytes, block_size: int = 65536) -> bytes
 *
 * Frame wrapper matching lz4.py::lz4_frame_compress byte layout:
 * version-01 FLG with block-independent bit, BD id 4, a zero
 * header-checksum byte (our readers skip it — fixture/ETL format, not
 * for external LZ4 tools that validate xxh32), per-block the smaller of
 * compressed/raw, zero EndMark. */
static PyObject *lz4_frame_compress_c(PyObject *self, PyObject *args) {
  Py_buffer data;
  Py_ssize_t bs = 1 << 16;
  if (!PyArg_ParseTuple(args, "y*|n", &data, &bs))
    return NULL;
  Py_ssize_t n = data.len;
  if (bs <= 0) {
    PyBuffer_Release(&data);
    PyErr_SetString(PyExc_ValueError, "block_size must be positive");
    return NULL;
  }
  Py_ssize_t nblocks = n ? (n + bs - 1) / bs : 1;
  /* worst case: header + per block (u32 + raw payload) + endmark */
  Py_ssize_t cap = 7 + nblocks * (4 + bs) + 4 + 64;
  uint8_t *dst = (uint8_t *)malloc(cap);
  uint8_t *scratch = (uint8_t *)malloc(bs + bs / 255 + 16);
  if (!dst || !scratch) {
    free(dst);
    free(scratch);
    PyBuffer_Release(&data);
    return PyErr_NoMemory();
  }
  const uint8_t *src = (const uint8_t *)data.buf;
  Py_ssize_t dl = 0;

  Py_BEGIN_ALLOW_THREADS
  uint32_t magic = LZ4_FRAME_MAGIC;
  memcpy(dst + dl, &magic, 4);
  dl += 4;
  dst[dl++] = (1 << 6) | (1 << 5); /* version 01, block-independent */
  dst[dl++] = 0x40;                /* block max size id 4 (64 KB) */
  dst[dl++] = 0;                   /* header checksum placeholder */
  Py_ssize_t lo = 0;
  do {
    Py_ssize_t blen = (n - lo) < bs ? (n - lo) : bs;
    Py_ssize_t clen = lz4_block_compress_c(src + lo, blen, scratch);
    if (clen < blen) {
      uint32_t sz = (uint32_t)clen;
      memcpy(dst + dl, &sz, 4);
      dl += 4;
      memcpy(dst + dl, scratch, clen);
      dl += clen;
    } else {
      uint32_t sz = (uint32_t)blen | 0x80000000u;
      memcpy(dst + dl, &sz, 4);
      dl += 4;
      memcpy(dst + dl, src + lo, blen);
      dl += blen;
    }
    lo += bs;
  } while (lo < n);
  memset(dst + dl, 0, 4); /* EndMark */
  dl += 4;
  Py_END_ALLOW_THREADS

  PyBuffer_Release(&data);
  free(scratch);
  PyObject *out = PyBytes_FromStringAndSize((const char *)dst, dl);
  free(dst);
  return out;
}

static PyMethodDef Methods[] = {
    {"unpack", unpack, METH_VARARGS,
     "Fused strided PointCloud2 field extraction to float32 rows."},
    {"lz4_decompress", lz4_decompress, METH_VARARGS,
     "LZ4 block decode (roslz4 chunk payloads)."},
    {"lz4_frame_decompress", lz4_frame_decompress_c, METH_VARARGS,
     "LZ4 frame decode (whole roslz4 bag chunk)."},
    {"lz4_compress", lz4_compress_c, METH_VARARGS,
     "LZ4 block encode (greedy hash matcher)."},
    {"lz4_frame_compress", lz4_frame_compress_c, METH_VARARGS,
     "LZ4 frame encode (bag chunk writer payload)."},
    {NULL, NULL, 0, NULL}};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_fastpoints",
    "native PointCloud2 decoding", -1, Methods};

PyMODINIT_FUNC PyInit__fastpoints(void) {
  return PyModule_Create(&moduledef);
}
