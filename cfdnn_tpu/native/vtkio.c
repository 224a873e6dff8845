/* Native VTK block encoder (reference: src/solver_vtk.cpp 15-109 writes
 * big-endian binary STRUCTURED_POINTS from C++; this is the TPU build's
 * native IO equivalent).
 *
 * The hot work of a snapshot is transpose (i,j,k)->(k,j,i), float64
 * big-endian byteswap, and (for velocity) 3-way interleave. The NumPy path
 * materializes three temporaries per field; this module does all of it in
 * one pass over the source buffer with the GIL released, writing into a
 * single output bytes object.
 *
 * Exposed functions (all take C-contiguous float64 buffers of shape
 * (nx, ny, nz) flattened, plus the dims):
 *   encode_scalar(buf, nx, ny, nz)        -> bytes  (len = 8*n)
 *   encode_vectors(bu, bv, bw, nx, ny, nz) -> bytes (len = 24*n, interleaved)
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdint.h>
#include <string.h>

static inline uint64_t bswap64(uint64_t v) {
#if defined(__GNUC__) || defined(__clang__)
    return __builtin_bswap64(v);
#else
    v = ((v & 0x00000000FFFFFFFFull) << 32) | (v >> 32);
    v = ((v & 0x0000FFFF0000FFFFull) << 16) | ((v >> 16) & 0x0000FFFF0000FFFFull);
    v = ((v & 0x00FF00FF00FF00FFull) << 8)  | ((v >> 8)  & 0x00FF00FF00FF00FFull);
    return v;
#endif
}

static int is_little_endian(void) {
    const uint16_t one = 1;
    return *(const uint8_t *)&one == 1;
}

/* VTK STRUCTURED_POINTS iterates x fastest: output index for cell (i,j,k)
 * of a C-contiguous (i,j,k) source is k*ny*nx + j*nx + i. */

static void transpose_swap_scalar(const uint64_t *src, uint64_t *dst,
                                  Py_ssize_t nx, Py_ssize_t ny,
                                  Py_ssize_t nz, int swap) {
    for (Py_ssize_t i = 0; i < nx; ++i) {
        for (Py_ssize_t j = 0; j < ny; ++j) {
            const uint64_t *s = src + (i * ny + j) * nz;
            uint64_t *d = dst + j * nx + i;
            if (swap) {
                for (Py_ssize_t k = 0; k < nz; ++k)
                    d[k * ny * nx] = bswap64(s[k]);
            } else {
                for (Py_ssize_t k = 0; k < nz; ++k)
                    d[k * ny * nx] = s[k];
            }
        }
    }
}

static void transpose_swap_vec(const uint64_t *u, const uint64_t *v,
                               const uint64_t *w, uint64_t *dst,
                               Py_ssize_t nx, Py_ssize_t ny,
                               Py_ssize_t nz, int swap) {
    for (Py_ssize_t i = 0; i < nx; ++i) {
        for (Py_ssize_t j = 0; j < ny; ++j) {
            Py_ssize_t base = (i * ny + j) * nz;
            uint64_t *d = dst + 3 * (j * nx + i);
            for (Py_ssize_t k = 0; k < nz; ++k) {
                uint64_t a = u[base + k], b = v[base + k], c = w[base + k];
                if (swap) { a = bswap64(a); b = bswap64(b); c = bswap64(c); }
                uint64_t *o = d + 3 * k * ny * nx;
                o[0] = a; o[1] = b; o[2] = c;
            }
        }
    }
}

static int get_f64_buffer(PyObject *obj, Py_buffer *view, Py_ssize_t n) {
    if (PyObject_GetBuffer(obj, view, PyBUF_C_CONTIGUOUS | PyBUF_FORMAT) != 0)
        return -1;
    /* byte-length alone would accept e.g. a (n,2) float32 buffer and
       silently encode garbage doubles; require an actual float64 view */
    if (view->itemsize != 8
        || (view->format && strcmp(view->format, "d") != 0)) {
        PyBuffer_Release(view);
        PyErr_Format(PyExc_TypeError,
                     "buffer must be float64 ('d'), got format '%s' "
                     "itemsize %zd",
                     view->format ? view->format : "?", view->itemsize);
        return -1;
    }
    if (view->len != (Py_ssize_t)(n * 8)) {
        PyBuffer_Release(view);
        PyErr_Format(PyExc_ValueError,
                     "buffer has %zd bytes, expected %zd (n=%zd float64)",
                     view->len, n * 8, n);
        return -1;
    }
    return 0;
}

static PyObject *encode_scalar(PyObject *self, PyObject *args) {
    PyObject *obj;
    Py_ssize_t nx, ny, nz;
    if (!PyArg_ParseTuple(args, "Onnn", &obj, &nx, &ny, &nz))
        return NULL;
    Py_ssize_t n = nx * ny * nz;
    Py_buffer view;
    if (get_f64_buffer(obj, &view, n) != 0)
        return NULL;
    PyObject *out = PyBytes_FromStringAndSize(NULL, n * 8);
    if (!out) { PyBuffer_Release(&view); return NULL; }
    int swap = is_little_endian();
    Py_BEGIN_ALLOW_THREADS
    transpose_swap_scalar((const uint64_t *)view.buf,
                          (uint64_t *)PyBytes_AS_STRING(out),
                          nx, ny, nz, swap);
    Py_END_ALLOW_THREADS
    PyBuffer_Release(&view);
    return out;
}

static PyObject *encode_vectors(PyObject *self, PyObject *args) {
    PyObject *ou, *ov, *ow;
    Py_ssize_t nx, ny, nz;
    if (!PyArg_ParseTuple(args, "OOOnnn", &ou, &ov, &ow, &nx, &ny, &nz))
        return NULL;
    Py_ssize_t n = nx * ny * nz;
    Py_buffer bu, bv, bw;
    if (get_f64_buffer(ou, &bu, n) != 0) return NULL;
    if (get_f64_buffer(ov, &bv, n) != 0) { PyBuffer_Release(&bu); return NULL; }
    if (get_f64_buffer(ow, &bw, n) != 0) {
        PyBuffer_Release(&bu); PyBuffer_Release(&bv); return NULL;
    }
    PyObject *out = PyBytes_FromStringAndSize(NULL, n * 24);
    if (!out) {
        PyBuffer_Release(&bu); PyBuffer_Release(&bv); PyBuffer_Release(&bw);
        return NULL;
    }
    int swap = is_little_endian();
    Py_BEGIN_ALLOW_THREADS
    transpose_swap_vec((const uint64_t *)bu.buf, (const uint64_t *)bv.buf,
                       (const uint64_t *)bw.buf,
                       (uint64_t *)PyBytes_AS_STRING(out), nx, ny, nz, swap);
    Py_END_ALLOW_THREADS
    PyBuffer_Release(&bu); PyBuffer_Release(&bv); PyBuffer_Release(&bw);
    return out;
}

static PyMethodDef Methods[] = {
    {"encode_scalar", encode_scalar, METH_VARARGS,
     "encode_scalar(f64_buf, nx, ny, nz) -> big-endian VTK-ordered bytes"},
    {"encode_vectors", encode_vectors, METH_VARARGS,
     "encode_vectors(u, v, w, nx, ny, nz) -> interleaved big-endian bytes"},
    {NULL, NULL, 0, NULL}
};

static struct PyModuleDef mod = {
    PyModuleDef_HEAD_INIT, "_vtkio",
    "Native VTK block encoder (transpose + byteswap + interleave in C)",
    -1, Methods
};

PyMODINIT_FUNC PyInit__vtkio(void) { return PyModule_Create(&mod); }
