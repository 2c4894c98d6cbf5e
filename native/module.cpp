// CPython bindings for the native components (no pybind11 in this image —
// raw CPython C API as mandated by the build environment).
//
// Module: rtfs_net_tpu_native
//   pesq(ref: float32 buffer, deg: float32 buffer, fs: int) -> float
//   crc32c(data: bytes) -> int
#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <vector>

extern "C" {
double rtfs_pesq_score(const float* ref, const float* deg, int n, int fs);
double rtfs_pesq_score_opts(const float* ref, const float* deg, int n,
                            int fs, int utt_align);
int rtfs_pesq_crude_delay(const float* ref, const float* deg, int n, int fs);
uint32_t rtfs_crc32c(const uint8_t* data, size_t len);
}

static int get_float_buffer(PyObject* obj, Py_buffer* view) {
  if (PyObject_GetBuffer(obj, view, PyBUF_CONTIG_RO | PyBUF_FORMAT) != 0)
    return -1;
  if (view->itemsize != sizeof(float) ||
      (view->format && view->format[0] != 'f')) {
    PyBuffer_Release(view);
    PyErr_SetString(PyExc_TypeError, "expected a contiguous float32 buffer");
    return -1;
  }
  return 0;
}

static PyObject* py_pesq(PyObject* self, PyObject* args) {
  PyObject *ref_obj, *deg_obj;
  int fs;
  int utt_align = 1;  // optional: 0 = crude whole-signal delay only
  if (!PyArg_ParseTuple(args, "OOi|i", &ref_obj, &deg_obj, &fs, &utt_align))
    return nullptr;
  Py_buffer ref_view, deg_view;
  if (get_float_buffer(ref_obj, &ref_view) != 0) return nullptr;
  if (get_float_buffer(deg_obj, &deg_view) != 0) {
    PyBuffer_Release(&ref_view);
    return nullptr;
  }
  Py_ssize_t n = ref_view.len / (Py_ssize_t)sizeof(float);
  Py_ssize_t nd = deg_view.len / (Py_ssize_t)sizeof(float);
  if (nd < n) n = nd;
  double score;
  Py_BEGIN_ALLOW_THREADS
  score = rtfs_pesq_score_opts(static_cast<const float*>(ref_view.buf),
                               static_cast<const float*>(deg_view.buf),
                               static_cast<int>(n), fs, utt_align);
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&ref_view);
  PyBuffer_Release(&deg_view);
  return PyFloat_FromDouble(score);
}

static PyObject* py_align_delay(PyObject* self, PyObject* args) {
  PyObject *ref_obj, *deg_obj;
  int fs;
  if (!PyArg_ParseTuple(args, "OOi", &ref_obj, &deg_obj, &fs))
    return nullptr;
  Py_buffer ref_view, deg_view;
  if (get_float_buffer(ref_obj, &ref_view) != 0) return nullptr;
  if (get_float_buffer(deg_obj, &deg_view) != 0) {
    PyBuffer_Release(&ref_view);
    return nullptr;
  }
  Py_ssize_t n = ref_view.len / (Py_ssize_t)sizeof(float);
  Py_ssize_t nd = deg_view.len / (Py_ssize_t)sizeof(float);
  if (nd < n) n = nd;
  int delay;
  Py_BEGIN_ALLOW_THREADS
  delay = rtfs_pesq_crude_delay(static_cast<const float*>(ref_view.buf),
                                static_cast<const float*>(deg_view.buf),
                                static_cast<int>(n), fs);
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&ref_view);
  PyBuffer_Release(&deg_view);
  return PyLong_FromLong(delay);
}

static PyObject* py_crc32c(PyObject* self, PyObject* args) {
  Py_buffer view;
  if (!PyArg_ParseTuple(args, "y*", &view)) return nullptr;
  uint32_t crc = rtfs_crc32c(static_cast<const uint8_t*>(view.buf),
                             static_cast<size_t>(view.len));
  PyBuffer_Release(&view);
  return PyLong_FromUnsignedLong(crc);
}

static PyMethodDef Methods[] = {
    {"pesq", py_pesq, METH_VARARGS,
     "pesq(ref_f32, deg_f32, fs) -> MOS-like score in [-0.5, 4.5]"},
    {"align_delay", py_align_delay, METH_VARARGS,
     "align_delay(ref_f32, deg_f32, fs) -> crude delay estimate in samples "
     "(add to a reference index to read its degraded counterpart)"},
    {"crc32c", py_crc32c, METH_VARARGS, "crc32c(bytes) -> int"},
    {nullptr, nullptr, 0, nullptr},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "rtfs_net_tpu_native",
    "Native (C++) components of rtfs_net_tpu", -1, Methods,
};

PyMODINIT_FUNC PyInit_rtfs_net_tpu_native(void) {
  return PyModule_Create(&moduledef);
}
