// Native host ops for the vbt-tpu runtime.
//
// The reference delegated all host-side heavy lifting to native
// dependencies (scipy/LAPACK Hungarian at eval.py:143, C++ OpenCV, the
// TFLite interpreter — SURVEY.md §2.3). This extension provides the
// framework's own native host kernels, exposed through the CPython C API
// (no pybind11 in this environment):
//
//  - jv_assign:   Jonker-Volgonant shortest-augmenting-path linear
//                 assignment (exact Hungarian optimum) on a dense float64
//                 cost matrix, minimizing. O(n^3).
//  - iou_matrix:  dense pairwise IoU of two [ymin,xmin,ymax,xmax] box sets
//                 (the O(N*M) Python loop at eval.py:124-126, natively).
//
// Both operate on C-contiguous float64 numpy arrays.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <cmath>
#include <limits>
#include <vector>

namespace {

constexpr double kInf = std::numeric_limits<double>::infinity();

// Shortest-augmenting-path assignment on an n x m cost matrix (n <= m).
// Returns col_of_row. Classical e-maxx formulation with 0-based columns and
// a virtual column m.
void jv_solve(const double* cost, int n, int m, std::vector<int>& col_of_row) {
  std::vector<double> u(n + 1, 0.0), v(m + 1, 0.0);
  std::vector<int> p(m + 1, -1);  // p[j] = row matched to column j
  std::vector<int> way(m + 1, 0);

  for (int i = 0; i < n; ++i) {
    p[m] = i;
    int j0 = m;
    std::vector<double> minv(m + 1, kInf);
    std::vector<char> used(m + 1, 0);
    do {
      used[j0] = 1;
      const int i0 = p[j0];
      double delta = kInf;
      int j1 = -1;
      const double* row = cost + static_cast<size_t>(i0) * m;
      for (int j = 0; j < m; ++j) {
        if (used[j]) continue;
        const double cur = row[j] - u[i0] - v[j];
        if (cur < minv[j]) {
          minv[j] = cur;
          way[j] = j0;
        }
        if (minv[j] < delta) {
          delta = minv[j];
          j1 = j;
        }
      }
      for (int j = 0; j <= m; ++j) {
        if (used[j]) {
          if (p[j] >= 0) u[p[j]] += delta;
          v[j] -= delta;
        } else {
          minv[j] -= delta;
        }
      }
      j0 = j1;
    } while (p[j0] != -1);
    // Augment along the predecessor chain.
    do {
      const int j1 = way[j0];
      p[j0] = p[j1];
      j0 = j1;
    } while (j0 != m);
    p[m] = -1;
  }

  col_of_row.assign(n, -1);
  for (int j = 0; j < m; ++j) {
    if (p[j] >= 0) col_of_row[p[j]] = j;
  }
}

PyObject* py_jv_assign(PyObject*, PyObject* args) {
  PyObject* obj;
  if (!PyArg_ParseTuple(args, "O", &obj)) return nullptr;
  PyArrayObject* arr = reinterpret_cast<PyArrayObject*>(
      PyArray_FROM_OTF(obj, NPY_FLOAT64, NPY_ARRAY_IN_ARRAY));
  if (!arr) return nullptr;
  if (PyArray_NDIM(arr) != 2) {
    Py_DECREF(arr);
    PyErr_SetString(PyExc_ValueError, "cost matrix must be 2-D");
    return nullptr;
  }
  const int n = static_cast<int>(PyArray_DIM(arr, 0));
  const int m = static_cast<int>(PyArray_DIM(arr, 1));
  if (n > m) {
    Py_DECREF(arr);
    PyErr_SetString(PyExc_ValueError, "requires rows <= cols; pad first");
    return nullptr;
  }
  std::vector<int> col_of_row;
  {
    const double* data = static_cast<const double*>(PyArray_DATA(arr));
    Py_BEGIN_ALLOW_THREADS;
    jv_solve(data, n, m, col_of_row);
    Py_END_ALLOW_THREADS;
  }
  Py_DECREF(arr);

  npy_intp dims[1] = {n};
  PyObject* out = PyArray_SimpleNew(1, dims, NPY_INT64);
  if (!out) return nullptr;
  int64_t* optr =
      static_cast<int64_t*>(PyArray_DATA(reinterpret_cast<PyArrayObject*>(out)));
  for (int i = 0; i < n; ++i) optr[i] = col_of_row[i];
  return out;
}

PyObject* py_iou_matrix(PyObject*, PyObject* args) {
  PyObject *obj_a, *obj_b;
  if (!PyArg_ParseTuple(args, "OO", &obj_a, &obj_b)) return nullptr;
  PyArrayObject* a = reinterpret_cast<PyArrayObject*>(
      PyArray_FROM_OTF(obj_a, NPY_FLOAT64, NPY_ARRAY_IN_ARRAY));
  if (!a) return nullptr;
  PyArrayObject* b = reinterpret_cast<PyArrayObject*>(
      PyArray_FROM_OTF(obj_b, NPY_FLOAT64, NPY_ARRAY_IN_ARRAY));
  if (!b) {
    Py_DECREF(a);
    return nullptr;
  }
  if (PyArray_NDIM(a) != 2 || PyArray_DIM(a, 1) != 4 || PyArray_NDIM(b) != 2 ||
      PyArray_DIM(b, 1) != 4) {
    Py_DECREF(a);
    Py_DECREF(b);
    PyErr_SetString(PyExc_ValueError, "boxes must be (N, 4) arrays");
    return nullptr;
  }
  const npy_intp n = PyArray_DIM(a, 0);
  const npy_intp m = PyArray_DIM(b, 0);
  npy_intp dims[2] = {n, m};
  PyObject* out = PyArray_SimpleNew(2, dims, NPY_FLOAT64);
  if (!out) {
    Py_DECREF(a);
    Py_DECREF(b);
    return nullptr;
  }
  const double* pa = static_cast<const double*>(PyArray_DATA(a));
  const double* pb = static_cast<const double*>(PyArray_DATA(b));
  double* po =
      static_cast<double*>(PyArray_DATA(reinterpret_cast<PyArrayObject*>(out)));
  Py_BEGIN_ALLOW_THREADS;
  for (npy_intp i = 0; i < n; ++i) {
    const double ay1 = pa[i * 4 + 0], ax1 = pa[i * 4 + 1];
    const double ay2 = pa[i * 4 + 2], ax2 = pa[i * 4 + 3];
    const double area_a = (ay2 - ay1) * (ax2 - ax1);
    for (npy_intp j = 0; j < m; ++j) {
      const double by1 = pb[j * 4 + 0], bx1 = pb[j * 4 + 1];
      const double by2 = pb[j * 4 + 2], bx2 = pb[j * 4 + 3];
      const double ih = std::fmax(0.0, std::fmin(ay2, by2) - std::fmax(ay1, by1));
      const double iw = std::fmax(0.0, std::fmin(ax2, bx2) - std::fmax(ax1, bx1));
      const double inter = ih * iw;
      const double uni = area_a + (by2 - by1) * (bx2 - bx1) - inter;
      po[i * m + j] = uni > 0.0 ? inter / uni : 0.0;
    }
  }
  Py_END_ALLOW_THREADS;
  Py_DECREF(a);
  Py_DECREF(b);
  return out;
}

PyMethodDef kMethods[] = {
    {"jv_assign", py_jv_assign, METH_VARARGS,
     "Exact minimizing linear assignment; (n,m) float64 cost with n<=m -> "
     "int64 col_of_row (n,)."},
    {"iou_matrix", py_iou_matrix, METH_VARARGS,
     "Pairwise IoU of two (N,4)/(M,4) [ymin,xmin,ymax,xmax] box sets."},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef kModule = {
    PyModuleDef_HEAD_INIT, "_hostops",
    "Native host ops (Hungarian assignment, IoU) for vbt-tpu.", -1, kMethods,
};

}  // namespace

PyMODINIT_FUNC PyInit__hostops(void) {
  PyObject* mod = PyModule_Create(&kModule);
  if (!mod) return nullptr;
  import_array();
  return mod;
}
