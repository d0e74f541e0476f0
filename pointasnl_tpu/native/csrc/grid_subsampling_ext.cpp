// Voxel-grid subsampling CPython extension.
//
// TPU-framework native equivalent of the reference's
// utils/cpp_wrappers/cpp_subsampling extension (same observable behavior:
// per-voxel barycenters for points/features, per-voxel majority vote for
// label columns; see grid_subsampling.cpp:5-106 there). Re-designed rather
// than ported: single pass over the cloud into a flat open-addressing hash
// keyed by the 3D voxel id, deterministic output order (sorted voxel id),
// deterministic tie-break for label votes (smallest label wins).
//
// Python signature (kwargs match the reference wrapper's kwlist):
//   compute(points, features=None, classes=None, sampleDl=0.1, verbose=0)
//     points:   (N, 3) float32
//     features: (N, F) float32 or None
//     classes:  (N,) or (N, L) int32 or None
//   returns points | (points, features) | (points, classes) |
//           (points, features, classes)

#define PY_SSIZE_T_CLEAN
#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <Python.h>
#include <numpy/arrayobject.h>

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <unordered_map>
#include <vector>

namespace {

struct VoxelAccum {
  int64_t count = 0;
  double sum[3] = {0.0, 0.0, 0.0};
  // feature sums appended dynamically: stored in a side vector indexed by slot
};

static PyObject* compute(PyObject* /*self*/, PyObject* args, PyObject* kwargs) {
  static const char* kwlist[] = {"points", "features", "classes",
                                 "sampleDl", "method", "verbose", nullptr};
  PyObject* points_obj = nullptr;
  PyObject* features_obj = Py_None;
  PyObject* classes_obj = Py_None;
  double sampleDl = 0.1;
  const char* method = "barycenters";
  int verbose = 0;

  if (!PyArg_ParseTupleAndKeywords(
          args, kwargs, "O|OOdsi", const_cast<char**>(kwlist), &points_obj,
          &features_obj, &classes_obj, &sampleDl, &method, &verbose)) {
    return nullptr;
  }

  PyArrayObject* points = reinterpret_cast<PyArrayObject*>(
      PyArray_FROM_OTF(points_obj, NPY_FLOAT32, NPY_ARRAY_IN_ARRAY));
  if (!points) return nullptr;
  if (PyArray_NDIM(points) != 2 || PyArray_DIM(points, 1) != 3) {
    Py_DECREF(points);
    PyErr_SetString(PyExc_ValueError, "points must have shape (N, 3)");
    return nullptr;
  }
  const npy_intp N = PyArray_DIM(points, 0);
  const float* P = static_cast<const float*>(PyArray_DATA(points));

  PyArrayObject* features = nullptr;
  npy_intp F = 0;
  if (features_obj != Py_None) {
    features = reinterpret_cast<PyArrayObject*>(
        PyArray_FROM_OTF(features_obj, NPY_FLOAT32, NPY_ARRAY_IN_ARRAY));
    if (!features) { Py_DECREF(points); return nullptr; }
    if (PyArray_NDIM(features) != 2 || PyArray_DIM(features, 0) != N) {
      Py_DECREF(points); Py_DECREF(features);
      PyErr_SetString(PyExc_ValueError, "features must have shape (N, F)");
      return nullptr;
    }
    F = PyArray_DIM(features, 1);
  }

  PyArrayObject* classes = nullptr;
  npy_intp L = 0;
  bool classes_1d = false;
  if (classes_obj != Py_None) {
    classes = reinterpret_cast<PyArrayObject*>(
        PyArray_FROM_OTF(classes_obj, NPY_INT32, NPY_ARRAY_IN_ARRAY));
    if (!classes) { Py_DECREF(points); Py_XDECREF(features); return nullptr; }
    if (PyArray_NDIM(classes) == 1 && PyArray_DIM(classes, 0) == N) {
      classes_1d = true;
      L = 1;
    } else if (PyArray_NDIM(classes) == 2 && PyArray_DIM(classes, 0) == N) {
      L = PyArray_DIM(classes, 1);
    } else {
      Py_DECREF(points); Py_XDECREF(features); Py_DECREF(classes);
      PyErr_SetString(PyExc_ValueError, "classes must have shape (N,) or (N, L)");
      return nullptr;
    }
  }

  const float* FV = features ? static_cast<const float*>(PyArray_DATA(features)) : nullptr;
  const int32_t* CV = classes ? static_cast<const int32_t*>(PyArray_DATA(classes)) : nullptr;

  // Voxel origin + grid dims (reference grid_subsampling.cpp:24-31 semantics).
  double minc[3] = {1e30, 1e30, 1e30}, maxc[3] = {-1e30, -1e30, -1e30};
  for (npy_intp i = 0; i < N; ++i) {
    for (int d = 0; d < 3; ++d) {
      const double v = P[i * 3 + d];
      if (v < minc[d]) minc[d] = v;
      if (v > maxc[d]) maxc[d] = v;
    }
  }
  double origin[3];
  for (int d = 0; d < 3; ++d)
    origin[d] = std::floor(minc[d] / sampleDl) * sampleDl;
  const int64_t nx = static_cast<int64_t>(std::floor((maxc[0] - origin[0]) / sampleDl)) + 1;
  const int64_t ny = static_cast<int64_t>(std::floor((maxc[1] - origin[1]) / sampleDl)) + 1;

  // One pass: accumulate per-voxel count / xyz / features; collect label
  // votes into per-voxel small maps.
  std::unordered_map<int64_t, int64_t> slot_of_key;  // voxel id -> slot
  slot_of_key.reserve(static_cast<size_t>(N) / 4 + 16);
  std::vector<int64_t> keys;
  std::vector<int64_t> counts;
  std::vector<double> xyz_sums;   // 3 per slot
  std::vector<double> feat_sums;  // F per slot
  std::vector<std::unordered_map<int32_t, int32_t>> votes;  // L per slot

  for (npy_intp i = 0; i < N; ++i) {
    const int64_t ix = static_cast<int64_t>(std::floor((P[i * 3 + 0] - origin[0]) / sampleDl));
    const int64_t iy = static_cast<int64_t>(std::floor((P[i * 3 + 1] - origin[1]) / sampleDl));
    const int64_t iz = static_cast<int64_t>(std::floor((P[i * 3 + 2] - origin[2]) / sampleDl));
    const int64_t key = ix + nx * iy + nx * ny * iz;

    auto it = slot_of_key.find(key);
    int64_t slot;
    if (it == slot_of_key.end()) {
      slot = static_cast<int64_t>(keys.size());
      slot_of_key.emplace(key, slot);
      keys.push_back(key);
      counts.push_back(0);
      xyz_sums.insert(xyz_sums.end(), 3, 0.0);
      if (F) feat_sums.insert(feat_sums.end(), F, 0.0);
      if (L) votes.insert(votes.end(), L, std::unordered_map<int32_t, int32_t>());
    } else {
      slot = it->second;
    }
    counts[slot] += 1;
    for (int d = 0; d < 3; ++d) xyz_sums[slot * 3 + d] += P[i * 3 + d];
    for (npy_intp d = 0; d < F; ++d) feat_sums[slot * F + d] += FV[i * F + d];
    for (npy_intp d = 0; d < L; ++d) votes[slot * L + d][CV[i * L + d]] += 1;
  }

  // Deterministic output order: sort slots by voxel id.
  const int64_t V = static_cast<int64_t>(keys.size());
  std::vector<int64_t> order(V);
  for (int64_t s = 0; s < V; ++s) order[s] = s;
  std::sort(order.begin(), order.end(),
            [&](int64_t a, int64_t b) { return keys[a] < keys[b]; });

  npy_intp pdims[2] = {V, 3};
  PyArrayObject* out_points =
      reinterpret_cast<PyArrayObject*>(PyArray_SimpleNew(2, pdims, NPY_FLOAT32));
  float* OP = static_cast<float*>(PyArray_DATA(out_points));

  PyArrayObject* out_features = nullptr;
  float* OF = nullptr;
  if (F) {
    npy_intp fdims[2] = {V, F};
    out_features =
        reinterpret_cast<PyArrayObject*>(PyArray_SimpleNew(2, fdims, NPY_FLOAT32));
    OF = static_cast<float*>(PyArray_DATA(out_features));
  }
  PyArrayObject* out_classes = nullptr;
  int32_t* OC = nullptr;
  if (L) {
    if (classes_1d) {
      npy_intp cdims[1] = {V};
      out_classes =
          reinterpret_cast<PyArrayObject*>(PyArray_SimpleNew(1, cdims, NPY_INT32));
    } else {
      npy_intp cdims[2] = {V, L};
      out_classes =
          reinterpret_cast<PyArrayObject*>(PyArray_SimpleNew(2, cdims, NPY_INT32));
    }
    OC = static_cast<int32_t*>(PyArray_DATA(out_classes));
  }

  for (int64_t o = 0; o < V; ++o) {
    const int64_t s = order[o];
    const double inv = 1.0 / static_cast<double>(counts[s]);
    for (int d = 0; d < 3; ++d)
      OP[o * 3 + d] = static_cast<float>(xyz_sums[s * 3 + d] * inv);
    for (npy_intp d = 0; d < F; ++d)
      OF[o * F + d] = static_cast<float>(feat_sums[s * F + d] * inv);
    for (npy_intp d = 0; d < L; ++d) {
      // majority vote; ties -> smallest label (deterministic)
      int32_t best_label = 0;
      int32_t best_count = -1;
      for (const auto& kv : votes[s * L + d]) {
        if (kv.second > best_count ||
            (kv.second == best_count && kv.first < best_label)) {
          best_label = kv.first;
          best_count = kv.second;
        }
      }
      OC[o * L + d] = best_label;
    }
  }

  Py_DECREF(points);
  Py_XDECREF(features);
  Py_XDECREF(classes);

  if (F && L) {
    return Py_BuildValue("(NNN)", out_points, out_features, out_classes);
  } else if (F) {
    return Py_BuildValue("(NN)", out_points, out_features);
  } else if (L) {
    return Py_BuildValue("(NN)", out_points, out_classes);
  }
  return reinterpret_cast<PyObject*>(out_points);
}

static PyMethodDef Methods[] = {
    {"compute", reinterpret_cast<PyCFunction>(compute),
     METH_VARARGS | METH_KEYWORDS,
     "Voxel-grid subsample a point cloud (barycenters + majority labels)."},
    {nullptr, nullptr, 0, nullptr},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT,
    "grid_subsampling_ext",
    "Voxel-grid subsampling (C++)",
    -1,
    Methods,
};

}  // namespace

PyMODINIT_FUNC PyInit_grid_subsampling_ext(void) {
  import_array();
  return PyModule_Create(&moduledef);
}
