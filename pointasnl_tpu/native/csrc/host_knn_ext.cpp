// Host-side exact kNN CPython extension (KD-tree + OpenMP).
//
// TPU-framework native equivalent of the reference's
// utils/nearest_neighbors library (nanoflann + Cython + OpenMP; see
// knn_.cxx:104-271 there for the exported behaviors). Re-designed rather
// than ported: a compact median-split KD-tree of our own (max-spread axis,
// nth_element median, leaf linear scan) with branch-and-bound k-NN queries
// and OpenMP parallelism across queries/batch. Distances are squared
// euclidean; results are sorted ascending with lower-index tie-breaks,
// matching the on-device ops.knn_point contract.
//
// Python functions (mirroring the reference's Cython API):
//   knn(pts (N,D) f32, queries (M,D) f32, K, omp=False) -> (M,K) int64
//   knn_batch(pts (B,N,D), queries (B,M,D), K, omp=False) -> (B,M,K) int64
//   knn_batch_distance_pick(pts (B,N,D), nqueries, K, seed=0, omp=False)
//     -> (queries (B,nqueries,D) f32, indices (B,nqueries,K) int64)
//     Coverage-aware sampling (knn_.cxx:138-271 semantics): repeatedly pick
//     a random point among those with minimal usage count, take its K
//     nearest, bump their counters, +100 on the pick itself.

#define PY_SSIZE_T_CLEAN
#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <Python.h>
#include <numpy/arrayobject.h>

#ifdef _OPENMP
#include <omp.h>
#endif

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <random>
#include <vector>

namespace {

struct KDTree {
  int dim;
  int leaf_size;
  const float* pts;  // (N, dim), not owned
  int64_t n;
  std::vector<int32_t> perm;  // point ids, partitioned per node

  struct Node {
    int32_t lo, hi;      // range in perm
    int32_t left, right; // children (-1 for leaf)
    int16_t axis;
    float split;
  };
  std::vector<Node> nodes;

  void build(const float* p, int64_t n_, int dim_, int leaf) {
    pts = p;
    n = n_;
    dim = dim_;
    leaf_size = leaf;
    perm.resize(n);
    for (int64_t i = 0; i < n; ++i) perm[i] = static_cast<int32_t>(i);
    nodes.clear();
    nodes.reserve(2 * n / leaf + 4);
    build_node(0, static_cast<int32_t>(n));
  }

  int32_t build_node(int32_t lo, int32_t hi) {
    int32_t id = static_cast<int32_t>(nodes.size());
    nodes.push_back({lo, hi, -1, -1, -1, 0.f});
    if (hi - lo <= leaf_size) return id;
    // split along the max-spread axis at the median
    float mn[8], mx[8];
    for (int d = 0; d < dim; ++d) { mn[d] = 1e38f; mx[d] = -1e38f; }
    for (int32_t i = lo; i < hi; ++i) {
      const float* q = pts + static_cast<int64_t>(perm[i]) * dim;
      for (int d = 0; d < dim; ++d) {
        mn[d] = std::min(mn[d], q[d]);
        mx[d] = std::max(mx[d], q[d]);
      }
    }
    int axis = 0;
    for (int d = 1; d < dim; ++d)
      if (mx[d] - mn[d] > mx[axis] - mn[axis]) axis = d;
    if (mx[axis] - mn[axis] <= 0.f) return id;  // degenerate: keep as leaf
    int32_t mid = lo + (hi - lo) / 2;
    std::nth_element(
        perm.begin() + lo, perm.begin() + mid, perm.begin() + hi,
        [&](int32_t a, int32_t b) {
          return pts[static_cast<int64_t>(a) * dim + axis] <
                 pts[static_cast<int64_t>(b) * dim + axis];
        });
    float split = pts[static_cast<int64_t>(perm[mid]) * dim + axis];
    nodes[id].axis = static_cast<int16_t>(axis);
    nodes[id].split = split;
    int32_t l = build_node(lo, mid);
    int32_t r = build_node(mid, hi);
    nodes[id].left = l;
    nodes[id].right = r;
    return id;
  }

  // bounded max-heap of (dist2, idx), worst at heap[0]
  struct Best {
    float d2;
    int32_t idx;
    bool operator<(const Best& o) const {
      // ties break toward the LOWER index, matching the on-device
      // ops.knn_point contract (lax.top_k positional stability)
      return d2 < o.d2 || (d2 == o.d2 && idx < o.idx);
    }
  };

  void query(const float* q, int k, Best* heap, int& count) const {
    count = 0;
    search(0, q, k, heap, count);
    std::sort_heap(heap, heap + count);  // ascending (lower idx on ties)
  }

  void search(int32_t node_id, const float* q, int k, Best* heap,
              int& count) const {
    const Node& nd = nodes[node_id];
    if (nd.left < 0) {
      for (int32_t i = nd.lo; i < nd.hi; ++i) {
        int32_t pid = perm[i];
        const float* p = pts + static_cast<int64_t>(pid) * dim;
        float d2 = 0.f;
        for (int d = 0; d < dim; ++d) {
          float t = q[d] - p[d];
          d2 += t * t;
        }
        Best cand{d2, pid};
        if (count < k) {
          heap[count++] = cand;
          std::push_heap(heap, heap + count);
        } else if (cand < heap[0]) {
          std::pop_heap(heap, heap + k);
          heap[k - 1] = cand;
          std::push_heap(heap, heap + k);
        }
      }
      return;
    }
    float delta = q[nd.axis] - nd.split;
    int32_t near = delta < 0.f ? nd.left : nd.right;
    int32_t far = delta < 0.f ? nd.right : nd.left;
    search(near, q, k, heap, count);
    if (count < k || delta * delta <= heap[0].d2) {
      search(far, q, k, heap, count);
    }
  }
};

// k_query: neighbors searched (<= N); k_out: the output row stride (the
// caller's K) — extra slots repeat the farthest valid neighbor, like the
// device path's degenerate-K padding.
void run_queries(const KDTree& tree, const float* queries, int64_t m, int dim,
                 int k_query, int k_out, int64_t* out, bool omp) {
#ifdef _OPENMP
#pragma omp parallel for schedule(static) if (omp)
#endif
  for (int64_t i = 0; i < m; ++i) {
    std::vector<KDTree::Best> heap(k_query);
    int count = 0;
    tree.query(queries + i * dim, k_query, heap.data(), count);
    for (int j = 0; j < k_out; ++j)
      out[i * k_out + j] =
          j < count ? heap[j].idx : (count ? heap[count - 1].idx : 0);
  }
}

PyArrayObject* as_f32(PyObject* obj, int ndim, const char* name) {
  PyArrayObject* arr = reinterpret_cast<PyArrayObject*>(
      PyArray_FROM_OTF(obj, NPY_FLOAT32, NPY_ARRAY_IN_ARRAY));
  if (!arr) return nullptr;
  if (PyArray_NDIM(arr) != ndim) {
    Py_DECREF(arr);
    PyErr_Format(PyExc_ValueError, "%s must be %d-dimensional", name, ndim);
    return nullptr;
  }
  return arr;
}

static PyObject* py_knn(PyObject*, PyObject* args, PyObject* kwargs) {
  static const char* kwlist[] = {"pts", "queries", "K", "omp", nullptr};
  PyObject *pts_obj, *q_obj;
  int k;
  int omp = 0;
  if (!PyArg_ParseTupleAndKeywords(args, kwargs, "OOi|p",
                                   const_cast<char**>(kwlist), &pts_obj,
                                   &q_obj, &k, &omp))
    return nullptr;
  PyArrayObject* pts = as_f32(pts_obj, 2, "pts");
  if (!pts) return nullptr;
  PyArrayObject* queries = as_f32(q_obj, 2, "queries");
  if (!queries) {
    Py_DECREF(pts);
    return nullptr;
  }
  int64_t n = PyArray_DIM(pts, 0);
  int dim = static_cast<int>(PyArray_DIM(pts, 1));
  int64_t m = PyArray_DIM(queries, 0);
  if (dim > 8 || dim != PyArray_DIM(queries, 1) || n == 0 || k <= 0) {
    Py_DECREF(pts);
    Py_DECREF(queries);
    PyErr_SetString(PyExc_ValueError, "bad shapes (dim<=8, N>0, K>0 required)");
    return nullptr;
  }
  npy_intp dims[2] = {m, k};
  PyArrayObject* out =
      reinterpret_cast<PyArrayObject*>(PyArray_SimpleNew(2, dims, NPY_INT64));
  if (!out) {
    Py_DECREF(pts);
    Py_DECREF(queries);
    return nullptr;
  }
  {
    KDTree tree;
    tree.build(static_cast<const float*>(PyArray_DATA(pts)), n, dim, 16);
    Py_BEGIN_ALLOW_THREADS
    run_queries(tree, static_cast<const float*>(PyArray_DATA(queries)), m, dim,
                static_cast<int>(std::min<int64_t>(k, n)), k,
                static_cast<int64_t*>(PyArray_DATA(out)), omp != 0);
    Py_END_ALLOW_THREADS
  }
  Py_DECREF(pts);
  Py_DECREF(queries);
  return reinterpret_cast<PyObject*>(out);
}

static PyObject* py_knn_batch(PyObject*, PyObject* args, PyObject* kwargs) {
  static const char* kwlist[] = {"pts", "queries", "K", "omp", nullptr};
  PyObject *pts_obj, *q_obj;
  int k;
  int omp = 0;
  if (!PyArg_ParseTupleAndKeywords(args, kwargs, "OOi|p",
                                   const_cast<char**>(kwlist), &pts_obj,
                                   &q_obj, &k, &omp))
    return nullptr;
  PyArrayObject* pts = as_f32(pts_obj, 3, "pts");
  if (!pts) return nullptr;
  PyArrayObject* queries = as_f32(q_obj, 3, "queries");
  if (!queries) {
    Py_DECREF(pts);
    return nullptr;
  }
  int64_t b = PyArray_DIM(pts, 0);
  int64_t n = PyArray_DIM(pts, 1);
  int dim = static_cast<int>(PyArray_DIM(pts, 2));
  int64_t m = PyArray_DIM(queries, 1);
  if (dim > 8 || b != PyArray_DIM(queries, 0) ||
      dim != PyArray_DIM(queries, 2) || n == 0 || k <= 0) {
    Py_DECREF(pts);
    Py_DECREF(queries);
    PyErr_SetString(PyExc_ValueError, "bad shapes");
    return nullptr;
  }
  npy_intp dims[3] = {b, m, k};
  PyArrayObject* out =
      reinterpret_cast<PyArrayObject*>(PyArray_SimpleNew(3, dims, NPY_INT64));
  if (!out) {
    Py_DECREF(pts);
    Py_DECREF(queries);
    return nullptr;
  }
  const float* pts_d = static_cast<const float*>(PyArray_DATA(pts));
  const float* q_d = static_cast<const float*>(PyArray_DATA(queries));
  int64_t* out_d = static_cast<int64_t*>(PyArray_DATA(out));
  int keff = static_cast<int>(std::min<int64_t>(k, n));
  Py_BEGIN_ALLOW_THREADS
  for (int64_t bi = 0; bi < b; ++bi) {
    KDTree tree;
    tree.build(pts_d + bi * n * dim, n, dim, 16);
    run_queries(tree, q_d + bi * m * dim, m, dim, keff, k, out_d + bi * m * k,
                omp != 0);
  }
  Py_END_ALLOW_THREADS
  Py_DECREF(pts);
  Py_DECREF(queries);
  return reinterpret_cast<PyObject*>(out);
}

static PyObject* py_knn_batch_distance_pick(PyObject*, PyObject* args,
                                            PyObject* kwargs) {
  static const char* kwlist[] = {"pts", "nqueries", "K", "seed", "omp",
                                 nullptr};
  PyObject* pts_obj;
  int nqueries, k;
  unsigned long seed = 0;
  int omp = 0;
  if (!PyArg_ParseTupleAndKeywords(args, kwargs, "Oii|kp",
                                   const_cast<char**>(kwlist), &pts_obj,
                                   &nqueries, &k, &seed, &omp))
    return nullptr;
  PyArrayObject* pts = as_f32(pts_obj, 3, "pts");
  if (!pts) return nullptr;
  int64_t b = PyArray_DIM(pts, 0);
  int64_t n = PyArray_DIM(pts, 1);
  int dim = static_cast<int>(PyArray_DIM(pts, 2));
  if (dim > 8 || n == 0 || k <= 0 || nqueries <= 0) {
    Py_DECREF(pts);
    PyErr_SetString(PyExc_ValueError, "bad shapes");
    return nullptr;
  }
  npy_intp qdims[3] = {b, nqueries, dim};
  npy_intp idims[3] = {b, nqueries, k};
  PyArrayObject* out_q =
      reinterpret_cast<PyArrayObject*>(PyArray_SimpleNew(3, qdims, NPY_FLOAT32));
  PyArrayObject* out_i =
      reinterpret_cast<PyArrayObject*>(PyArray_SimpleNew(3, idims, NPY_INT64));
  if (!out_q || !out_i) {
    Py_XDECREF(out_q);
    Py_XDECREF(out_i);
    Py_DECREF(pts);
    return nullptr;
  }
  const float* pts_d = static_cast<const float*>(PyArray_DATA(pts));
  float* q_d = static_cast<float*>(PyArray_DATA(out_q));
  int64_t* i_d = static_cast<int64_t*>(PyArray_DATA(out_i));
  int keff = static_cast<int>(std::min<int64_t>(k, n));
  Py_BEGIN_ALLOW_THREADS
  for (int64_t bi = 0; bi < b; ++bi) {
    KDTree tree;
    const float* cloud = pts_d + bi * n * dim;
    tree.build(cloud, n, dim, 16);
    std::mt19937 rng(static_cast<uint32_t>(seed + bi));
    std::vector<int64_t> used(n, 0);
    std::vector<KDTree::Best> heap(keff);
    for (int q = 0; q < nqueries; ++q) {
      int64_t mn = *std::min_element(used.begin(), used.end());
      // reservoir-pick a uniformly random minimal-usage point
      int64_t pick = -1, seen = 0;
      for (int64_t i = 0; i < n; ++i) {
        if (used[i] == mn) {
          ++seen;
          if (std::uniform_int_distribution<int64_t>(0, seen - 1)(rng) == 0)
            pick = i;
        }
      }
      const float* qp = cloud + pick * dim;
      int count = 0;
      tree.query(qp, keff, heap.data(), count);
      for (int j = 0; j < k; ++j) {
        int64_t idx = j < count ? heap[j].idx : heap[count - 1].idx;
        i_d[(bi * nqueries + q) * k + j] = idx;
        used[idx] += 1;
      }
      used[pick] += 100;
      for (int d = 0; d < dim; ++d)
        q_d[(bi * nqueries + q) * dim + d] = qp[d];
    }
  }
  Py_END_ALLOW_THREADS
  Py_DECREF(pts);
  return Py_BuildValue("(NN)", out_q, out_i);
}

static PyMethodDef methods[] = {
    {"knn", reinterpret_cast<PyCFunction>(py_knn),
     METH_VARARGS | METH_KEYWORDS, "exact kNN within one cloud"},
    {"knn_batch", reinterpret_cast<PyCFunction>(py_knn_batch),
     METH_VARARGS | METH_KEYWORDS, "batched exact kNN"},
    {"knn_batch_distance_pick",
     reinterpret_cast<PyCFunction>(py_knn_batch_distance_pick),
     METH_VARARGS | METH_KEYWORDS, "coverage-aware query sampling + kNN"},
    {nullptr, nullptr, 0, nullptr},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "host_knn_ext",
    "KD-tree kNN with OpenMP (native host-side search)", -1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit_host_knn_ext(void) {
  import_array();
  return PyModule_Create(&moduledef);
}
