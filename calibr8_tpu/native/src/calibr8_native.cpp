// Native (C++) setup/graph kernels for calibr8_tpu.
//
// The TPU executes all numerical compute (jax/XLA/Pallas); this library
// covers the CPU-side mesh/graph machinery that the reference implements
// natively on top of PUMI/apf (reference: source/calibr8/src/disc.cpp
// connectivity/adjacency construction, mesh refinement via MeshAdapt) —
// incidence tables, edge graphs, and uniform tet/tri refinement — where
// interpreted per-element loops would dominate problem setup at large
// mesh sizes.
//
// Interface: plain C ABI consumed from Python via ctypes
// (calibr8_tpu/native/__init__.py); all buffers are caller-allocated
// numpy arrays.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------
// node incidence (the scatter-add gather table: fem/disc.py:node_inc)
// ---------------------------------------------------------------------

int32_t c8_max_degree(const int32_t* ids, int64_t n, int32_t n_nodes) {
  std::vector<int32_t> cnt(n_nodes, 0);
  for (int64_t i = 0; i < n; ++i) cnt[ids[i]]++;
  int32_t mx = 0;
  for (int32_t c : cnt) mx = std::max(mx, c);
  return mx;
}

// inc must be prefilled with the pad value (= n); slots are appended in
// ascending slot order per node, matching the numpy argsort(stable)
// construction exactly.
void c8_node_incidence(const int32_t* ids, int64_t n, int32_t n_nodes,
                       int32_t K, int32_t* inc) {
  std::vector<int32_t> ptr(n_nodes, 0);
  for (int64_t i = 0; i < n; ++i) {
    const int32_t nid = ids[i];
    inc[(int64_t)nid * K + ptr[nid]++] = (int32_t)i;
  }
}

// ---------------------------------------------------------------------
// unique edge graph (mesh/refine.py edge collection)
// ---------------------------------------------------------------------

// pairs: m x 2 (each row sorted ascending).  uniq: m x 2 capacity,
// inv: m.  Returns the number of unique edges.  Unique edges come out
// in lexicographic order, matching np.unique(axis=0).
int64_t c8_unique_edges(const int64_t* pairs, int64_t m, int64_t* uniq,
                        int64_t* inv) {
  std::vector<int64_t> order(m);
  std::iota(order.begin(), order.end(), 0);
  std::sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
    if (pairs[2 * a] != pairs[2 * b]) return pairs[2 * a] < pairs[2 * b];
    return pairs[2 * a + 1] < pairs[2 * b + 1];
  });
  int64_t n_uniq = 0;
  int64_t pa = -1, pb = -1;
  for (int64_t k = 0; k < m; ++k) {
    const int64_t i = order[k];
    const int64_t a = pairs[2 * i], b = pairs[2 * i + 1];
    if (a != pa || b != pb) {
      uniq[2 * n_uniq] = a;
      uniq[2 * n_uniq + 1] = b;
      ++n_uniq;
      pa = a;
      pb = b;
    }
    inv[i] = n_uniq - 1;
  }
  return n_uniq;
}

// ---------------------------------------------------------------------
// uniform simplex refinement children (mesh/refine.py:uniform_refine)
// ---------------------------------------------------------------------

static inline double det2(const double* p0, const double* p1,
                          const double* p2) {
  const double a0 = p1[0] - p0[0], a1 = p1[1] - p0[1];
  const double b0 = p2[0] - p0[0], b1 = p2[1] - p0[1];
  return a0 * b1 - a1 * b0;
}

static inline double det3(const double* p0, const double* p1,
                          const double* p2, const double* p3) {
  double a[3], b[3], c[3];
  for (int k = 0; k < 3; ++k) {
    a[k] = p1[k] - p0[k];
    b[k] = p2[k] - p0[k];
    c[k] = p3[k] - p0[k];
  }
  return a[0] * (b[1] * c[2] - b[2] * c[1]) -
         a[1] * (b[0] * c[2] - b[2] * c[0]) +
         a[2] * (b[0] * c[1] - b[1] * c[0]);
}

// conn: E x npe; mids: n_pairs x E midpoint NODE ids (already offset by
// n_nodes); coords: (n_nodes + n_edges) x dim row-major.  Writes
// fine_conn (E*nchild x npe) and parent (E*nchild), children oriented
// positively (odd permutation fix like the Python path).
// Pair order matches refine.py: (0,1),(0,2),(0,3),(1,2),(1,3),(2,3) in
// 3D and (0,1),(0,2),(1,2) in 2D.
void c8_refine_children(const int64_t* conn, int64_t E, int32_t dim,
                        const int64_t* mids, const double* coords,
                        int64_t* fine_conn, int64_t* parent) {
  const int npe = dim + 1;
  const int nchild = (dim == 2) ? 4 : 8;
  for (int64_t e = 0; e < E; ++e) {
    const int64_t* v = conn + e * npe;
    int64_t ch[8][4];
    if (dim == 2) {
      const int64_t m01 = mids[0 * E + e];  // pair (0,1)
      const int64_t m02 = mids[1 * E + e];  // pair (0,2)
      const int64_t m12 = mids[2 * E + e];  // pair (1,2)
      const int64_t c2[4][3] = {{v[0], m01, m02},
                                {v[1], m12, m01},
                                {v[2], m02, m12},
                                {m01, m12, m02}};
      for (int i = 0; i < 4; ++i)
        for (int j = 0; j < 3; ++j) ch[i][j] = c2[i][j];
    } else {
      const int64_t m01 = mids[0 * E + e];
      const int64_t m02 = mids[1 * E + e];
      const int64_t m03 = mids[2 * E + e];
      const int64_t m12 = mids[3 * E + e];
      const int64_t m13 = mids[4 * E + e];
      const int64_t m23 = mids[5 * E + e];
      const int64_t c3[8][4] = {{v[0], m01, m02, m03}, {v[1], m01, m12, m13},
                                {v[2], m02, m12, m23}, {v[3], m03, m13, m23},
                                {m01, m12, m02, m23},  {m01, m12, m23, m13},
                                {m01, m02, m03, m23},  {m01, m03, m13, m23}};
      for (int i = 0; i < 8; ++i)
        for (int j = 0; j < 4; ++j) ch[i][j] = c3[i][j];
    }
    for (int i = 0; i < nchild; ++i) {
      double det;
      if (dim == 2)
        det = det2(coords + 2 * ch[i][0], coords + 2 * ch[i][1],
                   coords + 2 * ch[i][2]);
      else
        det = det3(coords + 3 * ch[i][0], coords + 3 * ch[i][1],
                   coords + 3 * ch[i][2], coords + 3 * ch[i][3]);
      if (det < 0.0) std::swap(ch[i][1], ch[i][2]);
      int64_t* out = fine_conn + (e * nchild + i) * npe;
      for (int j = 0; j < npe; ++j) out[j] = ch[i][j];
      parent[e * nchild + i] = e;
    }
  }
}

}  // extern "C"
