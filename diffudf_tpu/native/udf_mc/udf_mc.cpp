// Native sign propagation for UDF marching cubes (MeshUDF-style extraction).
//
// The one inherently-sequential component of the framework: assign a pseudo
// sign (+1/-1) to every near-surface grid vertex so the unsigned distance
// field becomes locally signable for marching cubes.
//
// Division of labour with the Python side (diffudf_tpu/extract/meshudf.py,
// which also holds the scipy implementation this must agree with):
//   * Python computes per-edge signed weights w = rel · confidence for the
//     three positive-axis edge families (robust value+direction relations);
//     sign(w) = +1 (same side) / −1 (surface crossing), |w| = confidence.
//   * This module runs Prim's maximum-confidence spanning-forest
//     propagation per connected component, seeded at each component's
//     minimum-UDF vertex — the deterministic core of the reference's
//     priority BFS with deferred low-confidence votes
//     (_marching_cubes_lewiner_cy.pyx:1584-1697).
//   * Python then applies vectorised majority relaxation on top.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libudf_mc.so udf_mc.cpp

#include <cstdint>
#include <queue>
#include <vector>
#include <algorithm>
#include <cmath>

namespace {

struct Edge {
  float conf;
  int32_t from;
  int32_t to;
  int8_t rel;  // +1 same side, -1 flip
  bool operator<(const Edge& o) const { return conf < o.conf; }  // max-heap
};

}  // namespace

extern "C" {

// udf:          n0*n1*n2 floats (C order)
// participate:  n0*n1*n2 bytes (0/1)
// wx:           (n0-1)*n1*n2 signed weights for +x edges
// wy:           n0*(n1-1)*n2 signed weights for +y edges
// wz:           n0*n1*(n2-1) signed weights for +z edges
// signs_out:    n0*n1*n2 int8, receives +1 / -1 (non-participating stay +1)
void sign_voting(const float* udf, const uint8_t* participate,
                 const float* wx, const float* wy, const float* wz,
                 int32_t n0, int32_t n1, int32_t n2, int8_t* signs_out) {
  const int64_t n = static_cast<int64_t>(n0) * n1 * n2;
  const int64_t stride0 = static_cast<int64_t>(n1) * n2;
  const int64_t stride1 = n2;
  const int64_t strides[3] = {stride0, stride1, 1};
  const int32_t dims[3] = {n0, n1, n2};

  std::fill(signs_out, signs_out + n, static_cast<int8_t>(1));
  std::vector<uint8_t> visited(n, 0);

  // seeds ordered by ascending UDF among participating vertices
  std::vector<int32_t> order;
  order.reserve(n / 8);
  for (int64_t i = 0; i < n; ++i)
    if (participate[i]) order.push_back(static_cast<int32_t>(i));
  std::sort(order.begin(), order.end(),
            [&](int32_t a, int32_t b) { return udf[a] < udf[b]; });

  auto coord = [&](int64_t idx, int32_t c[3]) {
    c[0] = static_cast<int32_t>(idx / stride0);
    c[1] = static_cast<int32_t>((idx / stride1) % n1);
    c[2] = static_cast<int32_t>(idx % n2);
  };

  // weight of the +axis edge starting at vertex with coords c
  auto edge_weight = [&](const int32_t c[3], int axis) -> float {
    // slab shapes: axis-0 edges laid out as (n0-1, n1, n2) etc.
    if (axis == 0) {
      return wx[(static_cast<int64_t>(c[0]) * n1 + c[1]) * n2 + c[2]];
    } else if (axis == 1) {
      return wy[(static_cast<int64_t>(c[0]) * (n1 - 1) + c[1]) * n2 + c[2]];
    }
    return wz[(static_cast<int64_t>(c[0]) * n1 + c[1]) * (n2 - 1) + c[2]];
  };

  std::priority_queue<Edge> heap;

  auto push_edges = [&](int32_t v) {
    int32_t c[3];
    coord(v, c);
    for (int axis = 0; axis < 3; ++axis) {
      for (int sgn = -1; sgn <= 1; sgn += 2) {
        const int32_t cc = c[axis] + sgn;
        if (cc < 0 || cc >= dims[axis]) continue;
        const int64_t nb = v + sgn * strides[axis];
        if (!participate[nb] || visited[nb]) continue;
        int32_t base[3] = {c[0], c[1], c[2]};
        if (sgn < 0) base[axis] -= 1;  // edge starts at the lower coord
        const float w = edge_weight(base, axis);
        heap.push(Edge{std::fabs(w), v, static_cast<int32_t>(nb),
                       static_cast<int8_t>(w < 0.0f ? -1 : 1)});
      }
    }
  };

  for (int32_t seed : order) {
    if (visited[seed]) continue;
    visited[seed] = 1;
    push_edges(seed);
    while (!heap.empty()) {
      Edge e = heap.top();
      heap.pop();
      if (visited[e.to]) continue;
      visited[e.to] = 1;
      signs_out[e.to] = static_cast<int8_t>(signs_out[e.from] * e.rel);
      push_edges(e.to);
    }
  }
}

}  // extern "C"
