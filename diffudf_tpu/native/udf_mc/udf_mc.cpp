// Native sign-voting for UDF marching cubes (MeshUDF-style extraction).
//
// The one inherently-sequential component of the framework: assign a pseudo
// sign (+1/-1) to every near-surface grid vertex so that the unsigned
// distance field becomes locally signable for marching cubes.  Semantics
// (see diffudf_tpu/extract/meshudf.py, which holds the scipy reference
// implementation this must agree with):
//
//   * vertices "participate" when their UDF is below a caller-provided bound
//     (only near-surface signs matter for the gated cells);
//   * along each grid edge (a, b) with unit direction u, the endpoint
//     direction vectors d(a), d(b) — which point TOWARD the surface — flag a
//     crossing when dot(d(a), u) > 0 > dot(d(b), u); the edge "relation" is
//     -1 (sign flips across the edge) for a crossing, +1 otherwise, and its
//     confidence is |dot(d(a),u) * dot(d(b),u)|;
//   * signs propagate over the maximum-confidence spanning forest of the
//     participating-vertex graph: Prim's algorithm per component, seeded at
//     the component's minimum-UDF vertex (the reference's priority BFS with
//     deferred low-confidence votes, _marching_cubes_lewiner_cy.pyx:
//     1584-1697, converges to exactly this: trust confident edges first).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libudf_mc.so udf_mc.cpp

#include <cstdint>
#include <queue>
#include <tuple>
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

// udf:   n0*n1*n2 floats (C order)
// dirs:  n0*n1*n2*3 floats, unit directions pointing toward the surface
// participate: n0*n1*n2 bytes (0/1)
// signs_out: n0*n1*n2 int8, receives +1 / -1 (non-participating stay +1)
void sign_voting(const float* udf, const float* dirs,
                 const uint8_t* participate, int32_t n0, int32_t n1,
                 int32_t n2, int8_t* signs_out) {
  const int64_t n = static_cast<int64_t>(n0) * n1 * n2;
  const int64_t stride0 = static_cast<int64_t>(n1) * n2;
  const int64_t stride1 = n2;
  const int64_t strides[3] = {stride0, stride1, 1};

  std::fill(signs_out, signs_out + n, static_cast<int8_t>(1));
  std::vector<uint8_t> visited(n, 0);

  // seeds ordered by ascending UDF among participating vertices
  std::vector<int32_t> order;
  order.reserve(n / 8);
  for (int64_t i = 0; i < n; ++i)
    if (participate[i]) order.push_back(static_cast<int32_t>(i));
  std::sort(order.begin(), order.end(),
            [&](int32_t a, int32_t b) { return udf[a] < udf[b]; });

  // coordinates from linear index
  auto coord = [&](int64_t idx, int32_t c[3]) {
    c[0] = static_cast<int32_t>(idx / stride0);
    c[1] = static_cast<int32_t>((idx / stride1) % n1);
    c[2] = static_cast<int32_t>(idx % n2);
  };
  const int32_t dims[3] = {n0, n1, n2};

  std::priority_queue<Edge> heap;

  // push all edges from vertex v to unvisited participating neighbours
  auto push_edges = [&](int32_t v) {
    int32_t c[3];
    coord(v, c);
    for (int axis = 0; axis < 3; ++axis) {
      for (int sgn = -1; sgn <= 1; sgn += 2) {
        const int32_t cc = c[axis] + sgn;
        if (cc < 0 || cc >= dims[axis]) continue;
        const int64_t nb = v + sgn * strides[axis];
        if (!participate[nb] || visited[nb]) continue;
        // edge direction u = from v toward nb along +/- axis
        const float pa = dirs[3 * static_cast<int64_t>(v) + axis] * sgn;
        const float pb = dirs[3 * nb + axis] * sgn;
        const bool crossing = (pa > 0.0f) && (pb < 0.0f);
        heap.push(Edge{std::fabs(pa * pb), v, static_cast<int32_t>(nb),
                       static_cast<int8_t>(crossing ? -1 : 1)});
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
