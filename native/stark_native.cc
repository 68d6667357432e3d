// stark_native — C++ runtime kernels for the host side of stark_tpu.
//
// The reference implements its runtime natively (C++20): vtkio's legacy VTK
// writer (stark/extern/vtkio/src/VTKFile.h), mesh topology utilities
// (stark/src/utils/mesh_utils.h:19-66), and the RCM connectivity reordering
// (stark/extern/symx/src/solver/mesh_ordering.h:5-33). This TU provides the
// TPU build's equivalents behind a C ABI consumed through ctypes
// (stark_tpu/native.py); every entry point has a pure-numpy fallback so the
// framework works without a compiler, but large scenes build and write
// frames at native speed with it.
//
// Build: make -C native  (g++ -O3 -march=native -shared -fPIC)

#include <algorithm>
#include <array>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

// big-endian conversion (legacy VTK binary payloads are big-endian,
// vtkio src/byte_order handling)
inline uint32_t bswap32(uint32_t v) { return __builtin_bswap32(v); }
inline uint64_t bswap64(uint64_t v) { return __builtin_bswap64(v); }

inline void write_be_f32(std::vector<unsigned char>& buf, float x) {
  uint32_t u;
  std::memcpy(&u, &x, 4);
  u = bswap32(u);
  const unsigned char* p = reinterpret_cast<const unsigned char*>(&u);
  buf.insert(buf.end(), p, p + 4);
}

inline void write_be_f64(std::vector<unsigned char>& buf, double x) {
  uint64_t u;
  std::memcpy(&u, &x, 8);
  u = bswap64(u);
  const unsigned char* p = reinterpret_cast<const unsigned char*>(&u);
  buf.insert(buf.end(), p, p + 8);
}

inline void write_be_i32(std::vector<unsigned char>& buf, int32_t x) {
  uint32_t u;
  std::memcpy(&u, &x, 4);
  u = bswap32(u);
  const unsigned char* p = reinterpret_cast<const unsigned char*>(&u);
  buf.insert(buf.end(), p, p + 4);
}

struct PairHash {
  size_t operator()(const std::pair<int64_t, int64_t>& p) const {
    return std::hash<int64_t>()(p.first * 0x9E3779B97F4A7C15LL ^ p.second);
  }
};

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// Legacy VTK binary writer (UNSTRUCTURED_GRID, one cell family per file —
// matches the reference's per-group frame files, DeformablesMeshOutput.cpp).
// cell_type: 1 vertex, 3 line, 5 triangle, 10 tetra.
// Returns 0 on success, nonzero errno-style code on failure.
// ---------------------------------------------------------------------------
int sn_write_vtk(const char* path, const double* verts, int64_t n_verts,
                 const int64_t* conn, int64_t n_cells, int32_t arity,
                 int32_t cell_type) {
  std::FILE* f = std::fopen(path, "wb");
  if (!f) return 1;
  std::fprintf(f,
               "# vtk DataFile Version 3.0\nstark_tpu frame\nBINARY\n"
               "DATASET UNSTRUCTURED_GRID\nPOINTS %lld double\n",
               static_cast<long long>(n_verts));
  std::vector<unsigned char> buf;
  buf.reserve(static_cast<size_t>(n_verts) * 24);
  for (int64_t i = 0; i < 3 * n_verts; ++i) write_be_f64(buf, verts[i]);
  std::fwrite(buf.data(), 1, buf.size(), f);

  std::fprintf(f, "\nCELLS %lld %lld\n", static_cast<long long>(n_cells),
               static_cast<long long>(n_cells * (arity + 1)));
  buf.clear();
  buf.reserve(static_cast<size_t>(n_cells) * (arity + 1) * 4);
  for (int64_t c = 0; c < n_cells; ++c) {
    write_be_i32(buf, arity);
    for (int32_t k = 0; k < arity; ++k)
      write_be_i32(buf, static_cast<int32_t>(conn[c * arity + k]));
  }
  std::fwrite(buf.data(), 1, buf.size(), f);

  std::fprintf(f, "\nCELL_TYPES %lld\n", static_cast<long long>(n_cells));
  buf.clear();
  buf.reserve(static_cast<size_t>(n_cells) * 4);
  for (int64_t c = 0; c < n_cells; ++c) write_be_i32(buf, cell_type);
  std::fwrite(buf.data(), 1, buf.size(), f);
  std::fputc('\n', f);
  int err = std::ferror(f);
  std::fclose(f);
  return err ? 2 : 0;
}

// ---------------------------------------------------------------------------
// Unique undirected edges of a simplex mesh (mesh_utils.h find_edges).
// simplices: (n, k) int64. out_edges capacity cap pairs. Returns the number
// of unique edges (may exceed cap — caller re-calls with a larger buffer).
// ---------------------------------------------------------------------------
int64_t sn_find_edges(const int64_t* simplices, int64_t n, int32_t k,
                      int64_t* out_edges, int64_t cap) {
  std::unordered_map<std::pair<int64_t, int64_t>, int, PairHash> seen;
  seen.reserve(static_cast<size_t>(n) * k);
  int64_t count = 0;
  for (int64_t s = 0; s < n; ++s) {
    for (int32_t i = 0; i < k; ++i) {
      for (int32_t j = i + 1; j < k; ++j) {
        int64_t a = simplices[s * k + i];
        int64_t b = simplices[s * k + j];
        if (a > b) std::swap(a, b);
        auto ins = seen.emplace(std::make_pair(a, b), 1);
        if (ins.second) {
          if (count < cap) {
            out_edges[2 * count] = a;
            out_edges[2 * count + 1] = b;
          }
          ++count;
        }
      }
    }
  }
  return count;
}

// ---------------------------------------------------------------------------
// Internal edges of a triangle mesh with wing vertices, ordered
// [e0, e1, wing_a, wing_b] (mesh_utils.h find_internal_angles — the discrete
// shells bending stencil). Returns count (caller sizes by n_tris*3/2).
// ---------------------------------------------------------------------------
int64_t sn_find_internal_edges(const int64_t* tris, int64_t n,
                               int64_t* out, int64_t cap) {
  std::unordered_map<std::pair<int64_t, int64_t>, std::pair<int64_t, int64_t>,
                     PairHash>
      first;  // edge -> (opposite vertex, tri id)
  first.reserve(static_cast<size_t>(n) * 3);
  int64_t count = 0;
  for (int64_t t = 0; t < n; ++t) {
    const int64_t v[3] = {tris[3 * t], tris[3 * t + 1], tris[3 * t + 2]};
    for (int32_t i = 0; i < 3; ++i) {
      int64_t a = v[i], b = v[(i + 1) % 3], w = v[(i + 2) % 3];
      int64_t lo = std::min(a, b), hi = std::max(a, b);
      auto it = first.find({lo, hi});
      if (it == first.end()) {
        first.emplace(std::make_pair(lo, hi), std::make_pair(w, t));
      } else {
        if (count < cap) {
          out[4 * count] = lo;
          out[4 * count + 1] = hi;
          out[4 * count + 2] = it->second.first;
          out[4 * count + 3] = w;
        }
        ++count;
      }
    }
  }
  return count;
}

// ---------------------------------------------------------------------------
// Boundary triangles of a tet mesh, outward-ordered by the opposite-vertex
// rule (mesh_utils find_surface / tet-surface extraction used by volume
// presets, DeformablesPresets.cpp:70-73). Returns count of surface faces.
// ---------------------------------------------------------------------------
int64_t sn_find_surface(const int64_t* tets, int64_t n, int64_t* out_tris,
                        int64_t cap) {
  struct TriKey {
    int64_t a, b, c;
    bool operator==(const TriKey& o) const {
      return a == o.a && b == o.b && c == o.c;
    }
  };
  struct TriHash {
    size_t operator()(const TriKey& k) const {
      size_t h = std::hash<int64_t>()(k.a);
      h = h * 0x9E3779B97F4A7C15ULL + std::hash<int64_t>()(k.b);
      h = h * 0x9E3779B97F4A7C15ULL + std::hash<int64_t>()(k.c);
      return h;
    }
  };
  // face (sorted) -> (count, oriented triple)
  std::unordered_map<TriKey, std::pair<int, std::array<int64_t, 3>>, TriHash>
      faces;
  faces.reserve(static_cast<size_t>(n) * 4);
  static const int F[4][3] = {{1, 2, 3}, {0, 3, 2}, {0, 1, 3}, {0, 2, 1}};
  for (int64_t t = 0; t < n; ++t) {
    const int64_t v[4] = {tets[4 * t], tets[4 * t + 1], tets[4 * t + 2],
                          tets[4 * t + 3]};
    for (int f = 0; f < 4; ++f) {
      std::array<int64_t, 3> tri = {v[F[f][0]], v[F[f][1]], v[F[f][2]]};
      std::array<int64_t, 3> s = tri;
      std::sort(s.begin(), s.end());
      TriKey key{s[0], s[1], s[2]};
      auto it = faces.find(key);
      if (it == faces.end())
        faces.emplace(key, std::make_pair(1, tri));
      else
        it->second.first++;
    }
  }
  int64_t count = 0;
  for (auto& kv : faces) {
    if (kv.second.first == 1) {
      if (count < cap) {
        out_tris[3 * count] = kv.second.second[0];
        out_tris[3 * count + 1] = kv.second.second[1];
        out_tris[3 * count + 2] = kv.second.second[2];
      }
      ++count;
    }
  }
  return count;
}

// ---------------------------------------------------------------------------
// Reverse Cuthill-McKee node ordering from an edge list (symx
// mesh_ordering.h:5-33 reorder_connectivity_RCM): breadth-first from the
// minimum-degree node, neighbors visited in increasing-degree order, result
// reversed. out_perm[new_index] = old_index. Handles disconnected components.
// ---------------------------------------------------------------------------
void sn_rcm_order(const int64_t* edges, int64_t n_edges, int64_t n_nodes,
                  int64_t* out_perm) {
  std::vector<std::vector<int64_t>> adj(n_nodes);
  for (int64_t e = 0; e < n_edges; ++e) {
    int64_t a = edges[2 * e], b = edges[2 * e + 1];
    if (a == b) continue;
    adj[a].push_back(b);
    adj[b].push_back(a);
  }
  std::vector<int64_t> degree(n_nodes);
  for (int64_t i = 0; i < n_nodes; ++i) degree[i] = adj[i].size();
  std::vector<char> visited(n_nodes, 0);
  std::vector<int64_t> order;
  order.reserve(n_nodes);
  // nodes sorted by degree: seeds for each component
  std::vector<int64_t> by_degree(n_nodes);
  for (int64_t i = 0; i < n_nodes; ++i) by_degree[i] = i;
  std::sort(by_degree.begin(), by_degree.end(),
            [&](int64_t a, int64_t b) { return degree[a] < degree[b]; });
  size_t seed_pos = 0;
  while (order.size() < static_cast<size_t>(n_nodes)) {
    while (seed_pos < by_degree.size() && visited[by_degree[seed_pos]])
      ++seed_pos;
    if (seed_pos >= by_degree.size()) break;
    int64_t seed = by_degree[seed_pos];
    visited[seed] = 1;
    size_t head = order.size();
    order.push_back(seed);
    while (head < order.size()) {
      int64_t u = order[head++];
      std::vector<int64_t> nbrs;
      for (int64_t v : adj[u])
        if (!visited[v]) nbrs.push_back(v);
      std::sort(nbrs.begin(), nbrs.end(), [&](int64_t a, int64_t b) {
        return degree[a] < degree[b];
      });
      for (int64_t v : nbrs) {
        if (!visited[v]) {
          visited[v] = 1;
          order.push_back(v);
        }
      }
    }
  }
  std::reverse(order.begin(), order.end());
  for (int64_t i = 0; i < n_nodes; ++i) out_perm[i] = order[i];
}

}  // extern "C"
