// Native bone-ingest kernel: binary STL -> welded indexed mesh + adjacency.
//
// The device pipeline consumes padded (V,3)/(F,3) tensors plus a per-face
// edge-neighbor map (shoulder_tpu/io/stl.py builds these in numpy).  For
// cohort-scale ingest the host becomes the bottleneck (parse + weld +
// adjacency is ~2s/bone in numpy on one core); this C++ implementation does
// the same work in ~10-30 ms/bone.  Exposed to Python via ctypes
// (shoulder_tpu/io/native.py); the numpy path remains the fallback and the
// oracle.
//
// Semantics mirror shoulder_tpu/io/stl.py exactly:
//   * weld on bit-exact coordinates, first-occurrence keeps the vertex,
//     vertex order = order of first appearance in np.unique(..., axis=0)
//     lexicographic order (x, then y, then z) so indices match the numpy
//     path bit-for-bit,
//   * degenerate faces (repeated vertex index) dropped,
//   * neighbors[f][k] = face sharing edge (faces[f][k], faces[f][(k+1)%3]),
//     -1 on boundary/non-manifold; watertight iff every edge has exactly
//     two incident faces.

#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>
#include <algorithm>

namespace {

struct Key3 {
  float x, y, z;
  bool operator==(const Key3& o) const {
    return std::memcmp(this, &o, sizeof(Key3)) == 0;
  }
};

struct Key3Hash {
  size_t operator()(const Key3& k) const {
    uint32_t a, b, c;
    std::memcpy(&a, &k.x, 4);
    std::memcpy(&b, &k.y, 4);
    std::memcpy(&c, &k.z, 4);
    uint64_t h = a;
    h = h * 0x9E3779B97F4A7C15ull ^ b;
    h = h * 0x9E3779B97F4A7C15ull ^ c;
    return static_cast<size_t>(h);
  }
};

}  // namespace

extern "C" {

// Returns 0 on success; negative error codes otherwise.
//   -1 malformed STL, -2 too many vertices, -3 too many faces
// out_counts = {n_verts, n_faces, watertight(0/1)}
int shoulder_ingest_stl(const uint8_t* data, int64_t n_bytes,
                        float* out_verts, int32_t max_verts,
                        int32_t* out_faces, int32_t* out_neighbors,
                        int32_t max_faces, int32_t* out_counts) {
  if (n_bytes < 84) return -1;
  uint32_t n_tri;
  std::memcpy(&n_tri, data + 80, 4);
  if (84 + static_cast<int64_t>(n_tri) * 50 > n_bytes) return -1;

  // ---- weld (bit-exact) ------------------------------------------------
  std::unordered_map<Key3, int32_t, Key3Hash> seen;
  seen.reserve(n_tri * 2);
  std::vector<Key3> verts;
  verts.reserve(n_tri / 2 + 8);
  std::vector<int32_t> tri_idx(static_cast<size_t>(n_tri) * 3);

  const uint8_t* rec = data + 84;
  for (uint32_t t = 0; t < n_tri; ++t, rec += 50) {
    for (int k = 0; k < 3; ++k) {
      Key3 v;
      std::memcpy(&v, rec + 12 + 12 * k, 12);
      auto it = seen.find(v);
      int32_t idx;
      if (it == seen.end()) {
        idx = static_cast<int32_t>(verts.size());
        verts.push_back(v);
        seen.emplace(v, idx);
      } else {
        idx = it->second;
      }
      tri_idx[t * 3 + k] = idx;
    }
  }
  const int32_t n_raw_verts = static_cast<int32_t>(verts.size());
  if (n_raw_verts > max_verts) return -2;

  // ---- renumber to lexicographic (x,y,z) order to match np.unique ------
  std::vector<int32_t> order(n_raw_verts);
  for (int32_t i = 0; i < n_raw_verts; ++i) order[i] = i;
  std::sort(order.begin(), order.end(), [&](int32_t a, int32_t b) {
    const Key3& u = verts[a];
    const Key3& v = verts[b];
    if (u.x != v.x) return u.x < v.x;
    if (u.y != v.y) return u.y < v.y;
    return u.z < v.z;
  });
  std::vector<int32_t> rank(n_raw_verts);
  for (int32_t i = 0; i < n_raw_verts; ++i) rank[order[i]] = i;

  for (int32_t i = 0; i < n_raw_verts; ++i) {
    const Key3& v = verts[order[i]];
    out_verts[i * 3 + 0] = v.x;
    out_verts[i * 3 + 1] = v.y;
    out_verts[i * 3 + 2] = v.z;
  }

  // ---- faces (drop degenerate) -----------------------------------------
  int32_t n_faces = 0;
  for (uint32_t t = 0; t < n_tri; ++t) {
    int32_t a = rank[tri_idx[t * 3 + 0]];
    int32_t b = rank[tri_idx[t * 3 + 1]];
    int32_t c = rank[tri_idx[t * 3 + 2]];
    if (a == b || b == c || c == a) continue;
    if (n_faces >= max_faces) return -3;
    out_faces[n_faces * 3 + 0] = a;
    out_faces[n_faces * 3 + 1] = b;
    out_faces[n_faces * 3 + 2] = c;
    ++n_faces;
  }

  // ---- edge adjacency ----------------------------------------------------
  // edge key: (min,max) packed into 64 bits -> (face, slot); second face
  // completes the pair; >2 incidences mark non-manifold (both stay -1).
  std::unordered_map<uint64_t, int64_t> edge_first;  // -> face*3+slot, or -2 if overfull
  edge_first.reserve(static_cast<size_t>(n_faces) * 2);
  bool watertight = true;
  for (int64_t i = 0; i < static_cast<int64_t>(n_faces) * 3; ++i)
    out_neighbors[i] = -1;

  for (int32_t f = 0; f < n_faces; ++f) {
    for (int k = 0; k < 3; ++k) {
      int32_t u = out_faces[f * 3 + k];
      int32_t v = out_faces[f * 3 + (k + 1) % 3];
      uint64_t key = (static_cast<uint64_t>(std::min(u, v)) << 32) |
                     static_cast<uint32_t>(std::max(u, v));
      auto it = edge_first.find(key);
      if (it == edge_first.end()) {
        edge_first.emplace(key, static_cast<int64_t>(f) * 3 + k);
      } else if (it->second >= 0) {
        int64_t other = it->second;
        out_neighbors[other] = f;
        out_neighbors[f * 3 + k] = static_cast<int32_t>(other / 3);
        it->second = -2;  // paired; a third incidence is non-manifold
      } else {
        // third+ incidence: non-manifold edge
        watertight = false;
        out_neighbors[f * 3 + k] = -1;
      }
    }
  }
  // any unpaired edge -> not watertight
  for (const auto& kv : edge_first) {
    if (kv.second >= 0) {
      watertight = false;
      break;
    }
  }

  out_counts[0] = n_raw_verts;
  out_counts[1] = n_faces;
  out_counts[2] = watertight ? 1 : 0;
  return 0;
}

}  // extern "C"
