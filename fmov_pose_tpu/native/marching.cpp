// Isosurface extraction (marching tetrahedra) — native replacement for the
// PyMCubes dependency of the reference (`/root/reference/models/renderer.py:43`).
//
// The SDF grid is evaluated on-device (JAX) and handed to this host-side
// extractor.  Each cube of the grid is split into 6 tetrahedra; surface
// vertices are linearly interpolated on tet edges and deduplicated through a
// hash map keyed by the global (corner, corner) edge, so the output is an
// indexed triangle mesh directly usable for PLY/OBJ export and PnP alignment.
//
// API (C, used from Python via ctypes):
//   handle = mt_run(grid, nx, ny, nz, iso, &n_verts, &n_tris)
//   mt_get(handle, verts /*float32 [n_verts,3]*/, tris /*int32 [n_tris,3]*/)
//   mt_free(handle)
// Vertex coordinates are in voxel units (0 .. n-1), like PyMCubes.

#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

struct Mesh {
  std::vector<float> verts;   // xyz triples
  std::vector<int32_t> tris;  // index triples
};

// Corner offsets of a unit cube, indexed 0..7 (x fastest is irrelevant; we
// address the value grid directly).
static const int kCorner[8][3] = {
    {0, 0, 0}, {1, 0, 0}, {1, 1, 0}, {0, 1, 0},
    {0, 0, 1}, {1, 0, 1}, {1, 1, 1}, {0, 1, 1}};

// 6-tetrahedra decomposition of a cube sharing the main diagonal 0-6.
static const int kTets[6][4] = {
    {0, 5, 1, 6}, {0, 1, 2, 6}, {0, 2, 3, 6},
    {0, 3, 7, 6}, {0, 7, 4, 6}, {0, 4, 5, 6}};

struct EdgeKeyHash {
  size_t operator()(uint64_t k) const { return std::hash<uint64_t>()(k); }
};

class Extractor {
 public:
  Extractor(const float* grid, int nx, int ny, int nz, float iso)
      : g_(grid), nx_(nx), ny_(ny), nz_(nz), iso_(iso) {}

  Mesh run() {
    Mesh m;
    edge_to_vert_.reserve(1 << 16);
    for (int x = 0; x < nx_ - 1; ++x)
      for (int y = 0; y < ny_ - 1; ++y)
        for (int z = 0; z < nz_ - 1; ++z) cube(m, x, y, z);
    return m;
  }

 private:
  inline float val(int64_t x, int64_t y, int64_t z) const {
    return g_[(x * ny_ + y) * nz_ + z];
  }
  inline uint64_t node_id(int x, int y, int z) const {
    return (uint64_t)((int64_t)(x * ny_ + y) * nz_ + z);
  }

  int edge_vertex(Mesh& m, uint64_t na, uint64_t nb, float va, float vb,
                  const float pa[3], const float pb[3]) {
    if (na > nb) {
      std::swap(na, nb);
      std::swap(va, vb);
      const float* t = pa; pa = pb; pb = t;
    }
    uint64_t key = na * 2654435761ull ^ (nb + 0x9e3779b97f4a7c15ull);
    // combine exactly (na, nb): use a map of pair encoded in 128 -> fold to
    // 64 with both values; collisions avoided by storing full pair
    auto range = edge_to_vert_.equal_range(key);
    for (auto it = range.first; it != range.second; ++it) {
      if (it->second.na == na && it->second.nb == nb) return it->second.idx;
    }
    float denom = vb - va;
    float t = (denom == 0.f) ? 0.5f : (iso_ - va) / denom;
    if (t < 0.f) t = 0.f;
    if (t > 1.f) t = 1.f;
    int idx = (int)(m.verts.size() / 3);
    for (int d = 0; d < 3; ++d) m.verts.push_back(pa[d] + t * (pb[d] - pa[d]));
    edge_to_vert_.emplace(key, Entry{na, nb, idx});
    return idx;
  }

  void cube(Mesh& m, int x, int y, int z) {
    float v[8];
    float p[8][3];
    uint64_t nid[8];
    bool all_lo = true, all_hi = true;
    for (int c = 0; c < 8; ++c) {
      int cx = x + kCorner[c][0], cy = y + kCorner[c][1], cz = z + kCorner[c][2];
      v[c] = val(cx, cy, cz);
      p[c][0] = (float)cx; p[c][1] = (float)cy; p[c][2] = (float)cz;
      nid[c] = node_id(cx, cy, cz);
      if (v[c] > iso_) all_lo = false; else all_hi = false;
    }
    if (all_lo || all_hi) return;

    for (const auto& tet : kTets) {
      int a = tet[0], b = tet[1], c = tet[2], d = tet[3];
      int mask = (v[a] > iso_) | ((v[b] > iso_) << 1) | ((v[c] > iso_) << 2) |
                 ((v[d] > iso_) << 3);
      emit_tet(m, mask, a, b, c, d, v, p, nid);
    }
  }

  inline int ev(Mesh& m, int i, int j, const float v[8], const float p[8][3],
                const uint64_t nid[8]) {
    return edge_vertex(m, nid[i], nid[j], v[i], v[j], p[i], p[j]);
  }

  void tri(Mesh& m, int i0, int i1, int i2) {
    m.tris.push_back(i0);
    m.tris.push_back(i1);
    m.tris.push_back(i2);
  }

  void emit_tet(Mesh& m, int mask, int a, int b, int c, int d, const float v[8],
                const float p[8][3], const uint64_t nid[8]) {
    // Canonicalize: treat "inside" = bit set.  Cases by popcount with
    // orientation handled per case (winding consistency is enough for
    // export/metrics; normals are recomputed downstream from the SDF).
    switch (mask) {
      case 0x0: case 0xF: return;
      case 0x1: tri(m, ev(m,a,b,v,p,nid), ev(m,a,c,v,p,nid), ev(m,a,d,v,p,nid)); return;
      case 0xE: tri(m, ev(m,a,b,v,p,nid), ev(m,a,d,v,p,nid), ev(m,a,c,v,p,nid)); return;
      case 0x2: tri(m, ev(m,b,a,v,p,nid), ev(m,b,d,v,p,nid), ev(m,b,c,v,p,nid)); return;
      case 0xD: tri(m, ev(m,b,a,v,p,nid), ev(m,b,c,v,p,nid), ev(m,b,d,v,p,nid)); return;
      case 0x4: tri(m, ev(m,c,a,v,p,nid), ev(m,c,b,v,p,nid), ev(m,c,d,v,p,nid)); return;
      case 0xB: tri(m, ev(m,c,a,v,p,nid), ev(m,c,d,v,p,nid), ev(m,c,b,v,p,nid)); return;
      case 0x8: tri(m, ev(m,d,a,v,p,nid), ev(m,d,c,v,p,nid), ev(m,d,b,v,p,nid)); return;
      case 0x7: tri(m, ev(m,d,a,v,p,nid), ev(m,d,b,v,p,nid), ev(m,d,c,v,p,nid)); return;
      case 0x3: {  // ab inside
        int e0 = ev(m,a,c,v,p,nid), e1 = ev(m,a,d,v,p,nid);
        int e2 = ev(m,b,d,v,p,nid), e3 = ev(m,b,c,v,p,nid);
        tri(m, e0, e1, e2); tri(m, e0, e2, e3); return;
      }
      case 0xC: {
        int e0 = ev(m,a,c,v,p,nid), e1 = ev(m,a,d,v,p,nid);
        int e2 = ev(m,b,d,v,p,nid), e3 = ev(m,b,c,v,p,nid);
        tri(m, e0, e2, e1); tri(m, e0, e3, e2); return;
      }
      case 0x5: {  // ac inside
        int e0 = ev(m,a,b,v,p,nid), e1 = ev(m,a,d,v,p,nid);
        int e2 = ev(m,c,d,v,p,nid), e3 = ev(m,c,b,v,p,nid);
        tri(m, e0, e2, e1); tri(m, e0, e3, e2); return;
      }
      case 0xA: {
        int e0 = ev(m,a,b,v,p,nid), e1 = ev(m,a,d,v,p,nid);
        int e2 = ev(m,c,d,v,p,nid), e3 = ev(m,c,b,v,p,nid);
        tri(m, e0, e1, e2); tri(m, e0, e2, e3); return;
      }
      case 0x6: {  // bc inside
        int e0 = ev(m,b,a,v,p,nid), e1 = ev(m,b,d,v,p,nid);
        int e2 = ev(m,c,d,v,p,nid), e3 = ev(m,c,a,v,p,nid);
        tri(m, e0, e1, e2); tri(m, e0, e2, e3); return;
      }
      case 0x9: {
        int e0 = ev(m,b,a,v,p,nid), e1 = ev(m,b,d,v,p,nid);
        int e2 = ev(m,c,d,v,p,nid), e3 = ev(m,c,a,v,p,nid);
        tri(m, e0, e2, e1); tri(m, e0, e3, e2); return;
      }
    }
  }

  struct Entry {
    uint64_t na, nb;
    int idx;
  };
  const float* g_;
  int nx_, ny_, nz_;
  float iso_;
  std::unordered_multimap<uint64_t, Entry, EdgeKeyHash> edge_to_vert_;
};

}  // namespace

extern "C" {

void* mt_run(const float* grid, int nx, int ny, int nz, float iso,
             int64_t* n_verts, int64_t* n_tris) {
  Extractor ex(grid, nx, ny, nz, iso);
  Mesh* m = new Mesh(ex.run());
  *n_verts = (int64_t)(m->verts.size() / 3);
  *n_tris = (int64_t)(m->tris.size() / 3);
  return (void*)m;
}

void mt_get(void* handle, float* verts, int32_t* tris) {
  Mesh* m = (Mesh*)handle;
  std::memcpy(verts, m->verts.data(), m->verts.size() * sizeof(float));
  std::memcpy(tris, m->tris.data(), m->tris.size() * sizeof(int32_t));
}

void mt_free(void* handle) { delete (Mesh*)handle; }

}  // extern "C"
