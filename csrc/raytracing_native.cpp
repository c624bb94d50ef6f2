// Native host runtime for raytracing_tpu.
//
// The reference keeps its host-side hot paths native (Rust): OBJ parsing
// (/root/reference/src/main.rs:38-72) and the acceleration-structure build
// (src/opt.rs). This library is the C++ equivalent for our framework's
// host stage: a single-pass OBJ parser and a Morton-code spatial sort used
// by the cluster-accel builder. Exposed as a plain C ABI consumed via
// ctypes (raytracing_tpu/geometry/native.py); every entry point has a
// numpy fallback, so the library is an accelerator, not a dependency.
//
// Build: make -C csrc   ->  csrc/libraytracing_native.so

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct ObjCounts {
  long n_verts = 0;
  long n_tris = 0;
};

// Read a whole file into a buffer; returns empty on failure.
std::vector<char> read_file(const char* path) {
  std::vector<char> buf;
  FILE* f = std::fopen(path, "rb");
  if (!f) return buf;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  buf.resize(static_cast<size_t>(size) + 1);
  size_t got = std::fread(buf.data(), 1, static_cast<size_t>(size), f);
  std::fclose(f);
  buf.resize(got);
  buf.push_back('\0');
  return buf;
}

inline const char* skip_ws(const char* p) {
  while (*p == ' ' || *p == '\t' || *p == '\r') ++p;
  return p;
}

inline const char* next_line(const char* p) {
  while (*p && *p != '\n') ++p;
  return *p ? p + 1 : p;
}

// Parse a face vertex token "i", "i/j", "i//k", "i/j/k"; 1-based, negative
// indices count from the end. Returns 0-based index or -1.
inline long parse_face_index(const char*& p, long n_verts) {
  char* end = nullptr;
  long v = std::strtol(p, &end, 10);
  if (end == p) return -1;
  p = end;
  // skip /vt/vn suffix
  while (*p && *p != ' ' && *p != '\t' && *p != '\n' && *p != '\r') ++p;
  if (v > 0) return v - 1;
  if (v < 0) return n_verts + v;
  return -1;
}

// Shared parse walk: counts, or fills when out pointers are non-null.
int parse_obj(const char* path, float* verts, long verts_cap, int* tris,
              long tris_cap, ObjCounts* counts) {
  std::vector<char> buf = read_file(path);
  if (buf.empty()) return 1;
  long nv = 0, nt = 0;
  const char* p = buf.data();
  while (*p) {
    p = skip_ws(p);
    if (p[0] == 'v' && (p[1] == ' ' || p[1] == '\t')) {
      const char* q = p + 2;
      char* end = nullptr;
      float x = std::strtof(q, &end);
      float y = std::strtof(end, &end);
      float z = std::strtof(end, &end);
      if (verts) {
        if (nv >= verts_cap) return 2;
        verts[nv * 3 + 0] = x;
        verts[nv * 3 + 1] = y;
        verts[nv * 3 + 2] = z;
      }
      ++nv;
    } else if (p[0] == 'f' && (p[1] == ' ' || p[1] == '\t')) {
      const char* q = p + 2;
      long idx[64];
      int n = 0;
      while (n < 64) {
        q = skip_ws(q);
        if (*q == '\n' || *q == '\0') break;
        long v = parse_face_index(q, nv);
        if (v < 0) break;
        idx[n++] = v;
      }
      // fan-triangulate polygons, matching the numpy fallback
      for (int k = 1; k + 1 < n; ++k) {
        if (tris) {
          if (nt >= tris_cap) return 2;
          tris[nt * 3 + 0] = static_cast<int>(idx[0]);
          tris[nt * 3 + 1] = static_cast<int>(idx[k]);
          tris[nt * 3 + 2] = static_cast<int>(idx[k + 1]);
        }
        ++nt;
      }
    }
    p = next_line(p);
  }
  if (counts) {
    counts->n_verts = nv;
    counts->n_tris = nt;
  }
  return 0;
}

inline uint32_t expand_bits10(uint32_t v) {
  v = (v | (v << 16)) & 0x030000FFu;
  v = (v | (v << 8)) & 0x0300F00Fu;
  v = (v | (v << 4)) & 0x030C30C3u;
  v = (v | (v << 2)) & 0x09249249u;
  return v;
}

}  // namespace

extern "C" {

int rt_parse_obj_count(const char* path, long* n_verts, long* n_tris) {
  ObjCounts c;
  int rc = parse_obj(path, nullptr, 0, nullptr, 0, &c);
  if (rc) return rc;
  *n_verts = c.n_verts;
  *n_tris = c.n_tris;
  return 0;
}

int rt_parse_obj_fill(const char* path, float* verts, long n_verts, int* tris,
                      long n_tris) {
  return parse_obj(path, verts, n_verts, tris, n_tris, nullptr);
}

// Stable Morton-order (Z-curve, 30-bit) of 3D points: writes the argsort
// permutation into `order`. Matches the numpy path in accel/packets.py.
int rt_morton_order(const float* centroids, long n, int* order) {
  if (n <= 0) return 0;
  float lo[3] = {centroids[0], centroids[1], centroids[2]};
  float hi[3] = {centroids[0], centroids[1], centroids[2]};
  for (long i = 1; i < n; ++i) {
    for (int k = 0; k < 3; ++k) {
      float v = centroids[i * 3 + k];
      lo[k] = std::min(lo[k], v);
      hi[k] = std::max(hi[k], v);
    }
  }
  float scale[3];
  for (int k = 0; k < 3; ++k) {
    float ext = hi[k] - lo[k];
    scale[k] = 1023.0f / (ext > 1e-20f ? ext : 1e-20f);
  }
  std::vector<std::pair<uint32_t, int>> keyed(static_cast<size_t>(n));
  for (long i = 0; i < n; ++i) {
    uint32_t q[3];
    for (int k = 0; k < 3; ++k) {
      float f = (centroids[i * 3 + k] - lo[k]) * scale[k];
      long qi = static_cast<long>(f);
      q[k] = static_cast<uint32_t>(std::min(std::max(qi, 0L), 1023L));
    }
    uint32_t code = (expand_bits10(q[0]) << 2) | (expand_bits10(q[1]) << 1) |
                    expand_bits10(q[2]);
    keyed[static_cast<size_t>(i)] = {code, static_cast<int>(i)};
  }
  std::stable_sort(keyed.begin(), keyed.end(),
                   [](const auto& a, const auto& b) { return a.first < b.first; });
  for (long i = 0; i < n; ++i) order[i] = keyed[static_cast<size_t>(i)].second;
  return 0;
}

}  // extern "C"
