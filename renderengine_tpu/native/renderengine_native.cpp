// Native host-runtime helpers for renderengine_tpu.
//
// The reference engine's host side is C++ throughout; the TPU rebuild keeps
// the compute path in JAX/Pallas but implements the host-side hot loops
// natively too. The two that dominate scene loading:
//
//  1. PNG scanline unfiltering (per-byte sequential dependency — the Paeth/
//     Sub/Average filters can't be vectorized in numpy; the pure-Python
//     fallback is ~1000x slower on megapixel textures). Plays the role of
//     stb_image's hot loop (reference TextureCache.cpp:50-106).
//  2. Wavefront OBJ tokenization (reference AssimpSceneLoader's per-vertex
//     append loop, AssimpSceneLoader.cpp:226-248).
//
// Plain C ABI, consumed via ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

// --- PNG unfilter ----------------------------------------------------------
// raw: concatenated (filter_byte + row_bytes) scanlines, h rows of `stride`
// bytes each, `bpp` bytes per pixel. out: h*stride bytes.
int unfilter_png(const uint8_t* raw, int64_t raw_len, int h, int stride,
                 int bpp, uint8_t* out) {
  if (raw_len < (int64_t)h * (stride + 1)) return -1;
  const uint8_t* prev = nullptr;
  for (int y = 0; y < h; ++y) {
    const uint8_t* src = raw + (int64_t)y * (stride + 1);
    uint8_t ftype = src[0];
    const uint8_t* row = src + 1;
    uint8_t* dst = out + (int64_t)y * stride;
    switch (ftype) {
      case 0:
        memcpy(dst, row, stride);
        break;
      case 1:  // Sub
        for (int i = 0; i < stride; ++i)
          dst[i] = row[i] + (i >= bpp ? dst[i - bpp] : 0);
        break;
      case 2:  // Up
        for (int i = 0; i < stride; ++i)
          dst[i] = row[i] + (prev ? prev[i] : 0);
        break;
      case 3:  // Average
        for (int i = 0; i < stride; ++i) {
          int left = i >= bpp ? dst[i - bpp] : 0;
          int up = prev ? prev[i] : 0;
          dst[i] = row[i] + ((left + up) >> 1);
        }
        break;
      case 4:  // Paeth
        for (int i = 0; i < stride; ++i) {
          int a = i >= bpp ? dst[i - bpp] : 0;
          int b = prev ? prev[i] : 0;
          int c = (prev && i >= bpp) ? prev[i - bpp] : 0;
          int p = a + b - c;
          int pa = abs(p - a), pb = abs(p - b), pc = abs(p - c);
          int pred = (pa <= pb && pa <= pc) ? a : (pb <= pc ? b : c);
          dst[i] = row[i] + pred;
        }
        break;
      default:
        return -2;
    }
    prev = dst;
  }
  return 0;
}

// --- OBJ parser -------------------------------------------------------------
// Two-phase: obj_parse() tokenizes the whole file into flat per-corner
// arrays (fan-triangulated, indices resolved, 3 corners per triangle) and
// returns a handle; obj_fetch() copies the arrays out; obj_free() releases.

struct ObjData {
  std::vector<float> pos;       // 9 floats per tri (3 corners x xyz)
  std::vector<float> nrm;       // 9 per tri (zeros when absent)
  std::vector<float> uv;        // 6 per tri (v already negated)
  std::vector<int32_t> mat;     // 1 per tri: material index into names
  std::vector<char> mat_names;  // \0-joined material names (usemtl order)
  std::vector<char> mtllibs;    // \0-joined mtllib paths
  int32_t n_tris = 0;
  int32_t n_mats = 0;
};

static const char* skip_ws(const char* p, const char* end) {
  while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
  return p;
}

extern "C" void* obj_parse(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  fseek(f, 0, SEEK_END);
  long len = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<char> buf(len + 1);
  if (fread(buf.data(), 1, len, f) != (size_t)len) {
    fclose(f);
    return nullptr;
  }
  fclose(f);
  buf[len] = '\n';

  auto* d = new ObjData();
  std::vector<float> vs, vns, vts;
  std::vector<const char*> mat_name_ptrs;
  int cur_mat = -1;

  const char* p = buf.data();
  const char* end = buf.data() + len;
  while (p < end) {
    const char* line_end = (const char*)memchr(p, '\n', end - p);
    if (!line_end) line_end = end;
    const char* q = skip_ws(p, line_end);
    if (q + 1 < line_end && q[0] == 'v' && (q[1] == ' ' || q[1] == '\t')) {
      char* e;
      float x = strtof(q + 2, &e), y = strtof(e, &e), z = strtof(e, &e);
      vs.push_back(x); vs.push_back(y); vs.push_back(z);
    } else if (q + 2 < line_end && q[0] == 'v' && q[1] == 'n') {
      char* e;
      float x = strtof(q + 3, &e), y = strtof(e, &e), z = strtof(e, &e);
      vns.push_back(x); vns.push_back(y); vns.push_back(z);
    } else if (q + 2 < line_end && q[0] == 'v' && q[1] == 't') {
      char* e;
      float u = strtof(q + 3, &e), v = strtof(e, &e);
      vts.push_back(u); vts.push_back(-v);  // reference v flip
    } else if (q < line_end && q[0] == 'f') {
      // corners: v[/vt[/vn]]
      int vi[64], ti[64], ni[64], n = 0;
      const char* c = q + 1;
      while (c < line_end && n < 64) {
        c = skip_ws(c, line_end);
        if (c >= line_end) break;
        char* e;
        long a = strtol(c, &e, 10);
        if (e == c) break;
        long b = 0, cc = 0;
        if (*e == '/') {
          const char* e2 = e + 1;
          if (*e2 != '/') b = strtol(e2, (char**)&e2, 10);
          if (*e2 == '/') cc = strtol(e2 + 1, &e, 10);
          else e = (char*)e2;
        }
        vi[n] = (int)a; ti[n] = (int)b; ni[n] = (int)cc;
        ++n;
        c = e;
      }
      int nv = (int)(vs.size() / 3), nt = (int)(vts.size() / 2),
          nn = (int)(vns.size() / 3);
      auto rv = [&](int i, int cnt) { return i > 0 ? i - 1 : cnt + i; };
      for (int k = 1; k + 1 < n; ++k) {
        int idx[3] = {0, k, k + 1};
        for (int cnr = 0; cnr < 3; ++cnr) {
          int i = idx[cnr];
          int v3 = rv(vi[i], nv) * 3;
          d->pos.push_back(vs[v3]); d->pos.push_back(vs[v3 + 1]);
          d->pos.push_back(vs[v3 + 2]);
          if (ni[i] != 0) {
            int n3 = rv(ni[i], nn) * 3;
            d->nrm.push_back(vns[n3]); d->nrm.push_back(vns[n3 + 1]);
            d->nrm.push_back(vns[n3 + 2]);
          } else {
            d->nrm.push_back(0); d->nrm.push_back(0); d->nrm.push_back(0);
          }
          if (ti[i] != 0) {
            int t2 = rv(ti[i], nt) * 2;
            d->uv.push_back(vts[t2]); d->uv.push_back(vts[t2 + 1]);
          } else {
            d->uv.push_back(0); d->uv.push_back(0);
          }
        }
        d->mat.push_back(cur_mat);
        ++d->n_tris;
      }
    } else if (line_end - q > 7 && !strncmp(q, "usemtl", 6)) {
      const char* name = skip_ws(q + 6, line_end);
      size_t sz = line_end - name;
      while (sz && (name[sz - 1] == '\r' || name[sz - 1] == ' ')) --sz;
      d->mat_names.insert(d->mat_names.end(), name, name + sz);
      d->mat_names.push_back('\0');
      cur_mat = d->n_mats++;
    } else if (line_end - q > 7 && !strncmp(q, "mtllib", 6)) {
      const char* name = skip_ws(q + 6, line_end);
      size_t sz = line_end - name;
      while (sz && (name[sz - 1] == '\r' || name[sz - 1] == ' ')) --sz;
      d->mtllibs.insert(d->mtllibs.end(), name, name + sz);
      d->mtllibs.push_back('\0');
    }
    p = line_end + 1;
  }
  return d;
}

extern "C" int32_t obj_n_tris(void* h) { return ((ObjData*)h)->n_tris; }
extern "C" int32_t obj_n_mats(void* h) { return ((ObjData*)h)->n_mats; }
extern "C" int64_t obj_names_len(void* h) { return (int64_t)((ObjData*)h)->mat_names.size(); }
extern "C" int64_t obj_mtllibs_len(void* h) { return (int64_t)((ObjData*)h)->mtllibs.size(); }

extern "C" void obj_fetch(void* h, float* pos, float* nrm, float* uv,
                          int32_t* mat, char* names, char* mtllibs) {
  auto* d = (ObjData*)h;
  memcpy(pos, d->pos.data(), d->pos.size() * 4);
  memcpy(nrm, d->nrm.data(), d->nrm.size() * 4);
  memcpy(uv, d->uv.data(), d->uv.size() * 4);
  memcpy(mat, d->mat.data(), d->mat.size() * 4);
  if (names && !d->mat_names.empty())
    memcpy(names, d->mat_names.data(), d->mat_names.size());
  if (mtllibs && !d->mtllibs.empty())
    memcpy(mtllibs, d->mtllibs.data(), d->mtllibs.size());
}

extern "C" void obj_free(void* h) { delete (ObjData*)h; }

}  // extern "C"
