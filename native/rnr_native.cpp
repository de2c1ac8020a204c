// rnr_native — native host runtime for the rnr_tpu framework.
//
// The reference implementation leans on torch DataLoader worker processes
// plus OpenCV for its host data path; the TPU build ships its own compact
// native runtime instead: a zero-copy Wavefront OBJ parser and a
// multithreaded PNG/JPEG decoder that fills caller-provided float32
// buffers.  Exposed as a plain C ABI consumed via ctypes
// (rnr_tpu/data/native.py) — no pybind11 dependency.
//
// Build: make -C native   (produces librnr_native.so)

#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

#include <jpeglib.h>
#include <png.h>

extern "C" {

// ---------------------------------------------------------------------------
// OBJ parsing
// ---------------------------------------------------------------------------

struct ObjCounts {
  int64_t nv;
  int64_t nvt;
  int64_t nvn;
  int64_t nf;  // triangles after fan triangulation
};

namespace {

struct Mapped {
  const char* data = nullptr;
  size_t size = 0;
  int fd = -1;
  bool ok() const { return data != nullptr; }
};

Mapped map_file(const char* path) {
  Mapped m;
  m.fd = open(path, O_RDONLY);
  if (m.fd < 0) return m;
  struct stat st;
  if (fstat(m.fd, &st) != 0 || st.st_size == 0) {
    close(m.fd);
    m.fd = -1;
    return m;
  }
  void* p = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, m.fd, 0);
  if (p == MAP_FAILED) {
    close(m.fd);
    m.fd = -1;
    return m;
  }
  m.data = static_cast<const char*>(p);
  m.size = st.st_size;
  return m;
}

void unmap(Mapped& m) {
  if (m.data) munmap(const_cast<char*>(m.data), m.size);
  if (m.fd >= 0) close(m.fd);
}

inline const char* skip_ws(const char* p, const char* end) {
  while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
  return p;
}

inline const char* next_line(const char* p, const char* end) {
  while (p < end && *p != '\n') ++p;
  return p < end ? p + 1 : end;
}

// fast float parse (OBJ floats are simple decimal, optional exponent)
inline const char* parse_float(const char* p, const char* end, float* out) {
  char* q = nullptr;
  *out = strtof(p, &q);
  return q && q <= end ? q : p;
}

inline const char* parse_int(const char* p, const char* end, long* out) {
  char* q = nullptr;
  *out = strtol(p, &q, 10);
  return q && q <= end ? q : p;
}

// parse one face corner "v[/vt[/vn]]"; returns updated pointer
inline const char* parse_corner(const char* p, const char* end, long* vi,
                                long* ti, long* ni, bool* has_t,
                                bool* has_n) {
  *has_t = *has_n = false;
  p = parse_int(p, end, vi);
  if (p < end && *p == '/') {
    ++p;
    if (p < end && *p != '/') {
      p = parse_int(p, end, ti);
      *has_t = true;
    }
    if (p < end && *p == '/') {
      ++p;
      p = parse_int(p, end, ni);
      *has_n = true;
    }
  }
  return p;
}

inline int64_t resolve_idx(long i, int64_t count) {
  return i > 0 ? i - 1 : count + i;
}

}  // namespace

int rnr_obj_count(const char* path, ObjCounts* c) {
  Mapped m = map_file(path);
  if (!m.ok()) return -1;
  c->nv = c->nvt = c->nvn = c->nf = 0;
  const char* p = m.data;
  const char* end = m.data + m.size;
  while (p < end) {
    p = skip_ws(p, end);
    if (p + 1 < end && p[0] == 'v') {
      if (p[1] == ' ' || p[1] == '\t')
        ++c->nv;
      else if (p[1] == 't')
        ++c->nvt;
      else if (p[1] == 'n')
        ++c->nvn;
    } else if (p < end && p[0] == 'f') {
      // count corners on this face line
      int corners = 0;
      const char* q = p + 1;
      while (q < end && *q != '\n') {
        q = skip_ws(q, end);
        if (q < end && (isdigit(*q) || *q == '-')) {
          ++corners;
          while (q < end && *q != ' ' && *q != '\t' && *q != '\n' &&
                 *q != '\r')
            ++q;
        } else {
          ++q;
        }
      }
      if (corners >= 3) c->nf += corners - 2;
    }
    p = next_line(p, end);
  }
  unmap(m);
  return 0;
}

// Fills caller-allocated arrays sized from rnr_obj_count:
//   v [nv*3], vt [nvt*2], vn [nvn*3], fv/fvt/fvn [nf*3] (int32, -1 if absent)
int rnr_obj_parse(const char* path, float* v, float* vt, float* vn,
                  int32_t* fv, int32_t* fvt, int32_t* fvn) {
  Mapped m = map_file(path);
  if (!m.ok()) return -1;
  const char* p = m.data;
  const char* end = m.data + m.size;
  int64_t iv = 0, it = 0, in_ = 0, itri = 0;
  long c_v[64], c_t[64], c_n[64];
  bool c_ht[64], c_hn[64];
  while (p < end) {
    p = skip_ws(p, end);
    if (p + 1 < end && p[0] == 'v' && (p[1] == ' ' || p[1] == '\t')) {
      const char* q = p + 2;
      for (int k = 0; k < 3; ++k) {
        q = skip_ws(q, end);
        q = parse_float(q, end, &v[iv * 3 + k]);
      }
      ++iv;
    } else if (p + 1 < end && p[0] == 'v' && p[1] == 't') {
      const char* q = p + 2;
      for (int k = 0; k < 2; ++k) {
        q = skip_ws(q, end);
        q = parse_float(q, end, &vt[it * 2 + k]);
      }
      ++it;
    } else if (p + 1 < end && p[0] == 'v' && p[1] == 'n') {
      const char* q = p + 2;
      for (int k = 0; k < 3; ++k) {
        q = skip_ws(q, end);
        q = parse_float(q, end, &vn[in_ * 3 + k]);
      }
      ++in_;
    } else if (p < end && p[0] == 'f') {
      const char* q = p + 1;
      int corners = 0;
      while (q < end && *q != '\n' && corners < 64) {
        q = skip_ws(q, end);
        if (q < end && (isdigit(*q) || *q == '-')) {
          q = parse_corner(q, end, &c_v[corners], &c_t[corners],
                           &c_n[corners], &c_ht[corners], &c_hn[corners]);
          ++corners;
        } else if (q < end && *q != '\n') {
          ++q;
        }
      }
      for (int k = 1; k + 1 < corners; ++k) {
        int tri[3] = {0, k, k + 1};
        for (int j = 0; j < 3; ++j) {
          int ci = tri[j];
          fv[itri * 3 + j] =
              static_cast<int32_t>(resolve_idx(c_v[ci], iv));
          fvt[itri * 3 + j] =
              c_ht[ci] ? static_cast<int32_t>(resolve_idx(c_t[ci], it)) : -1;
          fvn[itri * 3 + j] =
              c_hn[ci] ? static_cast<int32_t>(resolve_idx(c_n[ci], in_)) : -1;
        }
        ++itri;
      }
    }
    p = next_line(p, end);
  }
  unmap(m);
  return 0;
}

// ---------------------------------------------------------------------------
// Image decoding (PNG + JPEG) — float32 RGB in [0, 1]
// ---------------------------------------------------------------------------

namespace {

bool is_png(FILE* f) {
  unsigned char sig[8];
  if (fread(sig, 1, 8, f) != 8) return false;
  rewind(f);
  return png_sig_cmp(sig, 0, 8) == 0;
}

int decode_png_file(FILE* f, float* out, int want_h, int want_w, int want_c) {
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return -2;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return -2;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -3;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  int bit_depth = png_get_bit_depth(png, info);
  int color = png_get_color_type(png, info);
  if (bit_depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  png_set_strip_alpha(png);
  png_read_update_info(png, info);
  if ((int)h != want_h || (int)w != want_w) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -4;
  }
  std::vector<unsigned char> row(png_get_rowbytes(png, info));
  const float inv = 1.0f / 255.0f;
  for (png_uint_32 y = 0; y < h; ++y) {
    png_read_row(png, row.data(), nullptr);
    float* o = out + (size_t)y * w * want_c;
    for (png_uint_32 x = 0; x < w; ++x) {
      for (int ch = 0; ch < want_c; ++ch)
        o[x * want_c + ch] = row[x * 3 + (ch < 3 ? ch : 2)] * inv;
    }
  }
  png_destroy_read_struct(&png, &info, nullptr);
  return 0;
}

int decode_jpeg_file(FILE* f, float* out, int want_h, int want_w, int want_c) {
  jpeg_decompress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  if ((int)cinfo.output_height != want_h || (int)cinfo.output_width != want_w) {
    jpeg_destroy_decompress(&cinfo);
    return -4;
  }
  std::vector<unsigned char> row(cinfo.output_width * cinfo.output_components);
  unsigned char* rp = row.data();
  const float inv = 1.0f / 255.0f;
  while (cinfo.output_scanline < cinfo.output_height) {
    int y = cinfo.output_scanline;
    jpeg_read_scanlines(&cinfo, &rp, 1);
    float* o = out + (size_t)y * want_w * want_c;
    for (int x = 0; x < want_w; ++x)
      for (int ch = 0; ch < want_c; ++ch)
        o[x * want_c + ch] = row[x * 3 + (ch < 3 ? ch : 2)] * inv;
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

}  // namespace

// Query dimensions; returns 0 on success.
int rnr_image_info(const char* path, int* h, int* w, int* c) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  int rc = -5;
  if (is_png(f)) {
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                             nullptr, nullptr);
    png_infop info = png_create_info_struct(png);
    if (png && info && !setjmp(png_jmpbuf(png))) {
      png_init_io(png, f);
      png_read_info(png, info);
      *h = png_get_image_height(png, info);
      *w = png_get_image_width(png, info);
      *c = 3;
      rc = 0;
    }
    png_destroy_read_struct(&png, &info, nullptr);
  } else {
    jpeg_decompress_struct cinfo;
    jpeg_error_mgr jerr;
    cinfo.err = jpeg_std_error(&jerr);
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, f);
    if (jpeg_read_header(&cinfo, TRUE) == JPEG_HEADER_OK) {
      *h = cinfo.image_height;
      *w = cinfo.image_width;
      *c = 3;
      rc = 0;
    }
    jpeg_destroy_decompress(&cinfo);
  }
  fclose(f);
  return rc;
}

// Decode one image into a preallocated float32 [h, w, c] RGB buffer.
int rnr_image_decode(const char* path, float* out, int h, int w, int c) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  int rc;
  if (is_png(f))
    rc = decode_png_file(f, out, h, w, c);
  else
    rc = decode_jpeg_file(f, out, h, w, c);
  fclose(f);
  return rc;
}

// Threaded batch decode.  paths/outs are arrays of n pointers; hs/ws give
// per-image dims (from rnr_image_info).  Returns count of failures.
int rnr_image_decode_batch(const char** paths, float** outs, const int* hs,
                           const int* ws, int n, int c, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::vector<std::thread> workers;
  std::vector<int> fails(n_threads, 0);
  for (int t = 0; t < n_threads; ++t) {
    workers.emplace_back([&, t]() {
      for (int i = t; i < n; i += n_threads) {
        if (rnr_image_decode(paths[i], outs[i], hs[i], ws[i], c) != 0)
          ++fails[t];
      }
    });
  }
  int total = 0;
  for (int t = 0; t < n_threads; ++t) {
    workers[t].join();
    total += fails[t];
  }
  return total;
}

}  // extern "C"
