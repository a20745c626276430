// Native image pipeline: JPEG decode + bilinear resize, multithreaded.
//
// The reference's input pipeline decodes images with PIL inside torch
// DataLoader worker *processes* (/root/reference/UniMP/pipeline/
// mm_utils/rec_dataset.py:396-398, 4 workers). Here the hot path is a
// C++ library driven from Python threads: libjpeg decode straight into
// a caller-provided buffer and a separable bilinear resize, with an
// internal std::thread pool for batch calls. No Python objects are
// touched inside, so calls release the GIL through ctypes and scale
// across cores.
//
// Build: see unimp_tpu/data/native.py (g++ -O3 -shared -fPIC -ljpeg).

#include <cstddef>
#include <cstdio>  // jpeglib.h uses size_t/FILE without including them

#include <jpeglib.h>

#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode a JPEG byte buffer to RGB8. Returns 0 on success.
int decode_rgb(const unsigned char* data, long size, std::vector<uint8_t>* out,
               int* width, int* height) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, static_cast<unsigned long>(size));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *width = cinfo.output_width;
  *height = cinfo.output_height;
  out->resize(static_cast<size_t>(*width) * *height * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data() +
                   static_cast<size_t>(cinfo.output_scanline) * *width * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Separable triangle-filter (bilinear with support scaling) resize,
// matching PIL's BILINEAR semantics for downscaling. Filter weights are
// identical for every row/column, so they are precomputed once into
// coefficient tables and the passes run as tight row-major loops.

struct FilterTable {
  std::vector<int> lo;       // first source index per output index
  std::vector<int> len;      // taps per output index
  std::vector<float> coef;   // [out, max_len] row-major, normalized
  int max_len = 0;
};

FilterTable build_filter(int src, int dst) {
  FilterTable t;
  const float scale = static_cast<float>(src) / dst;
  const float support = scale < 1.0f ? 1.0f : scale;
  t.lo.resize(dst);
  t.len.resize(dst);
  std::vector<std::vector<float>> rows(dst);
  for (int x = 0; x < dst; ++x) {
    const float center = (x + 0.5f) * scale;
    int lo = static_cast<int>(center - support + 0.5f);
    int hi = static_cast<int>(center + support + 0.5f);
    if (lo < 0) lo = 0;
    if (hi > src) hi = src;
    float wsum = 0.0f;
    rows[x].resize(hi - lo);
    for (int i = lo; i < hi; ++i) {
      float d = (i + 0.5f - center) / support;
      float v = d < 0 ? 1.0f + d : 1.0f - d;
      if (v < 0) v = 0;
      rows[x][i - lo] = v;
      wsum += v;
    }
    if (wsum <= 0) {
      rows[x].assign(hi - lo, 1.0f);
      wsum = static_cast<float>(hi - lo);
    }
    for (float& v : rows[x]) v /= wsum;
    t.lo[x] = lo;
    t.len[x] = hi - lo;
    if (hi - lo > t.max_len) t.max_len = hi - lo;
  }
  t.coef.assign(static_cast<size_t>(dst) * t.max_len, 0.0f);
  for (int x = 0; x < dst; ++x)
    std::memcpy(&t.coef[static_cast<size_t>(x) * t.max_len], rows[x].data(),
                rows[x].size() * sizeof(float));
  return t;
}

void resize_bilinear(const uint8_t* src, int sw, int sh, uint8_t* dst,
                     int dw, int dh) {
  const FilterTable fx = build_filter(sw, dw);
  const FilterTable fy = build_filter(sh, dh);
  std::vector<float> tmp(static_cast<size_t>(dw) * sh * 3);

  // horizontal pass, row-major
  for (int y = 0; y < sh; ++y) {
    const uint8_t* srow = src + static_cast<size_t>(y) * sw * 3;
    float* trow = tmp.data() + static_cast<size_t>(y) * dw * 3;
    for (int x = 0; x < dw; ++x) {
      const float* w = &fx.coef[static_cast<size_t>(x) * fx.max_len];
      const uint8_t* p = srow + fx.lo[x] * 3;
      float a0 = 0, a1 = 0, a2 = 0;
      for (int i = 0; i < fx.len[x]; ++i, p += 3) {
        const float ww = w[i];
        a0 += ww * p[0];
        a1 += ww * p[1];
        a2 += ww * p[2];
      }
      trow[x * 3 + 0] = a0;
      trow[x * 3 + 1] = a1;
      trow[x * 3 + 2] = a2;
    }
  }

  // vertical pass, row-major over output
  const size_t trow_stride = static_cast<size_t>(dw) * 3;
  for (int y = 0; y < dh; ++y) {
    const float* w = &fy.coef[static_cast<size_t>(y) * fy.max_len];
    const float* tbase = tmp.data() + static_cast<size_t>(fy.lo[y]) * trow_stride;
    uint8_t* drow = dst + static_cast<size_t>(y) * dw * 3;
    for (int xc = 0; xc < dw * 3; ++xc) {
      float acc = 0;
      const float* p = tbase + xc;
      for (int i = 0; i < fy.len[y]; ++i, p += trow_stride) acc += w[i] * *p;
      float v = acc + 0.5f;
      drow[xc] = v <= 0 ? 0 : (v >= 255 ? 255 : static_cast<uint8_t>(v));
    }
  }
}

int decode_resize_one(const unsigned char* data, long size, int out_size,
                      uint8_t* out) {
  std::vector<uint8_t> rgb;
  int w = 0, h = 0;
  if (decode_rgb(data, size, &rgb, &w, &h) != 0) return 1;
  if (w == out_size && h == out_size) {
    std::memcpy(out, rgb.data(), static_cast<size_t>(out_size) * out_size * 3);
    return 0;
  }
  resize_bilinear(rgb.data(), w, h, out, out_size, out_size);
  return 0;
}

}  // namespace

extern "C" {

// Single image: JPEG bytes -> uint8 RGB [out_size, out_size, 3].
int unimp_decode_resize(const unsigned char* data, long size, int out_size,
                        unsigned char* out) {
  return decode_resize_one(data, size, out_size, out);
}

// Batch: n images, `offsets[i]`..`offsets[i+1]` slices a flat byte blob;
// outputs are packed [n, out_size, out_size, 3]. Returns the number of
// failed decodes (their slots are zero-filled).
int unimp_decode_resize_batch(const unsigned char* blob, const long* offsets,
                              int n, int out_size, unsigned char* out,
                              int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::vector<int> failures(n_threads, 0);
  const size_t stride = static_cast<size_t>(out_size) * out_size * 3;
  auto work = [&](int tid) {
    for (int i = tid; i < n; i += n_threads) {
      const unsigned char* data = blob + offsets[i];
      const long size = offsets[i + 1] - offsets[i];
      uint8_t* dst = out + stride * i;
      if (decode_resize_one(data, size, out_size, dst) != 0) {
        std::memset(dst, 0, stride);
        failures[tid]++;
      }
    }
  };
  std::vector<std::thread> threads;
  for (int t = 1; t < n_threads; ++t) threads.emplace_back(work, t);
  work(0);
  for (auto& th : threads) th.join();
  int total = 0;
  for (int f : failures) total += f;
  return total;
}

}  // extern "C"
