// vtp_ingest — native image ingest pipeline: JPEG/PNG decode, PIL-style
// resampling (BOX / BILINEAR / BICUBIC), ADM center-crop, normalize,
// multithreaded batch assembly into a caller-provided float32 NCHW buffer.
//
// Role: the throughput-mode replacement for the reference's
// torchvision/PIL CPU ingest (tools/test_*_hf.py transforms,
// generation/tools/extract_features_vtp.py loaders). The eval-parity
// path stays on PIL (vtp_tpu/utils/image.py); this library reproduces
// PIL's resampling within 1 uint8 LSB (same filters and per-stage
// rounding; >=99.8% of pixels bit-exact — tests/test_native_ingest.py
// asserts the histogram). Measured single-core throughput matches PIL
// (1.05x, 384px noise JPEGs -> 256px ADM crop; PERF.md round 3) — the
// win over the reference's Python loop is the GIL-free thread pool
// (scales with cores; this build box exposes one) plus zero-copy
// batch assembly straight into the caller's NCHW buffer.
//
// Build: g++ -O3 -march=native -shared -fPIC ingest.cpp -ljpeg -lpng
// Exposed via ctypes (vtp_tpu/native/__init__.py).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <csetjmp>

namespace {

struct ImageU8 {
  int w = 0, h = 0;
  std::vector<uint8_t> rgb;  // h*w*3
};

// ------------------------------------------------------------- decode

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

bool decode_jpeg(const uint8_t* data, size_t len, ImageU8* out) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->rgb.resize(size_t(out->w) * out->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->rgb.data() + size_t(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

bool decode_png(const uint8_t* data, size_t len, ImageU8* out) {
  png_image img;
  memset(&img, 0, sizeof(img));
  img.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_memory(&img, data, len)) return false;
  img.format = PNG_FORMAT_RGB;
  out->w = img.width;
  out->h = img.height;
  out->rgb.resize(PNG_IMAGE_SIZE(img));
  if (!png_image_finish_read(&img, nullptr, out->rgb.data(), 0, nullptr)) {
    png_image_free(&img);
    return false;
  }
  return true;
}

bool read_file(const char* path, std::vector<uint8_t>* buf) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (n <= 0) {
    fclose(f);
    return false;
  }
  buf->resize(n);
  size_t got = fread(buf->data(), 1, n, f);
  fclose(f);
  return got == size_t(n);
}

bool decode_image(const char* path, ImageU8* out) {
  std::vector<uint8_t> buf;
  if (!read_file(path, &buf) || buf.size() < 8) return false;
  if (buf[0] == 0xFF && buf[1] == 0xD8) return decode_jpeg(buf.data(), buf.size(), out);
  if (buf[0] == 0x89 && buf[1] == 'P') return decode_png(buf.data(), buf.size(), out);
  // try jpeg then png as fallback
  return decode_jpeg(buf.data(), buf.size(), out) || decode_png(buf.data(), buf.size(), out);
}

// ----------------------------------------------------- PIL resampling

// PIL filter kernels (Pillow Resample.c)
double filter_box(double x) { return (x > -0.5 && x <= 0.5) ? 1.0 : 0.0; }
double filter_bilinear(double x) {
  x = std::abs(x);
  return x < 1.0 ? 1.0 - x : 0.0;
}
double filter_bicubic(double x) {
  constexpr double a = -0.5;
  x = std::abs(x);
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

struct Filter {
  double (*fn)(double);
  double support;
};

Filter get_filter(int id) {
  switch (id) {
    case 0: return {filter_box, 0.5};
    case 1: return {filter_bilinear, 1.0};
    default: return {filter_bicubic, 2.0};
  }
}

// Precompute horizontal/vertical coefficients exactly like PIL
// (ResampleHorizontal/precompute_coeffs): per output pixel, a window
// [xmin, xmax) of input pixels and normalized double weights.
struct Coeffs {
  std::vector<int> xmin, xsize;
  std::vector<double> k;  // ksize per output pixel
  int ksize = 0;
};

Coeffs precompute(int in_size, int out_size, const Filter& f) {
  Coeffs c;
  double scale = double(in_size) / out_size;
  double filterscale = std::max(scale, 1.0);
  double support = f.support * filterscale;
  int ksize = int(std::ceil(support)) * 2 + 1;
  c.ksize = ksize;
  c.xmin.resize(out_size);
  c.xsize.resize(out_size);
  c.k.assign(size_t(out_size) * ksize, 0.0);
  for (int xx = 0; xx < out_size; ++xx) {
    double center = (xx + 0.5) * scale;
    int xmin = int(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = int(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    double* kk = &c.k[size_t(xx) * ksize];
    double ww = 0.0;
    for (int x = xmin; x < xmax; ++x) {
      double w = f.fn((x - center + 0.5) / filterscale);
      kk[x - xmin] = w;
      ww += w;
    }
    if (ww != 0.0)
      for (int x = 0; x < xmax - xmin; ++x) kk[x] /= ww;
    c.xmin[xx] = xmin;
    c.xsize[xx] = xmax - xmin;
  }
  return c;
}

// Round-half-up + clamp. Exactly equivalent to lround+clamp after the
// [0,255] clamp (negatives truncate toward zero but clamp to 0 either
// way; positives round identically) — and it inlines to one cvt
// instruction instead of a libm call per output channel, which
// dominated the scalar resample (measured ~40% of single-thread time).
inline uint8_t clip8(float v) {
  int iv = int(v + 0.5f);
  return uint8_t(std::clamp(iv, 0, 255));
}

// Separable resize with per-stage rounding to uint8 (PIL semantics).
// float coefficients/accumulators: ~2x SIMD width over double and still
// ~2^9 more precise than PIL's own INT16 fixed-point path, so parity
// stays at the <=1-LSB tie cases (re-verified by the LSB-histogram
// test after this change).
ImageU8 resize(const ImageU8& src, int out_w, int out_h, int filter_id) {
  const Filter f = get_filter(filter_id);
  // horizontal pass
  ImageU8 tmp;
  tmp.w = out_w;
  tmp.h = src.h;
  tmp.rgb.resize(size_t(out_w) * src.h * 3);
  {
    Coeffs c = precompute(src.w, out_w, f);
    std::vector<float> kf(c.k.begin(), c.k.end());
    for (int y = 0; y < src.h; ++y) {
      const uint8_t* in_row = src.rgb.data() + size_t(y) * src.w * 3;
      uint8_t* out_row = tmp.rgb.data() + size_t(y) * out_w * 3;
      for (int xx = 0; xx < out_w; ++xx) {
        const float* kk = &kf[size_t(xx) * c.ksize];
        int xmin = c.xmin[xx], n = c.xsize[xx];
        float s0 = 0, s1 = 0, s2 = 0;
        for (int i = 0; i < n; ++i) {
          const uint8_t* p = in_row + size_t(xmin + i) * 3;
          s0 += p[0] * kk[i];
          s1 += p[1] * kk[i];
          s2 += p[2] * kk[i];
        }
        out_row[xx * 3 + 0] = clip8(s0);
        out_row[xx * 3 + 1] = clip8(s1);
        out_row[xx * 3 + 2] = clip8(s2);
      }
    }
  }
  // vertical pass (inner loop runs along contiguous x for a fixed tap
  // i, so the compiler vectorizes the 768-wide row MAC)
  ImageU8 out;
  out.w = out_w;
  out.h = out_h;
  out.rgb.resize(size_t(out_w) * out_h * 3);
  {
    Coeffs c = precompute(src.h, out_h, f);
    int row_elems = out_w * 3;
    std::vector<float> acc(row_elems);
    for (int yy = 0; yy < out_h; ++yy) {
      const double* kk = &c.k[size_t(yy) * c.ksize];
      int ymin = c.xmin[yy], n = c.xsize[yy];
      uint8_t* out_row = out.rgb.data() + size_t(yy) * out_w * 3;
      std::fill(acc.begin(), acc.end(), 0.0f);
      for (int i = 0; i < n; ++i) {
        const uint8_t* in_row = tmp.rgb.data() + size_t(ymin + i) * row_elems;
        float w = float(kk[i]);
        for (int x = 0; x < row_elems; ++x) acc[x] += in_row[x] * w;
      }
      for (int x = 0; x < row_elems; ++x) out_row[x] = clip8(acc[x]);
    }
  }
  return out;
}

// ADM center crop (vtp/utils/image_utils.py:5-32): BOX-halve while
// min >= 2*target, BICUBIC to scale, crop center.
ImageU8 adm_center_crop(ImageU8 img, int target) {
  while (std::min(img.w, img.h) >= 2 * target) {
    img = resize(img, img.w / 2, img.h / 2, /*box*/ 0);
  }
  double scale = double(target) / std::min(img.w, img.h);
  int nw = int(std::lround(img.w * scale));
  int nh = int(std::lround(img.h * scale));
  img = resize(img, nw, nh, /*bicubic*/ 2);
  int cx = (img.w - target) / 2;
  int cy = (img.h - target) / 2;
  ImageU8 out;
  out.w = target;
  out.h = target;
  out.rgb.resize(size_t(target) * target * 3);
  for (int y = 0; y < target; ++y)
    memcpy(out.rgb.data() + size_t(y) * target * 3,
           img.rgb.data() + (size_t(y + cy) * img.w + cx) * 3, size_t(target) * 3);
  return out;
}

// Resize short side to `resize_to` (bicubic) then center-crop target.
ImageU8 resize_center_crop(ImageU8 img, int resize_to, int target) {
  double scale = double(resize_to) / std::min(img.w, img.h);
  img = resize(img, int(std::lround(img.w * scale)), int(std::lround(img.h * scale)), 2);
  int cx = (img.w - target) / 2;
  int cy = (img.h - target) / 2;
  ImageU8 out;
  out.w = target;
  out.h = target;
  out.rgb.resize(size_t(target) * target * 3);
  for (int y = 0; y < target; ++y)
    memcpy(out.rgb.data() + size_t(y) * target * 3,
           img.rgb.data() + (size_t(std::max(y + cy, 0)) * img.w + std::max(cx, 0)) * 3,
           size_t(target) * 3);
  return out;
}

void to_chw_normalized(const ImageU8& img, float* out, const float* mean,
                       const float* std_, bool flip) {
  const int w = img.w, h = img.h;
  for (int ch = 0; ch < 3; ++ch) {
    const float m = mean[ch], inv = 1.0f / std_[ch];
    float* dst = out + size_t(ch) * w * h;
    for (int y = 0; y < h; ++y) {
      const uint8_t* row = img.rgb.data() + size_t(y) * w * 3 + ch;
      float* drow = dst + size_t(y) * w;
      if (flip) {
        for (int x = 0; x < w; ++x)
          drow[x] = (row[size_t(w - 1 - x) * 3] * (1.0f / 255.0f) - m) * inv;
      } else {
        for (int x = 0; x < w; ++x)
          drow[x] = (row[size_t(x) * 3] * (1.0f / 255.0f) - m) * inv;
      }
    }
  }
}

}  // namespace

extern "C" {

// mode: 0 = ADM center-crop(target), 1 = naive (target, target) bilinear
//       resize, 2 = resize short side to `aux` bicubic + center-crop target
int vtp_decode_one(const char* path, int target, int aux, int mode,
                   const float* mean, const float* std_, int flip, float* out) {
  ImageU8 img;
  if (!decode_image(path, &img) || img.w <= 0 || img.h <= 0) return 1;
  ImageU8 proc;
  switch (mode) {
    case 0: proc = adm_center_crop(std::move(img), target); break;
    case 1: proc = resize(img, target, target, /*bilinear*/ 1); break;
    case 2: proc = resize_center_crop(std::move(img), aux, target); break;
    default: return 2;
  }
  to_chw_normalized(proc, out, mean, std_, flip != 0);
  return 0;
}

// Batched, multithreaded. paths: n C strings. out: n*3*target*target floats.
// flips: n ints (may be null). Returns number of failed decodes.
int vtp_ingest_batch(const char** paths, int n, int target, int aux, int mode,
                     const float* mean, const float* std_, const int* flips,
                     float* out, int num_threads) {
  std::atomic<int> next(0), failures(0);
  const size_t stride = size_t(3) * target * target;
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      int flip = flips ? flips[i] : 0;
      if (vtp_decode_one(paths[i], target, aux, mode, mean, std_, flip,
                         out + stride * i) != 0) {
        failures.fetch_add(1);
        memset(out + stride * i, 0, stride * sizeof(float));
      }
    }
  };
  int nt = std::max(1, std::min(num_threads, n));
  std::vector<std::thread> threads;
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failures.load();
}

}  // extern "C"
