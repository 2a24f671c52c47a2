// Native image pipeline — the data-loading counterpart of the mask
// runtime (rle_ops.cpp). Replaces the reference's torch-DataLoader
// worker processes (mmdet consumes mmcv/cv2 decode + resize inside
// fork workers; reference: mmdet/datasets/builder.py worker_init_fn,
// pipelines/loading.py LoadImageFromFile, transforms.py Resize/
// Normalize/Pad) with a GIL-free C++ thread pool: JPEG/PNG decode →
// keep-ratio bilinear resize → normalize → padded-canvas write, one
// call per batch.
//
// Build: g++ -O3 -shared -fPIC image_ops.cpp -ljpeg -lpng
// Loaded via ctypes (swindet_tpu/native/__init__.py); every entry
// point is plain C ABI. cv2 stays the fallback (SWINDET_NO_NATIVE).
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

// Decode a JPEG file to BGR u8 (cv2.IMREAD_COLOR layout). Returns 0 on
// success; *h/*w set. Grayscale is broadcast to 3 channels.
int decode_jpeg_impl(FILE* f, std::vector<uint8_t>& out, int64_t* h,
                     int64_t* w) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  const int64_t H = cinfo.output_height, W = cinfo.output_width;
  const int C = cinfo.output_components;  // 3 after JCS_RGB
  out.resize(H * W * 3);
  std::vector<uint8_t> row(W * C);
  uint8_t* rp = row.data();
  for (int64_t y = 0; y < H; ++y) {
    jpeg_read_scanlines(&cinfo, &rp, 1);
    uint8_t* dst = out.data() + y * W * 3;
    for (int64_t x = 0; x < W; ++x) {  // RGB → BGR
      dst[x * 3 + 0] = row[x * C + 2 % C];
      dst[x * 3 + 1] = row[x * C + 1 % C];
      dst[x * 3 + 2] = row[x * C + 0];
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  *h = H;
  *w = W;
  return 0;
}

// Decode a PNG file to BGR u8 via libpng's simplified API.
int decode_png_impl(const char* path, std::vector<uint8_t>& out,
                    int64_t* h, int64_t* w) {
  png_image img;
  std::memset(&img, 0, sizeof(img));
  img.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_file(&img, path)) return 1;
  img.format = PNG_FORMAT_BGR;
  out.resize(PNG_IMAGE_SIZE(img));
  if (!png_image_finish_read(&img, nullptr, out.data(), 0, nullptr)) {
    png_image_free(&img);
    return 1;
  }
  *h = img.height;
  *w = img.width;
  return 0;
}

int decode_any(const char* path, std::vector<uint8_t>& buf, int64_t* h,
               int64_t* w) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return 1;
  unsigned char magic[4] = {0, 0, 0, 0};
  size_t got = std::fread(magic, 1, 4, f);
  if (got >= 2 && magic[0] == 0xFF && magic[1] == 0xD8) {
    std::rewind(f);
    int rc = decode_jpeg_impl(f, buf, h, w);
    std::fclose(f);
    return rc;
  }
  std::fclose(f);
  if (got >= 4 && magic[0] == 0x89 && magic[1] == 'P') {
    return decode_png_impl(path, buf, h, w);
  }
  return 2;  // unsupported container → caller falls back to cv2
}

// Bilinear u8 resize, half-pixel centers (cv2 INTER_LINEAR geometry;
// float weights instead of cv2's 11-bit fixed point — ±1 LSB).
void resize_bilinear(const uint8_t* src, int64_t h, int64_t w,
                     uint8_t* dst, int64_t oh, int64_t ow) {
  const float sy = static_cast<float>(h) / oh;
  const float sx = static_cast<float>(w) / ow;
  std::vector<int64_t> x0s(ow), x1s(ow);
  std::vector<float> fxs(ow);
  for (int64_t x = 0; x < ow; ++x) {
    float xs = (x + 0.5f) * sx - 0.5f;
    if (xs < 0) xs = 0;
    int64_t x0 = static_cast<int64_t>(xs);
    if (x0 > w - 1) x0 = w - 1;
    x0s[x] = x0;
    x1s[x] = x0 + 1 < w ? x0 + 1 : w - 1;
    fxs[x] = xs - x0;
  }
  for (int64_t y = 0; y < oh; ++y) {
    float ys = (y + 0.5f) * sy - 0.5f;
    if (ys < 0) ys = 0;
    int64_t y0 = static_cast<int64_t>(ys);
    if (y0 > h - 1) y0 = h - 1;
    int64_t y1 = y0 + 1 < h ? y0 + 1 : h - 1;
    const float fy = ys - y0;
    const uint8_t* r0 = src + y0 * w * 3;
    const uint8_t* r1 = src + y1 * w * 3;
    uint8_t* dr = dst + y * ow * 3;
    for (int64_t x = 0; x < ow; ++x) {
      const int64_t a = x0s[x] * 3, b = x1s[x] * 3;
      const float fx = fxs[x];
      for (int c = 0; c < 3; ++c) {
        const float top = r0[a + c] + fx * (r0[b + c] - r0[a + c]);
        const float bot = r1[a + c] + fx * (r1[b + c] - r1[a + c]);
        float v = top + fy * (bot - top);
        dr[x * 3 + c] = static_cast<uint8_t>(v + 0.5f);
      }
    }
  }
}

// (img - mean) / std into a zero-padded float32 canvas; optional
// BGR→RGB swap (Normalize(to_rgb=True) semantics).
void normalize_into(const uint8_t* img, int64_t h, int64_t w,
                    float* canvas, int64_t ch, int64_t cw,
                    const float* mean, const float* stdv, int to_rgb) {
  const float inv0 = 1.0f / stdv[0], inv1 = 1.0f / stdv[1],
              inv2 = 1.0f / stdv[2];
  for (int64_t y = 0; y < h; ++y) {
    const uint8_t* r = img + y * w * 3;
    float* d = canvas + y * cw * 3;
    for (int64_t x = 0; x < w; ++x) {
      float b = r[x * 3 + 0], g = r[x * 3 + 1], rr = r[x * 3 + 2];
      if (to_rgb) {
        const float t = b;
        b = rr;
        rr = t;
      }
      d[x * 3 + 0] = (b - mean[0]) * inv0;
      d[x * 3 + 1] = (g - mean[1]) * inv1;
      d[x * 3 + 2] = (rr - mean[2]) * inv2;
    }
  }
}

}  // namespace

extern "C" {

// Decode one image file (JPEG/PNG) to BGR u8. out must hold cap bytes;
// returns 0 ok, 1 decode error, 2 unsupported format, 3 too large.
int image_decode(const char* path, uint8_t* out, int64_t cap,
                 int64_t* h, int64_t* w) {
  std::vector<uint8_t> buf;
  const int rc = decode_any(path, buf, h, w);
  if (rc) return rc;
  if (static_cast<int64_t>(buf.size()) > cap) return 3;
  std::memcpy(out, buf.data(), buf.size());
  return 0;
}

void image_resize_bilinear(const uint8_t* src, int64_t h, int64_t w,
                           uint8_t* dst, int64_t oh, int64_t ow) {
  resize_bilinear(src, h, w, dst, oh, ow);
}

// Batched keep-ratio test-pipeline: for each path decode → rescale so
// max(h,w)≤long_edge and min(h,w)≤short_edge (mmdet Resize keep_ratio
// semantics) → normalize(+to_rgb) → write into its (ch, cw, 3) canvas
// slot (zeroed). out_shapes[i] = (resized_h, resized_w);
// out_scales[i] = (w_scale, h_scale). A std::thread pool of `threads`
// workers processes samples GIL-free. Returns 0, or 1-based index of
// the first failed sample (its canvas slot stays zero).
int image_load_batch(const char** paths, int64_t n, float* out,
                     int64_t ch, int64_t cw, int64_t long_edge,
                     int64_t short_edge, const float* mean,
                     const float* stdv, int to_rgb, int64_t* out_shapes,
                     float* out_scales, int threads) {
  std::atomic<int64_t> next(0);
  std::atomic<int64_t> failed(0);
  std::memset(out, 0, sizeof(float) * n * ch * cw * 3);

  auto work = [&]() {
    std::vector<uint8_t> raw, resized;
    for (;;) {
      const int64_t i = next.fetch_add(1);
      if (i >= n) return;
      int64_t h = 0, w = 0;
      if (decode_any(paths[i], raw, &h, &w)) {
        int64_t expect = 0;
        failed.compare_exchange_strong(expect, i + 1);
        out_shapes[i * 2] = out_shapes[i * 2 + 1] = 0;
        out_scales[i * 2] = out_scales[i * 2 + 1] = 1.0f;
        continue;
      }
      const int64_t mx = h > w ? h : w, mn = h > w ? w : h;
      double scale = 1.0;
      if (long_edge > 0) {
        scale = std::fmin(static_cast<double>(long_edge) / mx,
                          static_cast<double>(short_edge) / mn);
      }
      // mmdet rescale: new = int(dim * scale + 0.5)
      int64_t oh = static_cast<int64_t>(h * scale + 0.5);
      int64_t ow = static_cast<int64_t>(w * scale + 0.5);
      if (oh > ch) oh = ch;
      if (ow > cw) ow = cw;
      resized.resize(oh * ow * 3);
      resize_bilinear(raw.data(), h, w, resized.data(), oh, ow);
      normalize_into(resized.data(), oh, ow, out + i * ch * cw * 3, ch,
                     cw, mean, stdv, to_rgb);
      out_shapes[i * 2] = oh;
      out_shapes[i * 2 + 1] = ow;
      out_scales[i * 2] = static_cast<float>(ow) / w;
      out_scales[i * 2 + 1] = static_cast<float>(oh) / h;
    }
  };

  if (threads <= 1 || n == 1) {
    work();
  } else {
    const int t = threads < n ? threads : static_cast<int>(n);
    std::vector<std::thread> pool;
    pool.reserve(t);
    for (int k = 0; k < t; ++k) pool.emplace_back(work);
    for (auto& th : pool) th.join();
  }
  return static_cast<int>(failed.load());
}

// Train-pipeline variant: per-sample (long, short) resize target +
// optional horizontal flip AFTER the resize (mmdet order:
// Resize -> RandomFlip -> Normalize -> Pad). Covers the mstrain /
// AutoAugment value-mode recipes: the host samples each image's scale
// branch and flip coin, this does the pixel work GIL-free.
int image_load_batch_train(const char** paths, int64_t n, float* out,
                           int64_t ch, int64_t cw,
                           const int64_t* long_edges,
                           const int64_t* short_edges,
                           const uint8_t* flips, const float* mean,
                           const float* stdv, int to_rgb,
                           int64_t* out_shapes, float* out_scales,
                           int threads) {
  std::atomic<int64_t> next(0);
  std::atomic<int64_t> failed(0);
  std::memset(out, 0, sizeof(float) * n * ch * cw * 3);

  auto work = [&]() {
    std::vector<uint8_t> raw, resized;
    for (;;) {
      const int64_t i = next.fetch_add(1);
      if (i >= n) return;
      int64_t h = 0, w = 0;
      if (decode_any(paths[i], raw, &h, &w)) {
        int64_t expect = 0;
        failed.compare_exchange_strong(expect, i + 1);
        out_shapes[i * 2] = out_shapes[i * 2 + 1] = 0;
        out_scales[i * 2] = out_scales[i * 2 + 1] = 1.0f;
        continue;
      }
      const int64_t le = long_edges[i], se = short_edges[i];
      const int64_t mx = h > w ? h : w, mn = h > w ? w : h;
      double scale = 1.0;
      if (le > 0) {
        scale = std::fmin(static_cast<double>(le) / mx,
                          static_cast<double>(se) / mn);
      }
      int64_t oh = static_cast<int64_t>(h * scale + 0.5);
      int64_t ow = static_cast<int64_t>(w * scale + 0.5);
      if (oh > ch) oh = ch;
      if (ow > cw) ow = cw;
      resized.resize(oh * ow * 3);
      resize_bilinear(raw.data(), h, w, resized.data(), oh, ow);
      if (flips[i]) {
        for (int64_t y = 0; y < oh; ++y) {
          uint8_t* row = resized.data() + y * ow * 3;
          for (int64_t x = 0; x < ow / 2; ++x) {
            for (int c = 0; c < 3; ++c) {
              std::swap(row[x * 3 + c], row[(ow - 1 - x) * 3 + c]);
            }
          }
        }
      }
      normalize_into(resized.data(), oh, ow, out + i * ch * cw * 3, ch,
                     cw, mean, stdv, to_rgb);
      out_shapes[i * 2] = oh;
      out_shapes[i * 2 + 1] = ow;
      out_scales[i * 2] = static_cast<float>(ow) / w;
      out_scales[i * 2 + 1] = static_cast<float>(oh) / h;
    }
  };

  if (threads <= 1 || n == 1) {
    work();
  } else {
    const int t = threads < n ? threads : static_cast<int>(n);
    std::vector<std::thread> pool;
    pool.reserve(t);
    for (int k = 0; k < t; ++k) pool.emplace_back(work);
    for (auto& th : pool) th.join();
  }
  return static_cast<int>(failed.load());
}

}  // extern "C"
