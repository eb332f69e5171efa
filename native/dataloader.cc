// Native data-loading runtime: threaded JPEG decode + bilinear resize +
// BGR-float canvas fill.
//
// TPU-native counterpart of the torch DataLoader C++ worker pool the reference
// relies on (SURVEY.md §3.5 "DataLoader worker procs"): the Python host loop
// hands a batch of file paths to `prepare_batch`, which decodes and resizes in
// a std::thread pool and writes directly into the caller's pinned numpy
// buffers, so the GIL is released for the whole batch.
//
// Exposed C ABI (consumed via ctypes from unit_tpu/data/native.py):
//   decode_image_size(path, &h, &w)            -> 0 on success
//   prepare_batch(paths, n, min_size, max_size, canvas_h, canvas_w,
//                 out_images, out_sizes, out_scales, n_threads) -> #errors

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Shared scanline loop once a source manager is attached. Returns false on
// failure (longjmp target must be set by the caller's setjmp).
bool ReadJpegRows(jpeg_decompress_struct* cinfo,
                  std::vector<unsigned char>* out, int* h, int* w) {
  jpeg_read_header(cinfo, TRUE);
  cinfo->out_color_space = JCS_RGB;
  jpeg_start_decompress(cinfo);
  *w = cinfo->output_width;
  *h = cinfo->output_height;
  out->resize(static_cast<size_t>(*h) * (*w) * 3);
  while (cinfo->output_scanline < cinfo->output_height) {
    unsigned char* row = out->data() +
                         static_cast<size_t>(cinfo->output_scanline) * (*w) * 3;
    jpeg_read_scanlines(cinfo, &row, 1);
  }
  jpeg_finish_decompress(cinfo);
  return true;
}

// Decode a JPEG file to interleaved RGB uint8. Returns false on failure.
bool DecodeJpeg(const char* path, std::vector<unsigned char>* out, int* h,
                int* w) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  bool ok = ReadJpegRows(&cinfo, out, h, w);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return ok;
}

// Decode an in-memory JPEG buffer (the serving path: request bytes never
// touch disk). Returns false on failure.
bool DecodeJpegMem(const unsigned char* data, size_t len,
                   std::vector<unsigned char>* out, int* h, int* w) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(data),
               static_cast<unsigned long>(len));
  bool ok = ReadJpegRows(&cinfo, out, h, w);
  jpeg_destroy_decompress(&cinfo);
  return ok;
}

// Bilinear resize RGB uint8 -> BGR float32, written into a (canvas_h, canvas_w,
// 3) zero-padded canvas.
void ResizeToCanvas(const unsigned char* src, int sh, int sw, float* canvas,
                    int canvas_h, int canvas_w, int nh, int nw,
                    bool flip = false) {
  const float sy = static_cast<float>(sh) / nh;
  const float sx = static_cast<float>(sw) / nw;
  for (int y = 0; y < nh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    fy = std::max(fy, 0.0f);
    int y0 = static_cast<int>(fy);
    y0 = std::min(y0, sh - 1);
    int y1 = std::min(y0 + 1, sh - 1);
    float wy = fy - y0;
    float* dst_row = canvas + static_cast<size_t>(y) * canvas_w * 3;
    const unsigned char* r0 = src + static_cast<size_t>(y0) * sw * 3;
    const unsigned char* r1 = src + static_cast<size_t>(y1) * sw * 3;
    for (int x = 0; x < nw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      fx = std::max(fx, 0.0f);
      int x0 = static_cast<int>(fx);
      x0 = std::min(x0, sw - 1);
      int x1 = std::min(x0 + 1, sw - 1);
      float wx = fx - x0;
      // horizontal flip within the resized region (matches the Python
      // img[:, ::-1] applied after resize, before the canvas pad)
      const int dx = flip ? (nw - 1 - x) : x;
      for (int c = 0; c < 3; ++c) {
        float top = r0[x0 * 3 + c] * (1 - wx) + r0[x1 * 3 + c] * wx;
        float bot = r1[x0 * 3 + c] * (1 - wx) + r1[x1 * 3 + c] * wx;
        // RGB -> BGR channel swap (INPUT.FORMAT=BGR, caffe-style means)
        dst_row[dx * 3 + (2 - c)] = top * (1 - wy) + bot * wy;
      }
    }
  }
}

}  // namespace

extern "C" {

int decode_image_size(const char* path, int* h, int* w) {
  std::vector<unsigned char> buf;
  return DecodeJpeg(path, &buf, h, w) ? 0 : 1;
}

// Header-only dims probe for an in-memory JPEG (no pixel decode): the server
// uses this to pick the portrait/landscape canvas before prepare_image_mem.
int decode_image_size_mem(const unsigned char* data, long len, int* h,
                          int* w) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(data),
               static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  *h = static_cast<int>(cinfo.image_height);
  *w = static_cast<int>(cinfo.image_width);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Single-image full prep (train-path variant of prepare_batch): per-image
// min_size (the train pipeline samples one per record) and an optional
// horizontal flip, all inside one GIL-free call.
// out_image: [canvas_h, canvas_w, 3] float32; out_size: [2]; out_scale: [1].

// Resized dims matching the Python fallback exactly (transforms.py
// resize_shortest_edge): double-precision scale and round-half-to-even
// (Python round()), so the native and PIL paths agree on every image.
static void ResizedDims(int h, int w, int min_size, int max_size, int canvas_h,
                        int canvas_w, int* nh, int* nw, float* scale_out) {
  double scale = static_cast<double>(min_size) / std::min(h, w);
  if (std::max(h, w) * scale > max_size) {
    scale = static_cast<double>(max_size) / std::max(h, w);
  }
  *nh = std::max(std::min(static_cast<int>(std::nearbyint(h * scale)), canvas_h), 1);
  *nw = std::max(std::min(static_cast<int>(std::nearbyint(w * scale)), canvas_w), 1);
  *scale_out = static_cast<float>(scale);
}

int prepare_image(const char* path, int min_size, int max_size, int canvas_h,
                  int canvas_w, int flip, float* out_image, float* out_size,
                  float* out_scale) {
  const size_t img_elems = static_cast<size_t>(canvas_h) * canvas_w * 3;
  std::memset(out_image, 0, img_elems * sizeof(float));
  std::vector<unsigned char> rgb;
  int h = 0, w = 0;
  if (!DecodeJpeg(path, &rgb, &h, &w)) {
    out_size[0] = out_size[1] = 0;
    out_scale[0] = 1.0f;
    return 1;
  }
  float scale;
  int nh, nw;
  ResizedDims(h, w, min_size, max_size, canvas_h, canvas_w, &nh, &nw, &scale);
  ResizeToCanvas(rgb.data(), h, w, out_image, canvas_h, canvas_w, nh, nw,
                 flip != 0);
  out_size[0] = static_cast<float>(nh);
  out_size[1] = static_cast<float>(nw);
  out_scale[0] = scale;
  return 0;
}

// Serving-path variant of prepare_image: decode REQUEST BYTES in memory
// (GIL-free, no temp file). Additionally reports the original image dims
// (out_orig [2] = h, w) which the server needs to map boxes back to the
// client's frame.
int prepare_image_mem(const unsigned char* data, long len, int min_size,
                      int max_size, int canvas_h, int canvas_w, int flip,
                      float* out_image, float* out_size, float* out_scale,
                      float* out_orig) {
  const size_t img_elems = static_cast<size_t>(canvas_h) * canvas_w * 3;
  std::memset(out_image, 0, img_elems * sizeof(float));
  std::vector<unsigned char> rgb;
  int h = 0, w = 0;
  if (!DecodeJpegMem(data, static_cast<size_t>(len), &rgb, &h, &w)) {
    out_size[0] = out_size[1] = 0;
    out_scale[0] = 1.0f;
    out_orig[0] = out_orig[1] = 0;
    return 1;
  }
  float scale;
  int nh, nw;
  ResizedDims(h, w, min_size, max_size, canvas_h, canvas_w, &nh, &nw, &scale);
  ResizeToCanvas(rgb.data(), h, w, out_image, canvas_h, canvas_w, nh, nw,
                 flip != 0);
  out_size[0] = static_cast<float>(nh);
  out_size[1] = static_cast<float>(nw);
  out_scale[0] = scale;
  out_orig[0] = static_cast<float>(h);
  out_orig[1] = static_cast<float>(w);
  return 0;
}

// out_images: [n, canvas_h, canvas_w, 3] float32 zeroed by caller or here.
// out_sizes:  [n, 2] float32 (new_h, new_w); out_scales: [n] float32.
int prepare_batch(const char** paths, int n, int min_size, int max_size,
                  int canvas_h, int canvas_w, float* out_images,
                  float* out_sizes, float* out_scales, int n_threads) {
  std::atomic<int> errors{0};
  std::atomic<int> next{0};
  const size_t img_stride = static_cast<size_t>(canvas_h) * canvas_w * 3;

  auto worker = [&]() {
    std::vector<unsigned char> rgb;
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      int h = 0, w = 0;
      float* canvas = out_images + i * img_stride;
      std::memset(canvas, 0, img_stride * sizeof(float));
      if (!DecodeJpeg(paths[i], &rgb, &h, &w)) {
        errors.fetch_add(1);
        out_sizes[i * 2] = 0;
        out_sizes[i * 2 + 1] = 0;
        out_scales[i] = 1.0f;
        continue;
      }
      float scale;
      int nh, nw;
      ResizedDims(h, w, min_size, max_size, canvas_h, canvas_w, &nh, &nw, &scale);
      ResizeToCanvas(rgb.data(), h, w, canvas, canvas_h, canvas_w, nh, nw);
      out_sizes[i * 2] = static_cast<float>(nh);
      out_sizes[i * 2 + 1] = static_cast<float>(nw);
      out_scales[i] = scale;
    }
  };

  int threads = std::max(1, std::min(n_threads, n));
  std::vector<std::thread> pool;
  pool.reserve(threads);
  for (int t = 0; t < threads; ++t) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
  return errors.load();
}

}  // extern "C"
