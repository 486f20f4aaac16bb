// pyvisim_tpu native image loader.
//
// Multithreaded JPEG decode (+ optional bilinear resize) feeding the TPU
// input pipeline — the native-runtime replacement for the reference's
// serial cv2.imread host loop (reference: pyvisim/encoders/_base_encoder.py:357,
// pyvisim/datasets/datasets.py:281). Built on libjpeg; exposed to Python
// via ctypes (pyvisim_tpu/io/_loader.py).
//
// Build: python tools/build_native.py
//
// C ABI:
//   int pvs_decode_batch(const char** paths, int n, int target_h,
//                        int target_w, uint8_t* out, int* out_h,
//                        int* out_w, int n_threads);
//   * target_h == -1 : probe only — write native dims to out_h/out_w
//                      (out may be NULL).
//   * target_h  >  0 : decode every image, bilinear-resize to
//                      (target_h, target_w), write RGB8 into
//                      out[i * target_h*target_w*3]; native dims are also
//                      reported.
//   Returns 0 on success, otherwise the number of failed images.

#include <atomic>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include <jpeglib.h>

namespace {

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode one JPEG file to tightly-packed RGB8. Returns true on success.
bool decode_jpeg(const char* path, std::vector<uint8_t>* pixels, int* h,
                 int* w, bool header_only) {
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
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;  // grayscale/CMYK sources -> RGB

  if (header_only) {
    *h = static_cast<int>(cinfo.image_height);
    *w = static_cast<int>(cinfo.image_width);
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return true;
  }

  jpeg_start_decompress(&cinfo);
  *h = static_cast<int>(cinfo.output_height);
  *w = static_cast<int>(cinfo.output_width);
  const int stride = *w * 3;
  pixels->resize(static_cast<size_t>(*h) * stride);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = pixels->data() + static_cast<size_t>(cinfo.output_scanline) * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

// Bilinear resize RGB8 (src_h, src_w) -> (dst_h, dst_w), half-pixel centers
// (matches cv2.INTER_LINEAR geometry).
void resize_bilinear(const uint8_t* src, int src_h, int src_w, uint8_t* dst,
                     int dst_h, int dst_w) {
  if (src_h == dst_h && src_w == dst_w) {
    memcpy(dst, src, static_cast<size_t>(src_h) * src_w * 3);
    return;
  }
  const float sy = static_cast<float>(src_h) / dst_h;
  const float sx = static_cast<float>(src_w) / dst_w;
  for (int y = 0; y < dst_h; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    if (fy < 0) fy = 0;
    int y0 = static_cast<int>(fy);
    int y1 = y0 + 1 < src_h ? y0 + 1 : src_h - 1;
    const float wy = fy - y0;
    for (int x = 0; x < dst_w; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      if (fx < 0) fx = 0;
      int x0 = static_cast<int>(fx);
      int x1 = x0 + 1 < src_w ? x0 + 1 : src_w - 1;
      const float wx = fx - x0;
      const uint8_t* p00 = src + (static_cast<size_t>(y0) * src_w + x0) * 3;
      const uint8_t* p01 = src + (static_cast<size_t>(y0) * src_w + x1) * 3;
      const uint8_t* p10 = src + (static_cast<size_t>(y1) * src_w + x0) * 3;
      const uint8_t* p11 = src + (static_cast<size_t>(y1) * src_w + x1) * 3;
      uint8_t* o = dst + (static_cast<size_t>(y) * dst_w + x) * 3;
      for (int c = 0; c < 3; ++c) {
        const float top = p00[c] + (p01[c] - p00[c]) * wx;
        const float bot = p10[c] + (p11[c] - p10[c]) * wx;
        o[c] = static_cast<uint8_t>(top + (bot - top) * wy + 0.5f);
      }
    }
  }
}

}  // namespace

extern "C" int pvs_decode_batch(const char** paths, int n, int target_h,
                                int target_w, uint8_t* out, int* out_h,
                                int* out_w, int n_threads) {
  if (n <= 0) return 0;
  const bool header_only = target_h < 0;
  std::atomic<int> next(0);
  std::atomic<int> failures(0);
  const size_t out_stride =
      header_only ? 0 : static_cast<size_t>(target_h) * target_w * 3;

  auto worker = [&]() {
    std::vector<uint8_t> pixels;
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) break;
      int h = 0, w = 0;
      if (!decode_jpeg(paths[i], &pixels, &h, &w, header_only)) {
        failures.fetch_add(1);
        if (out_h) out_h[i] = 0;
        if (out_w) out_w[i] = 0;
        continue;
      }
      if (out_h) out_h[i] = h;
      if (out_w) out_w[i] = w;
      if (!header_only && out) {
        resize_bilinear(pixels.data(), h, w, out + out_stride * i, target_h,
                        target_w);
      }
    }
  };

  int threads = n_threads > 0 ? n_threads : 1;
  if (threads > n) threads = n;
  if (threads == 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    pool.reserve(threads);
    for (int t = 0; t < threads; ++t) pool.emplace_back(worker);
    for (auto& t : pool) t.join();
  }
  return failures.load();
}
