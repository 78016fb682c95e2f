// proben_io: native host-side data-loading core.
//
// TPU-native replacement for the reference's torch DataLoader C++ worker pool
// (detectron2/data/build.py DATALOADER.NUM_WORKERS forked workers): a
// std::thread pool that, per image, does JPEG decode (libjpeg), multimodal
// channel composition (BGR / BGRT / BGRTTT with RGB resized to the thermal
// frame, mirroring detection_utils.py:38-95), shortest-edge bilinear resize,
// and zero-padding into the caller's static (N, H, W, C) float32 canvas —
// everything the host must do before the batch ships to HBM.
//
// Exposed as a plain C API consumed via ctypes (no pybind11 in the image).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  int h = 0, w = 0, c = 0;
  std::vector<uint8_t> data;  // HWC
  bool ok() const { return h > 0 && w > 0 && !data.empty(); }
};

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jmp;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jmp, 1);
}

// Decode a JPEG file to 3-channel BGR (grayscale replicated).
Image decode_jpeg_bgr(const char* path) {
  Image out;
  FILE* f = fopen(path, "rb");
  if (!f) return out;

  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_error_exit;
  if (setjmp(jerr.jmp)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return Image();
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;  // force 3-channel
  jpeg_start_decompress(&cinfo);

  out.h = cinfo.output_height;
  out.w = cinfo.output_width;
  out.c = 3;
  out.data.resize(size_t(out.h) * out.w * 3);
  std::vector<uint8_t> row(size_t(out.w) * cinfo.output_components);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* rp = row.data();
    jpeg_read_scanlines(&cinfo, &rp, 1);
    uint8_t* dst = out.data.data() + size_t(cinfo.output_scanline - 1) * out.w * 3;
    // RGB -> BGR (cv2 convention the whole pipeline uses)
    for (int x = 0; x < out.w; x++) {
      dst[3 * x + 0] = row[3 * x + 2];
      dst[3 * x + 1] = row[3 * x + 1];
      dst[3 * x + 2] = row[3 * x + 0];
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return out;
}

// Bilinear resize uint8 HWC -> float32 HWC with half-pixel alignment
// (cv2.INTER_LINEAR mapping: src = (dst + 0.5) * scale - 0.5).
// Separable two-pass: a horizontal pass gathers 2 taps per output column into
// a float row cache, the vertical pass is a contiguous fused-multiply over
// whole rows (auto-vectorizes). ``dst_stride`` lets callers write straight
// into a padded canvas.
void resize_bilinear_strided(const uint8_t* src, int sh, int sw, int c,
                             float* dst, int dh, int dw, size_t dst_stride) {
  const float sy = float(sh) / dh;
  const float sx = float(sw) / dw;
  const int row_elems = dw * c;

  // precompute horizontal taps
  std::vector<int> x0(dw), x1(dw);
  std::vector<float> lx(dw);
  for (int x = 0; x < dw; x++) {
    float fx = (x + 0.5f) * sx - 0.5f;
    fx = std::min(std::max(fx, 0.0f), float(sw - 1));
    x0[x] = int(fx);
    x1[x] = std::min(x0[x] + 1, sw - 1);
    lx[x] = fx - x0[x];
  }

  // row cache: two horizontally-resized source rows
  std::vector<float> row_a(row_elems), row_b(row_elems);
  int cached_a = -1, cached_b = -1;

  auto hpass = [&](int sy_row, float* out) {
    const uint8_t* s = src + size_t(sy_row) * sw * c;
    for (int x = 0; x < dw; x++) {
      const uint8_t* p0 = s + size_t(x0[x]) * c;
      const uint8_t* p1 = s + size_t(x1[x]) * c;
      const float w1 = lx[x], w0 = 1.0f - w1;
      float* o = out + size_t(x) * c;
      for (int k = 0; k < c; k++) o[k] = p0[k] * w0 + p1[k] * w1;
    }
  };

  for (int y = 0; y < dh; y++) {
    float fy = (y + 0.5f) * sy - 0.5f;
    fy = std::min(std::max(fy, 0.0f), float(sh - 1));
    int y0 = int(fy);
    int y1 = std::min(y0 + 1, sh - 1);
    float ly = fy - y0;

    if (cached_a != y0) {
      if (cached_b == y0) {
        std::swap(row_a, row_b);
        std::swap(cached_a, cached_b);
      } else {
        hpass(y0, row_a.data());
        cached_a = y0;
      }
    }
    if (cached_b != y1) {
      hpass(y1, row_b.data());
      cached_b = y1;
    }
    float* d = dst + size_t(y) * dst_stride;
    const float* a = row_a.data();
    const float* b = row_b.data();
    const float w1 = ly, w0 = 1.0f - ly;
    for (int i = 0; i < row_elems; i++) d[i] = a[i] * w0 + b[i] * w1;
  }
}

void resize_bilinear(const uint8_t* src, int sh, int sw, int c, float* dst,
                     int dh, int dw) {
  resize_bilinear_strided(src, sh, sw, c, dst, dh, dw, size_t(dw) * c);
}

// uint8 HWC -> uint8 HWC resize (for RGB -> thermal-frame alignment).
void resize_bilinear_u8(const uint8_t* src, int sh, int sw, int c,
                        uint8_t* dst, int dh, int dw) {
  std::vector<float> tmp(size_t(dh) * dw * c);
  resize_bilinear(src, sh, sw, c, tmp.data(), dh, dw);
  for (size_t i = 0; i < tmp.size(); i++)
    dst[i] = uint8_t(std::min(std::max(tmp[i] + 0.5f, 0.0f), 255.0f));
}

void shortest_edge(int h, int w, int short_side, int max_size, int* nh, int* nw) {
  float scale = float(short_side) / std::min(h, w);
  float fh, fw;
  if (h < w) {
    fh = short_side;
    fw = scale * w;
  } else {
    fh = scale * h;
    fw = short_side;
  }
  if (std::max(fh, fw) > max_size) {
    float s = float(max_size) / std::max(fh, fw);
    fh *= s;
    fw *= s;
  }
  *nh = int(fh + 0.5f);
  *nw = int(fw + 0.5f);
}

enum Format { FMT_THERMAL_BGR = 0, FMT_RGB_BGR = 1, FMT_BGRT = 2, FMT_BGRTTT = 3 };

// Compose the multimodal HWC uint8 image for one sample.
Image compose(const char* thermal_path, const char* rgb_path, int format) {
  if (format == FMT_THERMAL_BGR) return decode_jpeg_bgr(thermal_path);
  if (format == FMT_RGB_BGR) return decode_jpeg_bgr(rgb_path);

  Image thermal = decode_jpeg_bgr(thermal_path);
  Image rgb = decode_jpeg_bgr(rgb_path);
  if (!thermal.ok() || !rgb.ok()) return Image();
  // RGB resized to the thermal frame (detection_utils.py:57,69)
  std::vector<uint8_t> rgb_rs(size_t(thermal.h) * thermal.w * 3);
  resize_bilinear_u8(rgb.data.data(), rgb.h, rgb.w, 3, rgb_rs.data(), thermal.h,
                     thermal.w);
  Image out;
  out.h = thermal.h;
  out.w = thermal.w;
  out.c = (format == FMT_BGRT) ? 4 : 6;
  out.data.resize(size_t(out.h) * out.w * out.c);
  for (size_t i = 0; i < size_t(out.h) * out.w; i++) {
    uint8_t* d = out.data.data() + i * out.c;
    memcpy(d, rgb_rs.data() + i * 3, 3);
    if (format == FMT_BGRT) {
      d[3] = thermal.data[i * 3];  // one thermal channel (B of BGR replica)
    } else {
      memcpy(d + 3, thermal.data.data() + i * 3, 3);
    }
  }
  return out;
}

}  // namespace

extern "C" {

// Load a batch of images into a static float32 canvas. Returns the number of
// failed samples (0 = success). Failed samples leave zeros + sizes 0.
int proben_load_batch(const char** thermal_paths, const char** rgb_paths, int n,
                      int format, int short_side, int max_size, int pad_h,
                      int pad_w, int channels, float* out_images,
                      int* out_sizes, int* out_orig, int num_threads) {
  std::atomic<int> failures{0};
  std::atomic<int> next{0};
  auto work = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      float* canvas = out_images + size_t(i) * pad_h * pad_w * channels;
      memset(canvas, 0, sizeof(float) * size_t(pad_h) * pad_w * channels);
      out_sizes[2 * i] = out_sizes[2 * i + 1] = 0;
      out_orig[2 * i] = out_orig[2 * i + 1] = 0;

      Image img = compose(thermal_paths[i], rgb_paths ? rgb_paths[i] : nullptr,
                          format);
      if (!img.ok() || img.c != channels) {
        failures++;
        continue;
      }
      int nh, nw;
      shortest_edge(img.h, img.w, short_side, max_size, &nh, &nw);
      if (nh > pad_h || nw > pad_w) {
        failures++;
        continue;
      }
      // resize directly into the padded canvas (strided rows)
      resize_bilinear_strided(img.data.data(), img.h, img.w, channels, canvas,
                              nh, nw, size_t(pad_w) * channels);
      out_sizes[2 * i] = nh;
      out_sizes[2 * i + 1] = nw;
      out_orig[2 * i] = img.h;
      out_orig[2 * i + 1] = img.w;
    }
  };
  int t = std::max(1, num_threads);
  std::vector<std::thread> pool;
  for (int k = 0; k < t; k++) pool.emplace_back(work);
  for (auto& th : pool) th.join();
  return failures.load();
}

// Single-image decode to a caller buffer (h*w*3 uint8 BGR). Returns 0 on
// success; query dimensions first with proben_jpeg_dims.
int proben_jpeg_dims(const char* path, int* h, int* w) {
  Image img = decode_jpeg_bgr(path);
  if (!img.ok()) return 1;
  *h = img.h;
  *w = img.w;
  return 0;
}

int proben_decode_jpeg(const char* path, uint8_t* out, int h, int w) {
  Image img = decode_jpeg_bgr(path);
  if (!img.ok() || img.h != h || img.w != w) return 1;
  memcpy(out, img.data.data(), img.data.size());
  return 0;
}
}
