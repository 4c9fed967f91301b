// mmtrk: native data runtime for the TPU tracking framework.
//
// The reference framework's host-side runtime is torch's C++ DataLoader
// workers + libturbojpeg (lib/train/data/image_loader.py, loader.py); this
// library is its TPU-framework equivalent: threaded JPEG decode, JET
// pseudo-colour mapping, and the cv2-parity square crop (sample_target,
// lib/train/data/processing_utils.py:15-83) — the per-sample host work that
// feeds device batches. Exposed through a plain C ABI for ctypes.
//
// Build: native/Makefile (links libjpeg). The JET LUT header is generated
// from multi_modal_tracking_tpu/ops/_jet_lut.py so Python and C++ share one
// source of truth.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <csetjmp>

#include "jet_lut.h"   // generated: const uint8_t JET_LUT_BGR[256][3]

extern "C" {

// ---------------------------------------------------------------- JPEG decode

struct mmtrk_jpeg_error_mgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

static void mmtrk_jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<mmtrk_jpeg_error_mgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode a JPEG file into caller-allocated RGB buffer (cap_h x cap_w x 3).
// Returns 0 on success and writes (h, w); non-zero on failure.
int mmtrk_decode_jpeg_file(const char* path, uint8_t* out, int cap_h,
                           int cap_w, int* h, int* w) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;

  jpeg_decompress_struct cinfo;
  mmtrk_jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = mmtrk_jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return 2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);

  const int H = static_cast<int>(cinfo.output_height);
  const int W = static_cast<int>(cinfo.output_width);
  if (H > cap_h || W > cap_w || cinfo.output_components != 3) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return 3;
  }
  std::vector<uint8_t> row(static_cast<size_t>(W) * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* rp = row.data();
    jpeg_read_scanlines(&cinfo, &rp, 1);
    // Row stride is cap_w (the caller's buffer pitch), not W.
    std::memcpy(out + static_cast<size_t>(cinfo.output_scanline - 1) * cap_w * 3,
                row.data(), static_cast<size_t>(W) * 3);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  *h = H;
  *w = W;
  return 0;
}

// Threaded batch decode: n files into one (n, cap_h, cap_w, 3) buffer
// (rows beyond each image's extent are left untouched). hs/ws receive the
// per-image sizes; rc[i] the per-image status. Worker threads replace the
// reference's DataLoader worker processes.
void mmtrk_decode_jpeg_batch(const char** paths, int n, uint8_t* out,
                             int cap_h, int cap_w, int* hs, int* ws, int* rc,
                             int num_threads) {
  std::atomic<int> next(0);
  auto work = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) return;
      rc[i] = mmtrk_decode_jpeg_file(
          paths[i], out + static_cast<size_t>(i) * cap_h * cap_w * 3, cap_h,
          cap_w, &hs[i], &ws[i]);
    }
  };
  const int t = std::max(1, num_threads);
  std::vector<std::thread> pool;
  pool.reserve(t - 1);
  for (int k = 1; k < t; ++k) pool.emplace_back(work);
  work();
  for (auto& th : pool) th.join();
}

// ------------------------------------------------------------------- JET LUT

// uint8 (H, W) grayscale or (H, W, 3) BGR -> (H, W, 3) JET-mapped.
// 3-channel inputs are reduced with cv2's BGR2GRAY 15-bit fixed point
// (channel order BGR, matching the reference's cv2 pipeline and
// ops/colormap.apply_jet_np): (9798 c2 + 19235 c1 + 3735 c0 + 16384) >> 15.
// out_bgr selects cv2 byte layout (BGR, as the reference stores) or RGB.
void mmtrk_apply_jet(const uint8_t* src, int h, int w, int channels,
                     uint8_t* dst, int out_bgr) {
  const size_t n = static_cast<size_t>(h) * w;
  for (size_t p = 0; p < n; ++p) {
    int idx;
    if (channels == 3) {
      const uint8_t c0 = src[p * 3 + 0], c1 = src[p * 3 + 1], c2 = src[p * 3 + 2];
      idx = (9798 * c2 + 19235 * c1 + 3735 * c0 + 16384) >> 15;
    } else {
      idx = src[p];
    }
    const uint8_t* e = JET_LUT_BGR[idx];
    if (out_bgr) {
      dst[p * 3 + 0] = e[0];
      dst[p * 3 + 1] = e[1];
      dst[p * 3 + 2] = e[2];
    } else {
      dst[p * 3 + 0] = e[2];
      dst[p * 3 + 1] = e[1];
      dst[p * 3 + 2] = e[0];
    }
  }
}

// ------------------------------------------------- sample_target (crop+resize)

// Square crop of side ceil(sqrt(w*h)*factor) centred (integer-rounded) on
// box, zero-padded outside the image, bilinearly resized to out_sz x out_sz
// (half-pixel centres, float accumulate, round-to-nearest). Semantics of
// lib/train/data/processing_utils.py:15-83 including the x2-W+1 padding
// quirk. mask_out (optional, may be null) receives the resized pad mask.
// Returns the resize factor (out_sz / crop_sz), or 0 on error.
double mmtrk_sample_target(const uint8_t* img, int H, int W, int C,
                           double bx, double by, double bw, double bh,
                           double factor, int out_sz, uint8_t* crop_out,
                           uint8_t* mask_out) {
  const double crop_szf = std::ceil(std::sqrt(bw * bh) * factor);
  if (crop_szf < 1 || C < 1 || C > 4) return 0.0;
  const long crop_sz = static_cast<long>(crop_szf);

  // python round() = round-half-to-even
  const double cx = bx + 0.5 * bw - crop_szf * 0.5;
  const double cy = by + 0.5 * bh - crop_szf * 0.5;
  const long x1 = std::lround(std::nearbyint(cx));
  const long y1 = std::lround(std::nearbyint(cy));

  const long vx0 = std::max(x1, 0L);
  const long vy0 = std::max(y1, 0L);
  const long vx1 = std::min(x1 + crop_sz, static_cast<long>(W) - 1);  // excl
  const long vy1 = std::min(y1 + crop_sz, static_cast<long>(H) - 1);

  const double scale = static_cast<double>(crop_sz) / out_sz;
  for (int oy = 0; oy < out_sz; ++oy) {
    double sy = (oy + 0.5) * scale - 0.5;                  // crop coords
    sy = std::min(std::max(sy, 0.0), crop_szf - 1.0);
    const long sy0 = static_cast<long>(std::floor(sy));
    const double fy = sy - sy0;
    for (int ox = 0; ox < out_sz; ++ox) {
      double sx = (ox + 0.5) * scale - 0.5;
      sx = std::min(std::max(sx, 0.0), crop_szf - 1.0);
      const long sx0 = static_cast<long>(std::floor(sx));
      const double fx = sx - sx0;

      const long ys[2] = {y1 + sy0, y1 + sy0 + 1};
      const long xs[2] = {x1 + sx0, x1 + sx0 + 1};
      const double wy[2] = {1.0 - fy, fy};
      const double wx[2] = {1.0 - fx, fx};

      double acc[4] = {0, 0, 0, 0};
      double mask_acc = 0.0;
      for (int a = 0; a < 2; ++a) {
        for (int b = 0; b < 2; ++b) {
          const double wgt = wy[a] * wx[b];
          if (wgt == 0.0) continue;
          const long yy = ys[a], xx = xs[b];
          const bool valid = yy >= vy0 && yy < vy1 && xx >= vx0 && xx < vx1;
          if (valid) {
            const uint8_t* px = img + (static_cast<size_t>(yy) * W + xx) * C;
            for (int c = 0; c < C; ++c) acc[c] += wgt * px[c];
          } else {
            mask_acc += wgt;   // padded region contributes mask weight
          }
        }
      }
      uint8_t* po = crop_out + (static_cast<size_t>(oy) * out_sz + ox) * C;
      for (int c = 0; c < C; ++c)
        po[c] = static_cast<uint8_t>(
            std::min(std::max(acc[c] + 0.5, 0.0), 255.0));
      // python parity: cv2.resize(mask).astype(bool) -> ANY nonzero
      // interpolated pad weight marks the pixel as padded.
      if (mask_out)
        mask_out[static_cast<size_t>(oy) * out_sz + ox] =
            mask_acc > 0.0 ? 1 : 0;
    }
  }
  return static_cast<double>(out_sz) / crop_sz;
}

}  // extern "C"
