// Native runtime components (C++17; libpng/zlib when available).
//
// TPU-native equivalents of the reference's native code (SURVEY.md §2.7):
//  * box NMS + OKS keypoint NMS  — replaces the PoseHRNet Cython/CUDA NMS
//    (reference models/pose_estimator/lib/nms/{cpu_nms.pyx,nms_kernel.cu});
//  * .npy optical-flow loader with fused bilinear resize + magnitude stats —
//    the input pipeline's per-sample hot loop (reference loads with np.load
//    then torch interpolate, data/base_dataset.py:650-692);
//  * fused PNG decode + RGB + bilinear resize and a single-pass clip color
//    jitter — the loader's two hottest legs (64% of per-item time in the
//    r4 profile; reference decodes via cv2.imread + torchvision ColorJitter,
//    data/base_dataset.py:694-721).
//
// Exposed as a C ABI consumed via ctypes (ipoke_tpu/ops/native.py).
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#if __has_include(<png.h>)
#define IPOKE_HAVE_PNG 1
#include <png.h>
#endif

extern "C" {

// ---------------------------------------------------------------------------
// Standard box NMS.  boxes: (n, 4) [x1, y1, x2, y2]; returns kept indices
// (sorted by descending score) in `keep`, count in *n_keep.
// ---------------------------------------------------------------------------
void nms_boxes(const float* boxes, const float* scores, int n,
               float iou_thresh, int* keep, int* n_keep) {
  std::vector<int> order(n);
  for (int i = 0; i < n; ++i) order[i] = i;
  std::sort(order.begin(), order.end(),
            [&](int a, int b) { return scores[a] > scores[b]; });
  std::vector<char> suppressed(n, 0);
  int m = 0;
  for (int oi = 0; oi < n; ++oi) {
    int i = order[oi];
    if (suppressed[i]) continue;
    keep[m++] = i;
    const float* bi = boxes + 4 * i;
    float area_i = std::max(0.f, bi[2] - bi[0]) * std::max(0.f, bi[3] - bi[1]);
    for (int oj = oi + 1; oj < n; ++oj) {
      int j = order[oj];
      if (suppressed[j]) continue;
      const float* bj = boxes + 4 * j;
      float xx1 = std::max(bi[0], bj[0]);
      float yy1 = std::max(bi[1], bj[1]);
      float xx2 = std::min(bi[2], bj[2]);
      float yy2 = std::min(bi[3], bj[3]);
      float inter = std::max(0.f, xx2 - xx1) * std::max(0.f, yy2 - yy1);
      float area_j =
          std::max(0.f, bj[2] - bj[0]) * std::max(0.f, bj[3] - bj[1]);
      float iou = inter / (area_i + area_j - inter + 1e-10f);
      if (iou > iou_thresh) suppressed[j] = 1;
    }
  }
  *n_keep = m;
}

// ---------------------------------------------------------------------------
// OKS (object-keypoint-similarity) NMS for pose estimates.
// kps: (n, k, 3) [x, y, vis]; areas: (n,); standard COCO sigmas are used
// when `sigmas` is null.  Greedy suppression at oks > thresh.
// ---------------------------------------------------------------------------
static const float kCocoSigmas[17] = {
    0.026f, 0.025f, 0.025f, 0.035f, 0.035f, 0.079f, 0.079f, 0.072f, 0.072f,
    0.062f, 0.062f, 0.107f, 0.107f, 0.087f, 0.087f, 0.089f, 0.089f};

static float oks(const float* a, const float* b, int k, float area,
                 const float* sigmas) {
  float sum = 0.f;
  int cnt = 0;
  for (int i = 0; i < k; ++i) {
    float s = sigmas ? sigmas[i] : kCocoSigmas[i % 17];
    float dx = a[3 * i] - b[3 * i];
    float dy = a[3 * i + 1] - b[3 * i + 1];
    float e = (dx * dx + dy * dy) / (2.f * area * (2.f * s) * (2.f * s) + 1e-10f);
    sum += std::exp(-e);
    ++cnt;
  }
  return cnt ? sum / cnt : 0.f;
}

void nms_oks(const float* kps, const float* scores, const float* areas, int n,
             int k, const float* sigmas, float thresh, int* keep,
             int* n_keep) {
  std::vector<int> order(n);
  for (int i = 0; i < n; ++i) order[i] = i;
  std::sort(order.begin(), order.end(),
            [&](int a, int b) { return scores[a] > scores[b]; });
  std::vector<char> suppressed(n, 0);
  int m = 0;
  for (int oi = 0; oi < n; ++oi) {
    int i = order[oi];
    if (suppressed[i]) continue;
    keep[m++] = i;
    for (int oj = oi + 1; oj < n; ++oj) {
      int j = order[oj];
      if (suppressed[j]) continue;
      float o = oks(kps + 3 * k * i, kps + 3 * k * j, k, areas[i], sigmas);
      if (o > thresh) suppressed[j] = 1;
    }
  }
  *n_keep = m;
}

// ---------------------------------------------------------------------------
// Minimal .npy reader for C-contiguous float32 arrays (v1/v2 headers).
// Returns 0 on success; fills shape[0..2] and writes data to *out_data via
// caller-provided buffer of capacity `cap` floats (call with cap=0 to query
// the element count through *n_elems).
// ---------------------------------------------------------------------------
static int parse_npy_header(FILE* f, std::vector<long>* shape) {
  unsigned char magic[8];
  if (fread(magic, 1, 8, f) != 8) return 1;
  if (memcmp(magic, "\x93NUMPY", 6) != 0) return 2;
  int major = magic[6];
  uint32_t hlen = 0;
  if (major == 1) {
    uint16_t h16;
    if (fread(&h16, 2, 1, f) != 1) return 3;
    hlen = h16;
  } else {
    if (fread(&hlen, 4, 1, f) != 1) return 3;
  }
  std::string header(hlen, '\0');
  if (fread(&header[0], 1, hlen, f) != hlen) return 4;
  if (header.find("'<f4'") == std::string::npos &&
      header.find("'|f4'") == std::string::npos)
    return 5;  // only float32 supported
  if (header.find("'fortran_order': True") != std::string::npos) return 6;
  auto p = header.find("'shape':");
  if (p == std::string::npos) return 7;
  p = header.find('(', p);
  auto e = header.find(')', p);
  std::string dims = header.substr(p + 1, e - p - 1);
  long val = 0;
  bool have = false;
  for (char c : dims) {
    if (c >= '0' && c <= '9') {
      val = val * 10 + (c - '0');
      have = true;
    } else if (have) {
      shape->push_back(val);
      val = 0;
      have = false;
    }
  }
  if (have) shape->push_back(val);
  return 0;
}

// Load a (2, H, W) float32 .npy flow file and bilinear-resize to
// (out_h, out_w, 2) interleaved (HWC), optionally rescaling magnitudes by
// out_h / H (the reference's scale_poke_to_res).  Returns 0 on success.
int load_flow_npy(const char* path, float* out, int out_h, int out_w,
                  int scale_to_res) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  std::vector<long> shape;
  int rc = parse_npy_header(f, &shape);
  if (rc != 0 || shape.size() != 3 || shape[0] != 2) {
    fclose(f);
    return rc ? rc : 8;
  }
  long H = shape[1], W = shape[2];
  std::vector<float> raw(2 * H * W);
  size_t got = fread(raw.data(), sizeof(float), raw.size(), f);
  fclose(f);
  if (got != raw.size()) return 9;

  float mag_scale = scale_to_res ? (float)out_h / (float)H : 1.0f;
  float sy = (float)H / out_h, sx = (float)W / out_w;
  for (int y = 0; y < out_h; ++y) {
    // align_corners=False-style sampling (cv2.resize INTER_LINEAR)
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = (int)std::floor(fy);
    float wy = fy - y0;
    int y0c = std::min(std::max(y0, 0), (int)H - 1);
    int y1c = std::min(y0 + 1, (int)H - 1);
    for (int x = 0; x < out_w; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = (int)std::floor(fx);
      float wx = fx - x0;
      int x0c = std::min(std::max(x0, 0), (int)W - 1);
      int x1c = std::min(x0 + 1, (int)W - 1);
      for (int c = 0; c < 2; ++c) {
        const float* ch = raw.data() + c * H * W;
        float v00 = ch[y0c * W + x0c], v01 = ch[y0c * W + x1c];
        float v10 = ch[y1c * W + x0c], v11 = ch[y1c * W + x1c];
        float v = (1 - wy) * ((1 - wx) * v00 + wx * v01) +
                  wy * ((1 - wx) * v10 + wx * v11);
        out[(y * out_w + x) * 2 + c] = v * mag_scale;
      }
    }
  }
  return 0;
}

// Amplitude statistics over the margin-cropped flow field — the poke
// simulator's per-sample hot computation.  flow: (h, w, 2) interleaved.
void flow_amplitude_stats(const float* flow, int h, int w, int margin,
                          float* out_mean, float* out_std, float* out_min,
                          float* out_max) {
  double sum = 0, sum2 = 0;
  float mn = 1e30f, mx = -1e30f;
  long cnt = 0;
  for (int y = margin; y < h - margin; ++y) {
    for (int x = margin; x < w - margin; ++x) {
      float fx = flow[(y * w + x) * 2];
      float fy = flow[(y * w + x) * 2 + 1];
      float a = std::sqrt(fx * fx + fy * fy);
      mn = std::min(mn, a);
      mx = std::max(mx, a);
      sum += a;
      sum2 += (double)a * a;
      ++cnt;
    }
  }
  // stats of the min/max-NORMALIZED amplitude (reference base_dataset.py:514)
  float range = mx - mn;
  if (range <= 0) range = 1.f;
  double nsum = (sum - cnt * (double)mn) / range;
  double nsum2 = (sum2 - 2 * mn * sum + (double)cnt * mn * mn) /
                 ((double)range * range);
  double mean = cnt ? nsum / cnt : 0.0;
  double var = cnt ? std::max(0.0, nsum2 / cnt - mean * mean) : 0.0;
  *out_mean = (float)mean;
  *out_std = (float)std::sqrt(var);
  *out_min = mn;
  *out_max = mx;
}

// ---------------------------------------------------------------------------
// Fused PNG decode -> RGB8 -> bilinear resize (half-pixel centers, the
// cv2.resize INTER_LINEAR convention).  Replaces the loader's
// cv2.imread + cvtColor(BGR2RGB) + cv2.resize triple pass (three full-image
// buffers) with one decode + one resampling pass.  Returns 0 on success;
// any non-zero return makes the Python caller fall back to cv2.
// ---------------------------------------------------------------------------
static void resize_bilinear_u8(const unsigned char* src, int H, int W,
                               unsigned char* dst, int out_h, int out_w,
                               int ch) {
  if (H == out_h && W == out_w) {
    memcpy(dst, src, (size_t)H * W * ch);
    return;
  }
  float sy = (float)H / out_h, sx = (float)W / out_w;
  std::vector<int> x0s(out_w), x1s(out_w);
  std::vector<float> wxs(out_w);
  for (int x = 0; x < out_w; ++x) {
    float fx = (x + 0.5f) * sx - 0.5f;
    int x0 = (int)std::floor(fx);
    wxs[x] = fx - x0;
    x0s[x] = std::min(std::max(x0, 0), W - 1);
    x1s[x] = std::min(x0 + 1, W - 1);
  }
  for (int y = 0; y < out_h; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = (int)std::floor(fy);
    float wy = fy - y0;
    const unsigned char* r0 =
        src + (size_t)std::min(std::max(y0, 0), H - 1) * W * ch;
    const unsigned char* r1 = src + (size_t)std::min(y0 + 1, H - 1) * W * ch;
    unsigned char* drow = dst + (size_t)y * out_w * ch;
    for (int x = 0; x < out_w; ++x) {
      float wx = wxs[x];
      int o0 = x0s[x] * ch, o1 = x1s[x] * ch;
      for (int c = 0; c < ch; ++c) {
        float top = (1 - wx) * r0[o0 + c] + wx * r0[o1 + c];
        float bot = (1 - wx) * r1[o0 + c] + wx * r1[o1 + c];
        float v = (1 - wy) * top + wy * bot;
        drow[x * ch + c] = (unsigned char)(v + 0.5f);
      }
    }
  }
}

int decode_png_rgb_resize(const char* path, unsigned char* out, int out_h,
                          int out_w) {
#ifndef IPOKE_HAVE_PNG
  (void)path; (void)out; (void)out_h; (void)out_w;
  return -100;  // built without libpng: caller falls back to cv2
#else
  png_image image;
  memset(&image, 0, sizeof image);
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_file(&image, path)) return 1;
  image.format = PNG_FORMAT_RGB;
  std::vector<unsigned char> buf;
  try {
    buf.resize(PNG_IMAGE_SIZE(image));
  } catch (...) {
    png_image_free(&image);
    return 2;
  }
  if (!png_image_finish_read(&image, nullptr, buf.data(), 0, nullptr)) {
    png_image_free(&image);
    return 3;
  }
  resize_bilinear_u8(buf.data(), image.height, image.width, out, out_h,
                     out_w, 3);
  return 0;
#endif
}

// ---------------------------------------------------------------------------
// Single-pass clip color jitter, cv2-compatible semantics — fuses the Python
// path's four passes (LUT write, RGB->HSV float, jitter, HSV->RGB) and its
// two full-clip intermediates into one in-place loop over the (T, H, W, 3)
// uint8 clip.  Matches ipoke_tpu/data/augment.py _ColorTransform.apply_clip:
//  * brightness+contrast: per-frame 256-entry LUT whose pivot is the frame
//    mean of the float brightness map (histogram-weighted);
//  * hue/saturation: OpenCV uint8 RGB2HSV (fixed-point, H in [0,180)),
//    float jitter h=(h+hue*180)%180 / s=clip(s*sat), truncation to uint8
//    (numpy astype), OpenCV HSV2RGB.
// The OpenCV integer HSV tables are reproduced exactly (hsv_shift=12,
// round-half-even table entries), so the fused loop is bit-compatible with
// the cv2-based Python path (verified pixelwise in tests/test_native_ops.py).
// ---------------------------------------------------------------------------
static inline int rhe(double v) {  // round half to even, like cvRound
  return (int)std::lrint(v);
}

struct HsvTables {  // OpenCV's fixed-point div tables (hsv_shift = 12)
  int sdiv[256];
  int hdiv[256];
  HsvTables() {
    sdiv[0] = hdiv[0] = 0;
    for (int i = 1; i < 256; ++i) {
      sdiv[i] = rhe((255 << 12) / (1.0 * i));
      hdiv[i] = rhe((180 << 12) / (6.0 * i));
    }
  }
};

static void rgb2hsv_u8(int r, int g, int b, int* h8, int* s8, int* v8) {
  // magic static: thread-safe one-time init under the loader's worker threads
  static const HsvTables tabs;
  const int* sdiv = tabs.sdiv;
  const int* hdiv = tabs.hdiv;
  int v = std::max(r, std::max(g, b));
  int vmin = std::min(r, std::min(g, b));
  int diff = v - vmin;
  int s = (diff * sdiv[v] + (1 << 11)) >> 12;
  int h;
  if (v == r)
    h = (g - b) * hdiv[diff];
  else if (v == g)
    h = ((b - r) + 2 * diff) * hdiv[diff];
  else
    h = ((r - g) + 4 * diff) * hdiv[diff];
  h = (h + (1 << 11)) >> 12;
  if (h < 0) h += 180;
  *h8 = h;
  *s8 = s;
  *v8 = v;
}

static void hsv2rgb_u8(int h8, int s8, int v8, unsigned char* r,
                       unsigned char* g, unsigned char* b) {
  if (s8 == 0) {
    *r = *g = *b = (unsigned char)v8;
    return;
  }
  // cv2's uint8 HSV2RGB TRUNCATES the result (empirically: floor, with
  // exact-integer cases resolved by its higher-precision internals); double
  // precision here keeps float epsilon from flipping floor() at integers
  double hf = h8 * (6.0 / 180.0), s = s8 * (1.0 / 255.0), v = (double)v8;
  int sector = (int)std::floor(hf);
  double f = hf - sector;
  if (sector < 0 || sector >= 6) sector = 0;
  double tab[4] = {v, v * (1 - s), v * (1 - s * f), v * (1 - s * (1 - f))};
  // OpenCV sector_data, (b, g, r) tab indices per sector
  static const int sd[6][3] = {{1, 3, 0}, {1, 0, 2}, {3, 0, 1},
                               {0, 2, 1}, {0, 1, 3}, {2, 1, 0}};
  auto sat = [](double x) {
    int i = (int)x;  // truncation, like cv2's u8 path
    return (unsigned char)(i < 0 ? 0 : (i > 255 ? 255 : i));
  };
  *b = sat(tab[sd[sector][0]]);
  *g = sat(tab[sd[sector][1]]);
  *r = sat(tab[sd[sector][2]]);
}

// `hue_off` is the PRE-SCALED hue offset in cv2 H units (the Python caller
// computes hue*180 in float64 then rounds to f32, matching numpy's scalar
// promotion — computing it here from an f32 hue lands on the other side of
// truncation boundaries).
int color_jitter_clip(unsigned char* clip, int t, int h, int w, float bright,
                      float contrast, float hue_off, float sat) {
  const long npix = (long)h * w * 3;  // per-frame values incl. channels
  bool do_bc = (bright != 1.0f || contrast != 1.0f);
  bool do_hs = (hue_off != 0.0f || sat != 1.0f);
  if (!do_bc && !do_hs) return 0;

  float lut_b[256];
  for (int i = 0; i < 256; ++i) {
    float v = i * bright;
    lut_b[i] = v < 0.f ? 0.f : (v > 255.f ? 255.f : v);
  }
  for (int fi = 0; fi < t; ++fi) {
    unsigned char* frame = clip + (size_t)fi * npix;
    unsigned char lut[256];
    if (do_bc) {
      long hist[256] = {0};
      for (long i = 0; i < npix; ++i) ++hist[frame[i]];
      double acc = 0;
      for (int i = 0; i < 256; ++i) acc += (double)hist[i] * (double)lut_b[i];
      float mean = (float)(acc / npix);
      for (int i = 0; i < 256; ++i) {
        float v = (lut_b[i] - mean) * contrast + mean;
        v = v < 0.f ? 0.f : (v > 255.f ? 255.f : v);
        lut[i] = (unsigned char)v;  // truncation, like numpy astype(uint8)
      }
    } else {
      for (int i = 0; i < 256; ++i) lut[i] = (unsigned char)i;
    }
    if (!do_hs) {
      for (long i = 0; i < npix; ++i) frame[i] = lut[frame[i]];
      continue;
    }
    for (long p = 0; p < npix; p += 3) {
      int r = lut[frame[p]], g = lut[frame[p + 1]], b = lut[frame[p + 2]];
      int h8, s8, v8;
      rgb2hsv_u8(r, g, b, &h8, &s8, &v8);
      // float jitter + numpy-style uint8 truncation
      float hf = std::fmod((float)h8 + hue_off, 180.0f);
      if (hf < 0) hf += 180.0f;
      float sf = (float)s8 * sat;
      sf = sf < 0.f ? 0.f : (sf > 255.f ? 255.f : sf);
      hsv2rgb_u8((int)hf, (int)sf, v8, frame + p, frame + p + 1,
                 frame + p + 2);
    }
  }
  return 0;
}

}  // extern "C"
