// Native runtime components (C++17, no external deps).
//
// TPU-native equivalents of the reference's native code (SURVEY.md §2.7):
//  * box NMS + OKS keypoint NMS  — replaces the PoseHRNet Cython/CUDA NMS
//    (reference models/pose_estimator/lib/nms/{cpu_nms.pyx,nms_kernel.cu});
//  * .npy optical-flow loader with fused bilinear resize + magnitude stats —
//    the input pipeline's per-sample hot loop (reference loads with np.load
//    then torch interpolate, data/base_dataset.py:650-692).
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

}  // extern "C"
