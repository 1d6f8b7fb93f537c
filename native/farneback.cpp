// Farnebäck dense optical flow — native C++ implementation.
//
// The production host-side backend for the metrics engine's flow stage,
// replacing the reference's OpenCV dependency
// (reference experiments/06_measure_grid_search.py:176-187). Same algorithm
// and numerics as the validated numpy reference (vdx/metrics/farneback.py):
// quadratic polynomial expansion with Gaussian applicability, iterative
// displacement estimation with box-filtered normal equations, image pyramid
// with per-level Gaussian smoothing (incl. the sigma<=0 small-kernel table)
// and bilinear resize.
//
// Exported C ABI: vdx_farneback_flow(prev, curr, H, W, pyr_scale, levels,
// winsize, iterations, poly_n, poly_sigma, out_flow[H*W*2]) -> 0 on success.
//
// Build: native/build.sh  ->  native/build/libvdxflow.so

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <ctime>
#include <vector>
#include <algorithm>

namespace {

// Optional phase profiling: set VDX_FLOW_PROFILE=1 to print a per-call
// phase breakdown to stderr (used by scripts/bench_farneback.py).
struct PhaseProf {
  bool on;
  double t[8] = {0};  // convert, blur, resize, polyexp, updmat, boxflow, up
  PhaseProf() : on(std::getenv("VDX_FLOW_PROFILE") != nullptr) {}
  static double now() {
    struct timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    return ts.tv_sec + ts.tv_nsec * 1e-9;
  }
  void dump() const {
    if (!on) return;
    std::fprintf(stderr,
                 "[vdxflow] convert %.1f blur %.1f resize %.1f polyexp %.1f "
                 "updmat %.1f boxflow %.1f upsample %.1f ms\n",
                 t[0] * 1e3, t[1] * 1e3, t[2] * 1e3, t[3] * 1e3, t[4] * 1e3,
                 t[5] * 1e3, t[6] * 1e3);
  }
};

using std::vector;

struct Image {
  int h = 0, w = 0, c = 1;
  vector<float> data;
  Image() = default;
  Image(int h_, int w_, int c_ = 1) : h(h_), w(w_), c(c_), data((size_t)h_ * w_ * c_, 0.f) {}
  float* row(int y) { return data.data() + (size_t)y * w * c; }
  const float* row(int y) const { return data.data() + (size_t)y * w * c; }
  float& at(int y, int x, int ch = 0) { return data[((size_t)y * w + x) * c + ch]; }
  float at(int y, int x, int ch = 0) const { return data[((size_t)y * w + x) * c + ch]; }
};

// ---------------------------------------------------------------- correlate
// Separable 1D correlation with replicate ("nearest") border, kernel indexed
// k = -n..n (length 2n+1).
void correlate_axis0(const Image& src, const vector<float>& kern, Image& dst) {
  int n = ((int)kern.size() - 1) / 2;
  dst = Image(src.h, src.w, src.c);
#pragma omp parallel for schedule(static)
  for (int y = 0; y < src.h; y++) {
    for (int k = -n; k <= n; k++) {
      int yy = std::min(std::max(y + k, 0), src.h - 1);
      float wk = kern[k + n];
      const float* s = src.row(yy);
      float* d = dst.row(y);
      int len = src.w * src.c;
      for (int i = 0; i < len; i++) d[i] += wk * s[i];
    }
  }
}

void correlate_axis1(const Image& src, const vector<float>& kern, Image& dst) {
  // k-outer / x-inner with interior fast path: contiguous SIMD-friendly adds.
  int n = ((int)kern.size() - 1) / 2;
  int W = src.w, C = src.c;
  dst = Image(src.h, W, C);
#pragma omp parallel for schedule(static)
  for (int y = 0; y < src.h; y++) {
    const float* s = src.row(y);
    float* d = dst.row(y);
    for (int k = -n; k <= n; k++) {
      float wk = kern[k + n];
      // interior: x in [max(0,-k), min(W, W-k))
      int x0 = std::max(0, -k), x1 = std::min(W, W - k);
      const float* sp = s + (size_t)(x0 + k) * C;
      float* dp = d + (size_t)x0 * C;
      int len = (x1 - x0) * C;
      for (int i = 0; i < len; i++) dp[i] += wk * sp[i];
      // borders (replicate)
      for (int x = 0; x < x0; x++)
        for (int ch = 0; ch < C; ch++) d[(size_t)x * C + ch] += wk * s[ch];
      for (int x = x1; x < W; x++)
        for (int ch = 0; ch < C; ch++)
          d[(size_t)x * C + ch] += wk * s[(size_t)(W - 1) * C + ch];
    }
  }
}

// Running-sum box filter with replicate border (both axes), O(1)/pixel.
void box_filter_axis0(const Image& src, int winsize, Image& dst) {
  int n = (winsize - 1) / 2, H = src.h, len = src.w * src.c;
  dst = Image(src.h, src.w, src.c);
  vector<float> acc(len, 0.f);
  // initial window for row 0: rows [-n, n] clamped
  for (int k = -n; k <= n; k++) {
    const float* s = src.row(std::min(std::max(k, 0), H - 1));
    for (int i = 0; i < len; i++) acc[i] += s[i];
  }
  std::memcpy(dst.row(0), acc.data(), sizeof(float) * len);
  for (int y = 1; y < H; y++) {
    const float* add = src.row(std::min(y + n, H - 1));
    const float* sub = src.row(std::max(y - n - 1, 0));
    for (int i = 0; i < len; i++) acc[i] += add[i] - sub[i];
    std::memcpy(dst.row(y), acc.data(), sizeof(float) * len);
  }
}

void box_filter_axis1(const Image& src, int winsize, Image& dst) {
  int n = (winsize - 1) / 2, W = src.w, C = src.c;
  dst = Image(src.h, W, C);
#pragma omp parallel for schedule(static)
  for (int y = 0; y < src.h; y++) {
    vector<float> acc(C);
    const float* s = src.row(y);
    float* d = dst.row(y);
    for (int ch = 0; ch < C; ch++) acc[ch] = 0.f;
    for (int k = -n; k <= n; k++) {
      const float* sp = s + (size_t)std::min(std::max(k, 0), W - 1) * C;
      for (int ch = 0; ch < C; ch++) acc[ch] += sp[ch];
    }
    for (int ch = 0; ch < C; ch++) d[ch] = acc[ch];
    for (int x = 1; x < W; x++) {
      const float* add = s + (size_t)std::min(x + n, W - 1) * C;
      const float* sub = s + (size_t)std::max(x - n - 1, 0) * C;
      for (int ch = 0; ch < C; ch++) acc[ch] += add[ch] - sub[ch];
      float* dp = d + (size_t)x * C;
      for (int ch = 0; ch < C; ch++) dp[ch] = acc[ch];
    }
  }
}

// Mirror (REFLECT_101) border variant for Gaussian pre-smoothing.
int mirror_idx(int i, int n) {
  if (n == 1) return 0;
  while (i < 0 || i >= n) {
    if (i < 0) i = -i;
    if (i >= n) i = 2 * (n - 1) - i;
  }
  return i;
}

void correlate_axis0_mirror(const Image& src, const vector<float>& kern, Image& dst) {
  int n = ((int)kern.size() - 1) / 2;
  dst = Image(src.h, src.w, src.c);
  for (int y = 0; y < src.h; y++) {
    for (int k = -n; k <= n; k++) {
      int yy = mirror_idx(y + k, src.h);
      float wk = kern[k + n];
      const float* s = src.row(yy);
      float* d = dst.row(y);
      int len = src.w * src.c;
      for (int i = 0; i < len; i++) d[i] += wk * s[i];
    }
  }
}

void correlate_axis1_mirror(const Image& src, const vector<float>& kern, Image& dst) {
  // k-outer with an interior fast path (no mirror lookups, contiguous
  // SIMD-friendly adds); borders keep the per-tap mirror. Accumulation
  // order per pixel is k-ascending in both paths — numerics unchanged.
  int n = ((int)kern.size() - 1) / 2, W = src.w;
  dst = Image(src.h, W, src.c);
  for (int y = 0; y < src.h; y++) {
    const float* s = src.row(y);
    float* d = dst.row(y);
    for (int k = -n; k <= n; k++) {
      float wk = kern[k + n];
      int x0 = std::max(0, -k), x1 = std::min(W, W - k);
      const float* sp = s + (size_t)(x0 + k);
      float* dp = d + (size_t)x0;
      int len = x1 - x0;
      for (int i = 0; i < len; i++) dp[i] += wk * sp[i];
      for (int x = 0; x < x0; x++) d[x] += wk * s[mirror_idx(x + k, W)];
      for (int x = x1; x < W; x++) d[x] += wk * s[mirror_idx(x + k, W)];
    }
  }
}

// ------------------------------------------------------------- gaussian prep
struct PolyGaussian {
  vector<float> g, xg, xxg;
  double ig11, ig03, ig33, ig55;
};

PolyGaussian prepare_gaussian(int n, double sigma) {
  if (sigma < 1e-7) sigma = n * 0.3;
  int len = 2 * n + 1;
  vector<double> gd(len);
  double s = 0;
  for (int i = -n; i <= n; i++) {
    gd[i + n] = std::exp(-(double)i * i / (2 * sigma * sigma));
    s += gd[i + n];
  }
  for (auto& v : gd) v /= s;

  PolyGaussian pg;
  pg.g.resize(len);
  pg.xg.resize(len);
  pg.xxg.resize(len);
  for (int i = -n; i <= n; i++) {
    pg.g[i + n] = (float)gd[i + n];
    pg.xg[i + n] = (float)(i * gd[i + n]);
    pg.xxg[i + n] = (float)((double)i * i * gd[i + n]);
  }

  // Gram matrix for basis [1, x, y, x^2, y^2, xy]; invert the 3x3 coupled
  // block {1, x^2, y^2} analytically-via-Gauss plus the diagonal entries.
  double m0 = 0, m2 = 0, m4 = 0, m22 = 0;
  for (int y = -n; y <= n; y++)
    for (int x = -n; x <= n; x++) {
      double w = gd[y + n] * gd[x + n];
      m0 += w;
      m2 += w * x * x;
      m4 += w * (double)x * x * x * x;
      m22 += w * (double)x * x * y * y;
    }
  // G = [[m0, m2, m2], [m2, m4, m22], [m2, m22, m4]] over (1, x^2, y^2);
  // diag entries G11=G22=m2 (x,y), G55=m22 (xy).
  double A[3][4] = {
      {m0, m2, m2, 1},
      {m2, m4, m22, 0},
      {m2, m22, m4, 0},
  };
  // Solve G * col = e1 to get first column of inverse (gives ig00?, ig03).
  // We need invG[0][3] (= entry coupling 1 and x^2) and invG[3][3].
  // Use full 3x3 inversion.
  double det = m0 * (m4 * m4 - m22 * m22) - m2 * (m2 * m4 - m22 * m2) +
               m2 * (m2 * m22 - m4 * m2);
  (void)A;
  double inv00 = (m4 * m4 - m22 * m22) / det;
  double inv01 = -(m2 * m4 - m2 * m22) / det;
  double inv11 = (m0 * m4 - m2 * m2) / det;
  (void)inv00;
  pg.ig11 = 1.0 / m2;
  pg.ig03 = inv01;
  pg.ig33 = inv11;
  pg.ig55 = 1.0 / m22;
  return pg;
}

// ------------------------------------------------------------------ polyExp
// Row-streaming fusion of the separable correlations: per output row, the
// three vertical passes (g, xg, xxg) land in L1-resident row buffers, the
// six horizontal passes and the normal-equation assembly run over those
// buffers in the same sweep. Accumulation order per pixel is k-ascending in
// both axes — bit-identical to the unfused nine-pass formulation (the
// original layout the numpy reference vdx/metrics/farneback.py still uses).
void poly_exp(const Image& img, int n, double sigma, Image& R) {
  PolyGaussian pg = prepare_gaussian(n, sigma);
  int H = img.h, W = img.w;
  R = Image(H, W, 5);

  // horizontal correlation with replicate border, k-outer interior fast path
  auto hcorr = [&](const float* s, const float* kern, float* d) {
    for (int i = 0; i < W; i++) d[i] = 0.f;
    for (int k = -n; k <= n; k++) {
      float wk = kern[k + n];
      int x0 = std::max(0, -k), x1 = std::min(W, W - k);
      const float* sp = s + (x0 + k);
      float* dp = d + x0;
      int len = x1 - x0;
      for (int i = 0; i < len; i++) dp[i] += wk * sp[i];
      for (int x = 0; x < x0; x++) d[x] += wk * s[0];
      for (int x = x1; x < W; x++) d[x] += wk * s[W - 1];
    }
  };

  vector<float> buf((size_t)9 * W);
  float* b0 = buf.data();          // img ⊛ g   (axis 0)
  float* b1 = b0 + W;              // img ⊛ xg
  float* b2 = b1 + W;              // img ⊛ xxg
  float* s_g = b2 + W;
  float* s_x = s_g + W;
  float* s_xx = s_x + W;
  float* s_y = s_xx + W;
  float* s_xy = s_y + W;
  float* s_yy = s_xy + W;

  for (int y = 0; y < H; y++) {
    for (int i = 0; i < 3 * W; i++) b0[i] = 0.f;
    for (int k = -n; k <= n; k++) {
      const float* s = img.row(std::min(std::max(y + k, 0), H - 1));
      float wg = pg.g[k + n], wx = pg.xg[k + n], wxx = pg.xxg[k + n];
      for (int i = 0; i < W; i++) {
        float v = s[i];
        b0[i] += wg * v;
        b1[i] += wx * v;
        b2[i] += wxx * v;
      }
    }
    hcorr(b0, pg.g.data(), s_g);
    hcorr(b0, pg.xg.data(), s_x);
    hcorr(b0, pg.xxg.data(), s_xx);
    hcorr(b1, pg.g.data(), s_y);
    hcorr(b1, pg.xg.data(), s_xy);
    hcorr(b2, pg.g.data(), s_yy);

    float* r = R.row(y);
    for (int x = 0; x < W; x++) {
      r[x * 5 + 0] = (float)(s_x[x] * pg.ig11);
      r[x * 5 + 1] = (float)(s_y[x] * pg.ig11);
      r[x * 5 + 2] = (float)(s_g[x] * pg.ig03 + s_xx[x] * pg.ig33);
      r[x * 5 + 3] = (float)(s_g[x] * pg.ig03 + s_yy[x] * pg.ig33);
      r[x * 5 + 4] = (float)(s_xy[x] * pg.ig55);
    }
  }
}

// ------------------------------------------------------------ update matrices
const float kBorderW[5] = {0.14f, 0.14f, 0.4472f, 0.4472f, 0.4472f};

void update_matrices(const Image& R0, const Image& R1, const Image& flow, Image& M) {
  int H = flow.h, W = flow.w;
  M = Image(H, W, 5);
  int nbx = std::min(5, W / 2), nby = std::min(5, H / 2);
#pragma omp parallel for schedule(static)
  for (int y = 0; y < H; y++) {
    float wy = 1.f;
    if (y < nby) wy *= kBorderW[y];
    if (y >= H - nby) wy *= kBorderW[H - y - 1];
    for (int x = 0; x < W; x++) {
      float dx = flow.at(y, x, 0), dy = flow.at(y, x, 1);
      float fx = x + dx, fy = y + dy;
      int x1 = (int)std::floor(fx), y1 = (int)std::floor(fy);
      fx -= x1;
      fy -= y1;
      float r2, r3, r4, r5, r6;
      if (x1 >= 0 && x1 < W - 1 && y1 >= 0 && y1 < H - 1) {
        float a00 = (1 - fx) * (1 - fy), a01 = fx * (1 - fy),
              a10 = (1 - fx) * fy, a11 = fx * fy;
        const float* p00 = &R1.data[((size_t)y1 * W + x1) * 5];
        const float* p01 = p00 + 5;
        const float* p10 = p00 + (size_t)W * 5;
        const float* p11 = p10 + 5;
        r2 = a00 * p00[0] + a01 * p01[0] + a10 * p10[0] + a11 * p11[0];
        r3 = a00 * p00[1] + a01 * p01[1] + a10 * p10[1] + a11 * p11[1];
        r4 = a00 * p00[2] + a01 * p01[2] + a10 * p10[2] + a11 * p11[2];
        r5 = a00 * p00[3] + a01 * p01[3] + a10 * p10[3] + a11 * p11[3];
        r6 = a00 * p00[4] + a01 * p01[4] + a10 * p10[4] + a11 * p11[4];
        r4 = (R0.at(y, x, 2) + r4) * 0.5f;
        r5 = (R0.at(y, x, 3) + r5) * 0.5f;
        r6 = (R0.at(y, x, 4) + r6) * 0.25f;
      } else {
        r2 = r3 = 0.f;
        r4 = R0.at(y, x, 2);
        r5 = R0.at(y, x, 3);
        r6 = R0.at(y, x, 4) * 0.5f;
      }
      r2 = (R0.at(y, x, 0) - r2) * 0.5f;
      r3 = (R0.at(y, x, 1) - r3) * 0.5f;
      r2 += r4 * dx + r6 * dy;
      r3 += r6 * dx + r5 * dy;

      float scale = wy;
      if (x < nbx) scale *= kBorderW[x];
      if (x >= W - nbx) scale *= kBorderW[W - x - 1];
      r2 *= scale; r3 *= scale; r4 *= scale; r5 *= scale; r6 *= scale;

      M.at(y, x, 0) = r4 * r4 + r6 * r6;
      M.at(y, x, 1) = (r4 + r5) * r6;
      M.at(y, x, 2) = r5 * r5 + r6 * r6;
      M.at(y, x, 3) = r4 * r2 + r6 * r3;
      M.at(y, x, 4) = r6 * r2 + r5 * r3;
    }
  }
}

// ------------------------------------------------------------- update flow
void update_flow_box(const Image& M, int winsize, Image& flow) {
  Image t0, Mb;
  box_filter_axis0(M, winsize, t0);
  box_filter_axis1(t0, winsize, Mb);
  double scale = 1.0 / ((double)winsize * winsize);
  int H = M.h, W = M.w;
  flow = Image(H, W, 2);
#pragma omp parallel for schedule(static)
  for (int y = 0; y < H; y++)
    for (int x = 0; x < W; x++) {
      double g11 = Mb.at(y, x, 0) * scale;
      double g12 = Mb.at(y, x, 1) * scale;
      double g22 = Mb.at(y, x, 2) * scale;
      double h1 = Mb.at(y, x, 3) * scale;
      double h2 = Mb.at(y, x, 4) * scale;
      double idet = 1.0 / (g11 * g22 - g12 * g12 + 1e-3);
      flow.at(y, x, 0) = (float)((g22 * h1 - g12 * h2) * idet);
      flow.at(y, x, 1) = (float)((g11 * h2 - g12 * h1) * idet);
    }
}

// ---------------------------------------------------------------- resampling
void resize_bilinear(const Image& src, int oh, int ow, Image& dst) {
  dst = Image(oh, ow, src.c);
  double sy = (double)src.h / oh, sx = (double)src.w / ow;
  for (int y = 0; y < oh; y++) {
    double fy = (y + 0.5) * sy - 0.5;
    int y0 = (int)std::floor(fy);
    float wy = (float)(fy - y0);
    int y0c = std::min(std::max(y0, 0), src.h - 1);
    int y1c = std::min(std::max(y0 + 1, 0), src.h - 1);
    for (int x = 0; x < ow; x++) {
      double fx = (x + 0.5) * sx - 0.5;
      int x0 = (int)std::floor(fx);
      float wx = (float)(fx - x0);
      int x0c = std::min(std::max(x0, 0), src.w - 1);
      int x1c = std::min(std::max(x0 + 1, 0), src.w - 1);
      for (int ch = 0; ch < src.c; ch++) {
        float top = src.at(y0c, x0c, ch) * (1 - wx) + src.at(y0c, x1c, ch) * wx;
        float bot = src.at(y1c, x0c, ch) * (1 - wx) + src.at(y1c, x1c, ch) * wx;
        dst.at(y, x, ch) = top * (1 - wy) + bot * wy;
      }
    }
  }
}

const float kSmall3[3] = {0.25f, 0.5f, 0.25f};
const float kSmall5[5] = {0.0625f, 0.25f, 0.375f, 0.25f, 0.0625f};
const float kSmall7[7] = {0.03125f, 0.109375f, 0.21875f, 0.28125f,
                          0.21875f, 0.109375f, 0.03125f};

void gaussian_blur(const Image& src, int ksize, double sigma, Image& dst) {
  vector<float> k;
  if (sigma <= 0 && ksize == 3) k.assign(kSmall3, kSmall3 + 3);
  else if (sigma <= 0 && ksize == 5) k.assign(kSmall5, kSmall5 + 5);
  else if (sigma <= 0 && ksize == 7) k.assign(kSmall7, kSmall7 + 7);
  else {
    if (sigma <= 0) sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8;
    int half = (ksize - 1) / 2;
    vector<double> kd(ksize);
    double s = 0;
    for (int i = -half; i <= half; i++) {
      kd[i + half] = std::exp(-(double)i * i / (2 * sigma * sigma));
      s += kd[i + half];
    }
    k.resize(ksize);
    for (int i = 0; i < ksize; i++) k[i] = (float)(kd[i] / s);
  }
  Image tmp;
  correlate_axis0_mirror(src, k, tmp);
  correlate_axis1_mirror(tmp, k, dst);
}

}  // namespace

extern "C" int vdx_farneback_flow(
    const uint8_t* prev, const uint8_t* curr, int H, int W,
    double pyr_scale, int levels, int winsize, int iterations,
    int poly_n, double poly_sigma, float* out_flow) {
  if (!prev || !curr || !out_flow || H <= 0 || W <= 0) return 1;

  PhaseProf prof;
  double t0 = PhaseProf::now();
  Image prev_f(H, W), curr_f(H, W);
  for (int i = 0; i < H * W; i++) {
    prev_f.data[i] = (float)prev[i];
    curr_f.data[i] = (float)curr[i];
  }
  prof.t[0] += PhaseProf::now() - t0;

  int k0 = 0;
  for (k0 = levels; k0 >= 0; k0--) {
    double scale = std::pow(pyr_scale, k0);
    if (std::min(H, W) * scale >= 2.0 * winsize) break;
  }
  if (k0 < 0) k0 = 0;

  Image flow;
  bool have_flow = false;
  for (int k = k0; k >= 0; k--) {
    double scale = std::pow(pyr_scale, k);
    int h = (int)std::lround(H * scale);
    int w = (int)std::lround(W * scale);

    if (!have_flow) {
      flow = Image(h, w, 2);
      have_flow = true;
    } else {
      t0 = PhaseProf::now();
      Image up;
      resize_bilinear(flow, h, w, up);
      float mul = (float)(1.0 / pyr_scale);
      for (auto& v : up.data) v *= mul;
      flow = std::move(up);
      prof.t[6] += PhaseProf::now() - t0;
    }

    Image R0, R1;
    const Image* srcs[2] = {&prev_f, &curr_f};
    Image* Rs[2] = {&R0, &R1};
    for (int i = 0; i < 2; i++) {
      double sigma = (1.0 / scale - 1.0) * 0.5;
      int smooth_sz = std::max((int)std::lround(sigma * 5) | 1, 3);
      Image smoothed, level_img;
      t0 = PhaseProf::now();
      gaussian_blur(*srcs[i], smooth_sz, sigma, smoothed);
      prof.t[1] += PhaseProf::now() - t0;
      t0 = PhaseProf::now();
      if (scale < 1.0) resize_bilinear(smoothed, h, w, level_img);
      else level_img = std::move(smoothed);
      prof.t[2] += PhaseProf::now() - t0;
      t0 = PhaseProf::now();
      poly_exp(level_img, poly_n, poly_sigma, *Rs[i]);
      prof.t[3] += PhaseProf::now() - t0;
    }

    Image M;
    t0 = PhaseProf::now();
    update_matrices(R0, R1, flow, M);
    prof.t[4] += PhaseProf::now() - t0;
    for (int it = 0; it < iterations; it++) {
      t0 = PhaseProf::now();
      update_flow_box(M, winsize, flow);
      prof.t[5] += PhaseProf::now() - t0;
      if (it < iterations - 1) {
        t0 = PhaseProf::now();
        update_matrices(R0, R1, flow, M);
        prof.t[4] += PhaseProf::now() - t0;
      }
    }
  }
  prof.dump();

  std::memcpy(out_flow, flow.data.data(), sizeof(float) * H * W * 2);
  return 0;
}
