// Native denoise engine implementation.  See denoise_engine.h for the role
// of this component and SURVEY.md §2/§3 for the algorithm spec it follows.

#include "denoise_engine.h"

#include <algorithm>
#include <cmath>
#include <cstdio>
#include <cstring>

namespace nnt {
namespace {

// ===========================================================================
// Precomputed tables (built once, in double, stored as float)
// ===========================================================================

// Bark-ish band edges in 5 ms-frame units; bin index = edge * 4
// (SURVEY.md C1, reference lib.rs:55-58).
constexpr int kEband5ms[kNbBands] = {0,  1,  2,  3,  4,  5,  6,  7,  8,  10, 12,
                                     14, 16, 20, 24, 28, 34, 40, 48, 60, 78, 100};

struct Tables {
  float window[kWindowSize];
  float wnorm;
  float dct[kNbBands][kNbBands];   // [i][j] = cos((i+.5) j pi/22), col0 * sqrt(.5)
  float dct_scale;
  float tansig[201];
  // Dense band matrices (SURVEY.md C2/C3): triangular weights.
  float band_w[kNbBands][kFreqSize];   // band energies = band_w . power
  float interp_w[kFreqSize][2];        // per-bin (1-frac, frac) into band lo/lo+1
  int interp_band[kFreqSize];          // lower band index per bin (-1 = zero bin)
  // Two-stage Cooley-Tukey real-DFT bases (960 = 30 x 32) - same
  // factorization as the TPU engine (nnnoiseless_tpu/ops/fft.py): stage 1
  // is a 30-point DFT over a (n = 32a + b), a twiddle by W_960^{bc}, and
  // stage 2 a 32-point DFT over b with bins at k = 30d + c.  ~360 KFLOP
  // per transform versus ~1.85 MFLOP for the naive dense DFT.
  static constexpr int kN1 = 30;
  static constexpr int kN2 = 32;
  float ct_c1[kN1][kN1];  // cos(2pi a c / 30)
  float ct_s1[kN1][kN1];
  float ct_c2[kN2][kN2];  // cos(2pi b d / 32)
  float ct_s2[kN2][kN2];
  float tw_c[kN2][kN1];   // cos(2pi b c / 960), b-major
  float tw_s[kN2][kN1];

  Tables() {
    // Vorbis power-complementary window (SURVEY.md C4).
    for (int i = 0; i < kFrameSize; ++i) {
      double s = std::sin(0.5 * M_PI * (i + 0.5) / kFrameSize);
      float w = static_cast<float>(std::sin(0.5 * M_PI * s * s));
      window[i] = w;
      window[kWindowSize - 1 - i] = w;
    }
    float acc = 0.0f;
    for (int i = 0; i < kWindowSize; ++i) acc += window[i] * window[i];
    wnorm = 1.0f / acc;

    for (int i = 0; i < kNbBands; ++i)
      for (int j = 0; j < kNbBands; ++j) {
        double t = std::cos((i + 0.5) * j * M_PI / kNbBands);
        if (j == 0) t *= std::sqrt(0.5);
        dct[i][j] = static_cast<float>(t);
      }
    dct_scale = static_cast<float>(std::sqrt(2.0 / kNbBands));

    // 201-entry tanh table on a 0.04 grid, rounded at the 6th decimal
    // (SURVEY.md C7 - parity with the reference's printed constants).
    for (int i = 0; i < 201; ++i) {
      double v = static_cast<float>(std::tanh(0.04 * i));
      tansig[i] = static_cast<float>(std::round(v * 1e6) / 1e6);
    }

    std::memset(band_w, 0, sizeof(band_w));
    for (int i = 0; i < kFreqSize; ++i) {
      interp_band[i] = -1;
      interp_w[i][0] = interp_w[i][1] = 0.0f;
    }
    for (int b = 0; b + 1 < kNbBands; ++b) {
      int band_size = (kEband5ms[b + 1] - kEband5ms[b]) * 4;
      for (int j = 0; j < band_size; ++j) {
        float frac = static_cast<float>(j) / band_size;
        int idx = kEband5ms[b] * 4 + j;
        band_w[b][idx] += 1.0f - frac;
        band_w[b + 1][idx] += frac;
        interp_band[idx] = b;
        interp_w[idx][0] = 1.0f - frac;
        interp_w[idx][1] = frac;
      }
    }
    for (int i = 0; i < kFreqSize; ++i) {
      band_w[0][i] *= 2.0f;
      band_w[kNbBands - 1][i] *= 2.0f;
    }

    for (int a = 0; a < kN1; ++a)
      for (int c = 0; c < kN1; ++c) {
        double ang = 2.0 * M_PI * a * c / kN1;
        ct_c1[a][c] = static_cast<float>(std::cos(ang));
        ct_s1[a][c] = static_cast<float>(std::sin(ang));
      }
    for (int b = 0; b < kN2; ++b)
      for (int d = 0; d < kN2; ++d) {
        double ang = 2.0 * M_PI * b * d / kN2;
        ct_c2[b][d] = static_cast<float>(std::cos(ang));
        ct_s2[b][d] = static_cast<float>(std::sin(ang));
      }
    for (int b = 0; b < kN2; ++b)
      for (int c = 0; c < kN1; ++c) {
        double ang = 2.0 * M_PI * b * c / kWindowSize;
        tw_c[b][c] = static_cast<float>(std::cos(ang));
        tw_s[b][c] = static_cast<float>(std::sin(ang));
      }
  }
};

const Tables& tables() {
  static const Tables t;
  return t;
}

// ===========================================================================
// Small math helpers
// ===========================================================================

inline float TansigApprox(float x) {
  const Tables& t = tables();
  if (!(x < 8.0f)) return 1.0f;    // catches +inf and NaN like the reference
  if (!(x > -8.0f)) return -1.0f;
  float sign = 1.0f;
  if (x < 0.0f) {
    sign = -1.0f;
    x = -x;
  }
  int i = static_cast<int>(std::floor(0.5f + 25.0f * x));
  float frac = x - 0.04f * i;
  float y = t.tansig[i];
  float dy = 1.0f - y * y;
  y = y + frac * dy * (1.0f - y * frac);
  return sign * y;
}

inline float SigmoidApprox(float x) { return 0.5f + 0.5f * TansigApprox(0.5f * x); }

inline float Activate(float x, Activation a) {
  switch (a) {
    case Activation::kTanh: return TansigApprox(x);
    case Activation::kSigmoid: return SigmoidApprox(x);
    case Activation::kRelu: return x < 0.0f ? 0.0f : x;
  }
  return x;
}

inline float Dot(const float* a, const float* b, int n) {
  float acc = 0.0f;
  for (int i = 0; i < n; ++i) acc += a[i] * b[i];
  return acc;
}

// Forward 22-point DCT-II: out[i] = (sum_j x[j] * dct[j][i]) * dct_scale.
void Dct22(float* out, const float* x) {
  const Tables& t = tables();
  for (int i = 0; i < kNbBands; ++i) {
    float acc = 0.0f;
    for (int j = 0; j < kNbBands; ++j) acc += x[j] * t.dct[j][i];
    out[i] = acc * t.dct_scale;
  }
}

// Per-band triangular-weighted correlation of two packed spectra
// (SURVEY.md C2): re/im arrays of kFreqSize each.
void BandCorr(float* out, const float* xre, const float* xim, const float* pre,
              const float* pim) {
  const Tables& t = tables();
  float c[kFreqSize];
  for (int i = 0; i < kFreqSize; ++i) c[i] = xre[i] * pre[i] + xim[i] * pim[i];
  for (int b = 0; b < kNbBands; ++b) out[b] = Dot(t.band_w[b], c, kFreqSize);
}

// 22 band values -> 481 per-bin values by linear interpolation (SURVEY.md C3).
void InterpBandGain(float* out, const float* g) {
  const Tables& t = tables();
  for (int i = 0; i < kFreqSize; ++i) {
    int b = t.interp_band[i];
    out[i] = b < 0 ? 0.0f : t.interp_w[i][0] * g[b] + t.interp_w[i][1] * g[b + 1];
  }
}

// Windowed forward real DFT with the reference's wnorm scale: input 960
// samples -> packed spectrum (re, im).  Two-stage CT factorization.
void ForwardTransform(float* re, float* im, const float* frame) {
  constexpr int kN1 = Tables::kN1, kN2 = Tables::kN2;
  const Tables& t = tables();
  float w[kWindowSize];
  for (int i = 0; i < kWindowSize; ++i) w[i] = frame[i] * t.window[i];
  // stage 1 + twiddle: Z[b][c] = W960^{bc} sum_a w[32a+b] W30^{ac}
  float zr[kN2][kN1], zi[kN2][kN1];
  for (int b = 0; b < kN2; ++b) {
    float yr[kN1], yi[kN1];
    for (int c = 0; c < kN1; ++c) yr[c] = yi[c] = 0.0f;
    for (int a = 0; a < kN1; ++a) {
      float v = w[kN2 * a + b];
      for (int c = 0; c < kN1; ++c) {
        yr[c] += v * t.ct_c1[a][c];
        yi[c] -= v * t.ct_s1[a][c];
      }
    }
    for (int c = 0; c < kN1; ++c) {
      zr[b][c] = yr[c] * t.tw_c[b][c] + yi[c] * t.tw_s[b][c];
      zi[b][c] = yi[c] * t.tw_c[b][c] - yr[c] * t.tw_s[b][c];
    }
  }
  // stage 2: X[30d + c] = sum_b Z[b][c] W32^{bd}; keep the 481 rfft bins.
  float xr[kWindowSize], xi[kWindowSize];
  for (int n = 0; n < kWindowSize; ++n) xr[n] = xi[n] = 0.0f;
  for (int b = 0; b < kN2; ++b)
    for (int d = 0; d < kN2; ++d) {
      float cb = t.ct_c2[b][d], sb = t.ct_s2[b][d];
      float* xrd = xr + kN1 * d;
      float* xid = xi + kN1 * d;
      for (int c = 0; c < kN1; ++c) {
        xrd[c] += zr[b][c] * cb + zi[b][c] * sb;
        xid[c] += zi[b][c] * cb - zr[b][c] * sb;
      }
    }
  for (int k = 0; k < kFreqSize; ++k) {
    re[k] = xr[k] * t.wnorm;
    im[k] = xi[k] * t.wnorm;
  }
}

// Inverse: unnormalized hermitian inverse DFT / 2, then synthesis window.
void InverseTransform(float* out, const float* re, const float* im) {
  constexpr int kN1 = Tables::kN1, kN2 = Tables::kN2;
  const Tables& t = tables();
  // hermitian unfold to 960 bins: full[k] = conj-mirrored spectrum
  float fr[kWindowSize], fi[kWindowSize];
  for (int k = 0; k < kWindowSize; ++k) {
    int m = k <= kWindowSize / 2 ? k : kWindowSize - k;
    fr[k] = re[m];
    fi[k] = k <= kWindowSize / 2 ? im[m] : -im[m];
  }
  // stage 1 + twiddle over k = 32a + b, with V = e^{+i...}
  float zr[kN2][kN1], zi[kN2][kN1];
  for (int b = 0; b < kN2; ++b) {
    float yr[kN1], yi[kN1];
    for (int c = 0; c < kN1; ++c) yr[c] = yi[c] = 0.0f;
    for (int a = 0; a < kN1; ++a) {
      float vr = fr[kN2 * a + b], vi = fi[kN2 * a + b];
      for (int c = 0; c < kN1; ++c) {
        yr[c] += vr * t.ct_c1[a][c] - vi * t.ct_s1[a][c];
        yi[c] += vr * t.ct_s1[a][c] + vi * t.ct_c1[a][c];
      }
    }
    for (int c = 0; c < kN1; ++c) {
      zr[b][c] = yr[c] * t.tw_c[b][c] - yi[c] * t.tw_s[b][c];
      zi[b][c] = yi[c] * t.tw_c[b][c] + yr[c] * t.tw_s[b][c];
    }
  }
  // stage 2, real output only: out[30d + c] = Re sum_b Z[b][c] V32^{bd}
  for (int n = 0; n < kWindowSize; ++n) out[n] = 0.0f;
  for (int b = 0; b < kN2; ++b)
    for (int d = 0; d < kN2; ++d) {
      float cb = t.ct_c2[b][d], sb = t.ct_s2[b][d];
      float* od = out + kN1 * d;
      for (int c = 0; c < kN1; ++c) od[c] += zr[b][c] * cb - zi[b][c] * sb;
    }
  for (int n = 0; n < kWindowSize; ++n) out[n] *= 0.5f * t.window[n];
}

// ===========================================================================
// Pitch analysis (SURVEY.md C8-C13)
// ===========================================================================

constexpr int kDsBuf = kPitchBufSize / 2;        // 864
constexpr int kDsFrame = kPitchFrameSize / 2;    // 480
constexpr int kDsMax = kPitchMaxPeriod / 2;      // 384
constexpr int kDsMin = kPitchMinPeriod / 2;      // 30
constexpr int kMaxPitchLag = kPitchMaxPeriod - 3 * kPitchMinPeriod;  // 588

constexpr int kSecondCheck[16] = {0, 0, 3, 2, 3, 2, 5, 2, 3, 2, 3, 2, 5, 2, 3, 2};

// 2x decimation with the [1/4, 1/2, 1/4] kernel; x[-1] treated as 0.
void Downsample2x(float* out, const float* x) {
  for (int i = 0; i < kDsBuf; ++i) {
    float prev_odd = (i == 0) ? 0.0f : x[2 * i - 1];
    out[i] = ((prev_odd + x[2 * i + 1]) * 0.5f + x[2 * i]) * 0.5f;
  }
}

// Order-4 Levinson-Durbin with the early-exit-on-small-error semantics.
void Lpc4(float* lpc, const float* ac) {
  for (int i = 0; i < 4; ++i) lpc[i] = 0.0f;
  if (ac[0] == 0.0f) return;
  float error = ac[0];
  for (int i = 0; i < 4; ++i) {
    float rr = ac[i + 1];
    for (int j = 0; j < i; ++j) rr += lpc[j] * ac[i - j];
    float r = -rr / error;
    lpc[i] = r;
    for (int j = 0; j < (i + 1) / 2; ++j) {
      float t1 = lpc[j], t2 = lpc[i - 1 - j];
      lpc[j] = t1 + r * t2;
      lpc[i - 1 - j] = t2 + r * t1;
    }
    error = error - r * r * error;
    if (error < 0.001f * ac[0]) break;
  }
}

// Downsample + LPC whitening of the 1728-sample history -> 864 whitened.
void WhitenedDownsample(float* x_lp, const float* input_mem) {
  Downsample2x(x_lp, input_mem);
  float ac[5];
  for (int k = 0; k <= 4; ++k) {
    float acc = 0.0f;
    for (int i = 0; i + k < kDsBuf; ++i) acc += x_lp[i] * x_lp[i + k];
    ac[k] = acc;
  }
  ac[0] *= 1.0001f;                       // -40 dB noise floor
  for (int k = 1; k <= 4; ++k) {          // lag window
    float f = 0.008f * k;
    ac[k] -= ac[k] * f * f;
  }
  float c[4];
  Lpc4(c, ac);
  float taper = 1.0f;
  for (int i = 0; i < 4; ++i) {
    taper *= 0.9f;
    c[i] *= taper;
  }
  // Add a zero at 0.8: 6-tap FIR [1, c0+.8, c1+.8c0, c2+.8c1, c3+.8c2, .8c3],
  // causal with zero history, applied in place back-to-front.
  float k5[6] = {1.0f,
                 c[0] + 0.8f,
                 c[1] + 0.8f * c[0],
                 c[2] + 0.8f * c[1],
                 c[3] + 0.8f * c[2],
                 0.8f * c[3]};
  for (int i = kDsBuf - 1; i >= 0; --i) {
    float acc = 0.0f;
    for (int t = 0; t <= 5 && t <= i; ++t) acc += k5[t] * x_lp[i - t];
    x_lp[i] = acc;
  }
}

// Top-2 lags maximizing xcorr^2 / ||window||^2, with the running-norm update
// and cross-multiplied comparisons (SURVEY.md C11).
void FindBestPitch(int* best, int* second, const float* xcorr, int n_lags,
                   const float* y, int length) {
  float bnum = -1.0f, bden = 0.0f, snum = -1.0f, sden = 0.0f;
  int bp = 0, sp = 1;
  float ysn = 1.0f;
  for (int j = 0; j < length; ++j) ysn += y[j] * y[j];
  for (int i = 0; i < n_lags; ++i) {
    float corr = xcorr[i];
    if (corr > 0.0f) {
      float num = corr * corr;
      if (num * sden > snum * ysn) {
        if (num * bden > bnum * ysn) {
          snum = bnum; sden = bden; sp = bp;
          bnum = num; bden = ysn; bp = i;
        } else {
          snum = num; sden = ysn; sp = i;
        }
      }
    }
    ysn += y[i + length] * y[i + length] - y[i] * y[i];
    ysn = std::max(ysn, 1.0f);
  }
  *best = bp;
  *second = sp;
}

// Two-stage coarse/fine pitch search on the whitened 2x buffer.
int PitchSearch(const float* pitch_buf /* 864 */) {
  const float* x_lp = pitch_buf + kDsMax;  // (480,)
  const int n_coarse = kMaxPitchLag / 4;   // 147
  const int n_fine = kMaxPitchLag / 2;     // 294

  // Coarse at 4x decimation.
  float x4[kDsFrame / 2], y4[kDsFrame / 2 + kMaxPitchLag / 4];
  for (int i = 0; i < kDsFrame / 2; ++i) x4[i] = x_lp[2 * i];
  for (int i = 0; i < kDsFrame / 2 + n_coarse; ++i) y4[i] = pitch_buf[2 * i];
  float xc4[kMaxPitchLag / 4];
  for (int lag = 0; lag < n_coarse; ++lag)
    xc4[lag] = Dot(x4, y4 + lag, kDsFrame / 2);
  int best4, second4;
  FindBestPitch(&best4, &second4, xc4, n_coarse, y4, kDsFrame / 2);

  // Fine at 2x, only lags within +-2 of the doubled coarse candidates.
  float xc2[kMaxPitchLag / 2];
  for (int lag = 0; lag < n_fine; ++lag) {
    if (std::abs(lag - 2 * best4) > 2 && std::abs(lag - 2 * second4) > 2) {
      xc2[lag] = 0.0f;
    } else {
      xc2[lag] = std::max(-1.0f, Dot(x_lp, pitch_buf + lag, kDsFrame));
    }
  }
  int best2, second2_unused;
  FindBestPitch(&best2, &second2_unused, xc2, n_fine, pitch_buf, kDsFrame);

  int offset = 0;
  if (best2 > 0 && best2 < n_fine - 1) {
    float a = xc2[best2 - 1], b = xc2[best2], c = xc2[best2 + 1];
    if (c - a > 0.7f * (b - a)) offset = 1;
    else if (a - c > 0.7f * (b - c)) offset = -1;
  }
  return 2 * best2 - offset;
}

inline float PitchGainOf(float xy, float xx, float yy) {
  return xy / std::sqrt(1.0f + xx * yy);
}

// Octave-error removal: test T/k for k=2..15 with a continuity bonus
// (SURVEY.md C13).  x = whitened 2x buffer; pitch_idx in the original rate.
void RemoveDoubling(const float* x /* 864 */, int pitch_idx, int last_period,
                    float last_gain, int* period_out, float* gain_out) {
  int prev_period = last_period / 2;
  int t0 = std::min(pitch_idx / 2, kDsMax - 1);
  const float* x_tail = x + kDsMax;  // (480,)

  auto corr_at = [&](int t) { return Dot(x_tail, x + kDsMax - t, kDsFrame); };

  float xx = Dot(x_tail, x_tail, kDsFrame);
  // yy_lookup[i] = max(xx + running window-energy delta, 0)
  float yy_lookup[kDsMax + 1];
  yy_lookup[0] = xx;
  float yy = xx;
  for (int i = 1; i <= kDsMax; ++i) {
    yy += x[kDsMax - i] * x[kDsMax - i] - x[kDsMax + kDsFrame - i] * x[kDsMax + kDsFrame - i];
    yy_lookup[i] = std::max(yy, 0.0f);
  }

  float best_xy = corr_at(t0);
  float best_yy = yy_lookup[t0];
  float g0 = PitchGainOf(best_xy, xx, best_yy);
  float g = g0;
  int t = t0;

  for (int k = 2; k <= 15; ++k) {
    int t1 = (2 * t0 + k) / (2 * k);
    if (t1 < kDsMin) break;
    int t1b;
    if (k == 2) {
      t1b = (t1 + t0 > kDsMax) ? t0 : t0 + t1;
    } else {
      t1b = (2 * kSecondCheck[k] * t0 + k) / (2 * k);
    }
    float xy = (corr_at(t1) + corr_at(t1b)) * 0.5f;
    float yyk = (yy_lookup[t1] + yy_lookup[t1b]) * 0.5f;
    float g1 = PitchGainOf(xy, xx, yyk);
    float cont;
    int adiff = std::abs(t1 - prev_period);
    if (adiff <= 1) cont = last_gain;
    else if (adiff <= 2 && 5 * k * k < t0) cont = last_gain * 0.5f;
    else cont = 0.0f;
    // Threshold chain kept exactly as specified (the middle branch is
    // shadowed by the first, as in the upstream lineage).
    float thresh;
    if (t1 < 3 * kDsMin) thresh = std::max(0.85f * g0 - cont, 0.4f);
    else if (t1 < 2 * kDsMin) thresh = std::max(0.9f * g0 - cont, 0.5f);
    else thresh = std::max(0.7f * g0 - cont, 0.3f);
    if (g1 > thresh) {
      best_xy = xy;
      best_yy = yyk;
      t = t1;
      g = g1;
    }
  }

  best_xy = std::max(best_xy, 0.0f);
  float pg = (best_yy <= best_xy) ? 1.0f : best_xy / (best_yy + 1.0f);

  float c0 = corr_at(t - 1), c1 = corr_at(t), c2 = corr_at(t + 1);
  int offset = 0;
  if (c2 - c0 > 0.7f * (c1 - c0)) offset = 1;
  else if (c0 - c2 > 0.7f * (c1 - c2)) offset = -1;
  pg = std::min(pg, g);
  *period_out = std::max(2 * t + offset, kPitchMinPeriod);
  *gain_out = pg;
}

// ===========================================================================
// RNN compute (SURVEY.md C20-C22)
// ===========================================================================

void DenseApply(float* out, const DenseLayer& l, const float* x) {
  const int n = l.nb_neurons;
  for (int j = 0; j < n; ++j) {
    float acc = static_cast<float>(l.bias[j]);
    for (int i = 0; i < l.nb_inputs; ++i)
      acc += static_cast<float>(l.weights[static_cast<size_t>(i) * n + j]) * x[i];
    out[j] = Activate(acc * kWeightsScale, l.activation);
  }
}

void GruApply(float* state, const GruLayer& l, const float* x) {
  const int n = l.nb_neurons;
  const int stride = 3 * n;
  float z[96], r[96], h[96];
  for (int j = 0; j < n; ++j) {
    // update gate
    float acc = static_cast<float>(l.bias[j]);
    for (int i = 0; i < l.nb_inputs; ++i)
      acc += static_cast<float>(l.input_weights[static_cast<size_t>(i) * stride + j]) * x[i];
    for (int i = 0; i < n; ++i)
      acc += static_cast<float>(l.recurrent_weights[static_cast<size_t>(i) * stride + j]) *
             state[i];
    z[j] = SigmoidApprox(acc * kWeightsScale);
  }
  for (int j = 0; j < n; ++j) {
    // reset gate, pre-multiplied by the state
    float acc = static_cast<float>(l.bias[n + j]);
    for (int i = 0; i < l.nb_inputs; ++i)
      acc += static_cast<float>(l.input_weights[static_cast<size_t>(i) * stride + n + j]) *
             x[i];
    for (int i = 0; i < n; ++i)
      acc += static_cast<float>(l.recurrent_weights[static_cast<size_t>(i) * stride + n + j]) *
             state[i];
    r[j] = state[j] * SigmoidApprox(acc * kWeightsScale);
  }
  for (int j = 0; j < n; ++j) {
    // candidate
    float acc = static_cast<float>(l.bias[2 * n + j]);
    for (int i = 0; i < l.nb_inputs; ++i)
      acc += static_cast<float>(l.input_weights[static_cast<size_t>(i) * stride + 2 * n + j]) *
             x[i];
    for (int i = 0; i < n; ++i)
      acc += static_cast<float>(
                 l.recurrent_weights[static_cast<size_t>(i) * stride + 2 * n + j]) *
             r[i];
    h[j] = Activate(acc * kWeightsScale, l.activation);
  }
  for (int j = 0; j < n; ++j) state[j] = z[j] * state[j] + (1.0f - z[j]) * h[j];
}

}  // namespace

// ===========================================================================
// Model parsing (SURVEY.md C19)
// ===========================================================================

namespace {

struct ByteReader {
  const uint8_t* p;
  size_t left;
  bool ok = true;

  int8_t i8() {
    if (left == 0) { ok = false; return 0; }
    int8_t v = static_cast<int8_t>(*p);
    ++p; --left;
    return v;
  }
  bool read_vec(std::vector<int8_t>* out, size_t n) {
    if (left < n) { ok = false; return false; }
    out->resize(n);
    std::memcpy(out->data(), p, n);
    p += n; left -= n;
    return true;
  }
};

bool ParseDense(ByteReader* r, DenseLayer* l) {
  l->nb_inputs = r->i8();
  l->nb_neurons = r->i8();
  int act = r->i8();
  if (!r->ok || l->nb_inputs <= 0 || l->nb_neurons <= 0 || act < 0 || act > 2)
    return false;
  l->activation = static_cast<Activation>(act);
  return r->read_vec(&l->weights,
                     static_cast<size_t>(l->nb_inputs) * l->nb_neurons) &&
         r->read_vec(&l->bias, l->nb_neurons);
}

bool ParseGru(ByteReader* r, GruLayer* l) {
  l->nb_inputs = r->i8();
  l->nb_neurons = r->i8();
  int act = r->i8();
  if (!r->ok || l->nb_inputs <= 0 || l->nb_neurons <= 0 || act < 0 || act > 2)
    return false;
  l->activation = static_cast<Activation>(act);
  size_t n3 = 3 * static_cast<size_t>(l->nb_neurons);
  return r->read_vec(&l->input_weights, static_cast<size_t>(l->nb_inputs) * n3) &&
         r->read_vec(&l->recurrent_weights,
                     static_cast<size_t>(l->nb_neurons) * n3) &&
         r->read_vec(&l->bias, n3);
}

}  // namespace

std::unique_ptr<RnnModel> RnnModel::FromBytes(const uint8_t* data, size_t len) {
  ByteReader r{data, len};
  auto m = std::make_unique<RnnModel>();
  if (!ParseDense(&r, &m->input_dense)) return nullptr;
  if (!ParseGru(&r, &m->vad_gru)) return nullptr;
  if (!ParseGru(&r, &m->noise_gru)) return nullptr;
  if (!ParseGru(&r, &m->denoise_gru)) return nullptr;
  if (!ParseDense(&r, &m->denoise_output)) return nullptr;
  if (!ParseDense(&r, &m->vad_output)) return nullptr;
  if (r.left != 0) return nullptr;  // trailing garbage
  // Size validation: the engine's state/scratch buffers are fixed at
  // kMaxNeurons/kMaxConcatInputs; reject models beyond them (the format's
  // int8 header fields allow up to 127 neurons).
  for (const GruLayer* g : {&m->vad_gru, &m->noise_gru, &m->denoise_gru}) {
    if (g->nb_neurons > kMaxNeurons || g->nb_inputs > kMaxConcatInputs)
      return nullptr;
  }
  for (const DenseLayer* dl :
       {&m->input_dense, &m->denoise_output, &m->vad_output}) {
    if (dl->nb_neurons > kMaxNeurons || dl->nb_inputs > kMaxConcatInputs)
      return nullptr;
  }
  // Topology validation: the concat-input arithmetic must hold.
  const int f = m->input_dense.nb_inputs;           // 42
  const int d = m->input_dense.nb_neurons;          // 24
  const int v = m->vad_gru.nb_neurons;              // 24
  if (m->vad_gru.nb_inputs != d) return nullptr;
  if (m->noise_gru.nb_inputs != f + d + v) return nullptr;
  if (m->denoise_gru.nb_inputs != f + v + m->noise_gru.nb_neurons) return nullptr;
  if (m->denoise_output.nb_inputs != m->denoise_gru.nb_neurons) return nullptr;
  if (m->denoise_output.nb_neurons != kNbBands) return nullptr;
  if (m->vad_output.nb_inputs != v || m->vad_output.nb_neurons != 1) return nullptr;
  if (f != kNbFeatures) return nullptr;
  return m;
}

std::unique_ptr<RnnModel> RnnModel::FromFile(const char* path) {
  std::FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  std::fseek(f, 0, SEEK_END);
  long sz = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(sz > 0 ? static_cast<size_t>(sz) : 0);
  size_t got = buf.empty() ? 0 : std::fread(buf.data(), 1, buf.size(), f);
  std::fclose(f);
  if (got != buf.size()) return nullptr;
  return FromBytes(buf.data(), buf.size());
}

// Default weights are embedded at build time (generated from
// nnnoiseless_tpu/assets/weights.rnn by the Makefile).
extern "C" {
extern const unsigned char g_nnt_default_weights[];
extern const unsigned int g_nnt_default_weights_len;
}

const RnnModel& DefaultModel() {
  static const std::unique_ptr<RnnModel> model =
      RnnModel::FromBytes(g_nnt_default_weights, g_nnt_default_weights_len);
  return *model;
}

// ===========================================================================
// The per-frame engine (SURVEY.md C14-C18, C22, C23)
// ===========================================================================

DenoiseState::DenoiseState(const RnnModel* model)
    : model_(model ? model : &DefaultModel()) {
  Reset();
}

void DenoiseState::Reset() {
    std::memset(input_mem_, 0, sizeof(input_mem_));
    hp_mem_[0] = hp_mem_[1] = 0;
    std::memset(cepstral_mem_, 0, sizeof(cepstral_mem_));
    mem_id_ = 0;
    std::memset(synthesis_mem_, 0, sizeof(synthesis_mem_));
    std::memset(vad_state_, 0, sizeof(vad_state_));
    std::memset(noise_state_, 0, sizeof(noise_state_));
    std::memset(denoise_state_, 0, sizeof(denoise_state_));
    std::memset(lastg_, 0, sizeof(lastg_));
    last_period_ = 0;
    last_gain_ = 0.0f;
  }

// Windowed transform of input_mem_[end-960-lag : end-lag].
void DenoiseState::TransformAtLag(float* re, float* im, float* bande, int lag) {
    ForwardTransform(re, im, input_mem_ + kPitchBufSize - kWindowSize - lag);
    BandCorr(bande, re, im, re, im);
  }

float DenoiseState::ProcessFrame(float* out, const float* in) {
    // --- input shift + high-pass biquad (f64 accumulation) ----------------
    std::memmove(input_mem_, input_mem_ + kFrameSize,
                 (kPitchBufSize - kFrameSize) * sizeof(float));
    float* tail = input_mem_ + kPitchBufSize - kFrameSize;
    const double a0 = -1.99599, a1 = 0.99600, b0 = -2.0, b1 = 1.0;
    for (int i = 0; i < kFrameSize; ++i) {
      double x = in[i];
      double y = x + hp_mem_[0];
      hp_mem_[0] = static_cast<float>(hp_mem_[1] + (b0 * x - a0 * y));
      hp_mem_[1] = static_cast<float>(b1 * x - a1 * y);
      tail[i] = static_cast<float>(y);
    }

    // --- spectral analysis + pitch ----------------------------------------
    float xre[kFreqSize], xim[kFreqSize], ex[kNbBands];
    TransformAtLag(xre, xim, ex, 0);

    float x_lp[kDsBuf];
    WhitenedDownsample(x_lp, input_mem_);
    int pitch_idx = kPitchMaxPeriod - PitchSearch(x_lp);
    int period;
    float pgain;
    RemoveDoubling(x_lp, pitch_idx, last_period_, last_gain_, &period, &pgain);
    last_period_ = period;
    last_gain_ = pgain;

    float pre[kFreqSize], pim[kFreqSize], ep[kNbBands];
    TransformAtLag(pre, pim, ep, period);
    float exp_c[kNbBands], expn[kNbBands];
    BandCorr(exp_c, xre, xim, pre, pim);
    for (int b = 0; b < kNbBands; ++b)
      expn[b] = exp_c[b] / std::sqrt(0.001f + ex[b] * ep[b]);

    float f_pitch[kNbBands];
    Dct22(f_pitch, expn);
    f_pitch[0] -= 1.3f;
    f_pitch[1] -= 0.9f;

    // --- log band energies + silence gate ---------------------------------
    float ly[kNbBands];
    float log_max = -2.0f, follow = -2.0f, e_total = 0.0f;
    for (int b = 0; b < kNbBands; ++b) {
      float v = std::log10(1e-2f + ex[b]);
      v = std::max(std::max(v, log_max - 7.0f), follow - 1.5f);
      log_max = std::max(log_max, v);
      follow = std::max(follow - 1.5f, v);
      ly[b] = v;
      e_total += ex[b];
    }
    bool silence = e_total < 0.04f;

    float gf[kFreqSize];
    float vad = 0.0f;
    if (!silence) {
      // --- cepstrum, ring buffer, deltas, variability ----------------------
      float features[kNbFeatures];
      float ceps[kNbBands];
      Dct22(ceps, ly);
      ceps[0] -= 12.0f;
      ceps[1] -= 4.0f;
      int idx0 = mem_id_;
      int idx1 = (idx0 + kCepsMem - 1) % kCepsMem;
      int idx2 = (idx0 + kCepsMem - 2) % kCepsMem;
      std::memcpy(cepstral_mem_[idx0], ceps, sizeof(ceps));
      mem_id_ = (idx0 + 1) % kCepsMem;
      const float* c1v = cepstral_mem_[idx1];
      const float* c2v = cepstral_mem_[idx2];
      for (int i = 0; i < kNbDeltaCeps; ++i) {
        features[i] = ceps[i] + c1v[i] + c2v[i];
        features[kNbBands + i] = ceps[i] - c2v[i];
        features[kNbBands + kNbDeltaCeps + i] = ceps[i] - 2.0f * c1v[i] + c2v[i];
      }
      for (int i = kNbDeltaCeps; i < kNbBands; ++i) features[i] = ceps[i];
      float spec_var = 0.0f;
      for (int i = 0; i < kCepsMem; ++i) {
        float mind = 1e15f;
        for (int j = 0; j < kCepsMem; ++j) {
          if (j == i) continue;
          float d = 0.0f;
          for (int b = 0; b < kNbBands; ++b) {
            float t = cepstral_mem_[i][b] - cepstral_mem_[j][b];
            d += t * t;
          }
          mind = std::min(mind, d);
        }
        spec_var += mind;
      }
      for (int i = 0; i < kNbDeltaCeps; ++i)
        features[kNbBands + 2 * kNbDeltaCeps + i] = f_pitch[i];
      features[kNbFeatures - 2] = 0.01f * (period - 300);
      features[kNbFeatures - 1] = spec_var / kCepsMem - 2.1f;

      // --- RNN ----------------------------------------------------------
      const RnnModel& m = *model_;
      float dense_out[96], noise_in[256], den_in[256], gains[kNbBands], vad_out[1];
      DenseApply(dense_out, m.input_dense, features);
      GruApply(vad_state_, m.vad_gru, dense_out);
      DenseApply(vad_out, m.vad_output, vad_state_);
      vad = vad_out[0];
      int di = m.input_dense.nb_neurons, vn = m.vad_gru.nb_neurons;
      std::memcpy(noise_in, dense_out, di * sizeof(float));
      std::memcpy(noise_in + di, vad_state_, vn * sizeof(float));
      std::memcpy(noise_in + di + vn, features, kNbFeatures * sizeof(float));
      GruApply(noise_state_, m.noise_gru, noise_in);
      int nn = m.noise_gru.nb_neurons;
      std::memcpy(den_in, vad_state_, vn * sizeof(float));
      std::memcpy(den_in + vn, noise_state_, nn * sizeof(float));
      std::memcpy(den_in + vn + nn, features, kNbFeatures * sizeof(float));
      GruApply(denoise_state_, m.denoise_gru, den_in);
      DenseApply(gains, m.denoise_output, denoise_state_);

      // --- pitch comb filter (C17) ---------------------------------------
      float r[kNbBands];
      for (int b = 0; b < kNbBands; ++b) {
        float gsq = gains[b] * gains[b], esq = expn[b] * expn[b];
        float rb;
        if (expn[b] > gains[b]) rb = 1.0f;
        else rb = esq * (1.0f - gsq) / (0.001f + gsq * (1.0f - esq));
        rb = std::sqrt(std::min(std::max(rb, 0.0f), 1.0f));
        r[b] = rb * std::sqrt(ex[b] / (1e-8f + ep[b]));
      }
      float rf[kFreqSize];
      InterpBandGain(rf, r);
      for (int i = 0; i < kFreqSize; ++i) {
        xre[i] += pre[i] * rf[i];
        xim[i] += pim[i] * rf[i];
      }
      float new_e[kNbBands], norm[kNbBands], normf[kFreqSize];
      BandCorr(new_e, xre, xim, xre, xim);
      for (int b = 0; b < kNbBands; ++b)
        norm[b] = std::sqrt(ex[b] / (1e-8f + new_e[b]));
      InterpBandGain(normf, norm);
      for (int i = 0; i < kFreqSize; ++i) {
        xre[i] *= normf[i];
        xim[i] *= normf[i];
      }

      // --- gain hangover + application (C23) ------------------------------
      for (int b = 0; b < kNbBands; ++b) {
        gains[b] = std::max(gains[b], 0.6f * lastg_[b]);
        lastg_[b] = gains[b];
      }
      InterpBandGain(gf, gains);
      for (int i = 0; i < kFreqSize; ++i) {
        xre[i] *= gf[i];
        xim[i] *= gf[i];
      }
    }

    // --- synthesis: inverse transform + overlap-add (C18) -----------------
    float y[kWindowSize];
    InverseTransform(y, xre, xim);
    for (int i = 0; i < kFrameSize; ++i) out[i] = y[i] + synthesis_mem_[i];
    for (int i = 0; i < kFrameSize; ++i) synthesis_mem_[i] = y[kFrameSize + i];
    return vad;
  }


}  // namespace nnt

