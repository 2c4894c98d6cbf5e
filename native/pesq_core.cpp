// PESQ-style objective speech quality estimator (ITU-T P.862 structure).
//
// Native C++ replacement slot for the reference's pypesq C extension
// (reference: src/metrics/allwrapper.py:12,55). Implements the published
// P.862 perceptual-model pipeline: level alignment, Hann STFT, Bark-band
// power mapping, per-band frequency compensation, per-frame gain
// compensation, Zwicker loudness transform, center-clipped symmetric +
// asymmetry-weighted disturbance, L6/L2 two-stage time aggregation and the
// linear MOS map (4.5 - 0.1*D - 0.0309*DA). Coefficient tables of the ITU
// reference code are approximated (documented in README-native); when the
// genuine pypesq is installed the Python dispatcher prefers it.
//
// Pure C++ (no Python API here) so the core is unit-testable standalone.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <cstdio>
#include <cstdlib>
#include <vector>

namespace rtfs_native {

static const double kPi = 3.14159265358979323846;
// disturbance->MOS scales, calibrated on additive-noise curves so white
// noise lands near published PESQ values (see tests/test_native.py)
static const double kSymScale = 0.08;
static const double kAsymScale = 0.02;

// ----------------------------------------------------------------- FFT
// iterative radix-2 complex FFT (n = power of two)
static void fft(std::vector<double>& re, std::vector<double>& im) {
  const size_t n = re.size();
  for (size_t i = 1, j = 0; i < n; ++i) {
    size_t bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) {
      std::swap(re[i], re[j]);
      std::swap(im[i], im[j]);
    }
  }
  for (size_t len = 2; len <= n; len <<= 1) {
    double ang = -2.0 * kPi / static_cast<double>(len);
    double wr = std::cos(ang), wi = std::sin(ang);
    for (size_t i = 0; i < n; i += len) {
      double cr = 1.0, ci = 0.0;
      for (size_t k = 0; k < len / 2; ++k) {
        double ur = re[i + k], ui = im[i + k];
        double vr = re[i + k + len / 2] * cr - im[i + k + len / 2] * ci;
        double vi = re[i + k + len / 2] * ci + im[i + k + len / 2] * cr;
        re[i + k] = ur + vr;
        im[i + k] = ui + vi;
        re[i + k + len / 2] = ur - vr;
        im[i + k + len / 2] = ui - vi;
        double ncr = cr * wr - ci * wi;
        ci = cr * wi + ci * wr;
        cr = ncr;
      }
    }
  }
}

// -------------------------------------------------------------- helpers
static double bark_of_hz(double f) {
  return 13.0 * std::atan(0.00076 * f) +
         3.5 * std::atan((f / 7500.0) * (f / 7500.0));
}

// approximate absolute hearing threshold (dB SPL) by frequency
static double abs_thresh_db(double f) {
  double fk = f / 1000.0;
  if (fk <= 0.0) fk = 1e-3;
  return 3.64 * std::pow(fk, -0.8) -
         6.5 * std::exp(-0.6 * (fk - 3.3) * (fk - 3.3)) +
         1e-3 * std::pow(fk, 4.0);
}

struct BarkMap {
  int n_bands;
  std::vector<std::vector<int>> bins;   // fft bins per band
  std::vector<double> width;            // bark width per band
  std::vector<double> thresh_pow;       // absolute threshold power per band
};

static BarkMap make_bark_map(int fs, int nfft) {
  BarkMap map;
  const int n_bands = 42;
  map.n_bands = n_bands;
  map.bins.assign(n_bands, {});
  map.width.assign(n_bands, 0.0);
  map.thresh_pow.assign(n_bands, 0.0);
  double max_bark = bark_of_hz(fs / 2.0);
  double step = max_bark / n_bands;
  int half = nfft / 2;
  std::vector<double> thresh_sum(n_bands, 0.0);
  std::vector<int> counts(n_bands, 0);
  for (int k = 1; k <= half; ++k) {
    double f = static_cast<double>(k) * fs / nfft;
    int b = std::min(n_bands - 1, static_cast<int>(bark_of_hz(f) / step));
    map.bins[b].push_back(k);
    thresh_sum[b] += abs_thresh_db(f);
    counts[b]++;
  }
  for (int b = 0; b < n_bands; ++b) {
    map.width[b] = step;
    double mean_db = counts[b] ? thresh_sum[b] / counts[b] : 100.0;
    map.thresh_pow[b] = std::pow(10.0, mean_db / 10.0);
  }
  return map;
}

// power spectra of hann-windowed frames -> bark band powers (frames x bands)
static std::vector<std::vector<double>> bark_frames(
    const float* x, int n, int fs, int frame, int hop, int nfft,
    const BarkMap& map) {
  std::vector<double> win(frame);
  for (int i = 0; i < frame; ++i)
    win[i] = 0.5 * (1.0 - std::cos(2.0 * kPi * i / frame));
  int n_frames = n >= frame ? (n - frame) / hop + 1 : 0;
  std::vector<std::vector<double>> out(
      n_frames, std::vector<double>(map.n_bands, 0.0));
  std::vector<double> re(nfft), im(nfft);
  for (int t = 0; t < n_frames; ++t) {
    std::fill(re.begin(), re.end(), 0.0);
    std::fill(im.begin(), im.end(), 0.0);
    for (int i = 0; i < frame; ++i)
      re[i] = static_cast<double>(x[t * hop + i]) * win[i];
    fft(re, im);
    for (int b = 0; b < map.n_bands; ++b) {
      double p = 0.0;
      for (int k : map.bins[b]) p += re[k] * re[k] + im[k] * im[k];
      out[t][b] = p / (frame * frame * 0.375);  // hann power normalization
    }
  }
  return out;
}

static double zwicker_loudness(double p, double p0) {
  // Zwicker's law with 0.23 exponent against the band threshold
  if (p <= 0.0) return 0.0;
  double sl = std::pow(p0 / 0.5, 0.23);
  double v = std::pow(0.5 + 0.5 * p / p0, 0.23) - 1.0;
  return v > 0.0 ? sl * v : 0.0;
}

// --------------------------------------------------------------- main
// returns MOS-like score in [-0.5, 4.5]
double pesq_score(const float* ref, const float* deg, int n, int fs) {
  if (n < fs / 4) return -0.5;  // too short
  int frame = (fs >= 16000) ? 512 : 256;
  int hop = frame / 2;
  int nfft = frame * 2;
  BarkMap map = make_bark_map(fs, nfft);

  // level alignment: scale both to a fixed RMS
  auto rms = [n](const float* x) {
    double s = 0.0;
    for (int i = 0; i < n; ++i) s += double(x[i]) * x[i];
    return std::sqrt(s / n) + 1e-20;
  };
  const double target = 3162.0;  // ITU-style 1e7 power calibration
  double sr = target / rms(ref), sd = target / rms(deg);
  std::vector<float> r(n), d(n);
  for (int i = 0; i < n; ++i) {
    r[i] = static_cast<float>(ref[i] * sr);
    d[i] = static_cast<float>(deg[i] * sd);
  }

  auto rb = bark_frames(r.data(), n, fs, frame, hop, nfft, map);
  auto db = bark_frames(d.data(), n, fs, frame, hop, nfft, map);
  int T = static_cast<int>(rb.size());
  if (T < 4) return -0.5;
  int B = map.n_bands;

  // silent-frame detection on the reference (30 dB below max frame power)
  std::vector<double> frame_pow(T, 0.0);
  double max_pow = 1e-30;
  for (int t = 0; t < T; ++t) {
    for (int b = 0; b < B; ++b) frame_pow[t] += rb[t][b];
    max_pow = std::max(max_pow, frame_pow[t]);
  }
  std::vector<bool> active(T);
  int n_active = 0;
  for (int t = 0; t < T; ++t) {
    active[t] = frame_pow[t] > max_pow * 1e-3;
    n_active += active[t];
  }
  if (n_active < 2) return -0.5;

  // per-band frequency compensation (linear-filtering invariance):
  // scale the reference band power toward the degraded mean
  for (int b = 0; b < B; ++b) {
    double mr = 0.0, md = 0.0;
    for (int t = 0; t < T; ++t)
      if (active[t]) {
        mr += rb[t][b];
        md += db[t][b];
      }
    // partial compensation (P.862-style additive floor keeps weak bands
    // uncompensated; strong bands fully compensated), clipped to +-13 dB
    double c = 1000.0 * n_active;
    double ratio = (md + c) / (mr + c);
    ratio = std::min(2.0, std::max(0.05, ratio));  // upward comp capped: filtering, not additive noise
    for (int t = 0; t < T; ++t) rb[t][b] *= ratio;
  }

  // per-frame gain compensation on the degraded signal (slow AGC)
  for (int t = 0; t < T; ++t) {
    double pr = 1e-20, pd = 1e-20;
    for (int b = 0; b < B; ++b) {
      pr += rb[t][b];
      pd += db[t][b];
    }
    double g = std::min(5.0, std::max(3e-4, pr / pd));
    for (int b = 0; b < B; ++b) db[t][b] *= g;
  }

  // loudness + disturbance per frame
  std::vector<double> d_frame(T, 0.0), da_frame(T, 0.0);
  for (int t = 0; t < T; ++t) {
    double sym = 0.0, asym = 0.0, wsum = 0.0;
    for (int b = 0; b < B; ++b) {
      double lr = zwicker_loudness(rb[t][b], map.thresh_pow[b]);
      double ld = zwicker_loudness(db[t][b], map.thresh_pow[b]);
      double diff = ld - lr;
      double m = 0.25 * std::min(lr, ld);  // center clipping (masking)
      double mag = std::max(0.0, std::fabs(diff) - m);
      // asymmetry factor: additive distortions weigh more
      double af = std::pow((db[t][b] + 50.0 * map.thresh_pow[b]) /
                               (rb[t][b] + 50.0 * map.thresh_pow[b]),
                           1.2);
      if (af < 3.0) af = 0.0;
      af = std::min(af, 12.0);
      double w = map.width[b];
      sym += mag * mag * w;
      asym += mag * af * w;
      wsum += w;
    }
    d_frame[t] = std::sqrt(sym / wsum);
    da_frame[t] = asym / wsum;
  }

  // two-stage Lp aggregation over 20-frame "syllables": L6 then L2
  auto aggregate = [&](const std::vector<double>& v, double p1, double p2) {
    const int chunk = 20;
    std::vector<double> chunks;
    for (int start = 0; start < T; start += chunk / 2) {
      double acc = 0.0;
      int cnt = 0;
      for (int t = start; t < std::min(T, start + chunk); ++t)
        if (active[t]) {
          acc += std::pow(v[t], p1);
          cnt++;
        }
      if (cnt) chunks.push_back(std::pow(acc / cnt, 1.0 / p1));
    }
    if (chunks.empty()) return 0.0;
    double acc = 0.0;
    for (double c : chunks) acc += std::pow(c, p2);
    return std::pow(acc / chunks.size(), 1.0 / p2);
  };

  double D = aggregate(d_frame, 6.0, 2.0);
  double DA = aggregate(da_frame, 1.0, 2.0);

  if (std::getenv("RTFS_PESQ_DEBUG")) {
    std::fprintf(stderr, "D=%g DA=%g\n", D, DA);
  }
  // P.862 linear MOS map with our disturbance scaling
  double mos = 4.5 - kSymScale * D - kAsymScale * DA;
  return std::min(4.5, std::max(-0.5, mos));
}

}  // namespace rtfs_native

extern "C" {
double rtfs_pesq_score(const float* ref, const float* deg, int n, int fs) {
  return rtfs_native::pesq_score(ref, deg, n, fs);
}

// slice-by-1 CRC32C (Castagnoli) for the tfevents writer fast path
uint32_t rtfs_crc32c(const uint8_t* data, size_t len) {
  static uint32_t table[256];
  static bool init = false;
  if (!init) {
    for (uint32_t i = 0; i < 256; ++i) {
      uint32_t c = i;
      for (int k = 0; k < 8; ++k)
        c = (c & 1) ? (0x82F63B78u ^ (c >> 1)) : (c >> 1);
      table[i] = c;
    }
    init = true;
  }
  uint32_t crc = 0xFFFFFFFFu;
  for (size_t i = 0; i < len; ++i)
    crc = table[(crc ^ data[i]) & 0xFF] ^ (crc >> 8);
  return crc ^ 0xFFFFFFFFu;
}
}
