// PESQ objective speech quality (ITU-T P.862 algorithm, narrowband mode).
//
// Native C++ replacement slot for the reference's pypesq C extension
// (reference: src/metrics/allwrapper.py:12,55). Implements the P.862
// pipeline end to end with the standard's own scaling constants:
//
//   * input level alignment to 1e7 power in the 350-3250 Hz band
//   * IRS receive characteristic (narrowband listening path)
//   * two-stage time alignment mirroring the ITU structure: crude delay
//     from 4 ms log-energy ENVELOPE cross-correlation (P.862
//     crude_align; robust to periodic waveforms) refined to sample
//     resolution by a bounded raw cross-correlation, then per-utterance
//     realignment (energy-VAD utterances, gated NCC delay search, with
//     recursive splitting at interior delay jumps per utterance_split)
//   * 32 ms Hann frames, 50% overlap, |FFT|^2 -> Bark band powers with
//     the published Sp power scale (6.910853e-6 @16k, 2.764344e-5 @8k)
//   * partial frequency compensation (+1000 floor, [0.01, 100] bound)
//   * smoothed partial gain compensation (+5e3 floor, [3e-4, 5] bound)
//   * Zwicker loudness with the published Sl (1.866055e-1) and the
//     low-band modified 0.23 exponent (h = (6/(z+2))^0.15 for z < 4)
//   * masking-clipped disturbance, asymmetry factor ((d+50)/(r+50))^1.2
//     (zeroed < 3, capped 12)
//   * per-frame pseudo-Lp over Bark widths (p=2 symmetric, p=1
//     asymmetric), 45 cap, ((E+1e5)/1e7)^0.04 frame-energy weighting
//   * L6-over-20-frame-syllables then L2 aggregation
//   * raw P.862 MOS = 4.5 - 0.1*D - 0.0309*DA
//
// The Bark band layout (49 bands @16 kHz input / 42 @8 kHz, matching the
// ITU band counts) is derived from the Zwicker warping formula with
// per-band Hz-width power corrections rather than copied from the ITU
// tables (not redistributable; environment has no network), so scores
// track P.862 closely but are not guaranteed bit-identical to the ITU
// reference code. When genuine pypesq is installed the Python dispatcher
// (rtfs_net_tpu/metrics/pesq.py) prefers it.
//
// Pure C++ (no Python API here) so the core is unit-testable standalone.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <cstdio>
#include <cstdlib>
#include <limits>
#include <vector>

namespace rtfs_native {

static const double kPi = 3.14159265358979323846;

// published P.862 scaling constants (ITU-T P.862 ANSI-C reference,
// pesqpar.h): power (Sp) and loudness (Sl) scale factors
static const double kSp16k = 6.910853e-6;
static const double kSp8k = 2.764344e-5;
static const double kSl = 1.866055e-1;
static const double kZwicker = 0.23;

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

static void ifft(std::vector<double>& re, std::vector<double>& im) {
  for (auto& v : im) v = -v;
  fft(re, im);
  const double inv = 1.0 / re.size();
  for (size_t i = 0; i < re.size(); ++i) {
    re[i] *= inv;
    im[i] *= -inv;
  }
}

static size_t next_pow2(size_t n) {
  size_t p = 1;
  while (p < n) p <<= 1;
  return p;
}

// -------------------------------------------------------------- helpers
static double bark_of_hz(double f) {
  return 13.0 * std::atan(0.00076 * f) +
         3.5 * std::atan((f / 7500.0) * (f / 7500.0));
}

static double hz_of_bark(double z) {
  // numerical inverse (monotone bisection)
  double lo = 0.0, hi = 20000.0;
  for (int it = 0; it < 60; ++it) {
    double mid = 0.5 * (lo + hi);
    (bark_of_hz(mid) < z ? lo : hi) = mid;
  }
  return 0.5 * (lo + hi);
}

// absolute hearing threshold (dB SPL) by frequency (Terhardt approximation,
// tracking the ITU abs_thresh_power tables)
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
  std::vector<double> centre_bark;
  std::vector<double> width_bark;
  std::vector<double> pow_corr;         // Hz-width quantization correction
  std::vector<double> thresh_pow;       // absolute threshold power per band
};

// P.862 band counts: 49 bands for 16 kHz input, 42 for 8 kHz, uniformly
// spaced on the Zwicker bark axis up to fs/2
static BarkMap make_bark_map(int fs, int nfft) {
  BarkMap map;
  const int n_bands = (fs >= 16000) ? 49 : 42;
  map.n_bands = n_bands;
  map.bins.assign(n_bands, {});
  map.centre_bark.assign(n_bands, 0.0);
  map.width_bark.assign(n_bands, 0.0);
  map.pow_corr.assign(n_bands, 1.0);
  map.thresh_pow.assign(n_bands, 0.0);
  const double max_bark = bark_of_hz(fs / 2.0);
  const double step = max_bark / n_bands;
  const double df = static_cast<double>(fs) / nfft;
  const int half = nfft / 2;
  for (int k = 1; k <= half; ++k) {
    double f = k * df;
    int b = std::min(n_bands - 1, static_cast<int>(bark_of_hz(f) / step));
    map.bins[b].push_back(k);
  }
  for (int b = 0; b < n_bands; ++b) {
    double z_lo = b * step, z_hi = (b + 1) * step;
    map.centre_bark[b] = 0.5 * (z_lo + z_hi);
    map.width_bark[b] = step;
    double f_lo = hz_of_bark(z_lo), f_hi = hz_of_bark(z_hi);
    double width_hz = f_hi - f_lo;
    double covered = map.bins[b].size() * df;
    // correct the bin-quantized band power to the analytic band width
    map.pow_corr[b] = covered > 0.0 ? width_hz / covered : 0.0;
    double fc = hz_of_bark(map.centre_bark[b]);
    map.thresh_pow[b] = std::pow(10.0, abs_thresh_db(fc) / 10.0);
  }
  return map;
}

// ---------------------------------------------------- signal conditioning
// overall power in [f_lo, f_hi] Hz via one whole-signal FFT
static double band_power(const std::vector<double>& x, int fs, double f_lo,
                         double f_hi) {
  size_t nfft = next_pow2(x.size());
  std::vector<double> re(nfft, 0.0), im(nfft, 0.0);
  std::copy(x.begin(), x.end(), re.begin());
  fft(re, im);
  double acc = 0.0;
  size_t half = nfft / 2;
  for (size_t k = 1; k <= half; ++k) {
    double f = static_cast<double>(k) * fs / nfft;
    if (f >= f_lo && f <= f_hi) acc += re[k] * re[k] + im[k] * im[k];
  }
  // Parseval: mean-square in band = 2 * sum(|X|^2) / nfft^2 (one-sided)
  return 2.0 * acc / (static_cast<double>(nfft) * nfft) *
         (static_cast<double>(nfft) / x.size());
}

// IRS receive characteristic (P.862 narrowband listening path): piecewise
// log-frequency gain applied in the FFT domain
static void irs_filter(std::vector<double>& x, int fs) {
  static const double pts[][2] = {
      {0, -200},   {50, -40},   {100, -20},  {125, -12},  {160, -6},
      {200, 0},    {250, 4},    {300, 6},    {350, 8},    {400, 10},
      {500, 11},   {600, 12},   {700, 12},   {800, 12},   {1000, 12},
      {1300, 12},  {1600, 12},  {2000, 12},  {2500, 12},  {3000, 12},
      {3250, 12},  {3500, 4},   {4000, -200}, {5000, -200},
      {6300, -200}, {8000, -200},
  };
  const int npts = sizeof(pts) / sizeof(pts[0]);
  size_t nfft = next_pow2(x.size());
  std::vector<double> re(nfft, 0.0), im(nfft, 0.0);
  std::copy(x.begin(), x.end(), re.begin());
  fft(re, im);
  size_t half = nfft / 2;
  for (size_t k = 0; k <= half; ++k) {
    double f = static_cast<double>(k) * fs / nfft;
    double gain_db;
    if (f <= pts[0][0]) {
      gain_db = pts[0][1];
    } else if (f >= pts[npts - 1][0]) {
      gain_db = pts[npts - 1][1];
    } else {
      int i = 0;
      while (i + 1 < npts && pts[i + 1][0] < f) ++i;
      double f0 = pts[i][0], f1 = pts[i + 1][0];
      double g0 = pts[i][1], g1 = pts[i + 1][1];
      gain_db = g0 + (g1 - g0) * (f - f0) / (f1 - f0);
    }
    double g = std::pow(10.0, gain_db / 20.0);
    re[k] *= g;
    im[k] *= g;
    if (k > 0 && k < half) {  // conjugate mirror
      re[nfft - k] *= g;
      im[nfft - k] *= g;
    }
  }
  ifft(re, im);
  for (size_t i = 0; i < x.size(); ++i) x[i] = re[i];
}

// raw-waveform FFT cross-correlation delay restricted to lags in
// [lo, hi], in samples. Maximizes the signed NORMALIZED cross-
// correlation (dot / sqrt(overlap energies), energies from prefix sums):
// unnormalized correlation carries an overlap-length bias that lets a
// pitch-period alias with more overlap beat the true lag on periodic
// signals (measured on a shifted 500 Hz burst tone: raw |corr| picked an
// anti-phase lag 80 off, raw signed corr an in-phase alias 96 off; NCC
// recovers the exact shift). Signed (not |.|): a polarity-inverted
// degraded path then aligns at its maximum-similarity offset, the right
// answer for the disturbance model.
static int xcorr_delay(const std::vector<double>& r,
                       const std::vector<double>& d, int lo, int hi) {
  size_t nfft = next_pow2(r.size() + d.size());
  std::vector<double> ar(nfft, 0.0), ai(nfft, 0.0), br(nfft, 0.0),
      bi(nfft, 0.0);
  std::copy(r.begin(), r.end(), ar.begin());
  std::copy(d.begin(), d.end(), br.begin());
  fft(ar, ai);
  fft(br, bi);
  for (size_t k = 0; k < nfft; ++k) {  // conj(R) * D
    double xr = ar[k] * br[k] + ai[k] * bi[k];
    double xi = ar[k] * bi[k] - ai[k] * br[k];
    ar[k] = xr;
    ai[k] = xi;
  }
  ifft(ar, ai);
  const int nr = static_cast<int>(r.size()), ndg = static_cast<int>(d.size());
  std::vector<double> pr(nr + 1, 0.0), pd(ndg + 1, 0.0);
  for (int i = 0; i < nr; ++i) pr[i + 1] = pr[i] + r[i] * r[i];
  for (int i = 0; i < ndg; ++i) pd[i + 1] = pd[i] + d[i] * d[i];
  int best = lo;
  double best_v = -std::numeric_limits<double>::infinity();
  for (int lag = lo; lag <= hi; ++lag) {
    const int i0 = std::max(0, -lag), i1 = std::min(nr, ndg - lag);
    if (i1 - i0 < 8) continue;  // no meaningful overlap at this lag
    const double er = pr[i1] - pr[i0];
    const double ed = pd[i1 + lag] - pd[i0 + lag];
    if (er <= 0.0 || ed <= 0.0) continue;
    size_t idx = lag >= 0 ? static_cast<size_t>(lag) : nfft + lag;
    const double v = ar[idx] / std::sqrt(er * ed);
    if (v > best_v) {
      best_v = v;
      best = lag;
    }
  }
  return best;
}

// whole-signal crude delay, P.862 crude_align structure: cross-correlate
// 4 ms LOG-ENERGY ENVELOPES (ITU's crude_align correlates per-frame VAD
// log energies, not waveforms — a periodic waveform's raw
// autocorrelation repeats every pitch period, but its energy envelope is
// aperiodic), then refine to sample resolution with a raw-waveform
// search limited to ±4 frames around the envelope estimate. Signals too
// short for an envelope (< 8 frames) fall back to the full-range raw
// search.
static int estimate_delay(const std::vector<double>& r,
                          const std::vector<double>& d, int fs,
                          int max_lag) {
  const int sub = std::max(1, fs / 250);  // 4 ms frames
  const int nr = static_cast<int>(r.size()) / sub;
  const int nd = static_cast<int>(d.size()) / sub;
  if (nr < 8 || nd < 8) return xcorr_delay(r, d, -max_lag, max_lag);

  auto envelope = [sub](const std::vector<double>& x, int n) {
    std::vector<double> e(n);
    double mean_e = 0.0;
    for (int i = 0; i < n; ++i) {
      double acc = 0.0;
      for (int j = 0; j < sub; ++j) acc += x[i * sub + j] * x[i * sub + j];
      e[i] = acc;
      mean_e += acc;
    }
    mean_e /= n;
    // VAD-thresholded log energy (ITU crude_align correlates VAD arrays):
    // sub-threshold frames contribute EXACTLY zero, so the log of a noisy
    // near-silence floor cannot wander the correlation peak
    const double thr = std::max(mean_e / 10.0, 1e-300);
    for (int i = 0; i < n; ++i)
      e[i] = e[i] > thr ? std::log(e[i] / thr) : 0.0;
    return e;
  };
  std::vector<double> er = envelope(r, nr), ed = envelope(d, nd);

  size_t nfft = next_pow2(static_cast<size_t>(nr + nd));
  std::vector<double> ar(nfft, 0.0), ai(nfft, 0.0), br(nfft, 0.0),
      bi(nfft, 0.0);
  std::copy(er.begin(), er.end(), ar.begin());
  std::copy(ed.begin(), ed.end(), br.begin());
  fft(ar, ai);
  fft(br, bi);
  for (size_t k = 0; k < nfft; ++k) {  // conj(Er) * Ed
    double xr = ar[k] * br[k] + ai[k] * bi[k];
    double xi = ar[k] * bi[k] - ai[k] * br[k];
    ar[k] = xr;
    ai[k] = xi;
  }
  ifft(ar, ai);
  const int fmax = std::min(max_lag / sub, std::min(nr, nd) - 1);
  int best_f = 0;
  double best_v = -std::numeric_limits<double>::infinity();
  for (int lag = -fmax; lag <= fmax; ++lag) {
    size_t idx = lag >= 0 ? static_cast<size_t>(lag) : nfft + lag;
    // signed max: envelopes are polarity-invariant, and the anti-
    // correlated lag an |.| could pick is always a misalignment
    if (ar[idx] > best_v) {
      best_v = ar[idx];
      best_f = lag;
    }
  }
  const int base = best_f * sub;
  const int lo = std::max(-max_lag, base - 4 * sub);
  const int hi = std::min(max_lag, base + 4 * sub);
  return xcorr_delay(r, d, lo, hi);
}

// --------------------------------------------- utterance time alignment
// P.862 refines the crude whole-signal delay per UTTERANCE (speech
// sections of the reference found by a crude energy VAD), so the degraded
// signal's delay may vary across the file (codec time warping, packet
// loss). Reproduced here: 4 ms subframe energy VAD with 200 ms gap
// joining and 64 ms minimum section, then a bounded normalized-cross-
// correlation search around the crude delay per utterance with a
// confidence gate (falls back to the crude delay when correlation is
// weak), plus recursive splitting where the delay jumps inside an
// utterance (align_utterance below). The deviation envelope vs the ITU
// code is frozen as golden regressions in tests/test_native.py.

struct Utterance {
  int start;
  int end;  // [start, end) in samples
};

static std::vector<Utterance> detect_utterances(const std::vector<double>& r,
                                                int fs) {
  const int sub = std::max(1, fs / 250);  // 4 ms subframes
  const int n_sub = static_cast<int>(r.size()) / sub;
  if (n_sub == 0) return {};
  std::vector<double> e(n_sub, 0.0);
  double mean_e = 0.0;
  for (int i = 0; i < n_sub; ++i) {
    double acc = 0.0;
    for (int j = 0; j < sub; ++j) acc += r[i * sub + j] * r[i * sub + j];
    e[i] = acc;
    mean_e += acc;
  }
  mean_e /= n_sub;
  const double thr = mean_e / 10.0;
  const int join = 50;     // 200 ms: speech sections closer than this merge
  const int min_len = 16;  // 64 ms minimum utterance
  std::vector<Utterance> utts;
  int i = 0;
  while (i < n_sub) {
    if (e[i] <= thr) {
      ++i;
      continue;
    }
    int s = i, last_speech = i;
    while (i < n_sub && (e[i] > thr || i - last_speech <= join)) {
      if (e[i] > thr) last_speech = i;
      ++i;
    }
    if (last_speech - s + 1 >= min_len)
      utts.push_back({s * sub, (last_speech + 1) * sub});
  }
  return utts;
}

// bounded NCC search for one utterance's delay around `base`; returns
// false (keep the crude delay) when the best correlation is weak.
// The numerator for ALL candidate lags comes from one FFT
// cross-correlation of the reference utterance against a zero-filled
// degraded window (the brute-force scan was O(margin*len) ~ 1e8 MACs per
// 2 s utterance and dominated PESQ cost); per-lag degraded energies come
// from a prefix-sum of d^2. NCC values match the direct sums to fp
// rounding (~1e-12 relative), pinned by the golden MOS table.
static bool refine_delay(const std::vector<double>& r,
                         const std::vector<double>& d, const Utterance& u,
                         int base, int margin, int* out) {
  const int n = static_cast<int>(r.size());
  const int nd = static_cast<int>(d.size());
  const int us = std::max(0, u.start), ue = std::min(u.end, n);
  const int len = ue - us;
  if (len < 64) return false;
  double er = 0.0;
  for (int t = us; t < ue; ++t) er += r[t] * r[t];
  if (er <= 0.0) return false;

  // degraded window covering every candidate alignment; out-of-range
  // samples are zero, matching the brute-force loop's range clamping
  const int off = us + base - margin;  // d index of correlation shift 0
  const int wlen = len + 2 * margin;
  // largest index read is s + i <= 2*margin + len - 1 < wlen, so the
  // circular correlation never wraps at nfft = next_pow2(wlen)
  size_t nfft = next_pow2(static_cast<size_t>(wlen));
  std::vector<double> ar(nfft, 0.0), ai(nfft, 0.0), br(nfft, 0.0),
      bi(nfft, 0.0);
  for (int i = 0; i < len; ++i) ar[i] = r[us + i];
  for (int j = 0; j < wlen; ++j) {
    const int t = off + j;
    if (t >= 0 && t < nd) br[j] = d[t];
  }
  fft(ar, ai);
  fft(br, bi);
  for (size_t k = 0; k < nfft; ++k) {  // conj(Rseg) * Dwin
    const double xr = ar[k] * br[k] + ai[k] * bi[k];
    const double xi = ar[k] * bi[k] - ai[k] * br[k];
    ar[k] = xr;
    ai[k] = xi;
  }
  ifft(ar, ai);  // ar[s] = sum_i rseg[i] * dwin[s + i]

  std::vector<double> pref(nd + 1, 0.0);
  for (int t = 0; t < nd; ++t) pref[t + 1] = pref[t] + d[t] * d[t];

  double best = -1.0;
  int best_lag = base;
  for (int lag = base - margin; lag <= base + margin; ++lag) {
    const int lo = std::max(us + lag, 0), hi = std::min(ue + lag, nd);
    if (hi - lo < len / 2) continue;
    const double ed = pref[hi] - pref[lo];
    if (ed <= 0.0) continue;
    const double dot = ar[lag - base + margin];
    const double ncc = dot / std::sqrt(er * ed);
    if (ncc > best) {
      best = ncc;
      best_lag = lag;
    }
  }
  if (best < 0.3) return false;
  *out = best_lag;
  return true;
}

// align one utterance, splitting it where the delay jumps INSIDE it
// (P.862 utterance_split: codec time warping / mid-stream delay changes
// make one VAD utterance carry two alignments). Approximated as a
// confidence-gated recursive binary split at the midpoint instead of the
// ITU's exhaustive best-split-point search: if both halves refine
// confidently to delays more than one 4 ms frame apart, each half is
// aligned (and possibly split) on its own; otherwise the whole utterance
// gets its single refined delay, and a weak correlation keeps the crude
// delay the caller pre-filled.
static void align_utterance(const std::vector<double>& r,
                            const std::vector<double>& d, const Utterance& u,
                            int base, int margin, int fs,
                            std::vector<int>* dmap, int depth = 0) {
  int refined = base;
  const bool ok = refine_delay(r, d, u, base, margin, &refined);
  const int len = u.end - u.start;
  const int min_half = fs / 5;  // 200 ms: don't split below VAD scale
  if (ok && depth < 4 && len >= 2 * min_half) {
    const int mid = u.start + len / 2;
    const Utterance left{u.start, mid}, right{mid, u.end};
    int dl = refined, dr = refined;
    const int jump = std::max(1, fs / 250);
    if (refine_delay(r, d, left, refined, margin, &dl) &&
        refine_delay(r, d, right, refined, margin, &dr) &&
        std::abs(dl - dr) > jump) {
      align_utterance(r, d, left, dl, margin, fs, dmap, depth + 1);
      align_utterance(r, d, right, dr, margin, fs, dmap, depth + 1);
      return;
    }
  }
  if (ok)
    for (int t = u.start; t < u.end && t < static_cast<int>(dmap->size()); ++t)
      (*dmap)[t] = refined;
}

// ------------------------------------------------------ perceptual model
// power spectra of hann-windowed frames -> bark band powers, Sp-scaled
static std::vector<std::vector<double>> bark_frames(
    const std::vector<double>& x, int fs, int frame, int hop, int nfft,
    const BarkMap& map, double sp, int n_frames = -1,
    const std::vector<int>* offsets = nullptr) {
  // offsets: per-frame start shift in samples (the utterance-alignment
  // delay map applied to the degraded signal); out-of-range samples read 0
  std::vector<double> win(frame);
  for (int i = 0; i < frame; ++i)
    win[i] = 0.5 * (1.0 - std::cos(2.0 * kPi * i / frame));
  int n = static_cast<int>(x.size());
  if (n_frames < 0) n_frames = n >= frame ? (n - frame) / hop + 1 : 0;
  std::vector<std::vector<double>> out(
      n_frames, std::vector<double>(map.n_bands, 0.0));
  std::vector<double> re(nfft), im(nfft);
  for (int t = 0; t < n_frames; ++t) {
    std::fill(re.begin(), re.end(), 0.0);
    std::fill(im.begin(), im.end(), 0.0);
    const int start = t * hop + (offsets ? (*offsets)[t] : 0);
    for (int i = 0; i < frame; ++i) {
      const int idx = start + i;
      if (idx >= 0 && idx < n) re[i] = x[idx] * win[i];
    }
    fft(re, im);
    for (int b = 0; b < map.n_bands; ++b) {
      double p = 0.0;
      for (int k : map.bins[b]) p += re[k] * re[k] + im[k] * im[k];
      out[t][b] = p * map.pow_corr[b] * sp;
    }
  }
  return out;
}

// total power of audible bands (above factor * absolute threshold)
static double total_audible(const std::vector<double>& band_pow,
                            const BarkMap& map, double factor) {
  double acc = 0.0;
  for (int b = 1; b < map.n_bands; ++b)
    if (band_pow[b] > factor * map.thresh_pow[b]) acc += band_pow[b];
  return acc;
}

// Zwicker loudness density per band (Sl scale, low-band modified exponent)
static void loudness_dens(const std::vector<double>& band_pow,
                          const BarkMap& map, std::vector<double>& out) {
  out.assign(map.n_bands, 0.0);
  for (int b = 0; b < map.n_bands; ++b) {
    double p0 = map.thresh_pow[b];
    double zw = kZwicker;
    double z = map.centre_bark[b];
    if (z < 4.0) {
      double h = 6.0 / (z + 2.0);
      if (h > 2.0) h = 2.0;
      zw = kZwicker * std::pow(h, 0.15);
    }
    double base = std::pow(p0 / 0.5, zw);
    double v = std::pow(0.5 + 0.5 * band_pow[b] / p0, zw) - 1.0;
    out[b] = v > 0.0 ? kSl * base * v : 0.0;
  }
}

// weighted pseudo-Lp over bark widths (ITU pseudo_Lp)
static double pseudo_lp(const std::vector<double>& x, const BarkMap& map,
                        double p) {
  double acc = 0.0, wsum = 0.0;
  for (int b = 1; b < map.n_bands; ++b) {
    double w = map.width_bark[b];
    acc += std::pow(std::fabs(x[b]) * w, p);
    wsum += w;
  }
  if (wsum <= 0.0) return 0.0;
  return std::pow(acc / wsum, 1.0 / p) * wsum;
}

// Lp mean over a vector with equal weights
static double lp_mean(const std::vector<double>& v, double p) {
  if (v.empty()) return 0.0;
  double acc = 0.0;
  for (double x : v) acc += std::pow(std::fabs(x), p);
  return std::pow(acc / v.size(), 1.0 / p);
}

// --------------------------------------------------------------- main
// returns raw P.862 MOS in [-0.5, 4.5]
double pesq_score(const float* ref_in, const float* deg_in, int n, int fs,
                  bool utt_align = true) {
  if (n < fs / 4) return -0.5;  // too short
  const int frame = (fs >= 16000) ? 512 : 256;
  const int hop = frame / 2;
  const int nfft = frame;
  const double sp = (fs >= 16000) ? kSp16k : kSp8k;
  BarkMap map = make_bark_map(fs, nfft);

  std::vector<double> r(ref_in, ref_in + n), d(deg_in, deg_in + n);

  // ---- level alignment: 1e7 power in the 350-3250 Hz band ----
  const double target_pow = 1e7;
  double pr = band_power(r, fs, 350.0, 3250.0);
  double pd = band_power(d, fs, 350.0, 3250.0);
  if (pr <= 0.0 || pd <= 0.0) return -0.5;
  double sr = std::sqrt(target_pow / pr), sd = std::sqrt(target_pow / pd);
  for (auto& v : r) v *= sr;
  for (auto& v : d) v *= sd;

  // ---- IRS receive filtering (both paths) ----
  irs_filter(r, fs);
  irs_filter(d, fs);

  // ---- time alignment: crude whole-signal cross-correlation delay,
  // refined per speech utterance (P.862 utterance realignment) ----
  int max_lag = std::min(n / 4, fs / 2);
  int delay = estimate_delay(r, d, fs, max_lag);
  std::vector<int> dmap(r.size(), delay);
  if (utt_align) {
    const int margin = fs * 3 / 40;  // ±75 ms fine search window
    for (const Utterance& u : detect_utterances(r, fs))
      align_utterance(r, d, u, delay, margin, fs, &dmap);
  }

  // frame the REFERENCE timeline; each degraded frame reads at the
  // ref-frame start plus that frame's (center-sample) delay, zero-padded
  // outside the signal — with one global delay this reduces to the
  // whole-signal shift. Zero-padding (not truncating to the overlap) is
  // deliberate and matches ITU P.862's own C code, which appends
  // DATAPADDING_MSECS of zeros and lets delayed degraded reads fall into
  // that padding: ref speech whose degraded counterpart was pushed past
  // the end of the file is genuinely lost content and scores as
  // disturbance.
  int T = (int)r.size() >= frame ? ((int)r.size() - frame) / hop + 1 : 0;
  if (T < 4) return -0.5;
  std::vector<int> offs(T);
  for (int t = 0; t < T; ++t)
    offs[t] = dmap[std::min((int)r.size() - 1, t * hop + frame / 2)];
  auto rb = bark_frames(r, fs, frame, hop, nfft, map, sp);
  auto db = bark_frames(d, fs, frame, hop, nfft, map, sp, T, &offs);
  int B = map.n_bands;

  // ---- silent-frame detection (ITU: audible power < 1e7 at factor 100)
  std::vector<bool> active(T);
  std::vector<double> frame_audible(T, 0.0);
  int n_active = 0;
  for (int t = 0; t < T; ++t) {
    frame_audible[t] = total_audible(rb[t], map, 1.0);
    active[t] = total_audible(rb[t], map, 100.0) >= 1e7;
    n_active += active[t];
  }
  if (n_active < 2) return -0.5;

  // ---- partial frequency compensation (linear-filtering invariance):
  // per band, scale the reference toward the degraded time-average
  // (+1000 floor, bounded [0.01, 100] — P.862 partial compensation)
  for (int b = 0; b < B; ++b) {
    double mr = 0.0, md = 0.0;
    for (int t = 0; t < T; ++t)
      if (active[t]) {
        mr += rb[t][b];
        md += db[t][b];
      }
    mr /= std::max(1, n_active);
    md /= std::max(1, n_active);
    double factor = (md + 1000.0) / (mr + 1000.0);
    factor = std::min(100.0, std::max(0.01, factor));
    for (int t = 0; t < T; ++t) rb[t][b] *= factor;
  }

  // ---- partial gain compensation (short-term AGC on the degraded
  // signal): +5e3 floor, bounded [3e-4, 5], first-order smoothed
  double gain_smooth = 1.0;
  for (int t = 0; t < T; ++t) {
    double ra = 5e3 + total_audible(rb[t], map, 1.0);
    double da = 5e3 + total_audible(db[t], map, 1.0);
    double g = ra / da;
    g = std::min(5.0, std::max(3e-4, g));
    gain_smooth = 0.8 * gain_smooth + 0.2 * g;
    for (int b = 0; b < B; ++b) db[t][b] *= gain_smooth;
  }

  // ---- loudness + disturbance per frame ----
  std::vector<double> d_frame(T, 0.0), da_frame(T, 0.0);
  std::vector<double> lr(B), ld(B), dist(B), dist_a(B);
  for (int t = 0; t < T; ++t) {
    loudness_dens(rb[t], map, lr);
    loudness_dens(db[t], map, ld);
    for (int b = 0; b < B; ++b) {
      double diff = ld[b] - lr[b];
      double m = 0.25 * std::min(lr[b], ld[b]);  // masking
      if (diff > m)
        dist[b] = diff - m;
      else if (diff < -m)
        dist[b] = diff + m;
      else
        dist[b] = 0.0;
      // asymmetry: additive distortions weigh more than omissions
      double af = std::pow((db[t][b] + 50.0) / (rb[t][b] + 50.0), 1.2);
      if (af < 3.0)
        af = 0.0;
      else if (af > 12.0)
        af = 12.0;
      dist_a[b] = dist[b] * af;
    }
    double h = std::pow((frame_audible[t] + 1e5) / 1e7, 0.04);
    d_frame[t] = std::min(pseudo_lp(dist, map, 2.0) / h, 45.0);
    da_frame[t] = std::min(pseudo_lp(dist_a, map, 1.0) / h, 45.0);
  }

  // ---- two-stage aggregation: L6 over 20-frame syllables (50% overlap),
  // then L2 over syllables. Only speech-active frames contribute (the
  // ITU model scores within utterance boundaries; silent-reference
  // frames would otherwise saturate the asymmetry factor) ----
  auto aggregate = [&](const std::vector<double>& v, double p1, double p2) {
    const int chunk = 20;
    std::vector<double> chunks;
    for (int start = 0; start < T; start += chunk / 2) {
      double acc = 0.0;
      int cnt = 0;
      for (int t = start; t < std::min(T, start + chunk); ++t) {
        if (!active[t]) continue;
        acc += std::pow(v[t], p1);
        cnt++;
      }
      if (cnt) chunks.push_back(std::pow(acc / cnt, 1.0 / p1));
    }
    return lp_mean(chunks, p2);
  };

  double D = aggregate(d_frame, 6.0, 2.0);
  double DA = aggregate(da_frame, 1.0, 2.0);

  if (std::getenv("RTFS_PESQ_DEBUG")) {
    std::fprintf(stderr, "delay=%d D=%g DA=%g\n", delay, D, DA);
  }
  // raw P.862 MOS map (published constants)
  double mos = 4.5 - 0.1 * D - 0.0309 * DA;
  return std::min(4.5, std::max(-0.5, mos));
}

}  // namespace rtfs_native

extern "C" {
double rtfs_pesq_score(const float* ref, const float* deg, int n, int fs) {
  return rtfs_native::pesq_score(ref, deg, n, fs);
}

// utt_align=0 disables the per-utterance realignment (crude whole-signal
// delay only) — exposed so tests can demonstrate the alignment stage
double rtfs_pesq_score_opts(const float* ref, const float* deg, int n,
                            int fs, int utt_align) {
  return rtfs_native::pesq_score(ref, deg, n, fs, utt_align != 0);
}

// alignment probe for tests: the crude whole-signal delay estimate (4 ms
// log-energy envelope correlation refined to sample resolution), in
// samples to ADD to a reference index to read its degraded counterpart.
// Runs on the raw signals (no level/IRS preprocessing — those are
// per-sample scalings and a linear filter applied to BOTH paths, which
// leave the correlation peak location unchanged).
int rtfs_pesq_crude_delay(const float* ref, const float* deg, int n,
                          int fs) {
  std::vector<double> r(ref, ref + n), d(deg, deg + n);
  const int max_lag = std::min(n / 4, fs / 2);
  return rtfs_native::estimate_delay(r, d, fs, max_lag);
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
