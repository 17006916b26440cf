// Native host-side DSP for the preprocessing pipeline.
//
// The reference delegates host DSP to librosa/pyworld (C libraries under
// python); this library is our equivalent native layer: framing + rFFT
// magnitude + mel filterbank + YIN pitch, exposed with a plain C ABI
// consumed via ctypes (parakeet_tpu/native/__init__.py).  Used by the
// preprocess recipes where per-utterance feature extraction dominates
// wall-clock; numerics match the numpy implementations in
// parakeet_tpu/audio (same window, same filterbank).
//
// Build: make -C native   (-> native/libparakeet_dsp.so)

#include <cmath>
#include <complex>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr double kPi = 3.14159265358979323846;

// Iterative radix-2 complex FFT, in place.  n must be a power of two.
void fft_inplace(std::complex<double>* a, int n, bool inverse) {
  // bit reversal
  for (int i = 1, j = 0; i < n; ++i) {
    int bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) std::swap(a[i], a[j]);
  }
  for (int len = 2; len <= n; len <<= 1) {
    double ang = 2.0 * kPi / len * (inverse ? 1.0 : -1.0);
    std::complex<double> wlen(std::cos(ang), std::sin(ang));
    for (int i = 0; i < n; i += len) {
      std::complex<double> w(1.0);
      for (int k = 0; k < len / 2; ++k) {
        std::complex<double> u = a[i + k];
        std::complex<double> v = a[i + k + len / 2] * w;
        a[i + k] = u + v;
        a[i + k + len / 2] = u - v;
        w *= wlen;
      }
    }
  }
  if (inverse) {
    for (int i = 0; i < n; ++i) a[i] /= n;
  }
}

void hann_window(double* w, int win_length) {
  // periodic Hann (matches numpy/scipy get_window("hann", n, fftbins=True))
  for (int i = 0; i < win_length; ++i)
    w[i] = 0.5 - 0.5 * std::cos(2.0 * kPi * i / win_length);
}

inline double reflect_index(int64_t i, int64_t t) {
  // numpy 'reflect' (no edge duplication) for arbitrary out-of-range i
  if (t == 1) return 0;
  int64_t period = 2 * (t - 1);
  int64_t j = i % period;
  if (j < 0) j += period;
  return j < t ? j : period - j;
}

}  // namespace

extern "C" {

// STFT magnitude: wav (T,) float32 -> out (n_frames, n_fft/2+1) float32.
// center=1 reflect-pads by n_fft/2.  Window: periodic Hann of win_length
// zero-padded centered to n_fft.  Returns n_frames.
int64_t pk_stft_magnitude(const float* wav, int64_t t, int64_t n_fft,
                          int64_t hop, int64_t win_length, int center,
                          float* out) {
  if (n_fft <= 0 || (n_fft & (n_fft - 1)) != 0) return -1;
  int64_t pad = center ? n_fft / 2 : 0;
  int64_t total = t + 2 * pad;
  if (total < n_fft) return -2;
  int64_t n_frames = 1 + (total - n_fft) / hop;
  int64_t n_bins = n_fft / 2 + 1;

  std::vector<double> win(n_fft, 0.0);
  {
    std::vector<double> w(win_length);
    hann_window(w.data(), win_length);
    int64_t lpad = (n_fft - win_length) / 2;
    for (int64_t i = 0; i < win_length; ++i) win[lpad + i] = w[i];
  }

  std::vector<std::complex<double>> buf(n_fft);
  for (int64_t f = 0; f < n_frames; ++f) {
    int64_t start = f * hop - pad;
    for (int64_t i = 0; i < n_fft; ++i) {
      int64_t src = start + i;
      double v;
      if (src < 0 || src >= t) {
        v = center ? wav[(int64_t)reflect_index(src, t)] : 0.0;
      } else {
        v = wav[src];
      }
      buf[i] = std::complex<double>(v * win[i], 0.0);
    }
    fft_inplace(buf.data(), (int)n_fft, false);
    float* row = out + f * n_bins;
    for (int64_t k = 0; k < n_bins; ++k) row[k] = (float)std::abs(buf[k]);
  }
  return n_frames;
}

// out (n_frames, n_mels) = spec (n_frames, n_bins) @ fb^T (n_mels, n_bins)
void pk_apply_mel(const float* spec, int64_t n_frames, int64_t n_bins,
                  const float* fb, int64_t n_mels, float* out) {
  for (int64_t f = 0; f < n_frames; ++f) {
    const float* s = spec + f * n_bins;
    float* o = out + f * n_mels;
    for (int64_t m = 0; m < n_mels; ++m) {
      const float* w = fb + m * n_bins;
      double acc = 0.0;
      for (int64_t k = 0; k < n_bins; ++k) acc += (double)s[k] * w[k];
      o[m] = (float)acc;
    }
  }
}

// YIN pitch: wav (T,) -> f0 (n_frames,) in Hz, 0 = unvoiced.
// frame_length must be a power of two (difference function via FFT
// autocorrelation over a frame_length/2 correlation window).
int64_t pk_yin_pitch(const float* wav, int64_t t, int64_t sr,
                     int64_t frame_length, int64_t hop, double f0min,
                     double f0max, double threshold, float* out) {
  if (frame_length <= 0 || (frame_length & (frame_length - 1)) != 0)
    return -1;
  int64_t w = frame_length / 2;
  int64_t tau_min = (int64_t)(sr / f0max);
  if (tau_min < 2) tau_min = 2;
  int64_t tau_max = (int64_t)std::ceil(sr / f0min) + 1;
  if (tau_max > w) tau_max = w;
  int64_t pad = frame_length / 2;
  int64_t total = t + 2 * pad;
  int64_t n_frames = 1 + (total - frame_length) / hop;

  int64_t nfft = 2 * frame_length;  // linear autocorrelation
  std::vector<std::complex<double>> buf(nfft);
  std::vector<double> frame(frame_length);
  std::vector<double> d(tau_max + 1), cmnd(tau_max + 1);

  for (int64_t f = 0; f < n_frames; ++f) {
    int64_t start = f * hop - pad;
    for (int64_t i = 0; i < frame_length; ++i) {
      int64_t src = start + i;
      frame[i] = (src < 0 || src >= t) ? 0.0 : wav[src];
    }
    // autocorrelation via FFT
    for (int64_t i = 0; i < nfft; ++i)
      buf[i] = std::complex<double>(i < frame_length ? frame[i] : 0.0, 0.0);
    fft_inplace(buf.data(), (int)nfft, false);
    for (int64_t i = 0; i < nfft; ++i) buf[i] *= std::conj(buf[i]);
    fft_inplace(buf.data(), (int)nfft, true);

    // cumulative energies: e(tau) = sum_{j<w} x_{j+tau}^2
    double e0 = 0.0;
    for (int64_t j = 0; j < w; ++j) e0 += frame[j] * frame[j];
    // difference function d(tau) = e_head + e_tau - 2 r(tau)
    double e_tau = e0;
    d[0] = 0.0;
    for (int64_t tau = 1; tau <= tau_max; ++tau) {
      e_tau += frame[w + tau - 1] * frame[w + tau - 1]
               - frame[tau - 1] * frame[tau - 1];
      // r(tau) over window w: via full autocorr approximation
      double r = 0.0;
      for (int64_t j = 0; j < w; ++j) r += frame[j] * frame[j + tau];
      d[tau] = e0 + e_tau - 2.0 * r;
      if (d[tau] < 0) d[tau] = 0;
    }
    // cumulative mean normalized difference
    double run = 0.0;
    cmnd[0] = 1.0;
    for (int64_t tau = 1; tau <= tau_max; ++tau) {
      run += d[tau];
      cmnd[tau] = run > 0 ? d[tau] * tau / run : 1.0;
    }
    // first dip below threshold in [tau_min, tau_max]
    int64_t best = -1;
    for (int64_t tau = tau_min; tau < tau_max; ++tau) {
      if (cmnd[tau] < threshold) {
        while (tau + 1 < tau_max && cmnd[tau + 1] < cmnd[tau]) ++tau;
        best = tau;
        break;
      }
    }
    if (best < 0) {
      // fallback: global minimum if convincingly periodic
      double mn = 1e30;
      int64_t arg = -1;
      for (int64_t tau = tau_min; tau < tau_max; ++tau)
        if (cmnd[tau] < mn) { mn = cmnd[tau]; arg = tau; }
      if (mn < 2.0 * threshold) best = arg;
    }
    if (best > 0) {
      // parabolic interpolation around the dip
      double better = (double)best;
      if (best > 1 && best + 1 <= tau_max) {
        double s0 = cmnd[best - 1], s1 = cmnd[best], s2 = cmnd[best + 1];
        double denom = 2.0 * (2.0 * s1 - s2 - s0);
        if (std::fabs(denom) > 1e-12) better += (s2 - s0) / denom;
      }
      out[f] = (float)(sr / better);
    } else {
      out[f] = 0.0f;
    }
  }
  return n_frames;
}

}  // extern "C"
