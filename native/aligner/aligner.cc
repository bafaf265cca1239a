// Clean-room monophone forced aligner (C++17, no external deps).
//
// Replaces the reference's HTK toolchain (tools/HTKTools: HCopy feature
// extraction + HVite Viterbi forced alignment driven by
// espnet2/bin/align_english.py) with a self-contained pipeline:
//
//   waveform -> MFCC(+delta+delta2, CMN)            [HCopy analogue]
//   corpus   -> flat-start + Viterbi-EM training    [HCompV/HERest-lite]
//   (feats, phone ids) -> Viterbi forced alignment  [HVite analogue]
//
// Acoustic model: per-phone left-to-right HMM with N_STATES emitting
// states, each a diagonal-covariance single-Gaussian (upgradable to GMM by
// state splitting; single Gaussians are sufficient for forced alignment of
// clean speech and train in seconds).
//
// The C ABI at the bottom is consumed from Python via ctypes
// (a3t_tpu/align/native.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <limits>
#include <string>
#include <vector>

namespace {

constexpr float kLogZero = -1e30f;

// ---------------------------------------------------------------------------
// MFCC front-end
// ---------------------------------------------------------------------------

struct MfccConfig {
  int sample_rate = 16000;
  float frame_ms = 25.0f;
  float shift_ms = 10.0f;
  int n_fft = 512;
  int n_mels = 26;
  int n_ceps = 13;
  float preemph = 0.97f;
  float fmin = 20.0f;
  float fmax = 7800.0f;
  bool add_deltas = true;
  bool cmn = true;

  int feat_dim() const { return add_deltas ? n_ceps * 3 : n_ceps; }
  int hop() const { return static_cast<int>(sample_rate * shift_ms / 1000.f); }
  int win() const { return static_cast<int>(sample_rate * frame_ms / 1000.f); }
};

float hz_to_mel(float f) { return 2595.0f * std::log10(1.0f + f / 700.0f); }
float mel_to_hz(float m) { return 700.0f * (std::pow(10.0f, m / 2595.0f) - 1.0f); }

// In-place iterative radix-2 FFT (real input packed as complex).
void fft(std::vector<float>& re, std::vector<float>& im) {
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
    const float ang = -2.0f * static_cast<float>(M_PI) / len;
    const float wr = std::cos(ang), wi = std::sin(ang);
    for (size_t i = 0; i < n; i += len) {
      float cr = 1.0f, ci = 0.0f;
      for (size_t k = 0; k < len / 2; ++k) {
        const float ur = re[i + k], ui = im[i + k];
        const float vr = re[i + k + len / 2] * cr - im[i + k + len / 2] * ci;
        const float vi = re[i + k + len / 2] * ci + im[i + k + len / 2] * cr;
        re[i + k] = ur + vr;
        im[i + k] = ui + vi;
        re[i + k + len / 2] = ur - vr;
        im[i + k + len / 2] = ui - vi;
        const float ncr = cr * wr - ci * wi;
        ci = cr * wi + ci * wr;
        cr = ncr;
      }
    }
  }
}

class MfccExtractor {
 public:
  explicit MfccExtractor(const MfccConfig& cfg) : cfg_(cfg) {
    build_mel_bank();
    build_dct();
    window_.resize(cfg_.win());
    for (int i = 0; i < cfg_.win(); ++i) {
      window_[i] = 0.54f - 0.46f * std::cos(2.0f * M_PI * i / (cfg_.win() - 1));
    }
  }

  // samples (n,) float in [-1,1] -> feats (n_frames * feat_dim) row-major.
  std::vector<float> extract(const float* samples, int64_t n,
                             int* out_frames) const {
    const int hop = cfg_.hop(), win = cfg_.win();
    const int n_frames = n < win ? 0 : 1 + static_cast<int>((n - win) / hop);
    *out_frames = n_frames;
    const int n_bins = cfg_.n_fft / 2 + 1;
    std::vector<float> static_feats(
        static_cast<size_t>(n_frames) * cfg_.n_ceps);

    std::vector<float> re(cfg_.n_fft), im(cfg_.n_fft);
    std::vector<float> power(n_bins), mel(cfg_.n_mels);
    for (int t = 0; t < n_frames; ++t) {
      const float* frame = samples + static_cast<int64_t>(t) * hop;
      std::fill(re.begin(), re.end(), 0.0f);
      std::fill(im.begin(), im.end(), 0.0f);
      // pre-emphasis + window
      for (int i = 0; i < win; ++i) {
        const float prev = (i == 0) ? (t == 0 ? frame[0] : frame[-1]) : frame[i - 1];
        re[i] = (frame[i] - cfg_.preemph * prev) * window_[i];
      }
      fft(re, im);
      for (int k = 0; k < n_bins; ++k) {
        power[k] = re[k] * re[k] + im[k] * im[k];
      }
      for (int m = 0; m < cfg_.n_mels; ++m) {
        float acc = 0.0f;
        for (int k = bank_start_[m]; k < bank_end_[m]; ++k) {
          acc += bank_[m][k - bank_start_[m]] * power[k];
        }
        mel[m] = std::log(std::max(acc, 1e-10f));
      }
      for (int c = 0; c < cfg_.n_ceps; ++c) {
        float acc = 0.0f;
        for (int m = 0; m < cfg_.n_mels; ++m) acc += dct_[c][m] * mel[m];
        static_feats[static_cast<size_t>(t) * cfg_.n_ceps + c] = acc;
      }
    }

    if (cfg_.cmn && n_frames > 0) {
      for (int c = 0; c < cfg_.n_ceps; ++c) {
        double mean = 0.0;
        for (int t = 0; t < n_frames; ++t)
          mean += static_feats[static_cast<size_t>(t) * cfg_.n_ceps + c];
        mean /= n_frames;
        for (int t = 0; t < n_frames; ++t)
          static_feats[static_cast<size_t>(t) * cfg_.n_ceps + c] -=
              static_cast<float>(mean);
      }
    }

    if (!cfg_.add_deltas) return static_feats;

    // delta + delta-delta (2-frame regression window)
    const int d = cfg_.feat_dim();
    std::vector<float> out(static_cast<size_t>(n_frames) * d);
    auto at = [&](const std::vector<float>& f, int t, int c) {
      t = std::clamp(t, 0, n_frames - 1);
      return f[static_cast<size_t>(t) * cfg_.n_ceps + c];
    };
    std::vector<float> delta(static_cast<size_t>(n_frames) * cfg_.n_ceps);
    for (int t = 0; t < n_frames; ++t) {
      for (int c = 0; c < cfg_.n_ceps; ++c) {
        const float num = (at(static_feats, t + 1, c) - at(static_feats, t - 1, c)) +
                          2.0f * (at(static_feats, t + 2, c) - at(static_feats, t - 2, c));
        delta[static_cast<size_t>(t) * cfg_.n_ceps + c] = num / 10.0f;
      }
    }
    for (int t = 0; t < n_frames; ++t) {
      for (int c = 0; c < cfg_.n_ceps; ++c) {
        out[static_cast<size_t>(t) * d + c] = at(static_feats, t, c);
        out[static_cast<size_t>(t) * d + cfg_.n_ceps + c] =
            delta[static_cast<size_t>(t) * cfg_.n_ceps + c];
        const float num = (at(delta, t + 1, c) - at(delta, t - 1, c)) +
                          2.0f * (at(delta, t + 2, c) - at(delta, t - 2, c));
        out[static_cast<size_t>(t) * d + 2 * cfg_.n_ceps + c] = num / 10.0f;
      }
    }
    return out;
  }

  const MfccConfig& config() const { return cfg_; }

 private:
  void build_mel_bank() {
    const int n_bins = cfg_.n_fft / 2 + 1;
    const float mel_lo = hz_to_mel(cfg_.fmin);
    const float mel_hi = hz_to_mel(std::min(cfg_.fmax, cfg_.sample_rate / 2.0f));
    std::vector<float> edges(cfg_.n_mels + 2);
    for (int i = 0; i < cfg_.n_mels + 2; ++i) {
      edges[i] = mel_to_hz(mel_lo + (mel_hi - mel_lo) * i / (cfg_.n_mels + 1));
    }
    bank_.resize(cfg_.n_mels);
    bank_start_.resize(cfg_.n_mels);
    bank_end_.resize(cfg_.n_mels);
    const float bin_hz = static_cast<float>(cfg_.sample_rate) / cfg_.n_fft;
    for (int m = 0; m < cfg_.n_mels; ++m) {
      const float lo = edges[m], mid = edges[m + 1], hi = edges[m + 2];
      int ks = std::max(0, static_cast<int>(std::ceil(lo / bin_hz)));
      int ke = std::min(n_bins, static_cast<int>(std::floor(hi / bin_hz)) + 1);
      bank_start_[m] = ks;
      bank_end_[m] = ke;
      bank_[m].resize(std::max(0, ke - ks));
      for (int k = ks; k < ke; ++k) {
        const float f = k * bin_hz;
        float w = 0.0f;
        if (f >= lo && f <= mid && mid > lo) w = (f - lo) / (mid - lo);
        else if (f > mid && f <= hi && hi > mid) w = (hi - f) / (hi - mid);
        bank_[m][k - ks] = w;
      }
    }
  }

  void build_dct() {
    dct_.assign(cfg_.n_ceps, std::vector<float>(cfg_.n_mels));
    const float norm = std::sqrt(2.0f / cfg_.n_mels);
    for (int c = 0; c < cfg_.n_ceps; ++c) {
      for (int m = 0; m < cfg_.n_mels; ++m) {
        dct_[c][m] = norm * std::cos(M_PI * c * (m + 0.5f) / cfg_.n_mels);
      }
    }
  }

  MfccConfig cfg_;
  std::vector<float> window_;
  std::vector<std::vector<float>> bank_;
  std::vector<int> bank_start_, bank_end_;
  std::vector<std::vector<float>> dct_;
};

// ---------------------------------------------------------------------------
// Monophone HMM set
// ---------------------------------------------------------------------------

struct GaussState {
  std::vector<float> mean;
  std::vector<float> var;
  float gconst = 0.0f;  // -0.5 * (D log 2pi + sum log var)

  void finalize() {
    double g = mean.size() * std::log(2.0 * M_PI);
    for (float v : var) g += std::log(v);
    gconst = static_cast<float>(-0.5 * g);
  }

  float loglike(const float* x) const {
    float acc = 0.0f;
    const size_t d = mean.size();
    for (size_t i = 0; i < d; ++i) {
      const float diff = x[i] - mean[i];
      acc += diff * diff / var[i];
    }
    return gconst - 0.5f * acc;
  }
};

// Diagonal GMM emission (HERest-style mixture splitting: states start as a
// single Gaussian and double via split_mixtures, like HTK's HHEd MU).
struct GmmState {
  std::vector<GaussState> comps;
  std::vector<float> log_w;

  float loglike(const float* x) const {
    float best = kLogZero;
    float sum = 0.0f;
    // log-sum-exp over components
    std::vector<float> ll(comps.size());
    for (size_t c = 0; c < comps.size(); ++c) {
      ll[c] = log_w[c] + comps[c].loglike(x);
      if (ll[c] > best) best = ll[c];
    }
    if (best <= kLogZero / 2) return kLogZero;
    for (float v : ll) sum += std::exp(v - best);
    return best + std::log(sum);
  }

  int best_comp(const float* x) const {
    int arg = 0;
    float best = kLogZero;
    for (size_t c = 0; c < comps.size(); ++c) {
      const float v = log_w[c] + comps[c].loglike(x);
      if (v > best) {
        best = v;
        arg = static_cast<int>(c);
      }
    }
    return arg;
  }

  void split() {
    const size_t n = comps.size();
    std::vector<GaussState> nc;
    std::vector<float> nw;
    for (size_t c = 0; c < n; ++c) {
      GaussState a = comps[c], b = comps[c];
      for (size_t i = 0; i < a.mean.size(); ++i) {
        const float off = 0.2f * std::sqrt(a.var[i]);
        a.mean[i] += off;
        b.mean[i] -= off;
      }
      a.finalize();
      b.finalize();
      nc.push_back(a);
      nc.push_back(b);
      nw.push_back(log_w[c] + std::log(0.5f));
      nw.push_back(log_w[c] + std::log(0.5f));
    }
    comps = std::move(nc);
    log_w = std::move(nw);
  }
};

struct Accumulator {
  std::vector<double> sum, sqsum;
  double count = 0.0;
  void init(size_t d) {
    sum.assign(d, 0.0);
    sqsum.assign(d, 0.0);
    count = 0.0;
  }
  void add(const float* x, size_t d) {
    for (size_t i = 0; i < d; ++i) {
      sum[i] += x[i];
      sqsum[i] += static_cast<double>(x[i]) * x[i];
    }
    count += 1.0;
  }
};

class Aligner {
 public:
  Aligner(int n_phones, int n_states, int feat_dim)
      : n_phones_(n_phones), n_states_(n_states), dim_(feat_dim) {
    states_.resize(static_cast<size_t>(n_phones) * n_states);
    for (auto& st : states_) {
      st.comps.resize(1);
      st.log_w.assign(1, 0.0f);
    }
    // self-loop prob 0.6 / advance 0.4 — typical monophone topology
    log_self_ = std::log(0.6f);
    log_next_ = std::log(0.4f);
  }

  void split_mixtures() {
    for (auto& st : states_) st.split();
  }

  int n_mixtures() const { return static_cast<int>(states_[0].comps.size()); }

  int n_phones() const { return n_phones_; }
  int n_states() const { return n_states_; }
  int dim() const { return dim_; }

  GmmState& state(int phone, int s) {
    return states_[static_cast<size_t>(phone) * n_states_ + s];
  }
  const GmmState& state(int phone, int s) const {
    return states_[static_cast<size_t>(phone) * n_states_ + s];
  }

  // HCompV analogue: every state gets the global mean/variance (plus a
  // per-state mean jitter so states differentiate during EM).
  void flat_start(const float* feats, int64_t n_frames) {
    Accumulator acc;
    acc.init(dim_);
    for (int64_t t = 0; t < n_frames; ++t) acc.add(feats + t * dim_, dim_);
    std::vector<float> mean(dim_), var(dim_);
    for (int i = 0; i < dim_; ++i) {
      mean[i] = static_cast<float>(acc.sum[i] / acc.count);
      var[i] = static_cast<float>(
          std::max(acc.sqsum[i] / acc.count - mean[i] * mean[i], 1e-4));
    }
    uint32_t rng = 12345u;
    for (auto& st : states_) {
      st.comps.resize(1);
      st.log_w.assign(1, 0.0f);
      auto& g = st.comps[0];
      g.mean = mean;
      g.var = var;
      for (int i = 0; i < dim_; ++i) {
        rng = rng * 1664525u + 1013904223u;
        const float jitter = ((rng >> 9) & 0xFFFF) / 65535.0f - 0.5f;
        g.mean[i] += 0.1f * jitter * std::sqrt(var[i]);
      }
      g.finalize();
    }
  }

  // Viterbi forced alignment of one utterance against a phone sequence.
  // ``optional[p] != 0`` marks skippable phones (the 'sp' short-pause
  // entries HVite inserts between words): the path may bypass their whole
  // state chain.  Skipped phones get zero-length spans at the boundary.
  // Returns total log-likelihood; fills phone start/end frame indices.
  float align(const float* feats, int n_frames, const int* phones,
              int n_phones, int* starts, int* ends,
              std::vector<int>* state_of_frame = nullptr,
              const uint8_t* optional = nullptr) const {
    const int S = n_phones * n_states_;
    const int ns = n_states_;
    if (n_frames <= 0 || n_phones <= 0) return kLogZero;
    std::vector<float> prev(S, kLogZero), cur(S, kLogZero);
    std::vector<uint8_t> back(static_cast<size_t>(n_frames) * S);

    auto emit = [&](int j, int t) {
      const int p = phones[j / ns];
      return state(p, j % ns).loglike(feats + static_cast<int64_t>(t) * dim_);
    };
    auto opt = [&](int p) {
      return optional != nullptr && p >= 0 && p < n_phones && optional[p];
    };

    prev[0] = emit(0, 0);
    if (opt(0)) prev[ns] = emit(ns, 0);  // start may skip an initial sp
    for (int t = 1; t < n_frames; ++t) {
      for (int j = 0; j < S; ++j) {
        float best = prev[j] + log_self_;
        uint8_t from = 0;  // 0 self, 1 previous state, 2 skip prev phone
        if (j > 0) {
          const float via = prev[j - 1] + log_next_;
          if (via > best) {
            best = via;
            from = 1;
          }
        }
        // first state of phone i, phone i-1 optional: arc from the last
        // state of phone i-2 bypassing i-1
        if (j % ns == 0 && j >= 2 * ns && opt(j / ns - 1)) {
          const float via = prev[j - ns - 1] + log_next_;
          if (via > best) {
            best = via;
            from = 2;
          }
        }
        cur[j] = best <= kLogZero ? kLogZero : best + emit(j, t);
        back[static_cast<size_t>(t) * S + j] = from;
      }
      std::swap(prev, cur);
    }

    // the path may end before a trailing optional sp
    int end_j = S - 1;
    float total = prev[S - 1];
    if (opt(n_phones - 1) && n_phones >= 2 && prev[S - 1 - ns] > total) {
      total = prev[S - 1 - ns];
      end_j = S - 1 - ns;
    }
    if (total <= kLogZero / 2) return kLogZero;

    // backtrack
    std::vector<int> path(n_frames);
    int j = end_j;
    for (int t = n_frames - 1; t >= 0; --t) {
      path[t] = j;
      if (t > 0) {
        const uint8_t b = back[static_cast<size_t>(t) * S + j];
        if (b == 1) j -= 1;
        else if (b == 2) j -= ns + 1;
      }
    }
    if (state_of_frame) *state_of_frame = path;

    for (int p = 0; p < n_phones; ++p) starts[p] = -1;
    for (int t = 0; t < n_frames; ++t) {
      const int p = path[t] / ns;
      if (starts[p] < 0) starts[p] = t;
      ends[p] = t + 1;
    }
    // zero-length spans for skipped optional phones at the boundary
    int boundary = 0;
    for (int p = 0; p < n_phones; ++p) {
      if (starts[p] < 0) {
        starts[p] = boundary;
        ends[p] = boundary;
      } else {
        boundary = ends[p];
      }
    }
    return total;
  }

  // One embedded Viterbi-EM pass over a corpus. Returns mean per-frame
  // log-likelihood.
  float train_iteration(const float* feats, const int64_t* feat_offsets,
                        const int* phones, const int64_t* phone_offsets,
                        int n_utts) {
    const int n_mix = n_mixtures();
    std::vector<Accumulator> accs(states_.size() * n_mix);
    for (auto& a : accs) a.init(dim_);
    double total_ll = 0.0;
    int64_t total_frames = 0;

    std::vector<int> starts, ends, path;
    for (int u = 0; u < n_utts; ++u) {
      const float* f = feats + feat_offsets[u] * dim_;
      const int nf = static_cast<int>(feat_offsets[u + 1] - feat_offsets[u]);
      const int* ph = phones + phone_offsets[u];
      const int np = static_cast<int>(phone_offsets[u + 1] - phone_offsets[u]);
      if (nf < np * 1 || np == 0) continue;
      starts.assign(np, 0);
      ends.assign(np, 0);
      const float ll = align(f, nf, ph, np, starts.data(), ends.data(), &path);
      if (ll <= kLogZero / 2) continue;
      total_ll += ll;
      total_frames += nf;
      for (int t = 0; t < nf; ++t) {
        const int j = path[t];
        const int p = ph[j / n_states_];
        const size_t si = static_cast<size_t>(p) * n_states_ + j % n_states_;
        const float* x = f + static_cast<int64_t>(t) * dim_;
        const int c = states_[si].best_comp(x);
        accs[si * n_mix + c].add(x, dim_);
      }
    }

    for (size_t s = 0; s < states_.size(); ++s) {
      auto& st = states_[s];
      double total = 0.0;
      for (int c = 0; c < n_mix; ++c) total += accs[s * n_mix + c].count;
      if (total < 3.0) continue;  // keep prior params for rare states
      for (int c = 0; c < n_mix; ++c) {
        const auto& a = accs[s * n_mix + c];
        st.log_w[c] = static_cast<float>(
            std::log(std::max(a.count / total, 1e-4)));
        if (a.count < 3.0) continue;  // keep split-perturbed params
        auto& g = st.comps[c];
        for (int i = 0; i < dim_; ++i) {
          const float m = static_cast<float>(a.sum[i] / a.count);
          g.mean[i] = m;
          g.var[i] = static_cast<float>(std::max(
              a.sqsum[i] / a.count - m * m, 1e-3));
        }
        g.finalize();
      }
    }
    return total_frames ? static_cast<float>(total_ll / total_frames)
                        : kLogZero;
  }

  bool save(const char* path) const {
    FILE* f = std::fopen(path, "wb");
    if (!f) return false;
    const int32_t magic = 0x41334155;  // "A3TA" v2 (GMM)
    int32_t hdr[5] = {magic, n_phones_, n_states_, dim_, n_mixtures()};
    std::fwrite(hdr, sizeof(int32_t), 5, f);
    for (const auto& st : states_) {
      std::fwrite(st.log_w.data(), sizeof(float), st.log_w.size(), f);
      for (const auto& g : st.comps) {
        std::fwrite(g.mean.data(), sizeof(float), dim_, f);
        std::fwrite(g.var.data(), sizeof(float), dim_, f);
      }
    }
    std::fclose(f);
    return true;
  }

  static Aligner* load(const char* path) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return nullptr;
    int32_t hdr[5];
    if (std::fread(hdr, sizeof(int32_t), 5, f) != 5 ||
        hdr[0] != 0x41334155) {
      std::fclose(f);
      return nullptr;
    }
    auto* a = new Aligner(hdr[1], hdr[2], hdr[3]);
    const int n_mix = hdr[4];
    bool ok = true;
    for (auto& st : a->states_) {
      st.comps.resize(n_mix);
      st.log_w.resize(n_mix);
      ok &= std::fread(st.log_w.data(), sizeof(float), n_mix, f) ==
            static_cast<size_t>(n_mix);
      for (auto& g : st.comps) {
        g.mean.resize(a->dim_);
        g.var.resize(a->dim_);
        ok &= std::fread(g.mean.data(), sizeof(float), a->dim_, f) ==
              static_cast<size_t>(a->dim_);
        ok &= std::fread(g.var.data(), sizeof(float), a->dim_, f) ==
              static_cast<size_t>(a->dim_);
        g.finalize();
      }
    }
    std::fclose(f);
    if (!ok) {
      delete a;
      return nullptr;
    }
    return a;
  }

 private:
  int n_phones_, n_states_, dim_;
  float log_self_, log_next_;
  std::vector<GmmState> states_;
};

}  // namespace

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------

extern "C" {

void* mfcc_new(int sample_rate) {
  MfccConfig cfg;
  cfg.sample_rate = sample_rate;
  cfg.fmax = std::min(cfg.fmax, sample_rate / 2.0f - 100.0f);
  // FFT must cover the 25 ms analysis window at any sample rate (the
  // default 512 overflowed for fs > 20.48 kHz, e.g. the 24 kHz VCTK
  // target rate): round up to the next power of two.
  while (cfg.n_fft < cfg.win()) cfg.n_fft *= 2;
  return new MfccExtractor(cfg);
}

void mfcc_free(void* h) { delete static_cast<MfccExtractor*>(h); }

int mfcc_feat_dim(void* h) {
  return static_cast<MfccExtractor*>(h)->config().feat_dim();
}

int mfcc_hop(void* h) { return static_cast<MfccExtractor*>(h)->config().hop(); }

// out must hold (1 + (n - win)/hop) * feat_dim floats; returns n_frames.
int mfcc_extract(void* h, const float* samples, int64_t n, float* out) {
  auto* ex = static_cast<MfccExtractor*>(h);
  int n_frames = 0;
  auto feats = ex->extract(samples, n, &n_frames);
  std::memcpy(out, feats.data(), feats.size() * sizeof(float));
  return n_frames;
}

void* aligner_new(int n_phones, int n_states, int feat_dim) {
  return new Aligner(n_phones, n_states, feat_dim);
}

void aligner_free(void* h) { delete static_cast<Aligner*>(h); }

void aligner_flat_start(void* h, const float* feats, int64_t n_frames) {
  static_cast<Aligner*>(h)->flat_start(feats, n_frames);
}

float aligner_train_iteration(void* h, const float* feats,
                              const int64_t* feat_offsets, const int* phones,
                              const int64_t* phone_offsets, int n_utts) {
  return static_cast<Aligner*>(h)->train_iteration(
      feats, feat_offsets, phones, phone_offsets, n_utts);
}

float aligner_align(void* h, const float* feats, int n_frames,
                    const int* phones, int n_phones, int* starts, int* ends) {
  return static_cast<Aligner*>(h)->align(feats, n_frames, phones, n_phones,
                                         starts, ends);
}

float aligner_align_opt(void* h, const float* feats, int n_frames,
                        const int* phones, int n_phones,
                        const uint8_t* optional, int* starts, int* ends) {
  return static_cast<Aligner*>(h)->align(feats, n_frames, phones, n_phones,
                                         starts, ends, nullptr, optional);
}

void aligner_split_mixtures(void* h) {
  static_cast<Aligner*>(h)->split_mixtures();
}

int aligner_n_mixtures(void* h) {
  return static_cast<Aligner*>(h)->n_mixtures();
}

int aligner_save(void* h, const char* path) {
  return static_cast<Aligner*>(h)->save(path) ? 0 : -1;
}

void* aligner_load(const char* path) { return Aligner::load(path); }

int aligner_feat_dim(void* h) { return static_cast<Aligner*>(h)->dim(); }
int aligner_n_phones(void* h) { return static_cast<Aligner*>(h)->n_phones(); }

}  // extern "C"
