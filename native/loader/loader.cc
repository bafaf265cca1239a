// Threaded WAV batch loader (C++17, no deps).
//
// The reference feeds training through torch DataLoader worker *processes*
// decoding flac/wav in Python (espnet2/train/dataset.py via soundfile).
// Here batch assembly is a C++ thread pool: given a registry of wav paths,
// a batch request fills a preallocated (B, max_samples) float32 buffer with
// decoded, gain-normalized samples in parallel and returns true lengths.
// Python (ctypes) hands the buffer straight to jax.device_put — no
// per-utterance Python object churn on the hot path.
//
// Format support: RIFF/WAVE with PCM16, PCM24, PCM32, IEEE float32, and
// FLAC (flac.cc — the reference's format_wav_scp.sh default storage
// format).  Mono; for multi-channel the first channel is taken.  The
// recipes write PCM16 wav or flac (data/format_wav.py).

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <type_traits>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

#include "flac.h"

namespace {

using WavInfo = a3t_flac::AudioInfo;

#pragma pack(push, 1)
struct ChunkHeader {
  char id[4];
  uint32_t size;
};
#pragma pack(pop)

// Decodes into float32 (out) or straight int16 PCM codes (out_i16, the
// batcher's audio_int16 wire format — for 16-bit sources a bulk copy, no
// float round trip; other formats quantize with round-to-nearest-even +
// clamp, matching numpy's rint/clip convention in data/batcher.py).
bool read_wav_impl(const std::string& path, float* out, int16_t* out_i16,
                   int64_t max_samples, WavInfo* info) {
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) return false;
  char riff[12];
  if (std::fread(riff, 1, 12, f) != 12 || std::memcmp(riff, "RIFF", 4) != 0 ||
      std::memcmp(riff + 8, "WAVE", 4) != 0) {
    std::fclose(f);
    return false;
  }
  uint16_t format = 0, channels = 1, bits = 16;
  uint32_t sample_rate = 0;
  int64_t data_size = 0;
  long data_pos = -1;
  ChunkHeader ch;
  while (std::fread(&ch, sizeof(ch), 1, f) == 1) {
    if (std::memcmp(ch.id, "fmt ", 4) == 0) {
      uint8_t buf[16];
      if (ch.size < 16 || std::fread(buf, 1, 16, f) != 16) {
        std::fclose(f);
        return false;
      }
      format = buf[0] | (buf[1] << 8);
      channels = buf[2] | (buf[3] << 8);
      std::memcpy(&sample_rate, buf + 4, 4);
      bits = buf[14] | (buf[15] << 8);
      if (ch.size > 16) std::fseek(f, ch.size - 16, SEEK_CUR);
    } else if (std::memcmp(ch.id, "data", 4) == 0) {
      data_size = ch.size;
      data_pos = std::ftell(f);
      std::fseek(f, ch.size + (ch.size & 1), SEEK_CUR);
    } else {
      std::fseek(f, ch.size + (ch.size & 1), SEEK_CUR);
    }
  }
  if (data_pos < 0 || channels == 0) {
    std::fclose(f);
    return false;
  }
  const int bytes = bits / 8;
  const int64_t frames = data_size / (bytes * channels);
  info->sample_rate = static_cast<int>(sample_rate);
  info->n_samples = frames;

  if (out != nullptr || out_i16 != nullptr) {
    const int64_t n = std::min(frames, max_samples);
    std::fseek(f, data_pos, SEEK_SET);
    std::vector<uint8_t> raw(static_cast<size_t>(n) * bytes * channels);
    if (std::fread(raw.data(), 1, raw.size(), f) != raw.size()) {
      std::fclose(f);
      return false;
    }
    const uint8_t* p = raw.data();
    if (out_i16 != nullptr && bits == 16 && channels == 1 && format != 3) {
      std::memcpy(out_i16, p, static_cast<size_t>(n) * 2);  // bulk path
    } else {
      for (int64_t i = 0; i < n; ++i, p += bytes * channels) {
        float v = 0.0f;
        if (format == 3 && bits == 32) {  // IEEE float
          std::memcpy(&v, p, 4);
        } else if (bits == 16) {
          int16_t s;
          std::memcpy(&s, p, 2);
          v = s / 32768.0f;
        } else if (bits == 24) {
          int32_t s = (p[0] << 8) | (p[1] << 16) | (p[2] << 24);
          v = (s >> 8) / 8388608.0f;
        } else if (bits == 32) {
          int32_t s;
          std::memcpy(&s, p, 4);
          v = s / 2147483648.0f;
        }
        if (out_i16 != nullptr) {
          long q = std::lrintf(v * 32768.0f);  // round-half-even, as np.rint
          if (q < -32768) q = -32768;
          if (q > 32767) q = 32767;
          out_i16[i] = static_cast<int16_t>(q);
        } else {
          out[i] = v;
        }
      }
    }
  }
  std::fclose(f);
  return true;
}

// Container dispatch: FLAC or RIFF/WAVE, sniffed by magic bytes (the
// registry mixes formats freely, like the reference's soundfile reads).
bool read_audio_impl(const std::string& path, float* out, int16_t* out_i16,
                     int64_t max_samples, WavInfo* info) {
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) return false;
  char magic[4] = {0};
  size_t got = std::fread(magic, 1, 4, f);
  std::fclose(f);
  if (got == 4 && std::memcmp(magic, "fLaC", 4) == 0)
    return a3t_flac::read_flac_impl(path, out, out_i16, max_samples, info);
  return read_wav_impl(path, out, out_i16, max_samples, info);
}

bool read_audio(const std::string& path, float* out, int64_t max_samples,
                WavInfo* info) {
  return read_audio_impl(path, out, nullptr, max_samples, info);
}

class ThreadPool {
 public:
  explicit ThreadPool(int n) {
    for (int i = 0; i < n; ++i) {
      workers_.emplace_back([this] {
        for (;;) {
          std::function<void()> job;
          {
            std::unique_lock<std::mutex> lk(mu_);
            cv_.wait(lk, [this] { return stop_ || !jobs_.empty(); });
            if (stop_ && jobs_.empty()) return;
            job = std::move(jobs_.front());
            jobs_.pop();
          }
          job();
        }
      });
    }
  }

  ~ThreadPool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& w : workers_) w.join();
  }

  void submit(std::function<void()> job) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      jobs_.push(std::move(job));
    }
    cv_.notify_one();
  }

 private:
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> jobs_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_ = false;
};

struct Loader {
  std::vector<std::string> paths;
  ThreadPool pool;
  explicit Loader(int n_threads) : pool(n_threads) {}
};

// Runs job(i) for i in [0, n) on the pool, blocks until all complete,
// returns the failure count.  The countdown AND the notify happen under
// the mutex: the waiter can only observe completion after reacquiring it,
// i.e. strictly after the last worker's final touch of the stack-local
// mutex/cv — an unlocked `++done == n` check lets a spuriously-woken
// waiter destroy them while that worker is about to lock (UB).
template <typename Fn>
int run_parallel(Loader* l, int64_t n, Fn&& job) {
  std::atomic<int> errors{0};
  int64_t done = 0;
  std::mutex mu;
  std::condition_variable cv;
  for (int64_t i = 0; i < n; ++i) {
    l->pool.submit([&, i] {
      if (!job(i)) ++errors;
      std::lock_guard<std::mutex> lk(mu);
      ++done;
      cv.notify_one();
    });
  }
  std::unique_lock<std::mutex> lk(mu);
  cv.wait(lk, [&] { return done == n; });
  return errors.load();
}

// Shared batch-decode body; T selects the output sample format
// (float32 decode or raw int16 PCM codes).
template <typename T>
int load_batch_t(Loader* l, const int32_t* indices, int batch,
                 int64_t max_samples, T* out, int64_t* lengths) {
  return run_parallel(l, batch, [&](int64_t i) {
    const int idx = indices[i];
    T* dst = out + i * max_samples;
    std::memset(dst, 0, sizeof(T) * max_samples);
    WavInfo info;
    float* outf = nullptr;
    int16_t* outi = nullptr;
    if constexpr (std::is_same_v<T, float>) outf = dst; else outi = dst;
    if (idx >= 0 && idx < static_cast<int>(l->paths.size()) &&
        read_audio_impl(l->paths[idx], outf, outi, max_samples, &info)) {
      lengths[i] = std::min<int64_t>(info.n_samples, max_samples);
      return true;
    }
    lengths[i] = 0;
    return false;
  });
}

}  // namespace

extern "C" {

void* loader_new(int n_threads) { return new Loader(n_threads); }

void loader_free(void* h) { delete static_cast<Loader*>(h); }

// Register paths (NUL-separated blob); returns the count.
int loader_register(void* h, const char* blob, int64_t blob_len) {
  auto* l = static_cast<Loader*>(h);
  l->paths.clear();
  const char* p = blob;
  const char* end = blob + blob_len;
  while (p < end) {
    const char* q = static_cast<const char*>(memchr(p, '\0', end - p));
    if (!q) break;
    l->paths.emplace_back(p, q - p);
    p = q + 1;
  }
  return static_cast<int>(l->paths.size());
}

// Header-only probe: fills n_samples/sample_rate for every registered path.
int loader_probe(void* h, int64_t* n_samples, int32_t* sample_rates) {
  auto* l = static_cast<Loader*>(h);
  return run_parallel(l, static_cast<int64_t>(l->paths.size()),
                      [&](int64_t i) {
    WavInfo info;
    if (read_audio(l->paths[i], nullptr, 0, &info)) {
      n_samples[i] = info.n_samples;
      sample_rates[i] = info.sample_rate;
      return true;
    }
    n_samples[i] = -1;
    sample_rates[i] = -1;
    return false;
  });
}

// Fill a zero-initialized (B, max_samples) float32 buffer with the decoded
// audio of `indices`; lengths[i] = true sample count (clipped). Returns the
// number of failed reads.
int loader_load_batch(void* h, const int32_t* indices, int batch,
                      int64_t max_samples, float* out, int64_t* lengths) {
  return load_batch_t(static_cast<Loader*>(h), indices, batch, max_samples,
                      out, lengths);
}

// int16 variant: fills a (B, max_samples) int16 buffer with raw PCM codes
// (the batcher's audio_int16 wire format) — skips the decode-to-float +
// re-quantize round trip for PCM16 corpora entirely.
int loader_load_batch_i16(void* h, const int32_t* indices, int batch,
                          int64_t max_samples, int16_t* out,
                          int64_t* lengths) {
  return load_batch_t(static_cast<Loader*>(h), indices, batch, max_samples,
                      out, lengths);
}

// Registry-free single-file decode for fileio.read_wav's FLAC fast path
// (prep/eval reads outside the batch pipeline).  Probe with out=null to
// get n_samples/sample_rate, then call again with a buffer.  Returns 1 on
// success, 0 on failure.
int loader_read_file(const char* path, float* out, int64_t max_samples,
                     int64_t* n_samples, int32_t* sample_rate) {
  WavInfo info;
  if (!read_audio_impl(path, out, nullptr, max_samples, &info)) return 0;
  *n_samples = info.n_samples;
  *sample_rate = info.sample_rate;
  return 1;
}

}  // extern "C"
