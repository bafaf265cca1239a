// FLAC decoder interface for the native batch loader (see flac.cc).
#ifndef A3T_NATIVE_LOADER_FLAC_H_
#define A3T_NATIVE_LOADER_FLAC_H_

#include <cstdint>
#include <string>

namespace a3t_flac {

struct AudioInfo {
  int sample_rate = 0;
  int64_t n_samples = 0;
};

// Decode channel 0 into float32 (out) or int16 PCM codes (out_i16) —
// same contract as loader.cc's read_wav_impl.  Probe-only (STREAMINFO
// header read) when both outputs are null.
bool read_flac_impl(const std::string& path, float* out, int16_t* out_i16,
                    int64_t max_samples, AudioInfo* info);

}  // namespace a3t_flac

#endif  // A3T_NATIVE_LOADER_FLAC_H_
