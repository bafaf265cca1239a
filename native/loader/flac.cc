// Clean-room FLAC decoder (C++17, no deps) — the native-loader twin of
// a3t_tpu/data/flac.py (RFC 9639 subset: CONSTANT/VERBATIM/FIXED/LPC
// subframes, partitioned rice with escapes, stereo decorrelation, wasted
// bits, CRC-8/16 verification).  The reference reads FLAC through
// soundfile/libsndfile (espnet2/fileio/sound_scp.py); here the batch
// loader decodes it directly into the training buffers.  Cross-validated
// against the Python codec in tests/test_flac.py.

#include "flac.h"

#include <algorithm>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <vector>

namespace a3t_flac {

namespace {

uint8_t crc8(const uint8_t* p, size_t n) {
  uint8_t crc = 0;
  for (size_t i = 0; i < n; ++i) {
    crc ^= p[i];
    for (int b = 0; b < 8; ++b)
      crc = (crc & 0x80) ? ((crc << 1) ^ 0x07) : (crc << 1);
  }
  return crc;
}

uint16_t crc16(const uint8_t* p, size_t n) {
  uint16_t crc = 0;
  for (size_t i = 0; i < n; ++i) {
    crc ^= static_cast<uint16_t>(p[i]) << 8;
    for (int b = 0; b < 8; ++b)
      crc = (crc & 0x8000) ? ((crc << 1) ^ 0x8005) : (crc << 1);
  }
  return crc;
}

class BitReader {
 public:
  BitReader(const uint8_t* buf, size_t len, size_t pos = 0)
      : buf_(buf), len_(len), byte_pos_(pos) {}

  bool ok() const { return ok_; }

  uint64_t read(int nbits) {
    while (nbits_ < nbits) {
      if (byte_pos_ >= len_) {
        ok_ = false;
        return 0;
      }
      acc_ = (acc_ << 8) | buf_[byte_pos_++];
      nbits_ += 8;
    }
    nbits_ -= nbits;
    uint64_t v = (acc_ >> nbits_) & ((nbits == 64) ? ~0ull
                                                   : ((1ull << nbits) - 1));
    acc_ &= (nbits_ == 64) ? ~0ull : ((1ull << nbits_) - 1);
    return v;
  }

  int64_t read_signed(int nbits) {
    uint64_t v = read(nbits);
    if (nbits > 0 && (v >> (nbits - 1)))
      return static_cast<int64_t>(v) - (1ll << nbits);
    return static_cast<int64_t>(v);
  }

  int read_unary() {
    int q = 0;
    while (ok_ && read(1) == 0) ++q;
    return q;
  }

  void align() {
    int k = nbits_ % 8;
    nbits_ -= k;
    acc_ &= (nbits_ == 64) ? ~0ull : ((1ull << nbits_) - 1);
  }

  size_t aligned_pos() const { return byte_pos_ - nbits_ / 8; }

 private:
  const uint8_t* buf_;
  size_t len_;
  size_t byte_pos_;
  uint64_t acc_ = 0;
  int nbits_ = 0;
  bool ok_ = true;
};

uint64_t read_utf8_number(BitReader& r, bool* ok) {
  uint64_t b0 = r.read(8);
  if (b0 < 0x80) return b0;
  int n_follow = 0;
  for (int i = 0; i < 6; ++i) {
    if (!((b0 >> (6 - i)) & 1)) break;
    ++n_follow;
  }
  if (n_follow == 0) {  // 10xxxxxx is not a valid lead byte
    *ok = false;
    return 0;
  }
  uint64_t v = (n_follow < 6) ? (b0 & (0x7Full >> (n_follow + 1))) : 0;
  for (int i = 0; i < n_follow; ++i) {
    uint64_t b = r.read(8);
    if ((b & 0xC0) != 0x80) {
      *ok = false;
      return 0;
    }
    v = (v << 6) | (b & 0x3F);
  }
  return v;
}

// Partitioned-rice residual into x[order..bs).  False on malformed data.
bool read_residual(BitReader& r, int bs, int order, std::vector<int64_t>& x) {
  int method = static_cast<int>(r.read(2));
  if (method > 1) return false;
  const int pbits = method ? 5 : 4;
  const uint32_t escape = method ? 31 : 15;
  int po = static_cast<int>(r.read(4));
  if (po > 0 && (bs >> po) << po != bs) return false;
  int idx = order;
  for (int p = 0; p < (1 << po); ++p) {
    int n = (bs >> po) - (p == 0 ? order : 0);
    if (n < 0 || idx + n > bs) return false;
    uint32_t k = static_cast<uint32_t>(r.read(pbits));
    if (k == escape) {
      int rb = static_cast<int>(r.read(5));
      for (int i = 0; i < n; ++i) x[idx++] = rb ? r.read_signed(rb) : 0;
    } else {
      for (int i = 0; i < n; ++i) {
        uint64_t q = r.read_unary();
        uint64_t u = (q << k) | (k ? r.read(k) : 0);
        x[idx++] =
            static_cast<int64_t>(u >> 1) ^ -static_cast<int64_t>(u & 1);
      }
    }
    if (!r.ok()) return false;
  }
  return true;
}

// Decodes one subframe into x (length bs).  Returns false on malformed data.
bool read_subframe(BitReader& r, int bs, int bps, std::vector<int64_t>& x) {
  x.resize(bs);
  if (r.read(1) != 0) return false;
  int type_code = static_cast<int>(r.read(6));
  int wasted = 0;
  if (r.read(1)) wasted = r.read_unary() + 1;
  const int ebps = bps - wasted;
  if (ebps <= 0 || !r.ok()) return false;

  if (type_code == 0) {  // CONSTANT
    int64_t v = r.read_signed(ebps);
    for (int i = 0; i < bs; ++i) x[i] = v;
  } else if (type_code == 1) {  // VERBATIM
    for (int i = 0; i < bs; ++i) x[i] = r.read_signed(ebps);
  } else if (type_code >= 8 && type_code <= 12) {  // FIXED
    const int order = type_code & 7;
    if (order > bs) return false;
    for (int i = 0; i < order; ++i) x[i] = r.read_signed(ebps);
    if (!read_residual(r, bs, order, x)) return false;
    // reconstruct in place: x[order:] currently holds residuals
    switch (order) {
      case 0: break;
      case 1:
        for (int i = 1; i < bs; ++i) x[i] += x[i - 1];
        break;
      case 2:
        for (int i = 2; i < bs; ++i) x[i] += 2 * x[i - 1] - x[i - 2];
        break;
      case 3:
        for (int i = 3; i < bs; ++i)
          x[i] += 3 * x[i - 1] - 3 * x[i - 2] + x[i - 3];
        break;
      case 4:
        for (int i = 4; i < bs; ++i)
          x[i] += 4 * x[i - 1] - 6 * x[i - 2] + 4 * x[i - 3] - x[i - 4];
        break;
    }
  } else if (type_code >= 32) {  // LPC
    const int order = (type_code & 31) + 1;
    if (order > bs) return false;
    for (int i = 0; i < order; ++i) x[i] = r.read_signed(ebps);
    int precision = static_cast<int>(r.read(4)) + 1;
    if (precision == 16) return false;
    int shift = static_cast<int>(r.read_signed(5));
    if (shift < 0) return false;
    int64_t coefs[32];
    for (int i = 0; i < order; ++i) coefs[i] = r.read_signed(precision);
    if (!read_residual(r, bs, order, x)) return false;
    for (int i = order; i < bs; ++i) {
      int64_t acc = 0;
      for (int j = 0; j < order; ++j) acc += coefs[j] * x[i - 1 - j];
      x[i] += acc >> shift;
    }
  } else {
    return false;  // reserved type
  }
  if (wasted)
    for (int i = 0; i < bs; ++i) x[i] <<= wasted;
  return r.ok();
}

}  // namespace

// Decode channel 0 of a FLAC file into float32 (out) or int16 PCM codes
// (out_i16), mirroring read_wav_impl's contract (loader.cc): probe-only
// when both outputs are null; CRCs verified; returns false on any
// malformed structure.
bool read_flac_impl(const std::string& path, float* out, int16_t* out_i16,
                    int64_t max_samples, AudioInfo* info) {
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long fsize = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (fsize < 42) {  // magic + block header + STREAMINFO
    std::fclose(f);
    return false;
  }
  const bool probe_only = (out == nullptr && out_i16 == nullptr);
  std::vector<uint8_t> buf;
  if (probe_only) {
    buf.resize(42);
    if (std::fread(buf.data(), 1, 42, f) != 42) {
      std::fclose(f);
      return false;
    }
  } else {
    buf.resize(fsize);
    if (std::fread(buf.data(), 1, fsize, f) != static_cast<size_t>(fsize)) {
      std::fclose(f);
      return false;
    }
  }
  std::fclose(f);
  if (std::memcmp(buf.data(), "fLaC", 4) != 0) return false;

  // metadata blocks; STREAMINFO must be first (spec §8.1)
  size_t pos = 4;
  if ((buf[pos] & 0x7F) != 0) return false;
  uint32_t si_len = (buf[pos + 1] << 16) | (buf[pos + 2] << 8) | buf[pos + 3];
  if (si_len < 34) return false;
  BitReader si(buf.data() + pos + 4, 34);
  si.read(16);
  si.read(16);
  si.read(24);
  si.read(24);
  const int sample_rate = static_cast<int>(si.read(20));
  const int n_ch = static_cast<int>(si.read(3)) + 1;
  const int bps = static_cast<int>(si.read(5)) + 1;
  const int64_t total = static_cast<int64_t>(si.read(36));
  info->sample_rate = sample_rate;
  info->n_samples = total;
  if (probe_only) return total > 0 && sample_rate > 0;

  bool last = (buf[pos] & 0x80) != 0;
  pos += 4 + si_len;
  while (!last) {
    if (pos + 4 > buf.size()) return false;
    last = (buf[pos] & 0x80) != 0;
    uint32_t blen = (buf[pos + 1] << 16) | (buf[pos + 2] << 8) | buf[pos + 3];
    pos += 4 + blen;
  }
  if (pos > buf.size()) return false;

  static const int kSampleSizeBits[8] = {0, 8, 12, 0, 16, 20, 24, 32};
  const int64_t want = std::min<int64_t>(total, max_samples);
  int64_t n_done = 0;
  std::vector<int64_t> ch0, chx, side;
  while (pos < buf.size() && n_done < want) {
    BitReader r(buf.data(), buf.size(), pos);
    if (r.read(14) != 0x3FFE) return false;
    r.read(1);
    r.read(1);
    int bs_code = static_cast<int>(r.read(4));
    int sr_code = static_cast<int>(r.read(4));
    int assign = static_cast<int>(r.read(4));
    int ss_code = static_cast<int>(r.read(3));
    r.read(1);
    bool num_ok = true;
    read_utf8_number(r, &num_ok);
    if (!num_ok) return false;
    int bs;
    if (bs_code == 0) return false;
    else if (bs_code == 1) bs = 192;
    else if (bs_code <= 5) bs = 576 << (bs_code - 2);
    else if (bs_code == 6) bs = static_cast<int>(r.read(8)) + 1;
    else if (bs_code == 7) bs = static_cast<int>(r.read(16)) + 1;
    else bs = 256 << (bs_code - 8);
    if (sr_code == 12) r.read(8);
    else if (sr_code == 13 || sr_code == 14) r.read(16);
    else if (sr_code == 15) return false;
    int fbps = ss_code == 0 ? bps : kSampleSizeBits[ss_code];
    if (fbps == 0 || !r.ok()) return false;
    size_t hdr_end = r.aligned_pos();
    if (hdr_end >= buf.size() ||
        crc8(buf.data() + pos, hdr_end - pos) != buf[hdr_end])
      return false;

    BitReader rb(buf.data(), buf.size(), hdr_end + 1);
    if (assign <= 7) {
      if (assign + 1 != n_ch) return false;
      if (!read_subframe(rb, bs, fbps, ch0)) return false;
      for (int c = 1; c < n_ch; ++c)  // decode (and discard) channels 1..
        if (!read_subframe(rb, bs, fbps, chx)) return false;
    } else if (assign == 8) {  // left/side: ch0 = left
      if (!read_subframe(rb, bs, fbps, ch0)) return false;
      if (!read_subframe(rb, bs, fbps + 1, side)) return false;
    } else if (assign == 9) {  // right/side: ch0 = right + side
      if (!read_subframe(rb, bs, fbps + 1, side)) return false;
      if (!read_subframe(rb, bs, fbps, ch0)) return false;
      for (int i = 0; i < bs; ++i) ch0[i] += side[i];
    } else if (assign == 10) {  // mid/side
      if (!read_subframe(rb, bs, fbps, ch0)) return false;
      if (!read_subframe(rb, bs, fbps + 1, side)) return false;
      for (int i = 0; i < bs; ++i) {
        int64_t mid = (ch0[i] << 1) | (side[i] & 1);
        ch0[i] = (mid + side[i]) >> 1;
      }
    } else {
      return false;
    }
    rb.align();
    size_t end = rb.aligned_pos();
    if (end + 2 > buf.size()) return false;
    uint16_t got = crc16(buf.data() + pos, end - pos);
    uint16_t stored = (static_cast<uint16_t>(buf[end]) << 8) | buf[end + 1];
    if (got != stored) return false;
    pos = end + 2;

    const int64_t n_take = std::min<int64_t>(bs, want - n_done);
    const float scale = 1.0f / static_cast<float>(1ll << (bps - 1));
    for (int64_t i = 0; i < n_take; ++i) {
      if (out_i16 != nullptr) {
        if (bps == 16) {
          out_i16[n_done + i] = static_cast<int16_t>(ch0[i]);
        } else {
          // quantize like the wav path: round-half-even + clamp
          long q = std::lrintf(static_cast<float>(ch0[i]) * scale * 32768.0f);
          if (q < -32768) q = -32768;
          if (q > 32767) q = 32767;
          out_i16[n_done + i] = static_cast<int16_t>(q);
        }
      } else {
        out[n_done + i] = static_cast<float>(ch0[i]) * scale;
      }
    }
    n_done += n_take;
  }
  return n_done == want;
}

}  // namespace a3t_flac
