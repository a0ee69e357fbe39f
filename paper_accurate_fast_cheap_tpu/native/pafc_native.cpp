// Native runtime helpers (C++17, no external deps).
//
// The reference keeps its hot host-side paths native (CUDA kernels,
// optimized_transducer, fstalign's C++ aligner).  The TPU compute path here
// is XLA/Pallas; this library covers the *host* hot spots:
//   - Levenshtein alignment counts (fstalign/compute-wer replacement inner
//     loop; the long-form scorer aligns multi-thousand-word episodes)
//   - PCM WAV decode to float32 mono (data-loader inner loop)
//   - linear resampler (cheap fallback path)
// Exposed with a plain C ABI for ctypes (no pybind11 in the image).
#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Levenshtein alignment between int token sequences.
// out[0] = substitutions, out[1] = deletions, out[2] = insertions.
// Returns total edit distance.  O(R*H) DP with two rolling rows for cost
// and a full backpointer matrix (1 byte per cell) for exact op counts.
int levenshtein_counts(const int32_t* ref, int32_t rlen,
                       const int32_t* hyp, int32_t hlen,
                       int32_t* out) {
  const int R = rlen, H = hlen;
  std::vector<int32_t> prev(H + 1), cur(H + 1);
  std::vector<uint8_t> bp((size_t)(R + 1) * (H + 1));
  // ops: 0 = match/sub diag, 1 = del (up), 2 = ins (left)
  for (int j = 0; j <= H; ++j) { prev[j] = j; bp[j] = 2; }
  bp[0] = 0;
  for (int i = 1; i <= R; ++i) {
    cur[0] = i;
    bp[(size_t)i * (H + 1)] = 1;
    for (int j = 1; j <= H; ++j) {
      const int sub = prev[j - 1] + (ref[i - 1] != hyp[j - 1]);
      const int del = prev[j] + 1;
      const int ins = cur[j - 1] + 1;
      int best = sub; uint8_t op = 0;
      if (del < best) { best = del; op = 1; }
      if (ins < best) { best = ins; op = 2; }
      cur[j] = best;
      bp[(size_t)i * (H + 1) + j] = op;
    }
    std::swap(prev, cur);
  }
  // backtrack
  int32_t subs = 0, dels = 0, inss = 0;
  int i = R, j = H;
  while (i > 0 || j > 0) {
    const uint8_t op = bp[(size_t)i * (H + 1) + j];
    if (i > 0 && j > 0 && op == 0) {
      if (ref[i - 1] != hyp[j - 1]) ++subs;
      --i; --j;
    } else if (i > 0 && (op == 1 || j == 0)) {
      ++dels; --i;
    } else {
      ++inss; --j;
    }
  }
  out[0] = subs; out[1] = dels; out[2] = inss;
  return subs + dels + inss;
}

// Parse a RIFF/WAVE file: PCM16/PCM32/PCM8, any channel count (averaged to
// mono).  Returns the number of output samples written (<= max_out), or
// -1 on malformed input.  *sr receives the sample rate.
int64_t parse_wav(const uint8_t* data, int64_t n, float* out,
                  int64_t max_out, int32_t* sr) {
  if (n < 44 || std::memcmp(data, "RIFF", 4) || std::memcmp(data + 8, "WAVE", 4))
    return -1;
  int64_t pos = 12;
  int16_t channels = 0, bits = 0;
  int32_t rate = 0;
  const uint8_t* pcm = nullptr;
  int64_t pcm_len = 0;
  while (pos + 8 <= n) {
    const uint8_t* hdr = data + pos;
    uint32_t sz;
    std::memcpy(&sz, hdr + 4, 4);
    if (!std::memcmp(hdr, "fmt ", 4) && pos + 8 + 16 <= n) {
      std::memcpy(&channels, hdr + 8 + 2, 2);
      std::memcpy(&rate, hdr + 8 + 4, 4);
      std::memcpy(&bits, hdr + 8 + 14, 2);
    } else if (!std::memcmp(hdr, "data", 4)) {
      pcm = hdr + 8;
      pcm_len = std::min<int64_t>(sz, n - (pos + 8));
    }
    pos += 8 + sz + (sz & 1);
  }
  if (!pcm || channels <= 0 || rate <= 0) return -1;
  *sr = rate;
  const int bytes = bits / 8;
  if (bytes != 1 && bytes != 2 && bytes != 4) return -1;
  const int64_t frames = pcm_len / (bytes * channels);
  const int64_t out_n = std::min(frames, max_out);
  for (int64_t f = 0; f < out_n; ++f) {
    float acc = 0.f;
    for (int c = 0; c < channels; ++c) {
      const uint8_t* p = pcm + (f * channels + c) * bytes;
      if (bytes == 2) {
        int16_t v; std::memcpy(&v, p, 2);
        acc += v / 32768.f;
      } else if (bytes == 4) {
        int32_t v; std::memcpy(&v, p, 4);
        acc += v / 2147483648.f;
      } else {
        acc += ((int)p[0] - 128) / 128.f;
      }
    }
    out[f] = acc / channels;
  }
  return out_n;
}

// Linear-interpolation resampler: n input samples -> m output samples.
void resample_linear(const float* in, int64_t n, float* out, int64_t m) {
  if (m <= 1 || n <= 1) { if (m > 0) out[0] = n > 0 ? in[0] : 0.f; return; }
  const double step = (double)(n - 1) / (double)(m - 1);
  for (int64_t i = 0; i < m; ++i) {
    const double x = i * step;
    const int64_t k = std::min<int64_t>((int64_t)x, n - 2);
    const double frac = x - k;
    out[i] = (float)((1.0 - frac) * in[k] + frac * in[k + 1]);
  }
}

// ---------------------------------------------------------------------------
// FLAC decoder (spec-complete for the common stream surface: CONSTANT /
// VERBATIM / FIXED(0-4) / LPC(1-32) subframes, rice residual methods 0/1
// with escape partitions, wasted bits, independent + left/right/mid-side
// stereo, 8..24-bit samples).  CRCs are parsed but not verified (the data
// loader treats shards as trusted local files).  TPU-native role: the
// reference decodes via torchaudio/sox (`wenet/dataset/processor.py:178-
// 211`); here the host-side loader is native C++ feeding the on-device
// fbank.
// ---------------------------------------------------------------------------

namespace flac {

struct BitReader {
  const uint8_t* d;
  int64_t len;     // bytes
  int64_t pos;     // bit position
  bool ok;
  BitReader(const uint8_t* d_, int64_t len_) : d(d_), len(len_), pos(0), ok(true) {}
  inline uint32_t bit() {
    if (pos >= len * 8) { ok = false; return 0; }
    uint32_t b = (d[pos >> 3] >> (7 - (pos & 7))) & 1;
    ++pos;
    return b;
  }
  inline uint64_t bits(int n) {  // n <= 57
    uint64_t v = 0;
    while (n > 0 && ok) {
      int avail = 8 - (pos & 7);
      if (pos >= len * 8) { ok = false; return 0; }
      int take = n < avail ? n : avail;
      uint32_t byte = d[pos >> 3];
      uint32_t chunk = (byte >> (avail - take)) & ((1u << take) - 1);
      v = (v << take) | chunk;
      pos += take;
      n -= take;
    }
    return v;
  }
  inline int64_t sbits(int n) {
    uint64_t v = bits(n);
    if (n > 0 && (v >> (n - 1)) & 1) return (int64_t)v - ((int64_t)1 << n);
    return (int64_t)v;
  }
  inline uint32_t unary() {
    uint32_t q = 0;
    while (ok && bit() == 0) {
      ++q;
      if (q > 1u << 24) { ok = false; return 0; }
    }
    return q;
  }
  inline void align() { pos = (pos + 7) & ~(int64_t)7; }
};

static bool read_utf8_number(BitReader& br, uint64_t* out) {
  uint32_t b0 = (uint32_t)br.bits(8);
  if (!br.ok) return false;
  int extra = 0;
  uint64_t v = 0;
  if ((b0 & 0x80) == 0) { v = b0; }
  else if ((b0 & 0xE0) == 0xC0) { v = b0 & 0x1F; extra = 1; }
  else if ((b0 & 0xF0) == 0xE0) { v = b0 & 0x0F; extra = 2; }
  else if ((b0 & 0xF8) == 0xF0) { v = b0 & 0x07; extra = 3; }
  else if ((b0 & 0xFC) == 0xF8) { v = b0 & 0x03; extra = 4; }
  else if ((b0 & 0xFE) == 0xFC) { v = b0 & 0x01; extra = 5; }
  else if (b0 == 0xFE) { v = 0; extra = 6; }
  else return false;
  for (int i = 0; i < extra; ++i) {
    uint32_t b = (uint32_t)br.bits(8);
    if (!br.ok || (b & 0xC0) != 0x80) return false;
    v = (v << 6) | (b & 0x3F);
  }
  *out = v;
  return true;
}

static bool read_residual(BitReader& br, int order, int block_size,
                          int32_t* res) {
  uint32_t method = (uint32_t)br.bits(2);
  if (method > 1 || !br.ok) return false;
  int plen = method == 0 ? 4 : 5;
  uint32_t escape = method == 0 ? 0xF : 0x1F;
  uint32_t po = (uint32_t)br.bits(4);
  uint32_t nparts = 1u << po;
  if (block_size % nparts != 0) return false;
  int idx = 0;
  for (uint32_t part = 0; part < nparts; ++part) {
    int n = (int)(block_size >> po) - (part == 0 ? order : 0);
    if (n < 0) return false;
    uint32_t param = (uint32_t)br.bits(plen);
    if (!br.ok) return false;
    if (param == escape) {
      uint32_t raw = (uint32_t)br.bits(5);
      for (int i = 0; i < n; ++i) res[idx++] = (int32_t)br.sbits((int)raw);
    } else {
      for (int i = 0; i < n; ++i) {
        uint32_t q = br.unary();
        uint64_t r = br.bits((int)param);
        if (!br.ok) return false;
        uint64_t u = ((uint64_t)q << param) | r;
        res[idx++] = (int32_t)((u >> 1) ^ (~(u & 1) + 1));
      }
    }
  }
  return br.ok;
}

static bool decode_subframe(BitReader& br, int block_size, int bps,
                            int32_t* out, std::vector<int32_t>& scratch) {
  if (br.bit() != 0) return false;  // padding bit
  uint32_t type = (uint32_t)br.bits(6);
  int wasted = 0;
  if (br.bit()) wasted = 1 + (int)br.unary();
  if (!br.ok) return false;
  bps -= wasted;
  if (bps <= 0 || bps > 33) return false;

  if (type == 0) {                                   // CONSTANT
    int64_t c = br.sbits(bps);
    for (int i = 0; i < block_size; ++i) out[i] = (int32_t)c;
  } else if (type == 1) {                            // VERBATIM
    for (int i = 0; i < block_size; ++i) out[i] = (int32_t)br.sbits(bps);
  } else if ((type & 0x38) == 0x08 && (type & 7) <= 4) {  // FIXED
    int order = (int)(type & 7);
    for (int i = 0; i < order; ++i) out[i] = (int32_t)br.sbits(bps);
    scratch.resize(block_size);
    if (!read_residual(br, order, block_size, scratch.data())) return false;
    for (int i = order; i < block_size; ++i) {
      int64_t p = 0;
      switch (order) {
        case 0: p = 0; break;
        case 1: p = out[i - 1]; break;
        case 2: p = 2LL * out[i - 1] - out[i - 2]; break;
        case 3: p = 3LL * out[i - 1] - 3LL * out[i - 2] + out[i - 3]; break;
        case 4: p = 4LL * out[i - 1] - 6LL * out[i - 2] + 4LL * out[i - 3]
                    - out[i - 4]; break;
      }
      out[i] = (int32_t)(p + scratch[i - order]);
    }
  } else if (type & 0x20) {                          // LPC
    int order = (int)(type & 0x1F) + 1;
    for (int i = 0; i < order; ++i) out[i] = (int32_t)br.sbits(bps);
    uint32_t prec = (uint32_t)br.bits(4);
    if (prec == 0xF || !br.ok) return false;
    int precision = (int)prec + 1;
    int shift = (int)br.sbits(5);
    if (shift < 0) return false;
    int32_t coef[32];
    for (int i = 0; i < order; ++i) coef[i] = (int32_t)br.sbits(precision);
    scratch.resize(block_size);
    if (!read_residual(br, order, block_size, scratch.data())) return false;
    for (int i = order; i < block_size; ++i) {
      int64_t acc = 0;
      for (int j = 0; j < order; ++j) acc += (int64_t)coef[j] * out[i - 1 - j];
      out[i] = (int32_t)((acc >> shift) + scratch[i - order]);
    }
  } else {
    return false;
  }
  if (wasted) for (int i = 0; i < block_size; ++i) out[i] <<= wasted;
  return br.ok;
}

}  // namespace flac

// Decode a whole FLAC stream.  out: interleaved int32 samples with
// capacity out_cap (total across channels).  Returns the number of frames
// (samples per channel) decoded, or -1 on error.  meta out-params:
// sample_rate, channels, bits_per_sample.
int64_t flac_decode(const uint8_t* data, int64_t len, int32_t* out,
                    int64_t out_cap, int32_t* sample_rate,
                    int32_t* channels, int32_t* bits_per_sample) {
  using flac::BitReader;
  if (len < 42 || memcmp(data, "fLaC", 4) != 0) return -1;
  BitReader br(data, len);
  br.pos = 32;
  // metadata blocks
  uint32_t sr = 0, ch = 0, bps = 0;
  bool have_streaminfo = false;
  for (;;) {
    uint32_t last = br.bit();
    uint32_t type = (uint32_t)br.bits(7);
    uint32_t blen = (uint32_t)br.bits(24);
    if (!br.ok) return -1;
    if (type == 0 && blen >= 34) {
      br.bits(16); br.bits(16); br.bits(24); br.bits(24);
      sr = (uint32_t)br.bits(20);
      ch = (uint32_t)br.bits(3) + 1;
      bps = (uint32_t)br.bits(5) + 1;
      br.bits(36);
      for (uint32_t i = 0; i < blen - 18; ++i) br.bits(8);  // md5 + rest
      have_streaminfo = true;
    } else {
      for (uint32_t i = 0; i < blen; ++i) br.bits(8);
    }
    if (!br.ok) return -1;
    if (last) break;
  }
  if (!have_streaminfo || ch == 0 || ch > 8) return -1;
  *sample_rate = (int32_t)sr;
  *channels = (int32_t)ch;
  *bits_per_sample = (int32_t)bps;

  std::vector<std::vector<int32_t>> chan(ch);
  std::vector<int32_t> scratch;
  int64_t total = 0;
  static const uint32_t kBlockSizes[16] = {0, 192, 576, 1152, 2304, 4608,
                                           0, 0, 256, 512, 1024, 2048,
                                           4096, 8192, 16384, 32768};
  while (br.ok && br.pos + 16 <= len * 8) {
    // frame sync
    uint32_t sync = (uint32_t)br.bits(14);
    if (sync != 0x3FFE) break;  // end of stream or junk
    br.bit();                    // reserved
    br.bit();                    // blocking strategy
    uint32_t bs_code = (uint32_t)br.bits(4);
    uint32_t sr_code = (uint32_t)br.bits(4);
    uint32_t ch_code = (uint32_t)br.bits(4);
    uint32_t ss_code = (uint32_t)br.bits(3);
    br.bit();                    // reserved
    uint64_t fnum;
    if (!flac::read_utf8_number(br, &fnum)) return -1;
    uint32_t block_size;
    if (bs_code == 6) block_size = (uint32_t)br.bits(8) + 1;
    else if (bs_code == 7) block_size = (uint32_t)br.bits(16) + 1;
    else block_size = kBlockSizes[bs_code];
    if (block_size == 0) return -1;
    if (sr_code == 12) br.bits(8);
    else if (sr_code == 13 || sr_code == 14) br.bits(16);
    int fbps = (int)bps;
    static const int kBps[8] = {0, 8, 12, 0, 16, 20, 24, 32};
    if (ss_code != 0 && kBps[ss_code]) fbps = kBps[ss_code];
    br.bits(8);                  // header CRC-8
    if (!br.ok) return -1;

    uint32_t nch = ch;
    int assign = -1;             // 0 l/s, 1 r/s, 2 m/s
    if (ch_code <= 7) { nch = ch_code + 1; }
    else if (ch_code == 8) { nch = 2; assign = 0; }
    else if (ch_code == 9) { nch = 2; assign = 1; }
    else if (ch_code == 10) { nch = 2; assign = 2; }
    else return -1;
    if (nch != ch) return -1;

    for (uint32_t c = 0; c < nch; ++c) {
      if (chan[c].size() < (size_t)block_size) chan[c].resize(block_size);
      int sub_bps = fbps;
      if (assign == 0 && c == 1) ++sub_bps;       // side channel
      if (assign == 1 && c == 0) ++sub_bps;
      if (assign == 2 && c == 1) ++sub_bps;
      if (!flac::decode_subframe(br, (int)block_size, sub_bps,
                                 chan[c].data(), scratch))
        return -1;
    }
    br.align();
    br.bits(16);                 // frame CRC-16
    if ((total + block_size) * ch > out_cap) return -1;

    // stereo decorrelation + interleave
    for (uint32_t i = 0; i < block_size; ++i) {
      if (assign == 0) {         // left/side: R = L - S
        int32_t L = chan[0][i], S = chan[1][i];
        out[(total + i) * 2 + 0] = L;
        out[(total + i) * 2 + 1] = L - S;
      } else if (assign == 1) {  // right/side: L = S + R
        int32_t S = chan[0][i], R = chan[1][i];
        out[(total + i) * 2 + 0] = S + R;
        out[(total + i) * 2 + 1] = R;
      } else if (assign == 2) {  // mid/side
        int32_t M = chan[0][i], S = chan[1][i];
        int64_t m2 = ((int64_t)M << 1) | (S & 1);
        out[(total + i) * 2 + 0] = (int32_t)((m2 + S) >> 1);
        out[(total + i) * 2 + 1] = (int32_t)((m2 - S) >> 1);
      } else {
        for (uint32_t c = 0; c < ch; ++c)
          out[(total + i) * ch + c] = chan[c][i];
      }
    }
    total += block_size;
  }
  return total;
}

}  // extern "C"
