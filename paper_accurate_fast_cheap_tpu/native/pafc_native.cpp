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

}  // extern "C"
