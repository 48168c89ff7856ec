// Native Moving MNIST batch generator (host-side data path).
//
// The reference's native layer is CUDA compute kernels (SURVEY §2.5 —
// those became Pallas/XLA ops in ops/); its DATA layer burns host CPU in
// Python/cv2 DataLoader workers (reference dataloader.py:105-187). This
// is the TPU-native framework's native host data path: an OpenMP C++
// generator producing uint8 frame batches for the frozen-dataset /
// multi-host pipelines where device-side generation is not wanted
// (e.g. pre-materializing the 10k-video frozen set, or feeding
// non-JAX consumers). Exposed via ctypes (no pybind11 in this image).
//
// Physics matches data/mmnist.py: triangle-wave reflection of constant
// velocity positions in [0,1], step-then-record, integer truncation to
// the 36px canvas range, max-compositing of 28x28 sprites.

#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

constexpr int kImage = 64;
constexpr int kDigit = 28;
constexpr int kCanvas = kImage - kDigit;  // 36
constexpr float kStep = 0.1f;

// SplitMix64 — tiny deterministic PRNG (public-domain algorithm).
inline uint64_t splitmix64(uint64_t& state) {
  uint64_t z = (state += 0x9e3779b97f4a7c15ull);
  z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ull;
  z = (z ^ (z >> 27)) * 0x94d049bb133111ebull;
  return z ^ (z >> 31);
}

inline float uniform01(uint64_t& state) {
  return (splitmix64(state) >> 11) * (1.0f / 9007199254740992.0f);
}

inline float reflect01(float x) {
  float m = std::fmod(x, 2.0f);
  if (m < 0) m += 2.0f;
  return 1.0f - std::fabs(m - 1.0f);
}

}  // namespace

extern "C" {

// Generate `batch` sequences of `n_frames` 64x64 uint8 frames.
// sprites: (n_sprites, 28, 28) uint8; out: (batch, n_frames, 64, 64).
// Deterministic in `seed`; parallel over the batch with OpenMP.
void mmnist_generate(const uint8_t* sprites, int n_sprites, uint64_t seed,
                     int batch, int n_frames, int num_digits,
                     uint8_t* out) {
  const long frame_sz = (long)kImage * kImage;
  const long seq_sz = (long)n_frames * frame_sz;

#pragma omp parallel for schedule(static)
  for (int b = 0; b < batch; ++b) {
    uint8_t* seq = out + (long)b * seq_sz;
    std::memset(seq, 0, seq_sz);
    uint64_t rng = seed ^ (0xD1B54A32D192ED03ull * (uint64_t)(b + 1));

    for (int d = 0; d < num_digits; ++d) {
      float x = uniform01(rng);
      float y = uniform01(rng);
      float theta = uniform01(rng) * 6.2831853f;
      float vy = std::sin(theta), vx = std::cos(theta);
      int sprite_idx = (int)(splitmix64(rng) % (uint64_t)n_sprites);
      const uint8_t* sp = sprites + (long)sprite_idx * kDigit * kDigit;

      for (int t = 0; t < n_frames; ++t) {
        // step-then-record, like the reference generator
        float ty = reflect01(y + vy * kStep * (t + 1));
        float tx = reflect01(x + vx * kStep * (t + 1));
        int top = (int)(ty * kCanvas);
        int left = (int)(tx * kCanvas);
        uint8_t* frame = seq + (long)t * frame_sz;
        for (int r = 0; r < kDigit; ++r) {
          uint8_t* dst = frame + (long)(top + r) * kImage + left;
          const uint8_t* src = sp + (long)r * kDigit;
          for (int c = 0; c < kDigit; ++c) {
            if (src[c] > dst[c]) dst[c] = src[c];
          }
        }
      }
    }
  }
}

}  // extern "C"
