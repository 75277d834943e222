// CPU reference implementation of the Deep Hough line accumulator.
//
// Same tabulation and vote semantics as the reference CUDA extension
// (deep_hough_cuda.cpp initTab + line_accum_forward_kernel): used as the
// parity oracle for the TPU implementations. Exposed via a C ABI for
// ctypes; build with native/build.sh (produces libgedepth_native.so).
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// feat:   (B, C, H, W) float32, row-major
// out:    (B, C, numangle, numrho) float32, zero-initialised by the caller
void hough_forward(const float* feat, float* out,
                   int B, int C, int H, int W,
                   int numangle, int numrho) {
  const float irho =
      static_cast<float>(static_cast<int>(std::sqrt(static_cast<double>(H) * H +
                                                    static_cast<double>(W) * W) + 1)) /
      static_cast<float>(numrho - 1);
  const float itheta = 3.14159265358979323846f / numangle;
  std::vector<float> tab_cos(numangle), tab_sin(numangle);
  float angle = 0.f;
  for (int a = 0; a < numangle; ++a) {
    tab_cos[a] = std::cos(angle) / irho;
    tab_sin[a] = std::sin(angle) / irho;
    angle += itheta;
  }
  const int64_t hw = static_cast<int64_t>(H) * W;
  const int64_t ar = static_cast<int64_t>(numangle) * numrho;
  for (int b = 0; b < B; ++b) {
    for (int c = 0; c < C; ++c) {
      const float* f = feat + (static_cast<int64_t>(b) * C + c) * hw;
      float* o = out + (static_cast<int64_t>(b) * C + c) * ar;
      for (int y = 0; y < H; ++y) {
        const int yy = y - H / 2;
        for (int x = 0; x < W; ++x) {
          const int xx = x - W / 2;
          const float val = f[static_cast<int64_t>(y) * W + x];
          for (int a = 0; a < numangle; ++a) {
            int r = static_cast<int>(
                std::round(static_cast<float>(xx) * tab_cos[a] +
                           static_cast<float>(yy) * tab_sin[a]));
            r += numrho / 2;
            if (r >= 0 && r < numrho) {
              o[static_cast<int64_t>(a) * numrho + r] += val;
            }
          }
        }
      }
    }
  }
}

// grad_out: (B, C, numangle, numrho); grad_in: (B, C, H, W) zero-init.
void hough_backward(const float* grad_out, float* grad_in,
                    int B, int C, int H, int W,
                    int numangle, int numrho) {
  const float irho =
      static_cast<float>(static_cast<int>(std::sqrt(static_cast<double>(H) * H +
                                                    static_cast<double>(W) * W) + 1)) /
      static_cast<float>(numrho - 1);
  const float itheta = 3.14159265358979323846f / numangle;
  std::vector<float> tab_cos(numangle), tab_sin(numangle);
  float angle = 0.f;
  for (int a = 0; a < numangle; ++a) {
    tab_cos[a] = std::cos(angle) / irho;
    tab_sin[a] = std::sin(angle) / irho;
    angle += itheta;
  }
  const int64_t hw = static_cast<int64_t>(H) * W;
  const int64_t ar = static_cast<int64_t>(numangle) * numrho;
  for (int b = 0; b < B; ++b) {
    for (int c = 0; c < C; ++c) {
      const float* g = grad_out + (static_cast<int64_t>(b) * C + c) * ar;
      float* gi = grad_in + (static_cast<int64_t>(b) * C + c) * hw;
      for (int y = 0; y < H; ++y) {
        const int yy = y - H / 2;
        for (int x = 0; x < W; ++x) {
          const int xx = x - W / 2;
          float acc = 0.f;
          for (int a = 0; a < numangle; ++a) {
            int r = static_cast<int>(
                std::round(static_cast<float>(xx) * tab_cos[a] +
                           static_cast<float>(yy) * tab_sin[a]));
            r += numrho / 2;
            if (r >= 0 && r < numrho) {
              acc += g[static_cast<int64_t>(a) * numrho + r];
            }
          }
          gi[static_cast<int64_t>(y) * W + x] += acc;
        }
      }
    }
  }
}

}  // extern "C"
