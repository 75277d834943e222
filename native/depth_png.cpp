// Minimal 16-bit grayscale PNG decoder for KITTI depth maps.
//
// The eval loop reloads every GT png (reference kitti.py:527); PIL decode
// dominates host time there. This decoder handles exactly the KITTI GT
// format — 16-bit grayscale, non-interlaced, standard filters — via zlib,
// exposed over a C ABI for ctypes.
#include <zlib.h>

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = p > a ? p - a : a - p;
  int pb = p > b ? p - b : b - p;
  int pc = p > c ? p - c : c - p;
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

}  // namespace

extern "C" {

// Parse width/height/bitdepth/colortype. Returns 0 on success.
int png16_info(const uint8_t* buf, int64_t len, int* width, int* height,
               int* bit_depth, int* color_type) {
  static const uint8_t magic[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a,
                                   '\n'};
  if (len < 33 || std::memcmp(buf, magic, 8) != 0) return -1;
  if (std::memcmp(buf + 12, "IHDR", 4) != 0) return -2;
  *width = static_cast<int>(be32(buf + 16));
  *height = static_cast<int>(be32(buf + 20));
  *bit_depth = buf[24];
  *color_type = buf[25];
  return 0;
}

// Decode a 16-bit grayscale non-interlaced PNG into out (H*W uint16,
// native endianness). Returns 0 on success.
int png16_decode(const uint8_t* buf, int64_t len, uint16_t* out) {
  int w, h, bd, ct;
  if (png16_info(buf, len, &w, &h, &bd, &ct) != 0) return -1;
  if (bd != 16 || ct != 0) return -3;  // not 16-bit grayscale
  if (buf[28] != 0) return -4;         // interlaced unsupported

  // Collect IDAT payloads.
  std::vector<uint8_t> compressed;
  int64_t pos = 8;
  while (pos + 12 <= len) {
    uint32_t chunk_len = be32(buf + pos);
    const uint8_t* type = buf + pos + 4;
    if (std::memcmp(type, "IDAT", 4) == 0) {
      compressed.insert(compressed.end(), buf + pos + 8,
                        buf + pos + 8 + chunk_len);
    } else if (std::memcmp(type, "IEND", 4) == 0) {
      break;
    }
    pos += 12 + chunk_len;
  }
  if (compressed.empty()) return -5;

  const int bpp = 2;  // bytes per pixel
  const size_t stride = static_cast<size_t>(w) * bpp;
  std::vector<uint8_t> raw((stride + 1) * h);
  uLongf raw_len = raw.size();
  if (uncompress(raw.data(), &raw_len, compressed.data(),
                 compressed.size()) != Z_OK) {
    return -6;
  }

  std::vector<uint8_t> prev(stride, 0), cur(stride);
  for (int y = 0; y < h; ++y) {
    const uint8_t* line = raw.data() + static_cast<size_t>(y) * (stride + 1);
    const uint8_t filter = line[0];
    const uint8_t* src = line + 1;
    switch (filter) {
      case 0:
        std::memcpy(cur.data(), src, stride);
        break;
      case 1:  // Sub
        for (size_t i = 0; i < stride; ++i) {
          cur[i] = src[i] + (i >= bpp ? cur[i - bpp] : 0);
        }
        break;
      case 2:  // Up
        for (size_t i = 0; i < stride; ++i) cur[i] = src[i] + prev[i];
        break;
      case 3:  // Average
        for (size_t i = 0; i < stride; ++i) {
          int a = i >= bpp ? cur[i - bpp] : 0;
          cur[i] = src[i] + static_cast<uint8_t>((a + prev[i]) / 2);
        }
        break;
      case 4:  // Paeth
        for (size_t i = 0; i < stride; ++i) {
          int a = i >= bpp ? cur[i - bpp] : 0;
          int c = i >= bpp ? prev[i - bpp] : 0;
          cur[i] = src[i] + static_cast<uint8_t>(paeth(a, prev[i], c));
        }
        break;
      default:
        return -7;
    }
    uint16_t* dst = out + static_cast<size_t>(y) * w;
    for (int x = 0; x < w; ++x) {  // PNG is big-endian
      dst[x] = (uint16_t(cur[2 * x]) << 8) | cur[2 * x + 1];
    }
    std::swap(prev, cur);
  }
  return 0;
}

}  // extern "C"
