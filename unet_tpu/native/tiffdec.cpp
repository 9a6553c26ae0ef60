// Native tile decoder: multithreaded TIFF → float32 batch assembly.
//
// The reference's performance-critical raster decode lives in native code
// (libgdal/libtiff C++ under rasterio — SURVEY.md §2.2). This is the
// TPU-native equivalent for the training/prediction hot path: decode a
// whole batch of equally-sized tiles in parallel worker threads, writing
// directly into the caller's pre-allocated NHWC float32 (or int32 mask)
// batch buffer, bypassing the Python GIL entirely.
//
// Supported TIFF subset (everything unet_tpu.geo.tiff writes, plus planar):
//   classic little-endian, strip-organized, PlanarConfiguration 1|2,
//   Compression 1 (none) | 8/32946 (zlib deflate), Predictor 1|2,
//   uint8/int8/uint16/int16/uint32/int32/float32/float64 samples.
//
// C ABI (ctypes):
//   int unet_decode_batch(const char** paths, int n_tiles,
//                         float* out, long long tile_stride,
//                         int height, int width, int channels,
//                         int n_threads);
//   int unet_decode_masks(const char** paths, int n_tiles,
//                         int* out, long long tile_stride,
//                         int height, int width, int n_threads);
// Return: 0 on success, (tile_index + 1) on the first failing tile.

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

struct Ifd {
  uint32_t width = 0, height = 0;
  uint16_t samples = 1, bits = 8, sample_format = 1;
  uint16_t compression = 1, planar = 1, predictor = 1;
  uint32_t rows_per_strip = 0;
  std::vector<uint64_t> strip_offsets, strip_counts;
};

inline uint16_t rd16(const uint8_t* p) { return (uint16_t)(p[0] | (p[1] << 8)); }
inline uint32_t rd32(const uint8_t* p) {
  return (uint32_t)(p[0] | (p[1] << 8) | (p[2] << 16) | ((uint32_t)p[3] << 24));
}

bool read_file(const char* path, std::vector<uint8_t>& buf) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (size <= 8) { std::fclose(f); return false; }
  buf.resize((size_t)size);
  size_t got = std::fread(buf.data(), 1, (size_t)size, f);
  std::fclose(f);
  return got == (size_t)size;
}

// Parse the first IFD of a little-endian classic TIFF.
bool parse_ifd(const std::vector<uint8_t>& d, Ifd& ifd) {
  if (d.size() < 8 || d[0] != 'I' || d[1] != 'I' || rd16(&d[2]) != 42) return false;
  uint32_t off = rd32(&d[4]);
  if (off + 2 > d.size()) return false;
  uint16_t n = rd16(&d[off]);
  auto type_size = [](uint16_t t) -> uint32_t {
    switch (t) {
      case 1: case 2: case 6: case 7: return 1;
      case 3: case 8: return 2;
      case 4: case 9: case 11: return 4;
      case 5: case 10: case 12: return 8;
      default: return 1;
    }
  };
  for (uint16_t i = 0; i < n; i++) {
    uint32_t e = off + 2 + 12u * i;
    if (e + 12 > d.size()) return false;
    uint16_t tag = rd16(&d[e]);
    uint16_t type = rd16(&d[e + 2]);
    uint32_t count = rd32(&d[e + 4]);
    uint32_t size = type_size(type) * count;
    uint32_t voff = (size <= 4) ? e + 8 : rd32(&d[e + 8]);
    if ((uint64_t)voff + size > d.size()) return false;
    auto val_at = [&](uint32_t idx) -> uint64_t {
      if (type == 3) return rd16(&d[voff + 2 * idx]);
      if (type == 4) return rd32(&d[voff + 4 * idx]);
      return 0;
    };
    switch (tag) {
      case 256: ifd.width = (uint32_t)val_at(0); break;
      case 257: ifd.height = (uint32_t)val_at(0); break;
      case 258: ifd.bits = (uint16_t)val_at(0); break;
      case 259: ifd.compression = (uint16_t)val_at(0); break;
      case 277: ifd.samples = (uint16_t)val_at(0); break;
      case 278: ifd.rows_per_strip = (uint32_t)val_at(0); break;
      case 284: ifd.planar = (uint16_t)val_at(0); break;
      case 317: ifd.predictor = (uint16_t)val_at(0); break;
      case 339: ifd.sample_format = (uint16_t)val_at(0); break;
      case 273:
        ifd.strip_offsets.resize(count);
        for (uint32_t k = 0; k < count; k++) ifd.strip_offsets[k] = val_at(k);
        break;
      case 279:
        ifd.strip_counts.resize(count);
        for (uint32_t k = 0; k < count; k++) ifd.strip_counts[k] = val_at(k);
        break;
      default: break;
    }
  }
  if (ifd.rows_per_strip == 0) ifd.rows_per_strip = ifd.height;
  return ifd.width && ifd.height && !ifd.strip_offsets.empty() &&
         ifd.strip_offsets.size() == ifd.strip_counts.size();
}

bool inflate_strip(const uint8_t* src, size_t src_len, uint8_t* dst, size_t dst_len) {
  uLongf out_len = (uLongf)dst_len;
  return uncompress(dst, &out_len, src, (uLong)src_len) == Z_OK && out_len == dst_len;
}

// Convert one row of raw samples to float32. The horizontal predictor's
// prefix sum MUST run in the native integer type (deltas wrap modulo the
// type, matching the encoder's modular subtraction); `stride` is the
// channel interleave (1 for planar data, C for chunky rows — predictor
// accumulates per channel).
template <typename T>
void row_to_f32(const uint8_t* raw, float* out, uint32_t n, uint16_t predictor,
                uint32_t stride) {
  const T* src = reinterpret_cast<const T*>(raw);
  if (predictor == 2) {
    for (uint32_t ch = 0; ch < stride; ch++) {
      T acc{};
      for (uint32_t i = ch; i < n; i += stride) {
        acc = (T)(acc + src[i]);
        out[i] = (float)acc;
      }
    }
  } else {
    for (uint32_t i = 0; i < n; i++) out[i] = (float)src[i];
  }
}

void samples_to_f32(const uint8_t* raw, float* out, uint32_t n,
                    uint16_t bits, uint16_t sf, uint16_t predictor,
                    uint32_t stride = 1) {
  if (sf == 3) {
    if (bits == 32) row_to_f32<float>(raw, out, n, 1, 1);
    else row_to_f32<double>(raw, out, n, 1, 1);
  } else if (sf == 2) {
    if (bits == 8) row_to_f32<int8_t>(raw, out, n, predictor, stride);
    else if (bits == 16) row_to_f32<int16_t>(raw, out, n, predictor, stride);
    else row_to_f32<int32_t>(raw, out, n, predictor, stride);
  } else {
    if (bits == 8) row_to_f32<uint8_t>(raw, out, n, predictor, stride);
    else if (bits == 16) row_to_f32<uint16_t>(raw, out, n, predictor, stride);
    else row_to_f32<uint32_t>(raw, out, n, predictor, stride);
  }
}

// Decode one tile into HWC float32 `out` (size h*w*c). Returns true on ok.
bool decode_tile_f32(const char* path, float* out, int H, int W, int C) {
  std::vector<uint8_t> d;
  if (!read_file(path, d)) return false;
  Ifd ifd;
  if (!parse_ifd(d, ifd)) return false;
  if ((int)ifd.width != W || (int)ifd.height != H) return false;
  if (ifd.bits != 8 && ifd.bits != 16 && ifd.bits != 32 && ifd.bits != 64) return false;
  const uint32_t bytes_per = ifd.bits / 8;
  const uint32_t n_bands = ifd.samples;
  if ((int)n_bands != C) return false;

  const uint32_t rps = ifd.rows_per_strip;
  const uint32_t strips_per_image = (ifd.height + rps - 1) / rps;
  std::vector<uint8_t> scratch;

  auto get_strip = [&](uint32_t s, uint32_t decoded_len) -> const uint8_t* {
    uint64_t off = ifd.strip_offsets[s], cnt = ifd.strip_counts[s];
    if (off + cnt > d.size()) return nullptr;
    if (ifd.compression == 1) return d.data() + off;
    if (ifd.compression == 8 || ifd.compression == 32946) {
      scratch.resize(decoded_len);
      if (!inflate_strip(d.data() + off, (size_t)cnt, scratch.data(), decoded_len))
        return nullptr;
      return scratch.data();
    }
    return nullptr;
  };

  if (ifd.planar == 1) {
    // chunky: rows of W*C samples; predictor accumulates per channel with
    // stride C inside row_to_f32 (modular in the native integer type).
    for (uint32_t s = 0; s < strips_per_image; s++) {
      uint32_t rows = std::min(rps, ifd.height - s * rps);
      uint32_t decoded = rows * ifd.width * n_bands * bytes_per;
      const uint8_t* raw = get_strip(s, decoded);
      if (!raw) return false;
      for (uint32_t r = 0; r < rows; r++) {
        const uint8_t* rr = raw + (size_t)r * ifd.width * n_bands * bytes_per;
        float* dst = out + ((size_t)(s * rps + r)) * ifd.width * n_bands;
        samples_to_f32(rr, dst, ifd.width * n_bands, ifd.bits,
                       ifd.sample_format, ifd.predictor, n_bands);
      }
    }
  } else {  // planar == 2: strips per band, output interleaved HWC
    uint32_t strips_per_band = (ifd.height + rps - 1) / rps;
    std::vector<float> band_row(ifd.width);
    for (uint32_t b = 0; b < n_bands; b++) {
      for (uint32_t s = 0; s < strips_per_band; s++) {
        uint32_t rows = std::min(rps, ifd.height - s * rps);
        uint32_t decoded = rows * ifd.width * bytes_per;
        const uint8_t* raw = get_strip(b * strips_per_band + s, decoded);
        if (!raw) return false;
        for (uint32_t r = 0; r < rows; r++) {
          samples_to_f32(raw + (size_t)r * ifd.width * bytes_per, band_row.data(),
                         ifd.width, ifd.bits, ifd.sample_format, ifd.predictor);
          float* dst = out + ((size_t)(s * rps + r)) * ifd.width * n_bands + b;
          for (uint32_t x = 0; x < ifd.width; x++) dst[(size_t)x * n_bands] = band_row[x];
        }
      }
    }
  }
  return true;
}

template <typename Fn>
int run_parallel(int n_tiles, int n_threads, Fn&& per_tile) {
  std::atomic<int> next{0};
  std::atomic<int> failed{0};  // 0 = ok, else tile_index + 1
  int workers = n_threads > 0 ? n_threads : (int)std::thread::hardware_concurrency();
  if (workers > n_tiles) workers = n_tiles;
  if (workers < 1) workers = 1;
  std::vector<std::thread> pool;
  for (int t = 0; t < workers; t++) {
    pool.emplace_back([&] {
      while (true) {
        int i = next.fetch_add(1);
        if (i >= n_tiles || failed.load() != 0) break;
        if (!per_tile(i)) {
          int expected = 0;
          failed.compare_exchange_strong(expected, i + 1);
          break;
        }
      }
    });
  }
  for (auto& th : pool) th.join();
  return failed.load();
}

}  // namespace

extern "C" {

int unet_decode_batch(const char** paths, int n_tiles, float* out,
                      long long tile_stride, int height, int width,
                      int channels, int n_threads) {
  return run_parallel(n_tiles, n_threads, [&](int i) {
    return decode_tile_f32(paths[i], out + (size_t)i * tile_stride,
                           height, width, channels);
  });
}

int unet_decode_masks(const char** paths, int n_tiles, int* out,
                      long long tile_stride, int height, int width,
                      int n_threads) {
  return run_parallel(n_tiles, n_threads, [&](int i) {
    std::vector<float> tmp((size_t)height * width);
    if (!decode_tile_f32(paths[i], tmp.data(), height, width, 1)) return false;
    int* dst = out + (size_t)i * tile_stride;
    for (size_t k = 0; k < tmp.size(); k++) dst[k] = (int)tmp[k];
    return true;
  });
}

int unet_native_version(void) { return 1; }

}  // extern "C"
