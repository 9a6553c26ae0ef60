// Baseline-sequential JPEG decoder (SOF0/SOF1, Huffman, 8-bit, 1- or
// 3-component, arbitrary sampling factors, restart markers, TIFF
// JPEGTables abbreviated streams, libjpeg "fancy" chroma upsampling).
//
// Native twin of unet_tpu/geo/jpeg.py: same marker walk, same float32
// matmul IDCT, same integer triangle-filter upsampling and rint/clip
// rounding, so outputs agree with the Python decoder within ±1 level
// (the only divergence is sgemm accumulation order at exact-half
// rounding boundaries) and with libjpeg within ±2. The Python decoder's
// Huffman loop is the production bottleneck for JPEG-in-TIFF aerial
// tiles (the reference reads these through libgdal→libjpeg,
// /root/reference/utils.py:39-48); this module restores native decode
// speed with a libjpeg-style two-level Huffman lookup (8-bit lookahead
// table + canonical maxcode fallback).

#include "jpegdec.h"

#include <cmath>
#include <cstring>
#include <vector>

namespace unet_native {
namespace {

// zigzag position -> natural (row-major) position
const uint8_t kZigzag[64] = {
    0,  1,  8,  16, 9,  2,  3,  10, 17, 24, 32, 25, 18, 11, 4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6,  7,  14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63};

// 8-point IDCT basis A[u][x] = c(u)/2 * cos((2x+1) u pi / 16), float32 —
// the exact matrix geo/jpeg.py builds, so pixel values agree.
struct Basis {
  float a[8][8];
  Basis() {
    for (int u = 0; u < 8; u++) {
      double c = (u == 0) ? (1.0 / std::sqrt(2.0)) : 1.0;
      for (int x = 0; x < 8; x++)
        a[u][x] = (float)(0.5 * c * std::cos((2 * x + 1) * u * M_PI / 16.0));
    }
  }
};
const Basis kBasis;

struct HuffTbl {
  bool present = false;
  // canonical decode: maxcode[l] = largest code of length l (-1 if none),
  // valptr[l] + (code - mincode[l]) indexes symbols[]
  int32_t maxcode[17];
  int32_t mincode[17];
  int32_t valptr[17];
  uint8_t symbols[256];
  // 8-bit lookahead: for codes of length <= 8, look_nbits[peek] gives the
  // code length (0 = not resolvable in 8 bits) and look_sym[] the symbol
  uint8_t look_nbits[256];
  uint8_t look_sym[256];

  void build(const uint8_t counts[16], const uint8_t* syms, int total) {
    present = true;
    std::memcpy(symbols, syms, (size_t)total);
    int code = 0, k = 0;
    std::memset(look_nbits, 0, sizeof(look_nbits));
    for (int l = 1; l <= 16; l++) {
      if (counts[l - 1] == 0) {
        maxcode[l] = -1;
        mincode[l] = 0;
        valptr[l] = 0;
        code <<= 1;
        continue;
      }
      valptr[l] = k;
      mincode[l] = code;
      for (int i = 0; i < counts[l - 1]; i++) {
        if (l <= 8) {
          // every 8-bit peek starting with this code resolves to it
          int lo = code << (8 - l), hi = lo + (1 << (8 - l));
          for (int p = lo; p < hi; p++) {
            look_nbits[p] = (uint8_t)l;
            look_sym[p] = syms[k];
          }
        }
        code++;
        k++;
      }
      maxcode[l] = code - 1;
      code <<= 1;
    }
  }
};

// MSB-first bit reader with 0xFF00 destuffing; markers and EOF pad with
// zero bytes without being consumed (geo/jpeg.py _BitReader semantics).
struct BitSrc {
  const uint8_t* d;
  long long n;
  long long pos;
  uint64_t acc = 0;
  int nbits = 0;

  void fill() {
    while (nbits <= 48) {
      uint32_t b = 0;
      if (pos < n) {
        b = d[pos];
        if (b == 0xFF) {
          uint32_t nxt = (pos + 1 < n) ? d[pos + 1] : 0xD9;
          if (nxt == 0x00) {
            pos += 2;  // stuffed literal 0xFF
          } else {
            b = 0;  // restart/EOI/other marker: pad, do not consume
          }
        } else {
          pos++;
        }
      }
      acc = (acc << 8) | b;
      nbits += 8;
    }
  }

  int bits(int nb) {
    if (nb == 0) return 0;
    if (nbits < nb) fill();
    nbits -= nb;
    return (int)((acc >> nbits) & ((1u << nb) - 1));
  }

  // returns symbol, or -1 on an invalid code
  int decode(const HuffTbl& t) {
    if (nbits < 16) fill();
    int look = (int)((acc >> (nbits - 8)) & 0xFF);
    int nb = t.look_nbits[look];
    if (nb) {
      nbits -= nb;
      return t.look_sym[look];
    }
    int code16 = (int)((acc >> (nbits - 16)) & 0xFFFF);
    for (int l = 9; l <= 16; l++) {
      int c = code16 >> (16 - l);
      if (t.maxcode[l] >= 0 && c <= t.maxcode[l]) {
        nbits -= l;
        return t.symbols[t.valptr[l] + c - t.mincode[l]];
      }
    }
    return -1;
  }

  void align_restart() {
    acc = 0;
    nbits = 0;
    while (pos + 1 < n) {
      if (d[pos] == 0xFF && d[pos + 1] >= 0xD0 && d[pos + 1] <= 0xD7) {
        pos += 2;
        return;
      }
      pos++;
    }
    pos = n;
  }
};

inline int jextend(int v, int nb) {
  if (nb == 0) return 0;
  return (v >= (1 << (nb - 1))) ? v : v - (1 << nb) + 1;
}

struct Comp {
  int id = 0, h = 1, v = 1, tq = 0;
  int dc = 0, ac = 0;  // from SOS
};

struct JState {
  float qt[4][64];  // natural order
  bool qt_present[4] = {false, false, false, false};
  HuffTbl huff_dc[4], huff_ac[4];
  int restart_interval = 0;
  bool has_frame = false;
  int precision = 0, h = 0, w = 0, nc = 0;
  Comp comps[4];
  int scan_order[4];  // scan position -> component index
  int scan_nc = 0;
};

// Walk marker segments filling `state`. Returns the offset of
// entropy-coded data after SOS, -1 if no SOS (tables-only stream is
// fine), -2 for non-baseline coding, -3 for corrupt structure.
long long parse_segments(const uint8_t* data, long long n, JState& st) {
  if (n < 2 || data[0] != 0xFF || data[1] != 0xD8) return -3;
  long long pos = 2;
  while (pos + 4 <= n) {
    if (data[pos] != 0xFF) {
      pos++;
      continue;
    }
    int marker = data[pos + 1];
    if (marker == 0xD8 || marker == 0x01 || (marker >= 0xD0 && marker <= 0xD7)) {
      pos += 2;
      continue;
    }
    if (marker == 0xD9) return -1;  // EOI before SOS
    int seglen = (data[pos + 2] << 8) | data[pos + 3];
    if (pos + 2 + seglen > n || seglen < 2) return -3;
    const uint8_t* seg = data + pos + 4;
    int sn = seglen - 2;
    if (marker == 0xDB) {  // DQT
      int i = 0;
      while (i < sn) {
        int pq = seg[i] >> 4, tq = seg[i] & 0xF;
        i++;
        if (tq > 3) return -3;
        st.qt_present[tq] = true;
        if (pq == 0) {
          if (i + 64 > sn) return -3;
          for (int k = 0; k < 64; k++) st.qt[tq][kZigzag[k]] = (float)seg[i + k];
          i += 64;
        } else {
          if (i + 128 > sn) return -3;
          for (int k = 0; k < 64; k++)
            st.qt[tq][kZigzag[k]] =
                (float)((seg[i + 2 * k] << 8) | seg[i + 2 * k + 1]);
          i += 128;
        }
      }
    } else if (marker == 0xC4) {  // DHT
      int i = 0;
      while (i + 17 <= sn) {
        int tc = seg[i] >> 4, th = seg[i] & 0xF;
        if (th > 3) return -3;
        int total = 0;
        for (int k = 0; k < 16; k++) total += seg[i + 1 + k];
        if (total > 256 || i + 17 + total > sn) return -3;
        HuffTbl& t = (tc == 0) ? st.huff_dc[th] : st.huff_ac[th];
        t.build(seg + i + 1, seg + i + 17, total);
        i += 17 + total;
      }
    } else if (marker == 0xC0 || marker == 0xC1) {  // SOF0/SOF1 baseline
      if (sn < 6) return -3;
      st.precision = seg[0];
      st.h = (seg[1] << 8) | seg[2];
      st.w = (seg[3] << 8) | seg[4];
      st.nc = seg[5];
      if (st.nc < 1 || st.nc > 4 || sn < 6 + 3 * st.nc) return -3;
      for (int c = 0; c < st.nc; c++) {
        st.comps[c].id = seg[6 + 3 * c];
        st.comps[c].h = seg[7 + 3 * c] >> 4;
        st.comps[c].v = seg[7 + 3 * c] & 0xF;
        st.comps[c].tq = seg[8 + 3 * c];
        if (st.comps[c].h < 1 || st.comps[c].h > 4 || st.comps[c].v < 1 ||
            st.comps[c].v > 4 || st.comps[c].tq > 3)
          return -3;
      }
      st.has_frame = true;
    } else if (marker == 0xC2 || marker == 0xC3 || marker == 0xC5 ||
               marker == 0xC6 || marker == 0xC7 || marker == 0xC9 ||
               marker == 0xCA || marker == 0xCB || marker == 0xCD ||
               marker == 0xCE || marker == 0xCF) {
      return -2;  // progressive / arithmetic / extended
    } else if (marker == 0xDD) {  // DRI
      if (sn < 2) return -3;
      st.restart_interval = (seg[0] << 8) | seg[1];
    } else if (marker == 0xDA) {  // SOS
      if (sn < 1) return -3;
      st.scan_nc = seg[0];
      if (st.scan_nc < 1 || st.scan_nc > 4 || sn < 1 + 2 * st.scan_nc)
        return -3;
      for (int c = 0; c < st.scan_nc; c++) {
        int cs = seg[1 + 2 * c];
        int found = -1;
        for (int k = 0; k < st.nc; k++)
          if (st.comps[k].id == cs) found = k;
        if (found < 0) return -3;
        st.comps[found].dc = seg[2 + 2 * c] >> 4;
        st.comps[found].ac = seg[2 + 2 * c] & 0xF;
        st.scan_order[c] = found;
      }
      return pos + 2 + seglen;
    }
    pos += 2 + seglen;
  }
  return -1;
}

// libjpeg h2v1_fancy_upsample: horizontal 2x, 3/4-1/4 triangle filter
// (geo/jpeg.py _fancy_h2). src (h, w) int32 -> dst (h, 2w) int32.
void fancy_h2(const int32_t* src, int h, int w, int32_t* dst) {
  for (int y = 0; y < h; y++) {
    const int32_t* s = src + (size_t)y * w;
    int32_t* o = dst + (size_t)y * 2 * w;
    for (int x = 0; x < w; x++) {
      int32_t p = s[x];
      int32_t prev = s[x > 0 ? x - 1 : 0];
      int32_t nxt = s[x < w - 1 ? x + 1 : w - 1];
      o[2 * x] = (3 * p + prev + 1) >> 2;
      o[2 * x + 1] = (3 * p + nxt + 2) >> 2;
    }
  }
}

// libjpeg h2v2_fancy_upsample (geo/jpeg.py _fancy_h2v2): vertical 3:1
// column sums then the horizontal triangle pass with /16 rounding.
// src (h, w) -> dst (2h, 2w).
void fancy_h2v2(const int32_t* src, int h, int w, int32_t* dst,
                std::vector<int32_t>& rowbuf) {
  rowbuf.resize((size_t)2 * h * w);
  for (int y = 0; y < h; y++) {
    const int32_t* s = src + (size_t)y * w;
    const int32_t* up = src + (size_t)(y > 0 ? y - 1 : 0) * w;
    const int32_t* dn = src + (size_t)(y < h - 1 ? y + 1 : h - 1) * w;
    int32_t* r0 = rowbuf.data() + (size_t)(2 * y) * w;
    int32_t* r1 = rowbuf.data() + (size_t)(2 * y + 1) * w;
    for (int x = 0; x < w; x++) {
      r0[x] = 3 * s[x] + up[x];
      r1[x] = 3 * s[x] + dn[x];
    }
  }
  for (int y = 0; y < 2 * h; y++) {
    const int32_t* r = rowbuf.data() + (size_t)y * w;
    int32_t* o = dst + (size_t)y * 2 * w;
    for (int x = 0; x < w; x++) {
      int32_t p = r[x];
      int32_t prev = r[x > 0 ? x - 1 : 0];
      int32_t nxt = r[x < w - 1 ? x + 1 : w - 1];
      o[2 * x] = (3 * p + prev + 8) >> 4;
      o[2 * x + 1] = (3 * p + nxt + 7) >> 4;
    }
  }
}

// np.rint: round half to even — nearbyintf under the default FE rounding
// mode, which we rely on (never changed process-wide).
inline int32_t rint_clip255(float v) {
  float r = std::nearbyintf(v);
  if (r < 0.0f) return 0;
  if (r > 255.0f) return 255;
  return (int32_t)r;
}

}  // namespace

int jpeg_dims_impl(const uint8_t* data, long long n, int* h, int* w, int* c) {
  if (n < 2 || data[0] != 0xFF || data[1] != 0xD8) return -3;
  long long pos = 2;
  while (pos + 4 <= n) {
    if (data[pos] != 0xFF) {
      pos++;
      continue;
    }
    int marker = data[pos + 1];
    if (marker == 0xD8 || marker == 0x01 || (marker >= 0xD0 && marker <= 0xD7)) {
      pos += 2;
      continue;
    }
    if (marker == 0xD9 || marker == 0xDA) return -1;
    int seglen = (data[pos + 2] << 8) | data[pos + 3];
    if (pos + 2 + seglen > n || seglen < 2) return -3;
    if (marker == 0xC0 || marker == 0xC1) {
      const uint8_t* seg = data + pos + 4;
      if (seglen - 2 < 6) return -3;
      *h = (seg[1] << 8) | seg[2];
      *w = (seg[3] << 8) | seg[4];
      *c = seg[5];
      return 0;
    }
    if (marker >= 0xC2 && marker <= 0xCF && marker != 0xC4 && marker != 0xC8 &&
        marker != 0xCC)
      return -2;  // non-baseline frame
    pos += 2 + seglen;
  }
  return -1;
}

int jpeg_decode_impl(const uint8_t* data, long long n, const uint8_t* tables,
                     long long tn, uint8_t* dst, long long cap, int* out_h,
                     int* out_w, int* out_c, int color_transform) try {
  JState st;
  if (tables && tn > 0) {
    long long r = parse_segments(tables, tn, st);
    if (r == -2 || r == -3) return (int)r;
    // -1 (no SOS) is the normal abbreviated-tables outcome
  }
  long long scan_pos = parse_segments(data, n, st);
  if (scan_pos < 0) return (scan_pos == -1) ? -1 : (int)scan_pos;
  if (!st.has_frame) return -1;
  if (st.precision != 8) return -2;
  if (st.scan_nc != st.nc) return -1;  // single interleaved scan only
  if (st.h <= 0 || st.w <= 0) return -1;
  // a forged frame header must not drive allocation past the caller's
  // buffer: the decode needs ~(hmax*vmax+1)*h*w floats of plane scratch,
  // so bound the frame by the destination capacity before allocating
  if ((long long)st.h * st.w * st.nc > cap) return -3;

  int hmax = 1, vmax = 1;
  for (int c = 0; c < st.nc; c++) {
    if (st.comps[c].h > hmax) hmax = st.comps[c].h;
    if (st.comps[c].v > vmax) vmax = st.comps[c].v;
  }
  int mcus_x = (st.w + 8 * hmax - 1) / (8 * hmax);
  int mcus_y = (st.h + 8 * vmax - 1) / (8 * vmax);

  for (int s = 0; s < st.scan_nc; s++) {
    const Comp& cp = st.comps[st.scan_order[s]];
    if (!st.qt_present[cp.tq] || !st.huff_dc[cp.dc].present ||
        !st.huff_ac[cp.ac].present)
      return -1;
  }

  // decode planes (float32, MCU-padded) in scan order
  std::vector<std::vector<float>> planes(st.scan_nc);
  std::vector<int> pw(st.scan_nc), ph(st.scan_nc);
  for (int s = 0; s < st.scan_nc; s++) {
    const Comp& cp = st.comps[st.scan_order[s]];
    pw[s] = mcus_x * 8 * cp.h;
    ph[s] = mcus_y * 8 * cp.v;
    planes[s].assign((size_t)pw[s] * ph[s], 0.0f);
  }

  BitSrc br{data, n, scan_pos};
  int dc_pred[4] = {0, 0, 0, 0};
  int ri = st.restart_interval;
  long long mcu_count = 0;
  float coef[64], block[64], tmp[64];

  for (int my = 0; my < mcus_y; my++) {
    for (int mx = 0; mx < mcus_x; mx++) {
      if (ri && mcu_count && mcu_count % ri == 0) {
        br.align_restart();
        dc_pred[0] = dc_pred[1] = dc_pred[2] = dc_pred[3] = 0;
      }
      for (int s = 0; s < st.scan_nc; s++) {
        const Comp& cp = st.comps[st.scan_order[s]];
        const HuffTbl& dct = st.huff_dc[cp.dc];
        const HuffTbl& act = st.huff_ac[cp.ac];
        const float* q = st.qt[cp.tq];
        for (int by = 0; by < cp.v; by++) {
          for (int bx = 0; bx < cp.h; bx++) {
            std::memset(coef, 0, sizeof(coef));
            int t = br.decode(dct);
            if (t < 0 || t > 15) return -1;
            dc_pred[s] += jextend(br.bits(t), t);
            coef[0] = (float)dc_pred[s];
            int k = 1;
            while (k < 64) {
              int rs = br.decode(act);
              if (rs < 0) return -1;
              int run = rs >> 4, size = rs & 0xF;
              if (size == 0) {
                if (run == 15) {
                  k += 16;
                  continue;
                }
                break;  // EOB
              }
              k += run;
              if (k > 63) break;
              coef[kZigzag[k]] = (float)jextend(br.bits(size), size);
              k++;
            }
            // dequantize + float32 two-pass IDCT (A^T (coef*Q) A + 128)
            for (int i = 0; i < 64; i++) block[i] = coef[i] * q[i];
            for (int u = 0; u < 8; u++)
              for (int y = 0; y < 8; y++) {
                float acc = 0.0f;
                for (int v = 0; v < 8; v++)
                  acc += block[u * 8 + v] * kBasis.a[v][y];
                tmp[u * 8 + y] = acc;
              }
            float* plane = planes[s].data();
            int y0 = (my * cp.v + by) * 8;
            int x0 = (mx * cp.h + bx) * 8;
            for (int x = 0; x < 8; x++) {
              float* prow = plane + (size_t)(y0 + x) * pw[s] + x0;
              for (int y = 0; y < 8; y++) {
                float acc = 0.0f;
                for (int u = 0; u < 8; u++)
                  acc += kBasis.a[u][x] * tmp[u * 8 + y];
                prow[y] = acc + 128.0f;
              }
            }
          }
        }
      }
      mcu_count++;
    }
  }

  // upsample to full grid, crop, color-convert — mirrors geo/jpeg.py:
  // subsampled planes round to int before the integer triangle filters.
  std::vector<std::vector<float>> full(st.scan_nc);
  std::vector<int32_t> ibuf, obuf, rowbuf;
  for (int s = 0; s < st.scan_nc; s++) {
    const Comp& cp = st.comps[st.scan_order[s]];
    int fy = vmax / cp.v, fx = hmax / cp.h;
    if ((fy == 1 && fx == 2) || (fy == 2 && fx == 2)) {
      ibuf.resize((size_t)pw[s] * ph[s]);
      for (size_t i = 0; i < ibuf.size(); i++)
        ibuf[i] = rint_clip255(planes[s][i]);
      obuf.resize((size_t)pw[s] * ph[s] * (size_t)fy * fx);
      if (fy == 1)
        fancy_h2(ibuf.data(), ph[s], pw[s], obuf.data());
      else
        fancy_h2v2(ibuf.data(), ph[s], pw[s], obuf.data(), rowbuf);
      int fw = pw[s] * fx;
      full[s].resize((size_t)st.h * st.w);
      for (int y = 0; y < st.h; y++)
        for (int x = 0; x < st.w; x++)
          full[s][(size_t)y * st.w + x] = (float)obuf[(size_t)y * fw + x];
    } else if (fy > 1 || fx > 1) {
      // nearest-neighbor replication for other factors (np.repeat)
      full[s].resize((size_t)st.h * st.w);
      for (int y = 0; y < st.h; y++)
        for (int x = 0; x < st.w; x++)
          full[s][(size_t)y * st.w + x] =
              planes[s][(size_t)(y / fy) * pw[s] + (x / fx)];
    } else {
      full[s].resize((size_t)st.h * st.w);
      for (int y = 0; y < st.h; y++)
        std::memcpy(full[s].data() + (size_t)y * st.w,
                    planes[s].data() + (size_t)y * pw[s],
                    (size_t)st.w * sizeof(float));
    }
  }

  *out_h = st.h;
  *out_w = st.w;
  *out_c = st.nc;

  if (st.nc == 3) {
    bool convert;
    if (color_transform >= 0) {
      convert = color_transform != 0;
    } else {
      convert = !(st.comps[st.scan_order[0]].id == 0x52 &&
                  st.comps[st.scan_order[1]].id == 0x47 &&
                  st.comps[st.scan_order[2]].id == 0x42);
    }
    const float* yp = full[0].data();
    const float* cbp = full[1].data();
    const float* crp = full[2].data();
    size_t npix = (size_t)st.h * st.w;
    if (convert) {
      for (size_t i = 0; i < npix; i++) {
        float y = yp[i], cb = cbp[i] - 128.0f, cr = crp[i] - 128.0f;
        dst[3 * i] = (uint8_t)rint_clip255(y + 1.402f * cr);
        dst[3 * i + 1] =
            (uint8_t)rint_clip255(y - 0.344136f * cb - 0.714136f * cr);
        dst[3 * i + 2] = (uint8_t)rint_clip255(y + 1.772f * cb);
      }
    } else {
      for (size_t i = 0; i < npix; i++) {
        dst[3 * i] = (uint8_t)rint_clip255(yp[i]);
        dst[3 * i + 1] = (uint8_t)rint_clip255(cbp[i]);
        dst[3 * i + 2] = (uint8_t)rint_clip255(crp[i]);
      }
    }
  } else {
    size_t npix = (size_t)st.h * st.w;
    for (int s = 0; s < st.nc; s++) {
      const float* p = full[s].data();
      for (size_t i = 0; i < npix; i++)
        dst[i * st.nc + s] = (uint8_t)rint_clip255(p[i]);
    }
  }
  return 0;
} catch (const std::exception&) {
  return -1;  // bad_alloc etc. must not escape the C ABI
}

}  // namespace unet_native

extern "C" {

int unet_jpeg_dims(const uint8_t* data, long long n, int* h, int* w, int* c) {
  return unet_native::jpeg_dims_impl(data, n, h, w, c);
}

int unet_jpeg_decode(const uint8_t* data, long long n, const uint8_t* tables,
                     long long tn, uint8_t* dst, long long cap, int* out_h,
                     int* out_w, int* out_c, int color_transform) {
  return unet_native::jpeg_decode_impl(data, n, tables, tn, dst, cap, out_h,
                                       out_w, out_c, color_transform);
}

}  // extern "C"
