// Native encoder hot loops: motion search, subpel MC, quantization, CDEF.
//
// Host-side scalar/serial counterparts of the vectorized numpy paths in
// rav1e_tpu/ops/{mc,cdef}.py and rav1e_tpu/quantize.py — bit-exact with the
// Python implementations (round-trip tests cross-validate: encoder recon
// built here must match the decoder's pure-Python reconstruction).

#include <algorithm>
#include <cstdint>
#include <ctime>
#include <cmath>
#include <climits>
#include <cstring>
#include <vector>

namespace {

inline int64_t round_shift(int64_t x, int bit) {
  return (x + (int64_t(1) << (bit - 1))) >> bit;
}

inline int32_t px_at(const void* p, long stride, int bytespp, long y, long x) {
  if (bytespp == 1) return ((const uint8_t*)p)[y * stride + x];
  return ((const uint16_t*)p)[y * stride + x];
}

// --- subpel filters (registered from Python; mc.rs:110-216) ---------------
int32_t g_subpel[6][16][8];

inline const int32_t* get_filter(int mode, int frac, int length) {
  int idx = (mode == 3 || length > 4) ? mode : std::min(mode, 1) + 4;
  return g_subpel[idx][frac];
}

}  // namespace

extern "C" {

void enc_set_subpel_filters(const int32_t* data) {
  std::memcpy(g_subpel, data, sizeof(g_subpel));
}

// put_8tap: (h, w) int32 prediction at integer pos (x0, y0) + 1/16 fracs.
// Exact pipeline of mc.py::put_8tap / reference mc.rs:250-355.
// int32 accumulators are exact here: |coeff sum| * max px < 2^31 for all
// supported bit depths, and the i16 intermediate matches the wrap rule.
#define PUT8TAP_BODY(T)                                                     \
  {                                                                         \
    const T* rp = (const T*)ref;                                            \
    if (col_frac == 0 && row_frac == 0) {                                   \
      for (int y = 0; y < h; y++) {                                         \
        const T* row = rp + (y0 + y) * stride + x0;                         \
        for (int x = 0; x < w; x++) out[y * w + x] = row[x];                \
      }                                                                     \
      return;                                                               \
    }                                                                       \
    const int32_t* xf = get_filter(mode_x, col_frac, w);                    \
    const int32_t* yf = get_filter(mode_y, row_frac, h);                    \
    if (col_frac == 0) {                                                    \
      for (int y = 0; y < h; y++) {                                         \
        const T* base = rp + (y0 + y - 3) * stride + x0;                    \
        for (int x = 0; x < w; x++) {                                       \
          int32_t acc = 0;                                                  \
          for (int k = 0; k < 8; k++)                                       \
            acc += yf[k] * (int32_t)base[(long)k * stride + x];             \
          int32_t v = (acc + (1 << 6)) >> 7;                                \
          out[y * w + x] = std::clamp(v, 0, max_val);                       \
        }                                                                   \
      }                                                                     \
      return;                                                               \
    }                                                                       \
    if (row_frac == 0) {                                                    \
      for (int y = 0; y < h; y++) {                                         \
        const T* row = rp + (y0 + y) * stride + x0 - 3;                     \
        for (int x = 0; x < w; x++) {                                       \
          int32_t acc = 0;                                                  \
          for (int k = 0; k < 8; k++) acc += xf[k] * (int32_t)row[x + k];   \
          int32_t v = (acc + (1 << (6 - inter_bits))) >> (7 - inter_bits);  \
          v = (v + (1 << inter_bits >> 1)) >> inter_bits;                   \
          out[y * w + x] = std::clamp(v, 0, max_val);                       \
        }                                                                   \
      }                                                                     \
      return;                                                               \
    }                                                                       \
    static thread_local std::vector<int16_t> horiz;                         \
    horiz.resize((size_t)(h + 7) * w);                                      \
    for (int y = 0; y < h + 7; y++) {                                       \
      const T* row = rp + (y0 + y - 3) * stride + x0 - 3;                   \
      for (int x = 0; x < w; x++) {                                         \
        int32_t acc = 0;                                                    \
        for (int k = 0; k < 8; k++) acc += xf[k] * (int32_t)row[x + k];     \
        int32_t v = (acc + (1 << (6 - inter_bits))) >> (7 - inter_bits);    \
        horiz[(size_t)y * w + x] = (int16_t)v;                              \
      }                                                                     \
    }                                                                       \
    for (int y = 0; y < h; y++)                                             \
      for (int x = 0; x < w; x++) {                                         \
        int32_t acc = 0;                                                    \
        for (int k = 0; k < 8; k++)                                         \
          acc += yf[k] * (int32_t)horiz[(size_t)(y + k) * w + x];           \
        int32_t sh = 7 + inter_bits;                                        \
        int32_t v = (acc + (1 << sh >> 1)) >> sh;                           \
        out[y * w + x] = std::clamp(v, 0, max_val);                         \
      }                                                                     \
  }

void enc_put_8tap(const void* ref, long stride, int bytespp, long x0, long y0,
                  int w, int h, int col_frac, int row_frac, int mode_x,
                  int mode_y, int bd, int32_t* out) {
  const int max_val = (1 << bd) - 1;
  const int inter_bits = 4 - (bd == 12 ? 2 : 0);
  if (bytespp == 1) PUT8TAP_BODY(uint8_t)
  else PUT8TAP_BODY(uint16_t)
}

// --- motion search ---------------------------------------------------------

// full-pel search family + range (enc_me_set_method): 0 diamond, 1 hexagon,
// 2 uneven multi-hex, 3 exhaustive — constant per frame, so a global is safe
// across tile threads
static int g_me_method = 0;
static int g_me_range = 16;

#define SAD_BLOCK_T(NAME, T)                                              \
  static long NAME(const T* ref, long rstride, long ry, long rx,          \
                   const T* src, long sstride, long sy, long sx, int w,   \
                   int h) {                                               \
    long sad = 0;                                                         \
    for (int y = 0; y < h; y++) {                                         \
      const T* rr = ref + (ry + y) * rstride + rx;                        \
      const T* sr = src + (sy + y) * sstride + sx;                        \
      long row = 0;                                                       \
      for (int x = 0; x < w; x++) {                                       \
        int d = (int)sr[x] - (int)rr[x];                                  \
        row += d < 0 ? -d : d;                                            \
      }                                                                   \
      sad += row;                                                         \
    }                                                                     \
    return sad;                                                           \
  }
SAD_BLOCK_T(sad_block_u8, uint8_t)
SAD_BLOCK_T(sad_block_u16, uint16_t)

// dispatch once per block on the pixel width so the inner loop vectorizes
static long sad_block(const void* ref, long rstride, int bytespp, long ry,
                      long rx, const void* src, long sstride, long sy, long sx,
                      int w, int h) {
  if (bytespp == 1)
    return sad_block_u8((const uint8_t*)ref, rstride, ry, rx,
                        (const uint8_t*)src, sstride, sy, sx, w, h);
  return sad_block_u16((const uint16_t*)ref, rstride, ry, rx,
                       (const uint16_t*)src, sstride, sy, sx, w, h);
}

// src-vs-int32-pred SAD / diff with per-width dispatch (vectorizable)
#define SADPRED_BODY(T)                                                    \
  {                                                                        \
    const T* sp = (const T*)src + sy * sstride + sx;                       \
    long sad = 0;                                                          \
    for (int y = 0; y < h; y++) {                                          \
      long row = 0;                                                        \
      for (int x = 0; x < w; x++) {                                        \
        int d = (int)sp[y * sstride + x] - pred[y * w + x];                \
        row += d < 0 ? -d : d;                                             \
      }                                                                    \
      sad += row;                                                          \
    }                                                                      \
    return sad;                                                            \
  }
static long sad_pred(const void* src, long sstride, int bytespp, long sy,
                     long sx, const int32_t* pred, int w, int h) {
  if (bytespp == 1) SADPRED_BODY(uint8_t)
  SADPRED_BODY(uint16_t)
}
// exported for the tile engine's device-MV candidate evaluation
extern "C" long sad_pred_ext(const void* src, long sstride, int bytespp,
                             long sy, long sx, const int32_t* pred, int w,
                             int h) {
  return sad_pred(src, sstride, bytespp, sy, sx, pred, w, h);
}
static void diff_pred(const void* src, long sstride, int bytespp, long sy,
                      long sx, const int32_t* pred, int w, int h,
                      int32_t* diff) {
  if (bytespp == 1) {
    const uint8_t* sp = (const uint8_t*)src + sy * sstride + sx;
    for (int y = 0; y < h; y++)
      for (int x = 0; x < w; x++)
        diff[y * w + x] = (int)sp[y * sstride + x] - pred[y * w + x];
  } else {
    const uint16_t* sp = (const uint16_t*)src + sy * sstride + sx;
    for (int y = 0; y < h; y++)
      for (int x = 0; x < w; x++)
        diff[y * w + x] = (int)sp[y * sstride + x] - pred[y * w + x];
  }
}

// Diamond full-pel + half/quarter-pel refinement (pipeline.py select_inter;
// capability counterpart of reference me.rs).  mv units are 1/8 pel.
// Writes (mv_row, mv_col) into out_mv; returns the SAD (or -1 if no valid
// candidate).
static int g_subpel_iters = 1 << 20;  // per-step refinement iteration cap

void enc_me_set_method(int method, int range_px) {
  g_me_method = method;
  g_me_range = range_px;
}

void enc_me_set_subpel_iters(int iters) {
  g_subpel_iters = iters > 0 ? iters : 1 << 20;
}

long enc_me_fullpel_extra(const void* ref, long rstride, long rh, long rw,
                          int bytespp, long ax, long ay, const void* src,
                          long sstride, long spx, long spy, int w, int h,
                          int max_off, int method, int range_px,
                          int32_t* best_mv, long best_sad_in);

long enc_me_search(const void* ref, long rstride, long rh, long rw,
                   int bytespp, long ax, long ay, const void* src,
                   long sstride, long spx, long spy, int w, int h, int bd,
                   const int32_t* seeds, int nseeds, int max_off,
                   int32_t* out_mv) {
  long best_sad = -1;
  int best_r = 0, best_c = 0;

  auto sad_at = [&](int mvr, int mvc) -> long {
    long dy = mvr >> 3, dx = mvc >> 3;
    if (dy < -max_off || dy > max_off || dx < -max_off || dx > max_off)
      return -1;
    long ry = ay + dy, rx = ax + dx;
    if (ry < 4 || rx < 4 || ry + h + 4 > rh || rx + w + 4 > rw) return -1;
    return sad_block(ref, rstride, bytespp, ry, rx, src, sstride, spy, spx, w, h);
  };

  for (int i = 0; i < nseeds; i++) {
    int r = (seeds[2 * i] >> 3) << 3, c = (seeds[2 * i + 1] >> 3) << 3;
    long s = sad_at(r, c);
    if (s >= 0 && (best_sad < 0 || s < best_sad)) {
      best_sad = s; best_r = r; best_c = c;
    }
  }
  if (best_sad < 0) return -1;

  static const int dirs[4][2] = {{-1, 0}, {1, 0}, {0, -1}, {0, 1}};
  for (int step : {8, 4, 2, 1}) {
    bool improved = true;
    while (improved) {
      improved = false;
      for (auto& d : dirs) {
        int r = best_r + d[0] * step * 8, c = best_c + d[1] * step * 8;
        long s = sad_at(r, c);
        if (s >= 0 && s < best_sad) {
          best_sad = s; best_r = r; best_c = c; improved = true;
        }
      }
    }
  }

  if (g_me_method > 0) {
    int32_t bm[2] = {best_r, best_c};
    best_sad = enc_me_fullpel_extra(ref, rstride, rh, rw, bytespp, ax, ay,
                                    src, sstride, spx, spy, w, h, max_off,
                                    g_me_method, g_me_range, bm, best_sad);
    best_r = bm[0];
    best_c = bm[1];
  }

  // subpel refine (REGULAR filters, quarter-pel so diffs stay even)
  std::vector<int32_t> pred(w * h);
  auto sad_subpel = [&](int mvr, int mvc) -> long {
    long dy = mvr >> 3, dx = mvc >> 3;
    if (dy < -(max_off - 1) || dy > max_off - 1 || dx < -(max_off - 1) ||
        dx > max_off - 1)
      return -1;
    int row_int = mvr >> 3, col_int = mvc >> 3;
    int row_frac = (mvr << 1) & 0xF, col_frac = (mvc << 1) & 0xF;
    enc_put_8tap(ref, rstride, bytespp, ax + col_int, ay + row_int, w, h,
                 col_frac, row_frac, 0, 0, bd, pred.data());
    return sad_pred(src, sstride, bytespp, spy, spx, pred.data(), w, h);
  };
  for (int step : {4, 2}) {
    bool improved = true;
    while (improved) {
      improved = false;
      for (auto& d : dirs) {
        int r = best_r + d[0] * step, c = best_c + d[1] * step;
        long s = sad_subpel(r, c);
        if (s >= 0 && s < best_sad) {
          best_sad = s; best_r = r; best_c = c; improved = true;
        }
      }
    }
  }

  out_mv[0] = best_r;
  out_mv[1] = best_c;
  return best_sad;
}

// Full-pel search pattern library (reference me.rs:955-1511 families):
// method 0 = diamond only, 1 = + hexagon refine, 2 = + uneven multi-hex,
// 3 = + exhaustive window.  Runs AFTER the diamond, before subpel; the
// Python fallback in encoder/pipeline.py mirrors the exact candidate order
// and strict-< acceptance so native-on/off bitstreams stay identical.
long enc_me_fullpel_extra(const void* ref, long rstride, long rh, long rw,
                          int bytespp, long ax, long ay, const void* src,
                          long sstride, long spx, long spy, int w, int h,
                          int max_off, int method, int range_px,
                          int32_t* best_mv, long best_sad_in) {
  long best_sad = best_sad_in;
  int best_r = best_mv[0], best_c = best_mv[1];
  auto sad_at = [&](int mvr, int mvc) -> long {
    long dy = mvr >> 3, dx = mvc >> 3;
    if (dy < -max_off || dy > max_off || dx < -max_off || dx > max_off)
      return -1;
    long ry = ay + dy, rx = ax + dx;
    if (ry < 4 || rx < 4 || ry + h + 4 > rh || rx + w + 4 > rw) return -1;
    return sad_block(ref, rstride, bytespp, ry, rx, src, sstride, spy, spx, w, h);
  };
  auto try_mv = [&](int dr_px, int dc_px) {
    long s = sad_at(best_mv[0] + dr_px * 8, best_mv[1] + dc_px * 8);
    if (s >= 0 && s < best_sad) {
      best_sad = s;
      best_r = best_mv[0] + dr_px * 8;
      best_c = best_mv[1] + dc_px * 8;
    }
  };
  // (dr, dc) hexagon offsets in px (me.rs:1055 hexagon_search pattern)
  static const int hexp[6][2] = {{0, -2}, {0, 2}, {-2, -1}, {-2, 1}, {2, -1}, {2, 1}};
  static const int sqr8[8][2] = {{-1, -1}, {-1, 0}, {-1, 1}, {0, -1},
                                 {0, 1}, {1, -1}, {1, 0}, {1, 1}};
  if (method >= 2) {
    // uneven multi-hexagon (me.rs:1170): cross search, 5x5 window, then
    // 16-point big-hex rings at growing radii
    for (int d = 2; d <= range_px; d += 2) {
      try_mv(0, -d); best_mv[0] = best_r; best_mv[1] = best_c;
      try_mv(0, d);  best_mv[0] = best_r; best_mv[1] = best_c;
      try_mv(-d, 0); best_mv[0] = best_r; best_mv[1] = best_c;
      try_mv(d, 0);  best_mv[0] = best_r; best_mv[1] = best_c;
    }
    int cr = best_r, cc = best_c;
    for (int dr = -2; dr <= 2; dr++)
      for (int dc = -2; dc <= 2; dc++) {
        long s = sad_at(cr + dr * 8, cc + dc * 8);
        if (s >= 0 && s < best_sad) { best_sad = s; best_r = cr + dr * 8; best_c = cc + dc * 8; }
      }
    best_mv[0] = best_r; best_mv[1] = best_c;
    static const int bighex[16][2] = {
        {2, -4}, {1, -4}, {0, -4}, {-1, -4}, {-2, -4},
        {2, 4}, {1, 4}, {0, 4}, {-1, 4}, {-2, 4},
        {3, -2}, {4, 0}, {3, 2}, {-3, -2}, {-4, 0}, {-3, 2}};
    cr = best_r; cc = best_c;
    for (int i = 1; i * 4 <= range_px; i++)
      for (auto& p : bighex) {
        long s = sad_at(cr + p[0] * i * 8, cc + p[1] * i * 8);
        if (s >= 0 && s < best_sad) {
          best_sad = s; best_r = cr + p[0] * i * 8; best_c = cc + p[1] * i * 8;
        }
      }
    best_mv[0] = best_r; best_mv[1] = best_c;
  }
  if (method >= 1) {
    // hexagon hill-climb (me.rs:1055) then square refine
    for (int step : {2, 1}) {
      bool improved = true;
      while (improved) {
        improved = false;
        for (auto& p : hexp) {
          long s = sad_at(best_mv[0] + p[0] * step * 8, best_mv[1] + p[1] * step * 8);
          if (s >= 0 && s < best_sad) {
            best_sad = s;
            best_r = best_mv[0] + p[0] * step * 8;
            best_c = best_mv[1] + p[1] * step * 8;
            improved = true;
          }
        }
        best_mv[0] = best_r; best_mv[1] = best_c;
      }
    }
    bool improved = true;
    while (improved) {
      improved = false;
      for (auto& p : sqr8) {
        long s = sad_at(best_mv[0] + p[0] * 8, best_mv[1] + p[1] * 8);
        if (s >= 0 && s < best_sad) {
          best_sad = s;
          best_r = best_mv[0] + p[0] * 8;
          best_c = best_mv[1] + p[1] * 8;
          improved = true;
        }
      }
      best_mv[0] = best_r; best_mv[1] = best_c;
    }
  }
  if (method >= 3) {
    // exhaustive window around the current best (me.rs full_search:1464)
    int cr = best_r, cc = best_c;
    for (int dr = -range_px; dr <= range_px; dr++)
      for (int dc = -range_px; dc <= range_px; dc++) {
        if (dr == 0 && dc == 0) continue;
        long s = sad_at(cr + dr * 8, cc + dc * 8);
        if (s >= 0 && s < best_sad) { best_sad = s; best_r = cr + dr * 8; best_c = cc + dc * 8; }
      }
    best_mv[0] = best_r; best_mv[1] = best_c;
  }
  best_mv[0] = best_r;
  best_mv[1] = best_c;
  return best_sad;
}

// --- quantization (quantize.py::quantize_block) ---------------------------

// coeffs: int32 (tx_h, tx_w) row-major; qcoeffs out, same layout (pre-zeroed
// by caller).  scan: uint16 over coded dims.  Returns eob.
int enc_quantize(const int32_t* coeffs, int tx_w, int tx_h, int coded_w,
                 int coded_h, const uint16_t* scan, int log_tx_scale,
                 long dc_quant, long ac_quant, long dc_offset, long ac_offset0,
                 long ac_offset1, long ac_offset_eob, int32_t* qcoeffs) {
  int area = coded_w * coded_h;
  std::vector<int64_t> sub(area);
  for (int r = 0; r < coded_h; r++)
    for (int c = 0; c < coded_w; c++)
      sub[r * coded_w + c] = coeffs[r * tx_w + c];

  // DC
  int64_t scaled0 = sub[0] << log_tx_scale;
  int64_t dc_level = (std::abs(scaled0) + dc_offset) / dc_quant;
  int64_t dc_q = (scaled0 > 0 ? 1 : (scaled0 < 0 ? -1 : 0)) * dc_level;

  // deadzone EOB pre-scan
  int64_t deadzone =
      (ac_quant - ac_offset_eob + (1 << log_tx_scale) - 1) >> log_tx_scale;
  int eob = (dc_q != 0) ? 1 : 0;
  for (int c = area - 1; c >= 1; c--) {
    int64_t a = sub[scan[c]];
    if ((a < 0 ? -a : a) >= deadzone) { eob = c + 1; break; }
  }

  // AC levels
  std::vector<int64_t> q(area, 0);
  for (int c = 1; c < eob; c++) {
    int pos = scan[c];
    int64_t scaled = sub[pos] << log_tx_scale;
    int64_t a = scaled < 0 ? -scaled : scaled;
    int64_t level0 = a / ac_quant;
    int64_t offset = level0 > 0 ? ac_offset1 : ac_offset0;
    int64_t qabs = level0 + ((a + offset) >= (level0 + 1) * ac_quant ? 1 : 0);
    q[pos] = (scaled > 0 ? 1 : (scaled < 0 ? -1 : 0)) * qabs;
  }
  q[0] = dc_q;

  // exact eob from actual nonzeros
  eob = 0;
  for (int c = area - 1; c >= 0; c--)
    if (q[scan[c]] != 0) { eob = c + 1; break; }

  for (int r = 0; r < coded_h; r++)
    for (int c = 0; c < coded_w; c++)
      qcoeffs[r * tx_w + c] = (int32_t)q[r * coded_w + c];
  return eob;
}

// --- CDEF (ops/cdef.py; cdef.rs:25-600) -----------------------------------

#ifdef __AVX2__
#include <immintrin.h>

extern "C++" {
namespace {

// 16 u8 pixels as one i16x16 vector: two 8-px rows (COLS=8) or four 4-px
// rows (COLS=4), always from `p` with row stride `stride`.
template <int COLS>
static inline __m256i cdef_load16_u8(const uint8_t* p, long stride) {
  if (COLS == 8) {
    __m128i v = _mm_unpacklo_epi64(
        _mm_loadl_epi64((const __m128i*)p),
        _mm_loadl_epi64((const __m128i*)(p + stride)));
    return _mm256_cvtepu8_epi16(v);
  }
  __m128i v = _mm_setr_epi32(
      *(const int32_t*)p, *(const int32_t*)(p + stride),
      *(const int32_t*)(p + 2 * stride), *(const int32_t*)(p + 3 * stride));
  return _mm256_cvtepu8_epi16(v);
}

// Filter a full interior u8 block (COLS wide x `rows` tall) with 12
// precomputed taps; exact integer parity with the scalar loops.  If `src`
// is non-null, returns the SSE vs src; if `out` is non-null, stores the
// filtered pixels.
template <int COLS>
static int64_t cdef_block_u8_avx2(const uint8_t* pre, long pstride,
                                  const uint8_t* src, long sstride,
                                  uint8_t* out, long ostride, int rows,
                                  const long* off, const int* tap,
                                  const int* thr, const int* shv) {
  const int RPC = COLS == 8 ? 2 : 4;  // rows per 16-px chunk
  __m256i vsse = _mm256_setzero_si256();
  for (int r = 0; r < rows; r += RPC) {
    const uint8_t* base = pre + (long)r * pstride;
    __m256i x = cdef_load16_u8<COLS>(base, pstride);
    __m256i mn = x, mx = x, total = _mm256_setzero_si256();
    for (int t = 0; t < 12; t++) {
      __m256i p = cdef_load16_u8<COLS>(base + off[t], pstride);
      __m256i diff = _mm256_sub_epi16(p, x);
      __m256i ad = _mm256_abs_epi16(diff);
      __m256i m = _mm256_sub_epi16(
          _mm256_set1_epi16((short)thr[t]),
          _mm256_srl_epi16(ad, _mm_cvtsi32_si128(shv[t])));
      m = _mm256_max_epi16(m, _mm256_setzero_si256());
      m = _mm256_min_epi16(m, ad);
      m = _mm256_sign_epi16(m, diff);
      total = _mm256_add_epi16(
          total, _mm256_mullo_epi16(m, _mm256_set1_epi16((short)tap[t])));
      mx = _mm256_max_epi16(mx, p);
      mn = _mm256_min_epi16(mn, p);
    }
    // v = x + ((8 + total - (total < 0)) >> 4), clamped to [mn, mx]
    __m256i t2 = _mm256_add_epi16(
        _mm256_add_epi16(total, _mm256_set1_epi16(8)),
        _mm256_srai_epi16(total, 15));
    __m256i v = _mm256_add_epi16(x, _mm256_srai_epi16(t2, 4));
    v = _mm256_min_epi16(_mm256_max_epi16(v, mn), mx);
    if (out != nullptr) {
      __m256i packed = _mm256_packus_epi16(v, v);  // per-lane pack
      __m128i lo = _mm256_castsi256_si128(packed);
      __m128i hi = _mm256_extracti128_si256(packed, 1);
      if (COLS == 8) {
        _mm_storel_epi64((__m128i*)(out + (long)r * ostride), lo);
        _mm_storel_epi64((__m128i*)(out + (long)(r + 1) * ostride), hi);
      } else {
        *(int32_t*)(out + (long)r * ostride) = _mm_cvtsi128_si32(lo);
        *(int32_t*)(out + (long)(r + 1) * ostride) =
            _mm_extract_epi32(lo, 1);
        *(int32_t*)(out + (long)(r + 2) * ostride) = _mm_cvtsi128_si32(hi);
        *(int32_t*)(out + (long)(r + 3) * ostride) =
            _mm_extract_epi32(hi, 1);
      }
    }
    if (src != nullptr) {
      __m256i s = cdef_load16_u8<COLS>(src + (long)r * sstride, sstride);
      __m256i d = _mm256_sub_epi16(v, s);
      vsse = _mm256_add_epi32(vsse, _mm256_madd_epi16(d, d));
    }
  }
  if (src == nullptr) return 0;
  __m128i q = _mm_add_epi32(_mm256_castsi256_si128(vsse),
                            _mm256_extracti128_si256(vsse, 1));
  q = _mm_add_epi32(q, _mm_shuffle_epi32(q, 0xEE));
  q = _mm_add_epi32(q, _mm_shuffle_epi32(q, 0x55));
  return (int64_t)(uint32_t)_mm_cvtsi128_si32(q);
}

}  // namespace
}  // extern "C++"
#endif  // __AVX2__

namespace {
const int CDEF_VERY_LARGE = 0x8000;
const int kCdefDir[8][2][2] = {
    {{-1, 1}, {-2, 2}}, {{0, 1}, {-1, 2}}, {{0, 1}, {0, 2}}, {{0, 1}, {1, 2}},
    {{1, 1}, {2, 2}},   {{1, 0}, {2, 1}},  {{1, 0}, {2, 0}}, {{1, 0}, {2, -1}},
};
const int kDivTable[9] = {0, 840, 420, 280, 210, 168, 140, 120, 105};

inline int constrain1(int diff, int threshold, int damping) {
  if (threshold == 0) return 0;
  int msb = 31 - __builtin_clz(threshold);
  int shift = std::max(0, damping - msb);
  int ad = diff < 0 ? -diff : diff;
  int mag = std::clamp(threshold - (ad >> shift), 0, ad);
  return diff < 0 ? -mag : mag;
}
}  // namespace

// Direction + variance for one 8x8 luma block (cdef_find_dir, cdef.rs:60-140)
void enc_cdef_dir(const void* luma, long stride, int bytespp, long py, long px,
                  int bd, int32_t* out_dir, int32_t* out_var) {
  int shift = bd - 8;
  int64_t partial[8][15];
  std::memset(partial, 0, sizeof(partial));
  for (int i = 0; i < 8; i++)
    for (int j = 0; j < 8; j++) {
      int64_t v = (px_at(luma, stride, bytespp, py + i, px + j) >> shift) - 128;
      partial[0][i + j] += v;
      partial[1][i + j / 2] += v;
      partial[2][i] += v;
      partial[3][3 + i - j / 2] += v;
      partial[4][7 + i - j] += v;
      partial[5][3 - i / 2 + j] += v;
      partial[6][j] += v;
      partial[7][i / 2 + j] += v;
    }
  int64_t cost[8] = {0};
  for (int d : {2, 6})
    for (int i = 0; i < 8; i++)
      cost[d] += partial[d][i] * partial[d][i] * kDivTable[8];
  for (int d : {0, 4}) {
    for (int i = 0; i < 7; i++)
      cost[d] += (partial[d][i] * partial[d][i] +
                  partial[d][14 - i] * partial[d][14 - i]) * kDivTable[i + 1];
    cost[d] += partial[d][7] * partial[d][7] * kDivTable[8];
  }
  for (int d : {1, 3, 5, 7}) {
    for (int i = 3; i < 8; i++)
      cost[d] += partial[d][i] * partial[d][i] * kDivTable[8];
    for (int j = 0; j < 3; j++)
      cost[d] += (partial[d][j] * partial[d][j] +
                  partial[d][10 - j] * partial[d][10 - j]) * kDivTable[2 * j + 2];
  }
  int best = 0;
  for (int d = 1; d < 8; d++)
    if (cost[d] > cost[best]) best = d;
  *out_dir = best;
  *out_var = (int32_t)((cost[best] - cost[(best + 4) & 7]) >> 10);
}

// Filter a batch of blocks of one plane in place.
// pre: copy of the plane (reads); out: plane data (writes); both at the
// visible origin with `stride` elements/row.
void enc_cdef_filter(const void* pre, long stride, int bytespp, void* out,
                     long out_stride, int n, const int32_t* by,
                     const int32_t* bx, const int32_t* dirs,
                     const int32_t* pri, int sec, int damping, int bd, int xs,
                     int ys, const uint8_t* have_t, const uint8_t* have_l,
                     const uint8_t* have_r, const uint8_t* have_b) {
  const int coeff_shift = bd - 8;
  const int sec_taps[2] = {2, 1};
  for (int b = 0; b < n; b++) {
    long oy = (long)by[b] * ys, ox = (long)bx[b] * xs;
    int p0 = pri[b];
    static const int pt_even[2] = {4, 2}, pt_odd[2] = {3, 3};
    const int* pri_taps = (((p0 >> coeff_shift) & 1) == 0) ? pt_even : pt_odd;
    int dir = dirs[b];
    auto read = [&](int ty, int tx) -> int {
      if ((ty < 0 && !have_t[b]) || (ty >= ys && !have_b[b]) ||
          (tx < 0 && !have_l[b]) || (tx >= xs && !have_r[b]))
        return CDEF_VERY_LARGE;
      return px_at(pre, stride, bytespp, oy + ty, ox + tx);
    };
    if (have_t[b] && have_l[b] && have_r[b] && have_b[b]) {
      // interior fast path: every tap is a real pixel, no VERY_LARGE checks
      int off[12], tap[12];
      int nt = 0;
      for (int k = 0; k < 2; k++)
        for (int which = 0; which < 3; which++) {
          int d = which == 0 ? dir : (which == 1 ? (dir + 2) & 7 : (dir + 6) & 7);
          for (int sgn : {1, -1}) {
            off[nt] = sgn * (kCdefDir[d][k][0] * (int)stride + kCdefDir[d][k][1]);
            tap[nt] = which == 0 ? (pri_taps[k] << 8) : sec_taps[k];
            nt++;
          }
        }
      int pri_msb = p0 > 0 ? 31 - __builtin_clz(p0) : 0;
      int pri_shift = std::max(0, damping - pri_msb);
      int sec_msb = sec > 0 ? 31 - __builtin_clz(sec) : 0;
      int sec_shift = std::max(0, damping - sec_msb);
#ifdef __AVX2__
      if (bytespp == 1 && (xs == 8 || xs == 4)) {
        long loff[12];
        int ltap[12], lthr[12], lsh[12];
        for (int t = 0; t < 12; t++) {
          loff[t] = off[t];
          bool is_pri = (tap[t] & ~0xFF) != 0;
          ltap[t] = is_pri ? (tap[t] >> 8) : tap[t];
          lthr[t] = is_pri ? p0 : sec;
          lsh[t] = is_pri ? pri_shift : sec_shift;
        }
        const uint8_t* bp = (const uint8_t*)pre + oy * stride + ox;
        uint8_t* op = (uint8_t*)out + oy * out_stride + ox;
        if (xs == 8)
          cdef_block_u8_avx2<8>(bp, stride, nullptr, 0, op, out_stride, ys,
                                loff, ltap, lthr, lsh);
        else
          cdef_block_u8_avx2<4>(bp, stride, nullptr, 0, op, out_stride, ys,
                                loff, ltap, lthr, lsh);
        continue;
      }
#endif
      for (int i = 0; i < ys; i++) {
        for (int j = 0; j < xs; j++) {
          long base = (oy + i) * stride + ox + j;
          int x = bytespp == 1 ? ((const uint8_t*)pre)[base]
                               : ((const uint16_t*)pre)[base];
          int mn = x, mx = x, total = 0;
          for (int t = 0; t < nt; t++) {
            int p = bytespp == 1 ? ((const uint8_t*)pre)[base + off[t]]
                                 : ((const uint16_t*)pre)[base + off[t]];
            int diff = p - x;
            int ad = diff < 0 ? -diff : diff;
            int w_, thr, sh;
            if (tap[t] & ~0xFF) { w_ = tap[t] >> 8; thr = p0; sh = pri_shift; }
            else { w_ = tap[t]; thr = sec; sh = sec_shift; }
            if (thr) {
              int mag = std::clamp(thr - (ad >> sh), 0, ad);
              total += w_ * (diff < 0 ? -mag : mag);
            }
            mx = p > mx ? p : mx;
            mn = p < mn ? p : mn;
          }
          int v = x + ((8 + total - (total < 0 ? 1 : 0)) >> 4);
          v = std::clamp(v, mn, mx);
          if (bytespp == 1)
            ((uint8_t*)out)[(oy + i) * out_stride + ox + j] = (uint8_t)v;
          else
            ((uint16_t*)out)[(oy + i) * out_stride + ox + j] = (uint16_t)v;
        }
      }
      continue;
    }
    for (int i = 0; i < ys; i++)
      for (int j = 0; j < xs; j++) {
        int x = px_at(pre, stride, bytespp, oy + i, ox + j);
        int mn = x, mx = x, total = 0;
        for (int k = 0; k < 2; k++) {
          for (int which = 0; which < 3; which++) {
            int d = which == 0 ? dir : (which == 1 ? (dir + 2) & 7 : (dir + 6) & 7);
            int dy = kCdefDir[d][k][0], dx = kCdefDir[d][k][1];
            for (int sgn : {1, -1}) {
              int p = read(i + sgn * dy, j + sgn * dx);
              int diff = p - x;
              if (which == 0)
                total += pri_taps[k] * constrain1(diff, p0, damping);
              else
                total += sec_taps[k] * constrain1(diff, sec, damping);
              if (p != CDEF_VERY_LARGE) mx = std::max(mx, p);
              mn = std::min(mn, p);
            }
          }
        }
        int v = x + ((8 + total - (total < 0 ? 1 : 0)) >> 4);
        v = std::clamp(v, mn, mx);
        if (bytespp == 1)
          ((uint8_t*)out)[(oy + i) * out_stride + ox + j] = (uint8_t)v;
        else
          ((uint16_t*)out)[(oy + i) * out_stride + ox + j] = (uint16_t)v;
      }
  }
}

// prep_8tap: compound-prediction intermediate (ops/mc.py prep_8tap;
// reference mc.rs:360-452) — i16-domain output, no final clamp.
#define PREP8TAP_BODY(T)                                                    \
  {                                                                         \
    const T* rp = (const T*)ref;                                            \
    if (col_frac == 0 && row_frac == 0) {                                   \
      for (int y = 0; y < h; y++) {                                         \
        const T* row = rp + (y0 + y) * stride + x0;                         \
        for (int x = 0; x < w; x++)                                         \
          out[y * w + x] = ((int32_t)row[x] << inter_bits) - prep_bias;     \
      }                                                                     \
      return;                                                               \
    }                                                                       \
    const int32_t* xf = get_filter(mode_x, col_frac, w);                    \
    const int32_t* yf = get_filter(mode_y, row_frac, h);                    \
    const int sh1 = 7 - inter_bits;                                         \
    if (col_frac == 0) {                                                    \
      for (int y = 0; y < h; y++) {                                         \
        const T* base = rp + (y0 + y - 3) * stride + x0;                    \
        for (int x = 0; x < w; x++) {                                       \
          int32_t acc = 0;                                                  \
          for (int k = 0; k < 8; k++)                                       \
            acc += yf[k] * (int32_t)base[(long)k * stride + x];             \
          out[y * w + x] = ((acc + (1 << sh1 >> 1)) >> sh1) - prep_bias;    \
        }                                                                   \
      }                                                                     \
      return;                                                               \
    }                                                                       \
    if (row_frac == 0) {                                                    \
      for (int y = 0; y < h; y++) {                                         \
        const T* row = rp + (y0 + y) * stride + x0 - 3;                     \
        for (int x = 0; x < w; x++) {                                       \
          int32_t acc = 0;                                                  \
          for (int k = 0; k < 8; k++) acc += xf[k] * (int32_t)row[x + k];   \
          out[y * w + x] = ((acc + (1 << sh1 >> 1)) >> sh1) - prep_bias;    \
        }                                                                   \
      }                                                                     \
      return;                                                               \
    }                                                                       \
    static thread_local std::vector<int16_t> horiz;                        \
    horiz.resize((size_t)(h + 7) * w);                                      \
    for (int y = 0; y < h + 7; y++) {                                       \
      const T* row = rp + (y0 + y - 3) * stride + x0 - 3;                   \
      for (int x = 0; x < w; x++) {                                         \
        int32_t acc = 0;                                                    \
        for (int k = 0; k < 8; k++) acc += xf[k] * (int32_t)row[x + k];     \
        horiz[(size_t)y * w + x] = (int16_t)((acc + (1 << sh1 >> 1)) >> sh1); \
      }                                                                     \
    }                                                                       \
    for (int y = 0; y < h; y++)                                             \
      for (int x = 0; x < w; x++) {                                         \
        int32_t acc = 0;                                                    \
        for (int k = 0; k < 8; k++)                                         \
          acc += yf[k] * (int32_t)horiz[(size_t)(y + k) * w + x];           \
        out[y * w + x] = ((acc + (1 << 6)) >> 7) - prep_bias;               \
      }                                                                     \
  }

void enc_prep_8tap(const void* ref, long stride, int bytespp, long x0, long y0,
                   int w, int h, int col_frac, int row_frac, int mode_x,
                   int mode_y, int bd, int32_t* out) {
  const int inter_bits = 4 - (bd == 12 ? 2 : 0);
  const int prep_bias = bd == 8 ? 0 : 8192;
  if (bytespp == 1) PREP8TAP_BODY(uint8_t)
  else PREP8TAP_BODY(uint16_t)
}

// compound average of two prep_8tap intermediates (ops/mc.py mc_avg)
void enc_mc_avg(const int32_t* t1, const int32_t* t2, int n, int bd,
                int32_t* out) {
  const int inter_bits = 4 - (bd == 12 ? 2 : 0);
  const int prep_bias = bd == 8 ? 0 : 16384;
  const int maxv = (1 << bd) - 1;
  for (int i = 0; i < n; i++) {
    int64_t v = round_shift((int64_t)t1[i] + t2[i] + prep_bias, inter_bits + 1);
    out[i] = (int32_t)std::clamp<int64_t>(v, 0, maxv);
  }
}

}  // extern "C"

extern "C" void enc_cdef_dirs(const void* luma, long stride, int bytespp,
                              int n, const int32_t* by, const int32_t* bx,
                              int bd, int32_t* out_dirs, int32_t* out_vars) {
  for (int b = 0; b < n; b++)
    enc_cdef_dir(luma, stride, bytespp, (long)by[b] * 8, (long)bx[b] * 8, bd,
                 out_dirs + b, out_vars + b);
}

// Whole-frame CDEF strength RDO (ops/cdef.py cdef_rdo_frame; the reference's
// rdo_loop_decision CDEF axis, rdo.rs:2104): for every filtered 8x8 block and
// every candidate strength pair, filter in-register and accumulate the SSE
// against the source into per-superblock bins.  No frame copies, no
// write-backs -- the caller applies the winning map afterwards.
extern "C" void enc_cdef_rdo(
    int nplanes, const int64_t* pre_addr, const long* pre_stride,
    const int64_t* src_addr, const long* src_stride, int bytespp,
    const int32_t* xdec, const int32_t* ydec, const int64_t* vis_w,
    const int64_t* vis_h, int n, const int32_t* by, const int32_t* bx,
    const int32_t* dirs, const int32_t* vars, const uint8_t* have_t,
    const uint8_t* have_l, const uint8_t* have_r, const uint8_t* have_b,
    const int32_t* sb_of_block, int ncand, const int32_t* y_str,
    const int32_t* uv_str, int damping, int bd, long nsb, int64_t* out_sse) {
  const int coeff_shift = bd - 8;
  static const int uv_dir_422[8] = {7, 0, 2, 4, 5, 6, 6, 6};
  const int sec_taps[2] = {2, 1};
  static const int pt_even[2] = {4, 2}, pt_odd[2] = {3, 3};
  for (int ci = 0; ci < ncand; ci++) {
    for (int p = 0; p < nplanes; p++) {
      const void* pre = (const void*)(intptr_t)pre_addr[p];
      const void* src = (const void*)(intptr_t)src_addr[p];
      long pstride = pre_stride[p], sstride = src_stride[p];
      int v = p == 0 ? y_str[ci] : uv_str[ci];
      int pri_u = v / 4;
      int sec_u = v % 4;
      sec_u += sec_u == 3;
      int sec = sec_u << coeff_shift;
      int damp = damping + coeff_shift - (p == 0 ? 0 : 1);
      int xs = 8 >> xdec[p], ys = 8 >> ydec[p];
      long pw = vis_w[p], ph = vis_h[p];
      for (int b = 0; b < n; b++) {
        long oy = (long)by[b] * ys, ox = (long)bx[b] * xs;
        if (oy >= ph || ox >= pw) continue;
        int p0, dir;
        if (p == 0) {
          // _adjust_strength on the variance, zeroed when the unpacked
          // primary is zero (dirs likewise)
          int strength = pri_u << coeff_shift;
          int var = vars[b];
          int idx = 0;
          if ((var >> 6) != 0) {
            idx = 31 - __builtin_clz((unsigned)(var >> 6));
            if (idx > 12) idx = 12;
          }
          p0 = var != 0 ? (strength * (4 + idx) + 8) >> 4 : 0;
          if (pri_u == 0) p0 = 0;
          dir = pri_u != 0 ? dirs[b] : 0;
        } else {
          p0 = pri_u << coeff_shift;
          dir = xdec[p] != ydec[p] ? uv_dir_422[dirs[b]] : dirs[b];
          if (pri_u == 0) {
            p0 = 0;
            dir = 0;
          }
        }
        int64_t sse = 0;
        bool interior = have_t[b] && have_l[b] && have_r[b] && have_b[b];
        if (p0 == 0 && sec == 0) {
          // zero strengths: the filter is the identity
          int ih = (int)std::min<long>(ys, ph - oy);
          int iw = (int)std::min<long>(xs, pw - ox);
          if (bytespp == 1) {
            const uint8_t* pr = (const uint8_t*)pre + oy * pstride + ox;
            const uint8_t* sr = (const uint8_t*)src + oy * sstride + ox;
            for (int i = 0; i < ih; i++)
              for (int j = 0; j < iw; j++) {
                int d = (int)pr[i * pstride + j] - (int)sr[i * sstride + j];
                sse += (int64_t)d * d;
              }
          } else {
            const uint16_t* pr = (const uint16_t*)pre + oy * pstride + ox;
            const uint16_t* sr = (const uint16_t*)src + oy * sstride + ox;
            for (int i = 0; i < ih; i++)
              for (int j = 0; j < iw; j++) {
                int d = (int)pr[i * pstride + j] - (int)sr[i * sstride + j];
                sse += (int64_t)d * d;
              }
          }
        } else if (interior) {
          // fast path: every tap is a real pixel; per-block tap offsets,
          // strengths and shifts computed once
          const int* pri_taps =
              (((p0 >> coeff_shift) & 1) == 0) ? pt_even : pt_odd;
          long off[12];
          int tap[12], thr[12], sh[12];
          int pri_msb = p0 > 0 ? 31 - __builtin_clz((unsigned)p0) : 0;
          int pri_shift = std::max(0, damp - pri_msb);
          int sec_msb = sec > 0 ? 31 - __builtin_clz((unsigned)sec) : 0;
          int sec_shift = std::max(0, damp - sec_msb);
          int nt = 0;
          for (int k = 0; k < 2; k++)
            for (int which = 0; which < 3; which++) {
              int d2 = which == 0 ? dir
                                  : (which == 1 ? (dir + 2) & 7
                                                : (dir + 6) & 7);
              for (int sgn : {1, -1}) {
                off[nt] = sgn * (kCdefDir[d2][k][0] * pstride +
                                 kCdefDir[d2][k][1]);
                tap[nt] = which == 0 ? pri_taps[k] : sec_taps[k];
                thr[nt] = which == 0 ? p0 : sec;
                sh[nt] = which == 0 ? pri_shift : sec_shift;
                nt++;
              }
            }
          int ih = (int)std::min<long>(ys, ph - oy);
          int iw = (int)std::min<long>(xs, pw - ox);
#ifdef __AVX2__
          if (bytespp == 1 && ih == ys && iw == xs && (xs == 8 || xs == 4)) {
            const uint8_t* bp = (const uint8_t*)pre + oy * pstride + ox;
            const uint8_t* sp = (const uint8_t*)src + oy * sstride + ox;
            sse = xs == 8 ? cdef_block_u8_avx2<8>(bp, pstride, sp, sstride,
                                                  nullptr, 0, ys, off, tap,
                                                  thr, sh)
                          : cdef_block_u8_avx2<4>(bp, pstride, sp, sstride,
                                                  nullptr, 0, ys, off, tap,
                                                  thr, sh);
            out_sse[(long)ci * nsb + sb_of_block[b]] += sse;
            continue;
          }
#endif
          for (int i = 0; i < ih; i++)
            for (int j = 0; j < iw; j++) {
              long base = (oy + i) * pstride + ox + j;
              int x, spx_v;
              if (bytespp == 1) {
                x = ((const uint8_t*)pre)[base];
                spx_v = ((const uint8_t*)src)[(oy + i) * sstride + ox + j];
              } else {
                x = ((const uint16_t*)pre)[base];
                spx_v = ((const uint16_t*)src)[(oy + i) * sstride + ox + j];
              }
              int mn = x, mx = x, total = 0;
              for (int t = 0; t < nt; t++) {
                int pv = bytespp == 1 ? ((const uint8_t*)pre)[base + off[t]]
                                      : ((const uint16_t*)pre)[base + off[t]];
                int diff = pv - x;
                if (thr[t]) {
                  int ad = diff < 0 ? -diff : diff;
                  int mag = std::clamp(thr[t] - (ad >> sh[t]), 0, ad);
                  total += tap[t] * (diff < 0 ? -mag : mag);
                }
                mx = pv > mx ? pv : mx;
                mn = pv < mn ? pv : mn;
              }
              int ov = x + ((8 + total - (total < 0 ? 1 : 0)) >> 4);
              ov = std::clamp(ov, mn, mx);
              int d = ov - spx_v;
              sse += (int64_t)d * d;
            }
        } else {
          const int* pri_taps =
              (((p0 >> coeff_shift) & 1) == 0) ? pt_even : pt_odd;
          for (int i = 0; i < ys && oy + i < ph; i++)
            for (int j = 0; j < xs && ox + j < pw; j++) {
              int x = px_at(pre, pstride, bytespp, oy + i, ox + j);
              int mn = x, mx = x, total = 0;
              for (int k = 0; k < 2; k++)
                for (int which = 0; which < 3; which++) {
                  int d2 = which == 0 ? dir
                                      : (which == 1 ? (dir + 2) & 7
                                                    : (dir + 6) & 7);
                  int dy = kCdefDir[d2][k][0], dx = kCdefDir[d2][k][1];
                  for (int sgn : {1, -1}) {
                    int ty = i + sgn * dy, tx = j + sgn * dx;
                    int pv;
                    if ((ty < 0 && !have_t[b]) || (ty >= ys && !have_b[b]) ||
                        (tx < 0 && !have_l[b]) || (tx >= xs && !have_r[b]))
                      pv = CDEF_VERY_LARGE;
                    else
                      pv = px_at(pre, pstride, bytespp, oy + ty, ox + tx);
                    int diff = pv - x;
                    if (which == 0)
                      total += pri_taps[k] * constrain1(diff, p0, damp);
                    else
                      total += sec_taps[k] * constrain1(diff, sec, damp);
                    if (pv != CDEF_VERY_LARGE) mx = std::max(mx, pv);
                    mn = std::min(mn, pv);
                  }
                }
              int ov = x + ((8 + total - (total < 0 ? 1 : 0)) >> 4);
              ov = std::clamp(ov, mn, mx);
              int d = ov - px_at(src, sstride, bytespp, oy + i, ox + j);
              sse += (int64_t)d * d;
            }
        }
        out_sse[(long)ci * nsb + sb_of_block[b]] += sse;
      }
    }
  }
}

// --- SATD (dist.py::get_satd; reference dist.rs:156-221) -------------------

namespace {

static void hadamard_1d(int32_t* b, int n, int stride) {
  // in-place radix-2 butterflies (order matches the +/- block construction
  // H_{2n} = [[H, H], [H, -H]] used by the numpy path)
  for (int len = 1; len < n; len <<= 1)
    for (int start = 0; start < n; start += len << 1)
      for (int i = start; i < start + len; i++) {
        int32_t a = b[i * stride], c = b[(i + len) * stride];
        b[i * stride] = a + c;
        b[(i + len) * stride] = a - c;
      }
}

static long satd_tile(const int32_t* diff, int stride, int n) {
  int32_t buf[64];
  for (int r = 0; r < n; r++)
    for (int c = 0; c < n; c++) buf[r * n + c] = diff[r * stride + c];
  for (int r = 0; r < n; r++) hadamard_1d(buf + r * n, n, 1);
  for (int c = 0; c < n; c++) hadamard_1d(buf + c, n, n);
  long s = 0;
  for (int i = 0; i < n * n; i++) s += buf[i] < 0 ? -buf[i] : buf[i];
  return s;
}

static long satd_block(const int32_t* diff, int w, int h) {
  int size = w < h ? w : h;
  if (size > 8) size = 8;
  long total = 0;
  for (int cy = 0; cy < h; cy += size) {
    int ch = h - cy < size ? h - cy : size;
    for (int cx = 0; cx < w; cx += size) {
      int cw = w - cx < size ? w - cx : size;
      const int32_t* d = diff + cy * w + cx;
      if (cw != size || ch != size) {
        for (int r = 0; r < ch; r++)
          for (int c = 0; c < cw; c++)
            total += d[r * w + c] < 0 ? -d[r * w + c] : d[r * w + c];
        continue;
      }
      total += satd_tile(d, w, size);
    }
  }
  int ln = 0;
  while ((1 << (ln + 1)) <= size) ln++;
  return (total + (1 << ln >> 1)) >> ln;
}

}  // namespace

// Variant of enc_me_search using SATD for the subpel stage
// (speed_settings.motion.use_satd_subpel; reference me.rs sub_pixel_me).
extern "C" long enc_me_search_satd(
    const void* ref, long rstride, long rh, long rw, int bytespp, long ax,
    long ay, const void* src, long sstride, long spx, long spy, int w, int h,
    int bd, const int32_t* seeds, int nseeds, int max_off, int32_t* out_mv) {
  long sad = enc_me_search(ref, rstride, rh, rw, bytespp, ax, ay, src, sstride,
                           spx, spy, w, h, bd, seeds, nseeds, max_off, out_mv);
  if (sad < 0) return sad;
  int best_r = out_mv[0], best_c = out_mv[1];

  std::vector<int32_t> pred(w * h), diff(w * h);
  // memoize positions: the refinement loop re-evaluates the old best when
  // it moves (lossless -- identical decisions, ~30% fewer interpolations)
  int seen_mv[48][2];
  long seen_s[48];
  int nseen = 0;
  const int IB = 4 - (bd == 12 ? 2 : 0);
  const int maxval = (1 << bd) - 1;
  // horizontal-pass cache: vertically adjacent candidates share the same
  // (col_int, col_frac) intermediate (bit-exact: same rounding + i16 wrap)
  struct HC {
    long ci = LONG_MIN;
    int cf = -1;
    long row0 = 0;
    int rows = 0;
    std::vector<int16_t> buf;
  };
  static thread_local HC hcache[4];
  for (auto& e : hcache) e.ci = LONG_MIN;  // invalidate; keep allocations
  int hrr = 0;
  auto horiz_for = [&](long ci, int cf, long need0, int needn) -> const int16_t* {
    for (auto& e : hcache)
      if (e.ci == ci && e.cf == cf && e.row0 <= need0 &&
          e.row0 + e.rows >= need0 + needn)
        return e.buf.data() + (need0 - e.row0) * w;
    HC& e = hcache[hrr];
    hrr = (hrr + 1) & 3;
    e.ci = ci;
    e.cf = cf;
    e.row0 = need0 - 2;
    e.rows = needn + 4;
    e.buf.resize((size_t)e.rows * w);
    const int32_t* xf = get_filter(0, cf, w);
    for (int r = 0; r < e.rows; r++) {
      long ry = e.row0 + r;
      if (bytespp == 1) {
        const uint8_t* row = (const uint8_t*)ref + ry * rstride + ci - 3;
        for (int x = 0; x < w; x++) {
          int32_t acc = 0;
          for (int k = 0; k < 8; k++) acc += xf[k] * (int32_t)row[x + k];
          e.buf[(size_t)r * w + x] =
              (int16_t)((acc + (1 << (6 - IB))) >> (7 - IB));
        }
      } else {
        const uint16_t* row = (const uint16_t*)ref + ry * rstride + ci - 3;
        for (int x = 0; x < w; x++) {
          int32_t acc = 0;
          for (int k = 0; k < 8; k++) acc += xf[k] * (int32_t)row[x + k];
          e.buf[(size_t)r * w + x] =
              (int16_t)((acc + (1 << (6 - IB))) >> (7 - IB));
        }
      }
    }
    return e.buf.data() + (need0 - e.row0) * w;
  };
  auto satd_at = [&](int mvr, int mvc) -> long {
    long dy = mvr >> 3, dx = mvc >> 3;
    if (dy < -(max_off - 1) || dy > max_off - 1 || dx < -(max_off - 1) ||
        dx > max_off - 1)
      return -1;
    for (int i = 0; i < nseen; i++)
      if (seen_mv[i][0] == mvr && seen_mv[i][1] == mvc) return seen_s[i];
    int row_frac = (mvr << 1) & 0xF, col_frac = (mvc << 1) & 0xF;
    if (col_frac != 0 && row_frac != 0) {
      const int16_t* hz =
          horiz_for(ax + (mvc >> 3), col_frac, ay + (mvr >> 3) - 3, h + 7);
      const int32_t* yf = get_filter(0, row_frac, h);
      const int sh = 7 + IB;
      for (int y = 0; y < h; y++)
        for (int x = 0; x < w; x++) {
          int32_t acc = 0;
          for (int k = 0; k < 8; k++)
            acc += yf[k] * (int32_t)hz[(size_t)(y + k) * w + x];
          int32_t v = (acc + (1 << sh >> 1)) >> sh;
          pred[y * w + x] = std::clamp(v, 0, maxval);
        }
    } else {
      enc_put_8tap(ref, rstride, bytespp, ax + (mvc >> 3), ay + (mvr >> 3), w,
                   h, col_frac, row_frac, 0, 0, bd, pred.data());
    }
    diff_pred(src, sstride, bytespp, spy, spx, pred.data(), w, h, diff.data());
    long s = satd_block(diff.data(), w, h);
    if (nseen < 48) {
      seen_mv[nseen][0] = mvr;
      seen_mv[nseen][1] = mvc;
      seen_s[nseen] = s;
      nseen++;
    }
    return s;
  };

  long best = satd_at(best_r, best_c);
  static const int dirs[4][2] = {{-1, 0}, {1, 0}, {0, -1}, {0, 1}};
  for (int step : {4, 2}) {
    bool improved = true;
    for (int it = 0; it < g_subpel_iters && improved; it++) {
      improved = false;
      for (auto& d : dirs) {
        int r = best_r + d[0] * step, c = best_c + d[1] * step;
        long s = satd_at(r, c);
        if (s >= 0 && s < best) {
          best = s; best_r = r; best_c = c; improved = true;
        }
      }
    }
  }
  out_mv[0] = best_r;
  out_mv[1] = best_c;
  return best;
}

// --- fused forward transform + quantize -----------------------------------
// (integer Q12 forward matching ops/transforms.py exactly; quant matching
//  enc_quantize)

namespace {
// matrices registered per (tx_size_id 0..18, tx_type_id 0..15)
struct FwdMats {
  std::vector<int32_t> fv, fh;
  std::vector<int32_t> fht;  // transpose of fh: stage 2 in axpy (row) form
  int h = 0, w = 0;
  int64_t l1v = 0, l1h = 0;  // max row L1 norms (i32-path overflow guards)
  bool set = false;
};
FwdMats g_fwd[19][16];
const int FWD_MAT_SHIFT = 12;

inline int64_t rshift12(int64_t v) {
  return (v + (1 << (FWD_MAT_SHIFT - 1))) >> FWD_MAT_SHIFT;
}
inline int32_t rshift12_32(int32_t v) {
  return (v + (1 << (FWD_MAT_SHIFT - 1))) >> FWD_MAT_SHIFT;
}
}  // namespace

extern "C" void enc_register_fwd(int tx_size_id, int tx_type_id,
                                 const int32_t* fv, int h, const int32_t* fh,
                                 int w) {
  FwdMats& m = g_fwd[tx_size_id][tx_type_id];
  m.fv.assign(fv, fv + (size_t)h * h);
  m.fh.assign(fh, fh + (size_t)w * w);
  m.fht.resize((size_t)w * w);
  for (int i = 0; i < w; i++)
    for (int j = 0; j < w; j++) m.fht[(size_t)j * w + i] = fh[(size_t)i * w + j];
  m.h = h;
  m.w = w;
  auto l1max = [](const std::vector<int32_t>& a, int n) {
    int64_t best = 0;
    for (int i = 0; i < n; i++) {
      int64_t s = 0;
      for (int k = 0; k < n; k++) s += std::abs((int64_t)a[(size_t)i * n + k]);
      best = std::max(best, s);
    }
    return best;
  };
  m.l1v = l1max(m.fv, h);
  m.l1h = l1max(m.fh, w);
  m.set = true;
}

// phase counters shared with tile.cc (slots 8..11: residual, stage1,
// stage2, quantize)
extern int64_t g_tile_perf[16];
extern int64_t g_tile_count[16];
namespace {
struct EncPerfScope {
  int idx;
  long t0;
  static inline long now() {
    struct timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    return ts.tv_sec * 1000000000L + ts.tv_nsec;
  }
  explicit EncPerfScope(int i) : idx(i), t0(now()) { g_tile_count[i]++; }
  ~EncPerfScope() { g_tile_perf[idx] += now() - t0; }
};
}  // namespace

// Residual from (src - rec) at (px, py), forward Q12 transform, quantize.
// qcoeffs must be pre-zeroed (tx_h * tx_w int32).  Returns eob or -1 when
// the matrices for this (size, type) were not registered.
extern "C" int enc_fwd_quant(
    const void* src, long sstride, const void* rec, long rstride, int bytespp,
    long px, long py, int tx_size_id, int tx_type_id, int coded_w, int coded_h,
    const uint16_t* scan, int log_tx_scale, long dc_quant, long ac_quant,
    long dc_offset, long ac_offset0, long ac_offset1, long ac_offset_eob,
    int32_t* qcoeffs) {
  FwdMats& m = g_fwd[tx_size_id][tx_type_id];
  if (!m.set) return -1;
  int w = m.w, h = m.h;

  // residual (+ all-zero early exit: perfectly-predicted inter blocks are
  // common and skip the transform entirely)
  int32_t R[64 * 64];
  uint32_t any = 0;
  long _t = EncPerfScope::now();
  for (int r = 0; r < h; r++)
    for (int c = 0; c < w; c++) {
      int32_t d = (int32_t)(px_at(src, sstride, bytespp, py + r, px + c) -
                            px_at(rec, rstride, bytespp, py + r, px + c));
      R[r * w + c] = d;
      any |= (uint32_t)(d < 0 ? -d : d);
    }
  { long n = EncPerfScope::now(); g_tile_perf[8] += n - _t; g_tile_count[8]++; _t = n; }
  if (any == 0) return 0;

  // i32 fast path when the row-L1 norms bound every accumulator below 2^31
  // (always true for 8-bit, and for 10/12-bit at sizes <= 32)
  const int64_t max_r = bytespp == 1 ? 255 : 4095;
  const int64_t t1max = (m.l1v * max_r >> FWD_MAT_SHIFT) + 1;
  const bool fits32 = m.l1v * max_r < (1ll << 31) - 65536 &&
                      m.l1h * t1max < (1ll << 31) - 65536;

  static thread_local std::vector<int64_t> C2;
  C2.assign((size_t)h * w, 0);
  if (fits32) {
    static thread_local std::vector<int32_t> t1s;
    t1s.assign((size_t)h * w, 0);
    for (int i = 0; i < h; i++) {
      const int32_t* row = m.fv.data() + (size_t)i * h;
      int32_t* ti = t1s.data() + (size_t)i * w;
      for (int k = 0; k < h; k++) {
        int32_t f = row[k];
        if (!f) continue;
        const int32_t* rk = R + (size_t)k * w;
        for (int j = 0; j < w; j++) ti[j] += f * rk[j];
      }
    }
    for (size_t i = 0; i < t1s.size(); i++) t1s[i] = rshift12_32(t1s[i]);
    // stage 2 in axpy (row-accumulate) form over the transposed matrix:
    // C[i][j] = sum_k T[i][k] * FH[j][k] = sum_k T[i][k] * FHT[k][j].
    // i32 wrapping adds are associative, so this is bit-equal to the
    // dot-product form while vectorizing cleanly.
    static thread_local std::vector<int32_t> c32;
    c32.assign((size_t)h * w, 0);
    for (int i = 0; i < h; i++) {
      const int32_t* ti = t1s.data() + (size_t)i * w;
      int32_t* ci = c32.data() + (size_t)i * w;
      for (int k = 0; k < w; k++) {
        int32_t f = ti[k];
        if (!f) continue;
        const int32_t* fr = m.fht.data() + (size_t)k * w;
        for (int j = 0; j < w; j++) ci[j] += f * fr[j];
      }
    }
    for (int i = 0; i < h; i++) {
      const int32_t* ci = c32.data() + (size_t)i * w;
      int64_t* co = C2.data() + (size_t)i * w;
      for (int j = 0; j < w; j++) co[j] = rshift12_32(ci[j]);
    }
  } else {
    // stage 1: FV (h x h) @ R (h x w), round-shift 12
    static thread_local std::vector<int64_t> t1;
    t1.assign((size_t)h * w, 0);
    for (int i = 0; i < h; i++) {
      const int32_t* row = m.fv.data() + (size_t)i * h;
      for (int k = 0; k < h; k++) {
        int64_t f = row[k];
        if (!f) continue;
        const int32_t* rk = R + (size_t)k * w;
        int64_t* ti = t1.data() + (size_t)i * w;
        for (int j = 0; j < w; j++) ti[j] += f * rk[j];
      }
    }
    for (size_t i = 0; i < t1.size(); i++) t1[i] = rshift12(t1[i]);

    // stage 2: T (h x w) @ FH^T (w x w) -> C (h x w), round-shift 12
    for (int i = 0; i < h; i++) {
      const int64_t* ti = t1.data() + (size_t)i * w;
      int64_t* ci = C2.data() + (size_t)i * w;
      for (int j = 0; j < w; j++) {
        const int32_t* fr = m.fh.data() + (size_t)j * w;
        int64_t acc = 0;
        for (int k = 0; k < w; k++) acc += ti[k] * fr[k];
        ci[j] = rshift12(acc);
      }
    }
  }

  { long n = EncPerfScope::now(); g_tile_perf[9] += n - _t; g_tile_count[9]++; _t = n; }
  // quantize the coded region (mirror of enc_quantize)
  int area = coded_w * coded_h;
  static thread_local std::vector<int64_t> sub;
  sub.resize(area);
  for (int r = 0; r < coded_h; r++)
    for (int c = 0; c < coded_w; c++) sub[r * coded_w + c] = C2[(size_t)r * w + c];

  int64_t scaled0 = sub[0] << log_tx_scale;
  int64_t dc_level = (std::abs(scaled0) + dc_offset) / dc_quant;
  int64_t dc_q = (scaled0 > 0 ? 1 : (scaled0 < 0 ? -1 : 0)) * dc_level;
  int64_t deadzone =
      (ac_quant - ac_offset_eob + (1 << log_tx_scale) - 1) >> log_tx_scale;
  int eob = (dc_q != 0) ? 1 : 0;
  for (int c = area - 1; c >= 1; c--) {
    int64_t a = sub[scan[c]];
    if ((a < 0 ? -a : a) >= deadzone) { eob = c + 1; break; }
  }
  // division-free floor(a / ac_quant): multiply by a 32.32 reciprocal
  // estimate, then fix up with at most one compare (exactness asserted by
  // tests/test_native_parity.py against the python quantizer)
  const uint64_t recip = ((~0ull) / (uint64_t)ac_quant);  // floor(2^64/q) approx
  static thread_local std::vector<int64_t> q;
  q.assign(area, 0);
  for (int c = 1; c < eob; c++) {
    int pos = scan[c];
    int64_t scaled = sub[pos] << log_tx_scale;
    int64_t a = scaled < 0 ? -scaled : scaled;
    uint64_t level0 = (uint64_t)(((unsigned __int128)(uint64_t)a * recip) >> 64);
    // recip underestimates 2^64/q by <1ulp: level0 is floor(a/q) or one less
    if ((int64_t)(level0 + 1) * ac_quant <= a) level0++;
    int64_t offset = (int64_t)level0 > 0 ? ac_offset1 : ac_offset0;
    int64_t qabs =
        (int64_t)level0 + ((a + offset) >= ((int64_t)level0 + 1) * ac_quant ? 1 : 0);
    q[pos] = (scaled > 0 ? 1 : (scaled < 0 ? -1 : 0)) * qabs;
  }
  q[0] = dc_q;
  eob = 0;
  for (int c = area - 1; c >= 0; c--)
    if (q[scan[c]] != 0) { eob = c + 1; break; }
  for (int r = 0; r < coded_h; r++)
    for (int c = 0; c < coded_w; c++)
      qcoeffs[(size_t)r * w + c] = (int32_t)q[r * coded_w + c];
  { long n = EncPerfScope::now(); g_tile_perf[10] += n - _t; g_tile_count[10]++; }
  return eob;
}

// Per-8x8 segmentation statistics (encoder/segmentation.py; reference
// activity.rs:23 ActivityMask + segmentation.rs spatiotemporal score):
// integer sum / sum-of-squares of the source and (optionally) the SAD vs
// the co-located reference pixels, one pass over the plane.
extern "C" void enc_seg_stats(const void* src, long sstride, const void* ref,
                              long rstride, int bytespp, long h, long w,
                              int64_t* out_s, int64_t* out_q,
                              int64_t* out_sad) {
  long h8 = h / 8, w8 = w / 8;
  for (long by = 0; by < h8; by++)
    for (long bx = 0; bx < w8; bx++) {
      int64_t s = 0, q = 0, sad = 0;
      for (int i = 0; i < 8; i++) {
        long y = by * 8 + i, x0 = bx * 8;
        if (bytespp == 1) {
          const uint8_t* sr = (const uint8_t*)src + y * sstride + x0;
          for (int j = 0; j < 8; j++) {
            int v = sr[j];
            s += v;
            q += v * v;
          }
          if (ref != nullptr) {
            const uint8_t* rr = (const uint8_t*)ref + y * rstride + x0;
            for (int j = 0; j < 8; j++) {
              int d = (int)sr[j] - (int)rr[j];
              sad += d < 0 ? -d : d;
            }
          }
        } else {
          const uint16_t* sr = (const uint16_t*)src + y * sstride + x0;
          for (int j = 0; j < 8; j++) {
            int64_t v = sr[j];
            s += v;
            q += v * v;
          }
          if (ref != nullptr) {
            const uint16_t* rr = (const uint16_t*)ref + y * rstride + x0;
            for (int j = 0; j < 8; j++) {
              int d = (int)sr[j] - (int)rr[j];
              sad += d < 0 ? -d : d;
            }
          }
        }
      }
      out_s[by * w8 + bx] = s;
      out_q[by * w8 + bx] = q;
      if (out_sad != nullptr) out_sad[by * w8 + bx] = sad;
    }
}

// Per-8x8 inter cost for temporal RDO (encoder/lookahead.py
// inter_costs_8x8; reference lookahead.rs:182 estimate_inter_costs).
extern "C" void enc_inter_costs_8x8(
    const void* src, long sstride, const void* ref, long rstride, int bytespp,
    long h, long w, const int32_t* mvs, long mby, long mbx, int bd,
    double* out) {
  const int B = 8;
  long nby = h / B > 0 ? h / B : 1, nbx = w / B > 0 ? w / B : 1;
  double norm = (double)(1 << (bd - 8));
  for (long by = 0; by < nby; by++)
    for (long bx = 0; bx < nbx; bx++) {
      long py = by * B, px = bx * B;
      long bh = std::min<long>(B, h - py), bw = std::min<long>(B, w - px);
      long myi = std::min(by / 2, mby - 1), mxi = std::min(bx / 2, mbx - 1);
      long ry = std::clamp<long>(py + mvs[(myi * mbx + mxi) * 2], 0, h - bh);
      long rx = std::clamp<long>(px + mvs[(myi * mbx + mxi) * 2 + 1], 0, w - bw);
      long sad = 0;
      if (bytespp == 1) {
        const uint8_t* sp = (const uint8_t*)src;
        const uint8_t* rp = (const uint8_t*)ref;
        for (long r = 0; r < bh; r++)
          for (long c = 0; c < bw; c++) {
            int d = (int)sp[(py + r) * sstride + px + c] -
                    (int)rp[(ry + r) * rstride + rx + c];
            sad += d < 0 ? -d : d;
          }
      } else {
        const uint16_t* sp = (const uint16_t*)src;
        const uint16_t* rp = (const uint16_t*)ref;
        for (long r = 0; r < bh; r++)
          for (long c = 0; c < bw; c++) {
            int d = (int)sp[(py + r) * sstride + px + c] -
                    (int)rp[(ry + r) * rstride + rx + c];
            sad += d < 0 ? -d : d;
          }
      }
      double v = (double)sad / norm;
      out[by * nbx + bx] = v > 1.0 ? v : 1.0;
    }
}

// Per-8x8 intra cost proxy for temporal RDO (encoder/lookahead.py
// estimate_intra_costs; reference lookahead.rs:30): residual SAD of the
// best of a DC / row-mean / column-mean predictor.  All intermediate
// doubles (means are sums over 64 resp. 8 values divided by a power of
// two; |x-mean| terms carry <= 6 fractional bits) are exactly
// representable, so this matches the numpy fallback bit-identically in
// any summation order.
template <typename T>
static void la_intra_costs_t(const T* src, long stride, long h, long w,
                             int bd, double* out) {
  const int B = 8;
  long nby = h / B, nbx = w / B;
  double norm = (double)(1 << (bd - 8));
  for (long by = 0; by < nby; by++)
    for (long bx = 0; bx < nbx; bx++) {
      const T* p = src + by * B * stride + bx * B;
      double rows[B], cols[B] = {0}, total = 0;
      for (int r = 0; r < B; r++) {
        double rs = 0;
        for (int c = 0; c < B; c++) {
          double v = (double)p[r * stride + c];
          rs += v;
          cols[c] += v;
        }
        rows[r] = rs;
        total += rs;
      }
      double dc = total / 64.0;
      double sad_dc = 0, sad_row = 0, sad_col = 0;
      for (int r = 0; r < B; r++) {
        double rm = rows[r] / 8.0;
        for (int c = 0; c < B; c++) {
          double v = (double)p[r * stride + c];
          sad_dc += std::abs(v - dc);
          sad_row += std::abs(v - rm);
          sad_col += std::abs(v - cols[c] / 8.0);
        }
      }
      double best = std::min(sad_dc, std::min(sad_row, sad_col));
      double o = best / norm;
      out[by * nbx + bx] = o > 1.0 ? o : 1.0;
    }
}

extern "C" void enc_la_intra_costs(const void* src, long stride, int bytespp,
                                   long h, long w, int bd, double* out) {
  if (bytespp == 1)
    la_intra_costs_t((const uint8_t*)src, stride, h, w, bd, out);
  else
    la_intra_costs_t((const uint16_t*)src, stride, h, w, bd, out);
}

// Importance back-propagation scatter (encoder/lookahead.py
// propagate_importance; reference internal.rs:1030-1160).  `amount` is
// precomputed on the host; accumulation order matches the python loops
// exactly so the doubles are bit-identical (fp-contract off: an FMA here
// would round differently from numpy).
#pragma GCC push_options
#pragma GCC optimize("fp-contract=off")
extern "C" void enc_propagate_importance(
    const double* amount, long nby, long nbx, const int32_t* mvs, long mby,
    long mbx, double* ref_imp, long rby, long rbx) {
  for (long by = 0; by < nby; by++)
    for (long bx = 0; bx < nbx; bx++) {
      double a = amount[by * nbx + bx];
      if (a <= 0.0) continue;
      long myi = std::min(by / 2, mby - 1), mxi = std::min(bx / 2, mbx - 1);
      double fy = (double)by + mvs[(myi * mbx + mxi) * 2] / 8.0;
      double fx = (double)bx + mvs[(myi * mbx + mxi) * 2 + 1] / 8.0;
      double yf = std::floor(fy), xf = std::floor(fx);
      long y0 = (long)yf, x0 = (long)xf;
      double wy = fy - yf, wx = fx - xf;
      const double wys[2] = {1.0 - wy, wy};
      const double wxs[2] = {1.0 - wx, wx};
      for (int dy = 0; dy < 2; dy++)
        for (int dx = 0; dx < 2; dx++) {
          long ty = y0 + dy, tx = x0 + dx;
          if (ty >= 0 && ty < rby && tx >= 0 && tx < rbx)
            ref_imp[ty * rbx + tx] += a * wys[dy] * wxs[dx];
        }
    }
}
#pragma GCC pop_options

// --- lookahead grid motion (encoder/lookahead.py lookahead_motion) --------
// Full-pel 16x16 diamond over the whole frame grid, optionally seeded from
// a coarser pyramid level.  Bit-identical to the python fallback (same
// candidate order, strict-< acceptance).
extern "C" void enc_lookahead_me(
    const void* src, long sstride, const void* ref, long rstride, int bytespp,
    long h, long w, const int32_t* seeds /* (nby,nbx,2) or null */,
    int32_t* out_mvs /* (nby,nbx,2) */, double* out_sads /* (nby,nbx) */,
    int bd) {
  const int B = 16;
  long nby = h / B > 0 ? h / B : 1;
  long nbx = w / B > 0 ? w / B : 1;
  double norm = (double)(1 << (bd - 8));
  for (long by = 0; by < nby; by++) {
    for (long bx = 0; bx < nbx; bx++) {
      long py = by * B, px = bx * B;
      int bh = (int)(h - py < B ? h - py : B);
      int bw = (int)(w - px < B ? w - px : B);
      auto sad_at = [&](long dy, long dx) -> long {
        long ry = py + dy, rx = px + dx;
        if (ry < 0 || rx < 0 || ry + bh > h || rx + bw > w) return -1;
        long sad = 0;
        for (int y = 0; y < bh; y++)
          for (int x = 0; x < bw; x++) {
            int d = (int)px_at(src, sstride, bytespp, py + y, px + x) -
                    (int)px_at(ref, rstride, bytespp, ry + y, rx + x);
            sad += d < 0 ? -d : d;
          }
        return sad;
      };
      long best_r = 0, best_c = 0;
      long best = sad_at(0, 0);
      if (seeds) {
        long sy = by < nby ? by : nby - 1, sx = bx < nbx ? bx : nbx - 1;
        long sr = seeds[(sy * nbx + sx) * 2], sc = seeds[(sy * nbx + sx) * 2 + 1];
        long c = sad_at(sr, sc);
        if (c >= 0 && c < best) { best = c; best_r = sr; best_c = sc; }
      }
      static const int dirs[4][2] = {{-1, 0}, {1, 0}, {0, -1}, {0, 1}};
      for (int step : {8, 4, 2, 1}) {
        bool improved = true;
        while (improved) {
          improved = false;
          for (auto& d : dirs) {
            long r = best_r + d[0] * step, c2 = best_c + d[1] * step;
            long s = sad_at(r, c2);
            if (s >= 0 && s < best) { best = s; best_r = r; best_c = c2; improved = true; }
          }
        }
      }
      out_mvs[(by * nbx + bx) * 2] = (int32_t)best_r;
      out_mvs[(by * nbx + bx) * 2 + 1] = (int32_t)best_c;
      out_sads[by * nbx + bx] = (double)best / norm;
    }
  }
}
