// Native host entropy coder: daala/od_ec range encoder + AV1 level-map
// coefficient coding.
//
// The serial half of the TPU design (SURVEY.md §7): device code produces
// decisions + quantized coefficients in batches; this module turns them into
// the bitstream at native speed, overlapped with the next batch's device
// compute.  Behavioral counterpart of the reference's src/ec.rs (encoder
// backend) and the coefficient path of src/context/block_unit.rs /
// transform_unit.rs, in spec (non-transposed) orientation.
//
// Exposed as a plain C ABI consumed via ctypes (rav1e_tpu/native.py).

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <vector>
#include <algorithm>

namespace {

constexpr uint32_t EC_PROB_SHIFT = 6;
constexpr uint32_t EC_MIN_PROB = 4;

struct EcEnc {
  std::vector<uint16_t> precarry;
  uint32_t low = 0;
  uint16_t rng = 0x8000;
  int16_t cnt = -9;
};

static inline int leading_zeros16(uint32_t r) {
  // r in [1, 65535]
  int n = 0;
  if (!(r & 0xFF00)) { n += 8; r <<= 8; }
  if (!(r & 0xF000)) { n += 4; r <<= 4; }
  if (!(r & 0xC000)) { n += 2; r <<= 2; }
  if (!(r & 0x8000)) { n += 1; }
  return n;
}

// Split the current range for symbol interval [fl, fh) (inverted Q15).
static inline void lr_compute(uint16_t rng, uint32_t fl, uint32_t fh,
                              uint32_t nms, uint32_t* l, uint32_t* r) {
  uint32_t R = rng;
  uint32_t u = (((R >> 8) * (fl >> EC_PROB_SHIFT)) >> (7 - EC_PROB_SHIFT)) +
               EC_MIN_PROB * nms;
  if (fl >= 32768) u = R;
  uint32_t v = (((R >> 8) * (fh >> EC_PROB_SHIFT)) >> (7 - EC_PROB_SHIFT)) +
               EC_MIN_PROB * (nms - 1);
  *l = R - u;
  *r = u - v;
}

// Rate-counting backend: WriterCounter twin (ec.py WriterCounter.store) —
// tracks only (rng, bits); CDF adaptation is shared with the real encoder.
struct EcCount {
  uint32_t rng = 0x8000;
  long bits = 0;
};

static inline void ec_store(EcCount* e, uint32_t fl, uint32_t fh,
                            uint32_t nms) {
  uint32_t l, r;
  lr_compute((uint16_t)e->rng, fl, fh, nms, &l, &r);
  int d = leading_zeros16(r);
  e->bits += d;
  e->rng = (uint16_t)(r << d);
}

static inline void ec_store(EcEnc* e, uint32_t fl, uint32_t fh, uint32_t nms) {
  uint32_t l, r;
  lr_compute(e->rng, fl, fh, nms, &l, &r);
  uint32_t low = l + e->low;
  int c = e->cnt;
  int d = leading_zeros16(r);
  int s = c + d;
  if (s >= 0) {
    c += 16;
    uint32_t m = (1u << c) - 1;
    if (s >= 8) {
      e->precarry.push_back((uint16_t)(low >> c));
      low &= m;
      c -= 8;
      m >>= 8;
    }
    e->precarry.push_back((uint16_t)(low >> c));
    s = c + d - 24;
    low &= m;
  }
  e->low = low << d;
  e->rng = (uint16_t)(r << d);
  e->cnt = (int16_t)s;
}

// Code symbol s against an inverted-Q15 CDF of nsymbs entries, then adapt
// (AV1 spec 8.4.1; reference ec.rs:935).
template <class E>
static inline void ec_symbol_update(E* e, int s, uint16_t* cdf, int nsymbs) {
  uint32_t fl = s > 0 ? cdf[s - 1] : 32768;
  uint32_t fh = cdf[s];
  ec_store(e, fl, fh, (uint32_t)(nsymbs - s));
  // adapt
  int count = cdf[nsymbs - 1];
  int rate = 3 + std::min(nsymbs >> 1, 2) + (count >> 4);
  cdf[nsymbs - 1] = (uint16_t)(count + 1 - (count >> 5));
  for (int i = 0; i < nsymbs - 1; i++) {
    uint16_t v = cdf[i];
    if (i >= s)
      cdf[i] = v - (v >> rate);
    else
      cdf[i] = v + ((32768 - v) >> rate);
  }
}

template <class E>
static inline void ec_symbol_noupdate(E* e, int s, const uint16_t* cdf,
                                      int nsymbs) {
  uint32_t fl = s > 0 ? cdf[s - 1] : 32768;
  uint32_t fh = cdf[s];
  ec_store(e, fl, fh, (uint32_t)(nsymbs - s));
}

template <class E>
static inline void ec_bit(E* e, int bit) {
  // flat bool: P = 16384/32768
  uint16_t cdf2[2] = {16384, 0};
  ec_symbol_noupdate(e, bit, cdf2, 2);
}

template <class E>
static inline void ec_literal(E* e, int bits, uint32_t v) {
  for (int b = bits - 1; b >= 0; b--) ec_bit(e, (v >> b) & 1);
}

template <class E>
static inline void ec_golomb(E* e, uint32_t level) {
  uint32_t x = level + 1;
  int length = 32 - __builtin_clz(x);
  for (int i = 0; i < length - 1; i++) ec_bit(e, 0);
  for (int i = length - 1; i >= 0; i--) ec_bit(e, (x >> i) & 1);
}

// ---- level-map coefficient coding ----------------------------------------

constexpr int NUM_BASE_LEVELS = 2;
constexpr int BR_CDF_SIZE = 4;
constexpr int COEFF_BASE_RANGE = 4 * (BR_CDF_SIZE - 1);

constexpr int TX_CLASS_2D = 0;
constexpr int TX_CLASS_HORIZ = 1;
constexpr int TX_CLASS_VERT = 2;

static const uint8_t kEobToPosSmall[33] = {
    0, 1, 2, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 5, 5, 5, 5,
    6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6};
static const uint8_t kEobToPosLarge[17] = {6, 7, 8, 8, 9, 9, 9, 9, 10, 10,
                                           10, 10, 10, 10, 10, 10, 11};
static const uint16_t kEobGroupStart[12] = {0, 1, 2,  3,  5,   9,
                                            17, 33, 65, 129, 257, 513};
static const uint16_t kEobOffsetBits[12] = {0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9};

// Sig-map (coeff_base) context, spec orientation (lvmap.py coeff_base_ctx).
static inline int coeff_base_ctx(const uint8_t* levels, int lstride, int row,
                                 int col, int w, int h, int cls) {
  if (cls == TX_CLASS_2D && row == 0 && col == 0) return 0;
  const uint8_t* p = levels + row * lstride + col;
  int m = std::min<int>(3, p[1]) + std::min<int>(3, p[lstride]);
  if (cls == TX_CLASS_2D) {
    m += std::min<int>(3, p[lstride + 1]);
    m += std::min<int>(3, p[2]);
    m += std::min<int>(3, p[2 * lstride]);
  } else if (cls == TX_CLASS_VERT) {
    m += std::min<int>(3, p[2 * lstride]);
    m += std::min<int>(3, p[3 * lstride]);
    m += std::min<int>(3, p[4 * lstride]);
  } else {
    m += std::min<int>(3, p[2]);
    m += std::min<int>(3, p[3]);
    m += std::min<int>(3, p[4]);
  }
  int ctx = std::min((m + 1) >> 1, 4);
  if (cls == TX_CLASS_2D) {
    if (w < h && row < 2) return 11 + ctx;
    if (w > h && col < 2) return 16 + ctx;
    if (row + col < 2) return ctx + 1;
    if (row + col < 4) return 5 + ctx + 1;
    return 21 + ctx;
  }
  int pos = (cls == TX_CLASS_HORIZ) ? col : row;
  return 26 + (pos == 0 ? 0 : (pos == 1 ? 5 : 10)) + ctx;
}

static inline int br_ctx(const uint8_t* levels, int lstride, int row, int col,
                         int cls) {
  const uint8_t* p = levels + row * lstride + col;
  int m = p[1] + p[lstride];
  if (cls == TX_CLASS_2D) {
    m += p[lstride + 1];
    m = std::min((m + 1) >> 1, 6);
    if (row == 0 && col == 0) return m;
    if (row < 2 && col < 2) return m + 7;
  } else if (cls == TX_CLASS_HORIZ) {
    m += p[2];
    m = std::min((m + 1) >> 1, 6);
    if (row == 0 && col == 0) return m;
    if (col == 0) return m + 7;
  } else {
    m += p[2 * lstride];
    m = std::min((m + 1) >> 1, 6);
    if (row == 0 && col == 0) return m;
    if (row == 0) return m + 7;
  }
  return m + 14;
}

}  // namespace

extern "C" {

void* ectx_new() { return new EcEnc(); }
void ectx_free(void* h) { delete (EcEnc*)h; }

void ectx_symbol_update(void* h, int s, uint16_t* cdf, int nsymbs) {
  ec_symbol_update((EcEnc*)h, s, cdf, nsymbs);
}
void ectx_symbol(void* h, int s, const uint16_t* cdf, int nsymbs) {
  ec_symbol_noupdate((EcEnc*)h, s, cdf, nsymbs);
}
void ectx_bit(void* h, int bit) { ec_bit((EcEnc*)h, bit); }
void ectx_literal(void* h, int bits, uint32_t v) { ec_literal((EcEnc*)h, bits, v); }
void ectx_golomb(void* h, uint32_t level) { ec_golomb((EcEnc*)h, level); }

long ectx_stream_bytes(void* h) { return (long)((EcEnc*)h)->precarry.size(); }
int ectx_rng(void* h) { return ((EcEnc*)h)->rng; }
int ectx_cnt(void* h) { return ((EcEnc*)h)->cnt; }

// checkpoint/rollback (reference WriterCheckpoint semantics)
void ectx_checkpoint(void* h, long* out3) {
  EcEnc* e = (EcEnc*)h;
  out3[0] = (long)e->precarry.size();
  out3[1] = (long)e->low;
  out3[2] = ((long)e->rng << 16) | (uint16_t)e->cnt;
}
void ectx_rollback(void* h, const long* in3) {
  EcEnc* e = (EcEnc*)h;
  e->precarry.resize((size_t)in3[0]);
  e->low = (uint32_t)in3[1];
  e->rng = (uint16_t)(in3[2] >> 16);
  e->cnt = (int16_t)(int16_t)(in3[2] & 0xFFFF);
}

// Flush; returns byte count written to out (cap must be >= bytes+8).
long ectx_done(void* h, uint8_t* out, long cap) {
  EcEnc* e = (EcEnc*)h;
  std::vector<uint16_t> pre = e->precarry;  // copy: done() may be re-run
  uint32_t l = e->low;
  int c = e->cnt;
  int s = 10 + c;
  uint32_t m = 0x3FFF;
  uint32_t eo = ((l + m) & ~m) | (m + 1);
  if (s > 0) {
    uint32_t n = (1u << (c + 16)) - 1;
    do {
      pre.push_back((uint16_t)(eo >> (c + 16)));
      eo &= n;
      s -= 8;
      c -= 8;
      n >>= 8;
    } while (s > 0);
  }
  if ((long)pre.size() > cap) return -1;
  uint32_t carry = 0;
  for (long i = (long)pre.size() - 1; i >= 0; i--) {
    carry += pre[(size_t)i];
    out[i] = (uint8_t)carry;
    carry >>= 8;
  }
  return (long)pre.size();
}

// Full level-map coefficient block coding (after txb_skip and tx_type have
// been coded by the caller).  qcoeffs: (tx_h, tx_w) int32 row-major; scan:
// coded area positions.  Returns cul_level composite (incl. dc sign bits).
}  // extern "C" — template needs C++ linkage

template <class E>
static int coeffs_lv_map_body(E* e,
                      const int32_t* qcoeffs, int tx_w, int tx_h,
                      int coded_w, int coded_h, int eob,
                      const uint16_t* scan, int tx_class, int plane_type,
                      int dc_sign_ctx,
                      uint16_t* eob_flag_row, int eob_flag_n,
                      uint16_t* eob_extra_base,
                      uint16_t* base_eob_block,
                      uint16_t* base_block,
                      uint16_t* br_block,
                      uint16_t* dc_sign_row) {
  int area = coded_w * coded_h;

  // EOB position token
  int eob_pt;
  if (eob < 33) eob_pt = kEobToPosSmall[eob];
  else eob_pt = kEobToPosLarge[std::min((eob - 1) >> 5, 16)];
  int eob_extra = eob - kEobGroupStart[eob_pt];
  ec_symbol_update(e, eob_pt - 1, eob_flag_row, eob_flag_n);
  int offset_bits = kEobOffsetBits[eob_pt];
  if (offset_bits > 0) {
    int shift = offset_bits - 1;
    ec_symbol_update(e, (eob_extra >> shift) & 1, eob_extra_base + 2 * (eob_pt - 3), 2);
    for (int i = 1; i < offset_bits; i++) {
      shift = offset_bits - 1 - i;
      ec_bit(e, (eob_extra >> shift) & 1);
    }
  }

  // levels buffer (coded_h+4) x (coded_w+4), zero padded
  int lstride = coded_w + 4;
  static thread_local std::vector<uint8_t> levels;
  levels.assign((size_t)(coded_h + 4) * lstride, 0);
  for (int r = 0; r < coded_h; r++)
    for (int cxx = 0; cxx < coded_w; cxx++) {
      int32_t v = qcoeffs[r * tx_w + cxx];
      levels[(size_t)r * lstride + cxx] =
          (uint8_t)std::min<int32_t>(v < 0 ? -v : v, 127);
    }

  // coded_w is a power of two (4..32): divide/modulo as shift/mask
  const int cw_log2 = coded_w == 4 ? 2 : coded_w == 8 ? 3
                      : coded_w == 16 ? 4 : 5;
  const int cw_mask = coded_w - 1;

  // base + br, reverse scan
  for (int c = eob - 1; c >= 0; c--) {
    int pos = scan[c];
    int row = pos >> cw_log2, col = pos & cw_mask;
    int32_t v = qcoeffs[row * tx_w + col];
    int level = v < 0 ? -v : v;
    if (c == eob - 1) {
      int ctx = (c == 0) ? 0 : (c <= area / 8 ? 1 : (c <= area / 4 ? 2 : 3));
      ec_symbol_update(e, std::min(level, 3) - 1, base_eob_block + 3 * ctx, 3);
    } else {
      int ctx = coeff_base_ctx(levels.data(), lstride, row, col, coded_w,
                               coded_h, tx_class);
      ec_symbol_update(e, std::min(level, 3), base_block + 4 * ctx, 4);
    }
    if (level > NUM_BASE_LEVELS) {
      int base_range = level - 1 - NUM_BASE_LEVELS;
      int bctx = br_ctx(levels.data(), lstride, row, col, tx_class);
      for (int idx = 0; idx < COEFF_BASE_RANGE; idx += BR_CDF_SIZE - 1) {
        int k = std::min(base_range - idx, BR_CDF_SIZE - 1);
        ec_symbol_update(e, k, br_block + 4 * bctx, 4);
        if (k < BR_CDF_SIZE - 1) break;
      }
    }
  }

  // signs + golomb residue, forward scan
  long cul = 0;
  for (int c = 0; c < eob; c++) {
    int pos = scan[c];
    int row = pos >> cw_log2, col = pos & cw_mask;
    int32_t v = qcoeffs[row * tx_w + col];
    if (v == 0) continue;
    int level = v < 0 ? -v : v;
    int sign = v < 0;
    if (c == 0) ec_symbol_update(e, sign, dc_sign_row, 2);
    else ec_bit(e, sign);
    if (level > COEFF_BASE_RANGE + NUM_BASE_LEVELS)
      ec_golomb(e, (uint32_t)(level - COEFF_BASE_RANGE - NUM_BASE_LEVELS - 1));
    cul += level;
  }

  int cul_level = (int)std::min<long>(63, cul);
  int32_t dc = qcoeffs[0];
  if (dc < 0) cul_level |= 1 << 6;
  else if (dc > 0) cul_level += 2 << 6;
  return cul_level;
}

extern "C" {

int ectx_write_coeffs(void* h,
                      const int32_t* qcoeffs, int tx_w, int tx_h,
                      int coded_w, int coded_h, int eob,
                      const uint16_t* scan, int tx_class, int plane_type,
                      int dc_sign_ctx,
                      // cdf blocks (base pointers into the numpy arrays)
                      uint16_t* eob_flag_row, int eob_flag_n,
                      uint16_t* eob_extra_base,   // rows of width 2, indexed [eob_pt-3]
                      uint16_t* base_eob_block,   // 4 rows of width 3
                      uint16_t* base_block,       // 42 rows of width 4
                      uint16_t* br_block,         // 21 rows of width 4
                      uint16_t* dc_sign_row) {
  return coeffs_lv_map_body((EcEnc*)h, qcoeffs, tx_w, tx_h, coded_w, coded_h,
                            eob, scan, tx_class, plane_type, dc_sign_ctx,
                            eob_flag_row, eob_flag_n, eob_extra_base,
                            base_eob_block, base_block, br_block, dc_sign_row);
}

// Rate-counting twin of ectx_write_coeffs for RDO trials (WriterCounter
// backend).  state[0] = rng in/out, state[1] = bits delta out.  CDFs adapt
// in place exactly as in the write path; the caller snapshots them for
// rollback.  Returns the cul_level composite.
int ectx_count_coeffs(long* state,
                      const int32_t* qcoeffs, int tx_w, int tx_h,
                      int coded_w, int coded_h, int eob,
                      const uint16_t* scan, int tx_class, int plane_type,
                      int dc_sign_ctx,
                      uint16_t* eob_flag_row, int eob_flag_n,
                      uint16_t* eob_extra_base,
                      uint16_t* base_eob_block,
                      uint16_t* base_block,
                      uint16_t* br_block,
                      uint16_t* dc_sign_row) {
  EcCount e;
  e.rng = (uint32_t)state[0];
  e.bits = 0;
  int cul = coeffs_lv_map_body(&e, qcoeffs, tx_w, tx_h, coded_w, coded_h,
                               eob, scan, tx_class, plane_type, dc_sign_ctx,
                               eob_flag_row, eob_flag_n, eob_extra_base,
                               base_eob_block, base_block, br_block,
                               dc_sign_row);
  state[0] = (long)e.rng;
  state[1] = e.bits;
  return cul;
}

}  // extern "C"
