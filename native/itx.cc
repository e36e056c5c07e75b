// Native inverse transform: interprets the same traced op-programs as
// rav1e_tpu/ops/transforms.py (data from rav1e_tpu/data/inv_tx_programs.npz)
// with identical int32 semantics, plus the normative 2-D driver
// (spec 7.13.3).  Used by the host reconstruction path; the jax/device path
// interprets the same tables under XLA.

#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>

namespace {

constexpr int KIND_INPUT = 0, KIND_BTF = 1, KIND_ADDCLAMP = 2, KIND_LIN = 3,
              KIND_RSHIFT = 4;

struct Node {
  int8_t kind;
  int32_t a, b, w0, w1, aux;
};

struct Program {
  std::vector<Node> nodes;
  std::vector<int32_t> out;
};

// program ids: family*8 + log2(n)-2; family 0=dct,1=adst,2=flipadst
static Program g_programs[32];

static inline int32_t round_shift(int64_t v, int bit) {
  if (bit == 0) return (int32_t)v;
  return (int32_t)((v + (1ll << (bit - 1))) >> bit);
}

static inline int32_t clamp_val(int64_t v, int bit) {
  int64_t mx = (1ll << (bit - 1)) - 1;
  int64_t mn = -(1ll << (bit - 1));
  return (int32_t)(v < mn ? mn : (v > mx ? mx : v));
}

constexpr int32_t SQRT2 = 5793;      // 2^12 * sqrt(2)
constexpr int32_t INV_SQRT2 = 2896;  // 2^12 / sqrt(2)

// Run a 1-D program over one vector (wrapping int32 arithmetic).
static void run_program(const Program& p, const int32_t* in, int32_t* out,
                        int range, int32_t* vals /* scratch >= nodes */) {
  const size_t n = p.nodes.size();
  for (size_t i = 0; i < n; i++) {
    const Node& nd = p.nodes[i];
    switch (nd.kind) {
      case KIND_INPUT:
        vals[i] = in[nd.aux];
        break;
      case KIND_BTF: {
        // wrapping i32 products + rounding, then arithmetic >> 12
        int32_t s = (int32_t)((uint32_t)vals[nd.a] * (uint32_t)nd.w0 +
                              (uint32_t)vals[nd.b] * (uint32_t)nd.w1);
        int32_t rounded = (int32_t)((uint32_t)s + (1u << 11));
        vals[i] = rounded >> 12;
        break;
      }
      case KIND_ADDCLAMP: {
        int64_t s = (int64_t)vals[nd.a] * nd.w0;
        if (nd.b >= 0) s += (int64_t)vals[nd.b] * nd.w1;
        vals[i] = clamp_val(s, range);
        break;
      }
      case KIND_LIN: {
        int64_t s = (int64_t)vals[nd.a] * nd.w0;
        if (nd.b >= 0) s += (int64_t)vals[nd.b] * nd.w1;
        vals[i] = (int32_t)s;  // wraps like i32
        break;
      }
      default:  // KIND_RSHIFT
        vals[i] = round_shift(vals[nd.a], nd.aux);
    }
  }
  for (size_t i = 0; i < p.out.size(); i++) out[i] = vals[p.out[i]];
}

// identity: 0=4,1=8,2=16,3=32 (by log2-2)
static void run_identity(int nlog2, const int32_t* in, int32_t* out, int n) {
  switch (nlog2) {
    case 2:
      for (int i = 0; i < n; i++)
        out[i] = round_shift((int64_t)in[i] * SQRT2, 12);
      break;
    case 3:
      for (int i = 0; i < n; i++) out[i] = in[i] * 2;
      break;
    case 4:
      for (int i = 0; i < n; i++)
        out[i] = round_shift((int64_t)in[i] * 2 * SQRT2, 12);
      break;
    default:
      for (int i = 0; i < n; i++) out[i] = in[i] * 4;
  }
}

static void run_wht4(const int32_t* in, int32_t* out) {
  int32_t x0 = in[0], x1 = in[1], x2 = in[2], x3 = in[3];
  int32_t s0 = x0 + x1;
  int32_t s2 = x2 - x3;
  int32_t s4 = (s0 - s2) >> 1;
  int32_t s3 = s4 - x3;
  int32_t s1 = s4 - x1;
  out[0] = s0 - s3;
  out[1] = s3;
  out[2] = s1;
  out[3] = s2 + s1;
}

// 1-D dispatch: type 0=dct,1=adst,2=flipadst,3=identity,4=wht
static void inv_1d(int type, int nlog2, const int32_t* in, int32_t* out, int n,
                   int range, int32_t* scratch) {
  if (type == 3) {
    run_identity(nlog2, in, out, n);
  } else if (type == 4) {
    run_wht4(in, out);
  } else {
    run_program(g_programs[type * 8 + (nlog2 - 2)], in, out, range, scratch);
  }
}

// --- lane-parallel interpreter: L independent 1-D vectors at once ---------
// Data layout is (element, lane): in[e * L + l].  Each node's inner loop is
// a fixed-width lane loop the compiler vectorizes; integer semantics are
// identical to run_program (ADDCLAMP weights are +-1 in every traced
// program — asserted at load — so i32 lane math cannot overflow).

template <int L>
static void run_program_lanes(const Program& p, const int32_t* in,
                              int32_t* out, int range, int32_t* vals) {
  const size_t n = p.nodes.size();
  const int32_t mx = (int32_t)((1ll << (range - 1)) - 1);
  const int32_t mn = (int32_t)(-(1ll << (range - 1)));
  for (size_t i = 0; i < n; i++) {
    const Node& nd = p.nodes[i];
    int32_t* vi = vals + i * L;
    switch (nd.kind) {
      case KIND_INPUT: {
        const int32_t* s = in + (size_t)nd.aux * L;
        for (int l = 0; l < L; l++) vi[l] = s[l];
        break;
      }
      case KIND_BTF: {
        const int32_t* va = vals + (size_t)nd.a * L;
        const int32_t* vb = vals + (size_t)nd.b * L;
        const uint32_t w0 = (uint32_t)nd.w0, w1 = (uint32_t)nd.w1;
        for (int l = 0; l < L; l++) {
          int32_t s = (int32_t)((uint32_t)va[l] * w0 + (uint32_t)vb[l] * w1);
          vi[l] = (int32_t)((uint32_t)s + (1u << 11)) >> 12;
        }
        break;
      }
      case KIND_ADDCLAMP: {
        const int32_t* va = vals + (size_t)nd.a * L;
        const int32_t w0 = nd.w0, w1 = nd.w1;
        if (nd.b >= 0) {
          const int32_t* vb = vals + (size_t)nd.b * L;
          for (int l = 0; l < L; l++) {
            int32_t s = va[l] * w0 + vb[l] * w1;
            vi[l] = s < mn ? mn : (s > mx ? mx : s);
          }
        } else {
          for (int l = 0; l < L; l++) {
            int32_t s = va[l] * w0;
            vi[l] = s < mn ? mn : (s > mx ? mx : s);
          }
        }
        break;
      }
      case KIND_LIN: {
        const int32_t* va = vals + (size_t)nd.a * L;
        const uint32_t w0 = (uint32_t)nd.w0;
        if (nd.b >= 0) {
          const int32_t* vb = vals + (size_t)nd.b * L;
          const uint32_t w1 = (uint32_t)nd.w1;
          for (int l = 0; l < L; l++)
            vi[l] = (int32_t)((uint32_t)va[l] * w0 + (uint32_t)vb[l] * w1);
        } else {
          for (int l = 0; l < L; l++)
            vi[l] = (int32_t)((uint32_t)va[l] * w0);
        }
        break;
      }
      default: {  // KIND_RSHIFT
        const int32_t* va = vals + (size_t)nd.a * L;
        const int bit = nd.aux;
        if (bit == 0) {
          for (int l = 0; l < L; l++) vi[l] = va[l];
        } else {
          const int64_t rnd = 1ll << (bit - 1);
          for (int l = 0; l < L; l++)
            vi[l] = (int32_t)(((int64_t)va[l] + rnd) >> bit);
        }
      }
    }
  }
  for (size_t i = 0; i < p.out.size(); i++) {
    const int32_t* s = vals + (size_t)p.out[i] * L;
    int32_t* d = out + i * L;
    for (int l = 0; l < L; l++) d[l] = s[l];
  }
}

template <int L>
static void run_identity_lanes(int nlog2, const int32_t* in, int32_t* out,
                               int n) {
  switch (nlog2) {
    case 2:
      for (int i = 0; i < n * L; i++)
        out[i] = (in[i] * SQRT2 + 2048) >> 12;
      break;
    case 3:
      for (int i = 0; i < n * L; i++) out[i] = in[i] * 2;
      break;
    case 4:
      for (int i = 0; i < n * L; i++)
        out[i] = (int32_t)(((int64_t)in[i] * 2 * SQRT2 + 2048) >> 12);
      break;
    default:
      for (int i = 0; i < n * L; i++) out[i] = in[i] * 4;
  }
}

template <int L>
static void run_wht4_lanes(const int32_t* in, int32_t* out) {
  for (int l = 0; l < L; l++) {
    int32_t x0 = in[l], x1 = in[L + l], x2 = in[2 * L + l], x3 = in[3 * L + l];
    int32_t s0 = x0 + x1;
    int32_t s2 = x2 - x3;
    int32_t s4 = (s0 - s2) >> 1;
    int32_t s3 = s4 - x3;
    int32_t s1 = s4 - x1;
    out[l] = s0 - s3;
    out[L + l] = s3;
    out[2 * L + l] = s1;
    out[3 * L + l] = s2 + s1;
  }
}

template <int L>
static void inv_1d_lanes(int type, int nlog2, const int32_t* in, int32_t* out,
                         int n, int range, int32_t* vals) {
  if (type == 3) {
    run_identity_lanes<L>(nlog2, in, out, n);
  } else if (type == 4) {
    run_wht4_lanes<L>(in, out);
  } else {
    run_program_lanes<L>(g_programs[type * 8 + (nlog2 - 2)], in, out, range,
                         vals);
  }
}

static inline int ilog2(int v) {
  int n = 0;
  while (v > 1) { v >>= 1; n++; }
  return n;
}

}  // namespace

extern "C" {

// Load one traced program. family: 0=dct,1=adst,2=flipadst; n = size.
void itx_load_program(int family, int n, int n_nodes, const int8_t* kind,
                      const int32_t* a, const int32_t* b, const int32_t* w0,
                      const int32_t* w1, const int32_t* aux, int n_out,
                      const int32_t* out) {
  Program& p = g_programs[family * 8 + (ilog2(n) - 2)];
  p.nodes.resize(n_nodes);
  for (int i = 0; i < n_nodes; i++) {
    p.nodes[i] = Node{kind[i], a[i], b[i], w0[i], w1[i], aux[i]};
    // the lane interpreter does ADDCLAMP in i32; every traced program uses
    // +-1 weights there, which cannot overflow.  Guard the assumption.
    if (kind[i] == KIND_ADDCLAMP &&
        (std::abs(w0[i]) > 2 || std::abs(w1[i]) > 2))
      abort();
  }
  p.out.assign(out, out + n_out);
}

// Normative 2-D inverse transform + add (spec 7.13.3).
// coeffs: (h, w) int32 row-major; pred/recon: (h, w) int32.
// vert/horiz: 1-D types as above; lossless => WHT path.
void itx_inverse_add(const int32_t* coeffs, const int32_t* pred, int32_t* recon,
                     int tx_w, int tx_h, int vert_type, int horiz_type,
                     int inter_shift, int is_rect, int is_lossless, int bd) {
  int32_t buf[64 * 64];
  int32_t tmp_in[64], tmp_out[64];
  int32_t scratch[1024];

  int row_range = bd + 8;
  int col_range = std::max(bd + 6, 16);
  int wlog2 = ilog2(tx_w), hlog2 = ilog2(tx_h);

  // row pass
  for (int r = 0; r < tx_h; r++) {
    const int32_t* src = coeffs + r * tx_w;
    for (int c = 0; c < tx_w; c++) {
      int64_t v = src[c];
      if (is_lossless) v = v >> 2;
      else if (is_rect) v = round_shift(v * INV_SQRT2, 12);
      tmp_in[c] = clamp_val(v, row_range);
    }
    inv_1d(horiz_type, wlog2, tmp_in, buf + r * tx_w, tx_w, row_range, scratch);
  }

  // intermediate shift + clamp, column pass, final shift + add + clip
  int32_t pix_max = (1 << bd) - 1;
  for (int c = 0; c < tx_w; c++) {
    for (int r = 0; r < tx_h; r++) {
      int32_t v = buf[r * tx_w + c];
      if (!is_lossless) v = round_shift(v, inter_shift);
      tmp_in[r] = clamp_val(v, col_range);
    }
    inv_1d(vert_type, hlog2, tmp_in, tmp_out, tx_h, col_range, scratch);
    for (int r = 0; r < tx_h; r++) {
      int32_t res = is_lossless ? tmp_out[r] : round_shift(tmp_out[r], 4);
      int32_t v = pred[r * tx_w + c] + res;
      recon[r * tx_w + c] = v < 0 ? 0 : (v > pix_max ? pix_max : v);
    }
  }
}

// Fused dequantize (spec 7.12.3) + 2-D inverse + reconstruction directly on
// the strided recon plane (uint8/uint16).  Removes the per-tx-block Python
// dequant/astype/writeback round-trips.
// Lane-parallel body: L rows (then L columns) run through the 1-D program
// together in (element, lane) layout, so every interpreter op is a fixed
// L-wide loop the compiler vectorizes.  buf_t holds the row-pass output
// TRANSPOSED (column-major) so both passes store contiguously.
extern "C++" {
template <int L>
static void dequant_recon_lanes(const int32_t* qcoeffs, int tx_w, int tx_h,
                                long dcq, long acq, int lts, void* rec,
                                long rec_stride, int bytespp, long px, long py,
                                int vert_type, int horiz_type, int inter_shift,
                                int is_rect, int is_lossless, int bd) {
  int32_t buf_t[64 * 64];  // (c, r): column-major row-pass output
  int32_t in_l[64 * L], out_l[64 * L];
  static thread_local std::vector<int32_t> vals;
  vals.resize(4096 * L);
  const int64_t offset = (1 << lts) - 1;
  const int row_range = bd + 8;
  const int col_range = std::max(bd + 6, 16);
  const int wlog2 = ilog2(tx_w), hlog2 = ilog2(tx_h);

  for (int r0 = 0; r0 < tx_h; r0 += L) {
    // fused dequant + rect/lossless scale + row clamp, transposed load
    for (int c = 0; c < tx_w; c++) {
      int32_t* d = in_l + c * L;
      for (int l = 0; l < L; l++) {
        int64_t q = qcoeffs[(r0 + l) * tx_w + c];
        int64_t prod = q * ((r0 + l) == 0 && c == 0 ? dcq : acq);
        int64_t v = (prod + ((prod >> 63) & offset)) >> lts;
        if (is_lossless) v = v >> 2;
        else if (is_rect) v = round_shift(v * INV_SQRT2, 12);
        d[l] = clamp_val(v, row_range);
      }
    }
    inv_1d_lanes<L>(horiz_type, wlog2, in_l, out_l, tx_w, row_range,
                    vals.data());
    for (int c = 0; c < tx_w; c++)
      std::memcpy(buf_t + c * tx_h + r0, out_l + c * L, L * sizeof(int32_t));
  }

  const int32_t pix_max = (1 << bd) - 1;
  for (int c0 = 0; c0 < tx_w; c0 += L) {
    for (int r = 0; r < tx_h; r++) {
      int32_t* d = in_l + r * L;
      for (int l = 0; l < L; l++) {
        int32_t v = buf_t[(c0 + l) * tx_h + r];
        if (!is_lossless) v = round_shift(v, inter_shift);
        d[l] = clamp_val(v, col_range);
      }
    }
    inv_1d_lanes<L>(vert_type, hlog2, in_l, out_l, tx_h, col_range,
                    vals.data());
    for (int r = 0; r < tx_h; r++) {
      const int32_t* s = out_l + r * L;
      long off = (py + r) * rec_stride + px + c0;
      if (bytespp == 1) {
        uint8_t* rp = (uint8_t*)rec + off;
        for (int l = 0; l < L; l++) {
          int32_t res = is_lossless ? s[l] : round_shift(s[l], 4);
          int32_t v = rp[l] + res;
          rp[l] = (uint8_t)(v < 0 ? 0 : (v > pix_max ? pix_max : v));
        }
      } else {
        uint16_t* rp = (uint16_t*)rec + off;
        for (int l = 0; l < L; l++) {
          int32_t res = is_lossless ? s[l] : round_shift(s[l], 4);
          int32_t v = rp[l] + res;
          rp[l] = (uint16_t)(v < 0 ? 0 : (v > pix_max ? pix_max : v));
        }
      }
    }
  }
}
}  // extern "C++"

void itx_dequant_recon(const int32_t* qcoeffs, int tx_w, int tx_h, long dcq,
                       long acq, int lts, void* rec, long rec_stride,
                       int bytespp, long px, long py, int vert_type,
                       int horiz_type, int inter_shift, int is_rect,
                       int is_lossless, int bd) {
  if (tx_h >= 8 && tx_w >= 8)
    dequant_recon_lanes<8>(qcoeffs, tx_w, tx_h, dcq, acq, lts, rec,
                           rec_stride, bytespp, px, py, vert_type, horiz_type,
                           inter_shift, is_rect, is_lossless, bd);
  else
    dequant_recon_lanes<4>(qcoeffs, tx_w, tx_h, dcq, acq, lts, rec,
                           rec_stride, bytespp, px, py, vert_type, horiz_type,
                           inter_shift, is_rect, is_lossless, bd);
}

}  // extern "C"
