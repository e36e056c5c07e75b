// Native SgrProj per-unit decision (ops/lrf.py lrf_decide_units inner loop).
//
// Computes, for one restoration unit, the SSE of the unfiltered CDEF output
// plus (xqd0, xqd1, sse) for every candidate SgrProj parameter set — the
// integral images, box sums, f2/f1 combines, normal-equation solve, and
// filter application all mirror the numpy reference path bit-exactly
// (integer ops identical; the 2x2 solve uses float64 with round-half-even
// to match Python round()).
//
// Capability counterpart of the reference's src/lrf.rs:630-1097
// (sgrproj_stripe_filter + sgrproj_solve), host-side for the encoder's
// RDO; the TPU path keeps the frame-batched jnp implementation.

#include <cstdint>
#include <cmath>
#include <cfenv>
#include <array>
#include <vector>
#include <algorithm>

namespace {

constexpr int SGRPROJ_MTABLE_BITS = 20;
constexpr int SGRPROJ_SGR_BITS = 8;
constexpr int SGRPROJ_RECIP_BITS = 12;
constexpr int SGRPROJ_RST_BITS = 4;
constexpr int SGRPROJ_PRJ_BITS = 7;

inline long px_at(const void* p, long stride, int bytespp, long r, long c) {
  if (bytespp == 1) return ((const uint8_t*)p)[r * stride + c];
  return ((const uint16_t*)p)[r * stride + c];
}

// VertPaddedIter/HorzPaddedIter semantics (ops/lrf.py _stripe_source)
inline long src_val(const void* cdef, long cstride, const void* debl,
                    long dstride, int bytespp, long px, long sy, long row0,
                    long col0, long stripe_h, long crop_w, long crop_h, long i,
                    long j) {
  long yy = i + sy + row0;
  long cropped = std::min(std::max(yy, 0L), crop_h - 1);
  long ly = std::min(std::max(cropped, sy - 2), sy + stripe_h + 1);
  bool use_cdef = (ly >= sy) && (ly < sy + stripe_h);
  long xx = std::min(std::max(j + px + col0, 0L), crop_w - 1);
  return use_cdef ? px_at(cdef, cstride, bytespp, ly, xx)
                  : px_at(debl, dstride, bytespp, ly, xx);
}

struct StripeGeom {
  int sh, uw;
  // Inclusive 2-D prefix sums as WRAPPING u32 (the reference's own
  // integral-image representation, lrf.rs:449-466 get_integral_square):
  // overflow cancels in the box differences, and 32-bit lanes let the
  // compiler vectorize 8-wide.  Box values themselves always fit u32
  // (max 25 * 4095^2 < 2^32).
  std::vector<uint32_t> P, Psq;  // (nrows, uw+7)
  std::vector<int32_t> lines;    // (sh, uw)
  int nrows, ncols;
};

void build_geom(StripeGeom& g, const void* cdef, long cstride,
                const void* debl, long dstride, int bytespp, long px, long sy,
                int uw, int sh, long crop_w, long crop_h) {
  int sh_even = sh + (sh & 1);
  int nrows = 4 + sh_even + 2;
  int ncols = uw + 7;
  g.sh = sh; g.uw = uw; g.nrows = nrows; g.ncols = ncols;
  g.P.assign((size_t)nrows * ncols, 0);
  g.Psq.assign((size_t)nrows * ncols, 0);
  for (int i = 0; i < nrows; i++) {
    uint32_t rowsum = 0, rowsq = 0;
    for (int j = 0; j < ncols; j++) {
      // the integral-image source treats the stripe as even-height (the
      // reference's VertPaddedIter gets stripe_h + (stripe_h & 1),
      // lrf.rs:558-561): for odd sh the row at sy+sh still reads CDEF
      uint32_t v = (uint32_t)src_val(cdef, cstride, debl, dstride, bytespp,
                                     px, sy, -4, -4, sh_even, crop_w, crop_h,
                                     i, j);
      rowsum += v;
      rowsq += v * v;
      uint32_t up = i > 0 ? g.P[(size_t)(i - 1) * ncols + j] : 0;
      uint32_t upq = i > 0 ? g.Psq[(size_t)(i - 1) * ncols + j] : 0;
      g.P[(size_t)i * ncols + j] = rowsum + up;
      g.Psq[(size_t)i * ncols + j] = rowsq + upq;
    }
  }
  g.lines.assign((size_t)sh * uw, 0);
  for (int i = 0; i < sh; i++)
    for (int j = 0; j < uw; j++)
      g.lines[(size_t)i * uw + j] = (int32_t)src_val(
          cdef, cstride, debl, dstride, bytespp, px, sy, 0, 0, sh, crop_w,
          crop_h, i, j);
}

// a depends only on z in [0,255]: LUT replaces the per-pixel division
static const auto z_lut = [] {
  std::array<int32_t, 256> t{};
  t[0] = 1;
  for (int32_t zz = 1; zz < 256; zz++)
    t[zz] = ((zz << SGRPROJ_SGR_BITS) + zz / 2) / (zz + 1);
  return t;
}();

inline uint32_t boxU(const uint32_t* M, int ncols, long y, long x, int d) {
  return M[(size_t)(y + d) * ncols + x + d] - M[(size_t)y * ncols + x + d] -
         M[(size_t)(y + d) * ncols + x] + M[(size_t)y * ncols + x];
}

// (A, B) for a whole block of rows: box sums at integral rows
// y0 + ystep*yi (yi < nys), diameter d, column offset xoff, finished per
// ops/lrf.py _sum_finish.  Three flat passes over the nys*cols block so
// the two arithmetic-only passes vectorize; the LUT pass is a bare
// gather.  All intermediates fit 32 bits except p*s and
// (256-a)*ssum*one_over_n, which use u64 lane math (max 37 resp. 34
// bits).
void ab_block(const StripeGeom& g, long y0, int ystep, int nys, int xoff,
              int d, int n, int one_over_n, long s, int bd, int cols,
              int32_t* __restrict A, int32_t* __restrict B) noexcept {
  const uint32_t* Pb = g.P.data();
  const uint32_t* Qb = g.Psq.data();
  const int ncols = g.ncols;
  const int bdm8 = bd - 8;
  static thread_local std::vector<uint32_t> sums, zs;
  sums.resize((size_t)nys * cols);
  zs.resize((size_t)nys * cols);
  for (int yi = 0; yi < nys; yi++) {
    long y = y0 + (long)ystep * yi;
    const uint32_t* __restrict P0 = Pb + (size_t)y * ncols + xoff;
    const uint32_t* __restrict P1 = Pb + (size_t)(y + d) * ncols + xoff;
    const uint32_t* __restrict Q0 = Qb + (size_t)y * ncols + xoff;
    const uint32_t* __restrict Q1 = Qb + (size_t)(y + d) * ncols + xoff;
    uint32_t* __restrict so = &sums[(size_t)yi * cols];
    uint32_t* __restrict zo = &zs[(size_t)yi * cols];
    for (int x = 0; x < cols; x++) {
      uint32_t ssum = P1[x + d] - P0[x + d] - P1[x] + P0[x];
      uint32_t ssq = Q1[x + d] - Q0[x + d] - Q1[x] + Q0[x];
      uint32_t sssq =
          bdm8 ? ((ssq + (1u << (2 * bdm8) >> 1)) >> (2 * bdm8)) : ssq;
      uint32_t ssum_s = bdm8 ? ((ssum + (1u << bdm8 >> 1)) >> bdm8) : ssum;
      int32_t p = (int32_t)(sssq * (uint32_t)n) - (int32_t)(ssum_s * ssum_s);
      if (p < 0) p = 0;
      uint64_t z = ((uint64_t)(uint32_t)p * (uint64_t)s +
                    (1u << SGRPROJ_MTABLE_BITS >> 1)) >> SGRPROJ_MTABLE_BITS;
      so[x] = ssum;
      zo[x] = z >= 255 ? 255u : (uint32_t)z;
    }
  }
  const long total = (long)nys * cols;
  {
    const int32_t* __restrict lut = z_lut.data();
    const uint32_t* __restrict zp = zs.data();
    for (long i = 0; i < total; i++) {
      uint32_t z = zp[i];
      A[i] = z >= 255 ? 256 : lut[z];
    }
  }
  {
    const uint32_t* __restrict sp = sums.data();
    for (long i = 0; i < total; i++) {
      uint64_t b = (uint64_t)(uint32_t)((1 << SGRPROJ_SGR_BITS) - A[i]) *
                   (uint64_t)sp[i] * (uint64_t)(uint32_t)one_over_n;
      B[i] = (int32_t)((b + (1u << SGRPROJ_RECIP_BITS >> 1)) >>
                       SGRPROJ_RECIP_BITS);
    }
  }
}

// f2/f1 for one stripe under one (s_r2, s_r1); mirrors
// ops/lrf.py sgr_compute_f_from_geom
void compute_f(const StripeGeom& g, int bd, long s_r2, long s_r1,
               std::vector<int32_t>& f2, std::vector<int32_t>& f1) {
  int sh = g.sh, uw = g.uw;
  f2.assign((size_t)sh * uw, 0);
  f1.assign((size_t)sh * uw, 0);
  // i32 throughout: a-chains <= 25*256, b-chains <= 25*2.91e6, and every
  // a*line + b combine stays under 2^27 — see ab_row for the box ranges
  if (s_r2 > 0) {
    int nys = (sh + 3) / 2;  // arange(0, sh+2, 2): ceil((sh+2)/2) entries
    std::vector<int32_t> A2((size_t)nys * (uw + 2)), B2((size_t)nys * (uw + 2));
    ab_block(g, 0, 2, nys, 0, 5, 25, 164, s_r2, bd, uw + 2, A2.data(),
             B2.data());
    // a2c/b2c: 5*(A[:, :-2]+A[:, 2:]) + 6*A[:, 1:-1], cols uw
    std::vector<int32_t> a2c((size_t)nys * uw), b2c((size_t)nys * uw);
    for (int yi = 0; yi < nys; yi++) {
      const int32_t* __restrict Ar = &A2[(size_t)yi * (uw + 2)];
      const int32_t* __restrict Br = &B2[(size_t)yi * (uw + 2)];
      int32_t* __restrict ao = &a2c[(size_t)yi * uw];
      int32_t* __restrict bo = &b2c[(size_t)yi * uw];
      for (int x = 0; x < uw; x++) {
        ao[x] = 5 * (Ar[x] + Ar[x + 2]) + 6 * Ar[x + 1];
        bo[x] = 5 * (Br[x] + Br[x + 2]) + 6 * Br[x + 1];
      }
    }
    int n_even = (sh + 1) / 2;
    for (int j0 = 0; j0 < n_even; j0++) {
      int row = 2 * j0;
      const int32_t* __restrict a0 = &a2c[(size_t)j0 * uw];
      const int32_t* __restrict a1 = &a2c[(size_t)(j0 + 1) * uw];
      const int32_t* __restrict b0 = &b2c[(size_t)j0 * uw];
      const int32_t* __restrict b1 = &b2c[(size_t)(j0 + 1) * uw];
      const int32_t* __restrict ln = &g.lines[(size_t)row * uw];
      int32_t* __restrict fo = &f2[(size_t)row * uw];
      for (int x = 0; x < uw; x++)
        fo[x] = ((a0[x] + a1[x]) * ln[x] + b0[x] + b1[x] + (1 << 9 >> 1)) >> 9;
    }
    int n_odd = sh / 2;
    for (int j1 = 1; j1 <= n_odd; j1++) {
      int row = 2 * j1 - 1;
      const int32_t* __restrict a1 = &a2c[(size_t)j1 * uw];
      const int32_t* __restrict b1 = &b2c[(size_t)j1 * uw];
      const int32_t* __restrict ln = &g.lines[(size_t)row * uw];
      int32_t* __restrict fo = &f2[(size_t)row * uw];
      for (int x = 0; x < uw; x++)
        fo[x] = (a1[x] * ln[x] + b1[x] + (1 << 8 >> 1)) >> 8;
    }
  } else {
    // r2 disabled: the reference computes f_r2 only for the even row of
    // each pair and shares it with the odd row (lrf.rs:746-750)
    for (int row = 0; row < sh; row++) {
      int even = row & ~1;
      for (int x = 0; x < uw; x++)
        f2[(size_t)row * uw + x] = g.lines[(size_t)even * uw + x]
                                   << SGRPROJ_RST_BITS;
    }
  }

  if (s_r1 > 0) {
    int nys = sh + 2;  // arange(0, sh+2) + 1, box offset (1,1)
    std::vector<int32_t> A1((size_t)nys * (uw + 2)), B1((size_t)nys * (uw + 2));
    ab_block(g, 1, 1, nys, 1, 3, 9, 455, s_r1, bd, uw + 2, A1.data(),
             B1.data());
    for (int r = 0; r < sh; r++) {
      const int32_t* __restrict T0 = &A1[(size_t)r * (uw + 2)];
      const int32_t* __restrict T1 = &A1[(size_t)(r + 1) * (uw + 2)];
      const int32_t* __restrict T2 = &A1[(size_t)(r + 2) * (uw + 2)];
      const int32_t* __restrict U0 = &B1[(size_t)r * (uw + 2)];
      const int32_t* __restrict U1 = &B1[(size_t)(r + 1) * (uw + 2)];
      const int32_t* __restrict U2 = &B1[(size_t)(r + 2) * (uw + 2)];
      const int32_t* __restrict ln = &g.lines[(size_t)r * uw];
      int32_t* __restrict fo = &f1[(size_t)r * uw];
      for (int x = 0; x < uw; x++) {
        int32_t a1c = 3 * (T0[x] + T2[x] + T0[x + 2] + T2[x + 2]) +
                      4 * (T1[x] + T0[x + 1] + T1[x + 1] + T2[x + 1] + T1[x + 2]);
        int32_t b1c = 3 * (U0[x] + U2[x] + U0[x + 2] + U2[x + 2]) +
                      4 * (U1[x] + U0[x + 1] + U1[x + 1] + U2[x + 1] + U1[x + 2]);
        fo[x] = (a1c * ln[x] + b1c + (1 << 9 >> 1)) >> 9;
      }
    }
  } else {
    for (size_t i = 0; i < f1.size(); i++)
      f1[i] = g.lines[i] << SGRPROJ_RST_BITS;
  }
}

}  // namespace

extern "C" {

// Per-unit SgrProj decision.  stripes: nstripes (sy, sh) pairs.
// params: nsets (s_r2, s_r1) pairs.  out: nsets triples
// (xqd0, xqd1, sse).  Returns sse_none (unfiltered CDEF vs source).
long long enc_sgr_decide_unit(
    const void* cdef, long cstride, const void* debl, long dstride,
    const void* src, long sstride, int bytespp, long x, int uw,
    const long* stripes, int nstripes, long crop_w, long crop_h, int bd,
    const long* params, int nsets, long long* out) {
  std::fesetround(FE_TONEAREST);  // match Python round-half-even

  static thread_local std::vector<StripeGeom> geoms;
  geoms.resize(nstripes);
  long long sse_none = 0;
  for (int si = 0; si < nstripes; si++) {
    long sy = stripes[2 * si], sh = stripes[2 * si + 1];
    build_geom(geoms[si], cdef, cstride, debl, dstride, bytespp, x, sy,
               uw, (int)sh, crop_w, crop_h);
    for (long r = 0; r < sh; r++)
      for (int c = 0; c < uw; c++) {
        long long d = px_at(cdef, cstride, bytespp, sy + r, x + c) -
                      px_at(src, sstride, bytespp, sy + r, x + c);
        sse_none += d * d;
      }
  }

  std::vector<int32_t> f2, f1;
  std::vector<std::vector<int32_t>> f2c(nstripes), f1c(nstripes);
  for (int s = 0; s < nsets; s++) {
    long s_r2 = params[2 * s], s_r1 = params[2 * s + 1];
    // accumulate normal equations over all stripes (i32 operands, i64
    // accumulators; |d| < 2^19 so each product fits 38 bits)
    int64_t ai[6] = {0, 0, 0, 0, 0, 0};
    for (int si = 0; si < nstripes; si++) {
      const StripeGeom& g = geoms[si];
      long sy = stripes[2 * si];
      compute_f(g, bd, s_r2, s_r1, f2c[si], f1c[si]);
      for (int r = 0; r < g.sh; r++) {
        const int32_t* ln = &g.lines[(size_t)r * g.uw];
        const int32_t* p2 = &f2c[si][(size_t)r * g.uw];
        const int32_t* p1 = &f1c[si][(size_t)r * g.uw];
        for (int c = 0; c < g.uw; c++) {
          int32_t u = ln[c] << SGRPROJ_RST_BITS;
          int32_t sv = ((int32_t)px_at(src, sstride, bytespp, sy + r, x + c)
                        << SGRPROJ_RST_BITS) - u;
          int32_t d2 = p2[c] - u;
          int32_t d1 = p1[c] - u;
          ai[0] += (int64_t)d2 * d2;
          ai[1] += (int64_t)d1 * d2;
          ai[2] += (int64_t)d1 * d1;
          ai[3] += (int64_t)d2 * sv;
          ai[4] += (int64_t)d1 * sv;
        }
        ai[5] += g.uw;
      }
    }
    // solve (ops/lrf.py sgr_solve_finish)
    double n = (double)std::max<int64_t>(ai[5], 1);
    double h00 = (double)ai[0] / n, h01 = (double)ai[1] / n,
           h11 = (double)ai[2] / n;
    double c0 = (double)ai[3] * (1 << SGRPROJ_PRJ_BITS) / n;
    double c1 = (double)ai[4] * (1 << SGRPROJ_PRJ_BITS) / n;
    double xq0 = 0, xq1 = 0;
    if (s_r2 == 0) {
      xq1 = h11 == 0.0 ? 0.0 : std::nearbyint(c1 / h11);
    } else if (s_r1 == 0) {
      xq0 = h00 == 0.0 ? 0.0 : std::nearbyint(c0 / h00);
    } else {
      double det = h00 * h11 - h01 * h01;
      if (det != 0.0) {
        xq0 = std::nearbyint((h11 * c0 - h01 * c1) / det);
        xq1 = std::nearbyint((h00 * c1 - h01 * c0) / det);
      }
    }
    long xqd0 = std::max(-96L, std::min((long)xq0, 31L));
    long xqd1 = std::max(
        -32L, std::min((1L << SGRPROJ_PRJ_BITS) - xqd0 - (long)xq1, 95L));

    // apply + SSE
    long long sse = 0;
    int w0 = (int)xqd0, w1 = (int)xqd1;
    int w2 = (1 << SGRPROJ_PRJ_BITS) - w0 - w1;
    int shift = SGRPROJ_RST_BITS + SGRPROJ_PRJ_BITS;
    long maxv = (1L << bd) - 1;
    for (int si = 0; si < nstripes; si++) {
      const StripeGeom& g = geoms[si];
      long sy = stripes[2 * si];
      for (int r = 0; r < g.sh; r++) {
        const int32_t* ln = &g.lines[(size_t)r * g.uw];
        const int32_t* p2 = &f2c[si][(size_t)r * g.uw];
        const int32_t* p1 = &f1c[si][(size_t)r * g.uw];
        for (int c = 0; c < g.uw; c++) {
          // |w0*f2| + |w1*u| + |w2*f1| < 2^27: i32 is safe
          int32_t u = ln[c] << SGRPROJ_RST_BITS;
          int32_t v = w0 * p2[c] + w1 * u + w2 * p1[c];
          int32_t o = (v + (1 << shift >> 1)) >> shift;
          o = std::max(0, std::min<int32_t>(o, (int32_t)maxv));
          int32_t d = o - (int32_t)px_at(src, sstride, bytespp, sy + r, x + c);
          sse += (int64_t)d * d;
        }
      }
    }
    out[3 * s] = xqd0;
    out[3 * s + 1] = xqd1;
    out[3 * s + 2] = sse;
  }
  return sse_none;
}

// Whole-plane SgrProj decision: loop every restoration unit inside one
// call (ops/lrf.py lrf_decide_units) — removes ~#units ctypes round-trips
// and numpy slicing per frame.  stripes: ALL plane stripes (sy, sh) with
// their unit row; out: rows*cols*nsets triples; out_none: rows*cols.
void enc_sgr_decide_plane(
    const void* cdef, long cstride, const void* debl, long dstride,
    const void* src, long sstride, int bytespp, long crop_w, long crop_h,
    int bd, const long* stripes, const int32_t* stripe_urow, int nstripes,
    long unit_size, int rows, int cols, const long* params, int nsets,
    long long* out, long long* out_none) {
  static thread_local std::vector<long> ust;
  for (int uy = 0; uy < rows; uy++) {
    ust.clear();
    for (int si = 0; si < nstripes; si++)
      if (stripe_urow[si] == uy) {
        ust.push_back(stripes[2 * si]);
        ust.push_back(stripes[2 * si + 1]);
      }
    int nu = (int)(ust.size() / 2);
    for (int ux = 0; ux < cols; ux++) {
      long x = ux * unit_size;
      int uw = (int)(ux == cols - 1 ? crop_w - x : unit_size);
      long long* o = out + ((long)uy * cols + ux) * nsets * 3;
      out_none[(long)uy * cols + ux] = enc_sgr_decide_unit(
          cdef, cstride, debl, dstride, src, sstride, bytespp, x, uw,
          ust.data(), nu, crop_w, crop_h, bd, params, nsets, o);
    }
  }
}

// Apply SgrProj to one (unit, stripe) rectangle, writing into `outp`
// (ops/lrf.py lrf_filter_frame sgr arm; reference lrf.rs:630-846).
void enc_sgr_apply_stripe(const void* cdef, long cstride, const void* debl,
                          long dstride, int bytespp, void* outp, long ostride,
                          long x, long sy, int uw, int sh, long crop_w,
                          long crop_h, int bd, long s_r2, long s_r1, int xqd0,
                          int xqd1) {
  StripeGeom g;
  build_geom(g, cdef, cstride, debl, dstride, bytespp, x, sy, uw, sh, crop_w,
             crop_h);
  std::vector<int32_t> f2, f1;
  compute_f(g, bd, s_r2, s_r1, f2, f1);
  int w0 = xqd0, w1 = xqd1;
  int w2 = (1 << SGRPROJ_PRJ_BITS) - w0 - w1;
  int shift = SGRPROJ_RST_BITS + SGRPROJ_PRJ_BITS;
  int32_t maxv = (1 << bd) - 1;
  for (int r = 0; r < sh; r++)
    for (int c = 0; c < uw; c++) {
      int32_t u = g.lines[(size_t)r * uw + c] << SGRPROJ_RST_BITS;
      int32_t v = w0 * f2[(size_t)r * uw + c] + w1 * u +
                  w2 * f1[(size_t)r * uw + c];
      int32_t o = (v + (1 << shift >> 1)) >> shift;
      o = std::max(0, std::min(o, maxv));
      if (bytespp == 1)
        ((uint8_t*)outp)[(sy + r) * ostride + x + c] = (uint8_t)o;
      else
        ((uint16_t*)outp)[(sy + r) * ostride + x + c] = (uint16_t)o;
    }
}

// Apply the Wiener filter to one (unit, stripe) rectangle
// (ops/lrf.py wiener_filter_stripe; reference lrf.rs:1099-1207).
// coeffs6: int32 [2][3] (vertical, horizontal).
void enc_wiener_apply_stripe(const int32_t* coeffs6, const void* cdef,
                             long cstride, const void* debl, long dstride,
                             int bytespp, void* outp, long ostride, long x,
                             long sy, int uw, int sh, long crop_w, long crop_h,
                             int bd) {
  int round_h = bd == 12 ? 5 : 3;
  int round_v = bd == 12 ? 9 : 11;
  int64_t offset = (int64_t)1 << (bd + 7 - round_h - 1);
  int64_t limit = ((int64_t)1 << (bd + 1 + 7 - round_h)) - 1;
  int64_t vf[7], hf[7];
  for (int k = 0; k < 2; k++) {
    const int32_t* cc = coeffs6 + 3 * k;
    int64_t* t = k == 0 ? vf : hf;
    t[0] = cc[0]; t[1] = cc[1]; t[2] = cc[2];
    t[3] = 128 - 2 * (cc[0] + cc[1] + cc[2]);
    t[4] = cc[2]; t[5] = cc[1]; t[6] = cc[0];
  }
  // horizontal pass into the i16-ish work buffer (rows sy-3 .. sy+sh+3);
  // the wiener row rule (ops/lrf.py wiener_filter_stripe): `below` rows use
  // the deblocked plane even when the crop clamp pulls them into the stripe
  static thread_local std::vector<int64_t> work;
  work.assign((size_t)(sh + 7) * uw, 0);
  for (int i = 0; i < sh + 7; i++) {
    long yy = (long)i + sy - 3;
    bool above = yy < sy;
    bool below = yy >= sy + sh;
    long ly = std::min(std::max(yy, 0L), crop_h - 1);
    if (above) ly = std::max(ly, sy - 2);
    if (below) ly = std::min(ly, sy + sh + 1);
    bool use_cdef = !above && !below;
    const void* rowsrc = use_cdef ? cdef : debl;
    long rstride = use_cdef ? cstride : dstride;
    for (int c = 0; c < uw; c++) {
      int64_t acc = 0;
      for (int k = 0; k < 7; k++) {
        long xx = std::min(std::max((long)c + x - 3 + k, 0L), crop_w - 1);
        acc += hf[k] * px_at(rowsrc, rstride, bytespp, ly, xx);
      }
      int64_t h = (acc + ((int64_t)1 << round_h >> 1)) >> round_h;
      h = std::max(-offset, std::min(h, limit - offset));
      work[(size_t)i * uw + c] = h;
    }
  }
  long maxv = (1L << bd) - 1;
  for (int r = 0; r < sh; r++)
    for (int c = 0; c < uw; c++) {
      int64_t acc = 0;
      for (int k = 0; k < 7; k++) acc += vf[k] * work[(size_t)(r + k) * uw + c];
      int64_t o = (acc + ((int64_t)1 << round_v >> 1)) >> round_v;
      o = std::max<int64_t>(0, std::min<int64_t>(o, maxv));
      if (bytespp == 1)
        ((uint8_t*)outp)[(sy + r) * ostride + x + c] = (uint8_t)o;
      else
        ((uint16_t*)outp)[(sy + r) * ostride + x + c] = (uint16_t)o;
    }
}

}  // extern "C"
