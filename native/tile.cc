// Native tile block-coding engine: the serial host half of the TPU design.
//
// The device analysis stage (rav1e_tpu/device/analysis.py) decides
// partitions / intra modes / intra-vs-inter for the whole frame as one
// batched XLA program; this module walks the partition tree and turns those
// decisions into the AV1 symbol stream at native speed — the counterpart of
// the reference's encode_tile / encode_partition / encode_block /
// encode_tx_block chain (encoder.rs:1404-3583) and its context derivations
// (context/block_unit.rs, partition_unit.rs, transform_unit.rs), behaviorally
// identical to the Python layer in rav1e_tpu/{context,encoder/pipeline.py}
// (the parity oracle: tests/test_native_tile.py asserts byte-equal
// bitstreams).
//
// Reuses the colocated native pieces: od_ec + level-map coding (ec.cc),
// forward tx + quantize (enc.cc), dequant + inverse tx recon (itx.cc),
// 8-tap MC + motion search (enc.cc).

#include <ctime>
#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <cmath>
#include <cfenv>
#include <vector>
#include <algorithm>

// ---------------------------------------------------------------------------
// imports from the sibling translation units (C linkage)
// ---------------------------------------------------------------------------
extern "C" {
void* ectx_new();
void ectx_free(void* h);
void ectx_symbol_update(void* h, int s, uint16_t* cdf, int nsymbs);
void ectx_symbol(void* h, int s, const uint16_t* cdf, int nsymbs);
void ectx_bit(void* h, int bit);
void ectx_literal(void* h, int bits, uint32_t v);
void ectx_golomb(void* h, uint32_t level);
long ectx_stream_bytes(void* h);
long ectx_done(void* h, uint8_t* out, long cap);
int ectx_write_coeffs(void* h, const int32_t* qcoeffs, int tx_w, int tx_h,
                      int coded_w, int coded_h, int eob, const uint16_t* scan,
                      int tx_class, int plane_type, int dc_sign_ctx,
                      uint16_t* eob_flag_row, int eob_flag_n,
                      uint16_t* eob_extra_base, uint16_t* base_eob_block,
                      uint16_t* base_block, uint16_t* br_block,
                      uint16_t* dc_sign_row);
int enc_fwd_quant(const void* src, long sstride, const void* rec, long rstride,
                  int bytespp, long px, long py, int tx_size_id, int tx_type_id,
                  int coded_w, int coded_h, const uint16_t* scan,
                  int log_tx_scale, long dc_quant, long ac_quant,
                  long dc_offset, long ac_offset0, long ac_offset1,
                  long ac_offset_eob, int32_t* qcoeffs);
void itx_dequant_recon(const int32_t* qcoeffs, int tx_w, int tx_h, long dcq,
                       long acq, int log_tx_scale, void* rec, long rstride,
                       int bytespp, long px, long py, int vert, int horiz,
                       int inter_shift, int is_rect, int is_wht, int bd);
void enc_put_8tap(const void* ref, long stride, int bytespp, long x0, long y0,
                  int w, int h, int col_frac, int row_frac, int mode_x,
                  int mode_y, int bd, int32_t* out);
void enc_prep_8tap(const void* ref, long stride, int bytespp, long x0, long y0,
                   int w, int h, int col_frac, int row_frac, int mode_x,
                   int mode_y, int bd, int32_t* out);
void enc_mc_avg(const int32_t* t1, const int32_t* t2, int n, int bd,
                int32_t* out);
long enc_me_search(const void* ref, long rstride, long rh, long rw,
                   int bytespp, long ax, long ay, const void* src,
                   long sstride, long spx, long spy, int w, int h, int bd,
                   const int32_t* seeds, int nseeds, int max_off,
                   int32_t* out_mv);
long sad_pred_ext(const void* src, long sstride, int bytespp, long sy,
                  long sx, const int32_t* pred, int w, int h);
long enc_me_search_satd(const void* ref, long rstride, long rh, long rw,
                        int bytespp, long ax, long ay, const void* src,
                        long sstride, long spx, long spy, int w, int h, int bd,
                        const int32_t* seeds, int nseeds, int max_off,
                        int32_t* out_mv);
}

// --- lightweight phase counters (ns) for the tile engine ------------------
// slots: 0 me, 1 mc, 2 intra-pred, 3 fwd+quant, 4 itx-recon, 5 coeff-write,
// 6 symbols/other.  Read+reset via tile_perf().
int64_t g_tile_perf[16] = {0};
int64_t g_tile_count[16] = {0};
static inline int64_t perf_now_ns() {
  struct timespec ts;
  clock_gettime(CLOCK_MONOTONIC, &ts);
  return ts.tv_sec * 1000000000LL + ts.tv_nsec;
}
struct PerfScope {
  int idx;
  int64_t t0;
  explicit PerfScope(int i) : idx(i), t0(perf_now_ns()) { g_tile_count[i]++; }
  ~PerfScope() { g_tile_perf[idx] += perf_now_ns() - t0; }
};
extern "C" void tile_perf(int64_t* out) {
  for (int i = 0; i < 16; i++) {
    out[i] = g_tile_perf[i];
    out[16 + i] = g_tile_count[i];
    g_tile_perf[i] = 0;
    g_tile_count[i] = 0;
  }
}

namespace tile {

// ---------------------------------------------------------------------------
// static tables (partition.py / tx.py / context/writer.py mirrors)
// ---------------------------------------------------------------------------

constexpr int MIB = 16;  // 64x64 SB in mi units

// BlockSize dims (partition.py _BS_DIMS order)
static const int BS_W[22] = {4, 4, 8, 8, 8, 16, 16, 16, 32, 32, 32, 64, 64,
                             64, 128, 128, 4, 16, 8, 32, 16, 64};
static const int BS_H[22] = {4, 8, 4, 8, 16, 8, 16, 32, 16, 32, 64, 32, 64,
                             128, 64, 128, 16, 4, 32, 8, 64, 16};

static int bs_from_wh(int w, int h) {
  for (int i = 0; i < 22; i++)
    if (BS_W[i] == w && BS_H[i] == h) return i;
  return -1;
}
static inline int ilog2i(int v) { return 31 - __builtin_clz((unsigned)v); }

// square BlockSize per log2 side (3..6 -> 8x8..64x64)
static inline int sq_bs(int log2side) {
  switch (log2side) {
    case 2: return 0;   // 4x4
    case 3: return 3;   // 8x8
    case 4: return 6;   // 16x16
    case 5: return 9;   // 32x32
    default: return 12; // 64x64
  }
}

// TxSize dims (tx.py order)
static const int TX_W[19] = {4, 8, 16, 32, 64, 4, 8, 8, 16, 16, 32, 32, 64,
                             4, 16, 8, 32, 16, 64};
static const int TX_H[19] = {4, 8, 16, 32, 64, 8, 4, 16, 8, 32, 16, 64, 32,
                             16, 4, 32, 8, 64, 16};
static int tx_from_wh(int w, int h) {
  for (int i = 0; i < 19; i++)
    if (TX_W[i] == w && TX_H[i] == h) return i;
  return -1;
}
static inline int tx_sqr(int t) {  // largest square not larger
  int s = std::min(TX_W[t], TX_H[t]);
  for (int i = 0; i < 5; i++)
    if (TX_W[i] == s && TX_H[i] == s) return i;
  return 4;
}
static inline int tx_sqr_up(int t) {
  int s = std::max(TX_W[t], TX_H[t]);
  s = std::min(s, 64);
  for (int i = 0; i < 5; i++)
    if (TX_W[i] == s && TX_H[i] == s) return i;
  return 4;
}
static inline int log_tx_scale(int t) {
  int px = TX_W[t] * TX_H[t];
  if (px > 1024) return 2;
  if (px > 256) return 1;
  return 0;
}
// INV_INTERMEDIATE_SHIFTS (tx.py:106)
static const int INV_SHIFT[19] = {0, 1, 2, 2, 2, 0, 0, 1, 1, 1, 1, 1, 1,
                                  1, 1, 2, 2, 2, 2};

// writer.py MAX_TXSIZE_RECT / SUB_TX_SIZE_MAP
static const int MAX_TXSIZE_RECT[22] = {0, 5, 6, 1, 7, 8, 2, 9, 10, 3, 11, 12,
                                        4, 4, 4, 4, 13, 14, 15, 16, 17, 18};
static const int SUB_TX_SIZE_MAP[19] = {0, 0, 1, 2, 3, 0, 0, 1, 1, 2, 2, 3,
                                        3, 5, 6, 7, 8, 9, 10};
static const int SIZE_GROUP_LOOKUP[22] = {0, 0, 0, 1, 1, 1, 2, 2, 2, 3, 3,
                                          3, 3, 3, 3, 3, 1, 1, 2, 2, 3, 3};
static const int INTRA_MODE_CONTEXT[13] = {0, 1, 2, 3, 4, 4, 4, 4, 3, 0, 1, 2, 0};
// intra mode -> preferred uv tx type (writer.py INTRA_MODE_TO_TX_TYPE);
// TxType ids follow tx.py: DCT_DCT=0, ADST_DCT=1, DCT_ADST=2, ADST_ADST=3
static const int INTRA_MODE_TO_TX_TYPE[14] = {0, 1, 2, 0, 3, 1, 2, 2, 1, 3,
                                              1, 2, 3, 0};
// tx set tables (writer.py:55-65)
static const int NUM_TX_SET[6] = {1, 2, 5, 7, 12, 16};
static const int TX_SET_INDEX_INTRA[6] = {0, -1, 2, 1, -1, -1};
static const int TX_SET_INDEX_INTER[6] = {0, 3, -1, -1, 2, 1};
static const int AV1_TX_IND[6][16] = {
    {0},
    {1, 0},
    {1, 3, 4, 2},
    {1, 5, 6, 4, 0, 0, 0, 0, 0, 0, 2, 3, 0, 0, 0, 0},
    {3, 4, 5, 8, 6, 7, 9, 10, 11, 0, 1, 2, 0, 0, 0, 0},
    {7, 8, 9, 12, 10, 11, 13, 14, 15, 0, 1, 2, 3, 4, 5, 6}};

// tx.py get_tx_set (TxSet enum: TX_SET_DCTONLY=0, DCT_IDTX=1, DTT4_IDTX=2,
// DTT4_IDTX_1DDCT=3, DTT9_IDTX_1DDCT=4, ALL16=5)
static int get_tx_set(int tx_size, bool is_inter, bool use_reduced) {
  // tx.py get_tx_set (spec 5.11.47); square ids: 0=4,1=8,2=16,3=32,4=64
  int sq = tx_sqr(tx_size);
  int sq_up = tx_sqr_up(tx_size);
  if (sq_up > 3) return 0;  // > 32x32 -> DCT only
  if (is_inter) {
    if (use_reduced || sq_up == 3) return 1;  // DCT_IDTX
    return sq == 2 ? 4 : 5;  // 16x16 -> DTT9_IDTX_1DDCT else ALL16
  }
  if (sq_up == 3) return 0;
  if (use_reduced || sq == 2) return 2;  // DTT4_IDTX
  return 3;  // DTT4_IDTX_1DDCT
}

// lvmap tx class per TxType (tx.py get_1d_tx_types): V_DCT..V_FLIPADST are
// vertical-only (class VERT? no: vert!=IDTX, horiz==IDTX -> TX_CLASS_VERT).
// TxType order (tx.py): 0 DCT_DCT,1 ADST_DCT,2 DCT_ADST,3 ADST_ADST,
// 4 FLIPADST_DCT,5 DCT_FLIPADST,6 FLIPADST_FLIPADST,7 ADST_FLIPADST,
// 8 FLIPADST_ADST,9 IDTX,10 V_DCT,11 H_DCT,12 V_ADST,13 H_ADST,14 V_FLIPADST,
// 15 H_FLIPADST, 16 WHT_WHT
static int tx_class_of(int tx_type) {
  if (tx_type == 10 || tx_type == 12 || tx_type == 14) return 2;  // VERT
  if (tx_type == 11 || tx_type == 13 || tx_type == 15) return 1;  // HORIZ
  return 0;
}
// 1-D types for itx_dequant_recon (TxType1D: DCT=0, ADST=1, FLIPADST=2,
// IDTX=3, WHT=4) as (vert, horiz) — tx.py get_1d_tx_types
static void tx_1d_types(int tx_type, int* vert, int* horiz) {
  static const int V[17] = {0, 1, 0, 1, 2, 0, 2, 1, 2, 3, 0, 3, 1, 3, 2, 3, 4};
  static const int H[17] = {0, 0, 1, 1, 0, 2, 2, 2, 1, 3, 3, 0, 3, 1, 3, 2, 4};
  *vert = V[tx_type];
  *horiz = H[tx_type];
}

// partition context code (block.py _partition_context_code)
static inline uint8_t part_ctx_code(int n_log2) {
  return (uint8_t)((0b11111 << (n_log2 - 2)) & 0b11111);
}

// dc/ac q lookup: passed in from Python (tables.dc_q/ac_q per segment)

// ---------------------------------------------------------------------------
// CDF registry: pointers into the Python CDFContext numpy arrays.
// Order must match rav1e_tpu/native_tile.py CDF_ORDER.
// ---------------------------------------------------------------------------

enum CdfId {
  C_PARTITION_W8 = 0,  // (4, 5)
  C_PARTITION,         // (12, 11)
  C_KF_Y,              // (5, 5, 14)
  C_Y_MODE,            // (4, 14)
  C_UV_MODE,           // (13, 14)
  C_UV_MODE_CFL,       // (13, 15)
  C_CFL_SIGN,          // (9,)
  C_CFL_ALPHA,         // (6, 17)
  C_NEWMV,             // (6, 3)
  C_ZEROMV,            // (2, 3)
  C_REFMV,             // (6, 3)
  C_DRL,               // (3, 3)
  C_INTRA_TX_2,        // (2, 13, 8)
  C_INTRA_TX_1,        // (2, 13, 13)
  C_INTER_TX_3,        // (4, 3)
  C_INTER_TX_2,        // (2, 13)
  C_INTER_TX_1,        // (1, 17)
  C_TX_8X8,            // (3, 3)
  C_TX_SIZE,           // (2, 3, 4)
  C_TXFM_PARTITION,    // (21, 3)
  C_SKIP,              // (3, 3)
  C_INTRA_INTER,       // (4, 3)
  C_ANGLE_DELTA,       // (8, 8)
  C_FILTER_INTRA,      // (22, 3)
  C_SPATIAL_SEG,       // (3, 9)
  C_COMP_MODE,         // (5, 3)
  C_COMP_REF_TYPE,     // (5, 3)
  C_COMP_REF,          // (3, 3, 3)
  C_COMP_BWD_REF,      // (3, 2, 3)
  C_SINGLE_REF,        // (3, 6, 3)
  C_COMPOUND_MODE,     // (8, 9)
  C_NMV_JOINTS,        // (5,)
  C_NMV_SIGN,          // (2, 3)
  C_NMV_CLASSES,       // (2, 12)
  C_NMV_CLASS0,        // (2, 3)
  C_NMV_BITS,          // (2, 10, 3)
  C_NMV_CLASS0_FP,     // (2, 2, 5)
  C_NMV_FP,            // (2, 5)
  C_NMV_CLASS0_HP,     // (2, 3)
  C_NMV_HP,            // (2, 3)
  C_TXB_SKIP,          // (5, 13, 3)
  C_DC_SIGN,           // (2, 3, 3)
  C_EOB_EXTRA,         // (5, 2, 9, 3)
  C_EOB16,             // (2, 2, 6)
  C_EOB32,             // (2, 2, 7)
  C_EOB64,             // (2, 2, 8)
  C_EOB128,            // (2, 2, 9)
  C_EOB256,            // (2, 2, 10)
  C_EOB512,            // (2, 2, 11)
  C_EOB1024,           // (2, 2, 12)
  C_COEFF_BASE_EOB,    // (5, 2, 4, 4)
  C_COEFF_BASE,        // (5, 2, 42, 5)
  C_COEFF_BR,          // (4, 2, 21, 5)
  C_LRF_SWITCHABLE,    // (4,)  wait: 3 symbols + counter
  C_LRF_SGRPROJ,       // (3,)
  C_LRF_WIENER,        // (3,)
  C_SKIP_MODE,         // (3, 3)
  N_CDFS
};

struct Cdfs {
  uint16_t* p[N_CDFS];
  // strides in elements for up to 3 leading dims
  long s0[N_CDFS], s1[N_CDFS], s2[N_CDFS];
  int last[N_CDFS];  // last-axis length (row length incl. counter)

  uint16_t* row(int id, long i0 = 0, long i1 = 0, long i2 = 0) const {
    return p[id] + i0 * s0[id] + i1 * s1[id] + i2 * s2[id];
  }
  int n(int id) const { return last[id]; }
};

// availability tables (32x32 bit grids per block size, from Python)
struct AvailTables {
  const uint8_t* tr;  // [22][32][32]
  const uint8_t* bl;
};

// scan tables registry: [tx_size] -> default-kind scan over coded dims;
// plus mrow/mcol (unused by the device path today but registered for safety)
static const uint16_t* g_scan_default[19] = {nullptr};

// ---------------------------------------------------------------------------
// frame-blocks grids (pointers into numpy; strides in elements)
// ---------------------------------------------------------------------------

struct Grids {
  uint8_t* mode;        long mode_s;
  uint8_t* uv_mode;     long uv_mode_s;
  uint8_t* bsize;       long bsize_s;
  uint8_t* skip;        long skip_s;   // numpy bool
  uint8_t* tx_size;     long tx_size_s;
  uint8_t* seg_idx;     long seg_idx_s;
  uint8_t* is_inter;    long is_inter_s;
  int8_t* ref_frames;   long ref_frames_s;  // (y, x, 2)
  int16_t* mv;          long mv_s;          // (y, x, 2, 2)
};

struct PlaneDesc {
  void* data;       // allocation base
  long stride;      // elements per row
  int bytespp;
  long pad;         // visible origin offset (both axes)
  long vis_w, vis_h;      // visible dims (plane units)
  long alloc_w, alloc_h;  // full allocation dims
};

// LRF per-plane flattened state (from Python RestorationState)
struct LrfPlane {
  int lrf_type;       // 0 none / 1 switchable / 2 wiener / 3 sgr
  int cols, rows;
  int sb_h_shift, sb_v_shift;
  int sb_cols, sb_rows;
  // per unit (row-major): kind (0 none, 1 sgr, 2 wiener)
  const int32_t* kind;
  const int32_t* sgr_set;   // per unit
  const int32_t* xqd;       // per unit * 2
  const int32_t* wiener;    // per unit * 6 ([p][i] i in 0..3)
};

struct TileParams {
  // geometry
  int mi_x0, mi_y0, mi_w, mi_h;
  int frame_mi_cols, frame_mi_rows;
  int xdec, ydec, nplanes;
  int bit_depth;
  // frame invariants
  int frame_type;      // 0 KEY, 1 INTER, 2 INTRA_ONLY, 3 SWITCH
  int is_inter_frame;  // has refs
  int base_q_idx;
  int tx_mode_select;
  int use_reduced_tx_set;
  int enable_filter_intra;
  int enable_intra_edge_filter;
  int reference_mode_select;  // bwd ref present
  // speed knobs relevant to this path
  int pr_min_log2, pr_max_log2;
  int enable_inter_tx_split;
  int use_satd_subpel;
  // segmentation
  int seg_enabled;
  int seg_last_active;
  const uint8_t* seg_map;  // frame mi grid
  long seg_map_s;
  const int32_t* seg_qidx;     // per segment base_q_idx (8)
  // quant tables per segment x plane: dc/ac quant + offsets are derived in
  // Python per (qidx, tx_size is_intra); pass dc_q/ac_q per segment instead
  const int32_t* seg_dcq;  // (8, 3): per segment x plane (chroma q offset)
  const int32_t* seg_acq;  // (8, 3)
  // device maps (8px cells, frame grid)
  const int32_t* dev_size_log2;  long dev_s;
  const int32_t* dev_mode;
  const uint8_t* dev_use_inter;  long dev_inter_s;
  // cdef
  int cdef_bits;
  const int32_t* cdef_idx_map;  long cdef_map_s;
  // planes: src, rec for this frame; refs for LAST/ALTREF (lumas + chroma)
  PlaneDesc src[3], rec[3];
  int have_ref0, have_ref1;
  PlaneDesc ref0[3], ref1[3];
  // hierarchical ME fields (16px grid, full-pel), may be null
  const int32_t* me_field0;  long me_f0_h, me_f0_w;
  const int32_t* me_field1;  long me_f1_h, me_f1_w;
  // previous frame MV field (frame mi grid, int16 pairs), may be null
  const int16_t* prev_mvs;  long prev_mvs_s;
  // device ME output (device/me.py): 1/8-pel MVs on the 16px cell grid;
  // when present the per-block host search is replaced by candidate
  // evaluation (me_candidates_one)
  const int32_t* dev_mv0;
  const int32_t* dev_mv1;
  long dev_mv_h, dev_mv_w;
  // LRF (pass 2); lrf_present=0 on pass 1
  int lrf_present;
  LrfPlane lrf[3];
  // outputs
  uint32_t* stats;  // [22 bsize counts][13 luma][14 chroma][1 skip]
  // pass-2 decision reuse: pass 1's coded grids (deterministic decisions,
  // so pass 2 skips the motion search and replays ref/mv from these)
  int reuse;
  const uint8_t* reuse_is_inter;  long reuse_is_inter_s;
  const int8_t* reuse_ref;        long reuse_ref_s;
  const int16_t* reuse_mv;        long reuse_mv_s;
  int skip_mode_present;  // frame codes skip_mode flags (spec 5.9.22)
  // pass-1/2 coefficient log: pass 2 replays quantized coefficients and
  // skips ALL pixel work (predict/MC/fwd/quant/recon) — symbol-only
  int coeff_log_mode;  // 0 off, 1 record, 2 replay
  uint8_t* coeff_log;
  long coeff_log_cap;
  long* coeff_log_len;  // record: out bytes used; replay: in bytes
  // far backward anchor (single-prediction BWDREF; pipeline
  // fi.ref_frame_bwd2): appended at the struct tail to keep the ctypes
  // mirror layout append-only
  int have_ref2;
  PlaneDesc ref2[3];
  const int32_t* dev_mv2;
};

// ---------------------------------------------------------------------------
// the coder
// ---------------------------------------------------------------------------

// optional symbol trace for parity debugging (tile_set_trace)
static int32_t* g_trace = nullptr;
static long g_trace_cap = 0, g_trace_n = 0;

struct Coder {
  const TileParams* P;
  Cdfs cdf;
  AvailTables avail;
  Grids g;
  void* ec;  // EcEnc handle

  // block context (per tile, transient)
  std::vector<uint8_t> above_part;  // (mi_w+1)/2 + 8
  uint8_t left_part[MIB >> 1];
  std::vector<uint8_t> above_tx;
  uint8_t left_tx[MIB];
  std::vector<uint8_t> above_coeff[3];
  uint8_t left_coeff[3][MIB];
  bool cdef_coded;
  // LRF refs state
  long lrf_last_coded[3];
  int sgrproj_ref[3][2];
  int wiener_ref[3][2][3];

  int err = 0;  // sticky error -> caller falls back
  long clog = 0;  // coefficient-log cursor (bytes)

  void sym(int s, int id, long i0 = 0, long i1 = 0, long i2 = 0) {
    if (g_trace && g_trace_n + 3 <= g_trace_cap) {
      g_trace[g_trace_n++] = s;
      g_trace[g_trace_n++] = id;
      g_trace[g_trace_n++] = (int32_t)(i0 * 10000 + i1 * 100 + i2);
    }
    ectx_symbol_update(ec, s, cdf.row(id, i0, i1, i2), cdf.n(id));
  }

  // ---- grid helpers ----
  inline uint8_t& G8(uint8_t* base, long stride, int y, int x) {
    return base[(long)y * stride + x];
  }
  void set_rect8(uint8_t* base, long stride, int x, int y, int bs, int v) {
    int w = std::min(BS_W[bs] >> 2, P->mi_w - x);
    int h = std::min(BS_H[bs] >> 2, P->mi_h - y);
    for (int r = 0; r < h; r++)
      memset(base + (long)(y + r) * stride + x, v, (size_t)w);
  }

  // ---- plane pixel access ----
  static inline int px(const PlaneDesc& pl, long y, long x) {
    // y/x relative to visible origin; may be negative (padding)
    long off = (pl.pad + y) * pl.stride + (pl.pad + x);
    if (pl.bytespp == 1) return ((const uint8_t*)pl.data)[off];
    return ((const uint16_t*)pl.data)[off];
  }
  static inline void set_px(const PlaneDesc& pl, long y, long x, int v) {
    long off = (pl.pad + y) * pl.stride + (pl.pad + x);
    if (pl.bytespp == 1) ((uint8_t*)pl.data)[off] = (uint8_t)v;
    else ((uint16_t*)pl.data)[off] = (uint16_t)v;
  }

  // tile-local plane coords -> frame visible coords
  inline long tile_px_x(int p, long x) const {
    int xd = p == 0 ? 0 : P->xdec;
    return ((long)P->mi_x0 << 2 >> xd) + x;
  }
  inline long tile_px_y(int p, long y) const {
    int yd = p == 0 ? 0 : P->ydec;
    return ((long)P->mi_y0 << 2 >> yd) + y;
  }
  // coded mi-area extent in plane units (pipeline plane_rect; the mi dims
  // round past the crop per spec 5.9.8, and recon exists there)
  inline long rect_w(int p) const {
    int xd = p == 0 ? 0 : P->xdec;
    return (long)P->mi_w << 2 >> xd;
  }
  inline long rect_h(int p) const {
    int yd = p == 0 ? 0 : P->ydec;
    return (long)P->mi_h << 2 >> yd;
  }
};

}  // namespace tile

#include "tile_intra.inc"
#include "tile_code.inc"
#include "tile_deblock.inc"

// ---------------------------------------------------------------------------
// C API
// ---------------------------------------------------------------------------

extern "C" {

void tile_register_scan(int tx_size_id, const uint16_t* scan) {
  tile::g_scan_default[tx_size_id] = scan;
}

// Deblock one plane in place (ops/deblock.py deblock_plane).
// data = visible-origin pointer.
void tile_deblock_plane(const int32_t* levels, void* data, long stride,
                        int bytespp, const int64_t* grid_ptrs,
                        const int64_t* grid_strides, int mi_rows, int mi_cols,
                        int pli, long crop_w, long crop_h, int bd, int xdec,
                        int ydec) {
  tile::DbPlane pl{data, stride, bytespp};
  tile::DbGrids G;
  G.bsize = (const uint8_t*)grid_ptrs[0];
  G.bsize_s = grid_strides[0];
  G.tx_size = (const uint8_t*)grid_ptrs[1];
  G.tx_size_s = grid_strides[1];
  G.skip = (const uint8_t*)grid_ptrs[2];
  G.skip_s = grid_strides[2];
  G.ref0 = (const int8_t*)grid_ptrs[3];
  G.ref0_s = grid_strides[3];
  G.rows = mi_rows;
  G.cols = mi_cols;
  int lv[4] = {levels[0], levels[1], levels[2], levels[3]};
  tile::db_plane(lv, pl, G, pli, crop_w, crop_h, bd, xdec, ydec);
}

// SSE-driven luma level search (ops/deblock.py deblock_search_levels):
// candidates base+{-4,-2,0,2,4}, filter a scratch copy, keep min-SSE level.
// rec/src: allocation-base pointers + pad.
int tile_deblock_search(int base_level, const void* rec, long rec_stride,
                        int bytespp, long pad, long alloc_w, long alloc_h,
                        const void* src, long src_stride,
                        const int64_t* grid_ptrs, const int64_t* grid_strides,
                        int mi_rows, int mi_cols, long crop_w, long crop_h,
                        int bd) {
  tile::DbGrids G;
  G.bsize = (const uint8_t*)grid_ptrs[0];
  G.bsize_s = grid_strides[0];
  G.tx_size = (const uint8_t*)grid_ptrs[1];
  G.tx_size_s = grid_strides[1];
  G.skip = (const uint8_t*)grid_ptrs[2];
  G.skip_s = grid_strides[2];
  G.ref0 = (const int8_t*)grid_ptrs[3];
  G.ref0_s = grid_strides[3];
  G.rows = mi_rows;
  G.cols = mi_cols;

  int cands[5];
  int nc = 0;
  for (int d : {-4, -2, 0, 2, 4}) {
    int lv = std::clamp(base_level + d, 0, 63);
    bool dup = false;
    for (int i = 0; i < nc; i++)
      if (cands[i] == lv) dup = true;
    if (!dup) cands[nc++] = lv;
  }
  std::sort(cands, cands + nc);

  size_t n = (size_t)alloc_h * rec_stride * bytespp;
  std::vector<uint8_t> scratch(n);
  int best_lv = cands[0];
  long long best_sse = -1;
  for (int ci = 0; ci < nc; ci++) {
    memcpy(scratch.data(), rec, n);
    tile::DbPlane pl{scratch.data() + (pad * rec_stride + pad) * bytespp,
                     rec_stride, bytespp};
    int lv[4] = {cands[ci], cands[ci], 0, 0};
    tile::db_plane(lv, pl, G, 0, crop_w, crop_h, bd, 0, 0);
    long long sse = 0;
    for (long y = 0; y < crop_h; y++)
      for (long x = 0; x < crop_w; x++) {
        long off = ((pad + y) * rec_stride + pad + x);
        int a = bytespp == 1 ? ((const uint8_t*)scratch.data())[off]
                             : ((const uint16_t*)scratch.data())[off];
        long soff = (pad + y) * src_stride + pad + x;
        int b = bytespp == 1 ? ((const uint8_t*)src)[soff]
                             : ((const uint16_t*)src)[soff];
        long long d = a - b;
        sse += d * d;
      }
    if (best_sse < 0 || sse < best_sse) {
      best_sse = sse;
      best_lv = cands[ci];
    }
  }
  return best_lv;
}

// Standalone directional intra prediction (ops/intra.py _pred_directional
// fast path for the trial-RDO tier; the tile coder's own blocks go through
// predict_block).  Edge buffers are the python IntraEdge arrays (int64);
// shorter-than-w+h edges replicate their last sample exactly like
// ops/intra.py _fill.
void tile_pred_directional(const int64_t* above, long n_above,
                           const int64_t* left, long n_left, long top_left,
                           int w, int h, int bd, int p_angle, int enable_ief,
                           int ief_smooth, int32_t* out) {
  tile::Edge e;
  e.top_left = (int32_t)top_left;
  e.have_above = true;
  e.have_left = true;
  int na = w + h;
  for (int i = 0; i < na; i++) {
    long ia = i < n_above ? i : n_above - 1;
    long il = i < n_left ? i : n_left - 1;
    e.above[i] = (int32_t)above[ia];
    e.left[i] = (int32_t)left[il];
  }
  tile::pred_directional(e, w, h, bd, p_angle, enable_ief != 0,
                         ief_smooth != 0, out);
}

void tile_set_trace(int32_t* buf, long cap) {
  tile::g_trace = buf;
  tile::g_trace_cap = cap;
  tile::g_trace_n = 0;
}
long tile_trace_len() { return tile::g_trace_n; }

// Encode one tile.  Returns bitstream length written to `out` (>=0) or a
// negative error (caller falls back to the Python path).
long tile_encode(const tile::TileParams* params,
                 const int64_t* cdf_ptrs,       // N_CDFS pointers
                 const int64_t* cdf_strides,    // N_CDFS x 3 (elements)
                 const int32_t* cdf_last,       // N_CDFS last-axis lengths
                 const uint8_t* avail_tr, const uint8_t* avail_bl,
                 const int64_t* grid_ptrs,      // 9 pointers (Grids order)
                 const int64_t* grid_strides,   // 9 strides (elements)
                 uint8_t* out, long cap) {
  tile::Coder c;
  c.P = params;
  for (int i = 0; i < tile::N_CDFS; i++) {
    c.cdf.p[i] = (uint16_t*)cdf_ptrs[i];
    c.cdf.s0[i] = cdf_strides[i * 3];
    c.cdf.s1[i] = cdf_strides[i * 3 + 1];
    c.cdf.s2[i] = cdf_strides[i * 3 + 2];
    c.cdf.last[i] = cdf_last[i];
  }
  c.avail.tr = avail_tr;
  c.avail.bl = avail_bl;
  c.g.mode = (uint8_t*)grid_ptrs[0];      c.g.mode_s = grid_strides[0];
  c.g.uv_mode = (uint8_t*)grid_ptrs[1];   c.g.uv_mode_s = grid_strides[1];
  c.g.bsize = (uint8_t*)grid_ptrs[2];     c.g.bsize_s = grid_strides[2];
  c.g.skip = (uint8_t*)grid_ptrs[3];      c.g.skip_s = grid_strides[3];
  c.g.tx_size = (uint8_t*)grid_ptrs[4];   c.g.tx_size_s = grid_strides[4];
  c.g.seg_idx = (uint8_t*)grid_ptrs[5];   c.g.seg_idx_s = grid_strides[5];
  c.g.is_inter = (uint8_t*)grid_ptrs[6];  c.g.is_inter_s = grid_strides[6];
  c.g.ref_frames = (int8_t*)grid_ptrs[7]; c.g.ref_frames_s = grid_strides[7];
  c.g.mv = (int16_t*)grid_ptrs[8];        c.g.mv_s = grid_strides[8];

  c.ec = ectx_new();
  long n = tile::encode_tile(&c, out, cap);
  ectx_free(c.ec);
  if (n >= 0 && params->coeff_log_mode == 1 && params->coeff_log_len)
    *params->coeff_log_len = c.clog;
  return n;
}

}  // extern "C"
