"""Frame encoding pipeline.

Counterpart of the reference's ``encode_frame`` / ``encode_tile_group`` /
``encode_tile`` (encoder.rs:3237-3818): per-tile superblock raster coding
with partition tree, intra prediction from reconstruction, transform /
quantize / coefficient coding, and OBU packet assembly.

Round-1 scope: intra frames (KEY), per-block mode selection via batched
SATD over candidate modes (device-friendly), tile-parallel-ready structure.
The serial entropy pass consumes per-block decisions; the compute-heavy
pieces (prediction candidates, transforms) run as batched array ops.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from rav1e_tpu import tables
from rav1e_tpu.api.util import EncoderStats, FrameType, Packet
from rav1e_tpu.config import ChromaSampling
from rav1e_tpu.context import BlockContext, CDFContext, ContextWriter, FrameBlocks
from rav1e_tpu.context.writer import (
    MAX_TXSIZE_RECT,
    SUB_TX_SIZE_MAP,
    cfl_allowed,
    uv_intra_mode_to_tx_type_context,
)
from rav1e_tpu.ec import WriterEncoder
from rav1e_tpu.encoder.obu import (
    FrameHeaderInfo,
    ObuType,
    frame_header_payload,
    sequence_header_obu,
    temporal_delimiter,
    wrap_obu,
)
from rav1e_tpu.encoder.sequence import Sequence
from rav1e_tpu.encoder.tiling import TilingInfo
from rav1e_tpu.frame import Frame, Plane
from rav1e_tpu.ops import transforms as T
from rav1e_tpu.ops.intra import IntraEdge, predict_intra
from rav1e_tpu.ops.intra_edges import build_intra_edge
from rav1e_tpu.partition import (
    BlockSize,
    MI_SIZE_LOG2,
    PartitionType,
    PredictionMode,
)
from rav1e_tpu.quantize import QuantizationContext, dequantize
from rav1e_tpu.tx import TxSize, TxType

MIB_SIZE = 16  # 64x64 superblock in mi units


def has_chroma(mi_x: int, mi_y: int, bsize: BlockSize, xdec: int, ydec: int, cs) -> bool:
    """transform_unit.rs:107-121."""
    if cs == ChromaSampling.Cs400:
        return False
    bw, bh = bsize.width_mi, bsize.height_mi
    return ((mi_x & 1) == 1 or (bw & 1) == 0 or xdec == 0) and (
        (mi_y & 1) == 1 or (bh & 1) == 0 or ydec == 0
    )


def build_ief_params(blocks, x: int, y: int, plane: int, xdec: int, ydec: int):
    """Intra edge filter parameters from neighbor block modes
    (reference predict.rs:543-575, tile_state.rs:229-264)."""
    from rav1e_tpu.ops.intra import IefParams

    bo_x, bo_y = x, y
    if bo_x & 1 == 0:
        bo_x += xdec
    if bo_y & 1 == 1:
        bo_y -= ydec
    above_mode = None
    if bo_y > 0:
        m = blocks.mode if plane == 0 else blocks.uv_mode
        above_mode = PredictionMode(int(m[bo_y - 1, bo_x]))
    bo_x, bo_y = x, y
    if bo_x & 1 == 1:
        bo_x -= xdec
    if bo_y & 1 == 0:
        bo_y += ydec
    left_mode = None
    if bo_x > 0:
        m = blocks.mode if plane == 0 else blocks.uv_mode
        left_mode = PredictionMode(int(m[min(bo_y, blocks.rows - 1), bo_x - 1]))
    return IefParams(above_mode=above_mode, left_mode=left_mode)


def _me_fullpel_extra(sad_at, best_mv, best_sad, method: int, range_px: int):
    """Full-pel search families beyond the diamond (reference me.rs:
    hexagon :1055, uneven multi-hex :1170, full_search :1464).  Candidate
    order and strict-< acceptance mirror native/enc.cc enc_me_fullpel_extra
    exactly so native-on/off bitstreams stay identical."""
    if method <= 0:
        return best_mv, best_sad

    def probe(mv):
        nonlocal best_mv, best_sad
        c = sad_at(mv)
        if c is not None and c < best_sad:
            best_mv, best_sad = mv, c

    if method >= 2:
        # cross search (drifting base), 5x5 window, big-hex rings
        for d in range(2, range_px + 1, 2):
            for dr, dc in ((0, -d), (0, d), (-d, 0), (d, 0)):
                probe((best_mv[0] + dr * 8, best_mv[1] + dc * 8))
        cr, cc = best_mv
        for dr in range(-2, 3):
            for dc in range(-2, 3):
                probe((cr + dr * 8, cc + dc * 8))
        bighex = (
            (2, -4), (1, -4), (0, -4), (-1, -4), (-2, -4),
            (2, 4), (1, 4), (0, 4), (-1, 4), (-2, 4),
            (3, -2), (4, 0), (3, 2), (-3, -2), (-4, 0), (-3, 2),
        )
        cr, cc = best_mv
        i = 1
        while i * 4 <= range_px:
            for dr, dc in bighex:
                probe((cr + dr * i * 8, cc + dc * i * 8))
            i += 1

    if method >= 1:
        hexp = ((0, -2), (0, 2), (-2, -1), (-2, 1), (2, -1), (2, 1))
        for step in (2, 1):
            improved = True
            while improved:
                improved = False
                base = best_mv
                for dr, dc in hexp:
                    c = sad_at((base[0] + dr * step * 8, base[1] + dc * step * 8))
                    if c is not None and c < best_sad:
                        best_mv = (base[0] + dr * step * 8, base[1] + dc * step * 8)
                        best_sad = c
                        improved = True
        improved = True
        while improved:
            improved = False
            base = best_mv
            for dr, dc in (
                (-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1),
            ):
                c = sad_at((base[0] + dr * 8, base[1] + dc * 8))
                if c is not None and c < best_sad:
                    best_mv = (base[0] + dr * 8, base[1] + dc * 8)
                    best_sad = c
                    improved = True

    if method >= 3:
        cr, cc = best_mv
        for dr in range(-range_px, range_px + 1):
            for dc in range(-range_px, range_px + 1):
                if dr == 0 and dc == 0:
                    continue
                probe((cr + dr * 8, cc + dc * 8))
    return best_mv, best_sad


def largest_chroma_tx_size(bsize: BlockSize, xdec: int, ydec: int) -> TxSize:
    """Chroma tx covering the whole (subsampled) block, capped at 32x32."""
    plane_bsize = bsize.chroma_block_size(xdec, ydec)
    t = MAX_TXSIZE_RECT[int(plane_bsize)]
    # chroma tx is capped at 32x32
    while t.width > 32 or t.height > 32:
        from rav1e_tpu.context.writer import SUB_TX_SIZE_MAP

        t = SUB_TX_SIZE_MAP[int(t)]
    return t


@dataclass
class FrameInvariantsLite:
    seq: Sequence
    width: int
    height: int
    frame_type: FrameType
    base_q_idx: int
    bit_depth: int
    tx_mode_select: bool
    use_reduced_tx_set: bool
    mi_cols: int
    mi_rows: int
    ref_frame: Optional[Frame] = None  # forward (LAST) reference reconstruction
    ref_frame_bwd: Optional[Frame] = None  # backward (ALTREF) reference
    # far backward anchor, searched single-prediction under the BWDREF name
    # (reference rdo.rs:1138-1155 multi-ref loop); compound stays
    # (LAST, ALTREF)
    ref_frame_bwd2: Optional[Frame] = None
    seg: Optional[object] = None  # SegmentationState
    prev_mvs: Optional[np.ndarray] = None  # (mi_rows, mi_cols, 2) last frame MV field
    init_cdfs: Optional[object] = None  # CDFContext inherited via primary_ref_frame
    dist_scales: Optional[np.ndarray] = None  # per-8x8 temporal-RDO distortion scales
    me_fields: Optional[dict] = None  # ref_type -> (nby, nbx, 2) px MV field
    skip_mode_present: bool = False  # frame codes skip_mode flags (spec 5.9.22)
    device_maps: Optional[object] = None  # rav1e_tpu.device.DeviceMaps decisions
    # per-plane quantizer deltas (reference rate.rs:510 chroma_offset ->
    # QuantizerParameters dc_qi/ac_qi; coded as delta_q_u/v_dc/ac)
    dc_delta_q: List[int] = field(default_factory=lambda: [0, 0, 0])
    ac_delta_q: List[int] = field(default_factory=lambda: [0, 0, 0])

    @property
    def is_inter_frame(self) -> bool:
        return self.frame_type.has_inter() and self.ref_frame is not None


class TileEncoder:
    """Serial symbol coding of one tile (the host half of the design)."""

    def __init__(
        self,
        fi: FrameInvariantsLite,
        src: Frame,
        rec: Frame,
        tile_mi_x: int,
        tile_mi_y: int,
        tile_mi_w: int,
        tile_mi_h: int,
        speed,
        frame_blocks: Optional[FrameBlocks] = None,
        rs=None,
        cdef_bits: int = 0,
        cdef_idx_map=None,
        decision_log=None,
        replay=None,
        reuse_blocks=None,
    ):
        self.fi = fi
        self.src = src
        self.rec = rec
        self.rs = rs
        self.reuse_blocks = reuse_blocks  # pass-1 frame grids (native pass 2)
        self.decision_log = decision_log
        self.replay = replay
        self._rp = 0
        self.cdef_bits = cdef_bits
        self.cdef_idx_map = cdef_idx_map
        self._cdef_coded = False
        if rs is not None:
            from rav1e_tpu.ops.lrf import TileRestorationRefs

            self.lrf_refs = TileRestorationRefs()
        self.mi_x0 = tile_mi_x
        self.mi_y0 = tile_mi_y
        self.mi_w = tile_mi_w
        self.mi_h = tile_mi_h
        self.speed = speed
        self.fc = (
            fi.init_cdfs.copy() if fi.init_cdfs is not None else CDFContext(fi.base_q_idx)
        )
        self.blocks = (
            frame_blocks.subgrid(tile_mi_x, tile_mi_y, tile_mi_w, tile_mi_h)
            if frame_blocks is not None
            else FrameBlocks(tile_mi_w, tile_mi_h)
        )
        self.bc = BlockContext(self.blocks)
        self.cw = ContextWriter(self.fc, self.bc)
        from rav1e_tpu import native

        if native.available():
            self.w = native.NativeWriterEncoder()
        else:
            self.w = WriterEncoder()
        self.qc = QuantizationContext()
        self.qc_uv = QuantizationContext()
        self.stats = EncoderStats()
        cs = fi.seq.chroma_sampling
        self.xdec, self.ydec = (0, 0) if cs == ChromaSampling.Cs400 else cs.decimation()
        # tile-origin views of source/recon planes (padded, so reads beyond
        # the frame edge are defined)
        self.src_views = [self._tile_view(p) for p in src.planes]
        self.rec_views = [self._tile_view(p) for p in rec.planes]
        # plane_rect: the coded mi-area extent (edges/prediction read recon
        # up to here — spec mi dims round past the crop).  vis_rect: the
        # visible crop (distortion is only counted inside it).
        self.plane_rect = []
        self.vis_rect = []
        for pi, p in enumerate(rec.planes):
            xd = 0 if pi == 0 else self.xdec
            yd = 0 if pi == 0 else self.ydec
            px = (tile_mi_x << MI_SIZE_LOG2) >> xd
            py = (tile_mi_y << MI_SIZE_LOG2) >> yd
            self.plane_rect.append((
                (tile_mi_w << MI_SIZE_LOG2) >> xd,
                (tile_mi_h << MI_SIZE_LOG2) >> yd,
            ))
            self.vis_rect.append((
                min(((tile_mi_w << MI_SIZE_LOG2) >> xd), p.cfg.width - px),
                min(((tile_mi_h << MI_SIZE_LOG2) >> yd), p.cfg.height - py),
            ))

    def _tile_view(self, plane: Plane) -> np.ndarray:
        pi = 0 if plane.cfg.xdec == 0 and plane.cfg.ydec == 0 else 1
        xd, yd = plane.cfg.xdec, plane.cfg.ydec
        px = (self.mi_x0 << MI_SIZE_LOG2) >> xd
        py = (self.mi_y0 << MI_SIZE_LOG2) >> yd
        pad = plane.cfg.pad
        # view with tile origin; generous extent into padding
        return plane.data[pad + py :, pad + px :]

    # ------------------------------------------------------------------

    def encode(self) -> bytes:
        if self.fi.device_maps is not None:
            # native C++ tile coder: the whole symbol stream for this tile in
            # one call, consuming the device decision maps
            # (native/tile.cc; parity with this Python path is asserted by
            # tests/test_native_tile.py)
            from rav1e_tpu import native_tile

            r = native_tile.encode_tile_native(self)
            if r is not None:
                payload, self.stats = r
                return payload
        sb_cols = (self.mi_w + MIB_SIZE - 1) // MIB_SIZE
        sb_rows = (self.mi_h + MIB_SIZE - 1) // MIB_SIZE
        nplanes = 1 if self.fi.seq.chroma_sampling == ChromaSampling.Cs400 else 3
        for sby in range(sb_rows):
            self.bc.reset_left_contexts()
            for sbx in range(sb_cols):
                self._cdef_coded = False
                if self.rs is not None:
                    # LRU params precede the SB's partition tree (spec 5.11.2;
                    # encoder.rs:3439-3450 writes LRF then replays block bits)
                    sb_x = (self.mi_x0 // MIB_SIZE) + sbx
                    sb_y = (self.mi_y0 // MIB_SIZE) + sby
                    for pli in range(nplanes):
                        self.cw.write_lrf(self.w, self.rs, self.lrf_refs, sb_x, sb_y, pli)
                self.encode_partition(
                    sbx * MIB_SIZE, sby * MIB_SIZE, BlockSize.BLOCK_64X64
                )
        if self.replay is not None and self._rp != len(self.replay):
            raise RuntimeError(
                f"decision replay desync: {len(self.replay) - self._rp} unconsumed"
            )
        return self.w.done()

    # --- partition tree -------------------------------------------------

    _BLOCK_FIELDS = (
        "mode", "uv_mode", "bsize", "skip", "tx_size", "segmentation_idx",
        "is_inter_flag", "ref_frames", "mv", "deblock_deltas",
    )

    # --- RDO decision record/replay (pass-2 re-encode skips searches) -----

    def _replaying(self) -> bool:
        return self.replay is not None

    def _pop_decision(self, tag):
        t, v = self.replay[self._rp]
        self._rp += 1
        if t != tag:
            raise RuntimeError(f"decision replay desync: expected {tag}, got {t}")
        return v

    def _log_decision(self, tag, v):
        if self.decision_log is not None and not self._in_trial():
            self.decision_log.append((tag, v))
        return v

    def encode_partition(self, x: int, y: int, bsize: BlockSize, trial: bool = False) -> None:
        if x >= self.mi_w or y >= self.mi_h:
            return
        hbs = bsize.width_mi // 2
        has_cols = (x + hbs) < self.mi_w
        has_rows = (y + hbs) < self.mi_h
        pr = self.speed.partition.partition_range
        if bsize < BlockSize.BLOCK_8X8:
            partition = PartitionType.PARTITION_NONE
        elif self._replaying():
            partition = self._pop_decision("part")
        else:
            must_split = not has_cols or not has_rows
            want_split = bsize.width_log2 > pr.max_log2
            dev = self.fi.device_maps
            can_search = (
                not trial
                and dev is None
                and not must_split
                and not want_split
                and bsize.width_log2 > pr.min_log2
                and bsize > BlockSize.BLOCK_8X8
            )
            if must_split or want_split:
                partition = PartitionType.PARTITION_SPLIT
            elif dev is not None and bsize.width_log2 > pr.min_log2:
                # device-decided quadtree (rav1e_tpu/device: batched D+λR
                # merge); split while the chosen size is finer than bsize
                cy = (self.mi_y0 + y) >> 1
                cx = (self.mi_x0 + x) >> 1
                chosen = int(dev.size_log2[cy, cx])
                chosen = min(max(chosen, pr.min_log2), pr.max_log2)
                partition = (
                    PartitionType.PARTITION_SPLIT
                    if bsize.width_log2 > chosen
                    else PartitionType.PARTITION_NONE
                )
            elif can_search:
                # RD search over the full partition-type set (counterpart of
                # rdo.rs rdo_partition_decision:1949 + get_sub_partitions
                # :1825, trial-coded on WriterCounter with rollback)
                from rav1e_tpu.partition import (
                    ext_partition_allowed,
                    partition_4_allowed,
                )

                cands = [PartitionType.PARTITION_NONE, PartitionType.PARTITION_SPLIT]
                if (
                    self.speed.partition.non_square_partition_max_threshold_log2
                    >= bsize.width_log2
                ):
                    cands += [PartitionType.PARTITION_HORZ, PartitionType.PARTITION_VERT]
                    if ext_partition_allowed(bsize):
                        cands += [
                            PartitionType.PARTITION_HORZ_A,
                            PartitionType.PARTITION_HORZ_B,
                            PartitionType.PARTITION_VERT_A,
                            PartitionType.PARTITION_VERT_B,
                        ]
                    if partition_4_allowed(bsize):
                        cands += [
                            PartitionType.PARTITION_HORZ_4,
                            PartitionType.PARTITION_VERT_4,
                        ]
                best = None
                for p in cands:
                    c = self._partition_trial_cost(x, y, bsize, p)
                    if best is None or c < best[0]:
                        best = (c, p)
                partition = best[1]
            else:
                partition = PartitionType.PARTITION_NONE
            if not trial:
                self._log_decision("part", partition)

        if bsize >= BlockSize.BLOCK_8X8:
            self.cw.write_partition(self.w, x, y, partition, bsize)

        if partition == PartitionType.PARTITION_SPLIT:
            sub = bsize.subsize(PartitionType.PARTITION_SPLIT)
            sw, sh = sub.width_mi, sub.height_mi
            self.encode_partition(x, y, sub, trial)
            self.encode_partition(x + sw, y, sub, trial)
            self.encode_partition(x, y + sh, sub, trial)
            self.encode_partition(x + sw, y + sh, sub, trial)
        else:
            from rav1e_tpu.partition import partition_children

            for (cx, cy, csize) in partition_children(x, y, bsize, partition):
                if cx >= self.mi_w or cy >= self.mi_h:
                    continue
                self.encode_block(cx, cy, csize)
            self.bc.update_partition_context(
                x, y, bsize.subsize(partition), bsize
            )

    # --- partition RDO helpers -------------------------------------------

    def _rdo_snapshot(self, x: int, y: int, bsize: BlockSize):
        sb_x = (x // MIB_SIZE) * MIB_SIZE
        h = min(bsize.height_mi, self.mi_h - y)
        w = min(bsize.width_mi, self.mi_w - x)
        blocks = {
            f: getattr(self.blocks, f)[y : y + h, x : x + w].copy()
            for f in self._BLOCK_FIELDS
        }
        recs = []
        for p, rv in enumerate(self.rec_views):
            xd = 0 if p == 0 else self.xdec
            yd = 0 if p == 0 else self.ydec
            px = (x << MI_SIZE_LOG2) >> xd
            py = (y << MI_SIZE_LOG2) >> yd
            pw = max(bsize.width >> xd, 4)
            ph = max(bsize.height >> yd, 4)
            recs.append((px, py, rv[py : py + ph, px : px + pw].copy()))
        return (self.cw.checkpoint(sb_x), blocks, recs, x, y, h, w, self._cdef_coded)

    def _rdo_restore(self, snap) -> None:
        cwck, blocks, recs, x, y, h, w, cdef_coded = snap
        self._cdef_coded = cdef_coded
        self.cw.rollback(cwck)
        for f, arr in blocks.items():
            getattr(self.blocks, f)[y : y + h, x : x + w] = arr
        for p, (px, py, arr) in enumerate(recs):
            self.rec_views[p][py : py + arr.shape[0], px : px + arr.shape[1]] = arr

    def _region_sse(self, x: int, y: int, bsize: BlockSize) -> int:
        sse = 0
        for p in range(len(self.rec_views)):
            xd = 0 if p == 0 else self.xdec
            yd = 0 if p == 0 else self.ydec
            px = (x << MI_SIZE_LOG2) >> xd
            py = (y << MI_SIZE_LOG2) >> yd
            pw = max(bsize.width >> xd, 4)
            ph = max(bsize.height >> yd, 4)
            rect_w, rect_h = self.vis_rect[p]
            pw = min(pw, rect_w - px)
            ph = min(ph, rect_h - py)
            if pw <= 0 or ph <= 0:
                continue
            d = self.src_views[p][py : py + ph, px : px + pw].astype(np.int64) - self.rec_views[p][
                py : py + ph, px : px + pw
            ]
            sse += int((d * d).sum())
        return sse

    @property
    def _rdo_lambda(self) -> float:
        q_step = tables.ac_q(self.fi.base_q_idx, 0, self.fi.bit_depth) / 8.0
        return 0.12 * q_step * q_step

    def _dist_scale(self, x: int, y: int, bsize: BlockSize) -> float:
        """Temporal-RDO distortion scale over the block's 8x8 importance
        cells (rdo.rs spatiotemporal_scale analog): >1 where future frames
        reference this area, so RDO spends more rate on it."""
        ds = self.fi.dist_scales
        if ds is None:
            return 1.0
        cy0 = (self.mi_y0 + y) >> 1
        cx0 = (self.mi_x0 + x) >> 1
        if cy0 >= ds.shape[0] or cx0 >= ds.shape[1]:
            return 1.0
        cy1 = min(cy0 + max(bsize.height_mi >> 1, 1), ds.shape[0])
        cx1 = min(cx0 + max(bsize.width_mi >> 1, 1), ds.shape[1])
        return float(ds[cy0:cy1, cx0:cx1].mean())

    def _partition_trial_cost(self, x, y, bsize, partition) -> float:
        from rav1e_tpu.ec import WriterCounter

        snap = self._rdo_snapshot(x, y, bsize)
        w_sav = self.w
        self.w = WriterCounter()
        t0 = self.w.tell_frac()
        try:
            self.cw.write_partition(self.w, x, y, partition, bsize)
            if partition == PartitionType.PARTITION_SPLIT:
                sub = bsize.subsize(PartitionType.PARTITION_SPLIT)
                sw, sh = sub.width_mi, sub.height_mi
                self.encode_partition(x, y, sub, trial=True)
                self.encode_partition(x + sw, y, sub, trial=True)
                self.encode_partition(x, y + sh, sub, trial=True)
                self.encode_partition(x + sw, y + sh, sub, trial=True)
            else:
                from rav1e_tpu.partition import partition_children

                for (cx, cy, csize) in partition_children(x, y, bsize, partition):
                    if cx >= self.mi_w or cy >= self.mi_h:
                        continue
                    self.encode_block(cx, cy, csize)
                self.bc.update_partition_context(
                    x, y, bsize.subsize(partition), bsize
                )
            bits = (self.w.tell_frac() - t0) / 8.0  # Q3-bit fractional tell
        finally:
            self.w = w_sav
        sse = self._region_sse(x, y, bsize)
        self._rdo_restore(snap)
        return sse * self._dist_scale(x, y, bsize) + self._rdo_lambda * bits

    # --- block coding ----------------------------------------------------

    def _bump_stats(self, bsize, luma_mode, chroma_mode, skip) -> None:
        """Per-packet coding statistics (reference src/stats.rs:35-78)."""
        from rav1e_tpu.ec import WriterCounter

        if isinstance(self.w, WriterCounter):
            return  # RDO trial, not the real pass
        st = self.stats
        st.block_size_counts[int(bsize)] = st.block_size_counts.get(int(bsize), 0) + 1
        if skip:
            st.skip_block_count += 1
        st.luma_pred_mode_counts[int(luma_mode)] = (
            st.luma_pred_mode_counts.get(int(luma_mode), 0) + 1
        )
        if chroma_mode is not None:
            st.chroma_pred_mode_counts[int(chroma_mode)] = (
                st.chroma_pred_mode_counts.get(int(chroma_mode), 0) + 1
            )

    def encode_block(self, x: int, y: int, bsize: BlockSize) -> None:
        if self.fi.is_inter_frame:
            if self._replaying():
                dec = self._pop_decision("blk")
                inter = self._rebuild_inter(x, y, bsize, dec)
            else:
                inter = self.select_inter(x, y, bsize)
                if (
                    self.speed.transform.rdo_tx_decision
                    and not self._in_trial()
                    and bsize >= BlockSize.BLOCK_8X8
                ):
                    # real-rate inter mode decision at quality speeds
                    # (inter_frame_rdo_mode_decision, rdo.rs:1121): trial-code
                    # the ME winner, the NEAREST/NEAR stack candidates per
                    # ref, and the intra alternative with true rate
                    inter = self._select_inter_rd(x, y, bsize, inter)
                self._log_decision(
                    "blk", None if inter is None else (inter[0], inter[2])
                )
            if inter is not None:
                self.encode_block_inter(x, y, bsize, *inter)
                return
            # fall through to intra coding within the inter frame
            self.encode_block_intra(x, y, bsize, in_inter_frame=True)
        else:
            self.encode_block_intra(x, y, bsize, in_inter_frame=False)

    def _select_inter_rd(self, x, y, bsize, proxy):
        """Trial-encode inter candidates (and the intra fallback) with real
        rate on a WriterCounter with full rollback — the counterpart of the
        reference's inter_frame_rdo_mode_decision (rdo.rs:1121); the SATD
        proxy search supplies the NEWMV candidate, the MV stack supplies the
        NEAREST/NEAR candidates."""
        from rav1e_tpu.context.mv import ALTREF_FRAME, LAST_FRAME
        from rav1e_tpu.ec import WriterCounter

        fi = self.fi
        cands = []
        if proxy is not None:
            cands.append(proxy)
        finder = self._mv_finder()
        from rav1e_tpu.context.mv import BWDREF_FRAME

        for ref_type, ref_obj in (
            (LAST_FRAME, fi.ref_frame),
            (ALTREF_FRAME, fi.ref_frame_bwd),
            (BWDREF_FRAME, fi.ref_frame_bwd2),
        ):
            if ref_obj is None:
                continue
            stack, mode_ctx = finder.find_mvrefs(
                x, y, ref_type, bsize, lambda r: 0
            )
            seen = set()
            for c in stack[:2]:
                mv = tuple(c.this_mv)
                if mv in seen:
                    continue
                seen.add(mv)
                if (
                    proxy is not None
                    and not isinstance(proxy[0], tuple)
                    and proxy[0] == ref_type
                    and proxy[2] == mv
                ):
                    continue
                cands.append((ref_type, ref_obj, mv, stack, mode_ctx))

        lam = self._rdo_lambda
        ds = self._dist_scale(x, y, bsize)
        best, best_cost = None, None
        for cand in cands:
            snap = self._rdo_snapshot(x, y, bsize)
            w_sav = self.w
            self.w = WriterCounter()
            t0 = self.w.tell_frac()
            try:
                self.encode_block_inter(x, y, bsize, *cand)
                bits = (self.w.tell_frac() - t0) / 8.0
            finally:
                self.w = w_sav
            sse = self._region_sse(x, y, bsize)
            self._rdo_restore(snap)
            cost = sse * ds + lam * bits
            if best_cost is None or cost < best_cost:
                best, best_cost = cand, cost

        # the intra alternative, same trial machinery
        snap = self._rdo_snapshot(x, y, bsize)
        w_sav = self.w
        self.w = WriterCounter()
        t0 = self.w.tell_frac()
        try:
            self.encode_block_intra(x, y, bsize, in_inter_frame=True)
            bits = (self.w.tell_frac() - t0) / 8.0
        finally:
            self.w = w_sav
        sse = self._region_sse(x, y, bsize)
        self._rdo_restore(snap)
        if best_cost is None or sse * ds + lam * bits < best_cost:
            return None
        return best

    def _rebuild_inter(self, x, y, bsize, dec):
        """Reconstitute a recorded (ref_type, mv) inter decision: the ref
        objects and MV stack re-derive deterministically from fi + the
        (identical) block-grid state at this point of the traversal."""
        if dec is None:
            return None
        ref_type, mv = dec
        fi = self.fi
        if isinstance(ref_type, tuple):
            ref_obj = (fi.ref_frame, fi.ref_frame_bwd)
        else:
            from rav1e_tpu.context.mv import ALTREF_FRAME, BWDREF_FRAME

            if ref_type == ALTREF_FRAME:
                ref_obj = fi.ref_frame_bwd
            elif ref_type == BWDREF_FRAME:
                ref_obj = fi.ref_frame_bwd2
            else:
                ref_obj = fi.ref_frame
        stack, mode_ctx = self._mv_finder().find_mvrefs(
            x, y, ref_type, bsize, lambda r: 0
        )
        return (ref_type, ref_obj, mv, stack, mode_ctx)

    def encode_block_intra(
        self, x: int, y: int, bsize: BlockSize, in_inter_frame: bool,
        tx_size_override=None, luma_mode_override=None, angle_delta_override=0,
    ) -> None:
        fi = self.fi
        cs = fi.seq.chroma_sampling
        skip = False
        self.blocks.set_rect("skip", x, y, bsize, skip)

        if tx_size_override is not None:
            tx_size = tx_size_override
        elif (
            self.speed.transform.rdo_tx_decision
            and fi.tx_mode_select
            and bsize > BlockSize.BLOCK_4X4
            and not self._in_trial()
        ):
            if self._replaying():
                tx_size = self._pop_decision("txs")
            else:
                tx_size = self._log_decision(
                    "txs", self._select_intra_tx_size(x, y, bsize, in_inter_frame)
                )
        else:
            tx_size = self._luma_tx_size(bsize)

        if luma_mode_override is not None:
            luma_mode = luma_mode_override
        elif self._replaying():
            luma_mode, angle_delta_override = self._pop_decision("mode")
        elif self.fi.device_maps is not None:
            # device-decided intra mode (batched 13-mode SATD + tx-domain RD
            # on the TPU; rav1e_tpu/device/analysis.py)
            cy = (self.mi_y0 + y) >> 1
            cx = (self.mi_x0 + x) >> 1
            luma_mode = PredictionMode(int(self.fi.device_maps.mode[cy, cx]))
            self._log_decision("mode", (luma_mode, angle_delta_override))
        else:
            ranked = self.select_luma_mode(x, y, bsize)
            luma_mode = ranked[0]
            from rav1e_tpu.config import PredictionModesSetting

            if (
                self.speed.transform.rdo_tx_decision
                and not self._in_trial()
                and len(ranked) > 1
            ):
                # trial-code the top candidates with real rate+distortion
                # (rdo.rs intra_frame_rdo_mode_decision, SATD-pruned to 2;
                # best directional mode also trials its SATD-picked delta)
                cand_pairs = [(m, 0) for m in ranked[:2]]
                if ranked[0].is_directional() and bsize >= BlockSize.BLOCK_8X8:
                    d = self._select_angle_delta(x, y, bsize, ranked[0])
                    if d != 0:
                        cand_pairs.append((ranked[0], d))
                luma_mode, angle_delta_override = self._select_intra_mode_rd(
                    x, y, bsize, in_inter_frame, cand_pairs
                )
            self._log_decision("mode", (luma_mode, angle_delta_override))
        chroma_mode = luma_mode if luma_mode < PredictionMode.UV_CFL_PRED else PredictionMode.DC_PRED
        do_chroma = has_chroma(x, y, bsize, self.xdec, self.ydec, cs)

        cfl = None
        # CfL is skipped when the block's own chroma coverage is narrower
        # than the (min-4) clamped chroma tx: the luma AC array would not
        # cover the prediction (sub-4 chroma in 4:2:2/4:2:0); always a legal
        # encoder choice
        cfl_fits = (
            (bsize.width >> self.xdec) >= 4 and (bsize.height >> self.ydec) >= 4
        )
        if do_chroma and cs != ChromaSampling.Cs400 and cfl_allowed(bsize) and cfl_fits:
            if self._replaying():
                cfl = self._pop_decision("cfl")
            else:
                cfl = self._log_decision("cfl", self.select_cfl(x, y, bsize))
            if cfl is not None:
                chroma_mode = PredictionMode.UV_CFL_PRED

        # symbols: skip, mode info
        if fi.skip_mode_present and bsize.width >= 8 and bsize.height >= 8:
            self.cw.write_skip_mode(self.w, x, y, False)
        self.cw.write_skip(self.w, x, y, skip)
        seg_id = 0
        if fi.seg is not None:
            sid = int(fi.seg.seg_map[self.mi_y0 + y, self.mi_x0 + x])
            seg_id = self.cw.write_segmentation(
                self.w, x, y, bsize, skip, fi.seg.last_active_segid, sid
            )
        self._maybe_write_cdef_idx(x, y, skip)
        self.blocks.set_rect("bsize", x, y, bsize, int(bsize))
        self.blocks.set_rect("tx_size", x, y, bsize, int(tx_size))
        self.blocks.set_rect("is_inter_flag", x, y, bsize, False)
        self.blocks.set_rect("ref_frames", x, y, bsize, 0)

        if in_inter_frame:
            self.cw.write_is_inter(self.w, x, y, False)
            self.cw.write_intra_mode(self.w, bsize, luma_mode)
        elif fi.frame_type == FrameType.KEY:
            self.cw.write_intra_mode_kf(self.w, x, y, luma_mode)
        else:
            self.cw.write_intra_mode(self.w, bsize, luma_mode)
        # record mode AFTER kf context derivation uses neighbors
        self.blocks.set_rect("mode", x, y, bsize, int(luma_mode))

        angle_delta_y = angle_delta_override
        angle_delta_uv = 0
        if luma_mode.is_directional() and bsize >= BlockSize.BLOCK_8X8:
            self.cw.write_angle_delta(self.w, angle_delta_y, luma_mode)
        if do_chroma:
            self.cw.write_intra_uv_mode(self.w, chroma_mode, luma_mode, bsize)
            if chroma_mode.is_cfl():
                # joint sign + per-plane scale index (partition_unit.rs:92-134)
                au, av = cfl
                sign_u = 0 if au == 0 else (1 if au < 0 else 2)
                sign_v = 0 if av == 0 else (1 if av < 0 else 2)
                joint_sign = sign_u * 3 + sign_v - 1
                self.cw.write_cfl_alphas(
                    self.w, joint_sign,
                    abs(au) - 1 if au else 0, abs(av) - 1 if av else 0,
                )
            if chroma_mode.is_directional() and bsize >= BlockSize.BLOCK_8X8:
                self.cw.write_angle_delta(self.w, angle_delta_uv, chroma_mode)
            self.blocks.set_rect("uv_mode", x, y, bsize, int(chroma_mode))

        if fi.seq.enable_filter_intra and luma_mode == PredictionMode.DC_PRED and bsize.width <= 32 and bsize.height <= 32:
            self.cw.write_use_filter_intra(self.w, False, bsize)

        if fi.tx_mode_select:
            if bsize > BlockSize.BLOCK_4X4:
                self.cw.write_tx_size_intra(self.w, x, y, bsize, tx_size)
                self.bc.update_tx_size_context(x, y, bsize, tx_size, False)
            else:
                self.bc.update_tx_size_context(x, y, bsize, tx_size, False)
        else:
            self.bc.update_tx_size_context(x, y, bsize, tx_size, False)

        self._bump_stats(bsize, luma_mode, chroma_mode, skip)
        self.write_tx_blocks(x, y, bsize, luma_mode, chroma_mode, angle_delta_y, angle_delta_uv, skip, do_chroma, cfl, tx_size=tx_size)

    def _luma_tx_size(self, bsize: BlockSize) -> TxSize:
        return MAX_TXSIZE_RECT[int(bsize)]

    def _in_trial(self) -> bool:
        from rav1e_tpu.ec import WriterCounter

        return isinstance(self.w, WriterCounter)

    def _select_intra_mode_rd(self, x, y, bsize, in_inter_frame, pairs):
        """RD compare of (mode, angle_delta) candidates via trial coding."""
        from rav1e_tpu.ec import WriterCounter

        best, best_cost = None, None
        for m, d in pairs:
            snap = self._rdo_snapshot(x, y, bsize)
            w_sav = self.w
            self.w = WriterCounter()
            t0 = self.w.tell_frac()
            try:
                self.encode_block_intra(
                    x, y, bsize, in_inter_frame, luma_mode_override=m,
                    angle_delta_override=d,
                )
                bits = (self.w.tell_frac() - t0) / 8.0
            finally:
                self.w = w_sav
            sse = self._region_sse(x, y, bsize)
            self._rdo_restore(snap)
            cost = sse * self._dist_scale(x, y, bsize) + self._rdo_lambda * bits
            if best_cost is None or cost < best_cost:
                best, best_cost = (m, d), cost
        return best

    def _select_intra_tx_size(self, x, y, bsize, in_inter_frame):
        """Intra tx-size RD search: full-size vs one split level, trial-coded
        with rollback (counterpart of rdo_tx_size_type, rdo.rs:725)."""
        from rav1e_tpu.ec import WriterCounter

        max_tx = self._luma_tx_size(bsize)
        sub_tx = SUB_TX_SIZE_MAP[int(max_tx)]
        if sub_tx == max_tx:
            return max_tx
        best_tx, best_cost = None, None
        for cand in (max_tx, sub_tx):
            snap = self._rdo_snapshot(x, y, bsize)
            w_sav = self.w
            self.w = WriterCounter()
            t0 = self.w.tell_frac()
            try:
                self.encode_block_intra(x, y, bsize, in_inter_frame, tx_size_override=cand)
                bits = (self.w.tell_frac() - t0) / 8.0
            finally:
                self.w = w_sav
            sse = self._region_sse(x, y, bsize)
            self._rdo_restore(snap)
            cost = sse * self._dist_scale(x, y, bsize) + self._rdo_lambda * bits
            if best_cost is None or cost < best_cost:
                best_tx, best_cost = cand, cost
        return best_tx

    def _maybe_write_cdef_idx(self, x: int, y: int, skip: bool) -> None:
        """cdef_idx literal at the first non-skip block of the SB
        (spec 5.11.56 read_cdef; encoder.rs:3452-3457 splice point)."""
        if self.cdef_bits == 0 or skip or self._cdef_coded:
            return
        sb_x = (self.mi_x0 + x) // MIB_SIZE
        sb_y = (self.mi_y0 + y) // MIB_SIZE
        idx = int(self.cdef_idx_map[sb_y, sb_x])
        self.w.literal(self.cdef_bits, idx)
        self._cdef_coded = True

    def _block_qidx(self, x: int, y: int) -> int:
        """Segment-adjusted quantizer for the block at tile-mi (x, y)
        (SEG_LVL_ALT_Q, segmentation.rs)."""
        fi = self.fi
        if fi.seg is None:
            return fi.base_q_idx
        sid = int(fi.seg.seg_map[self.mi_y0 + y, self.mi_x0 + x])
        return fi.seg.qidx(fi.base_q_idx, sid)

    def _select_angle_delta(self, x, y, bsize, mode) -> int:
        """SATD pick of the directional angle delta on source edges
        (reference rdo angle-delta refinement)."""
        from rav1e_tpu.ops.dist import get_satd

        w_px = min(bsize.width, 32)
        h_px = min(bsize.height, 32)
        px, py = x << MI_SIZE_LOG2, y << MI_SIZE_LOG2
        src = self.src_views[0]
        rect_w, rect_h = self.plane_rect[0]
        if px >= rect_w or py >= rect_h:
            return 0
        block = src[py : py + h_px, px : px + w_px].astype(np.int32)
        base = 128 << (self.fi.bit_depth - 8)
        above = src[py - 1, px : px + 2 * w_px].astype(np.int32) if py > 0 else np.full(2 * w_px, base - 1, np.int32)
        left = src[py : py + 2 * h_px, px - 1].astype(np.int32) if px > 0 else np.full(2 * h_px, base + 1, np.int32)
        tl = int(src[py - 1, px - 1]) if px > 0 and py > 0 else base
        edge = IntraEdge(above=above, left=left, top_left=tl, have_above=py > 0, have_left=px > 0)
        best_d, best_c = 0, None
        for d in (-3, -2, -1, 0, 1, 2, 3):
            pred = predict_intra(mode, edge, w_px, h_px, self.fi.bit_depth, d)
            c = get_satd(block, pred) + (0 if d == 0 else 4)
            if best_c is None or c < best_c:
                best_d, best_c = d, c
        return best_d

    def select_cfl(self, x: int, y: int, bsize: BlockSize):
        """Search CfL alphas against the source (reference rdo_cfl_alpha,
        rdo.rs; recon-exact RDO arrives with the full RDO pass).

        Returns (alpha_u, alpha_v) in [-16, 16] or None when CfL doesn't pay.
        """
        from rav1e_tpu.ops.intra import luma_ac

        fi = self.fi
        fcw = min(((fi.mi_cols - (self.mi_x0 + x)) << MI_SIZE_LOG2), bsize.width)
        fch = min(((fi.mi_rows - (self.mi_y0 + y)) << MI_SIZE_LOG2), bsize.height)
        ac = luma_ac(
            self.src_views[0], x << MI_SIZE_LOG2, y << MI_SIZE_LOG2, bsize,
            self.xdec, self.ydec, self._luma_tx_size(bsize), fcw, fch,
        ).astype(np.int64)
        ac_var = int((ac * ac).sum())
        alphas = []
        gain = 0
        base_sse = 0
        for p in (1, 2):
            px = (x << MI_SIZE_LOG2) >> self.xdec
            py = (y << MI_SIZE_LOG2) >> self.ydec
            pw = bsize.width >> self.xdec
            ph = bsize.height >> self.ydec
            src = self.src_views[p][py : py + ph, px : px + pw].astype(np.int64)
            dc = int(round(src.mean()))
            d = src - dc
            # least-squares seed (alpha is Q3 over Q3 ac -> Q6 scale = 64),
            # then integer refine over {hat-1, hat, hat+1, 0}
            if ac_var == 0:
                alphas.append(0)
                base_sse += int((d * d).sum())
                continue
            hat = int(round(64.0 * float((d * ac).sum()) / ac_var))
            hat = max(-16, min(hat, 16))
            cand = np.unique(np.clip([0, hat - 1, hat, hat + 1], -16, 16))
            scaled = cand[:, None, None] * ac[None]
            q0 = np.where(
                scaled < 0, -((np.abs(scaled) + 32) >> 6), (np.abs(scaled) + 32) >> 6
            )
            sse = ((d[None] - q0) ** 2).sum(axis=(1, 2))
            bi = int(np.argmin(sse))
            zi = int(np.nonzero(cand == 0)[0][0])
            alphas.append(int(cand[bi]))
            gain += int(sse[zi]) - int(sse[bi])
            base_sse += int(sse[zi])
        if alphas == [0, 0]:
            return None
        # require a real gain to pay the alpha signaling cost
        if gain < 16 or gain * 64 < base_sse:
            return None
        return (alphas[0], alphas[1])

    # --- inter search / coding -------------------------------------------

    def _mv_finder(self):
        from rav1e_tpu.context.mv import MvFinder

        return MvFinder(self.blocks, self.fi.mi_cols, self.fi.mi_rows, self.mi_x0, self.mi_y0)

    def select_inter(self, x: int, y: int, bsize: BlockSize):
        """Motion search over the available single references (forward LAST,
        backward ALTREF when the pyramid provides one); returns
        (ref_type, ref_frame_obj, mv, stack, mode_ctx) or None when the
        intra proxy wins (reference me.rs + rdo.rs inter loop, redesigned as
        per-ref candidate evaluation)."""
        from rav1e_tpu.context.mv import ALTREF_FRAME, BWDREF_FRAME, LAST_FRAME

        fi = self.fi
        if bsize < BlockSize.BLOCK_8X8:
            # keep chroma MC offsets simple: sub-8x8 blocks stay intra
            return None
        if fi.device_maps is not None:
            # the device D+λR analysis already compared inter vs intra for
            # this block; skip the motion search when intra won
            cy = (self.mi_y0 + y) >> 1
            cx = (self.mi_x0 + x) >> 1
            if not bool(fi.device_maps.use_inter[cy, cx]):
                return None
        w_px, h_px = bsize.width, bsize.height
        px, py = x << MI_SIZE_LOG2, y << MI_SIZE_LOG2
        src = self.src_views[0]
        block = src[py : py + h_px, px : px + w_px].astype(np.int32)

        candidates = [(LAST_FRAME, fi.ref_frame)]
        if fi.ref_frame_bwd is not None:
            candidates.append((ALTREF_FRAME, fi.ref_frame_bwd))
        dm = fi.device_maps
        if fi.ref_frame_bwd2 is not None and (dm is None or dm.mv2 is not None):
            # far anchor as a third single-prediction ref (rdo.rs:1138-1155)
            candidates.append((BWDREF_FRAME, fi.ref_frame_bwd2))
        best = None  # (sad, ref_type, ref_obj, mv, stack, mode_ctx)
        per_ref = {}
        for ref_type, ref_obj in candidates:
            mvmap = None
            if dm is not None:
                mvmap = (
                    dm.mv0 if ref_type == LAST_FRAME
                    else (dm.mv1 if ref_type == ALTREF_FRAME else dm.mv2)
                )
            if mvmap is not None:
                r = self._me_candidates_one(
                    x, y, bsize, ref_type, ref_obj, block, px, py, mvmap
                )
            else:
                r = self._me_search_one(
                    x, y, bsize, ref_type, ref_obj, block, px, py
                )
            if r is not None:
                per_ref[ref_type] = r
                if best is None or r[0] < best[0]:
                    best = (r[0], ref_type, ref_obj, r[1], r[2], r[3])
        if best is None:
            return None
        best_sad = best[0]

        # compound (LAST, ALTREF) candidate: average of both best predictions
        # (reference_mode SELECT; rdo.rs inter loop compound arm)
        if (
            fi.ref_frame_bwd is not None
            and LAST_FRAME in per_ref
            and ALTREF_FRAME in per_ref
        ):
            from rav1e_tpu.ops.mc import mc_avg, mv_to_offsets, prep_8tap

            mv0 = per_ref[LAST_FRAME][1]
            mv1 = per_ref[ALTREF_FRAME][1]

            def prep_for(ref_obj, mv):
                plane = ref_obj.planes[0]
                pad = plane.cfg.pad
                ri, ci, rf, cf = mv_to_offsets(mv[0], mv[1], 0, 0)
                return prep_8tap(
                    plane.data,
                    pad + ((self.mi_x0 + x) << MI_SIZE_LOG2) + ci,
                    pad + ((self.mi_y0 + y) << MI_SIZE_LOG2) + ri,
                    w_px, h_px, cf, rf, 0, 0, fi.bit_depth,
                )

            def comp_sad_for(m0, m1):
                t0 = prep_for(fi.ref_frame, m0)
                t1 = prep_for(fi.ref_frame_bwd, m1)
                pred = mc_avg(t0, t1, fi.bit_depth)
                return int(np.abs(block - pred).sum())

            finder = self._mv_finder()
            stack_p, ctx_p = finder.find_mvrefs(
                x, y, (LAST_FRAME, ALTREF_FRAME), bsize, lambda r: 0
            )
            # candidates: the ME pair (pays a fullpel-MV rate proxy, it
            # codes two NEWMVs) vs the MV-stack pairs (NEAREST/NEAR pairs
            # code no MV) — reference rdo.rs compound mode loop
            comp_sad = comp_sad_for(mv0, mv1)
            pair_eff = comp_sad + (w_px + h_px) // 2
            pair_raw, pair_mvs = comp_sad, (mv0, mv1)
            for k in range(min(len(stack_p), 3)):
                m0 = (int(stack_p[k].this_mv[0]), int(stack_p[k].this_mv[1]))
                m1 = (int(stack_p[k].comp_mv[0]), int(stack_p[k].comp_mv[1]))
                s = comp_sad_for(m0, m1)
                if s < pair_eff:
                    pair_eff, pair_raw, pair_mvs = s, s, (m0, m1)
            if stack_p:
                # mixed pairs: one side pinned to the NEAREST pair, the
                # other from ME — codes one MVD (NEAREST_NEWMV /
                # NEW_NEARESTMV after the remap; rdo.rs:1304-1310)
                n0 = (int(stack_p[0].this_mv[0]), int(stack_p[0].this_mv[1]))
                n1 = (int(stack_p[0].comp_mv[0]), int(stack_p[0].comp_mv[1]))
                for m0, m1 in ((n0, mv1), (mv0, n1)):
                    s = comp_sad_for(m0, m1)
                    eff = s + (w_px + h_px) // 4
                    if eff < pair_eff:
                        pair_eff, pair_raw, pair_mvs = eff, s, (m0, m1)
            if pair_raw < best_sad:
                best = (
                    pair_raw, (LAST_FRAME, ALTREF_FRAME),
                    (fi.ref_frame, fi.ref_frame_bwd), pair_mvs, stack_p, ctx_p,
                )
                best_sad = pair_raw

        # compare against a cheap intra proxy (DC from source neighbors)
        base = 128 << (fi.bit_depth - 8)
        above = src[py - 1, px : px + w_px].astype(np.int64) if py > 0 else None
        left = src[py : py + h_px, px - 1].astype(np.int64) if px > 0 else None
        if above is not None and left is not None:
            dc = int((above.sum() + left.sum() + (w_px + h_px) // 2) // (w_px + h_px))
        elif above is not None:
            dc = int((above.sum() + w_px // 2) // w_px)
        elif left is not None:
            dc = int((left.sum() + h_px // 2) // h_px)
        else:
            dc = base
        intra_sad = int(np.abs(block - dc).sum())
        if intra_sad + w_px < best_sad:
            return None
        return best[1], best[2], best[3], best[4], best[5]

    def _me_candidates_one(self, x, y, bsize, ref_type, ref_obj, block,
                           px, py, mvmap):
        """Device-ME consumption: evaluate a small fixed candidate set —
        the device MV field cells this block covers (device/me.py pyramid +
        subpel output), the top-2 MV-stack entries, and the zero MV — by
        subpel SAD; no host search runs on the device path.  Candidate
        order and strict-< acceptance mirror native/tile_block.inc
        me_candidates_one exactly (bit-identical decisions)."""
        fi = self.fi
        w_px, h_px = bsize.width, bsize.height

        finder = self._mv_finder()
        stack, mode_ctx = finder.find_mvrefs(x, y, ref_type, bsize, lambda r: 0)

        apy = (self.mi_y0 + y) << MI_SIZE_LOG2
        apx = (self.mi_x0 + x) << MI_SIZE_LOG2
        nby, nbx = mvmap.shape[0], mvmap.shape[1]
        cands = []

        def add(mv):
            if mv not in cands:
                cands.append(mv)

        dev = []
        for cy in range(apy // 16, (apy + h_px - 1) // 16 + 1):
            for cx in range(apx // 16, (apx + w_px - 1) // 16 + 1):
                mv = mvmap[min(cy, nby - 1), min(cx, nbx - 1)]
                t = (int(mv[0]), int(mv[1]))
                if t not in dev:
                    dev.append(t)
        for t in dev[:6]:
            add(t)
        for c in stack[:2]:
            add((int(c.this_mv[0]), int(c.this_mv[1])))
        add((0, 0))

        ref_plane = ref_obj.planes[0]
        pad = ref_plane.cfg.pad
        ref = ref_plane.data
        ax = pad + apx
        ay = pad + apy
        max_off = pad - 8
        src = self.src_views[0]

        from rav1e_tpu.ops.mc import REGULAR, mv_to_offsets, put_8tap

        best_mv = best_sad = None
        for mv in cands:
            dy, dx = mv[0] >> 3, mv[1] >> 3
            if abs(dy) > max_off - 1 or abs(dx) > max_off - 1:
                continue
            row_int, col_int, row_frac, col_frac = mv_to_offsets(
                mv[0], mv[1], 0, 0
            )
            pred = put_8tap(
                ref, ax + col_int, ay + row_int, w_px, h_px,
                col_frac, row_frac, REGULAR, REGULAR, fi.bit_depth,
            )
            sad = int(np.abs(block - pred).sum())
            if best_sad is None or sad < best_sad:
                best_mv, best_sad = mv, sad
        if best_mv is None:
            return None
        return best_sad, best_mv, stack, mode_ctx

    def _me_search_one(self, x, y, bsize, ref_type, ref_obj, block, px, py):
        """Diamond + subpel search against one reference frame."""
        fi = self.fi
        w_px, h_px = bsize.width, bsize.height
        src = self.src_views[0]

        finder = self._mv_finder()
        stack, mode_ctx = finder.find_mvrefs(x, y, ref_type, bsize, lambda r: 0)

        ref_plane = ref_obj.planes[0]
        pad = ref_plane.cfg.pad
        ref = ref_plane.data
        ax = pad + ((self.mi_x0 + x) << MI_SIZE_LOG2)
        ay = pad + ((self.mi_y0 + y) << MI_SIZE_LOG2)
        max_off = pad - 8  # keep the 8-tap window inside the allocation

        def fullpel(mv):
            return ((mv[0] >> 3) << 3, (mv[1] >> 3) << 3)

        seeds = [(0, 0)] + [fullpel(c.this_mv) for c in stack[:2]]
        if fi.me_fields is not None and ref_type in fi.me_fields:
            # hierarchical-pyramid field seed (me.rs get_subset_predictors
            # coarse-level entry)
            mf = fi.me_fields[ref_type]
            fy = min(((self.mi_y0 + y) << MI_SIZE_LOG2) // 16, mf.shape[0] - 1)
            fx = min(((self.mi_x0 + x) << MI_SIZE_LOG2) // 16, mf.shape[1] - 1)
            seeds.append((int(mf[fy, fx, 0]) * 8, int(mf[fy, fx, 1]) * 8))
        if fi.prev_mvs is not None:
            # temporal predictor: co-located MV from the previous coded frame
            # (capability analog of FrameMEStats seeding, reference me.rs:38)
            pm = fi.prev_mvs[self.mi_y0 + y, self.mi_x0 + x]
            seeds.append(fullpel((int(pm[0]), int(pm[1]))))

        from rav1e_tpu import native as _native

        lib = _native.get_lib()
        if lib is not None:
            seeds_arr = np.ascontiguousarray(np.array(seeds, dtype=np.int32))
            out_mv = np.zeros(2, dtype=np.int32)
            search_fn = (
                lib.enc_me_search_satd
                if self.speed.motion.use_satd_subpel
                else lib.enc_me_search
            )
            best_sad = search_fn(
                ref.ctypes.data, ref.strides[0] // ref.itemsize,
                ref.shape[0], ref.shape[1], ref.itemsize, ax, ay,
                src.ctypes.data, src.strides[0] // src.itemsize,
                px, py, w_px, h_px, fi.bit_depth,
                seeds_arr.ctypes.data, len(seeds), max_off,
                out_mv.ctypes.data,
            )
            if best_sad < 0:
                return None
            return int(best_sad), (int(out_mv[0]), int(out_mv[1])), stack, mode_ctx

        def sad_at(mv):
            dy, dx = mv[0] >> 3, mv[1] >> 3
            if abs(dy) > max_off or abs(dx) > max_off:
                return None
            ry, rx = ay + dy, ax + dx
            if ry < 4 or rx < 4 or ry + h_px + 4 > ref.shape[0] or rx + w_px + 4 > ref.shape[1]:
                return None
            pred = ref[ry : ry + h_px, rx : rx + w_px].astype(np.int32)
            return int(np.abs(block - pred).sum())

        best_mv, best_sad = None, None
        for s in seeds:
            c = sad_at(s)
            if c is not None and (best_sad is None or c < best_sad):
                best_mv, best_sad = s, c
        if best_mv is None:
            return None

        for step_px in (8, 4, 2, 1):
            improved = True
            while improved:
                improved = False
                for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
                    cand = (best_mv[0] + dy * step_px * 8, best_mv[1] + dx * step_px * 8)
                    c = sad_at(cand)
                    if c is not None and c < best_sad:
                        best_mv, best_sad = cand, c
                        improved = True

        best_mv, best_sad = _me_fullpel_extra(
            sad_at, best_mv, best_sad,
            self.speed.motion.me_method, self.speed.motion.me_range,
        )

        from rav1e_tpu.ops.mc import REGULAR, mv_to_offsets, put_8tap

        def pred_subpel(mv2):
            dy, dx = mv2[0] >> 3, mv2[1] >> 3
            if abs(dy) > max_off - 1 or abs(dx) > max_off - 1:
                return None
            row_int, col_int, row_frac, col_frac = mv_to_offsets(mv2[0], mv2[1], 0, 0)
            return put_8tap(
                ref, ax + col_int, ay + row_int, w_px, h_px,
                col_frac, row_frac, REGULAR, REGULAR, fi.bit_depth,
            )

        def sad_subpel(mv2):
            pred = pred_subpel(mv2)
            if pred is None:
                return None
            return int(np.abs(block - pred).sum())

        for step in (4, 2):  # half-pel then quarter-pel (1/8 units)
            improved = True
            while improved:
                improved = False
                for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
                    cand = (best_mv[0] + dy * step, best_mv[1] + dx * step)
                    c = sad_subpel(cand)
                    if c is not None and c < best_sad:
                        best_mv, best_sad = cand, c
                        improved = True

        if self.speed.motion.use_satd_subpel:
            # second refinement pass under SATD (mirrors native
            # enc_me_search_satd: SAD search first, then re-score the best
            # and hill-climb half/quarter-pel with SATD)
            from rav1e_tpu.ops.dist import get_satd

            def satd_subpel(mv2):
                pred = pred_subpel(mv2)
                if pred is None:
                    return None
                return get_satd(block, pred)

            best_sad = satd_subpel(best_mv)
            if best_sad is None:
                return None  # matches native: best MV at the clamp edge
            for step in (4, 2):
                improved = True
                while improved:
                    improved = False
                    for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
                        cand = (best_mv[0] + dy * step, best_mv[1] + dx * step)
                        c = satd_subpel(cand)
                        if c is not None and c < best_sad:
                            best_mv, best_sad = cand, c
                            improved = True
        return best_sad, best_mv, stack, mode_ctx

    def encode_block_inter(
        self, x, y, bsize: BlockSize, ref_type, ref_obj, mv, stack, mode_ctx
    ) -> None:
        from rav1e_tpu.context.mv import fill_neighbours_ref_counts

        if isinstance(ref_type, tuple):
            self._encode_block_inter_compound(
                x, y, bsize, ref_type, ref_obj, mv, stack, mode_ctx
            )
            return

        fi = self.fi
        # choose inter mode by stack relationship (encoder.rs:2000-2080)
        near_idx = 0
        if stack and tuple(stack[0].this_mv) == mv:
            mode = PredictionMode.NEARESTMV
        else:
            for k in (1, 2, 3):
                if len(stack) > k and tuple(stack[k].this_mv) == mv:
                    mode = PredictionMode.NEAR0MV  # NEARMV, ref_mv_idx = k
                    near_idx = k
                    break
            else:
                if not stack and mv == (0, 0):
                    mode = PredictionMode.GLOBALMV
                else:
                    mode = PredictionMode.NEWMV

        max_tx = self._luma_tx_size(bsize)
        do_chroma = has_chroma(x, y, bsize, self.xdec, self.ydec, fi.seq.chroma_sampling)

        # device-style compute-first: MC + quantize everything, then decide
        # skip before any symbol is coded
        self.motion_compensate(x, y, bsize, mv, ref_obj)

        txfm_split = False
        sub_tx = SUB_TX_SIZE_MAP[int(max_tx)]
        if fi.tx_mode_select and sub_tx != max_tx and not self._in_trial():
            if self.speed.transform.enable_inter_tx_split:
                txfm_split = True
            elif self.speed.transform.rdo_tx_decision:
                if self._replaying():
                    txfm_split = self._pop_decision("txsp")
                else:
                    txfm_split = self._log_decision(
                        "txsp", self._select_inter_tx_split(x, y, bsize, max_tx, sub_tx)
                    )
        tx_size = sub_tx if txfm_split else max_tx
        tx_jobs = self._quantize_inter_blocks(x, y, bsize, tx_size, do_chroma)
        skip = all(job[7] == 0 for job in tx_jobs)
        if skip:
            # nothing coded: tx tree not signaled, contexts use the max size
            # (matches the decoder's inference for skip blocks)
            txfm_split = False
            tx_size = max_tx

        counts = fill_neighbours_ref_counts(self.blocks, x, y)
        self._bump_stats(bsize, mode, None, skip)
        self.blocks.set_rect("skip", x, y, bsize, skip)
        self.blocks.set_rect("bsize", x, y, bsize, int(bsize))
        self.blocks.set_rect("tx_size", x, y, bsize, int(tx_size))

        if fi.skip_mode_present and bsize.width >= 8 and bsize.height >= 8:
            self.cw.write_skip_mode(self.w, x, y, False)
        self.cw.write_skip(self.w, x, y, skip)
        seg_id = 0
        if fi.seg is not None:
            sid = int(fi.seg.seg_map[self.mi_y0 + y, self.mi_x0 + x])
            seg_id = self.cw.write_segmentation(
                self.w, x, y, bsize, skip, fi.seg.last_active_segid, sid
            )
        self._maybe_write_cdef_idx(x, y, skip)
        self.cw.write_is_inter(self.w, x, y, True)
        self.blocks.set_rect("is_inter_flag", x, y, bsize, True)
        if fi.ref_frame_bwd is not None:
            # reference_mode SELECT: signal single prediction
            self.cw.write_comp_mode(self.w, x, y, False)
        self.cw.write_ref_frames_single(self.w, x, y, ref_type, counts)
        self.cw.write_inter_mode(self.w, mode, mode_ctx)

        num_found = len(stack)
        if mode == PredictionMode.NEAR0MV:
            # DRL for NEARMV (encoder.rs:2048-2066)
            from rav1e_tpu.context.mv import REF_CAT_LEVEL

            for idx in (1, 2):
                if num_found > idx + 1:
                    drl = near_idx > idx
                    ctx = int(stack[idx].weight < REF_CAT_LEVEL) + int(
                        stack[idx + 1].weight < REF_CAT_LEVEL
                    )
                    self.cw.write_drl_mode(self.w, drl, ctx)
                    if not drl:
                        break
        if mode == PredictionMode.NEWMV:
            # DRL for NEWMV (encoder.rs:2004-2021); ref_mv_idx = 0
            from rav1e_tpu.context.mv import REF_CAT_LEVEL

            for idx in range(2):
                if num_found > idx + 1:
                    ctx = int(stack[idx].weight < REF_CAT_LEVEL) + int(
                        stack[idx + 1].weight < REF_CAT_LEVEL
                    )
                    self.cw.write_drl_mode(self.w, False, ctx)
                    break
            ref_mv = tuple(stack[0].this_mv) if num_found > 0 else (0, 0)
            self.cw.write_mv(self.w, mv, ref_mv, precision=1)

        # record block state
        self.blocks.set_rect("mode", x, y, bsize, int(mode))
        self.blocks.ref_frames[y : y + bsize.height_mi, x : x + bsize.width_mi, 0] = ref_type
        self.blocks.ref_frames[y : y + bsize.height_mi, x : x + bsize.width_mi, 1] = -1
        self.blocks.mv[y : y + bsize.height_mi, x : x + bsize.width_mi, 0, 0] = mv[0]
        self.blocks.mv[y : y + bsize.height_mi, x : x + bsize.width_mi, 0, 1] = mv[1]

        # tx size signaling (encode_block_post_cdef:2132-2167)
        if fi.tx_mode_select:
            if bsize > BlockSize.BLOCK_4X4 and not skip:
                self.cw.write_tx_size_inter(self.w, x, y, bsize, max_tx, txfm_split, 0, 0, 0)
            else:
                self.bc.update_tx_size_context(x, y, bsize, tx_size, skip)
        else:
            self.bc.update_tx_size_context(x, y, bsize, tx_size, skip)

        if skip:
            self.bc.reset_skip_context(
                x, y, bsize, self.xdec, self.ydec,
                fi.seq.chroma_sampling == ChromaSampling.Cs400, do_chroma,
            )
            return

        # residual coding + reconstruction from the precomputed quantization
        for (p, tx_x, tx_y, px, py, tsz, qcoeffs, eob) in tx_jobs:
            xd = 0 if p == 0 else self.xdec
            yd = 0 if p == 0 else self.ydec
            plane_bsize = bsize.chroma_block_size(xd, yd) if p else bsize
            fct_w = min(((fi.mi_cols - (self.mi_x0 + tx_x)) << MI_SIZE_LOG2) >> xd, tsz.width)
            fct_h = min(((fi.mi_rows - (self.mi_y0 + tx_y)) << MI_SIZE_LOG2) >> yd, tsz.height)
            self.cw.write_coeffs_lv_map(
                self.w, p, tx_x, tx_y, qcoeffs, eob, mode, tsz, TxType.DCT_DCT,
                plane_bsize, xd, yd, fi.use_reduced_tx_set, fct_w, fct_h,
            )
            if eob > 0:
                rec = self.rec_views[p]
                from rav1e_tpu.native import dequant_recon_native

                if not dequant_recon_native(
                    qcoeffs, self._block_qidx(x, y), tsz, TxType.DCT_DCT, fi.bit_depth,
                    rec, px, py, fi.dc_delta_q[p], fi.ac_delta_q[p],
                ):
                    pred = rec[py : py + tsz.height, px : px + tsz.width].astype(np.int32)
                    rcoeffs = dequantize(self._block_qidx(x, y), qcoeffs, tsz, fi.bit_depth,
                                         fi.dc_delta_q[p], fi.ac_delta_q[p])
                    recon = T.inverse_transform_add(
                        rcoeffs[None], pred[None], tsz, TxType.DCT_DCT, fi.bit_depth
                    )[0]
                    rec[py : py + tsz.height, px : px + tsz.width] = recon

    def _encode_block_inter_compound(
        self, x, y, bsize: BlockSize, ref_pair, ref_objs, mvs, stack, mode_ctx
    ) -> None:
        """Compound (LAST, ALTREF) block: averaged bidirectional prediction
        (reference write_ref_frames compound arm + write_compound_mode)."""
        from rav1e_tpu.context.mv import ALTREF_FRAME, LAST_FRAME, REF_CAT_LEVEL, fill_neighbours_ref_counts

        fi = self.fi
        mv0, mv1 = mvs
        near_idx = 0
        if stack and tuple(stack[0].this_mv) == mv0 and tuple(stack[0].comp_mv) == mv1:
            mode = PredictionMode.NEAREST_NEARESTMV
        else:
            for k in (1, 2):
                if (
                    len(stack) > k
                    and tuple(stack[k].this_mv) == mv0
                    and tuple(stack[k].comp_mv) == mv1
                ):
                    mode = PredictionMode.NEAR_NEAR0MV
                    near_idx = k
                    break
            else:
                # one-side matches against the NEAREST pair code a single
                # MVD (reference encoder.rs:3053-3067 compound remap)
                m0 = bool(stack) and tuple(stack[0].this_mv) == mv0
                m1 = bool(stack) and tuple(stack[0].comp_mv) == mv1
                if m0 and not m1:
                    mode = PredictionMode.NEAREST_NEWMV
                elif m1 and not m0:
                    mode = PredictionMode.NEW_NEARESTMV
                else:
                    mode = PredictionMode.NEW_NEWMV
        if (
            mode != PredictionMode.NEAREST_NEARESTMV
            and mv0 == (0, 0)
            and mv1 == (0, 0)
        ):
            # both-zero pairs code as GLOBAL_GLOBAL (encoder.rs:3069-3075)
            mode = PredictionMode.GLOBAL_GLOBALMV

        max_tx = self._luma_tx_size(bsize)
        do_chroma = has_chroma(x, y, bsize, self.xdec, self.ydec, fi.seq.chroma_sampling)

        self.motion_compensate_compound(x, y, bsize, mv0, mv1, ref_objs[0], ref_objs[1])

        txfm_split = False
        sub_tx = SUB_TX_SIZE_MAP[int(max_tx)]
        if fi.tx_mode_select and sub_tx != max_tx and not self._in_trial():
            if self.speed.transform.enable_inter_tx_split:
                txfm_split = True
            elif self.speed.transform.rdo_tx_decision:
                if self._replaying():
                    txfm_split = self._pop_decision("txsp")
                else:
                    txfm_split = self._log_decision(
                        "txsp", self._select_inter_tx_split(x, y, bsize, max_tx, sub_tx)
                    )
        tx_size = sub_tx if txfm_split else max_tx
        tx_jobs = self._quantize_inter_blocks(x, y, bsize, tx_size, do_chroma)
        skip = all(job[7] == 0 for job in tx_jobs)
        if skip:
            txfm_split = False
            tx_size = max_tx

        counts = fill_neighbours_ref_counts(self.blocks, x, y)
        self._bump_stats(bsize, mode, None, skip)
        self.blocks.set_rect("skip", x, y, bsize, skip)
        self.blocks.set_rect("bsize", x, y, bsize, int(bsize))
        self.blocks.set_rect("tx_size", x, y, bsize, int(tx_size))

        sm_allowed = (
            fi.skip_mode_present and bsize.width >= 8 and bsize.height >= 8
        )
        use_sm = (
            sm_allowed and mode == PredictionMode.NEAREST_NEARESTMV and skip
        )
        if sm_allowed:
            self.cw.write_skip_mode(self.w, x, y, use_sm)
        if not use_sm:
            self.cw.write_skip(self.w, x, y, skip)
        seg_id = 0
        if fi.seg is not None:
            sid = int(fi.seg.seg_map[self.mi_y0 + y, self.mi_x0 + x])
            seg_id = self.cw.write_segmentation(
                self.w, x, y, bsize, skip, fi.seg.last_active_segid, sid
            )
        self._maybe_write_cdef_idx(x, y, skip)
        self.blocks.set_rect("is_inter_flag", x, y, bsize, True)
        if not use_sm:
            self.cw.write_is_inter(self.w, x, y, True)
            self.cw.write_comp_mode(self.w, x, y, True)
            self.cw.write_ref_frames_compound(self.w, x, y, counts)
            self.cw.write_compound_mode(self.w, mode, mode_ctx)

        num_found = len(stack)
        if not use_sm and mode == PredictionMode.NEAR_NEAR0MV:
            # DRL selection of the NEAR pair (same scheme as single NEARMV)
            for idx in (1, 2):
                if num_found > idx + 1:
                    drl = near_idx > idx
                    ctx = int(stack[idx].weight < REF_CAT_LEVEL) + int(
                        stack[idx + 1].weight < REF_CAT_LEVEL
                    )
                    self.cw.write_drl_mode(self.w, drl, ctx)
                    if not drl:
                        break
        if not use_sm and mode == PredictionMode.NEW_NEWMV:
            for idx in range(2):
                if num_found > idx + 1:
                    ctx = int(stack[idx].weight < REF_CAT_LEVEL) + int(
                        stack[idx + 1].weight < REF_CAT_LEVEL
                    )
                    self.cw.write_drl_mode(self.w, False, ctx)
                    break
            ref0 = tuple(stack[0].this_mv) if num_found > 0 else (0, 0)
            ref1 = tuple(stack[0].comp_mv) if num_found > 0 else (0, 0)
            self.cw.write_mv(self.w, mv0, ref0, precision=1)
            self.cw.write_mv(self.w, mv1, ref1, precision=1)
        # NEAREST_NEW / NEW_NEAREST: no DRL (spec 5.11.24 reads drl only
        # for NEWMV/NEW_NEWMV or has_nearmv), one MVD vs stack[0]
        if not use_sm and mode == PredictionMode.NEAREST_NEWMV:
            self.cw.write_mv(
                self.w, mv1, tuple(stack[0].comp_mv), precision=1
            )
        if not use_sm and mode == PredictionMode.NEW_NEARESTMV:
            self.cw.write_mv(
                self.w, mv0, tuple(stack[0].this_mv), precision=1
            )

        # record block state (both refs)
        self.blocks.set_rect("mode", x, y, bsize, int(mode))
        self.blocks.ref_frames[y : y + bsize.height_mi, x : x + bsize.width_mi, 0] = LAST_FRAME
        self.blocks.ref_frames[y : y + bsize.height_mi, x : x + bsize.width_mi, 1] = ALTREF_FRAME
        self.blocks.mv[y : y + bsize.height_mi, x : x + bsize.width_mi, 0, 0] = mv0[0]
        self.blocks.mv[y : y + bsize.height_mi, x : x + bsize.width_mi, 0, 1] = mv0[1]
        self.blocks.mv[y : y + bsize.height_mi, x : x + bsize.width_mi, 1, 0] = mv1[0]
        self.blocks.mv[y : y + bsize.height_mi, x : x + bsize.width_mi, 1, 1] = mv1[1]

        if fi.tx_mode_select:
            if bsize > BlockSize.BLOCK_4X4 and not skip:
                self.cw.write_tx_size_inter(self.w, x, y, bsize, max_tx, txfm_split, 0, 0, 0)
            else:
                self.bc.update_tx_size_context(x, y, bsize, tx_size, skip)
        else:
            self.bc.update_tx_size_context(x, y, bsize, tx_size, skip)

        if skip:
            self.bc.reset_skip_context(
                x, y, bsize, self.xdec, self.ydec,
                fi.seq.chroma_sampling == ChromaSampling.Cs400, do_chroma,
            )
            return

        for (p, tx_x, tx_y, px, py, tsz, qcoeffs, eob) in tx_jobs:
            xd = 0 if p == 0 else self.xdec
            yd = 0 if p == 0 else self.ydec
            plane_bsize = bsize.chroma_block_size(xd, yd) if p else bsize
            fct_w = min(((fi.mi_cols - (self.mi_x0 + tx_x)) << MI_SIZE_LOG2) >> xd, tsz.width)
            fct_h = min(((fi.mi_rows - (self.mi_y0 + tx_y)) << MI_SIZE_LOG2) >> yd, tsz.height)
            self.cw.write_coeffs_lv_map(
                self.w, p, tx_x, tx_y, qcoeffs, eob, mode, tsz, TxType.DCT_DCT,
                plane_bsize, xd, yd, fi.use_reduced_tx_set, fct_w, fct_h,
            )
            if eob > 0:
                rec = self.rec_views[p]
                from rav1e_tpu.native import dequant_recon_native

                if not dequant_recon_native(
                    qcoeffs, self._block_qidx(x, y), tsz, TxType.DCT_DCT, fi.bit_depth,
                    rec, px, py, fi.dc_delta_q[p], fi.ac_delta_q[p],
                ):
                    pred = rec[py : py + tsz.height, px : px + tsz.width].astype(np.int32)
                    rcoeffs = dequantize(self._block_qidx(x, y), qcoeffs, tsz, fi.bit_depth,
                                         fi.dc_delta_q[p], fi.ac_delta_q[p])
                    recon = T.inverse_transform_add(
                        rcoeffs[None], pred[None], tsz, TxType.DCT_DCT, fi.bit_depth
                    )[0]
                    rec[py : py + tsz.height, px : px + tsz.width] = recon

    def motion_compensate_compound(self, x, y, bsize, mv0, mv1, ref0, ref1) -> None:
        """Bidirectional averaged prediction into the recon
        (prep_8tap + mc_avg; mc.rs:360-480)."""
        from rav1e_tpu.ops.mc import mc_avg, mv_to_offsets, prep_8tap

        fi = self.fi
        do_chroma = has_chroma(x, y, bsize, self.xdec, self.ydec, fi.seq.chroma_sampling)
        nplanes = 3 if (do_chroma and fi.seq.chroma_sampling != ChromaSampling.Cs400) else 1
        for p in range(nplanes):
            xd = 0 if p == 0 else self.xdec
            yd = 0 if p == 0 else self.ydec
            w_px = max(bsize.width >> xd, 4)
            h_px = max(bsize.height >> yd, 4)
            px = ((self.mi_x0 + x) << MI_SIZE_LOG2) >> xd
            py = ((self.mi_y0 + y) << MI_SIZE_LOG2) >> yd
            tmps = []
            for ref_obj, mv in ((ref0, mv0), (ref1, mv1)):
                plane = ref_obj.planes[p]
                pad = plane.cfg.pad
                ri, ci, rf, cf = mv_to_offsets(mv[0], mv[1], xd, yd)
                tmps.append(prep_8tap(
                    plane.data, pad + px + ci, pad + py + ri, w_px, h_px,
                    cf, rf, 0, 0, fi.bit_depth,
                ))
            pred = mc_avg(tmps[0], tmps[1], fi.bit_depth)
            tx_rel = px - (((self.mi_x0) << MI_SIZE_LOG2) >> xd)
            ty_rel = py - (((self.mi_y0) << MI_SIZE_LOG2) >> yd)
            self.rec_views[p][ty_rel : ty_rel + h_px, tx_rel : tx_rel + w_px] = pred

    def _select_inter_tx_split(self, x, y, bsize, max_tx, sub_tx) -> bool:
        """Inter tx split decision: luma rate/distortion compare of the
        whole-block tx vs one split level (rdo_tx_size_type, rdo.rs:725)."""
        fi = self.fi
        q_idx = self._block_qidx(x, y)
        best = None
        for tsz in (max_tx, sub_tx):
            qc = QuantizationContext()
            qc.update(q_idx, tsz, False, fi.bit_depth,
                      fi.dc_delta_q[0], fi.ac_delta_q[0])
            bw = max(bsize.width_mi // max(tsz.width >> MI_SIZE_LOG2, 1), 1)
            bh = max(bsize.height_mi // max(tsz.height >> MI_SIZE_LOG2, 1), 1)
            sse = 0
            rate = 0.0
            for by in range(bh):
                for bx in range(bw):
                    tx_x = x + bx * (tsz.width >> MI_SIZE_LOG2)
                    tx_y = y + by * (tsz.height >> MI_SIZE_LOG2)
                    if tx_x >= self.mi_w or tx_y >= self.mi_h:
                        continue
                    px = tx_x << MI_SIZE_LOG2
                    py = tx_y << MI_SIZE_LOG2
                    pred = self.rec_views[0][py : py + tsz.height, px : px + tsz.width].astype(np.int32)
                    src = self.src_views[0][py : py + tsz.height, px : px + tsz.width].astype(np.int32)
                    residual = src - pred
                    coeffs = T.forward_transform(residual[None], tsz, TxType.DCT_DCT, fi.bit_depth)[0]
                    qcoeffs, eob = qc.quantize_block(coeffs, tsz, TxType.DCT_DCT)
                    rate += 6.0 + 2.0 * float(np.abs(np.asarray(qcoeffs)).sum())
                    if eob > 0:
                        rcoeffs = dequantize(q_idx, qcoeffs, tsz, fi.bit_depth,
                                             fi.dc_delta_q[0], fi.ac_delta_q[0])
                        recon = T.inverse_transform_add(
                            rcoeffs[None], pred[None], tsz, TxType.DCT_DCT, fi.bit_depth
                        )[0]
                    else:
                        recon = pred
                    d = (src.astype(np.int64) - recon) ** 2
                    sse += int(d.sum())
            cost = sse + self._rdo_lambda * rate
            if best is None or cost < best[0]:
                best = (cost, tsz)
        return best[1] == sub_tx

    def _quantize_inter_blocks(self, x, y, bsize: BlockSize, tx_size: TxSize, do_chroma):
        """Forward-transform + quantize every tx block of an inter block
        (batchable device work). Returns job tuples for the symbol pass."""
        fi = self.fi
        jobs = []
        q_idx = self._block_qidx(x, y)
        self.qc.update(q_idx, tx_size, False, fi.bit_depth,
                       fi.dc_delta_q[0], fi.ac_delta_q[0])
        bw = max(bsize.width_mi // max(tx_size.width >> MI_SIZE_LOG2, 1), 1)
        bh = max(bsize.height_mi // max(tx_size.height >> MI_SIZE_LOG2, 1), 1)
        plane_specs = [(0, tx_size, bw, bh)]
        if do_chroma and fi.seq.chroma_sampling != ChromaSampling.Cs400:
            uv_tx_size = largest_chroma_tx_size(bsize, self.xdec, self.ydec)
            bw_uv = max(
                max((bw * (tx_size.width >> MI_SIZE_LOG2)) >> self.xdec, 1)
                // max(uv_tx_size.width >> MI_SIZE_LOG2, 1), 1,
            )
            bh_uv = max(
                max((bh * (tx_size.height >> MI_SIZE_LOG2)) >> self.ydec, 1)
                // max(uv_tx_size.height >> MI_SIZE_LOG2, 1), 1,
            )
            plane_specs += [(1, uv_tx_size, bw_uv, bh_uv), (2, uv_tx_size, bw_uv, bh_uv)]
        for p, tsz, nbx, nby in plane_specs:
            xd = 0 if p == 0 else self.xdec
            yd = 0 if p == 0 else self.ydec
            if p != 0:
                self.qc_uv.update(q_idx, tsz, False, fi.bit_depth,
                                  fi.dc_delta_q[p], fi.ac_delta_q[p])
            qc = self.qc if p == 0 else self.qc_uv
            rec = self.rec_views[p]
            src = self.src_views[p]
            spots = []
            residuals = []
            for by in range(nby):
                for bx in range(nbx):
                    if p == 0:
                        tx_x = x + bx * (tsz.width >> MI_SIZE_LOG2)
                        tx_y = y + by * (tsz.height >> MI_SIZE_LOG2)
                        px = tx_x << MI_SIZE_LOG2
                        py = tx_y << MI_SIZE_LOG2
                    else:
                        tx_x = x + ((bx * (tsz.width >> MI_SIZE_LOG2)) << self.xdec)
                        tx_y = y + ((by * (tsz.height >> MI_SIZE_LOG2)) << self.ydec)
                        px = ((x << MI_SIZE_LOG2) >> xd) + bx * tsz.width
                        py = ((y << MI_SIZE_LOG2) >> yd) + by * tsz.height
                    if tx_x >= self.mi_w or tx_y >= self.mi_h:
                        continue
                    residuals.append(
                        src[py : py + tsz.height, px : px + tsz.width].astype(np.int32)
                        - rec[py : py + tsz.height, px : px + tsz.width]
                    )
                    spots.append((tx_x, tx_y, px, py))
            if not spots:
                continue
            from rav1e_tpu.native import fwd_quant_native

            used_native = False
            if fwd_quant_native is not None:
                fq0 = fwd_quant_native(
                    src, rec, spots[0][2], spots[0][3], tsz, TxType.DCT_DCT,
                    qc, fi.bit_depth,
                )
                if fq0 is not None:
                    used_native = True
                    jobs.append((p, *spots[0][:2], spots[0][2], spots[0][3], tsz, *fq0))
                    for (tx_x, tx_y, px, py) in spots[1:]:
                        qcoeffs, eob = fwd_quant_native(
                            src, rec, px, py, tsz, TxType.DCT_DCT, qc, fi.bit_depth
                        )
                        jobs.append((p, tx_x, tx_y, px, py, tsz, qcoeffs, eob))
            if not used_native:
                # batched forward transform over all tx blocks of the plane
                # (one GEMM batch — the MXU-shaped form)
                coeffs_all = T.forward_transform(
                    np.stack(residuals), tsz, TxType.DCT_DCT, fi.bit_depth
                )
                for (tx_x, tx_y, px, py), coeffs in zip(spots, coeffs_all):
                    qcoeffs, eob = qc.quantize_block(coeffs, tsz, TxType.DCT_DCT)
                    jobs.append((p, tx_x, tx_y, px, py, tsz, qcoeffs, eob))
        return jobs

    def motion_compensate(self, x: int, y: int, bsize: BlockSize, mv, ref_obj=None) -> None:
        from rav1e_tpu.ops.mc import REGULAR, mv_to_offsets, put_8tap

        fi = self.fi
        if ref_obj is None:
            ref_obj = fi.ref_frame
        do_chroma = has_chroma(x, y, bsize, self.xdec, self.ydec, fi.seq.chroma_sampling)
        nplanes = 3 if (do_chroma and fi.seq.chroma_sampling != ChromaSampling.Cs400) else 1
        for p in range(nplanes):
            xd = 0 if p == 0 else self.xdec
            yd = 0 if p == 0 else self.ydec
            ref_plane = ref_obj.planes[p]
            pad = ref_plane.cfg.pad
            # chroma of small blocks covers the whole (possibly larger) area
            w_px = max(bsize.width >> xd, 4)
            h_px = max(bsize.height >> yd, 4)
            px = ((self.mi_x0 + x) << MI_SIZE_LOG2) >> xd
            py = ((self.mi_y0 + y) << MI_SIZE_LOG2) >> yd
            row_int, col_int, row_frac, col_frac = mv_to_offsets(mv[0], mv[1], xd, yd)
            pred = put_8tap(
                ref_plane.data, pad + px + col_int, pad + py + row_int,
                w_px, h_px, col_frac, row_frac, REGULAR, REGULAR, fi.bit_depth,
            )
            # tile-relative recon view
            tx_rel = px - (((self.mi_x0) << MI_SIZE_LOG2) >> xd)
            ty_rel = py - (((self.mi_y0) << MI_SIZE_LOG2) >> yd)
            self.rec_views[p][ty_rel : ty_rel + h_px, tx_rel : tx_rel + w_px] = pred

    def select_luma_mode(self, x: int, y: int, bsize: BlockSize) -> list:
        """Batched SATD-style mode pre-selection over candidate intra modes.

        Scores each candidate with the SAME prediction the coder will emit:
        normative edges via build_intra_edge (availability clamps + the
        mode/size-dependent edge smoothing filter) and the intra-edge-filter
        params, ranked by SATD.  Scoring on raw recon rows without the
        normative edge filter misranked directional modes badly — the real
        (filtered) predictions had ~2x the SSE of DC on textured content
        while the raw-edge SAD claimed they were better, inverting the RD
        curve of the host tier (keyframes 3.3x larger at -1.5 dB vs plain
        DC).  Reference counterpart: intra_frame_rdo_mode_decision scores
        real predictions too (rdo.rs:963 via predict_intra on the recon).
        """
        from rav1e_tpu.ops.dist import get_satd

        w_px = min(bsize.width, 32)
        h_px = min(bsize.height, 32)
        px, py = x << MI_SIZE_LOG2, y << MI_SIZE_LOG2
        src = self.src_views[0]
        rec = self.rec_views[0]
        rect_w, rect_h = self.plane_rect[0]
        if px >= rect_w or py >= rect_h:
            return [PredictionMode.DC_PRED]
        block = src[py : py + h_px, px : px + w_px].astype(np.int32)
        tx_size = self._luma_tx_size(bsize)
        while tx_size.width > 32 or tx_size.height > 32:
            tx_size = SUB_TX_SIZE_MAP[int(tx_size)]
        from rav1e_tpu.config import PredictionModesSetting

        if self.speed.prediction.prediction_modes >= PredictionModesSetting.ComplexKeyframes:
            candidates = [PredictionMode(m) for m in range(13)]
        else:
            candidates = [
                PredictionMode.DC_PRED,
                PredictionMode.V_PRED,
                PredictionMode.H_PRED,
                PredictionMode.PAETH_PRED,
                PredictionMode.SMOOTH_PRED,
            ]
        ief = (
            build_ief_params(self.blocks, x, y, 0, 0, 0)
            if self.fi.seq.enable_intra_edge_filter
            else None
        )
        scored = []
        for m in candidates:
            edge = build_intra_edge(
                rec, rect_w, rect_h, px, py, tx_size, x, y, 0, 0,
                bsize, 0, 0, self.fi.bit_depth, m,
            )
            pred = predict_intra(
                m, edge, w_px, h_px, self.fi.bit_depth,
                ief_params=ief if m.is_directional() else None,
            )
            cost = get_satd(block, np.asarray(pred, dtype=np.int32))
            # approximate mode-rate bias in SATD units (sqrt-lambda scaling,
            # the reference's SATD-domain rate weighting; me.rs lambda_sqrt):
            # DC is cheapest to code, V/H next, the rest cost a symbol more,
            # and directional modes also pay the angle_delta symbol
            if m == PredictionMode.DC_PRED:
                mode_bits = 1.0
            elif m in (PredictionMode.V_PRED, PredictionMode.H_PRED):
                mode_bits = 2.5
            else:
                mode_bits = 4.0
            if m.is_directional() and bsize >= BlockSize.BLOCK_8X8:
                mode_bits += 1.5
            cost += int(self._rdo_lambda ** 0.5 * 2.0 * mode_bits)
            scored.append((cost, int(m)))
        scored.sort()
        return [PredictionMode(m) for _, m in scored]

    # --- transform blocks -------------------------------------------------

    def write_tx_blocks(
        self,
        x: int,
        y: int,
        bsize: BlockSize,
        luma_mode: PredictionMode,
        chroma_mode: PredictionMode,
        angle_delta_y: int,
        angle_delta_uv: int,
        skip: bool,
        do_chroma: bool,
        cfl=None,
        tx_size=None,
    ) -> None:
        fi = self.fi
        if tx_size is None:
            tx_size = self._luma_tx_size(bsize)
        bw = max(bsize.width_mi // max(tx_size.width >> MI_SIZE_LOG2, 1), 1)
        bh = max(bsize.height_mi // max(tx_size.height >> MI_SIZE_LOG2, 1), 1)
        q_idx = self._block_qidx(x, y)
        self.qc.update(q_idx, tx_size, True, fi.bit_depth,
                       fi.dc_delta_q[0], fi.ac_delta_q[0])

        tx_type = TxType.DCT_DCT

        for by in range(bh):
            for bx in range(bw):
                tx_x = x + bx * (tx_size.width >> MI_SIZE_LOG2)
                tx_y = y + by * (tx_size.height >> MI_SIZE_LOG2)
                if tx_x >= self.mi_w or tx_y >= self.mi_h:
                    continue
                self.encode_tx_block(
                    0, x, y, bx, by, tx_x, tx_y, luma_mode, tx_size, tx_type,
                    bsize, skip, angle_delta_y,
                )

        if not do_chroma or fi.seq.chroma_sampling == ChromaSampling.Cs400:
            return
        uv_tx_size = largest_chroma_tx_size(bsize, self.xdec, self.ydec)
        bw_uv = max((bw * (tx_size.width >> MI_SIZE_LOG2)) >> self.xdec, 1) // max(
            uv_tx_size.width >> MI_SIZE_LOG2, 1
        )
        bh_uv = max((bh * (tx_size.height >> MI_SIZE_LOG2)) >> self.ydec, 1) // max(
            uv_tx_size.height >> MI_SIZE_LOG2, 1
        )
        bw_uv = max(bw_uv, 1)
        bh_uv = max(bh_uv, 1)
        if uv_tx_size.width >= 32 or uv_tx_size.height >= 32:
            uv_tx_type = TxType.DCT_DCT
        else:
            uv_tx_type = uv_intra_mode_to_tx_type_context(chroma_mode)
        ac = None
        if chroma_mode.is_cfl() and cfl is not None:
            # AC from the *reconstructed* luma just coded above (predict.rs:644)
            from rav1e_tpu.ops.intra import luma_ac

            fcw = min(((fi.mi_cols - (self.mi_x0 + x)) << MI_SIZE_LOG2), bsize.width)
            fch = min(((fi.mi_rows - (self.mi_y0 + y)) << MI_SIZE_LOG2), bsize.height)
            ac = luma_ac(
                self.rec_views[0], x << MI_SIZE_LOG2, y << MI_SIZE_LOG2, bsize,
                self.xdec, self.ydec, tx_size, fcw, fch,
            )
        for p in (1, 2):
            self.qc_uv.update(q_idx, uv_tx_size, True, fi.bit_depth,
                              fi.dc_delta_q[p], fi.ac_delta_q[p])
            alpha = 0 if cfl is None else cfl[p - 1]
            for by in range(bh_uv):
                for bx in range(bw_uv):
                    tx_x = x + ((bx * (uv_tx_size.width >> MI_SIZE_LOG2)) << self.xdec) - (
                        int(bw * (tx_size.width >> MI_SIZE_LOG2) == 1) * self.xdec
                    )
                    tx_y = y + ((by * (uv_tx_size.height >> MI_SIZE_LOG2)) << self.ydec) - (
                        int(bh * (tx_size.height >> MI_SIZE_LOG2) == 1) * self.ydec
                    )
                    ac_slice = None
                    if ac is not None:
                        ac_slice = ac[
                            by * uv_tx_size.height : (by + 1) * uv_tx_size.height,
                            bx * uv_tx_size.width : (bx + 1) * uv_tx_size.width,
                        ]
                    self.encode_tx_block(
                        p, x, y, bx, by, tx_x, tx_y, chroma_mode, uv_tx_size,
                        uv_tx_type, bsize, skip, angle_delta_uv,
                        alpha=alpha, ac=ac_slice,
                    )

    def encode_tx_block(
        self,
        p: int,
        part_x: int,
        part_y: int,
        bx: int,
        by: int,
        tx_x: int,
        tx_y: int,
        mode: PredictionMode,
        tx_size: TxSize,
        tx_type: TxType,
        bsize: BlockSize,
        skip: bool,
        angle_delta: int,
        alpha: int = 0,
        ac: Optional[np.ndarray] = None,
    ) -> bool:
        fi = self.fi
        xd = 0 if p == 0 else self.xdec
        yd = 0 if p == 0 else self.ydec
        if tx_x >= self.mi_w or tx_y >= self.mi_h:
            return False
        w_px, h_px = tx_size.width, tx_size.height
        # plane-space position of the tx block within the tile
        if p == 0:
            px = tx_x << MI_SIZE_LOG2
            py = tx_y << MI_SIZE_LOG2
        else:
            px = ((part_x << MI_SIZE_LOG2) >> xd) + bx * w_px
            py = ((part_y << MI_SIZE_LOG2) >> yd) + by * h_px
        rec = self.rec_views[p]
        src = self.src_views[p]
        rect_w, rect_h = self.plane_rect[p]

        plane_bsize = bsize.chroma_block_size(xd, yd) if p else bsize

        # prediction (from recon, normative edges)
        edge = build_intra_edge(
            rec, rect_w, rect_h, px, py, tx_size, part_x, part_y, bx, by,
            bsize, xd, yd, fi.bit_depth, mode, angle_delta,
        )
        ief = None
        if mode.is_directional() and fi.seq.enable_intra_edge_filter:
            ief = build_ief_params(self.blocks, part_x, part_y, p, xd, yd)
        pred = predict_intra(
            mode, edge, w_px, h_px, fi.bit_depth, angle_delta,
            alpha=alpha, ac=ac, ief_params=ief,
        )
        rec[py : py + h_px, px : px + w_px] = pred

        if skip:
            return False

        residual = (
            src[py : py + h_px, px : px + w_px].astype(np.int32) - pred
        )
        qc = self.qc if p == 0 else self.qc_uv

        # tx-type RD choice for luma intra at quality speeds
        # (rdo_tx_type_decision, rdo.rs:1701): DCT vs the mode-preferred type
        rd_tx_type = (
            p == 0
            and self.speed.transform.rdo_tx_decision
            and w_px <= 32
            and h_px <= 32
            and mode.is_intra()
        )
        if rd_tx_type and self._replaying():
            tx_type = self._pop_decision("txt")
            rd_tx_type = False
        if rd_tx_type:
            from rav1e_tpu.tx import TX_SET_MEMBERS, get_tx_set, valid_av1_transform

            pref = uv_intra_mode_to_tx_type_context(mode)
            tx_set = get_tx_set(tx_size, False, fi.use_reduced_tx_set)
            if self.speed.transform.full_tx_type_search:
                # full TxSet trial (reference rdo_tx_type_decision,
                # rdo.rs:1701): every codable member of the allowed set
                cands = [
                    tt for tt in TX_SET_MEMBERS.get(tx_set, (TxType.DCT_DCT,))
                    if valid_av1_transform(tx_size, tt)
                ] or [TxType.DCT_DCT]
            else:
                cands = [TxType.DCT_DCT]
                if pref != TxType.DCT_DCT and pref in TX_SET_MEMBERS.get(tx_set, ()):
                    cands.append(pref)
            from rav1e_tpu.native import dequant_recon_native, fwd_quant_native

            best = None
            src_blk = src[py : py + h_px, px : px + w_px].astype(np.int64)
            scratch = np.empty((h_px, w_px), dtype=rec.dtype)
            for tt in cands:
                fq = fwd_quant_native(src, rec, px, py, tx_size, tt, qc,
                                      fi.bit_depth)
                if fq is not None:
                    q, e = fq
                else:
                    c = T.forward_transform(residual[None], tx_size, tt, fi.bit_depth)[0]
                    q, e = qc.quantize_block(c, tx_size, tt)
                if e > 0:
                    # recon into a scratch block so `rec` keeps the
                    # prediction for the remaining candidates
                    scratch[:] = pred
                    if dequant_recon_native(
                        q, self._block_qidx(part_x, part_y), tx_size, tt,
                        fi.bit_depth, scratch, 0, 0,
                        fi.dc_delta_q[0], fi.ac_delta_q[0],
                    ):
                        rec_c = scratch
                    else:
                        rc = dequantize(self._block_qidx(part_x, part_y), q, tx_size, fi.bit_depth,
                                        fi.dc_delta_q[0], fi.ac_delta_q[0])
                        rec_c = T.inverse_transform_add(
                            rc[None], pred[None], tx_size, tt, fi.bit_depth
                        )[0]
                else:
                    rec_c = pred
                sse = int(((src_blk - rec_c) ** 2).sum())
                rate = 8.0 + 2.0 * float(np.abs(np.asarray(q)).sum())
                cost = sse + self._rdo_lambda * rate
                if best is None or cost < best[0]:
                    best = (cost, tt, q, e)
            tx_type, qcoeffs, eob = best[1], best[2], best[3]
            self._log_decision("txt", tx_type)
        else:
            from rav1e_tpu.native import fwd_quant_native

            fq = fwd_quant_native(src, rec, px, py, tx_size, tx_type, qc, fi.bit_depth)
            if fq is not None:
                qcoeffs, eob = fq
            else:
                coeffs = T.forward_transform(residual[None], tx_size, tx_type, fi.bit_depth)[0]
                qcoeffs, eob = qc.quantize_block(coeffs, tx_size, tx_type)

        frame_clipped_txw = min(((fi.mi_cols - (self.mi_x0 + tx_x)) << MI_SIZE_LOG2) >> xd, w_px)
        frame_clipped_txh = min(((fi.mi_rows - (self.mi_y0 + tx_y)) << MI_SIZE_LOG2) >> yd, h_px)

        has_coeff = self.cw.write_coeffs_lv_map(
            self.w, p, tx_x, tx_y, qcoeffs, eob, mode, tx_size, tx_type,
            plane_bsize, xd, yd, fi.use_reduced_tx_set,
            frame_clipped_txw, frame_clipped_txh,
        )

        if eob > 0:
            from rav1e_tpu.native import dequant_recon_native

            if not dequant_recon_native(
                qcoeffs, self._block_qidx(part_x, part_y), tx_size, tx_type,
                fi.bit_depth, rec, px, py, fi.dc_delta_q[p], fi.ac_delta_q[p],
            ):
                rcoeffs = dequantize(self._block_qidx(part_x, part_y), qcoeffs, tx_size,
                                     fi.bit_depth, fi.dc_delta_q[p], fi.ac_delta_q[p])
                recon = T.inverse_transform_add(
                    rcoeffs[None], pred[None], tx_size, tx_type, fi.bit_depth
                )[0]
                rec[py : py + h_px, px : px + w_px] = recon
        return has_coeff


class FramePipeline:
    """Owns sequence state and encodes frames to packets."""

    def __init__(self, config):
        self.config = config
        enc = config.enc
        self.seq = Sequence.from_config(enc)
        cols_log2 = (enc.tile_cols.bit_length() - 1) if enc.tile_cols else 0
        rows_log2 = (enc.tile_rows.bit_length() - 1) if enc.tile_rows else 0
        if enc.tiles and not (enc.tile_cols or enc.tile_rows):
            # target tile count -> cols-first split (tiler.rs:56-155)
            t_log2 = (max(enc.tiles, 1) - 1).bit_length()
            cols_log2 = (t_log2 + 1) // 2
            rows_log2 = t_log2 // 2
        self.tiling = TilingInfo.from_target_tiles(
            6, enc.width, enc.height, enc.frame_rate(),
            cols_log2, rows_log2,
            enc.chroma_sampling == ChromaSampling.Cs422,
        )
        self.seq.tiling = self.tiling
        self.frames_encoded = 0
        self.rec_frame: Optional[Frame] = None
        # reference slot buffer (reference: ReferenceFramesSet, encoder.rs:340)
        self.rec_buffer: list = [None] * 8
        # per-slot SOURCE luma (estimation refs for ME fields + device
        # analysis, like the reference's lookahead ME stats on sources)
        self.src_buffer: list = [None] * 8
        # async device-analyses dispatched for upcoming planned frames:
        # input_frameno -> pending entry (handle + fetch thread).  Depth >1
        # keeps the tunneled-TPU round-trip fully hidden behind host coding.
        self._pending_analyses: dict = {}
        # input_frameno -> device-resident padded source luma: each frame
        # crosses the host->device wire once, then serves as the analysis
        # subject AND as the reference plane of up to 3 future analyses
        # (insertion-ordered; oldest evicted)
        self._dev_luma_cache: dict = {}
        # input_frameno of the source occupying each reference slot (for
        # validating prefetched analyses against the slots' actual content)
        self.slot_src_frameno: list = [None] * 8
        self._fallback_slot = 0
        self.prev_mvs = None  # last coded frame's MV field (ME stats analog)
        self.cdf_buffer: list = [None] * 8  # per-slot end-of-frame CDF states
        self.slot_order_hints = [0] * 8
        from rav1e_tpu.rc import RCState

        self._rc_retry = False
        # device-chain state: per-slot padded device recon planes (None ->
        # lazy upload from rec_buffer), last dispatch's output refs pending
        # slot commit, and a reusable dummy rec for the replay coder
        self._chain_slots: list = [None] * 8
        self._chain_pending_refs = None
        self._chain_dummy_rec = None
        # chain dispatched one frame early (validated at consumption):
        self._pending_chain = None
        self.rc = RCState(
            bit_depth=enc.bit_depth,
            quantizer=enc.quantizer,
            bitrate=enc.bitrate,
            framerate=enc.frame_rate(),
            reservoir_frame_delay=enc.reservoir_frame_delay,
            min_quantizer=enc.min_quantizer,
            max_key_frame_interval=enc.max_key_frame_interval,
        )

    def _ref_src_luma(self, slot):
        """Source luma of the frame occupying a reference slot (falls back to
        the reconstruction when the source is gone, e.g. after resume)."""
        s = self.src_buffer[slot]
        if s is not None:
            return s
        r = self.rec_buffer[slot]
        if r is None:
            return None
        enc = self.config.enc
        return r.planes[0].as_array()[: enc.height, : enc.width]

    def _dev_luma(self, fno, luma_np):
        """Device handle for a source luma plane, uploaded at most once per
        input_frameno (see _dev_luma_cache).  Falls back to the numpy plane
        (per-dispatch upload) when the key is unknown or the upload fails."""
        if luma_np is None or fno is None:
            return luma_np
        dev = self._dev_luma_cache.get(fno)
        if dev is None:
            try:
                from rav1e_tpu.device import upload_source_luma

                dev = upload_source_luma(luma_np)
            except Exception:
                return luma_np
            self._dev_luma_cache[fno] = dev
            while len(self._dev_luma_cache) > 12:
                self._dev_luma_cache.pop(next(iter(self._dev_luma_cache)))
        return dev

    def predispatch_idle(self, next_hints) -> None:
        """Predispatch from a non-coding point (e.g. while emitting a
        show-existing packet): reference slots are already final."""
        enc = self.config.enc
        if not next_hints:
            return
        if not (enc.speed_settings.device_analysis
                and min(enc.width, enc.height) >= 64):
            return
        try:
            self._predispatch_analyses(next_hints, None, None, None)
        except Exception:
            self._pending_analyses.clear()

    def _predispatch_analyses(self, next_hints, cur_frame, cur_ft, cur_plan):
        """Dispatch upcoming planned frames' device analyses asynchronously.

        Runs right after this frame's maps are fetched, so the next frames'
        TPU round-trips overlap this frame's host tile coding and loop
        filters.  Reference-slot contents for frames deeper than one step
        are *simulated* by walking the plan's refresh sequence over the
        queued source frames; each dispatched entry records the source
        framenos it saw, and consumption re-validates them against the
        slots' actual content, so a divergent simulation degrades to the
        sync path instead of a wrong bitstream.  Uses the RC's current qi
        estimate (stale by up to `depth` frames) — the analysis q only
        steers heuristics, and the estimate is deterministic, so bitstreams
        stay reproducible."""
        import threading

        from rav1e_tpu.device import analyze_finish, analyze_frame_async

        enc = self.config.enc
        # slot -> (source input_frameno, source luma); seeded from the live
        # buffers, then overlaid by the current frame's refresh and every
        # simulated planned refresh in turn
        sim: dict = {}
        if cur_frame is not None:
            cur_refresh = (
                0xFF
                if cur_ft in (FrameType.KEY, FrameType.SWITCH)
                else (1 << cur_plan.slot)
            )
            cur_src = cur_frame.planes[0].as_array()[: enc.height, : enc.width]
            for i in range(8):
                if (cur_refresh >> i) & 1:
                    sim[i] = (cur_plan.input_frameno, cur_src)

        def slot_state(slot):
            if slot in sim:
                return sim[slot]
            return (self.slot_src_frameno[slot], self._ref_src_luma(slot))

        for nplan, nframe in next_hints:
            if len(self._pending_analyses) >= len(next_hints):
                break
            fno = nplan.input_frameno
            n_src = nframe.planes[0].as_array()[: enc.height, : enc.width]
            if fno not in self._pending_analyses:
                is_key = nplan.kind == "key"
                ref_y = ref_y_bwd = ref_y_bwd2 = None
                ref_fno_fwd = ref_fno_bwd = ref_fno_bwd2 = None
                is_inter = False
                if not is_key:
                    ref_fno_fwd, ref_y = slot_state(nplan.ref_slot_fwd)
                    is_inter = ref_y is not None and ref_fno_fwd is not None
                    if is_inter and nplan.ref_slot_bwd is not None:
                        ref_fno_bwd, ref_y_bwd = slot_state(nplan.ref_slot_bwd)
                        if ref_y_bwd is None:
                            ref_fno_bwd = None
                    if (
                        is_inter
                        and ref_y_bwd is not None
                        and getattr(nplan, "ref_slot_bwd2", None) is not None
                        and enc.speed_settings.multiref
                    ):
                        ref_fno_bwd2, ref_y_bwd2 = slot_state(
                            nplan.ref_slot_bwd2
                        )
                        if ref_y_bwd2 is None:
                            ref_fno_bwd2 = None
                    if not is_inter:
                        ref_y = ref_y_bwd = ref_y_bwd2 = None
                        ref_fno_fwd = ref_fno_bwd = ref_fno_bwd2 = None
                q_guess = self.rc.select_qi(
                    FrameType.KEY if is_key else FrameType.INTER,
                    enc.width, enc.height, nplan.level,
                )
                q_step = tables.ac_q(q_guess, 0, enc.bit_depth) / 8.0
                lam = 0.12 * q_step * q_step
                handle = analyze_frame_async(
                    self._dev_luma(fno, n_src),
                    self._dev_luma(ref_fno_fwd, ref_y),
                    self._dev_luma(ref_fno_bwd, ref_y_bwd),
                    q_guess, lam, enc.bit_depth,
                    ref2_np=self._dev_luma(ref_fno_bwd2, ref_y_bwd2),
                )
                # fetch on a worker thread: the device->host wait is IO
                # (GIL released), overlapping this frame's host coding
                box = {}

                def _fetch(handle=handle, box=box):
                    try:
                        box["maps"] = analyze_finish(handle)
                    except Exception as e:  # consumed as a sync fallback
                        box["err"] = e

                th = threading.Thread(target=_fetch, daemon=True)
                th.start()
                self._pending_analyses[fno] = {
                    "q": q_guess,
                    "is_inter": is_inter,
                    "ref_fno_fwd": ref_fno_fwd,
                    "ref_fno_bwd": ref_fno_bwd,
                    "ref_fno_bwd2": ref_fno_bwd2,
                    "thread": th,
                    "box": box,
                }
            # simulate this planned frame's slot refresh for deeper hints
            refresh = (
                0xFF if (nplan.kind == "key" or nplan.switch)
                else (1 << nplan.slot)
            )
            for i in range(8):
                if (refresh >> i) & 1:
                    sim[i] = (fno, n_src)

    def _chain_applicable(self) -> bool:
        enc = self.config.enc
        from rav1e_tpu import native as _native

        return (
            getattr(enc.speed_settings, "device_chain", False)
            and enc.speed_settings.device_analysis
            and enc.bit_depth == 8
            and enc.chroma_sampling == ChromaSampling.Cs420
            and self.tiling.rows == 1
            and self.tiling.cols == 1
            and self.seq.enable_cdef
            and min(enc.width, enc.height) >= 64
            and _native.get_lib() is not None
        )

    def _chain_slot_planes(self, slot):
        """Device-padded reference planes for a slot: the chain's own output
        when the slot was chain-coded, else a lazy upload of the host
        reconstruction."""
        ent = self._chain_slots[slot]
        if ent is not None:
            return ent
        f = self.rec_buffer[slot]
        if f is None:
            return None
        from rav1e_tpu.device import chain as _chain

        enc = self.config.enc
        planes = _chain.host_pad_planes(f, enc.width, enc.height)
        self._chain_slots[slot] = tuple(planes)
        return self._chain_slots[slot]

    def _frame_seg_scales(self, frame, plan, frame_type, base_q_idx,
                          ref_luma):
        """(dist_scales, seg) for a frame: temporal-RDO importance scales +
        psy activity masking, then the segmentation decision.  Extracted
        from encode_frame so the chain predispatch can compute the NEXT
        frame's segmentation against simulated reference state — the
        result is a pure function of (frame, plan.importances, qi,
        ref_luma), so an early computation with validated inputs is
        bit-identical to the consume-time one."""
        enc = self.config.enc
        dist_scales = None
        if getattr(plan, "importances", None) is not None:
            from rav1e_tpu.encoder.lookahead import importances_to_scales

            dist_scales = importances_to_scales(plan.importances, plan.la_intra)

        from rav1e_tpu.config import Tune

        if enc.tune == Tune.Psychovisual:
            # activity masking (reference activity.rs ActivityMask +
            # ssim_boost feeding distortion_scale_for, rdo.rs:506): flat
            # areas are perceptually sensitive -> distortion there weighs
            # more; busy areas mask error -> less.  Scales multiply the
            # temporal-RDO scales on the same 8x8 grid.
            from rav1e_tpu.encoder.segmentation import _seg_cell_stats

            src_y8 = frame.planes[0].as_array()[: enc.height, : enc.width]
            s8, q8, _ = _seg_cell_stats(src_y8, None)
            sc = float(1 << (enc.bit_depth - 8))
            act = (64.0 * q8 - s8.astype(np.float64) ** 2) / (
                4096.0 * sc * sc
            )
            logs = 0.5 * np.log2(np.maximum(act, 1.0))
            psy = np.clip(
                2.0 ** (0.4 * (float(np.median(logs)) - logs)), 0.5, 2.0
            )
            if dist_scales is None:
                dist_scales = psy
            else:
                ch = min(dist_scales.shape[0], psy.shape[0])
                cw = min(dist_scales.shape[1], psy.shape[1])
                dist_scales = dist_scales.copy()
                dist_scales[:ch, :cw] *= psy[:ch, :cw]

        seg = None
        from rav1e_tpu.config.speed import SegmentationLevel

        if enc.speed_settings.segmentation != SegmentationLevel.Disabled:
            from rav1e_tpu.encoder.segmentation import segmentation_optimize

            mi_cols = 2 * ((enc.width + 7) >> 3)
            mi_rows = 2 * ((enc.height + 7) >> 3)
            if not frame_type.has_inter():
                ref_luma = None
            seg = segmentation_optimize(
                frame.planes[0].as_array(), base_q_idx, enc.bit_depth,
                mi_cols, mi_rows, ref_luma=ref_luma, imp_scales=dist_scales,
            )
            if not seg.enabled:
                seg = None
        return dist_scales, seg

    def _chain_live_refs(self, plan, has_bwd, has_bwd2):
        """Resolve the device reference planes for a chain dispatch from
        the LIVE slot state.  Returns ((r0, r1, r2), has_bwd, has_bwd2)
        with the flags downgraded when a slot has no content, or None."""
        r0 = self._chain_slot_planes(plan.ref_slot_fwd)
        if r0 is None:
            return None
        r1 = self._chain_slot_planes(plan.ref_slot_bwd) if has_bwd else r0
        if r1 is None:
            has_bwd = has_bwd2 = False
            r1 = r0
        r2 = self._chain_slot_planes(plan.ref_slot_bwd2) if has_bwd2 else r0
        if r2 is None:
            has_bwd2 = False
            r2 = r0
        return (r0, r1, r2), has_bwd, has_bwd2

    def _chain_dispatch(self, maps, frame, plan, base_q_idx, seg, refs3,
                        has_bwd, has_bwd2, fno):
        """Build the chain plan for `frame` and enqueue the device program
        asynchronously.  Pure function of its arguments plus the encoder
        config, so the SAME dispatch can be issued one frame early (the
        predispatch path) and consumed later.  Returns the dispatch record
        {handle, geom, cplan, fields} the fetch side consumes."""
        enc = self.config.enc
        sp = enc.speed_settings
        from rav1e_tpu.device import chain as _chain
        from rav1e_tpu.ops.cdef import CDEF_SEC_STRENGTHS, cdef_strengths_fast
        from rav1e_tpu.ops.deblock import deblock_levels_fast
        from rav1e_tpu.quantize import chroma_q_deltas
        from rav1e_tpu.utils.trace import span

        bd = enc.bit_depth
        mi_cols = 2 * ((enc.width + 7) >> 3)
        mi_rows = 2 * ((enc.height + 7) >> 3)
        pr = sp.partition.partition_range
        tx_split = sp.transform.enable_inter_tx_split

        geom = _chain.geom_for(
            enc.width, enc.height, mi_cols, mi_rows, bd,
            tx_split, has_bwd, has_bwd2, pr.min_log2, pr.max_log2,
        )
        cplan = _chain.build_plan(
            maps.size_log2, mi_cols, mi_rows, pr.min_log2, pr.max_log2,
            tx_split,
        )
        fields = _chain.clamp_fields(maps, geom.gh // 16, geom.gw // 16)
        if not has_bwd:
            fields[1] = 0
        if not has_bwd2:
            fields[2] = 0

        # per-plane quantizers on the 8px grid (segmentation + chroma deltas,
        # same tables the native coder uses: native_tile.py seg_dcq/seg_acq)
        dc_delta_q, ac_delta_q = chroma_q_deltas(
            base_q_idx, bd, self.seq.chroma_sampling
        )
        nby8, nbx8 = geom.gh // 8, geom.gw // 8
        if seg is not None:
            qidx = np.array(
                [seg.qidx(base_q_idx, s) for s in range(8)], dtype=np.int64
            )
            seg8 = np.zeros((nby8, nbx8), dtype=np.int64)
            sm = seg.seg_map[::2, ::2]
            seg8[: sm.shape[0], : sm.shape[1]] = sm
        else:
            qidx = np.full(8, base_q_idx, dtype=np.int64)
            seg8 = np.zeros((nby8, nbx8), dtype=np.int64)
        dcq_tab = np.array(
            [[tables.dc_q(int(q), dc_delta_q[pl], bd)
              for pl in range(3)] for q in qidx], dtype=np.int32
        )
        acq_tab = np.array(
            [[tables.ac_q(int(q), ac_delta_q[pl], bd)
              for pl in range(3)] for q in qidx], dtype=np.int32
        )
        dcq8 = dcq_tab[seg8].transpose(2, 0, 1).copy()
        acq8 = acq_tab[seg8].transpose(2, 0, 1).copy()

        deblock_levels = deblock_levels_fast(
            base_q_idx, bd, False, tables.ac_q(base_q_idx, 0, bd),
        )
        cdef_y, cdef_uv = cdef_strengths_fast(
            tables.ac_q(base_q_idx, 0, bd) >> (bd - 8)
        )
        pri = cdef_y // CDEF_SEC_STRENGTHS
        sec = cdef_y % CDEF_SEC_STRENGTHS
        y_list = [0, cdef_y, max(pri // 2, 1) * CDEF_SEC_STRENGTHS + sec,
                  min(pri * 2 + 1, 15) * CDEF_SEC_STRENGTHS + sec]
        pri_uv = cdef_uv // CDEF_SEC_STRENGTHS
        sec_uv = cdef_uv % CDEF_SEC_STRENGTHS
        uv_list = [0, cdef_uv,
                   max(pri_uv // 2, 0) * CDEF_SEC_STRENGTHS + sec_uv,
                   min(pri_uv * 2 + 1, 15) * CDEF_SEC_STRENGTHS + sec_uv]

        src_p = _chain.host_src_planes(frame, enc.width, enc.height)
        # the luma already crossed the wire for this frame's device
        # analysis (same ceil-64 padded layout); reuse the handle so only
        # the chroma planes upload here.  Skip under a live analysis mesh:
        # those handles are row-sharded, the chain program is single-device.
        from rav1e_tpu.device.analysis import _analysis_mesh

        if _analysis_mesh() is None:
            dev_y = self._dev_luma_cache.get(fno)
            if dev_y is not None and tuple(dev_y.shape) == src_p[0].shape:
                src_p[0] = dev_y
        with span("chain_dispatch", frame=fno):
            handle = _chain.dispatch_chain(
                geom, cplan, src_p, refs3, fields, dcq8, acq8,
                deblock_levels, y_list, uv_list,
            )
        # fetch on a worker thread STARTED AT DISPATCH TIME: the tunnel
        # serves the device stream in order, so enqueueing the result
        # downloads now places them ahead of the next frame's analyses and
        # chain compute — the consume-time join then waits only for THIS
        # frame's compute + transfer, all of it overlapped with the
        # previous frame's host coding (measured: the synchronous fetch
        # stalled ~78 ms/frame behind next-frame device work)
        import threading

        box: dict = {}

        def _bg_fetch():
            try:
                box["res"] = _chain.fetch_chain(handle)
            except BaseException as e:  # noqa: BLE001 - surfaced at consume
                box["err"] = e

        th = threading.Thread(target=_bg_fetch, daemon=True)
        th.start()
        return {
            "handle": handle, "geom": geom, "cplan": cplan, "fields": fields,
            "deblock_levels": deblock_levels, "cdef_y": cdef_y,
            "cdef_uv": cdef_uv, "y_list": y_list, "uv_list": uv_list,
            "fetch_thread": th, "fetch_box": box,
        }

    def _predispatch_chain(self, next_hints, cur_plan, cur_fno, cur_frame,
                           cur_disp) -> None:
        """Dispatch the NEXT planned inter frame's chain right behind this
        frame's, before this frame's results are even fetched: its device
        compute then overlaps this frame's tunnel fetch + host replay
        coding + packetization (the chain analog of _predispatch_analyses).

        The next frame's forward/backward references resolve against the
        post-this-frame slot state — for the slot this frame refreshes
        that is this dispatch's OWN device-recon futures (XLA queues the
        dependency; no host sync).  The RC qi and segmentation are the
        scheduler's current estimates; consumption re-validates every
        input (qi, maps object, reference identities, segmentation) and
        falls back to a fresh synchronous dispatch on any mismatch, so the
        bitstream is identical whether or not the early dispatch is used."""
        self._pending_chain = None
        if not next_hints:
            return
        if not self.rc.cq_mode:
            # bitrate mode: select_qi depends on this frame's still-pending
            # rc.update_state, so a q guessed now would mismatch the
            # consume-time qi nearly every frame and the speculative chain
            # (a full-frame device encode) would execute uselessly ahead of
            # its replacement — doubling device work exactly when RC is
            # active.  Dispatch synchronously at consumption instead.
            return
        nplan, nframe = next_hints[0]
        if nplan.kind != "inter" or getattr(nplan, "switch", False):
            return
        enc = self.config.enc
        fno = nplan.input_frameno
        ent = self._pending_analyses.get(fno)
        if ent is None or not ent["is_inter"]:
            return
        # the analysis was dispatched >=1 frame ago; its device time is
        # hidden behind this frame's chain compute, so a join is cheap
        ent["thread"].join()
        maps = ent["box"].get("maps")
        if maps is None or maps.mv0 is None:
            return

        cur_slot = cur_plan.slot

        def slot_fno(s):
            return cur_fno if s == cur_slot else self.slot_src_frameno[s]

        def slot_planes(s):
            if s == cur_slot:
                return cur_disp["handle"][2]  # this dispatch's recon futures
            return self._chain_slot_planes(s)

        def slot_live(s):
            return s == cur_slot or self.rec_buffer[s] is not None

        # the prefetched analysis must have seen the same references the
        # consume-time validation will demand
        if ent["ref_fno_fwd"] != slot_fno(nplan.ref_slot_fwd):
            return
        has_bwd = (
            nplan.ref_slot_bwd is not None and slot_live(nplan.ref_slot_bwd)
        )
        has_bwd2 = (
            has_bwd
            and getattr(nplan, "ref_slot_bwd2", None) is not None
            and enc.speed_settings.multiref
            and slot_live(nplan.ref_slot_bwd2)
        )
        r0 = slot_planes(nplan.ref_slot_fwd)
        if r0 is None:
            return
        r1 = slot_planes(nplan.ref_slot_bwd) if has_bwd else r0
        if r1 is None:
            has_bwd = has_bwd2 = False
            r1 = r0
        r2 = slot_planes(nplan.ref_slot_bwd2) if has_bwd2 else r0
        if r2 is None:
            has_bwd2 = False
            r2 = r0

        q_guess = self.rc.select_qi(
            FrameType.INTER, enc.width, enc.height, nplan.level
        )
        ref_src = (
            cur_frame.planes[0].as_array()[: enc.height, : enc.width]
            if nplan.ref_slot_fwd == cur_slot
            else self._ref_src_luma(nplan.ref_slot_fwd)
        )
        ref_fno = slot_fno(nplan.ref_slot_fwd)
        dist_scales, seg = self._frame_seg_scales(
            nframe, nplan, FrameType.INTER, q_guess, ref_src
        )
        # memo for encode_frame: the consume-time recompute of the same
        # (frame, q, fwd-ref) segmentation is pure duplicate host work
        self._seg_memo = (
            fno, FrameType.INTER, q_guess, ref_fno, dist_scales, seg,
        )
        disp = self._chain_dispatch(
            maps, nframe, nplan, q_guess, seg, (r0, r1, r2),
            has_bwd, has_bwd2, fno,
        )
        # hold the maps/frame OBJECTS (not id()) so the consume-time
        # identity checks are sound: keeping the reference pins the object
        # alive, so a freed-and-reallocated object can never alias
        self._pending_chain = {
            "fno": fno, "plan": nplan, "q": q_guess, "maps": maps,
            "frame": nframe, "seg": seg, "refs3": (r0, r1, r2),
            "has_bwd": has_bwd, "has_bwd2": has_bwd2, "disp": disp,
        }

    @staticmethod
    def _seg_equal(a, b) -> bool:
        if (a is None) != (b is None):
            return False
        if a is None:
            return True
        return (
            a.features == b.features
            and a.data == b.data
            and a.last_active_segid == b.last_active_segid
            and a.preskip == b.preskip
            and np.array_equal(a.seg_map, b.seg_map)
        )

    def _encode_frame_chain(self, fi, frame, frame_type, plan, input_frameno,
                            base_q_idx, next_hints=None):
        """Device-chain encode body for inter frames: ONE async XLA dispatch
        does selection/MC/transform/quantize/recon/deblock/CDEF with
        device-resident references (device/chain.py); the host runs only the
        pixel-free native replay coder over the downloaded coefficient log.
        Returns the host-body result tuple, or None to fall back.

        Software pipeline: this frame's dispatch normally happened one
        frame EARLY (_predispatch_chain), so by the time we fetch here the
        device has been computing it behind the previous frame's host
        work; before fetching, the NEXT frame's chain is dispatched against
        this one's device-recon futures."""
        enc = self.config.enc
        sp = enc.speed_settings
        if not self._chain_applicable() or not fi.is_inter_frame:
            self._pending_chain = None
            return None
        maps = fi.device_maps
        if maps is None or maps.mv0 is None:
            self._pending_chain = None
            return None

        from rav1e_tpu.device import chain as _chain
        from rav1e_tpu.utils.trace import span

        mi_cols, mi_rows = fi.mi_cols, fi.mi_rows
        has_bwd = fi.ref_frame_bwd is not None and plan.ref_slot_bwd is not None
        has_bwd2 = (
            has_bwd
            and fi.ref_frame_bwd2 is not None
            and getattr(plan, "ref_slot_bwd2", None) is not None
        )
        live = self._chain_live_refs(plan, has_bwd, has_bwd2)
        if live is None:
            self._pending_chain = None
            return None
        refs3, has_bwd, has_bwd2 = live

        pend = self._pending_chain
        self._pending_chain = None
        disp = None
        if (
            pend is not None
            and pend["fno"] == input_frameno
            and pend["plan"] is plan
            and pend["q"] == base_q_idx
            and pend["maps"] is maps
            and pend["frame"] is frame
            and pend["has_bwd"] == has_bwd
            and pend["has_bwd2"] == has_bwd2
            and all(a is b for a, b in zip(pend["refs3"], refs3))
            and self._seg_equal(pend["seg"], fi.seg)
        ):
            disp = pend["disp"]
        if disp is None:
            disp = self._chain_dispatch(
                maps, frame, plan, base_q_idx, fi.seg, refs3,
                has_bwd, has_bwd2, input_frameno,
            )
        # the next frame's chain rides behind this one on the device queue
        try:
            self._predispatch_chain(
                next_hints, plan, input_frameno, frame, disp
            )
        except Exception:
            self._pending_chain = None

        geom, cplan, fields = disp["geom"], disp["cplan"], disp["fields"]
        deblock_levels = disp["deblock_levels"]
        cdef_y, cdef_uv = disp["cdef_y"], disp["cdef_uv"]
        y_list, uv_list = disp["y_list"], disp["uv_list"]
        with span("chain_fetch", frame=input_frameno):
            th = disp.get("fetch_thread")
            if th is not None:
                th.join()
                res = disp["fetch_box"].get("res")
                if res is None:  # background fetch failed: retry inline
                    res = _chain.fetch_chain(disp["handle"])
            else:
                res = _chain.fetch_chain(disp["handle"])
        if res.overflow:
            return None

        # reuse grids + coefficient log for the native replay coder
        is_inter_g, ref_g, mv_g = _chain.derive_decisions(
            geom, cplan, res.sel, fields
        )
        reuse = FrameBlocks(mi_cols, mi_rows)
        reuse.is_inter_flag[:, :] = is_inter_g.astype(bool)
        reuse.ref_frames[:, :] = ref_g
        reuse.mv[:, :] = mv_g.reshape(mi_rows, mi_cols, 2, 2)
        log_buf, used = _chain.build_coeff_log(cplan, res.eobs, res.levels)

        if self._chain_dummy_rec is None:
            self._chain_dummy_rec = Frame.new(
                enc.width, enc.height, enc.chroma_sampling, enc.bit_depth
            )
        frame_blocks = FrameBlocks(mi_cols, mi_rows)
        te = TileEncoder(
            fi, frame, self._chain_dummy_rec, 0, 0, mi_cols, mi_rows, sp,
            frame_blocks, rs=None, cdef_bits=2, cdef_idx_map=res.cdef_idx,
            reuse_blocks=reuse,
        )
        te.coeff_log_in = (log_buf, used)
        with span("chain_replay_code", frame=input_frameno):
            from rav1e_tpu import native_tile

            r = native_tile.encode_tile_native(te)
        if r is None:
            return None  # replay walk diverged: full host fallback
        payload, te.stats = r
        tile_group = self._build_tile_group([payload])

        rec = _chain.DeviceReconFrame(
            res.refs, enc.width, enc.height, enc.chroma_sampling,
            enc.bit_depth,
        )
        self._chain_pending_refs = res.refs
        return (rec, frame_blocks, te.stats, te.fc, tile_group,
                deblock_levels, 3, 2, cdef_y, cdef_uv, y_list, uv_list,
                [0, 0, 0], [256, 256, 256])

    def _encode_frame_host(self, fi, frame, frame_type, mi_cols, mi_rows,
                           input_frameno):
        """Host-tier encode body: tile coding + in-loop filters + the
        two-pass CDEF/LRF replay (the pre-chain path, all presets)."""
        enc = self.config.enc
        use_device = (
            enc.speed_settings.device_analysis
            and min(enc.width, enc.height) >= 64
        )
        # select the full-pel search family for this frame's speed tier
        # (native ME reads it as a per-process constant; the python fallback
        # reads speed.motion directly)
        from rav1e_tpu import native as _native

        _lib = _native.get_lib()
        if _lib is not None:
            _lib.enc_me_set_method(
                enc.speed_settings.motion.me_method,
                enc.speed_settings.motion.me_range,
            )

        rec = Frame.new(enc.width, enc.height, enc.chroma_sampling, enc.bit_depth)
        frame_blocks = FrameBlocks(mi_cols, mi_rows)

        # encode tiles (structure ready for parallel/sharded execution)
        from rav1e_tpu.utils.trace import span

        tile_payloads: List[bytes] = []
        enc_stats = EncoderStats()
        with span("encode_tiles", frame=input_frameno):
            (tile_payloads, enc_stats, frame_cdfs, decisions,
             coeff_logs) = self._encode_tiles(
                fi, frame, rec, frame_blocks, mi_cols, mi_rows, record=True
            )

        tile_group = self._build_tile_group(tile_payloads)

        # in-loop filters on the reconstruction (frame-level, across tiles).
        # Levels via the q-derived fast rule; SSE-tally search comes with RDO.
        from rav1e_tpu.ops.deblock import deblock_filter_frame, deblock_levels_fast

        deblock_levels = deblock_levels_fast(
            fi.base_q_idx, fi.bit_depth, frame_type == FrameType.KEY,
            tables.ac_q(fi.base_q_idx, 0, fi.bit_depth),
        )
        if not enc.speed_settings.fast_deblock:
            from rav1e_tpu.ops.deblock import deblock_search_levels

            with span("deblock_search"):
                deblock_levels = deblock_search_levels(
                    deblock_levels, rec, frame, frame_blocks,
                    enc.width, enc.height, fi.bit_depth, enc.chroma_sampling,
                )
        with span("deblock"):
            deblock_filter_frame(
                deblock_levels, rec, frame_blocks, enc.width, enc.height,
                fi.bit_depth, enc.chroma_sampling,
            )

        sb_w = (mi_cols + MIB_SIZE - 1) // MIB_SIZE
        sb_h = (mi_rows + MIB_SIZE - 1) // MIB_SIZE

        # keep the pre-CDEF (deblocked) planes for loop restoration
        # (lrf.rs:1485: LRF reads deblocked rows at stripe boundaries)
        # LRUs are frame-global geometry; tiles only partition which SB
        # codes each unit's symbols, and the ref predictors reset per tile
        # (TileRestorationRefs in both tile coder and decoder) — so LRF
        # works under multi-tile (tile_restoration_state.rs:49 semantics)
        use_lrf = self.seq.enable_restoration
        deblocked_planes = None
        if use_lrf:
            deblocked_planes = [
                p.data[p.cfg.pad :, p.cfg.pad :].copy() for p in rec.planes
            ]

        # CDEF (after deblock, before LRF; cdef.rs:574-600): q-derived
        # single strength at fast speeds, per-64x64 RDO over a 4-entry
        # preset (cdef_bits=2) at quality speeds (rdo.rs:2104 CDEF axis).
        cdef_damping, cdef_y, cdef_uv = 3, 0, 0
        cdef_bits = 0
        cdef_map = None
        cdef_y_list = None
        cdef_uv_list = None
        if self.seq.enable_cdef:
            from rav1e_tpu.ops.cdef import (
                cdef_filter_frame, cdef_rdo_frame, cdef_strengths_fast,
            )

            cdef_y, cdef_uv = cdef_strengths_fast(
                tables.ac_q(fi.base_q_idx, 0, fi.bit_depth) >> (fi.bit_depth - 8)
            )
            if not enc.speed_settings.fast_deblock and cdef_y > 0 and use_device:
                # device filter stage: strength RDO sweep + per-SB argmin +
                # apply in ONE jitted XLA program (device/filters.py);
                # bit-equal to the host path (tests/test_device_filters.py)
                from rav1e_tpu.device.filters import cdef_device_frame

                with span("cdef_rdo_device"):
                    cdef_y_list, cdef_uv_list, cdef_map, _applied = (
                        cdef_device_frame(
                            rec, frame, frame_blocks, fi.bit_depth,
                            enc.chroma_sampling, enc.width, enc.height,
                            cdef_damping, cdef_y, cdef_uv,
                        )
                    )
                cdef_state = None
                cdef_bits = 2
            elif not enc.speed_settings.fast_deblock and cdef_y > 0:
                with span("cdef_rdo"):
                    cdef_y_list, cdef_uv_list, cdef_map, cdef_state = cdef_rdo_frame(
                        rec, frame, frame_blocks, fi.bit_depth,
                        enc.chroma_sampling, enc.width, enc.height,
                        cdef_damping, cdef_y, cdef_uv,
                    )
                if (
                    enc.speed_settings.joint_loop_rdo
                    and use_lrf
                    and cdef_state is not None
                ):
                    # joint CDEF x LRF decision (rdo_loop_decision,
                    # rdo.rs:2104): re-score each CDEF candidate through the
                    # loop-restoration it would get, per 64x64 SB
                    with span("joint_loop_rdo"):
                        cdef_map = self._joint_cdef_map(
                            rec, frame, frame_blocks, fi, enc,
                            deblocked_planes, cdef_damping,
                            cdef_y_list, cdef_uv_list, cdef_state,
                            sb_w, sb_h,
                        )
                cdef_bits = 2
                with span("cdef"):
                    cdef_filter_frame(
                        (cdef_damping, cdef_y_list, cdef_uv_list), rec,
                        frame_blocks, fi.bit_depth, enc.chroma_sampling,
                        enc.width, enc.height, cdef_idx_map=cdef_map,
                        state=cdef_state,
                    )
            else:
                with span("cdef"):
                    cdef_filter_frame(
                        (cdef_damping, cdef_y, cdef_uv), rec, frame_blocks,
                        fi.bit_depth, enc.chroma_sampling, enc.width, enc.height,
                    )

        # Loop restoration: per-LRU SgrProj solve + SSE decision; when any
        # unit selects a filter the tiles are re-encoded with the LRF symbols
        # (the recon is unchanged so pass 2 reproduces pass 1's decisions).
        lrf_types = [0, 0, 0]
        lrf_unit_size = [256, 256, 256]
        if use_lrf:
            from rav1e_tpu.ops.lrf import (
                RESTORE_SWITCHABLE, RestorationState, lrf_decide_units,
                lrf_filter_frame,
            )

            rs = RestorationState.build(
                enc.width, enc.height, enc.chroma_sampling, fi.base_q_idx,
                sb_w, sb_h,
            )
            from rav1e_tpu.ops.lrf import SGRPROJ_FAST_SETS, SGRPROJ_REDUCED_SETS

            _sets = (
                SGRPROJ_REDUCED_SETS
                if enc.speed_settings.joint_loop_rdo
                or not enc.speed_settings.device_analysis
                else SGRPROJ_FAST_SETS
            )
            with span("lrf_decide"):
                lrf_decide_units(
                    rs, rec, deblocked_planes, frame, enc.width, enc.height,
                    fi.bit_depth, enc.chroma_sampling, sets=_sets,
                )
            if rs.any_filters():
                lrf_filter_frame(
                    rs, rec, deblocked_planes, enc.width, enc.height,
                    fi.bit_depth, enc.chroma_sampling,
                )
                lrf_types = [RESTORE_SWITCHABLE] * 3
                lrf_unit_size = [
                    rs.planes[0].cfg.unit_size,
                    rs.planes[1].cfg.unit_size,
                    rs.planes[2].cfg.unit_size,
                ]
            else:
                rs = None
        else:
            rs = None

        # symbols added after pass 1 (per-SB cdef_idx, per-LRU filters)
        # require a tile re-encode.  Pass 2 replays pass 1's recorded RDO
        # decisions, so it normally reproduces the identical block stream
        # cheaply.  The grids are verified below: if they ever drift (a
        # decision point missing from the replay log), the pass-2 recon
        # becomes canonical and the filter chain is re-applied with the
        # already-coded CDEF map and LRF units so encoder refs still match
        # the decoder exactly.
        if cdef_bits > 0 or rs is not None:
            rec_scratch = Frame.new(
                enc.width, enc.height, enc.chroma_sampling, enc.bit_depth
            )
            fb_scratch = FrameBlocks(mi_cols, mi_rows)
            tile_payloads, _, frame_cdfs, _, _ = self._encode_tiles(
                fi, frame, rec_scratch, fb_scratch, mi_cols, mi_rows, rs=rs,
                cdef_bits=cdef_bits, cdef_idx_map=cdef_map, replays=decisions,
                reuse_from=frame_blocks, coeff_logs=coeff_logs,
            )
            tile_group = self._build_tile_group(tile_payloads)

            replay_exact = np.array_equal(
                fb_scratch.skip, frame_blocks.skip
            ) and np.array_equal(fb_scratch.tx_size, frame_blocks.tx_size)
        else:
            replay_exact = True
        if not replay_exact:
            rec = rec_scratch
            frame_blocks = fb_scratch
            deblock_levels = deblock_levels_fast(
                fi.base_q_idx, fi.bit_depth, frame_type == FrameType.KEY,
                tables.ac_q(fi.base_q_idx, 0, fi.bit_depth),
            )
            if not enc.speed_settings.fast_deblock:
                with span("deblock_search_p2"):
                    deblock_levels = deblock_search_levels(
                        deblock_levels, rec, frame, frame_blocks,
                        enc.width, enc.height, fi.bit_depth, enc.chroma_sampling,
                    )
            with span("deblock_p2"):
                deblock_filter_frame(
                    deblock_levels, rec, frame_blocks, enc.width, enc.height,
                    fi.bit_depth, enc.chroma_sampling,
                )
            if rs is not None:
                deblocked_planes = [
                    pl.data[pl.cfg.pad :, pl.cfg.pad :].copy() for pl in rec.planes
                ]
            if self.seq.enable_cdef and cdef_bits > 0:
                with span("cdef_p2"):
                    cdef_filter_frame(
                        (cdef_damping, cdef_y_list, cdef_uv_list), rec,
                        frame_blocks, fi.bit_depth, enc.chroma_sampling,
                        enc.width, enc.height, cdef_idx_map=cdef_map,
                    )
            elif self.seq.enable_cdef and (cdef_y > 0 or cdef_uv > 0):
                with span("cdef_p2"):
                    cdef_filter_frame(
                        (cdef_damping, cdef_y, cdef_uv), rec, frame_blocks,
                        fi.bit_depth, enc.chroma_sampling, enc.width, enc.height,
                    )
            if rs is not None:
                lrf_filter_frame(
                    rs, rec, deblocked_planes, enc.width, enc.height,
                    fi.bit_depth, enc.chroma_sampling,
                )

        return (rec, frame_blocks, enc_stats, frame_cdfs, tile_group,
                deblock_levels, cdef_damping, cdef_bits, cdef_y, cdef_uv,
                cdef_y_list, cdef_uv_list, lrf_types, lrf_unit_size)

    def encode_frame(
        self,
        frame: Frame,
        input_frameno: int,
        frame_type: FrameType,
        params=None,
        is_first: bool = False,
        plan=None,
        next_hints=None,
    ) -> Packet:
        enc = self.config.enc
        assert frame_type == FrameType.KEY or not enc.still_picture

        if plan is None:
            # direct callers without a scheduler: low-latency slot cycling
            from rav1e_tpu.api.inter_cfg import PlannedFrame

            slot = self._fallback_slot % 4
            plan = PlannedFrame(
                "key" if frame_type == FrameType.KEY else "inter",
                input_frameno, order_hint=input_frameno, slot=slot,
                ref_slot_fwd=(slot + 3) % 4,
                ref_frames=[(slot + 3) % 4] * 7,
            )
            self._fallback_slot += 1

        if (
            getattr(plan, "switch", False)
            and frame_type == FrameType.INTER
            and self.rec_buffer[plan.ref_slot_fwd] is not None
        ):
            frame_type = FrameType.SWITCH

        ref_fwd = ref_bwd = ref_bwd2 = None
        primary_ref = 7  # PRIMARY_REF_NONE
        init_cdfs = None
        if frame_type.has_inter():
            ref_fwd = self.rec_buffer[plan.ref_slot_fwd]
            if plan.ref_slot_bwd is not None:
                ref_bwd = self.rec_buffer[plan.ref_slot_bwd]
            if (
                ref_bwd is not None
                and getattr(plan, "ref_slot_bwd2", None) is not None
                and enc.speed_settings.multiref
            ):
                ref_bwd2 = self.rec_buffer[plan.ref_slot_bwd2]
            if ref_fwd is None:
                frame_type = FrameType.KEY
            elif (
                self.cdf_buffer[plan.ref_slot_fwd] is not None
                and not enc.error_resilient
                and frame_type != FrameType.SWITCH
            ):
                # inherit symbol probabilities from the forward reference
                # (primary_ref_frame = LAST; encoder.rs:1040-1046)
                primary_ref = 0
                init_cdfs = self.cdf_buffer[plan.ref_slot_fwd]

        # spec 5.9.8 compute_image_size: mi dims round to EVEN (8px
        # multiples) so 4px edge blocks always pair for chroma coverage
        mi_cols = 2 * ((enc.width + 7) >> 3)
        mi_rows = 2 * ((enc.height + 7) >> 3)

        base_q_idx = self.rc.select_qi(frame_type, enc.width, enc.height, plan.level)

        from rav1e_tpu.config.speed import SegmentationLevel

        ref_luma = None
        seg_enabled = (
            enc.speed_settings.segmentation != SegmentationLevel.Disabled
        )
        memo = getattr(self, "_seg_memo", None)
        if (
            memo is not None
            and frame_type.has_inter()
            and self._chain_applicable()
            and memo[0] == plan.input_frameno
            and memo[1] == frame_type
            and memo[2] == base_q_idx
            and memo[3] == self.slot_src_frameno[plan.ref_slot_fwd]
        ):
            # the chain predispatch already computed this frame's
            # segmentation + dist scales against the same q and fwd ref
            dist_scales, seg = memo[4], memo[5]
        else:
            if frame_type.has_inter() and seg_enabled:
                if self._chain_applicable():
                    # chain tier: the recon lives on device; the SOURCE ref
                    # serves the (encoder-side-only) segmentation heuristic
                    # without forcing a device->host plane fetch
                    ref_luma = self._ref_src_luma(plan.ref_slot_fwd)
                else:
                    ref0 = self.rec_buffer[plan.ref_slot_fwd]
                    if ref0 is not None:
                        ref_luma = ref0.planes[0].as_array()
            dist_scales, seg = self._frame_seg_scales(
                frame, plan, frame_type, base_q_idx, ref_luma
            )

        fi = FrameInvariantsLite(
            seq=self.seq,
            width=enc.width,
            height=enc.height,
            frame_type=frame_type,
            base_q_idx=base_q_idx,
            bit_depth=enc.bit_depth,
            tx_mode_select=True,
            use_reduced_tx_set=enc.speed_settings.transform.reduced_tx_set,
            mi_cols=mi_cols,
            mi_rows=mi_rows,
            ref_frame=ref_fwd if frame_type.has_inter() else None,
            ref_frame_bwd=ref_bwd if frame_type.has_inter() else None,
            ref_frame_bwd2=ref_bwd2 if frame_type.has_inter() else None,
            seg=seg,
            prev_mvs=self.prev_mvs if frame_type.has_inter() else None,
            init_cdfs=init_cdfs if frame_type.has_inter() else None,
        )
        from rav1e_tpu.quantize import chroma_q_deltas

        fi.dc_delta_q, fi.ac_delta_q = chroma_q_deltas(
            base_q_idx, enc.bit_depth, self.seq.chroma_sampling
        )
        fi.dist_scales = dist_scales

        # skip-mode (spec 5.9.22): enabled when the derived closest-ref pair
        # is exactly (LAST, ALTREF) — the pair our compound blocks use
        if fi.is_inter_frame and fi.ref_frame_bwd is not None:
            from rav1e_tpu.encoder.obu import _skip_mode_refs

            class _Probe:
                pass

            _p = _Probe()
            _p.intra_only = False
            _p.reference_mode_select = True
            _p.ref_order_hints = list(self.slot_order_hints)
            _p.ref_frames = list(plan.ref_frames)
            _nb = self.seq.order_hint_bits_minus_1 + 1
            _p.order_hint = plan.order_hint & ((1 << _nb) - 1)
            fi.skip_mode_present = _skip_mode_refs(self.seq, _p) == (0, 6)

        pending = self._pending_analyses.pop(input_frameno, None)
        # validity: the dispatched program must have seen exactly the inputs
        # the sync path would use, so the bitstream is identical whether or
        # not the frame was queued early.  The recorded reference-source
        # framenos must match the slots' actual content (the predispatch
        # simulation can diverge after an unplanned refresh), and the maps
        # additionally require the SAME qi (checked at consumption).
        if pending is not None and not (
            pending["is_inter"] == fi.is_inter_frame
            and (
                not fi.is_inter_frame
                or (
                    pending["ref_fno_fwd"]
                    == self.slot_src_frameno[plan.ref_slot_fwd]
                    and pending["ref_fno_fwd"] is not None
                    and pending["ref_fno_bwd"]
                    == (
                        self.slot_src_frameno[plan.ref_slot_bwd]
                        if (
                            fi.ref_frame_bwd is not None
                            and plan.ref_slot_bwd is not None
                        )
                        else None
                    )
                    and pending.get("ref_fno_bwd2")
                    == (
                        self.slot_src_frameno[plan.ref_slot_bwd2]
                        if (
                            fi.ref_frame_bwd2 is not None
                            and getattr(plan, "ref_slot_bwd2", None)
                            is not None
                        )
                        else None
                    )
                )
            )
        ):
            pending = None

        use_device = (
            enc.speed_settings.device_analysis
            and min(enc.width, enc.height) >= 64
        )

        if fi.is_inter_frame and not use_device and min(enc.width, enc.height) >= 64:
            # no device maps: host hierarchical 3-pass motion fields seed the
            # per-block searches (me.rs:153-284), measured on SOURCE frames
            # like the reference's lookahead ME stats (api/lookahead.rs)
            from rav1e_tpu.context.mv import ALTREF_FRAME, LAST_FRAME
            from rav1e_tpu.encoder.lookahead import hierarchical_me
            from rav1e_tpu.utils.trace import span

            src_y = frame.planes[0].as_array()[: enc.height, : enc.width]
            fields = {}
            with span("hier_me"):
                f0 = self._ref_src_luma(plan.ref_slot_fwd)
                fields[LAST_FRAME] = hierarchical_me(src_y, f0, enc.bit_depth)
                if fi.ref_frame_bwd is not None and plan.ref_slot_bwd is not None:
                    f1 = self._ref_src_luma(plan.ref_slot_bwd)
                    fields[ALTREF_FRAME] = hierarchical_me(
                        src_y, f1, enc.bit_depth
                    )
            fi.me_fields = fields

        # device analysis: one jitted TPU program decides partitions, intra
        # modes, intra-vs-inter, and the motion field (device/me.py pyramid
        # + subpel SATD) for the whole frame; the tile encoders below
        # consume the maps instead of running trial searches
        if use_device:
            from rav1e_tpu.device import analyze_finish, analyze_frame_async
            from rav1e_tpu.utils.trace import span as _span

            maps = None
            if pending is not None and pending["q"] == base_q_idx:
                with _span("device_analysis"):
                    pending["thread"].join()
                    maps = pending["box"].get("maps")
            if maps is None and self._rc_retry:
                # RC trial re-encode at a corrected qi: reuse the first
                # attempt's maps instead of a second blocking device
                # dispatch when the correction is within the analysis's
                # decision sensitivity (the maps are legal at any qi; at
                # most mildly off-tuned).  One device dispatch per emitted
                # frame (rate.rs needs_trial_encode semantics).
                prev = getattr(self, "_retry_maps", None)
                if (
                    prev is not None
                    and prev[0] == input_frameno
                    and abs(prev[1] - base_q_idx) <= 12
                ):
                    maps = prev[2]
            if maps is not None:
                fi.device_maps = maps
                self._retry_maps = (input_frameno, base_q_idx, maps)
            else:
                src_y = frame.planes[0].as_array()[: enc.height, : enc.width]
                ref_y = ref_y_bwd = ref_y_bwd2 = None
                fno_fwd = fno_bwd = fno_bwd2 = None
                if fi.is_inter_frame:
                    fno_fwd = self.slot_src_frameno[plan.ref_slot_fwd]
                    ref_y = self._ref_src_luma(plan.ref_slot_fwd)
                    if fi.ref_frame_bwd is not None and plan.ref_slot_bwd is not None:
                        fno_bwd = self.slot_src_frameno[plan.ref_slot_bwd]
                        ref_y_bwd = self._ref_src_luma(plan.ref_slot_bwd)
                    if (
                        ref_y_bwd is not None
                        and fi.ref_frame_bwd2 is not None
                        and getattr(plan, "ref_slot_bwd2", None) is not None
                    ):
                        fno_bwd2 = self.slot_src_frameno[plan.ref_slot_bwd2]
                        ref_y_bwd2 = self._ref_src_luma(plan.ref_slot_bwd2)
                q_step = tables.ac_q(base_q_idx, 0, enc.bit_depth) / 8.0
                lam = 0.12 * q_step * q_step
                with _span("device_analysis"):
                    fi.device_maps = analyze_finish(analyze_frame_async(
                        self._dev_luma(input_frameno, src_y),
                        self._dev_luma(fno_fwd, ref_y),
                        self._dev_luma(fno_bwd, ref_y_bwd),
                        base_q_idx, lam,
                        enc.bit_depth,
                        ref2_np=self._dev_luma(fno_bwd2, ref_y_bwd2),
                    ))
                self._retry_maps = (
                    input_frameno, base_q_idx, fi.device_maps
                )
            # dispatch the NEXT planned frames' analyses now, so their
            # device round-trips overlap this frame's host coding and loop
            # filters
            if next_hints:
                try:
                    self._predispatch_analyses(
                        next_hints, frame, frame_type, plan
                    )
                except Exception:
                    self._pending_analyses.clear()

        chain_out = None
        self._chain_pending_refs = None
        if use_device and fi.is_inter_frame:
            chain_out = self._encode_frame_chain(
                fi, frame, frame_type, plan, input_frameno, base_q_idx,
                next_hints=next_hints)
        if chain_out is None:
            chain_out = self._encode_frame_host(
                fi, frame, frame_type, mi_cols, mi_rows, input_frameno)
        (rec, frame_blocks, enc_stats, frame_cdfs, tile_group,
         deblock_levels, cdef_damping, cdef_bits, cdef_y, cdef_uv,
         cdef_y_list, cdef_uv_list, lrf_types, lrf_unit_size) = chain_out

        sb_w = (mi_cols + MIB_SIZE - 1) // MIB_SIZE
        sb_h = (mi_rows + MIB_SIZE - 1) // MIB_SIZE
        is_inter = fi.is_inter_frame
        n_hint = self.seq.order_hint_bits_minus_1 + 1
        refresh = (
            0xFF
            if frame_type in (FrameType.KEY, FrameType.SWITCH)
            else (1 << plan.slot)
        )
        fh = FrameHeaderInfo(
            width=enc.width,
            height=enc.height,
            frame_type=frame_type,
            intra_only=not is_inter,
            base_q_idx=fi.base_q_idx,
            dc_delta_q=list(fi.dc_delta_q),
            ac_delta_q=list(fi.ac_delta_q),
            tx_mode_select=fi.tx_mode_select,
            use_reduced_tx_set=fi.use_reduced_tx_set,
            sb_width=sb_w,
            sb_height=sb_h,
            order_hint=plan.order_hint & ((1 << n_hint) - 1),
            primary_ref_frame=primary_ref if is_inter else 7,
            reference_mode_select=fi.ref_frame_bwd is not None,
            skip_mode_present=fi.skip_mode_present,
            error_resilient=(enc.error_resilient or frame_type == FrameType.SWITCH) and is_inter,
            ref_order_hints=list(self.slot_order_hints),
            show_frame=plan.show_frame,
            showable_frame=not plan.show_frame,
            allow_screen_content_tools=0,
            force_integer_mv=1 if not is_inter else 0,
            refresh_frame_flags=refresh,
            ref_frames=list(plan.ref_frames),
            allow_high_precision_mv=False,
            is_filter_switchable=False,
            default_filter=0,
            deblock_levels=deblock_levels,
            cdef_damping=cdef_damping,
            cdef_bits=cdef_bits,
            cdef_y_strengths=(
                (cdef_y_list + [0] * 4) if cdef_bits else [cdef_y] + [0] * 7
            ),
            cdef_uv_strengths=(
                (cdef_uv_list + [0] * 4) if cdef_bits else [cdef_uv] + [0] * 7
            ),
            lrf_types=lrf_types,
            lrf_unit_size=lrf_unit_size,
            enable_segmentation=seg is not None,
            segmentation_features=seg.features if seg is not None else None,
            segmentation_data=seg.data if seg is not None else None,
            film_grain_params=(
                enc.film_grain_params[0]
                if self.seq.film_grain_params_present and enc.film_grain_params
                else None
            ),
        )

        packet_data = bytearray()
        packet_data += temporal_delimiter()
        if frame_type == FrameType.KEY:
            packet_data += sequence_header_obu(self.seq)
        if params is not None and plan.show_frame:
            from rav1e_tpu.encoder.obu import metadata_t35_obu

            for t35 in getattr(params, "t35_metadata", ()) or ():
                packet_data += metadata_t35_obu(t35)
        fh_payload = frame_header_payload(self.seq, fh, self.tiling)
        packet_data += wrap_obu(ObuType.OBU_FRAME_HEADER, fh_payload)
        packet_data += wrap_obu(ObuType.OBU_TILE_GROUP, tile_group)

        # trial re-encode (rate.rs needs_trial_encode): an uncalibrated
        # subtype that badly missed its bitrate target re-encodes once at a
        # corrected quantizer; nothing has been committed yet at this point
        if not self._rc_retry and self.rc.needs_trial_encode(
            len(packet_data) * 8, frame_type, plan.level
        ):
            self.rc.observe_trial(
                len(packet_data) * 8, frame_type, fi.base_q_idx,
                enc.width, enc.height, plan.level,
            )
            self._rc_retry = True
            try:
                # `plan` is passed through, so the fallback-plan branch (and
                # its _fallback_slot rotation) does not run a second time:
                # the retry encodes into the same ref slot as the first try.
                return self.encode_frame(
                    frame, input_frameno, frame_type, params, is_first, plan,
                    next_hints=next_hints,
                )
            finally:
                self._rc_retry = False

        rec.pad()
        self.rec_frame = rec
        self.prev_mvs = frame_blocks.mv[:, :, 0, :].copy()
        if frame_cdfs is not None:
            for i in range(8):
                if (refresh >> i) & 1:
                    self.cdf_buffer[i] = frame_cdfs
        n_hint_bits = self.seq.order_hint_bits_minus_1 + 1
        for i in range(8):
            if (refresh >> i) & 1:
                self.slot_order_hints[i] = plan.order_hint & ((1 << n_hint_bits) - 1)
        src_luma = frame.planes[0].as_array()[: enc.height, : enc.width].copy()
        chain_refs = self._chain_pending_refs
        self._chain_pending_refs = None
        for i in range(8):
            if (refresh >> i) & 1:
                self.rec_buffer[i] = rec
                self.src_buffer[i] = src_luma
                self.slot_src_frameno[i] = input_frameno
                # device-chain slot: the chain's own device recon when this
                # frame was chain-coded, else invalidate (lazy re-upload)
                self._chain_slots[i] = chain_refs
        self.frames_encoded += 1
        self.rc.update_state(
            len(packet_data) * 8, frame_type, fi.base_q_idx, enc.width, enc.height,
            plan.level,
        )
        return Packet(
            data=bytes(packet_data),
            input_frameno=input_frameno,
            frame_type=frame_type,
            qp=fi.base_q_idx,
            rec=rec,
            enc_stats=enc_stats,
            opaque=params.opaque if params is not None else None,
            show_frame=plan.show_frame,
        )

    def _joint_cdef_map(self, rec, frame, frame_blocks, fi, enc,
                        deblocked_planes, damping, y_list, uv_list, state,
                        sb_w, sb_h):
        """Joint CDEF x LRF scoring: per 64x64 SB, pick the CDEF candidate
        minimizing SSE *after* the loop restoration each candidate would get
        (the alternating optimization of the reference's rdo_loop_decision,
        rdo.rs:2104, at frame granularity)."""
        import numpy as np

        from rav1e_tpu.ops.cdef import _frame_scratch, cdef_filter_frame
        from rav1e_tpu.ops.lrf import (
            RestorationState, lrf_decide_units, lrf_filter_frame,
        )

        sb_rows = (enc.height + 63) // 64
        sb_cols = (enc.width + 63) // 64

        def per_sb_sse(frame_obj):
            total = np.zeros((sb_rows, sb_cols), dtype=np.int64)
            for p, plane in enumerate(frame_obj.planes):
                xd, yd = plane.cfg.xdec, plane.cfg.ydec
                pad = plane.cfg.pad
                pw = (enc.width + (1 << xd) - 1) >> xd
                ph = (enc.height + (1 << yd) - 1) >> yd
                d = (
                    plane.data[pad : pad + ph, pad : pad + pw].astype(np.int64)
                    - frame.planes[p].data[pad : pad + ph, pad : pad + pw]
                )
                d *= d
                sbs, sbr = 64 >> xd, 64 >> yd
                dd = np.zeros((sb_rows * sbr, sb_cols * sbs), dtype=np.int64)
                dd[:ph, :pw] = d
                total += dd.reshape(sb_rows, sbr, sb_cols, sbs).sum(axis=(1, 3))
            return total

        sses = []
        for ci in range(4):
            work = _frame_scratch(rec)
            cdef_filter_frame(
                (damping, y_list[ci], uv_list[ci]), work, frame_blocks,
                fi.bit_depth, enc.chroma_sampling, enc.width, enc.height,
                state=state,
            )
            rs_i = RestorationState.build(
                enc.width, enc.height, enc.chroma_sampling, fi.base_q_idx,
                sb_w, sb_h,
            )
            lrf_decide_units(
                rs_i, work, deblocked_planes, frame, enc.width, enc.height,
                fi.bit_depth, enc.chroma_sampling,
            )
            if rs_i.any_filters():
                lrf_filter_frame(
                    rs_i, work, deblocked_planes, enc.width, enc.height,
                    fi.bit_depth, enc.chroma_sampling,
                )
            sses.append(per_sb_sse(work))
        return np.argmin(np.stack(sses), axis=0).astype(np.int32)

    def emit_sef(self, plan) -> Packet:
        """Show-existing-frame packet (internal.rs:1335-1400; header.rs:468)."""
        fh = FrameHeaderInfo(
            width=self.config.enc.width,
            height=self.config.enc.height,
            frame_type=FrameType.INTER,
            show_existing_frame=True,
            frame_to_show_map_idx=plan.slot,
        )
        data = bytearray()
        data += temporal_delimiter()
        data += wrap_obu(
            ObuType.OBU_FRAME_HEADER,
            frame_header_payload(self.seq, fh, self.tiling),
        )
        return Packet(
            data=bytes(data),
            input_frameno=plan.input_frameno,
            frame_type=FrameType.INTER,
            qp=0,
            rec=self.rec_buffer[plan.slot],
        )

    def _encode_tiles(self, fi, frame, rec, frame_blocks, mi_cols, mi_rows, rs=None,
                      cdef_bits=0, cdef_idx_map=None, record=False, replays=None,
                      reuse_from=None, coeff_logs=None):
        """Encode all tiles, in parallel threads when configured
        (reference encoder.rs:3249-3257 rayon par_iter; disjoint TileBlocksMut
        views make tiles data-race free by construction).

        ``record=True`` logs per-tile RDO decisions; ``replays`` (list of
        logs, one per tile) re-encodes with searches skipped — pass 2 then
        reproduces pass 1's block stream exactly (and cheaply)."""
        enc = self.config.enc
        rects = [
            self.tiling.tile_rect_mi(tc, tr, mi_cols, mi_rows)
            for tr in range(self.tiling.rows)
            for tc in range(self.tiling.cols)
        ]

        def one(idx_rect):
            idx, rect = idx_rect
            tx, ty, tw, th = rect
            te = TileEncoder(
                fi, frame, rec, tx, ty, tw, th, enc.speed_settings,
                frame_blocks, rs=rs, cdef_bits=cdef_bits,
                cdef_idx_map=cdef_idx_map,
                decision_log=[] if record else None,
                replay=list(replays[idx]) if replays is not None else None,
                reuse_blocks=reuse_from,
            )
            if coeff_logs is not None:
                te.coeff_log_in = coeff_logs[idx]
            return (te.encode(), te.stats, te.fc, tw * th, te.decision_log,
                    getattr(te, "coeff_log_out", None))

        nthreads = self.config.threads or 0
        if len(rects) > 1 and nthreads != 1:
            from concurrent.futures import ThreadPoolExecutor

            workers = min(len(rects), nthreads or 8)
            with ThreadPoolExecutor(max_workers=workers) as pool:
                results = list(pool.map(one, enumerate(rects)))
        else:
            results = [one(ir) for ir in enumerate(rects)]
        stats = EncoderStats()
        for r in results:
            stats += r[1]
        # frame-end CDFs: largest tile wins (encoder.rs:3331-3336)
        frame_cdfs = max(results, key=lambda r: r[3])[2]
        return (
            [r[0] for r in results], stats, frame_cdfs,
            [r[4] for r in results], [r[5] for r in results],
        )

    def _build_tile_group(self, tile_payloads: List[bytes]) -> bytes:
        """Tile group OBU payload (spec 5.11.1): with one tile there is no
        header at all; with several, a zero tile_start_and_end flag then
        little-endian tile sizes for all but the last tile."""
        from rav1e_tpu.encoder.bitio import BitWriter

        n = len(tile_payloads)
        out = bytearray()
        if n == 1:
            out += tile_payloads[0]
        else:
            hdr = BitWriter()
            hdr.write_bit(0)  # tile_start_and_end_present_flag (all tiles)
            hdr.byte_align()
            out += hdr.done()
            for i, tp in enumerate(tile_payloads):
                if i < n - 1:
                    out += (len(tp) - 1).to_bytes(4, "little")  # tile_size_minus_1
                out += tp
        return bytes(out)
