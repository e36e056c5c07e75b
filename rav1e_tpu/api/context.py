"""Pull-based encoding context.

Counterpart of the reference's ``src/api/context.rs`` (``Context``) and
``src/api/internal.rs`` (``ContextInner`` scheduler): frames go in via
``send_frame``, packets come out via ``receive_packet``; flushing drains the
queue; frame reordering follows the inter pyramid configuration.

Round-1 scope: intra frames and low-latency inter ordering (no B-pyramid
reordering yet — output order == input order).  The frame-queue /
frame-data-map structure already mirrors the reference so the pyramid
scheduler drops in later without API change.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from rav1e_tpu.api.util import EncoderStatus, FrameType, Packet
from rav1e_tpu.frame import Frame, FrameParameters

# How many upcoming coded frames to hand the pipeline for async device
# analysis.  On a tunneled TPU the per-dispatch round-trip (~30-50 ms)
# exceeds one frame's host coding time, so depth 1 leaves the encoder
# blocked on the fetch; 3 frames of lead amortize it to zero.
ANALYSIS_PREFETCH_DEPTH = 3


class Context:
    """Encoding context created by :meth:`rav1e_tpu.Config.new_context`."""

    def __init__(self, config):
        from rav1e_tpu.encoder.pipeline import FramePipeline

        self.config = config
        self.is_flushing = False
        self.inner = ContextInner(config)
        self.pipeline = FramePipeline(config)

    # ---- frame ingestion ---------------------------------------------------

    def new_frame(self) -> Frame:
        e = self.config.enc
        return Frame.new(e.width, e.height, e.chroma_sampling, e.bit_depth)

    def send_frame(
        self, frame: Optional[Frame], params: Optional[FrameParameters] = None
    ) -> None:
        """Queue a frame for encoding; ``None`` initiates a flush.

        Raises :class:`EncoderStatus.EnoughData` if the queue is full and
        packets must be drained first (mirrors ``api/context.rs:108-137``).
        """
        if frame is None:
            if not self.is_flushing:
                self.is_flushing = True
                self.inner.limit = self.inner.next_frameno
        elif self.is_flushing:
            raise EncoderStatus.EnoughData()
        else:
            inner = self.inner
            if (
                inner.config.enc.still_picture
                and inner.next_frameno > 0
            ):
                raise EncoderStatus.EnoughData()
            inner.send_frame(frame, params)

    # ---- packet retrieval --------------------------------------------------

    def receive_packet(self) -> Packet:
        """Encode and return the next packet in output order.

        Raises ``EncoderStatus.NeedMoreData`` when more input is required,
        ``EncoderStatus.LimitReached`` when flushing completes.
        """
        return self.inner.receive_packet(self.pipeline, self.is_flushing)

    def flush(self) -> None:
        self.send_frame(None)

    # ---- stream metadata ---------------------------------------------------

    def container_sequence_header(self) -> bytes:
        """AV1CodecConfigurationRecord for container muxing
        (reference: ``api/context.rs:341``)."""
        from rav1e_tpu.encoder.obu import av1_codec_configuration_record

        return av1_codec_configuration_record(self.config.enc)

    # ---- two-pass rate control ---------------------------------------------

    def twopass_out(self) -> Optional[bytes]:
        """First-pass rate data (reference api/context.rs:159)."""
        return self.pipeline.rc.twopass_out()

    def twopass_in(self, data: bytes) -> int:
        """Feed first-pass data for a second pass."""
        return self.pipeline.rc.twopass_in(data)


class ContextInner:
    """Frame scheduler: owns the input frame queue and encode ordering.

    Mirrors the structure of the reference's ``ContextInner``
    (``api/internal.rs:221-234``): ``frame_q`` maps input_frameno -> Frame;
    encoded state is tracked per output_frameno.
    """

    def __init__(self, config):
        from collections import deque

        from rav1e_tpu.api.inter_cfg import InterConfig

        self.config = config
        self.frame_q: Dict[int, Optional[Frame]] = {}
        self.frame_params: Dict[int, Optional[FrameParameters]] = {}
        self.next_frameno = 0  # next input frameno to accept
        self.next_output_frameno = 0
        self.frames_processed = 0
        self.limit: Optional[int] = None
        self.keyframes = {0}
        self._last_luma_ds = None  # 8x-downsampled luma for scene detection
        self.rc_state = None
        self.packet_count = 0
        self.inter_cfg = InterConfig(config.enc.low_latency)
        self.plan = deque()          # coding-order PlannedFrame queue
        self.plan_next_input = 0     # first input frameno not yet planned
        self.gop_input_start = 0
        self._p_slot_cycle = 0       # slot cycle for partial-group P frames
        self._p_prev_slot = 0

    def send_frame(self, frame: Frame, params: Optional[FrameParameters]) -> None:
        frame.pad()
        self.frame_q[self.next_frameno] = frame
        self.frame_params[self.next_frameno] = params
        self._detect_keyframe(self.next_frameno, frame, params)
        self.next_frameno += 1

    def _detect_keyframe(self, frameno: int, frame: Frame, params) -> None:
        """Keyframe placement: forced overrides, keyint limits, and fast
        pixel-difference scene detection (capability counterpart of the
        reference's av-scenechange Fast mode, api/internal.rs:276-300)."""
        e = self.config.enc
        if params is not None and params.frame_type_override == "key":
            self.keyframes.add(frameno)
            self._last_luma_ds = self._downsample_luma(frame)
            return
        last_kf = max(k for k in self.keyframes if k <= frameno) if frameno else 0
        distance = frameno - last_kf
        cur = self._downsample_luma(frame)
        scene_cut = False
        from rav1e_tpu.config import SceneDetectionSpeed

        def shifted_mad(c, prev, thr=None):
            import numpy as np

            # motion-robust: min difference over small global shifts (2x
            # downsample, +-3 ds px = +-6 source px) so pans don't read as
            # cuts.  Every caller only compares the result against a
            # threshold, so once any shift's MAD falls to `thr` or below the
            # decision is fixed and the remaining shifts are skipped; shifts
            # are visited center-outward so the common no-cut / steady-pan
            # case exits after a few of the 49 candidates.
            best = None
            h, w = c.shape
            r = 3 if (h > 8 and w > 8) else 0
            offs = sorted(
                ((dy, dx) for dy in range(-r, r + 1) for dx in range(-r, r + 1)),
                key=lambda o: abs(o[0]) + abs(o[1]),
            )
            for dy, dx in offs:
                a = c[max(dy, 0) : h + min(dy, 0), max(dx, 0) : w + min(dx, 0)]
                b = prev[max(-dy, 0) : h + min(-dy, 0), max(-dx, 0) : w + min(-dx, 0)]
                mad = float(np.abs(a - b).mean())
                best = mad if best is None else min(best, mad)
                if thr is not None and best <= thr:
                    break
            return best

        if (
            e.speed_settings.scene_detection_mode != SceneDetectionSpeed.NoDetection
            and self._last_luma_ds is not None
            and frameno > 0
        ):
            import numpy as np

            prev = self._last_luma_ds.astype(np.int32)
            c = cur.astype(np.int32)
            if e.speed_settings.scene_detection_mode == SceneDetectionSpeed.Standard:
                # Standard mode: inter-vs-intra cost comparison (reference
                # av-scenechange cost mode, doc/FRAME_TYPE_SELECTION.md):
                # cut when the temporal prediction error approaches the
                # spatial (intra) complexity of the frame.  cut <=> best >
                # max(0.9*intra, 6*scale), so that max is the early-exit
                # threshold.
                gx = np.abs(np.diff(c.astype(np.float64), axis=1)).mean()
                gy = np.abs(np.diff(c.astype(np.float64), axis=0)).mean()
                intra_cost = max((gx + gy) * 0.5, 1e-3)
                thr = max(0.9 * intra_cost, 6.0 * (1 << (e.bit_depth - 8)))
                scene_cut = shifted_mad(c, prev, thr) > thr
            else:
                thr = 14.0 * (1 << (e.bit_depth - 8))
                scene_cut = shifted_mad(c, prev, thr) > thr
            # flash suppression (av-scenechange behavior,
            # doc/FRAME_TYPE_SELECTION.md): when this frame returns to the
            # content from *two* frames ago, the previous frame was a flash —
            # suppress this cut and retract the flash's own keyframe if the
            # scheduler hasn't consumed it yet
            if scene_cut and getattr(self, "_prev2_luma_ds", None) is not None:
                thr2 = 7.0 * (1 << (e.bit_depth - 8))
                mad2 = shifted_mad(c, self._prev2_luma_ds.astype(np.int32), thr2)
                if mad2 <= 7.0 * (1 << (e.bit_depth - 8)):
                    scene_cut = False
                    flash = frameno - 1
                    if (
                        flash == getattr(self, "_last_scene_cut", None)
                        and flash in self.keyframes
                        and flash >= self.plan_next_input
                    ):
                        self.keyframes.discard(flash)
        self._prev2_luma_ds = self._last_luma_ds
        self._last_luma_ds = cur
        if distance >= e.max_key_frame_interval:
            self.keyframes.add(frameno)
        elif scene_cut and distance >= e.min_key_frame_interval:
            self.keyframes.add(frameno)
            self._last_scene_cut = frameno

    @staticmethod
    def _downsample_luma(frame: Frame):
        import numpy as np

        y = frame.planes[0].as_array()
        h2, w2 = (y.shape[0] // 2) * 2, (y.shape[1] // 2) * 2
        if h2 == 0 or w2 == 0:
            return y.astype(np.uint16)
        return (
            y[:h2, :w2]
            .reshape(h2 // 2, 2, w2 // 2, 2)
            .mean(axis=(1, 3))
            .astype(np.uint16)
        )

    def _next_keyframe_after(self, f: int) -> Optional[int]:
        later = [k for k in self.keyframes if k > f]
        return min(later) if later else None

    def _extend_plan(self, is_flushing: bool) -> None:
        """Schedule the next GOP chunk in coding order (counterpart of the
        reference's output_frameno mapping, internal.rs:1593+)."""
        from rav1e_tpu.api.inter_cfg import PlannedFrame

        s = self.plan_next_input
        if self.limit is not None and s >= self.limit:
            raise EncoderStatus.LimitReached()
        if s not in self.frame_q and s >= self.next_frameno:
            raise EncoderStatus.NeedMoreData()

        if s in self.keyframes:
            self.gop_input_start = s
            self._p_slot_cycle = 0
            self._p_prev_slot = 0
            self.plan.append(PlannedFrame("key", s, order_hint=0, slot=0))
            self.plan_next_input = s + 1
            return

        ic = self.inter_cfg
        end = self.limit if self.limit is not None else None
        next_kf = self._next_keyframe_after(s - 1)
        horizon = s + ic.group_input_len  # inputs s..s+3 must exist, no KF inside
        can_pyramid = (
            ic.reorder
            and (next_kf is None or next_kf >= horizon)
            and (end is None or end >= horizon)
            and (s - self.gop_input_start - 1) % ic.group_input_len == 0
        )
        if can_pyramid and self.next_frameno < horizon and not is_flushing:
            raise EncoderStatus.NeedMoreData()  # reordering latency
        if can_pyramid and self.next_frameno >= horizon:
            group = ic.plan_group(s, self.gop_input_start)
            self._lookahead_group(group)
            self.plan.extend(group)
            self.plan_next_input = s + ic.group_input_len
            return

        # low-latency / partial-group P frame
        if s not in self.frame_q:
            raise EncoderStatus.NeedMoreData()
        if ic.reorder:
            # partial tail: explicit slot cycling independent of pyramid math
            slot = self._p_slot_cycle % 4
            prev = self._p_prev_slot
            self._p_slot_cycle += 1
            self._p_prev_slot = slot
        else:
            slot = (s - self.gop_input_start) % 4
            prev = (slot + 3) % 4
        p = ic.plan_p(s, self.gop_input_start, prev, slot)
        sfi = self.config.enc.switch_frame_interval
        if (
            sfi > 0
            and not ic.reorder
            and s != self.gop_input_start
            and (s - self.gop_input_start) % sfi == 0
        ):
            p.switch = True
        self.plan.append(p)
        self.plan_next_input = s + 1

    def _lookahead_group(self, group) -> None:
        """Temporal-RDO lookahead for one pyramid group (capability
        counterpart of internal.rs:912-1259): estimate per-8x8 intra/inter
        costs for the group's inputs, back-propagate block importance along
        each B frame's backward-anchor motion, and attach the accumulated
        grids to the anchor/mid PlannedFrames.  Skipped when temporal RDO
        is disabled by the speed preset."""
        import numpy as np

        from rav1e_tpu.encoder import lookahead as la

        e = self.config.enc
        if not getattr(e.speed_settings, "temporal_rdo", True):
            return
        inters = [g for g in group if g.kind == "inter"]
        frames = {}
        for g in inters:
            f = self.frame_q.get(g.input_frameno)
            if f is None:
                return
            p = f.planes[0]
            frames[g.input_frameno] = p.as_array()[: e.height, : e.width]
        bd = e.bit_depth
        data = {
            no: la.LookaheadData(la.estimate_intra_costs(y, bd))
            for no, y in frames.items()
        }
        # display order, each B propagating to its backward anchor
        order = sorted(inters, key=lambda g: g.input_frameno)
        anchor_no = order[-1].input_frameno
        for g in order[:-1]:
            # backward anchor in input order: the next group frame at a
            # shallower pyramid level (s,s+2 -> s+1/s+3; s+1 -> s+3)
            step = 1 if g.level == 2 else 2
            tgt = g.input_frameno + step
            if tgt not in frames:
                tgt = anchor_no
            src_y, ref_y = frames[g.input_frameno], frames[tgt]
            mvs, _ = la.lookahead_motion(src_y, ref_y, bd)
            inter = la.inter_costs_8x8(mvs, src_y, ref_y, bd)
            d = data[g.input_frameno]
            d.inter, d.mvs = inter, mvs
            la.propagate_importance(
                d.importances, d.intra, inter, mvs, data[tgt].importances
            )
        for g in inters:
            d = data[g.input_frameno]
            if d.importances.any():
                g.importances = d.importances
                g.la_intra = d.intra

    def _peek_next_hint(self, is_flushing: bool):
        """The next *coded* plan entry + its queued frame (depth-1 view of
        :meth:`_peek_next_hints`)."""
        hints = self._peek_next_hints(is_flushing, 1)
        return hints[0] if hints else None

    def _peek_next_hints(self, is_flushing: bool, k: int):
        """Up to ``k`` upcoming *coded* plan entries + their queued frames,
        in encode order, for the pipeline's async device-analysis
        predispatch.  Stops at the first entry whose frame is not queued
        yet (deeper entries would encode after it anyway).  The plan
        extends lazily; try extending when too few entries exist — with
        insufficient lookahead the extension raises (NeedMoreData), which
        just means fewer hints (send-pattern determinism is unaffected:
        extension is a pure function of the frames available)."""
        for attempt in range(2):
            hints = []
            complete = True
            for e2 in self.plan:
                if e2.kind == "sef":
                    continue
                if e2.input_frameno not in self.frame_q:
                    complete = False
                    break
                hints.append((e2, self.frame_q[e2.input_frameno]))
                if len(hints) >= k:
                    break
            if len(hints) >= k or attempt == 1 or not complete:
                return hints
            try:
                self._extend_plan(is_flushing)
            except Exception:
                return hints
        return hints

    def receive_packet(self, pipeline, is_flushing: bool) -> Packet:
        while not self.plan:
            self._extend_plan(is_flushing)
        entry = self.plan[0]

        if entry.kind == "sef":
            self.plan.popleft()
            packet = pipeline.emit_sef(entry)
            self.packet_count += 1
            # a show-existing packet codes nothing: use the gap to
            # pre-dispatch the next real frame's device analysis
            if hasattr(pipeline, "predispatch_idle"):
                pipeline.predispatch_idle(
                    self._peek_next_hints(is_flushing, ANALYSIS_PREFETCH_DEPTH)
                )
            return packet

        in_no = entry.input_frameno
        if in_no not in self.frame_q:
            raise EncoderStatus.NeedMoreData()
        self.plan.popleft()
        frame = self.frame_q[in_no]
        params = self.frame_params[in_no]
        frame_type = FrameType.KEY if entry.kind == "key" else FrameType.INTER
        next_hints = self._peek_next_hints(is_flushing, ANALYSIS_PREFETCH_DEPTH)
        packet = pipeline.encode_frame(
            frame,
            input_frameno=in_no,
            frame_type=frame_type,
            params=params,
            is_first=(self.packet_count == 0),
            plan=entry,
            next_hints=next_hints,
        )
        # garbage-collect consumed input (reference: internal.rs:1564)
        del self.frame_q[in_no]
        del self.frame_params[in_no]
        self.next_output_frameno += 1
        self.packet_count += 1
        return packet
