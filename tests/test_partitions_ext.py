"""Extended partitions: AB (HORZ_A/B, VERT_A/B) and 4-way (HORZ_4/VERT_4)
coding, search, and decoder round-trip (reference partition.rs:119-124,
rdo.rs:1825 get_sub_partitions)."""

import collections

import numpy as np
import pytest
from unittest import mock

from rav1e_tpu import Config, EncoderConfig, EncoderStatus, SpeedSettings
from rav1e_tpu.context.writer import ContextWriter
from rav1e_tpu.decoder import decode_packet
from rav1e_tpu.partition import (
    BlockSize,
    PartitionType,
    partition_children,
)


def test_partition_children_geometry():
    bs = BlockSize.BLOCK_32X32
    kids = partition_children(0, 0, bs, PartitionType.PARTITION_HORZ_A)
    assert kids == [
        (0, 0, BlockSize.BLOCK_16X16),
        (4, 0, BlockSize.BLOCK_16X16),
        (0, 4, BlockSize.BLOCK_32X16),
    ]
    kids = partition_children(0, 0, bs, PartitionType.PARTITION_VERT_B)
    assert kids == [
        (0, 0, BlockSize.BLOCK_16X32),
        (4, 0, BlockSize.BLOCK_16X16),
        (4, 4, BlockSize.BLOCK_16X16),
    ]
    kids = partition_children(0, 0, bs, PartitionType.PARTITION_HORZ_4)
    assert kids == [(0, k * 2, BlockSize.BLOCK_32X8) for k in range(4)]
    # children tile the parent exactly
    for p in (
        PartitionType.PARTITION_HORZ_A, PartitionType.PARTITION_HORZ_B,
        PartitionType.PARTITION_VERT_A, PartitionType.PARTITION_VERT_B,
        PartitionType.PARTITION_HORZ_4, PartitionType.PARTITION_VERT_4,
    ):
        area = sum(
            cs.width * cs.height for (_, _, cs) in partition_children(0, 0, bs, p)
        )
        assert area == bs.width * bs.height, p


def test_ab_partitions_emitted_and_round_trip():
    parts = []
    orig = ContextWriter.write_partition

    def spy(self, w, x, y, p, bsize):
        parts.append(int(p))
        return orig(self, w, x, y, p, bsize)

    cfg = Config(
        enc=EncoderConfig(
            width=128, height=128, quantizer=140, low_latency=True,
            speed_settings=SpeedSettings.from_preset(1),
        )
    )
    ctx = cfg.new_context()
    rng = np.random.default_rng(8)
    base = np.zeros((128, 128))
    base[:48] = 200
    base[48:64] = rng.integers(0, 256, (16, 128))
    base[64:] = np.add.outer(np.arange(64), np.arange(128)) % 255
    with mock.patch.object(ContextWriter, "write_partition", spy):
        for t in range(2):
            f = ctx.new_frame()
            for i, p in enumerate(f.planes):
                ch, cw = p.cfg.height, p.cfg.width
                arr = base[:ch, :cw] + rng.integers(-3, 4, (ch, cw))
                p.copy_from(np.clip(arr, 0, 255).astype(np.uint8))
            ctx.send_frame(f)
        ctx.flush()
        pkts = []
        while True:
            try:
                pkts.append(ctx.receive_packet())
            except EncoderStatus.LimitReached:
                break
    state = None
    for p in pkts:
        dec, state = decode_packet(p.data, state)
        for pi, dp in enumerate(dec.planes):
            a = dp.as_array()
            b = p.rec.planes[pi].as_array()
            assert np.array_equal(a, b[: a.shape[0], : a.shape[1]])
    hist = collections.Counter(parts)
    assert any(k >= int(PartitionType.PARTITION_HORZ_A) for k in hist), hist
