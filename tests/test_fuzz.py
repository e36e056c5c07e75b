"""Seeded fuzz smoke runs (reference fuzz/fuzz_targets + src/fuzzing.rs).

Longer campaigns: ``python -m rav1e_tpu.utils.fuzzing 500``."""

import pytest

from rav1e_tpu.utils import fuzzing


@pytest.mark.parametrize("seed", range(12))
def test_fuzz_construct_context(seed):
    fuzzing.fuzz_construct_context(seed)


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_encode_decode(seed):
    fuzzing.fuzz_encode_decode(seed)


def test_level_enforcement():
    from rav1e_tpu import Config, EncoderConfig
    from rav1e_tpu.config import InvalidConfig
    from rav1e_tpu.config.levels import check_level, minimal_level

    # 2.0 allows up to 2048x1152-ish; a 4096-wide frame must be rejected
    enc = EncoderConfig(width=4096, height=2176, level_idx=0)
    with pytest.raises(InvalidConfig):
        Config(enc=enc).new_context()
    assert check_level(512, 288, 30.0, 0) is None
    assert minimal_level(512, 288, 30.0) == 0
    assert minimal_level(640, 360, 30.0) == 1  # 2.1: pic size > level 2.0 cap
    assert minimal_level(1920, 1080, 30.0) in (8, 9)
    # level 31 = max parameters: everything passes
    enc = EncoderConfig(width=4096, height=2176, level_idx=31)
    Config(enc=enc).validate()
