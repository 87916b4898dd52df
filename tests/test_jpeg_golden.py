"""Bit-identity goldens for the JPEG decoder.

tests/data/jpeg_channel_golden.json freezes the exact per-pixel channel
output of the round-10 pure-Python decoder over the full battery (baseline
/ progressive, gray / color, every supported subsampling, ragged sizes,
restart intervals, fixture blocks).  The numpy-vectorized decoder must
reproduce every pixel bit-for-bit — a last-ulp drift in IDCT, level shift,
chroma upsample or YCbCr conversion fails the hash.  Regenerate ONLY from
a known-good tree via tools/gen_jpeg_golden.py."""
from __future__ import annotations

import json
import pathlib

import pytest

from tests.jpeg_battery import build_battery, channel_hash

_GOLDEN = json.loads(
    (pathlib.Path(__file__).parent / "data" / "jpeg_channel_golden.json")
    .read_text()
)


@pytest.mark.parametrize("name,payload", build_battery())
def test_jpeg_channels_match_round10_golden(name: str, payload: bytes) -> None:
    assert name in _GOLDEN, f"regenerate goldens: new case {name}"
    assert channel_hash(payload) == _GOLDEN[name], name


def test_huff_lut_cache_evicts_lru_not_all() -> None:
    """Cache pressure must evict the least-recently-used table only: a
    wholesale clear() dropped the hot libjpeg standard tables whenever a
    corpus interleaved >64 distinct custom tables, rebuilding the
    65536-slot LUT on every frame."""
    from nqs_console_flink_window_spark.operators import multimodal as MM

    def table(seed: int):
        # 2 codes of length 2 -> valid canonical table, distinct by vals
        return [0, 2] + [0] * 14, [seed % 256, (seed + 1) % 256]

    MM._HUFF_LUT_CACHE.clear()
    hot = MM._jpeg_huff_table(*table(0))
    hot_key = next(iter(MM._HUFF_LUT_CACHE))
    for s in range(2, 2 + 70, 2):
        MM._jpeg_huff_table(*table(s))
        MM._jpeg_huff_table(*table(0))  # keep the hot table recently used
    assert hot_key in MM._HUFF_LUT_CACHE, "hot table was evicted"
    assert MM._jpeg_huff_table(*table(0)) is hot, "hot table was rebuilt"
    assert len(MM._HUFF_LUT_CACHE) <= 65
