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
