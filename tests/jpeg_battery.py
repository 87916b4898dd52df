"""Deterministic JPEG battery + channel hashing shared by the golden
generator (tools/gen_jpeg_golden.py) and the bit-identity regression test.

The goldens were captured from the round-10 pure-Python decoder BEFORE the
numpy vectorization, so any last-ulp drift in the rewritten IDCT /
level-shift / upsample / YCbCr math shows up as a hash mismatch on real
(AC-rich, subsampled, progressive, restart-segmented) content — not just
on the block-constant fixture family the SQL parity tests pin."""
from __future__ import annotations

import hashlib
import random


def _rand_gray(rng: random.Random, w: int, h: int) -> list[list[int]]:
    return [[rng.randrange(256) for _ in range(w)] for _ in range(h)]


def _rand_rgb(rng: random.Random, w: int, h: int):
    return [
        [(rng.randrange(256), rng.randrange(256), rng.randrange(256))
         for _ in range(w)]
        for _ in range(h)
    ]


def build_battery() -> list[tuple[str, bytes]]:
    """(name, jpeg payload) cases spanning every decode path: baseline /
    progressive, gray / color, all supported subsampling shapes, ragged
    (non-MCU-multiple) dimensions, restart intervals, and the fixture
    block-constant encoder."""
    from tests.test_extensions import (
        _jpeg_encode_baseline,
        _jpeg_encode_progressive,
    )
    from nqs_console_flink_window_spark.operators import multimodal as MM

    rng = random.Random(20260816)
    s420 = [(2, 2), (1, 1), (1, 1)]
    s422 = [(2, 1), (1, 1), (1, 1)]
    s440 = [(1, 2), (1, 1), (1, 1)]
    s411 = [(4, 1), (1, 1), (1, 1)]

    cases: list[tuple[str, bytes]] = [
        ("gray_solid_8x8", _jpeg_encode_baseline([[100] * 8] * 8, gray=True)),
        ("gray_24x24", _jpeg_encode_baseline(_rand_gray(rng, 24, 24), gray=True)),
        ("gray_23x17_ragged",
         _jpeg_encode_baseline(_rand_gray(rng, 23, 17), gray=True)),
        ("color_24x24_444",
         _jpeg_encode_baseline(_rand_rgb(rng, 24, 24), gray=False)),
        ("color_24x24_420",
         _jpeg_encode_baseline(_rand_rgb(rng, 24, 24), gray=False, sampling=s420)),
        ("color_24x24_422",
         _jpeg_encode_baseline(_rand_rgb(rng, 24, 24), gray=False, sampling=s422)),
        ("color_24x24_440",
         _jpeg_encode_baseline(_rand_rgb(rng, 24, 24), gray=False, sampling=s440)),
        ("color_16x16_411",
         _jpeg_encode_baseline(_rand_rgb(rng, 16, 16), gray=False, sampling=s411)),
        ("color_20x12_420_ragged",
         _jpeg_encode_baseline(_rand_rgb(rng, 20, 12), gray=False, sampling=s420)),
        ("gray_24x24_ri1",
         _jpeg_encode_baseline(_rand_gray(rng, 24, 24), gray=True,
                               restart_interval=1)),
        ("color_24x24_420_ri2",
         _jpeg_encode_baseline(_rand_rgb(rng, 24, 24), gray=False,
                               sampling=s420, restart_interval=2)),
        ("prog_gray_24x24",
         _jpeg_encode_progressive(_rand_gray(rng, 24, 24), gray=True)),
        ("prog_gray_24x24_sa",
         _jpeg_encode_progressive(_rand_gray(rng, 24, 24), gray=True, sa=True)),
        ("prog_color_24x24_444_sa",
         _jpeg_encode_progressive(_rand_rgb(rng, 24, 24), gray=False, sa=True)),
        ("prog_color_24x24_420_sa",
         _jpeg_encode_progressive(_rand_rgb(rng, 24, 24), gray=False,
                                  sampling=s420, sa=True)),
        ("fixture_blocks",
         MM.encode_jpeg_gray_blocks(MM._fixture_grid("golden fixture text " * 4))),
    ]
    return cases


def channel_hash(payload: bytes) -> str:
    """sha256 over the decoded (rs, gs, bs, w, h) — every pixel of every
    channel, so a single flipped value anywhere fails the golden."""
    from nqs_console_flink_window_spark.operators import multimodal as MM

    rs, gs, bs, w, h = MM._jpeg_decode_channels(payload)
    blob = ",".join(
        str(int(v)) for ch in (rs, gs, bs) for v in ch
    ) + f"|{w}x{h}"
    return hashlib.sha256(blob.encode()).hexdigest()
