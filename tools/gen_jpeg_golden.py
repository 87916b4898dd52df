"""Regenerate tests/data/jpeg_channel_golden.json from the CURRENT decoder.

Run this ONLY from a tree whose decoder is known-good (every JPEG pytest
green) — the point of the file is to freeze that decoder's exact pixel
output so a later rewrite (e.g. the numpy vectorization) can prove
bit-identity against it.  Usage: python tools/gen_jpeg_golden.py
"""
from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from tests.jpeg_battery import build_battery, channel_hash  # noqa: E402

out = pathlib.Path(__file__).resolve().parents[1] / "tests" / "data"
out.mkdir(parents=True, exist_ok=True)
golden = {name: channel_hash(payload) for name, payload in build_battery()}
path = out / "jpeg_channel_golden.json"
path.write_text(json.dumps(golden, indent=1, sort_keys=True) + "\n")
print(f"wrote {path} ({len(golden)} cases)")
