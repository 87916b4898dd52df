"""The video family (round 10): REAL MJPEG-in-AVI decode (RIFF container
walk + the repo's T.81 JPEG decoder per frame), per-frame dHash, and the
aligned-frame near-dup semantics — engine == DuckDB text-recomputed oracle
on a hostile corpus, container validation, and frame sampling."""

from __future__ import annotations

import struct

import pytest

from nqs_console_flink_window_spark.functions import dialect as X
from nqs_console_flink_window_spark.operators import multimodal as MM


def _fixture_avi(text: str) -> bytes:
    frames = [
        MM.encode_jpeg_gray_blocks(
            MM._fixture_grid_at(text, f * MM.VIDEO_FRAME_STRIDE)
        )
        for f in range(MM.VIDEO_FRAMES)
    ]
    return MM.encode_avi_mjpeg(frames, 72, 64)


def test_avi_container_roundtrip_and_per_frame_hash_parity() -> None:
    """encode_avi_mjpeg -> _avi_mjpeg_frames recovers the exact JPEG
    payloads, and the decoded per-frame dHash equals the text-grid
    recompute (the JPEG leg's exact block-constant round-trip, per
    frame)."""
    text = "the quick brown fox jumps over the lazy dog " * 4
    frames = [
        MM.encode_jpeg_gray_blocks(
            MM._fixture_grid_at(text, f * MM.VIDEO_FRAME_STRIDE)
        )
        for f in range(MM.VIDEO_FRAMES)
    ]
    avi = MM.encode_avi_mjpeg(frames, 72, 64)
    assert MM._avi_mjpeg_frames(avi) == frames
    for idx, bands, content in MM.decode_video_fp(avi, "video/x-msvideo"):
        grid = MM._fixture_grid_at(text, idx * MM.VIDEO_FRAME_STRIDE)
        assert bands == MM.dhash_bands_from_grid(grid)
        assert content == any(bands)


def test_avi_container_validation_refusals() -> None:
    """Truncated containers, inter-frame codecs, non-RIFF payloads and
    cross-modal mime declarations all raise (the kernel flags them,
    never dies) — the decoder stays honest about what it can decode."""
    avi = _fixture_avi("some genuinely varied text for one clip here")
    with pytest.raises(ValueError):
        MM.decode_video_fp(
            b"RIFF" + struct.pack("<I", 4000) + b"AVI " + b"\x00" * 16, None
        )
    with pytest.raises(ValueError):  # fccHandler != MJPG
        MM._avi_mjpeg_frames(avi.replace(b"MJPG", b"H264", 1))
    with pytest.raises(ValueError):
        MM.decode_video_fp(b"\x00" * 32, "video/mp4")
    with pytest.raises(ValueError):  # image mime must not take the AVI path
        MM.decode_video_fp(avi, "image/png")
    # odd-length frame payloads stay word-aligned in the container
    odd = MM.encode_avi_mjpeg([b"\xff\xd8odd", b"\xff\xd8by"], 8, 8)
    assert MM._avi_mjpeg_frames(odd) == [b"\xff\xd8odd", b"\xff\xd8by"]


def test_video_frame_sampling_keeps_original_indices() -> None:
    """every_n sampling decodes frames 0, n, 2n... and keeps ORIGINAL
    frame indices, so two videos sampled at the same stride stay
    aligned."""
    avi = _fixture_avi("x" + "abcdefghij" * 20)
    fps = MM.decode_video_fp(avi, None, every_n=2)
    assert [i for i, _, _ in fps] == [0, 2]
    full = {i: b for i, b, _ in MM.decode_video_fp(avi, None)}
    for i, bands, _ in fps:
        assert bands == full[i]


def test_video_near_dup_matches_oracle(spark) -> None:
    """Engine pairs over REAL synthesized MJPEG AVIs equal the DuckDB
    text-recomputed oracle on a hostile corpus: exact dups, a near-dup
    (one trailing char changed), NULL text, constant/short texts whose
    frames are all hash-zero (excluded — the uninformative-frame rule),
    multi-byte chars, and a long doc sharing only ONE aligned frame with
    its neighbor (below the 2-frame threshold: no pair)."""
    import duckdb

    rows = [
        (0, "alpha beta\ngamma delta " * 3),
        (1, "alpha beta\ngamma delta " * 3),  # exact dup of 0
        (2, "café au lait résumé " * 4),  # multi-byte chars
        (3, None),  # NULL text: no clip
        (4, "s" * 50),  # all frames hash-zero: excluded
        (5, "t" * 70),  # same
        (6, "completely different filler words that vary a lot here ok"),
        (7, ""),  # empty: hash-zero frames
        (8, "abcdefghij" * 30),
        (9, "abcdefghij" * 30 + "x"),  # near-dup of 8 (tail change)
        (10, "short"),  # one-frame clip (pads are hash-zero)
        (11, "alpha beta\ngamma delta " * 3 + " then it diverges a lot"),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string"
    ).createOrReplaceTempView("documents")
    got = [
        (r["doc_a"], r["doc_b"], r["matched_frames"])
        for r in MM.video_near_dup_df(spark).collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = [
        tuple(r) for r in con.execute(MM.video_near_dup_sql(X.DUCK)).fetchall()
    ]
    assert got == want
    assert (0, 1, 2) in got  # exact dup: both content frames aligned
    assert (8, 9, 3) in got  # near-dup: all three frames within Hamming 3
    assert not any(3 in (a, b) for a, b, _ in got)
    assert not any(4 in (a, b) for a, b, _ in got)  # hash-zero clips
    assert not any(5 in (a, b) for a, b, _ in got)
    # 0 and 11 share only frame 0 -> below the 2-frame threshold
    assert not any({a, b} == {0, 11} for a, b, _ in got)


def test_extract_video_fp_flags_undecodable_payloads(spark) -> None:
    """A corrupt payload in the corpus yields flagged zero rows (row-exact
    accounting), never a dead Spark stage."""
    import pandas as pd

    from pyspark.sql import functions as F

    good = _fixture_avi("plenty of words that differ across the frames ok")
    media = spark.createDataFrame(
        pd.DataFrame(
            {"media_id": [1, 2], "payload": [good, b"\x00bad payload"]}
        )
    ).select(
        "media_id",
        "payload",
        F.struct(F.lit("video/x-msvideo").alias("mime")).alias("meta"),
    )
    out = MM.extract_video_fp(media).collect()
    by_ok = {}
    for r in out:
        by_ok.setdefault(r["decode_ok"], []).append(r)
    assert {r["media_id"] for r in by_ok[False]} == {2}
    assert len(by_ok[False]) == MM.DHASH_BANDS  # one flagged frame's worth
    assert all(r["bv"] == 0 and not r["content"] for r in by_ok[False])
    assert {r["media_id"] for r in by_ok[True]} == {1}


def test_video_dup_clusters_matches_oracle(spark) -> None:
    """Cluster form == the recursive min-label oracle on the hostile
    corpus: exact-dup and near-dup groups merge, hash-zero clips and the
    NULL-text doc stay singletons, and every document gets exactly one
    row."""
    import duckdb

    rows = [
        (0, "alpha beta\ngamma delta " * 3),
        (1, "alpha beta\ngamma delta " * 3),
        (2, "abcdefghij" * 30),
        (3, "abcdefghij" * 30 + "x"),
        (4, None),
        (5, "s" * 50),
        (6, "completely different filler words that vary a lot here ok"),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string"
    ).createOrReplaceTempView("documents")
    got = sorted(
        (r["doc_id"], r["cluster_id"], r["cluster_size"], r["is_canonical"])
        for r in MM.video_dup_clusters_df(spark).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(MM.video_dup_clusters_sql(X.DUCK)).fetchall()
    )
    assert got == want
    by_doc = {d: c for d, c, _, _ in got}
    assert by_doc[0] == by_doc[1]  # exact dups merge
    assert by_doc[2] == by_doc[3]  # near-dups merge
    assert len(got) == len(rows)  # one row per document
    sizes = {d: s for d, _, s, _ in got}
    assert sizes[4] == 1 and sizes[5] == 1  # NULL text / hash-zero clip


def test_decode_features_takes_the_real_video_path() -> None:
    """decode_features on an MJPEG AVI under a video mime returns real
    first-frame image stats + the frame count (slot 8); a malformed AVI
    falls back to the stub, and a video payload under a NON-video mime
    stays on the stub (the typed-dispatch contract)."""
    text = "plenty of genuinely varied words across this one clip here"
    avi = _fixture_avi(text)
    feats = MM.decode_features(avi, "video/x-msvideo")
    assert feats[0] == 72 / 1e4 and feats[1] == 64 / 1e4  # frame dims
    assert feats[8] == float(MM.VIDEO_FRAMES)
    # first-frame luma mean equals the text grid's mean (exact roundtrip)
    grid = MM._fixture_grid_at(text, 0)
    flat = [v for row in grid for v in row]
    assert abs(feats[6] - sum(flat) / len(flat) / 255.0) < 1e-9
    # malformed container -> stub (never raises)
    bad = avi[:40]
    assert MM.decode_features(bad, "video/x-msvideo") == MM._decode_stub(bad)
    # non-video mime declaration -> stub
    assert MM.decode_features(avi, "application/octet-stream") == (
        MM._decode_stub(avi)
    )


def test_video_near_dup_shifted_catches_trimmed_intros(spark) -> None:
    """The shift-tolerant form pairs a clip with its one-frame-shifted
    twin (trimmed intro), which the strict aligned form misses; both
    agree with their DuckDB oracles, and unrelated clips stay unpaired."""
    import duckdb

    base = (
        "the quick brown fox jumps over the lazy dog and keeps running far "
        * 4
    )
    rows = [
        (0, base),
        (1, "x" * MM.VIDEO_FRAME_STRIDE + base),  # one-frame-shifted twin
        (2, "totally different words that do not resemble the others at all"),
        (3, base),  # exact dup of 0
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string"
    ).createOrReplaceTempView("documents")
    strict = [
        (r["doc_a"], r["doc_b"], r["matched_frames"])
        for r in MM.video_near_dup_df(spark).collect()
    ]
    shifted = [
        (r["doc_a"], r["doc_b"], r["matched_frames"])
        for r in MM.video_near_dup_shifted_df(spark).collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    assert strict == [
        tuple(r) for r in con.execute(MM.video_near_dup_sql(X.DUCK)).fetchall()
    ]
    assert shifted == [
        tuple(r)
        for r in con.execute(MM.video_near_dup_shifted_sql(X.DUCK)).fetchall()
    ]
    assert not any({a, b} == {0, 1} for a, b, _ in strict)
    assert any({a, b} == {0, 1} for a, b, _ in shifted)
    assert (0, 3, 3) in shifted  # exact dups still match at delta 0
    assert not any(2 in (a, b) for a, b, _ in shifted)
