"""Z-order layout (operators/layout.py): the clustered files must carry
tight min-max bounds on EVERY clustered column — that is the property
parquet file/row-group pruning exploits.  Measured, not assumed: compare
the mean per-file normalized bounding-box area of the Z-ordered layout
against a single-column-sorted layout over the same data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nqs_console_flink_window_spark.config import ORACLE_SF_DIR
from nqs_console_flink_window_spark.operators.layout import (
    morton_key,
    normalize_minmax,
    zorder_layout,
)
from nqs_console_flink_window_spark.sources.batch import load_table


def _mean_file_area(spark, path: str) -> float:
    """Mean over files of (user_id span x value span), normalized by the
    global spans — the expected fraction of files a 2-D point predicate
    cannot prune."""
    df = spark.read.parquet(path).withColumn("f", F.input_file_name())
    per_file = df.groupBy("f").agg(
        (F.max("user_id") - F.min("user_id")).alias("du"),
        (F.max("value") - F.min("value")).alias("dv"),
    )
    g = df.agg(
        (F.max("user_id") - F.min("user_id")).cast("double").alias("gu"),
        (F.max("value") - F.min("value")).alias("gv"),
    ).collect()[0]
    rows = per_file.collect()
    return sum((r.du / g.gu) * (r.dv / g.gv) for r in rows) / len(rows)


def test_zorder_files_have_tight_2d_bounds(spark, tmp_path) -> None:
    ev = load_table(spark, ORACLE_SF_DIR, "events").select("user_id", "value", "ts")
    n_files = 16

    z_path = str(tmp_path / "zorder")
    zorder_layout(ev, ["user_id", "value"], n_files).write.parquet(z_path)

    naive_path = str(tmp_path / "naive")
    # the status quo layout: time-sorted (what a streaming writer produces)
    ev.repartitionByRange(n_files, "ts").sortWithinPartitions("ts").write.parquet(
        naive_path
    )

    z_area = _mean_file_area(spark, z_path)
    naive_area = _mean_file_area(spark, naive_path)
    # time-sorted files span ~the full (user_id, value) space (area ~1);
    # Z-ordered files must bound a small fraction of it
    assert naive_area > 0.5
    assert z_area < 0.35
    assert z_area < naive_area / 2
    # row counts preserved
    assert spark.read.parquet(z_path).count() == ev.count()


def test_morton_key_interleaves_and_orders(spark) -> None:
    df = spark.createDataFrame([(0, 0), (3, 0), (0, 3), (3, 3)], ["a", "b"])
    out = df.withColumn(
        "z", morton_key([F.col("a").cast("long"), F.col("b").cast("long")], bits=2)
    ).collect()
    got = {(r.a, r.b): r.z for r in out}
    # bit j of `a` lands at position 2j, of `b` at 2j+1
    assert got[(0, 0)] == 0
    assert got[(3, 0)] == 0b0101
    assert got[(0, 3)] == 0b1010
    assert got[(3, 3)] == 0b1111


def test_morton_key_width_guard() -> None:
    with pytest.raises(ValueError):
        morton_key([F.lit(0).cast("long")] * 4, bits=16)


def test_normalize_minmax_nulls_and_range(spark) -> None:
    df = spark.createDataFrame([(0.0,), (5.0,), (10.0,), (None,)], ["x"])
    norm = df.select(normalize_minmax(df, ["x"], bits=4)[0].alias("n")).collect()
    vals = sorted(r.n for r in norm)
    assert vals[0] == 0 and vals[-1] == 15  # full [0, 2^bits) span
    assert all(0 <= v <= 15 for v in vals)
