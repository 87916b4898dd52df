"""One-off re-run of the K=10 graph-family oracle gate with a tuned DuckDB
connection.

The stock ``tools/check_oracle.py`` uses a default ``duckdb.connect()``;
at the sf1-equivalent K=10 fixture the graph-family oracles (full LSH
chain recompute + 5 unrolled rank iterations) spill >40 GB of DuckDB temp
and died on disk in the round-8 gate.  This runner keeps the COMPARISON
identical (imports ``compare`` from check_oracle) but configures the
oracle engine the way a 128-GiB box should be driven:

- ``preserve_insertion_order=false`` — every registry oracle ends in a
  total ORDER BY (the driver hash contract requires it), so DuckDB is
  free to stream unordered internally; this is the big spill reducer.
- explicit ``temp_directory`` on the large partition, cleaned after.
- ``threads=16`` — fewer concurrent operators, less simultaneous spill.

Usage: python tools/graph_gate_rerun.py <sf_dir> <query> [query ...]
"""

from __future__ import annotations

import pathlib
import shutil
import sys
import time

_REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))
sys.path.insert(0, str(_REPO / "tools"))

import duckdb  # noqa: E402

from check_oracle import compare  # noqa: E402
from nqs_console_flink_window_spark.config import TABLE_NAMES  # noqa: E402
from nqs_console_flink_window_spark.plans import all as _all  # noqa: E402,F401
from nqs_console_flink_window_spark.plans.registry import REGISTRY  # noqa: E402
from nqs_console_flink_window_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir, names = sys.argv[1], sys.argv[2:]
    spill = pathlib.Path("/tmp/duck_spill_gate")
    spill.mkdir(exist_ok=True)
    spark = get_spark("graph-gate-rerun")
    con = duckdb.connect()
    con.execute(f"SET temp_directory='{spill}'")
    con.execute("SET preserve_insertion_order=false")
    con.execute("SET threads=16")
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    failures = 0
    try:
        for name in names:
            q = REGISTRY[name]
            t0 = time.time()
            try:
                sdf = q.spark(spark, sf_dir).toPandas()
                ddf = con.execute(q.sql).fetchdf()
            except Exception as e:  # noqa: BLE001
                print(f"FAIL {name}: {e}", flush=True)
                failures += 1
                continue
            problems = compare(name, sdf, ddf)
            if problems:
                failures += 1
                print(f"FAIL {name}: " + "; ".join(problems), flush=True)
            else:
                print(f"ok   {name}: rows={len(sdf)} [{time.time()-t0:.1f}s]", flush=True)
    finally:
        shutil.rmtree(spill, ignore_errors=True)
    print("ALL GREEN" if failures == 0 else f"{failures} FAILURES", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
