"""Local mimic of the driver's correctness gate.

Runs every registry query on Spark at the given sf dir and the paired oracle
SQL on DuckDB over the same parquet, then compares row count, schema shape,
and values (columns sorted by name, rows sorted by all columns).  Exact match
required for non-floats; floats report max abs diff (target: 0.0).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import pathlib
import sys
import time

import duckdb
import pandas as pd

_REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

from nqs_console_flink_window_spark.config import ORACLE_SF_DIR, TABLE_NAMES  # noqa: E402
from nqs_console_flink_window_spark.plans import all as _all  # noqa: E402,F401
from nqs_console_flink_window_spark.plans.registry import REGISTRY  # noqa: E402
from nqs_console_flink_window_spark.session import get_spark  # noqa: E402


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if len(spark_df) != len(duck_df):
        problems.append(f"rowcount spark={len(spark_df)} duck={len(duck_df)}")
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        problems.append(f"columns spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}")
        return problems
    s, d = normalize(spark_df), normalize(duck_df)
    if len(s) != len(d):
        return problems
    for col in s.columns:
        sc, dc = s[col], d[col]
        if pd.api.types.is_float_dtype(sc) or pd.api.types.is_float_dtype(dc):
            diff = (sc.astype(float) - dc.astype(float)).abs()
            mx = float(diff.max()) if len(diff) else 0.0
            if mx != 0.0:
                problems.append(f"float col {col!r} max|diff|={mx:.3e}")
        else:
            neq = (sc.astype(str) != dc.astype(str))
            if neq.any():
                i = int(neq.idxmax())
                problems.append(
                    f"col {col!r} {int(neq.sum())} mismatches, first@{i}: "
                    f"spark={sc.iloc[i]!r} duck={dc.iloc[i]!r}"
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and "/" in sys.argv[1] else ORACLE_SF_DIR
    only = [a for a in sys.argv[1:] if "/" not in a]
    spark = get_spark("check-oracle")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    failures = 0
    for name, q in REGISTRY.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = q.spark(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if q.sql is None:
            print(f"okNA {name}: rows={len(sdf)} (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            ddf = con.execute(q.sql).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            failures += 1
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"ok   {name}: rows={len(sdf)} [{time.time()-t0:.1f}s]")
    print(f"{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
