"""Sf1-equivalent (K=10) oracle gate for the graph family, stepwise.

The stock ``tools/check_oracle.py`` runs each registry oracle as ONE
giant WITH-query; at the K=10 mutated fixture the graph-family oracles
(full LSH chain + 5 unrolled rank iterations in a single DuckDB plan)
spill >70 GB of temp and die on disk.  This runner keeps the computation
IDENTICAL — it materializes the very same SQL fragments the registry
oracle composes (minhash_lsh_pairs_sql / pr_edges_sql / pr_iter_sql ...)
as TEMP TABLES, step by step, exactly the way the engine side stages
them — and compares with the same ``compare`` as check_oracle.  Peak
temp per step is one stage's working set instead of the whole chain.

Also sets ``preserve_insertion_order=false`` (every oracle ends in a
total ORDER BY) and an explicit spill directory.

Scope caveat (deliberate): for the stepwise queries this gate compares
SORTED values, so it checks the value multiset at scale but NOT the
engine's output ORDER BY — that ordering is verified by the stock
check_oracle gate at all three native scales, where the one-shot oracles
are tractable.  This tool is the SCALE gate, not a replacement.

Usage: python tools/graph_gate_rerun.py <sf_dir> <query> [query ...]
Supported queries: pagerank_neardup, pagerank_weighted,
cluster_representatives (anything else falls back to the one-shot SQL).
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
from nqs_console_flink_window_spark.functions import dialect as X  # noqa: E402
from nqs_console_flink_window_spark.operators import graph as GR  # noqa: E402
from nqs_console_flink_window_spark.operators.dedup_text import (  # noqa: E402
    minhash_band_selects,
    minhash_signatures_sql,
)
from nqs_console_flink_window_spark.plans import all as _all  # noqa: E402,F401
from nqs_console_flink_window_spark.plans.registry import REGISTRY  # noqa: E402
from nqs_console_flink_window_spark.session import get_spark  # noqa: E402

D = X.DUCK
NODES = "(SELECT doc_id FROM documents)"


def _stage(con, name: str, sql: str) -> None:
    con.execute(f"CREATE OR REPLACE TEMP TABLE {name} AS {sql}")


def _lsh_pairs(con, out: str) -> None:
    """Materialize sig/bands/pairs — the exact minhash_lsh_pairs_sql
    fragments, staged."""
    _stage(con, "sig", minhash_signatures_sql(D, "documents"))
    _stage(con, "bands", "\nUNION ALL\n".join(minhash_band_selects(D)))
    _stage(
        con,
        out,
        "SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b "
        "FROM bands a JOIN bands b ON a.band_id = b.band_id "
        "AND a.band_key = b.band_key AND a.doc_id < b.doc_id",
    )


def _rank_iters(con, edges: str, deg: str, iter_sql) -> str:
    _stage(con, "r0", GR.pr_init_sql(D, NODES))
    for i in range(1, GR.PR_ITERS + 1):
        _stage(con, f"r{i}", iter_sql(D, NODES, edges, deg, f"r{i - 1}"))
    return f"r{GR.PR_ITERS}"


def oracle_pagerank_neardup(con):
    _lsh_pairs(con, "cand")
    _stage(con, "edges", GR.pr_edges_sql("cand"))
    _stage(con, "deg", GR.pr_deg_sql("edges"))
    last = _rank_iters(con, "edges", "deg", GR.pr_iter_sql)
    return con.execute(GR.pr_final_sql(last)).fetchdf()


def oracle_pagerank_weighted(con):
    _lsh_pairs(con, "cand")
    _stage(con, "wp", GR.prw_weights_sql("cand", "sig"))
    _stage(con, "edges", GR.prw_edges_sql("wp"))
    _stage(con, "wout", GR.prw_wout_sql("edges"))
    last = _rank_iters(con, "edges", "wout", GR.prw_iter_sql)
    return con.execute(GR.pr_final_sql(last)).fetchdf()


def oracle_cluster_representatives(con):
    _lsh_pairs(con, "pairs")
    _stage(con, "edges", GR.pr_edges_sql("pairs"))
    # the min-label propagation must stay one recursive query, but it now
    # runs over the MATERIALIZED edge table; the reach body and the final
    # selection are the registry oracle's OWN fragments (no drift)
    _stage(
        con,
        "comp",
        f"""WITH RECURSIVE {GR.cr_reach_cte('edges')}
SELECT node AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY node""",
    )
    _stage(con, "deg", GR.pr_deg_sql("edges"))
    last = _rank_iters(con, "edges", "deg", GR.pr_iter_sql)
    return con.execute(GR.cr_final_sql("comp", last)).fetchdf()


STEPWISE = {
    "pagerank_neardup": oracle_pagerank_neardup,
    "pagerank_weighted": oracle_pagerank_weighted,
    "cluster_representatives": oracle_cluster_representatives,
}


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
                if name in STEPWISE:
                    ddf = STEPWISE[name](con)
                else:
                    ddf = con.execute(q.sql).fetchdf()
                # stepwise oracles skip the outer ORDER BY context: sort
                # the same way the registry oracle orders, by comparing
                # against the Spark frame column order after a stable sort
                if name in STEPWISE:
                    cols = list(sdf.columns)
                    ddf = ddf[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
                    sdf = sdf[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
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
