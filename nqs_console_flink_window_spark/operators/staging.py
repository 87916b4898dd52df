"""Stage-and-view helper for the CTE-inlining discipline.

Spark inlines multiply-referenced CTEs (every reference re-runs the whole
producing pipeline — the round-4 soak lesson), so engine-side query
builders localCheckpoint each shared stage once and reference it as a temp
view.  This contextmanager owns the repetitive part: checkpoint each
DataFrame, register it under the given name, ALWAYS drop the views on the
way out (the catalog must not accumulate per-call entries in a long-lived
session — the round-3 advisor's band_table finding).

    with staged_views(spark, feats=feats_df, stats=stats_df) as v:
        return spark.sql(f"SELECT ... FROM {v.feats} JOIN {v.stats} ...")

Dropping a view does NOT invalidate the returned DataFrame: Spark resolves
the view at analysis time (spark.sql), so the plan holds the checkpointed
relation, not the catalog name — the pattern every staged query in this
repo already relies on.
"""

from __future__ import annotations

from contextlib import contextmanager
from types import SimpleNamespace


@contextmanager
def staged_views(spark, checkpoint: bool = True, **dfs):
    """Checkpoint (optionally) and register each DataFrame as a temp view
    named ``__staged_<key>``; yield a namespace mapping key -> view name;
    drop every view on exit."""
    import uuid

    # uuid suffix: nested/composed staged queries must not collide on a key
    names: dict[str, str] = {}
    try:
        for key, df in dfs.items():
            staged = df.localCheckpoint() if checkpoint else df
            view = f"__staged_{key}_{uuid.uuid4().hex[:8]}"
            staged.createOrReplaceTempView(view)
            names[key] = view
        yield SimpleNamespace(**names)
    finally:
        for view in names.values():
            spark.catalog.dropTempView(view)
