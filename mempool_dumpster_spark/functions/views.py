"""Per-call unique temp-view registration (r17, r16 advice).

Several query builders register intermediate frames as temp views so a
subsequent `spark.sql` can reference them (the r16 server-side plan
construction). Fixed names (`__jac_arrs`, `__mmr_rr_pool`, …) had two
sharp edges: concurrent query construction in one SparkSession races on
the binding, and `createOrReplaceTempView` silently clobbers a caller's
same-named view. A monotonically-suffixed name per call removes both,
and `drop_views` releases the catalog entries once the consuming
DataFrame has been analyzed (the resolved plan inlines the view subtree,
so dropping the name afterwards cannot affect execution).
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame

_VIEW_SEQ = itertools.count()


def register_temp_view(df: DataFrame, stem: str) -> str:
    """Register `df` under `<stem>_<n>` (n unique per process) and return
    the name — interpolate it into the consuming SQL string."""
    name = f"{stem}_{next(_VIEW_SEQ)}"
    df.createOrReplaceTempView(name)
    return name


def drop_views(result: DataFrame, *names: str) -> DataFrame:
    """Force analysis of `result` (its plan resolves and inlines every
    view subtree), then drop the named temp views so per-call names never
    accumulate in the session catalog. Returns `result` for chaining."""
    result.schema  # noqa: B018 — forces analysis; see docstring
    spark = result.sparkSession
    for n in names:
        spark.catalog.dropTempView(n)
    return result
