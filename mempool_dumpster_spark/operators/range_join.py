"""Bucketed range join — point-in-interval matching without a θ-join.

The reference's inclusion check asks "which block's time window contains
this receipt" (cmd/merge/inclusioncheck.go:88-191, solved there with an
RPC lookup per hash); the general form every time-series/feature pipeline
needs is RANGE JOIN: match each point row to every interval row with
`start <= point <= end` (optionally sharing equi-keys). Spark has no range
join operator — expressed naively the condition is a θ-join, which the
planner can only run as BroadcastNestedLoop/cartesian: |P|×|I| comparisons,
dead at scale.

The scale-safe distributed form is BUCKET + EQUI-JOIN + RESIDUAL:

    bucket(point)   = floor(point / width)            -- one bucket per point
    buckets(interval)= sequence(floor(start/width),
                               floor(end/width))      -- exploded per interval
    join on (keys..., bucket), then filter start <= point <= end

Each (point, interval) match shares exactly one bucket (the point's), so no
dedup pass is needed. Cost model: the interval side is replicated
`len/width + 1`× — pick `width` near the typical interval length so the
blow-up is ~2× — and the join is a plain hash equi-join that shuffles on
(keys, bucket) and scales linearly. Long-tail intervals fan out across many
buckets but each replica lands in a different bucket partition, so skew
from ONE long interval spreads instead of concentrating (the opposite of a
hot equi-key); a genuinely hot bucket (many intervals overlapping one
window) behaves like any skewed join key and is handled by AQE skew-join.

DuckDB/engines with IEJoin run the same query natively — that is the
oracle for the registered query entry.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
    on: list[str] | None = None,
    how: str = "inner",
    fanout_partitions: int | None = None,
) -> DataFrame:
    """Join each `points` row to every `intervals` row whose
    [start_col, end_col] contains its `point_col` (inclusive both ends),
    matching additionally on the optional `on` equi-keys.

    point/start/end must be numeric (LONG/INT/DOUBLE) in the same unit —
    callers convert timestamps via `epoch_us`/`datediff` first, which keeps
    the operator unit-agnostic. `bucket_width` is in that unit; choose it
    near the typical interval length (replication factor is
    `interval_len / bucket_width + 1`). `how`: 'inner' or 'left' (left =
    keep unmatched points with nulls, like a LEFT range join).

    Output: all point columns + all interval columns (minus the join keys,
    which appear once). Column names must not collide across the two
    sides (keys excepted) — collisions raise. The LEFT form is a single
    LEFT OUTER equi-join with the containment predicate as a join
    residual, so duplicate point rows and NULL-valued point columns are
    both kept exactly once when unmatched — no synthetic ids, no caching,
    deterministic under task retries.

    fanout_partitions: when the interval side is small enough to broadcast,
    the join never shuffles and pair generation runs with the POINT SIDE'S
    scan parallelism — a few-MB points file read as 3 splits that explodes
    into 10^8 pairs serializes on 3 tasks. Set this (e.g. to
    `sc.defaultParallelism`) to round-robin the points first and spread the
    blow-up; leave None at scale, where input splits already provide
    parallelism and an extra shuffle of a huge points side is pure waste.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")
    keys = list(on or [])
    clash = (set(points.columns) & set(intervals.columns)) - set(keys)
    if clash:
        raise ValueError(
            f"columns {sorted(clash)} exist on both sides; rename them or "
            f"list them in `on`"
        )

    w = F.lit(bucket_width)
    if fanout_partitions:
        points = points.repartition(fanout_partitions)
    p = points.withColumn("__bucket", F.floor(F.col(point_col) / w))
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / w), F.floor(F.col(end_col) / w)
            )
        ),
    )
    contained: Column = (F.col(point_col) >= F.col(start_col)) & (
        F.col(point_col) <= F.col(end_col)
    )
    if how == "inner":
        return p.join(iv, [*keys, "__bucket"]).filter(contained).drop("__bucket")
    # LEFT: one LEFT OUTER hash equi-join on (keys, bucket) with the
    # containment predicate folded into the JOIN CONDITION (a residual on
    # the hash join, not a post-filter — a post-filter over a left outer
    # join would wrongly keep a null-padded row for points whose bucket
    # matched but whose containment failed... and then drop it, losing the
    # point entirely).
    #
    # This shape needs no synthetic row id at all. Earlier designs matched
    # inner-first and anti-joined the leftovers via
    # monotonically_increasing_id(), which is nondeterministic across plan
    # re-executions: a task retry or an evicted cache block could renumber
    # rows so matched points reappeared as unmatched (and the persisted
    # midpoint leaked in the cache). A single left outer join evaluates
    # the points side exactly once, keeps duplicate and NULL-keyed point
    # rows each exactly once (unmatched rows pass through null-padded,
    # like any outer join), and leaves nothing persisted behind.
    #
    # Join with explicit per-side column references (condition join, not
    # an on-list) so both sides' key columns stay addressable; the final
    # select takes keys and point columns from the points side — for
    # unmatched rows the interval side is all-null.
    pa = p.alias("__rj_p")
    ia = iv.alias("__rj_i")
    cond = pa["__bucket"] == ia["__bucket"]
    for k in keys:
        cond = cond & (pa[k] == ia[k])
    cond = cond & (pa[point_col] >= ia[start_col]) & (pa[point_col] <= ia[end_col])
    iv_cols = [c for c in intervals.columns if c not in keys]
    return pa.join(ia, cond, "left").select(
        *[pa[c] for c in points.columns], *[ia[c] for c in iv_cols]
    )
