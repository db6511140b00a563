"""As-of (nearest-earlier) join — the time-series enrichment primitive.

The reference's inclusion enrichment (cmd/merge/inclusioncheck.go:88-191:
"which block included this tx, given receipt time ≤ inclusion time") is a
special case of the general as-of join every time-series/training pipeline
needs: for each left row, attach the latest right row with the same key and
`right_ts <= left_ts`.

Spark has no ASOF JOIN operator, and the naive formulation — a range
θ-join + per-pair max — explodes into |L|×|R| per key. The scale-safe
distributed form used here is UNION + WINDOW:

    tag right rows side=0, left rows side=1
    union both sides into one frame
    window PARTITION BY key ORDER BY (ts, side, tiebreak)
        last(struct(right_ts, *right_payload), ignorenulls=true)
            over rows unbounded→current   -- one struct: the matched row is atomic
    keep side=1 rows

One shuffle on the join key, one sort within partitions, zero row
amplification — the same work profile as a single window aggregate, at any
scale. Ties at equal ts resolve build-before-probe (side ordering), i.e.
`right_ts <= left_ts` inclusive, matching DuckDB/pandas `merge_asof`
backward semantics. Hot keys behave like any skewed window (salt the key or
pre-aggregate the right side if one key dominates).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    tolerance: Column | None = None,
    right_tiebreak: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the latest right row with equal `on` keys
    and right_ts <= left_ts (backward as-of; left rows with no earlier match
    keep nulls, like a LEFT ASOF JOIN). With direction="forward", the
    EARLIEST right row with right_ts >= left_ts instead; with
    direction="nearest", whichever of the two is closer in time (ties go
    backward) — full pandas merge_asof(direction=...) parity; all
    directions are ts-inclusive.

    right_cols: right-side payload columns to attach (default: everything
    except the keys and timestamp), each renamed with `suffix`. The matched
    right timestamp itself is attached as `asof_ts{suffix}`.
    tolerance: optional max age as an interval Column (e.g.
    `F.expr("INTERVAL 1 HOUR")`) — older matches are nulled out, matching
    pandas merge_asof(tolerance=...).
    right_tiebreak: right-side column ordering rows that share (key, ts) —
    the greatest wins. Without it, equal-ts right rows resolve
    nondeterministically (fine when (key, ts) is unique on the right).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    fwd = direction == "forward"
    rc = right_cols or [c for c in right.columns if c not in [*on, right_ts]]
    out_cols = [c + suffix for c in rc]
    # Fail fast on output-name collisions: if `left` already carries a
    # column named `<right_col><suffix>` (or `asof_ts<suffix>`), the select
    # below would silently emit a duplicate column name and every
    # downstream reference to it would be ambiguous.
    clash = set(left.columns) & {f"asof_ts{suffix}", *out_cols}
    if clash:
        raise ValueError(
            f"asof_join output columns {sorted(clash)} already exist on the "
            f"left side; pass a different suffix or rename/drop them first"
        )

    # The whole matched right row travels as ONE struct, and last(struct,
    # ignorenulls) picks it atomically — taking last() per payload column
    # would stitch values from different right rows whenever a payload
    # column is NULL in the latest row (diverging from merge_asof/DuckDB
    # ASOF semantics, which attach the matched row as a unit).
    r2 = right.select(
        *on,
        F.col(right_ts).alias("__ats"),
        F.lit(0).alias("__side"),
        *(
            [F.col(right_tiebreak).alias("__tie")]
            if right_tiebreak
            else []
        ),
        F.struct(
            F.col(right_ts).alias("__match_ts"),
            *[F.col(c).alias(a) for c, a in zip(rc, out_cols)],
        ).alias("__pkt"),
    )
    l2 = left.withColumn("__ats", F.col(left_ts)).withColumn(
        "__side", F.lit(1)
    )
    u = l2.unionByName(r2, allowMissingColumns=True)

    # Backward scans the past with last() over (unbounded, current); forward
    # mirrors it: first() over (current, unbounded). Side ordering keeps the
    # equal-ts right row INSIDE the frame in both directions (right-before-
    # left for backward, left-before-right for forward); the tiebreak keeps
    # "greatest wins" among equal-(key, ts) right rows — for last() that is
    # ascending (greatest scans last), for first() descending (greatest
    # scans first).
    def hit(forward: bool) -> Column:
        order = [
            F.col("__ats").asc(),
            F.col("__side").desc() if forward else F.col("__side").asc(),
        ]
        if right_tiebreak:
            order.append(
                F.col("__tie").desc_nulls_last()
                if forward
                else F.col("__tie").asc_nulls_last()
            )
        frame = (
            (Window.currentRow, Window.unboundedFollowing)
            if forward
            else (Window.unboundedPreceding, Window.currentRow)
        )
        w = Window.partitionBy(*on).orderBy(*order).rowsBetween(*frame)
        pick = F.first if forward else F.last
        return pick("__pkt", ignorenulls=True).over(w)

    base_cols = [c for c in u.columns if not c.startswith("__")]
    if direction == "nearest":
        # Both scans share one partitioning (one exchange, two sorts); the
        # closer match wins per row, ties go backward (pandas semantics).
        # Distance compares epoch numbers for temporal types so interval
        # arithmetic never enters the abs().
        from pyspark.sql.types import DateType, TimestampNTZType, TimestampType

        temporal = isinstance(
            left.schema[left_ts].dataType,
            (TimestampType, TimestampNTZType, DateType),
        )
        num = (
            (lambda c: F.unix_micros(c.cast("timestamp")))
            if temporal
            else (lambda c: c.cast("double"))
        )
        attached = u.select(
            *base_cols,
            F.col("__side").alias("__side"),
            hit(False).alias("__hb"),
            hit(True).alias("__hf"),
        )
        lts = num(F.col(left_ts))
        db = F.abs(lts - num(F.col("__hb.__match_ts")))
        df_ = F.abs(lts - num(F.col("__hf.__match_ts")))
        attached = attached.withColumn(
            "__hit",
            F.when(F.col("__hf").isNull(), F.col("__hb"))
            .when(F.col("__hb").isNull(), F.col("__hf"))
            .when(db <= df_, F.col("__hb"))
            .otherwise(F.col("__hf")),
        ).drop("__hb", "__hf")
    else:
        attached = u.select(
            *base_cols,
            F.col("__side").alias("__side"),
            hit(fwd).alias("__hit"),
        )
    out = (
        attached.filter(F.col("__side") == 1)
        .select(
            *[c for c in attached.columns if c not in ("__side", "__hit")],
            F.col("__hit.__match_ts").alias(f"asof_ts{suffix}"),
            *[F.col(f"__hit.{c}").alias(c) for c in out_cols],
        )
    )

    if tolerance is not None:
        if direction == "nearest":
            fresh = F.col(f"asof_ts{suffix}").between(
                F.col(left_ts) - tolerance, F.col(left_ts) + tolerance
            )
        elif fwd:
            fresh = F.col(f"asof_ts{suffix}") <= F.col(left_ts) + tolerance
        else:
            fresh = F.col(f"asof_ts{suffix}") >= F.col(left_ts) - tolerance
        for c in [f"asof_ts{suffix}", *out_cols]:
            out = out.withColumn(c, F.when(fresh, F.col(c)))
    return out
