"""Exact arithmetic on uint256 decimal-string columns.

The reference stores value/gasPrice/gasTipCap/gasFeeCap/nonce as decimal
strings because uint256 reaches 2^256−1 ≈ 1.16e77, far past Decimal(38,0)
(SURVEY.md §1.2; reference common/txsummary.go:50-56). These helpers keep
the math EXACT without ever silently casting to long/decimal38:

- ordering/comparison: (length, string) lexicographic — valid for
  normalized non-negative decimal strings (no leading zeros, no sign);
- aggregation: chunked decimal sums — the string is split into 13-digit
  chunks, each chunk summed as Decimal(38,0) (safe past 1e12 rows), and the
  chunk sums are recombined into an exact Python int on the driver. The
  shuffle carries 6 decimals per group, not strings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: 6 chunks × 13 digits = 78 digits ≥ len(str(2^256-1)) = 78
N_CHUNKS = 6
CHUNK_DIGITS = 13
_PAD = N_CHUNKS * CHUNK_DIGITS


def _padded(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.lpad(c, _PAD, "0")


def uint256_chunk(col: Column | str, i: int) -> Column:
    """Chunk i (0 = most significant) as Decimal(38,0)."""
    return F.substring(_padded(col), i * CHUNK_DIGITS + 1, CHUNK_DIGITS).cast(
        "decimal(38,0)"
    )


def uint256_sort_key(col: Column | str) -> Column:
    """Orderable key: (length, value) — lexicographic string compare is
    numeric compare once lengths match."""
    c = F.col(col) if isinstance(col, str) else col
    return F.struct(F.length(c).alias("l"), c.alias("v"))


def uint256_gt(a: Column | str, b: Column | str) -> Column:
    return uint256_sort_key(a) > uint256_sort_key(b)


def uint256_max(col: Column | str) -> Column:
    """Aggregate max — max_by over the sort key."""
    c = F.col(col) if isinstance(col, str) else col
    return F.max_by(c, uint256_sort_key(col))


def uint256_min(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.min_by(c, uint256_sort_key(col))


def uint256_to_double(col: Column | str) -> Column:
    """Approximate numeric view for ratio/percentile-style analytics where
    1-ulp error is acceptable. Never use for equality or exact sums."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("double")


def uint256_sum_exact_df(
    df: DataFrame, col: str, group_by: list[str] | None = None
) -> DataFrame:
    """Exact sum of a uint256 string column as a DataFrame — the scale-safe
    form for ANY group cardinality (nothing is collected; carry propagation
    across the chunk sums happens JVM-side and the result is a normalized
    decimal string column `sum`).

    Each chunk sum is ≤ rows × 10^13, far inside Decimal(38,0) even at
    10^12 rows, so the carries are exact."""
    aggs = [F.sum(uint256_chunk(col, i)).alias(f"c{i}") for i in range(N_CHUNKS)]
    agged = df.groupBy(*group_by).agg(*aggs) if group_by else df.agg(*aggs)
    base = F.lit(10 ** CHUNK_DIGITS).cast("decimal(38,0)")
    digits, carry = [], F.lit(0).cast("decimal(38,0)")
    for i in range(N_CHUNKS - 1, -1, -1):  # least significant first
        t = F.coalesce(F.col(f"c{i}"), F.lit(0).cast("decimal(38,0)")) + carry
        rem = t % base
        digits.append(F.lpad(rem.cast("string"), CHUNK_DIGITS, "0"))
        # (t - rem) is an exact multiple of 10^13 ≤ 10^33, so the division
        # is exact inside decimal(38,6) before the cast back to scale 0
        carry = ((t - rem) / base).cast("decimal(38,0)")
    joined = F.concat(carry.cast("string"), *reversed(digits))
    normalized = F.regexp_replace(joined, "^0+(?=.)", "").alias("sum")
    return agged.select(*(group_by or []), normalized)


def uint256_sum_exact(df: DataFrame, col: str, group_by: list[str] | None = None):
    """Exact sum of a uint256 string column, materialized to Python ints.

    Without grouping returns a Python int. With `group_by` returns a list of
    Rows (group cols + 'sum' int) — NOTE this collects one row per group to
    the driver, so it is only for LOW-cardinality groupings (per-source,
    per-type reports). For arbitrary cardinality use `uint256_sum_exact_df`,
    which stays fully distributed.
    """
    aggs = [
        F.sum(uint256_chunk(col, i)).alias(f"c{i}") for i in range(N_CHUNKS)
    ]
    if group_by:
        rows = df.groupBy(*group_by).agg(*aggs).collect()
        out = []
        for r in rows:
            total = _combine(r)
            out.append({**{g: r[g] for g in group_by}, "sum": total})
        return out
    row = df.agg(*aggs).collect()[0]
    return _combine(row)


def _combine(row) -> int:
    total = 0
    for i in range(N_CHUNKS):
        v = row[f"c{i}"]
        total = total * 10**CHUNK_DIGITS + (int(v) if v is not None else 0)
    return total
