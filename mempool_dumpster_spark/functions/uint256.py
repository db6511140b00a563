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


def uint256_sum_exact(df: DataFrame, col: str, group_by: list[str] | None = None):
    """Exact sum of a uint256 string column.

    Without grouping returns a Python int. With `group_by` returns a list of
    Rows (group cols + 'sum' int) — driver-side recombination is O(groups),
    all heavy lifting stays distributed.
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
