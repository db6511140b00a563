"""The analyzer — daily summary report (SURVEY.md §3.2; reference
common/analyzer.go:53-213, cmd/analyze/main.go:46-140).

`analyze()` computes every A6-A17 aggregate off one cached DataFrame;
`render_report()` turns the small collected results into the markdown-style
summary text (driver-side, like the reference's Sprint())."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mempool_dumpster_spark.functions.scalars import human_bytes
from mempool_dumpster_spark.operators import aggregates as A
from mempool_dumpster_spark.operators.joins import was_included_before_received


@dataclass
class AnalyzerResult:
    n_unique: int
    included: list
    by_txtype: list
    by_source: list
    source_inclusion: list
    exclusive: list
    span: list
    distinct: list


def analyze(txs: DataFrame) -> AnalyzerResult:
    """Runs the reference's single-pass analyzer as ~7 aggregates over one
    cached input; excludes already-included-before-received rows up front
    (reference common/analyzer.go:67-74)."""
    t = txs.filter(~was_included_before_received()).persist()
    try:
        return AnalyzerResult(
            n_unique=t.count(),
            included=A.included_split(t).collect(),
            by_txtype=A.count_by_txtype(t).collect(),
            by_source=A.count_by_source(t).collect(),
            source_inclusion=A.source_inclusion_split(t).collect(),
            exclusive=A.exclusive_orderflow(t).collect(),
            span=A.time_span(t).collect(),
            distinct=A.distinct_sorted(t).collect(),
        )
    finally:
        t.unpersist()


def render_report(r: AnalyzerResult) -> str:
    """Markdown summary in the shape of the reference's published daily
    summary.txt (README.md:144-160)."""
    lines = []
    span = r.span[0] if r.span else None
    if span and span["first_ts"] is not None:
        lines.append(
            f"From: {span['first_ts']}  To: {span['last_ts']}  "
            f"Duration: {span['duration_ms']} ms"
        )
    lines.append("")
    lines.append(f"Unique transactions: {r.n_unique:,}")
    inc = {row["included"]: row["n"] for row in r.included}
    n_inc = inc.get(True, 0)
    if r.n_unique:
        pct = int(n_inc / r.n_unique * 1000) / 10  # floor semantics (P10)
        lines.append(f"Included on-chain: {n_inc:,} ({pct}%)")
    lines.append("")
    lines.append("Transactions by type:")
    for row in r.by_txtype:
        lines.append(
            f"  type {row['txType']}: {row['n']:,} txs, "
            f"{human_bytes(row['bytes'] or 0)}"
        )
    lines.append("")
    lines.append("Transactions by source:")
    for row in r.by_source:
        lines.append(f"  {row['source']}: {row['n']:,}")
    if r.exclusive:
        lines.append("")
        lines.append("Exclusive orderflow (single-source txs):")
        for row in r.exclusive:
            flag = "included" if row["included"] else "not included"
            lines.append(f"  {row['source']} ({flag}): {row['n']:,}")
    return "\n".join(lines) + "\n"
