"""CLI — the user-facing equivalent of the reference's `mempool-dumpster`
commands (reference cmd/main.go:17-25):

    python -m mempool_dumpster_spark.cli merge \
        --tx day/txs/*.csv --sourcelog day/sourcelog/*.csv \
        [--blacklist prev_day.csv] [--blocks blocks.parquet] --out out/

    python -m mempool_dumpster_spark.cli analyze --transactions out/transactions.parquet

`merge` runs the §3.1 pipeline and writes parquet + metadata CSV + raw CSV
(+ summary.txt); `analyze` re-runs the analyzer on merged parquet.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="mempool-dumpster-spark")
    sub = parser.add_subparsers(dest="command", required=True)

    m = sub.add_parser("merge", help="merge collector CSVs into the daily archive")
    m.add_argument("--tx", nargs="+", required=True, help="transactions CSV/zip paths")
    m.add_argument("--sourcelog", nargs="*", default=[], help="sourcelog CSV paths")
    m.add_argument("--blacklist", nargs="*", default=[], help="known-hash CSV paths")
    m.add_argument(
        "--blocks",
        default=None,
        help="parquet with (hash, block_number, block_timestamp_ms) for the "
        "inclusion check; omit to skip enrichment",
    )
    m.add_argument("--out", required=True, help="output directory")
    m.add_argument("--stats", action="store_true", help="print reject/parse stats")

    a = sub.add_parser("analyze", help="daily summary report from merged parquet")
    a.add_argument("--transactions", required=True, help="merged parquet path")

    args = parser.parse_args(argv)

    from mempool_dumpster_spark.session import get_spark

    spark = get_spark("mempool-dumpster-spark-cli")
    try:
        if args.command == "merge":
            from mempool_dumpster_spark.operators.analyzer import analyze, render_report
            from mempool_dumpster_spark.plans.merge import (
                merge_transactions,
                write_merge_outputs,
            )

            blocks = spark.read.parquet(args.blocks) if args.blocks else None
            result = merge_transactions(
                spark,
                tx_paths=list(args.tx),
                sourcelog_paths=list(args.sourcelog) or None,
                blacklist_paths=list(args.blacklist) or None,
                blocks=blocks,
                collect_stats=args.stats,
            )
            write_merge_outputs(result, args.out)
            report = render_report(analyze(result.transactions))
            with open(f"{args.out}/summary.txt", "w") as f:
                f.write(report)
            print(report)
            if args.stats:
                print(f"stats: {result.stats}")
        else:
            from mempool_dumpster_spark.operators.analyzer import analyze, render_report
            from mempool_dumpster_spark.sources.readers import read_transactions_parquet

            txs = read_transactions_parquet(spark, args.transactions)
            print(render_report(analyze(txs)))
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
