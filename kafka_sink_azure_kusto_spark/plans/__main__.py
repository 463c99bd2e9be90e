"""Analytics CLI: run any registry query from the command line.

    python -m kafka_sink_azure_kusto_spark.plans --list
    python -m kafka_sink_azure_kusto_spark.plans q1_pricing_summary \
        [--sf-dir /root/testdata/sf0.01] [--limit 20] [--explain] \
        [--output out.parquet]

Complements the sink CLI (python -m kafka_sink_azure_kusto_spark):
that one runs the streaming dataflow, this one the batch/analytics
surface over the same engine.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="kafka_sink_azure_kusto_spark.plans")
    ap.add_argument("query", nargs="?", help="registry query name")
    ap.add_argument("--list", action="store_true", help="list registry queries")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--limit", type=int, default=20, help="rows to show (0 = all)")
    ap.add_argument("--explain", action="store_true", help="print the physical plan")
    ap.add_argument("--output", help="write the full result as parquet instead")
    ap.add_argument("--master", default="local[*]")
    args = ap.parse_args(argv)

    from kafka_sink_azure_kusto_spark.plans import registry

    names = registry.queries()
    if args.list or not args.query:
        try:
            for n in names:
                print(n)
        except BrokenPipeError:  # `... --list | head` closing the pipe
            pass
        return 0
    if args.query not in names:
        print(f"unknown query {args.query!r}; --list shows all", file=sys.stderr)
        return 2

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(args.master)
        .appName(f"plans:{args.query}")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    df = names[args.query](spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    if args.output:
        df.write.mode("overwrite").parquet(args.output)
        print(f"wrote {args.output}")
    else:
        df.show(args.limit if args.limit > 0 else df.count(), truncate=False)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
