"""Dump ``explain("formatted")`` for registry queries to files —
the r14 optimization round's plan evidence (plans/r14/<q>_{before,after}.txt).

Usage: python tools/dump_plan.py OUTDIR SUFFIX NAME [NAME ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)

Note: for gate queries that build substrate state eagerly (streaming
loops, store builders), constructing the DataFrame runs the loop; the
dumped plan is the final serving/grading read — the part of the query
whose shape the optimizer controls.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)

    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod
    from kafka_sink_azure_kusto_spark.plans.registry import clear_gate_memos

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "12g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    for name in names:
        clear_gate_memos()
        df = qs[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
