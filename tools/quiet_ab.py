"""Quiet-box A/B for driver-bench outlier queries (the r11 q1 protocol,
VERDICT r12 next-round #1): each named query runs in its OWN fresh
subprocess JVM — one discarded cold run (session + codegen warmup),
then min-of-3 — against $SPARK_GRAFT_SF_DIR (default sf0.1).

Usage:  python tools/quiet_ab.py q1 q2 ...        (parent: one line/query)
        python tools/quiet_ab.py --one NAME       (child: runs the query)
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _one(name: str) -> None:
    from pyspark.sql import SparkSession

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entrymod

    from kafka_sink_azure_kusto_spark.sources.tables import load_table

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    fn = entrymod.queries()[name]
    load_table(spark, SF_DIR, "region").count()
    from kafka_sink_azure_kusto_spark.plans.registry import clear_gate_memos

    walls = []
    n_runs = int(os.environ.get("QUIET_AB_RUNS", "4"))
    for i in range(n_runs):  # run 0 = discarded cold (JVM + codegen)
        clear_gate_memos()  # standalone-cost contract (see bench.py)
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        walls.append(round(time.perf_counter() - t0, 3))
    print(json.dumps({"query": name, "cold": walls[0],
                      "runs": walls[1:], "min": min(walls[1:])}))


def main() -> int:
    if len(sys.argv) >= 3 and sys.argv[1] == "--one":
        _one(sys.argv[2])
        return 0
    load1 = os.getloadavg()[0]
    print(f"# quiet_ab sf_dir={SF_DIR} load1_at_start={load1:.2f}", flush=True)
    for name in sys.argv[1:]:
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", name],
            capture_output=True, text=True, timeout=1800,
        )
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
        print(line[-1] if line else json.dumps(
            {"query": name, "error": (p.stderr or "no output")[-400:]}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
