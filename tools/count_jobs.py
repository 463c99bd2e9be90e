"""Count Spark JOBS submitted by one registry query (VERDICT r14 #2
done-criterion: 'profiler shows fewer jobs/epoch'): runs the query once
(fresh session) and prints the total job count from the status tracker.

Usage: python tools/count_jobs.py NAME [NAME ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod
    from kafka_sink_azure_kusto_spark.plans.registry import clear_gate_memos
    from kafka_sink_azure_kusto_spark.sources.tables import load_table

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
    load_table(spark, SF_DIR, "region").count()
    qs = entrymod.queries()
    def n_jobs_so_far() -> int:
        # AppStatusStore sees EVERY job (all job groups, including the
        # streaming engine's) — statusTracker.getJobIdsForGroup only
        # sees one group
        return spark._jsc.sc().statusStore().jobsList(None).size()

    for name in sys.argv[1:]:
        clear_gate_memos()
        before = n_jobs_so_far()
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        print(json.dumps({"query": name, "n_jobs": n_jobs_so_far() - before}))
        sys.stdout.flush()
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
