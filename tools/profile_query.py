"""Per-call wall-time attribution for ONE registry query (r14
optimization round): runs the query in this process (fresh JVM when
invoked standalone), one discarded cold run then a cProfile'd warm run,
and prints the top call sites by cumulative time.  Because every Spark
action blocks the Python thread in py4j, cumulative time on the
engine's own functions (knn_graph_upsert, localCheckpoint, save,
collect, ...) attributes the query's wall to its phases.

Usage:  python tools/profile_query.py NAME [NAME ...]
Env:    SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
        SPARK_GRAFT_CPUS (default 32), PROFILE_TOP (default 45)
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print("usage: profile_query.py NAME [NAME ...]")
        return 2

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
    top = int(os.environ.get("PROFILE_TOP", "45"))
    for name in names:
        fn = qs[name]
        clear_gate_memos()
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        cold = time.perf_counter() - t0

        clear_gate_memos()
        pr = cProfile.Profile()
        t0 = time.perf_counter()
        pr.enable()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        pr.disable()
        warm = time.perf_counter() - t0
        s = io.StringIO()
        st = pstats.Stats(pr, stream=s)
        st.sort_stats("cumulative")
        st.print_stats(
            r"(kafka_sink_azure_kusto_spark|readwriter|dataframe\.py|"
            r"session\.py|java_gateway)", top
        )
        print(f"==== {name}: cold={cold:.2f}s warm(profiled)={warm:.2f}s ====")
        print("\n".join(s.getvalue().splitlines()[4:]))
        sys.stdout.flush()
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
