from kafka_sink_azure_kusto_spark.plans.registry import QUERIES, oracle_sql, queries  # noqa: F401
import kafka_sink_azure_kusto_spark.plans.registry_northstar  # noqa: E402,F401 — registers north-star queries
import kafka_sink_azure_kusto_spark.plans.registry_extras  # noqa: E402,F401 — sessionization/skew/sql/streaming
import kafka_sink_azure_kusto_spark.plans.registry_curation  # noqa: E402,F401 — sampling/packing/parquet staging
import kafka_sink_azure_kusto_spark.plans.registry_r5  # noqa: E402,F401 — segment dedup/bloom/splits/SCD2/rolling/salted join
import kafka_sink_azure_kusto_spark.plans.registry_r5b  # noqa: E402,F401 — TPC-H analogs/sketches/integrity/pagerank/regression
import kafka_sink_azure_kusto_spark.plans.registry_streaming2  # noqa: E402,F401 — session windows/stream-static/watermark dedup
import kafka_sink_azure_kusto_spark.plans.registry_windows  # noqa: E402,F401 — RANGE frames/ntile bins/shares/lead-lag gaps
import kafka_sink_azure_kusto_spark.plans.registry_attribution  # noqa: E402,F401 — last-touch attribution/survivorship/co-purchase
import kafka_sink_azure_kusto_spark.plans.registry_r9  # noqa: E402,F401 — substring-span dedup/production multimodal kernels
import kafka_sink_azure_kusto_spark.plans.registry_r9b  # noqa: E402,F401 — within-doc dedup/vocab coverage/theta set-ops/knn graph
import kafka_sink_azure_kusto_spark.plans.registry_tpch2  # noqa: E402,F401 — TPC-H analogs q12/q13/q14/q16
import kafka_sink_azure_kusto_spark.plans.registry_r10  # noqa: E402,F401 — graph-based ANN search/recall audits/calibration
import kafka_sink_azure_kusto_spark.plans.registry_tpch3  # noqa: E402,F401 — TPC-H analogs q2/q9/q11/q20/q21 (derived partsupp)
import kafka_sink_azure_kusto_spark.plans.registry_r11  # noqa: E402,F401 — kNN-graph maintenance/entry-strategy audit
import kafka_sink_azure_kusto_spark.plans.registry_r11b  # noqa: E402,F401 — expectation suite/retrieval eval/hybrid RRF/binary MIH
import kafka_sink_azure_kusto_spark.plans.registry_r12  # noqa: E402,F401 — streaming PQ maintenance/drift retrain gate
import kafka_sink_azure_kusto_spark.plans.registry_r13  # noqa: E402,F401 — nn-descent layered build/vocab maintenance/nprobe ADC
import kafka_sink_azure_kusto_spark.plans.registry_r14  # noqa: E402,F401 — IVF-PQ serving pipeline/vocab-store serving read
