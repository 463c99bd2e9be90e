from kafka_sink_azure_kusto_spark.plans.registry import QUERIES, oracle_sql, queries  # noqa: F401
