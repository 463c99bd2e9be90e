from kafka_sink_azure_kusto_spark.operators.batching import (  # noqa: F401
    staged_file_name,
    with_file_assignment,
)
