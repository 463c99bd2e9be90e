from kafka_sink_azure_kusto_spark.sources.kafka import kafka_source_options, kafka_stream  # noqa: F401
from kafka_sink_azure_kusto_spark.sources.replay import replay_stream, stage_replay_dir  # noqa: F401
