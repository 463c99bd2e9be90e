"""from_connect_properties: the reference's own config JSON must work
verbatim (quickstart kusto-sink-connector.json property names)."""

import pytest

from kafka_sink_azure_kusto_spark.config import (
    AuthStrategy,
    BehaviorOnError,
    ConfigException,
    KustoSinkConfig,
)

QUICKSTART = {
    # docker-quickstart/connector-config/kusto-sink-connector.json shape
    "connector.class": "com.microsoft.azure.kusto.kafka.connect.sink.KustoSinkConnector",
    "tasks.max": "1",
    "topics": "multijson-topic",
    "kusto.ingestion.url": "https://ingest-mycluster.centralus.kusto.windows.net",
    "kusto.query.url": "https://mycluster.centralus.kusto.windows.net",
    "aad.auth.strategy": "application",
    "aad.auth.authority": "tenant-id",
    "aad.auth.appid": "app-id",
    "aad.auth.appkey": "app-key",
    "kusto.tables.topics.mapping": (
        '[{"topic":"multijson-topic","db":"kafkadb","table":"KafkaSinkQuickstart",'
        '"format":"multijson"}]'
    ),
    "key.converter": "org.apache.kafka.connect.storage.StringConverter",
    "value.converter": "org.apache.kafka.connect.storage.StringConverter",
    "flush.size.bytes": "1048576",
    "flush.interval.ms": "30000",
    "behavior.on.error": "LOG",
}


def test_quickstart_properties_verbatim():
    cfg = KustoSinkConfig.from_connect_properties(QUICKSTART)
    assert cfg.ingest_url == "https://ingest-mycluster.centralus.kusto.windows.net"
    assert cfg.flush_size_bytes == 1048576
    assert cfg.flush_interval_ms == 30000
    assert cfg.behavior_on_error is BehaviorOnError.LOG
    assert cfg.auth_strategy is AuthStrategy.APPLICATION
    assert cfg.auth_appid == "app-id"
    m = cfg.mapping_for_topic("multijson-topic")
    assert (m.db, m.table, m.ingest_format) == ("kafkadb", "KafkaSinkQuickstart", "multijson")
    # framework-owned keys preserved under extra, not dropped
    assert cfg.extra["tasks.max"] == "1"


def test_required_properties():
    with pytest.raises(ConfigException, match="kusto.ingestion.url"):
        KustoSinkConfig.from_connect_properties({"kusto.tables.topics.mapping": "[]"})
    with pytest.raises(ConfigException, match="kusto.tables.topics.mapping"):
        KustoSinkConfig.from_connect_properties({"kusto.ingestion.url": "https://x"})


def test_dlq_and_retry_properties():
    props = dict(QUICKSTART)
    props.update(
        {
            "misc.deadletterqueue.bootstrap.servers": "kafka:9092",
            "misc.deadletterqueue.topic.name": "dlq",
            "errors.retry.max.time.ms": "60000",
            "errors.retry.backoff.time.ms": "5000",
            "kusto.validation.table.enable": "true",
            "tempdir.path": "/tmp/staging",
            "proxy.host": "proxy.local",
            "proxy.port": "8080",
        }
    )
    cfg = KustoSinkConfig.from_connect_properties(props)
    assert cfg.dlq_enabled and cfg.dlq_topic_name == "dlq"
    assert cfg.max_retry_attempts == 12
    assert cfg.validate_tables
    assert cfg.staging_dir == "/tmp/staging"
    assert cfg.proxy_port == 8080


def test_auth_matrix():
    props = dict(QUICKSTART)
    del props["aad.auth.appkey"]  # partial application auth → error
    with pytest.raises(ConfigException, match="appkey"):
        KustoSinkConfig.from_connect_properties(props)
    # managed identity doesn't need app credentials
    props2 = dict(QUICKSTART)
    for k in ("aad.auth.appid", "aad.auth.appkey", "aad.auth.authority"):
        del props2[k]
    props2["aad.auth.strategy"] = "managed_identity"
    assert (
        KustoSinkConfig.from_connect_properties(props2).auth_strategy
        is AuthStrategy.MANAGED_IDENTITY
    )


def test_bad_strategy_rejected():
    props = dict(QUICKSTART)
    props["aad.auth.strategy"] = "carrier_pigeon"
    with pytest.raises(ConfigException, match="aad.auth.strategy"):
        KustoSinkConfig.from_connect_properties(props)
