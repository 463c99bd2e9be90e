"""Config parity tests — modeled on KustoSinkConnectorConfigTest
(defaults, required fields, DLQ pairing, KQL-injection rejection,
SURVEY §5 'Unit: config')."""

import pytest

from kafka_sink_azure_kusto_spark.config import (
    BehaviorOnError,
    ConfigException,
    KustoSinkConfig,
    TopicToTableMapping,
    coalesce_format,
    mapping_kind_for_format,
    parse_table_mappings,
    validate_endpoint_url,
)


def _mk(mappings=None, **kw):
    mappings = mappings or [TopicToTableMapping(topic="t1", db="db1", table="tbl1")]
    return KustoSinkConfig(ingest_url="https://ingest-x.kusto.windows.net", mappings=mappings, **kw)


def test_defaults_match_reference():
    cfg = _mk()
    assert cfg.flush_size_bytes == 1024 * 1024  # KustoSinkConfig.java:242
    assert cfg.flush_interval_ms == 30_000  # KustoSinkConfig.java:253
    assert cfg.retry_max_time_ms == 300_000  # KustoSinkConfig.java:194
    assert cfg.retry_backoff_time_ms == 10_000  # KustoSinkConfig.java:204
    assert cfg.max_retry_attempts == 30  # KustoSinkConfig.java:474-477
    assert cfg.behavior_on_error is BehaviorOnError.FAIL
    assert not cfg.dlq_enabled
    assert not cfg.validate_tables  # kusto.validation.table.enable=false


@pytest.mark.parametrize("bad", ["db;1", "db'1", "db|1", "d b", ""])
def test_kql_injection_rejected(bad):
    # KustoSinkConnectorConfigTest.java:194-263 / TopicToTableMapping.java:90-117
    with pytest.raises(ConfigException):
        TopicToTableMapping(topic="t", db=bad, table="tbl")
    with pytest.raises(ConfigException):
        TopicToTableMapping(topic="t", db="db", table=bad)


def test_format_must_be_alphanumeric():
    with pytest.raises(ConfigException):
        TopicToTableMapping(topic="t", db="db", table="tbl", format="js;on")
    with pytest.raises(ConfigException):
        TopicToTableMapping(topic="t", db="db", table="tbl", format="weird")


def test_dlq_both_or_neither():
    # KustoSinkConfig.java:437-446
    with pytest.raises(ConfigException):
        _mk(dlq_topic_name="dlq.topic")
    with pytest.raises(ConfigException):
        _mk(dlq_bootstrap_servers="localhost:9092")
    cfg = _mk(dlq_bootstrap_servers="localhost:9092", dlq_topic_name="dlq.topic")
    assert cfg.dlq_enabled


def test_flush_minimums():
    with pytest.raises(ConfigException):
        _mk(flush_size_bytes=99)  # min 100 B, KustoSinkConfig.java:239-249
    assert _mk(flush_size_bytes=100).flush_size_bytes == 100


def test_format_coalescing_and_mapping_kind():
    # KustoSinkTask.java:156-174 (E5/E6)
    assert coalesce_format("json") == "multijson"
    assert coalesce_format("singlejson") == "multijson"
    assert coalesce_format("MULTIJSON") == "multijson"
    assert coalesce_format("avro") == "avro"
    assert mapping_kind_for_format("json") == "JSON"
    assert mapping_kind_for_format("avro") == "AVRO"
    assert mapping_kind_for_format("apacheavro") == "APACHEAVRO"
    assert mapping_kind_for_format("csv") == "CSV"


@pytest.mark.parametrize(
    "url",
    [
        # KustoEndpointUrlValidatorTest.java "valid URLs" block
        "https://ingest-mycluster.kusto.windows.net",
        "https://mycluster.kusto.windows.net",
        "https://ingest-mycluster.eastus.kusto.windows.net",
        "https://INGEST-MYCLUSTER.KUSTO.WINDOWS.NET",  # case insensitive
        "https://mycluster.kusto.windows.net/",  # trailing slash
        "https://mycluster.kusto.windows.net:443",  # explicit port
        "https://mycluster.kusto.windows.net/some/path",  # with path
        "https://mycluster.kustomfa.windows.net",  # MFA
        "https://mycluster.kusto.chinacloudapi.cn",  # Azure China
        "https://mycluster.kusto.usgovcloudapi.net",  # US Gov
        "https://mycluster.kustodev.windows.net",  # Dev/Test
        "https://mycluster.kusto.fabric.microsoft.com",  # Fabric
        "https://mycluster.playfab.com",  # PlayFab
        "https://mycluster.kusto.azuresynapse.net",  # Synapse
        "https://mycluster.playfabapi.com",
        "https://mycluster.azureplayfab.com",
        "https://mycluster.kusto.data.microsoft.com",
        "https://mycluster.kusto.core.eaglex.ic.gov",  # sovereign clouds
        "https://mycluster.kusto.core.microsoft.scloud",
        "https://mycluster.kusto.sovcloud-api.fr",
        "https://mycluster.kusto.sovcloud-api.de",
        "https://mycluster.kusto.sovcloud-api.sg",
    ],
)
def test_endpoint_allowlist_accepts_trusted(url):
    # KustoEndpointUrlValidator.java:48-95 (V6) + WellKnownKustoEndpoints.json
    assert validate_endpoint_url(url) == url.strip()


@pytest.mark.parametrize(
    "url",
    [
        "mycluster.kusto.windows.net",
        "ingest-mycluster.kusto.windows.net",
        "mycluster.eastus.kusto.windows.net",
        "mycluster.kusto.chinacloudapi.cn",
        "mycluster.kusto.usgovcloudapi.net",
        "mycluster.kusto.fabric.microsoft.com",
    ],
)
def test_endpoint_allowlist_prepends_https(url):
    assert validate_endpoint_url(url) == "https://" + url


@pytest.mark.parametrize(
    "url",
    [
        "http://mycluster.kusto.windows.net",  # HTTP rejected outright
        "https://evil.attacker.com",
        "evil.attacker.com",
        "https://kusto.windows.net.evil.com",  # subdomain spoof
        "https://evil.attacker.com/ingest",
        "https://internal-service.corp.net",
        "https://not-kusto.microsoft.com",
        "https://kusto-fake.windows.net",  # not *.kusto.windows.net
        "https://kusto.windows.net.attacker.com",
    ],
)
def test_endpoint_allowlist_rejects_untrusted(url):
    # KustoEndpointUrlValidatorTest.java "invalid URLs" block — SSRF guard
    with pytest.raises(ConfigException):
        validate_endpoint_url(url)


def test_parse_table_mappings_and_routing():
    # Fixture from KustoSinkConnectorConfigTest.setupConfigs (FIXTURES.md §4)
    raw = (
        '[{"topic":"topic1","db":"db1","table":"table1","format":"csv"},'
        '{"topic":"topic2","db":"db2","table":"table2","format":"json","mapping":"Mapping"}]'
    )
    ms = parse_table_mappings(raw)
    cfg = KustoSinkConfig(ingest_url="https://x.kusto.windows.net", mappings=ms)
    assert cfg.mapping_for_topic("topic1").table == "table1"
    assert cfg.mapping_for_topic("topic2").mapping == "Mapping"
    with pytest.raises(ConfigException):
        cfg.mapping_for_topic("topic3")  # unmapped ⇒ hard error (F3)

    # wildcard fallback (KustoSinkTaskTest.java:125-144)
    ms_wc = parse_table_mappings(
        raw[:-1] + ',{"topic":"*","db":"dbW","table":"tableW","format":"json"}]'
    )
    cfg_wc = KustoSinkConfig(ingest_url="https://x.kusto.windows.net", mappings=ms_wc)
    assert cfg_wc.mapping_for_topic("topic3").db == "dbW"
    assert cfg_wc.mapping_for_topic("topic1").db == "db1"  # explicit wins


def test_duplicate_topics_rejected():
    raw = '[{"topic":"t","db":"d","table":"x"},{"topic":"t","db":"d","table":"y"}]'
    with pytest.raises(ConfigException):
        parse_table_mappings(raw)


def test_behavior_on_error_parse():
    assert BehaviorOnError.parse("LOG") is BehaviorOnError.LOG
    with pytest.raises(ConfigException):
        BehaviorOnError.parse("explode")


def test_endpoint_allowlist_extra_suffixes_opt_in():
    # Opt-in extension for emulator / self-hosted clusters: the extra
    # suffix admits the host, but ONLY when explicitly configured.
    with pytest.raises(ConfigException):
        validate_endpoint_url("https://kusto.corp.example.com")
    assert (
        validate_endpoint_url("https://kusto.corp.example.com", (".corp.example.com",))
        == "https://kusto.corp.example.com"
    )
    # missing leading dot is normalized; spoofs still rejected
    assert validate_endpoint_url("https://x.corp.example.com", ("corp.example.com",))
    with pytest.raises(ConfigException):
        validate_endpoint_url("https://corp.example.com.evil.io", (".corp.example.com",))


def test_endpoint_allowlist_extra_via_connect_properties():
    cfg = KustoSinkConfig.from_connect_properties(
        {
            "kusto.ingestion.url": "https://ingest.kusto-emu.local.test",
            "kusto.tables.topics.mapping": '[{"topic":"t","db":"d","table":"x"}]',
            "kusto.validation.trusted.endpoints.extra": ".local.test, .corp.example.com",
        }
    )
    assert cfg.ingest_url == "https://ingest.kusto-emu.local.test"
    assert "kusto.validation.trusted.endpoints.extra" not in cfg.extra
