"""Exercise the azure-kusto-ingest-backed backends (K1/K2) against a
stub SDK injected into sys.modules — the bodies are otherwise dead code
in CI since the SDK isn't installed. Asserts the ingest properties the
reference builds (KustoSinkTask.java:145-184) and the managed-streaming
status dispositions (TopicPartitionWriter.java:150-176)."""

import sys
import types

import pytest

from kafka_sink_azure_kusto_spark.streaming.backends import (
    IngestionProperties,
    TransientIngestError,
    streaming_status_accepted,
)


def _install_fake_sdk(monkeypatch, calls, streaming_status="Succeeded"):
    azure = types.ModuleType("azure")
    azure.__path__ = []
    kusto = types.ModuleType("azure.kusto")
    kusto.__path__ = []
    data = types.ModuleType("azure.kusto.data")
    ingest = types.ModuleType("azure.kusto.ingest")

    class KCSB:
        def __init__(self, url, app_id, app_key, authority):
            self.url, self.app_id, self.app_key, self.authority = (
                url, app_id, app_key, authority,
            )

        @classmethod
        def with_aad_application_key_authentication(cls, url, app_id, app_key, authority):
            return cls(url, app_id, app_key, authority)

    class SdkIngestionProperties:
        def __init__(self, database, table, data_format=None, ingestion_mapping_reference=None):
            self.database = database
            self.table = table
            self.data_format = data_format
            self.ingestion_mapping_reference = ingestion_mapping_reference

    class Result:
        def __init__(self, status):
            self.status = status

    class QueuedIngestClient:
        def __init__(self, kcsb):
            self.kcsb = kcsb

        def ingest_from_file(self, path, ingestion_properties):
            calls.append(("queued", path, ingestion_properties))
            return Result("Queued")

    class ManagedStreamingIngestClient:
        def __init__(self, kcsb):
            self.kcsb = kcsb

        @classmethod
        def from_engine_kcsb(cls, kcsb):
            return cls(kcsb)

        def ingest_from_file(self, path, ingestion_properties):
            calls.append(("streaming", path, ingestion_properties))
            return Result(streaming_status)

    data.KustoConnectionStringBuilder = KCSB
    ingest.QueuedIngestClient = QueuedIngestClient
    ingest.ManagedStreamingIngestClient = ManagedStreamingIngestClient
    ingest.IngestionProperties = SdkIngestionProperties
    for name, mod in (
        ("azure", azure),
        ("azure.kusto", kusto),
        ("azure.kusto.data", data),
        ("azure.kusto.ingest", ingest),
    ):
        monkeypatch.setitem(sys.modules, name, mod)


PROPS = IngestionProperties(
    database="db1", table="tbl", format="multijson", mapping_reference="Mapping"
)


def test_queued_backend_builds_sdk_properties(monkeypatch, tmp_path):
    calls = []
    _install_fake_sdk(monkeypatch, calls)
    from kafka_sink_azure_kusto_spark.streaming.backends import QueuedKustoBackend

    b = QueuedKustoBackend(
        ingest_url="https://ingest-c.kusto.windows.net",
        auth={"app_id": "a", "app_key": "k", "authority": "t"},
    )
    f = tmp_path / "x.multijson.gz"
    f.write_bytes(b"x")
    result = b.ingest_file(str(f), PROPS)
    assert result.accepted
    kind, path, sdk_props = calls[0]
    assert kind == "queued" and path == str(f)
    # the property set the reference builds (KustoSinkTask.java:145-184)
    assert sdk_props.database == "db1"
    assert sdk_props.table == "tbl"
    assert sdk_props.data_format == "multijson"
    assert sdk_props.ingestion_mapping_reference == "Mapping"
    assert b._client.kcsb.url == "https://ingest-c.kusto.windows.net"


def test_streaming_backend_engine_url_and_success(monkeypatch, tmp_path):
    calls = []
    _install_fake_sdk(monkeypatch, calls)
    from kafka_sink_azure_kusto_spark.streaming.backends import StreamingKustoBackend

    b = StreamingKustoBackend(ingest_url="https://ingest-c.kusto.windows.net")
    # engine endpoint derived by stripping the DM prefix
    assert b._client.kcsb.url == "https://c.kusto.windows.net"
    f = tmp_path / "x.multijson.gz"
    f.write_bytes(b"x")
    assert b.ingest_file(str(f), PROPS).accepted
    assert calls[0][0] == "streaming"


def test_streaming_backend_failed_status_is_retryable(monkeypatch, tmp_path):
    calls = []
    _install_fake_sdk(monkeypatch, calls, streaming_status="Failed")
    from kafka_sink_azure_kusto_spark.streaming.backends import StreamingKustoBackend

    b = StreamingKustoBackend(ingest_url="https://ingest-c.kusto.windows.net")
    f = tmp_path / "x.multijson.gz"
    f.write_bytes(b"x")
    # Failed ⇒ TransientIngestError ⇒ the sink's retry loop replays it
    # (the hasStreamingSucceeded retry-continue, TopicPartitionWriter.java:107-116)
    with pytest.raises(TransientIngestError):
        b.ingest_file(str(f), PROPS)


@pytest.mark.parametrize(
    "status,accepted",
    [
        ("Succeeded", True),
        ("Queued", True),
        ("Pending", True),
        ("Skipped", True),  # final-but-accepted, warned, no DLQ
        ("PartiallySucceeded", True),
        ("Failed", False),
    ],
)
def test_streaming_status_dispositions(status, accepted):
    # hasStreamingSucceeded parity (TopicPartitionWriter.java:150-176)
    assert streaming_status_accepted(status) is accepted


def test_backends_gate_cleanly_without_sdk():
    from kafka_sink_azure_kusto_spark.streaming.backends import (
        QueuedKustoBackend,
        StreamingKustoBackend,
    )

    assert "azure.kusto.ingest" not in sys.modules
    with pytest.raises(NotImplementedError, match="azure-kusto-ingest"):
        QueuedKustoBackend(ingest_url="https://ingest-c.kusto.windows.net")
    with pytest.raises(NotImplementedError, match="azure-kusto-ingest"):
        StreamingKustoBackend(ingest_url="https://ingest-c.kusto.windows.net")
