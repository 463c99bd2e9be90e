"""F1–F4 transform tests (modeled on KustoSinkTaskTest routing tests and
the tombstone interleave in KustoSinkIT.java:396-398)."""

from pyspark.sql import functions as F

from kafka_sink_azure_kusto_spark.config import TopicToTableMapping
from kafka_sink_azure_kusto_spark.functions.filters import (
    drop_empty_serializations,
    drop_tombstones,
)
from kafka_sink_azure_kusto_spark.functions.routing import with_route


def _records(spark):
    rows = [
        ("k1", '{"a":1}', "topic1"),
        ("k2", None, "topic1"),  # tombstone
        ("k3", '{"a":2}', "topic2"),
        ("k4", "", "topic2"),  # empty serialization
        ("k5", "{}", "topic3"),  # empty JSON object
        ("k6", '{"a":3}', "topic3"),  # unmapped topic
    ]
    return spark.createDataFrame(rows, "key string, value string, topic string")


def test_tombstone_filter(spark):
    df = drop_tombstones(_records(spark))
    assert df.count() == 5
    assert df.filter(F.col("key") == "k2").count() == 0


def test_empty_serialization_filter(spark):
    df = drop_empty_serializations(_records(spark))
    keys = {r.key for r in df.collect()}
    assert keys == {"k1", "k3", "k6"}


MAPPINGS = [
    TopicToTableMapping(topic="topic1", db="db1", table="table1", format="csv"),
    TopicToTableMapping(
        topic="topic2", db="db2", table="table2", format="json", mapping="Mapping"
    ),
]


def test_routing_explicit_no_wildcard(spark):
    df = with_route(_records(spark), MAPPINGS)
    got = {r.topic: (r.route_db, r.route_table, r.route_format) for r in df.collect()}
    assert got["topic1"] == ("db1", "table1", "csv")
    assert got["topic2"] == ("db2", "table2", "multijson")  # E5 coalesced
    assert got["topic3"] == (None, None, None)  # unmapped ⇒ null route


def test_routing_wildcard_fallback(spark):
    ms = MAPPINGS + [TopicToTableMapping(topic="*", db="dbW", table="tableW")]
    df = with_route(_records(spark), ms)
    got = {r.topic: r.route_table for r in df.collect()}
    assert got["topic1"] == "table1"  # explicit wins
    assert got["topic3"] == "tableW"  # wildcard catches the rest


def test_routing_plan_is_narrow(spark):
    """The routing CASE must not introduce a shuffle (scale guard)."""
    df = with_route(_records(spark), MAPPINGS)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
