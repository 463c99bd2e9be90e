"""B1/B4 file-assignment tests — modeled on FileWriterTest size-roll
(9 × ~54 B records at threshold 100 ⇒ files of 2 records,
FileWriterTest.java:107-135) and the staged-file naming convention
(TopicPartitionWriterTest.java:142-171)."""

from pyspark.sql import functions as F

from kafka_sink_azure_kusto_spark.operators.batching import (
    staged_file_name,
    with_file_assignment,
)


def _batch(spark, n=9, size=54):
    rows = [("t", 0, i, "x" * (size - 1)) for i in range(n)]
    df = spark.createDataFrame(rows, "topic string, partition long, offset long, line string")
    return df.withColumn("serialized_size", F.length("line") + F.lit(1))


def test_size_roll_two_records_per_file(spark):
    # 54-byte records, threshold 100 ⇒ roll after every 2nd record
    # (FileWriterTest.java:107-135: 4 full files + 1 remainder).
    df = with_file_assignment(_batch(spark), flush_size_bytes=100)
    got = sorted((r.offset, r.file_seq) for r in df.collect())
    by_file = {}
    for off, seq in got:
        by_file.setdefault(seq, []).append(off)
    assert by_file == {0: [0, 1], 1: [2, 3], 2: [4, 5], 3: [6, 7], 4: [8]}


def test_file_offset_is_first_offset(spark):
    df = with_file_assignment(_batch(spark), flush_size_bytes=100)
    got = {r.file_seq: r.file_offset for r in df.collect()}
    assert got == {0: 0, 1: 2, 2: 4, 3: 6, 4: 8}


def test_oversized_record_rolls_alone(spark):
    # flush.size minimum is 100 B; a record larger than the threshold gets
    # its own file (reference: roll fires right after the write).
    rows = [("t", 0, 0, "a" * 250), ("t", 0, 1, "b" * 10), ("t", 0, 2, "c" * 250)]
    df = spark.createDataFrame(rows, "topic string, partition long, offset long, line string")
    df = df.withColumn("serialized_size", F.length("line") + F.lit(1))
    df = with_file_assignment(df, flush_size_bytes=100)
    got = {r.offset: r.file_seq for r in df.collect()}
    # reference semantics: r0 rolls alone (251 B > 100 B right after the
    # write); r1 starts a fresh file and r2 joins it before that file rolls.
    assert got[0] != got[1] and got[1] == got[2]


def test_partition_isolation(spark):
    # file sequences are independent per (topic, partition) — each Kafka
    # partition has its own TopicPartitionWriter in the reference.
    rows = [("t", p, i, "x" * 53) for p in (0, 1) for i in range(4)]
    df = spark.createDataFrame(rows, "topic string, partition long, offset long, line string")
    df = df.withColumn("serialized_size", F.length("line") + F.lit(1))
    df = with_file_assignment(df, flush_size_bytes=100)
    for p in (0, 1):
        by_file = {}
        for r in df.filter(F.col("partition") == p).collect():
            by_file.setdefault(r.file_seq, []).append(r.offset)
        assert sorted(v for vs in by_file.values() for v in vs) == [0, 1, 2, 3]
        assert {len(v) for v in by_file.values()} == {2}


def test_staged_file_name_convention(spark):
    # kafka_{topic}_{partition}_{offset}.{format}.gz (TopicPartitionWriter.java:235-242)
    df = with_file_assignment(_batch(spark, n=3), flush_size_bytes=100)
    named = df.withColumn("name", staged_file_name("json"))
    names = {r.name for r in named.collect()}
    assert "kafka_t_0_0.json.gz" in names
    assert "kafka_t_0_2.json.gz" in names
