"""As-of / range-join semantics tests: inclusive boundary, no-match
nulls, carry-forward across multiple lefts, interval edges, and the
plan shape (hash join, not broadcast-nested-loop)."""

from pyspark.sql import functions as F

from kafka_sink_azure_kusto_spark.operators.asof import asof_join, range_join_bucketed


def _ts(s):
    return f"2024-01-01 {s}"


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts("10:00:00")), (1, 11, _ts("12:00:00")), (2, 20, _ts("09:00:00"))],
        "user_id long, event_id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(1, _ts("10:00:00"), 5.0), (1, _ts("11:30:00"), 7.0), (3, _ts("01:00:00"), 9.0)],
        "user_id long, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {
        r.event_id: r.value_asof
        for r in asof_join(left, right, by=["user_id"], value_cols=["value"]).collect()
    }
    assert out[10] == 5.0  # INCLUSIVE: right row AT left ts matches
    assert out[11] == 7.0  # latest at-or-before, not first
    assert out[20] is None  # no prior right row ⇒ left-join null


def test_asof_join_tie_takes_max(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts("10:00:00"))], "user_id long, event_id long, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(1, _ts("09:00:00"), 3.0), (1, _ts("09:00:00"), 8.0)],
        "user_id long, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    [r] = asof_join(left, right, by=["user_id"], value_cols=["value"]).collect()
    assert r.value_asof == 8.0  # documented tie rule: max per column


def test_asof_join_null_value_is_carried_not_skipped(spark):
    # A matched right row whose value is NULL must yield NULL — not fall
    # through to an OLDER row's value. (Regression: per-column
    # last(ignorenulls) skipped NULL-valued matches.)
    left = spark.createDataFrame(
        [(1, 1, _ts("12:00:00"))], "user_id long, event_id long, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(1, _ts("10:00:00"), 5.0), (1, _ts("11:00:00"), None)],
        "user_id long, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    [r] = asof_join(left, right, by=["user_id"], value_cols=["value"]).collect()
    assert r.value_asof is None  # matched the 11:00 row; its NULL survives


def test_asof_join_null_then_real_value_multi_cols(spark):
    # Multi-column carry: each left row gets the matched row's fields
    # atomically — NULL fields never mix with an older row's fields.
    left = spark.createDataFrame(
        [(1, 1, _ts("10:30:00")), (1, 2, _ts("12:00:00"))],
        "user_id long, event_id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(1, _ts("10:00:00"), 5.0, "a"), (1, _ts("11:00:00"), None, "b")],
        "user_id long, ts string, value double, tag string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {
        r.event_id: (r.value_asof, r.tag_asof)
        for r in asof_join(
            left, right, by=["user_id"], value_cols=["value", "tag"]
        ).collect()
    }
    assert out[1] == (5.0, "a")
    assert out[2] == (None, "b")


def test_range_join_boundaries(spark):
    pts = spark.createDataFrame(
        [(1, 100, _ts("10:00:00")), (1, 101, _ts("11:59:59")),
         (1, 102, _ts("12:00:00")), (2, 200, _ts("10:30:00"))],
        "user_id long, event_id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    iv = spark.createDataFrame(
        [(1, _ts("10:00:00"), _ts("12:00:00"))],
        "user_id long, start_ts string, end_ts string",
    ).withColumn("start_ts", F.col("start_ts").cast("timestamp")).withColumn(
        "end_ts", F.col("end_ts").cast("timestamp")
    )
    got = sorted(
        r.event_id for r in range_join_bucketed(pts, iv, by=["user_id"]).collect()
    )
    # start inclusive, end exclusive, other-key points excluded
    assert got == [100, 101]


def test_range_join_fractional_second_boundaries(spark):
    # Regression: whole-second bucket math dropped points in an
    # interval's final fractional window when end's whole second was
    # bucket-aligned. ns-derived testdata makes fractional ends the norm.
    pts = spark.createDataFrame(
        [(1, 100, "2024-01-01 12:00:00.2"),   # in [10:00:00.5, 12:00:00.5)
         (1, 101, "2024-01-01 12:00:00.5"),   # AT exclusive end ⇒ out
         (1, 102, "2024-01-01 10:00:00.4")],  # before fractional start ⇒ out
        "user_id long, event_id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    iv = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00.5", "2024-01-01 12:00:00.5")],
        "user_id long, start_ts string, end_ts string",
    ).withColumn("start_ts", F.col("start_ts").cast("timestamp")).withColumn(
        "end_ts", F.col("end_ts").cast("timestamp")
    )
    got = sorted(
        r.event_id for r in range_join_bucketed(pts, iv, by=["user_id"]).collect()
    )
    assert got == [100]


def test_range_join_empty_interval_matches_nothing(spark):
    pts = spark.createDataFrame(
        [(1, 100, _ts("10:00:00"))], "user_id long, event_id long, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    iv = spark.createDataFrame(
        [(1, _ts("10:00:00"), _ts("10:00:00"))],  # zero-width
        "user_id long, start_ts string, end_ts string",
    ).withColumn("start_ts", F.col("start_ts").cast("timestamp")).withColumn(
        "end_ts", F.col("end_ts").cast("timestamp")
    )
    assert range_join_bucketed(pts, iv, by=["user_id"]).count() == 0


def test_asof_plan_is_single_shuffle_no_bnlj(spark):
    left = spark.range(100).select(
        (F.col("id") % 5).alias("user_id"), F.col("id").alias("event_id"),
        F.timestamp_seconds(F.col("id") * 60).alias("ts"))
    right = spark.range(50).select(
        (F.col("id") % 5).alias("user_id"),
        F.timestamp_seconds(F.col("id") * 100).alias("ts"),
        (F.col("id") * 1.0).alias("value"))
    plan = asof_join(left, right, by=["user_id"], value_cols=["value"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan  # the whole point
    assert "CartesianProduct" not in plan
