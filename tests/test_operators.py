"""Reusable operator library tests: as-of join (vs a naive reference
computed in Python), salted skew join (identical multiset vs plain
join), top-k helpers."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from oraaud_kafka_spark.operators.asof import asof_join
from oraaud_kafka_spark.operators.skew import salted_join
from oraaud_kafka_spark.operators.topk import topk_global, topk_per_group
from oraaud_kafka_spark.tables import load

SF = "/root/testdata/sf0.001"


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_join_backward_semantics(spark):
    quotes = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), 100.0),
            (1, _ts("2024-01-01 10:05:00"), 101.0),
            (2, _ts("2024-01-01 10:01:00"), 200.0),
        ],
        "sym long, qts timestamp, px double",
    )
    trades = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "t1"),  # equal ts -> match 100
            (1, _ts("2024-01-01 10:04:59"), "t2"),  # before 2nd quote -> 100
            (1, _ts("2024-01-01 10:06:00"), "t3"),  # after 2nd -> 101
            (2, _ts("2024-01-01 10:00:00"), "t4"),  # before any quote -> null
            (3, _ts("2024-01-01 10:00:00"), "t5"),  # key never quoted -> null
        ],
        "sym long, tts timestamp, trade_id string",
    )
    out = asof_join(
        trades,
        quotes,
        on=["sym"],
        probe_ts="tts",
        build_ts="qts",
        value_cols=["px"],
    )
    got = {r.trade_id: r.px for r in out.collect()}
    assert got == {"t1": 100.0, "t2": 100.0, "t3": 101.0, "t4": None, "t5": None}


def test_asof_join_tolerance(spark):
    quotes = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), 100.0)], "sym long, qts timestamp, px double"
    )
    trades = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:30:00"), "near"),
            (1, _ts("2024-01-01 12:00:00"), "far"),
        ],
        "sym long, tts timestamp, trade_id string",
    )
    out = asof_join(
        trades,
        quotes,
        on=["sym"],
        probe_ts="tts",
        build_ts="qts",
        value_cols=["px"],
        tolerance=F.expr("INTERVAL 1 HOUR"),
    )
    got = {r.trade_id: r.px for r in out.collect()}
    assert got == {"near": 100.0, "far": None}


def test_salted_join_matches_plain_join(spark):
    li = load(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    o = load(spark, SF, "orders").select("o_orderkey", "o_orderpriority")
    o = o.withColumnRenamed("o_orderkey", "l_orderkey")
    plain = (
        li.join(o, "l_orderkey")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("q"))
    )
    salted = (
        salted_join(li, o, on="l_orderkey", n_salts=8)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("q"))
    )
    assert sorted(plain.collect()) == sorted(salted.collect())


def test_topk_helpers(spark):
    c = load(spark, SF, "customer")
    top5 = topk_global(c, [F.col("c_acctbal").desc(), F.col("c_custkey")], 5)
    manual = c.orderBy(F.col("c_acctbal").desc(), "c_custkey").take(5)
    assert top5.collect() == manual

    per_seg = topk_per_group(
        c, ["c_mktsegment"], [F.col("c_acctbal").desc(), F.col("c_custkey")], 3
    )
    rows = per_seg.groupBy("c_mktsegment").count().collect()
    assert all(r["count"] == 3 for r in rows)


def test_plan_report_counts(spark):
    from oraaud_kafka_spark.plans.inspect import plan_report

    li = load(spark, SF, "lineitem").filter(F.col("l_partkey") < 100)
    o = load(spark, SF, "orders")
    joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderpriority").count()
    r = plan_report(joined, execute=True)
    assert r.joins, "expected at least one join node"
    assert r.n_shuffles >= 1
    assert any("l_partkey" in f for f in r.pushed_filters)
    assert "l_partkey" in r.scan_reads_only


def test_spread_is_noop_on_wide_input(spark):
    from oraaud_kafka_spark.tables import spread

    df = spark.range(1000).repartition(64)
    out = spread(df, partitions=32)
    assert out is df  # already wider than target: no extra exchange
    narrow = spark.range(1000).coalesce(1)
    assert spread(narrow, partitions=8).rdd.getNumPartitions() == 8


def test_registry_plan_cache_per_session_and_dir(spark):
    """Registered callables memoize the built DataFrame per
    (session, sf_dir): same key returns the identical plan object (no
    rebuild), different sf_dir builds a distinct plan against the other
    fixture set."""
    from oraaud_kafka_spark import registry

    registry.load_all()
    fn = registry.QUERIES["q1_pricing_summary"]
    a = fn(spark, "/root/testdata/sf0.001")
    b = fn(spark, "/root/testdata/sf0.001")
    c = fn(spark, "/root/testdata/sf0.01")
    assert a is b
    assert a is not c
    assert a.count() >= 0 and c.count() >= 0  # both plans executable


def test_fimg_decode_round_trip_and_codec_gate():
    """decode_image inverts encode_fake_image exactly; foreign payloads
    (real codecs) raise the documented NotImplementedError."""
    import numpy as np
    import pytest

    from oraaud_kafka_spark.llm.multimodal import decode_image, encode_fake_image

    payload = encode_fake_image(7, 5, 4)
    arr = decode_image(payload)
    assert arr.shape == (4, 5, 3)
    assert arr.dtype == np.uint8
    assert int(arr.flat[0]) == (7 * 31) % 256
    assert int(arr.flat[59]) == (7 * 31 + 59 * 7) % 256
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n\x1a\n....")
