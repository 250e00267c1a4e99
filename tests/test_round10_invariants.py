"""Internal-consistency invariants of the round-10 scale re-shapes —
each fixed query's segmented/bucketed form must equal the naive
single-window form it replaced, on real fixture data, with bucket
widths small enough to force every merge level."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from oraaud_kafka_spark import registry
from oraaud_kafka_spark.tables import load

registry.load_all()


def test_late_data_segmented_prefix_max_matches_plain_window(spark, sf_dir):
    """q_time_late_data's two-level segmented running max (round-10
    re-shape of the unpartitioned ORDER BY event_id window) must be
    exactly the plain global-window computation. _w=16/_sb=4 on the
    1000-event fixture forces ~63 buckets across ~16 superbuckets, so
    both merge levels carry real offsets."""
    fn = registry.QUERIES["q_time_late_data"].__wrapped__
    got = fn(spark, sf_dir, _w=16, _sb=4).toPandas()

    e = load(spark, sf_dir, "events")
    w = Window.orderBy("event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    lateness = F.max("ts").over(w).cast("long") - F.col("ts").cast("long")
    want = (
        e.select("event_type", lateness.alias("lateness_s"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.when(F.col("lateness_s") >= 600, 1).otherwise(0)).alias(
                "n_late"
            ),
        )
        .orderBy("event_type")
        .toPandas()
    )
    assert got.values.tolist() == want.values.tolist()


def test_late_data_segmented_handles_null_ts_prefix(spark):
    """greatest() must reproduce the plain window's NULL semantics: an
    all-NULL-ts prefix keeps the running max NULL (lateness NULL, not
    counted late); a NULL after a real max leaves lateness NULL too."""
    rows = [
        (0, "a", None),
        (1, "a", None),
        (2, "a", "2024-01-01 00:00:00"),
        (3, "a", None),
        (4, "a", "2024-01-01 02:00:00"),
        (5, "a", "2024-01-01 00:30:00"),  # 1.5h late vs id-4 max
    ]
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, "event_id bigint, event_type string, ts_s string"
        ).select(
            "event_id", "event_type", F.to_timestamp("ts_s").alias("ts")
        ).write.parquet(os.path.join(d, "events.parquet"))
        fn = registry.QUERIES["q_time_late_data"].__wrapped__
        got = fn(spark, d, _w=2, _sb=2).toPandas()
    assert got.values.tolist() == [["a", 6, 1]]


def test_drawdown_segmented_running_peak_matches_plain_window(spark, sf_dir):
    """q_window_max_drawdown's month-segmented running peak (round-10
    re-shape of the 5-value-partition window) must equal the naive
    per-priority single-window computation on the orders fixture."""
    got = registry.QUERIES["q_window_max_drawdown"].__wrapped__(
        spark, sf_dir
    ).toPandas()

    o = load(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    series = o.select(
        "o_orderpriority",
        cents.alias("cents"),
        F.max(cents).over(w).cast("bigint").alias("run_peak"),
    )
    g = series.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_rows"),
        F.max("run_peak").cast("bigint").alias("peak_cents"),
        F.max(F.col("run_peak") - F.col("cents"))
        .cast("bigint")
        .alias("max_dd_cents"),
    )
    want = g.select(
        "o_orderpriority",
        "n_rows",
        F.round(F.col("peak_cents").cast("double") / 100, 6).alias(
            "peak_dollars"
        ),
        F.round(F.col("max_dd_cents").cast("double") / 100, 6).alias(
            "max_drawdown_dollars"
        ),
        F.when(
            F.col("peak_cents") != 0,
            F.round(
                F.col("max_dd_cents").cast("double") / F.col("peak_cents"), 6
            ),
        ).alias("dd_share"),
    ).orderBy("o_orderpriority").toPandas()
    assert got.values.tolist() == want.values.tolist()


def test_exact_ntile_matches_window_ntile(spark, sf_dir):
    """The range-bucketed exact rank behind q_events_rfm must reproduce
    F.ntile exactly for every dimension and direction, including with a
    tiny bucket count that forces many cross-bucket offsets."""
    from oraaud_kafka_spark.queries.event_time import _exact_ntile

    e = load(spark, sf_dir, "events")
    base = e.groupBy("user_id").agg(
        F.count("*").cast("long").alias("frequency"),
    )
    for n_buckets in (2, 7, 256):
        got = (
            _exact_ntile(base, F.col("frequency"), "s", n_buckets=n_buckets)
            .orderBy("user_id")
            .toPandas()
        )
        w = Window.orderBy(F.col("frequency").asc(), "user_id")
        want = (
            base.select("user_id", F.ntile(5).over(w).alias("s"))
            .orderBy("user_id")
            .toPandas()
        )
        assert got.values.tolist() == want.values.tolist(), n_buckets
    # descending via negation
    got = (
        _exact_ntile(base, -F.col("frequency"), "s")
        .orderBy("user_id")
        .toPandas()
    )
    wd = Window.orderBy(F.col("frequency").desc(), "user_id")
    want = (
        base.select("user_id", F.ntile(5).over(wd).alias("s"))
        .orderBy("user_id")
        .toPandas()
    )
    assert got.values.tolist() == want.values.tolist()


def test_exact_ntile_fewer_rows_than_tiles(spark):
    """n < k: ntile assigns tile i to row i; the ANSI guard must keep
    the unused q=0 branch from dividing by zero."""
    from oraaud_kafka_spark.queries.event_time import _exact_ntile

    base = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "user_id bigint, v bigint"
    )
    got = (
        _exact_ntile(base, F.col("v"), "s").orderBy("user_id").toPandas()
    )
    assert got.values.tolist() == [[1, 1], [2, 2], [3, 3]]


class _FakeState:
    """Minimal GroupState stand-in for driving _burst_fn directly."""

    def __init__(self, value=None):
        self._v = value
        self.updated = False

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v
        self.updated = True


def _burst_batch(hours_counts):
    import pandas as pd

    ts = []
    for h, c in hours_counts:
        ts.extend([pd.Timestamp(h * 3600, unit="s")] * c)
    return [pd.DataFrame({"event_type": ["click"] * len(ts), "ts": ts})]


def test_burst_monitor_baseline_spans_hour_gaps_like_batch_rows_frame():
    """Observed-bucket retention (round-10 re-shape): a sparse stream
    with hour gaps must still fill its 24-bucket baseline — the batch
    twin's ROWS frame counts OBSERVED buckets, not wall hours. The
    previous wall-hour horizon kept the ratio NULL forever here."""
    from oraaud_kafka_spark.streaming.analytics import _burst_fn

    # 24 observed quiet buckets spaced 3 hours apart, then a burst hour
    state = _FakeState()
    quiet = [(3 * i, 1) for i in range(24)]
    out = list(_burst_fn(("click",), _burst_batch(quiet), state))
    assert state.updated
    burst = list(
        _burst_fn(("click",), _burst_batch([(100, 3)]), state)
    )
    row = burst[0].iloc[0]
    assert row["base_hours"] == 24
    assert row["base_sum"] == 24
    assert row["ratio"] == 3.0
    assert row["is_burst"] == 1


def test_burst_monitor_rejects_singleton_far_future_timestamp():
    """A single corrupt far-future row must not evict the histogram or
    poison the emitted bar; subsequent valid rows keep flowing
    (round-9 ADVICE: one bad event used to silence the monitor for up
    to 25 hours)."""
    from oraaud_kafka_spark.streaming.analytics import (
        BURST_MONITOR_MAX_AHEAD,
        _burst_fn,
    )

    state = _FakeState()
    list(_burst_fn(("click",), _burst_batch([(h, 1) for h in range(24)]), state))
    # corrupt: one event a year ahead
    out = list(
        _burst_fn(
            ("click",),
            _burst_batch([(24 + 365 * 24, 1), (24, 3)]),
            state,
        )
    )
    row = out[0].iloc[0]
    assert row["bar_hour_epoch"] == 24 * 3600  # corrupt bar never emitted
    assert row["n_events"] == 3
    assert row["base_hours"] == 24
    assert row["is_burst"] == 1
    hours, counts = state.get
    assert max(hours) == 24  # corrupt bucket not retained
    # a genuine post-outage resume (multiple events) IS accepted
    far = 24 + BURST_MONITOR_MAX_AHEAD + 100
    list(_burst_fn(("click",), _burst_batch([(far, 2)]), state))
    hours, _ = state.get
    assert max(hours) == far


def test_burst_monitor_all_null_ts_first_batch_writes_no_state():
    """An all-NULL-ts first batch must not persist empty state arrays
    for the key (round-9 ADVICE)."""
    import pandas as pd

    from oraaud_kafka_spark.streaming.analytics import _burst_fn

    state = _FakeState()
    pdf = pd.DataFrame({"event_type": ["click"], "ts": [pd.NaT]})
    out = list(_burst_fn(("click",), [pdf], state))
    assert out == []
    assert not state.updated


def test_funnel_monitor_idle_timeout_evicts_and_rearms():
    """The state-TTL lever: a timed-out group removes its slots and
    emits nothing; with idle_timeout set, every update re-arms the
    processing-time timeout."""
    import pandas as pd

    from oraaud_kafka_spark.streaming.analytics import _funnel_fn

    class _TtlState(_FakeState):
        def __init__(self, value=None, timed_out=False):
            super().__init__(value)
            self.hasTimedOut = timed_out
            self.removed = False
            self.timeout_set = None

        def remove(self):
            self._v = None
            self.removed = True

        def setTimeoutDuration(self, d):
            self.timeout_set = d

    # the wrapper parses the human-readable knob to int ms at build
    # time (GroupState.setTimeoutDuration rejects strings) and the fold
    # fn receives milliseconds
    from oraaud_kafka_spark.streaming.analytics import duration_ms

    ttl_ms = duration_ms("30 days")
    assert ttl_ms == 30 * 86_400_000

    # timed-out group: state dropped, nothing emitted
    st = _TtlState(value=(1, None, None, None), timed_out=True)
    out = list(_funnel_fn((7,), iter(()), st, idle_timeout=ttl_ms))
    assert out == [] and st.removed

    # live group: update re-arms the timeout
    st = _TtlState()
    pdf = pd.DataFrame(
        {
            "user_id": [7],
            "ts": [pd.Timestamp("2026-01-01")],
            "event_id": [1],
            "event_type": ["signup"],
        }
    )
    out = list(_funnel_fn((7,), [pdf], st, idle_timeout=ttl_ms))
    assert out[0].iloc[0]["stage"] == 1
    assert st.timeout_set == ttl_ms


def test_zorder_write_quantile_bucketing(spark, tmp_path, sf_dir):
    """Round-10 re-shape: the Morton key's per-column normalization is
    approxQuantile bucketing (bounded driver collect), not a global
    percent_rank window. Asserts the boundaries come from one bounded
    collect and the write round-trips; the footer-stats locality
    property itself is already pinned by test_tabular_io.py::
    test_zorder_write_narrows_both_columns_stats (not duplicated
    here)."""
    from oraaud_kafka_spark.sources import tabular

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    qs = [i / 256 for i in range(1, 256)]
    bounds1, bounds2 = (
        sorted(set(b))
        for b in li.stat.approxQuantile(["l_orderkey", "l_partkey"], qs, 0.001)
    )
    assert bounds1 and bounds2  # <= 255 doubles per column on the driver
    out = str(tmp_path / "zorder10")
    tabular.zorder_write(li, out, ("l_orderkey", "l_partkey"), n_files=4)
    written = spark.read.parquet(out)
    assert written.count() == li.count()


def test_late_data_segmented_scan_property(spark, tmp_path):
    """Property check over adversarial shapes the fixture can't cover:
    random sparse/duplicate/NULL event streams at several bucket
    widths must match a pure-Python replay of the global running-max
    fold (hypothesis deadline disabled — each case runs Spark jobs)."""
    import os

    from hypothesis import given, settings, strategies as st

    @settings(max_examples=5, deadline=None)
    @given(
        rows=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=500),  # event_id
                st.one_of(
                    st.none(),
                    st.integers(min_value=0, max_value=100_000),  # ts s
                ),
            ),
            min_size=1,
            max_size=60,
            unique_by=lambda r: r[0],
        ),
        w=st.sampled_from([2, 7, 64]),
        sb=st.sampled_from([2, 8]),
    )
    def check(rows, w, sb):
        d = str(tmp_path / f"p{abs(hash((tuple(rows), w, sb))) % 10**9}")
        os.makedirs(d, exist_ok=True)
        spark.createDataFrame(
            [(eid, "t", ts) for eid, ts in rows],
            "event_id bigint, event_type string, ts_s bigint",
        ).select(
            "event_id",
            "event_type",
            F.to_timestamp(F.from_unixtime("ts_s")).alias("ts"),
        ).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        fn = registry.QUERIES["q_time_late_data"].__wrapped__
        got = fn(spark, d, _w=w, _sb=sb).toPandas()

        # pure-Python replay of the plain global window
        seq = sorted(rows)
        run = None
        n = late = 0
        for _, ts in seq:
            if ts is not None and (run is None or ts > run):
                run = ts
            n += 1
            if ts is not None and run is not None and run - ts >= 600:
                late += 1
        assert got.values.tolist() == [["t", n, late]]

    check()


def test_zorder_write_string_and_date_columns(spark, tmp_path, sf_dir):
    """The quantile path must keep the replaced percent_rank version's
    type coverage: string and date z-order columns lay out without
    crashing (review finding — approxQuantile alone rejects them),
    and the per-file footer spans of the string column still narrow."""
    import os

    import pyarrow.parquet as pq

    from oraaud_kafka_spark.sources.tabular import zorder_write

    c = load(spark, sf_dir, "customer").select(
        "c_name", "c_acctbal", "c_custkey"
    )
    o = load(spark, sf_dir, "orders").select("o_orderdate", "o_orderkey")
    out_d = str(tmp_path / "zorder_date")
    zorder_write(o, out_d, ("o_orderdate", "o_orderkey"), n_files=4)
    assert spark.read.parquet(out_d).count() == o.count()
    out = str(tmp_path / "zorder_str")
    zorder_write(c, out, ("c_name", "c_acctbal"), n_files=4)
    spans = []
    glob_lo = glob_hi = None
    for f in sorted(os.listdir(out)):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(out, f)).metadata
        idx = md.schema.to_arrow_schema().get_field_index("c_name")
        st = md.row_group(0).column(idx).statistics
        spans.append((st.min, st.max))
        glob_lo = st.min if glob_lo is None else min(glob_lo, st.min)
        glob_hi = st.max if glob_hi is None else max(glob_hi, st.max)
    assert len(spans) >= 3
    # at least one file's clerk range is a strict subrange of the table
    assert any(lo > glob_lo or hi < glob_hi for lo, hi in spans)


def test_zorder_write_rejects_unsupported_types(spark):
    import pytest

    from oraaud_kafka_spark.sources.tabular import zorder_write

    df = spark.createDataFrame(
        [(1, ["a"])], "id bigint, arr array<string>"
    )
    with pytest.raises(ValueError, match="unsupported type"):
        zorder_write(df, "/tmp/never", ("id", "arr"))
