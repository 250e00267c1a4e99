"""CSV/JSON/Parquet source-sink round-trips + bucketed-join plan check."""

from __future__ import annotations

from pyspark.sql import functions as F

from oraaud_kafka_spark.sources.tabular import (
    read_csv,
    read_jsonl,
    read_parquet,
    write_bucketed_table,
    write_parquet,
)
from oraaud_kafka_spark.tables import load

SF = "/root/testdata/sf0.001"


def test_csv_roundtrip(spark, tmp_path):
    nation = load(spark, SF, "nation")
    p = str(tmp_path / "nation_csv")
    nation.write.option("header", "true").csv(p)
    back = read_csv(spark, p, schema=nation.schema)
    assert sorted(back.collect()) == sorted(nation.collect())


def test_jsonl_roundtrip(spark, tmp_path):
    region = load(spark, SF, "region")
    p = str(tmp_path / "region_json")
    region.write.json(p)
    back = read_jsonl(spark, p, schema=region.schema)
    assert sorted(back.collect()) == sorted(region.collect())


def test_partitioned_parquet_prunes(spark, tmp_path):
    orders = load(spark, SF, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    p = str(tmp_path / "orders_part")
    write_parquet(orders, p, partition_by=["o_year"])
    back = read_parquet(spark, p).filter(F.col("o_year") == 1996)
    plan = back._jdf.queryExecution().executedPlan().toString()
    # partition filter must reach the scan, not a post-filter
    assert "PartitionFilters: [isnotnull(o_year" in plan
    assert back.count() == orders.filter(F.col("o_year") == 1996).count()


def test_bucketed_table_join_skips_shuffle(spark, tmp_path):
    orders = load(spark, SF, "orders")
    write_bucketed_table(
        orders, "orders_b", bucket_by=["o_custkey"], n_buckets=4, mode="overwrite"
    )
    try:
        t = spark.table("orders_b")
        agg = t.groupBy("o_custkey").agg(F.count("*").alias("n"))
        plan = agg._jdf.queryExecution().executedPlan().toString()
        # grouping on the bucket key needs NO exchange before the agg
        assert "Exchange hashpartitioning(o_custkey" not in plan
        assert agg.count() == orders.select("o_custkey").distinct().count()
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")

def test_write_delta_gated_without_delta_spark(spark, tmp_path):
    """Delta sink declares itself unavailable here (no delta-spark in
    the container) with an actionable error, not a JVM classload crash."""
    import pytest

    from oraaud_kafka_spark.sources.tabular import delta_available, write_delta

    df = spark.range(3)
    assert not delta_available(spark)
    with pytest.raises(NotImplementedError, match="delta-spark"):
        write_delta(df, str(tmp_path / "d"))


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    from oraaud_kafka_spark.sources.tabular import read_orc, write_orc
    from oraaud_kafka_spark.tables import load

    from .conftest import SF_DIR

    src = load(spark, SF_DIR, "customer")
    path = str(tmp_path / "cust_orc")
    write_orc(src, path, partition_by=["c_mktsegment"])
    back = read_orc(spark, path)
    assert back.count() == src.count()
    assert set(back.columns) == set(src.columns)
    # partition pruning: a segment filter must reach PartitionFilters
    seg = back.filter(back.c_mktsegment == "AUTOMOBILE")
    plan = seg._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(c_mktsegment" in plan
    # predicate pushdown on a data column reaches the ORC reader
    pred = back.filter(back.c_custkey < 10)
    pplan = pred._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(c_custkey), LessThan(c_custkey,10)]" in pplan


def test_jsonl_roundtrip(spark, tmp_path):
    from oraaud_kafka_spark.sources.tabular import read_jsonl, write_jsonl
    from oraaud_kafka_spark.tables import load

    from .conftest import SF_DIR

    src = load(spark, SF_DIR, "nation")
    path = str(tmp_path / "nation_jsonl")
    write_jsonl(src, path)
    back = read_jsonl(spark, path, schema=src.schema)
    assert sorted(r.n_name for r in back.collect()) == sorted(
        r.n_name for r in src.collect()
    )


def test_compact_parquet_collapses_small_files(spark, tmp_path):
    from oraaud_kafka_spark.sources.tabular import compact_parquet
    from oraaud_kafka_spark.tables import load

    from .conftest import SF_DIR

    src = load(spark, SF_DIR, "orders")
    frag_dir = str(tmp_path / "fragmented")
    # simulate a streaming sink's many tiny appends
    src.repartition(64).write.parquet(frag_dir)
    n_small = len(list((tmp_path / "fragmented").glob("*.parquet")))
    assert n_small >= 32
    out_dir = str(tmp_path / "compacted")
    n_target = compact_parquet(spark, frag_dir, out_dir, target_file_mb=128)
    n_out = len(list((tmp_path / "compacted").glob("*.parquet")))
    assert n_out == n_target < n_small
    back = spark.read.parquet(out_dir)
    assert back.count() == src.count()
    assert set(back.columns) == set(src.columns)


def test_compact_parquet_rejects_remote_paths(spark, tmp_path):
    """os.walk sizing only works locally; a remote URI would silently
    measure 0 bytes and collapse everything into one file — reject it."""
    import pytest

    from oraaud_kafka_spark.sources.tabular import compact_parquet

    with pytest.raises(ValueError, match="non-local path"):
        compact_parquet(
            spark, "s3a://bucket/table", str(tmp_path / "out")
        )


def test_compact_parquet_single_slash_uris(spark, tmp_path):
    """Hadoop accepts single-slash URI forms (hdfs:/x, file:/tmp/x) that
    a naive '://' scan misclassifies as local paths — hdfs:/x would then
    os.walk a literal 'hdfs:/x' string, measure 0 bytes, and collapse
    the dataset to one file. hdfs:/ must be rejected; file:/ must strip
    the scheme and size the real directory."""
    import pytest

    from oraaud_kafka_spark.sources.tabular import compact_parquet

    with pytest.raises(ValueError, match="non-local path"):
        compact_parquet(spark, "hdfs:/warehouse/table", str(tmp_path / "o1"))

    frag_dir = tmp_path / "frag"
    spark.range(1000).repartition(8).write.parquet(str(frag_dir))
    out_dir = str(tmp_path / "compacted")
    n = compact_parquet(spark, f"file:{frag_dir}", out_dir, target_file_mb=128)
    assert n == 1  # tiny dataset: sized from REAL bytes, not zero
    assert spark.read.parquet(out_dir).count() == 1000


def test_zorder_write_narrows_both_columns_stats(spark, tmp_path):
    """Z-ordered layout must (a) preserve rows exactly and (b) make the
    per-file min/max spans of BOTH layout columns substantially
    narrower than the global span — the property parquet data skipping
    prunes on. A single-column sort would narrow one column and leave
    the other at ~full span per file."""
    import pyarrow.parquet as pq

    from oraaud_kafka_spark.sources.tabular import zorder_write
    from oraaud_kafka_spark.tables import load

    from .conftest import SF_DIR

    li = load(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    out = str(tmp_path / "zorder")
    zorder_write(li, out, ("l_orderkey", "l_partkey"), n_files=8)

    back = spark.read.parquet(out)
    assert back.count() == li.count()
    assert sorted(back.columns) == sorted(li.columns)

    import glob
    import os

    spans = {"l_orderkey": [], "l_partkey": []}
    globals_ = {}
    for f in glob.glob(os.path.join(out, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for ci in range(row_group.num_columns):
                col = row_group.column(ci)
                name = col.path_in_schema
                if name in spans:
                    st = col.statistics
                    spans[name].append(st.max - st.min)
                    lo, hi = globals_.get(name, (st.min, st.max))
                    globals_[name] = (min(lo, st.min), max(hi, st.max))
    for name, ss in spans.items():
        assert len(ss) >= 4  # actually split into multiple files/groups
        global_span = globals_[name][1] - globals_[name][0]
        # mean per-file span must be well under the global span on BOTH
        # dimensions (Z-curve locality); generous 0.7 bound is robust to
        # range-partition boundary noise while a non-clustered column
        # would sit at ~1.0
        assert sum(ss) / len(ss) < 0.7 * global_span, name


def test_layout_advisor_end_to_end(spark, tmp_path):
    """The full advisor loop: one profiling scan ranks candidates by
    approx cardinality, the table z-orders on the top two, and the
    footer audit proves a narrow range predicate on EITHER chosen
    column skips files — while the same predicate over an unclustered
    write of the same data skips ~nothing."""
    from oraaud_kafka_spark.operators.layout import (
        layout_advisor_demo,
        skipping_report,
    )
    from oraaud_kafka_spark.tables import load

    from .conftest import SF_DIR

    li = load(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_partkey", "l_linenumber", "l_quantity"
    )
    out = str(tmp_path / "advised")
    n_files = 16
    report = layout_advisor_demo(
        li, out,
        ("l_orderkey", "l_partkey", "l_linenumber"),
        n_files=n_files,
    )
    # cardinality ranking must pick the two key columns over the
    # 7-value linenumber
    assert set(report["chosen"]) == {"l_orderkey", "l_partkey"}
    ranked = dict(report["ranked"])
    assert ranked["l_linenumber"] < ranked["l_orderkey"]
    # rows survive the rewrite
    assert spark.read.parquet(out).count() == li.count()
    # both chosen columns' probes skip files; a Z-curve over two dims
    # yields ~sqrt(n_files) distinct ranges PER dimension, so a
    # 1/n_files-width probe should prune well over a quarter of files
    for c, probe in report["probes"].items():
        assert probe["n_files_total"] >= n_files
        assert probe["n_files_skipped"] >= probe["n_files_total"] // 4, (
            c, probe,
        )
    # control: the same probe against an UNCLUSTERED write skips fewer
    # files than the z-ordered layout does — the advisor's receipt
    plain = str(tmp_path / "plain")
    li.repartition(n_files).write.parquet(plain)
    for c, probe in report["probes"].items():
        _, lo_all, hi_all = report["col_stats"][c]
        width = (hi_all - lo_all) / n_files
        control = skipping_report(plain, c, lo_all, lo_all + width)
        assert control["n_files_skipped"] < probe["n_files_skipped"], (
            c, control, probe,
        )
    # guard behaviors: absent column raises instead of reporting
    # trivially perfect pruning
    import pytest

    with pytest.raises(ValueError, match="not present"):
        skipping_report(out, "no_such_column", 0, 1)
