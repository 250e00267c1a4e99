"""Fixture table access (driver-generated parquet, TESTDATA.md)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# Plan cache: spark.read.parquet costs ~100 ms of driver time per call
# (file listing + footer schema read). DataFrames are immutable logical
# plans, so reusing one per (session, dir, table) is safe and drops that
# cost from every query build — which the per-round harness pays 93+
# times. Keyed by the session object itself (identity hash) so a
# stopped/restarted session never serves stale plans.
_LOAD_CACHE: dict[tuple, DataFrame] = {}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown fixture table {name!r}")
    key = (spark, sf_dir, name)
    cached = _LOAD_CACHE.get(key)
    if cached is not None:
        return cached
    df = _read(spark, sf_dir, name)
    _LOAD_CACHE[key] = df
    return df


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # Fixture generations have shipped events.ts as either parquet
        # TIMESTAMP(MICROS) (reads natively as timestamp_ntz) or
        # TIMESTAMP(NANOS) (Spark 4 rejects unless nanosAsLong maps it to
        # int64). Read first, inspect what actually loaded, and only
        # apply the nanos→micros truncation when ts arrived as bigint —
        # DuckDB's read_parquet truncates nanos the same way, keeping
        # oracles comparable without any cast on the SQL side.
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        loaded = dict(df.dtypes).get("ts")
        if loaded == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif loaded == "timestamp_ntz":
            # Downstream queries (and rounds 1-3 driver verification) assume
            # plain TIMESTAMP — e.g. casts to BIGINT epoch seconds that
            # Spark 4 forbids on TIMESTAMP_NTZ. Session timezone is pinned
            # to UTC (session.py), so this cast is value-preserving.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def spread(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Widen a scan before an expression-dense map stage (md5-per-shingle,
    per-pair cosine folds) IF it is narrower than the session parallelism.

    The local fixtures are single-row-group parquet files, so a scan yields
    exactly one partition and heavy per-row compute serializes on one core.
    On a real cluster a large scan already has hundreds/thousands of splits
    and this returns the input unchanged — the repartition only exists to
    recover parallelism that the file layout withheld, never as an extra
    shuffle at scale. Only use it where per-row expression cost dominates
    the shuffle cost of the (small) early rows.
    """
    from .session import default_parallelism

    target = partitions or default_parallelism()
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def bounded_sort(df: DataFrame, *cols: str) -> DataFrame:
    """Total-order sort for a BOUNDED output (a literal id-range filter,
    a grouped report over a fixed domain) without a range exchange.

    ``orderBy`` plans Exchange(rangepartitioning), and computing the
    range bounds SAMPLES the child: the whole plan segment below the
    exchange (up to the nearest materialized shuffle) executes a second
    time per run. For a map-only lineage that segment is the entire
    query — and when it contains MapInPandas/ArrowEvalPython stages the
    sampling pass pays the full Python boundary cost again (round-14
    measurement: the multimodal family ran every decode pipeline twice
    per execution). Coalescing the bounded result to one partition and
    sorting within it yields the identical total order with zero
    exchanges and zero sampling. ONLY for outputs bounded by
    construction — the coalesce serializes whatever remains above the
    last shuffle, which is exactly the TakeOrderedAndProject trade for
    bounded reports."""
    return df.coalesce(1).sortWithinPartitions(*cols)


# Monotone count of build-time DATA computations (eager checkpoints,
# driver-side collects inside query builders). registry.query snapshots
# it around each build: a build that bumped it produced a DataFrame
# carrying COMPUTED STATE (checkpointed blocks / collected literals), so
# the registry must NOT plan-memoize it — handing the same object to a
# later invocation would serve precomputed results instead of
# recomputing from parquet (result caching, which the bench forbids).
# Round-15 measurement-integrity fix; see OPTIMIZATION_r15.md.
DATA_EPOCH = 0


def note_data_computed() -> None:
    """Record that the current query build ran a Spark job / collected
    data. EVERY builder-reachable action site (collect/count/first/
    head/localCheckpoint) must call this so registry.query skips plan
    memoization for the build — tests/test_round15_invariants.py sweeps
    the registry with a job-group probe to catch missed sites."""
    global DATA_EPOCH
    DATA_EPOCH += 1


def materialize(
    df: DataFrame,
    *,
    reliable: bool | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Eager checkpoint for a multiply-referenced intermediate
    (guide §3.3): the self-join sides' alias-divergent projections
    defeat ReuseExchange, so without materialization the expensive
    lineage below executes once PER reference. Recomputed from the
    parquet inputs on every invocation — the builders that call this
    are never plan-memoized (note_data_computed below), so checkpoint
    RDDs die with the per-invocation DataFrame and are never served
    across runs (unlike ``.cache()``, whose CacheManager matches the
    next run's identical plan and would hand it stale-free but
    PRE-COMPUTED results — measurement gaming in a bench).

    Durability (round-15, mirroring operators.components): the default
    ``localCheckpoint`` stores blocks on executors with lineage
    DISCARDED — fast, but an executor loss mid-query aborts the job,
    and blocks evicted under memory pressure are unrecoverable. For
    cluster runs set ``reliable=True`` (or pass ``checkpoint_dir``,
    or set ``SPARK_GRAFT_RELIABLE_CHECKPOINT=1`` process-wide) and the
    blocks go through ``DataFrame.checkpoint()`` to the session's
    fault-tolerant checkpoint dir instead. Local bench/test runs keep
    the local default — single-JVM, no executor to lose.

    Size discipline: each call site states its checkpointed frame's
    cardinality class in a comment; O(corpus) frames must project to
    the narrow columns the downstream references actually need before
    materializing.

    ``SPARK_GRAFT_PLAN_TRANSPARENT=1`` makes this a no-op so plan-pin
    tests can assert on the full logical lineage the checkpoint
    otherwise hides; production never sets it."""
    if os.environ.get("SPARK_GRAFT_PLAN_TRANSPARENT") == "1":
        return df
    note_data_computed()
    if checkpoint_dir is not None:
        df.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)
        reliable = True
    if reliable is None:
        reliable = os.environ.get("SPARK_GRAFT_RELIABLE_CHECKPOINT") == "1"
    if reliable:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def checkpoint_sort(df: DataFrame, *cols: str) -> DataFrame:
    """Presentation sort for a ROW-CARDINALITY report whose lineage is
    expensive (heavy map-only stage, no materialized shuffle below):
    ``orderBy`` plans a range exchange whose bound-sampling pass
    re-executes the whole exchange-free child segment a second time
    (see bounded_sort), but coalesce(1) is only valid for bounded
    outputs. Materializing the NARROW final projection once
    (localCheckpoint — recomputed from source on every invocation,
    nothing persists across runs) lets the sampling pass read the
    in-memory rows instead: the expensive lineage runs exactly once,
    and the sort shuffles the same narrow bytes it would have anyway.
    Only worth it when the per-row compute dominates the cost of
    writing the projected rows once — A/B-measure (a cheap tokenize
    map got SLOWER under this on round-14 measurement)."""
    return materialize(df).orderBy(*cols)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql queries."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)


# Calibration-eval slice discipline (round-14, replacing the id % 2
# moduli): ground-truth evals need an exhaustive pair join, so their
# input must be a FIXED-SIZE deterministic sample — a modulus slice
# scales with the corpus and turns the calibration quadratic at 100x.
# The K docs/vectors ranked lowest by md5('cal:' || id) are a
# reproducible pseudo-random draw (the repo's reservoir discipline, no
# rand()), identical in both engines, and constant-cost at ANY corpus
# size: the Spark side is a TakeOrderedAndProject top-K over one scan,
# never a global sort.
CAL_SLICE_K = 256


def cal_slice(df: DataFrame, id_col: str, k: int = CAL_SLICE_K) -> DataFrame:
    from pyspark.sql import functions as F

    key = F.md5(F.concat(F.lit("cal:"), F.col(id_col).cast("string")))
    return df.orderBy(key, id_col).limit(k)


def sql_cal_key(id_col: str) -> str:
    """DuckDB-side twin of :func:`cal_slice`'s ordering key; use as
    ``ORDER BY {sql_cal_key('doc_id')}, doc_id LIMIT {CAL_SLICE_K}``."""
    return f"md5('cal:' || CAST({id_col} AS VARCHAR))"
