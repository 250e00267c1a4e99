"""Internal-consistency invariants of the round-9 fixes and operators —
relations that must hold regardless of fixture content, complementing
the DuckDB value parity in test_parity.py."""

from __future__ import annotations

import math
import os
from decimal import ROUND_HALF_UP, Decimal

import duckdb

from pyspark.sql import functions as F

from oraaud_kafka_spark import registry

registry.load_all()


def test_lm_mean_survives_long_documents_without_int64_wrap(spark, tmp_path):
    """Overflow regression (round-8 ADVICE, medium): the per-doc picounit
    sum must accumulate in DECIMAL(38,0), not int64. A 400k-token doc of
    corpus-unique tokens has per-token terms ~-1.29e13 picounits, so the
    doubled |sum| (~1.03e19) exceeds int64 max (9.22e18): the replaced
    int64 path wraps silently in Spark (non-ANSI sum(bigint)) while
    DuckDB promotes to HUGEINT — a silent cross-engine divergence. The
    decimal path must match both the DuckDB oracle AND a pure-Python
    exact fold on the same corpus."""
    from oraaud_kafka_spark.testing import compare_frames

    sf_dir = str(tmp_path)
    n = 400_000
    long_text = " ".join(f"t{i}" for i in range(n))
    docs = [
        (0, long_text, "en", "web", len(long_text)),
        (1, "t0 t1 t2", "en", "web", 8),
    ]
    spark.createDataFrame(
        docs,
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).write.parquet(os.path.join(sf_dir, "documents.parquet"))

    fn = registry.QUERIES["q_text_unigram_logprob"].__wrapped__
    got = fn(spark, sf_dir).toPandas()

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet/*.parquet'"
    )
    want = con.execute(registry.ORACLES["q_text_unigram_logprob"]).fetchdf()
    assert not compare_frames(got, want)

    # pure-Python exact picounit fold (cnt: t0,t1,t2 appear twice, the
    # rest once; total = n + 3)
    total = n + 3
    by_doc = {}
    for doc_id, text, *_ in docs:
        s = 0
        toks = text.split(" ")
        for t in toks:
            cnt = 2 if t in ("t0", "t1", "t2") else 1
            lp = Decimal(math.log(cnt / total)).quantize(
                Decimal("1e-12"), rounding=ROUND_HALF_UP
            )
            s += int(lp * 10**12)
        m = len(toks)
        q = (2 * abs(s) + m * 10**6) // (2 * m * 10**6)
        by_doc[doc_id] = (-q if s < 0 else q) / 10**6
        if doc_id == 0:
            # prove this corpus actually crosses the int64 boundary
            assert 2 * abs(s) > 2**63 - 1

    for _, row in got.iterrows():
        assert row.avg_logprob == by_doc[int(row.doc_id)], row.doc_id


def test_bigram_lm_mean_survives_long_documents(spark, tmp_path):
    """Same overflow pin for the bigram scorer: a 400k-transition doc
    (smoothed logprobs ~-1.22e13 picounits each, doubled |sum| ~9.8e18
    > int64 max) must match a pure-Python exact picounit fold, which a
    wrapping int64 sum cannot do. (The DuckDB oracle is checked at
    parity scale and by the unigram long-doc test above — its
    list_transform over a 400k-token list is quadratic, so the
    cross-engine pin here uses the Python fold.)"""
    sf_dir = str(tmp_path)
    n = 400_001  # tokens -> 400k transitions
    long_text = " ".join(f"t{i}" for i in range(n))
    docs = [
        (0, long_text, "en", "web", len(long_text)),
        (1, "t0 t1", "en", "web", 5),
    ]
    spark.createDataFrame(
        docs,
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).write.parquet(os.path.join(sf_dir, "documents.parquet"))

    fn = registry.QUERIES["q_text_bigram_logprob"].__wrapped__
    got = fn(spark, sf_dir).toPandas()

    # corpus stats: unigram counts (t0, t1 appear twice), bigram
    # counts ((t0,t1) occurs in both docs), V = distinct tokens
    c1 = {f"t{i}": 1 for i in range(n)}
    c1["t0"] += 1
    c1["t1"] += 1
    vocab = n
    expected = {}
    for doc_id, text, *_ in docs:
        toks = text.split(" ")
        s = 0
        for prev, cur in zip(toks, toks[1:]):
            n2 = 2 if (prev, cur) == ("t0", "t1") else 1
            lp = Decimal(
                math.log((n2 + 1) / (c1[prev] + vocab))
            ).quantize(Decimal("1e-12"), rounding=ROUND_HALF_UP)
            s += int(lp * 10**12)
        m = len(toks) - 1
        q = (2 * abs(s) + m * 10**6) // (2 * m * 10**6)
        expected[doc_id] = (m, (-q if s < 0 else q) / 10**6)
        if doc_id == 0:
            assert 2 * abs(s) > 2**63 - 1  # crosses the int64 boundary

    assert len(got) == 2
    for _, row in got.iterrows():
        m, avg = expected[int(row.doc_id)]
        assert row.n_transitions == m
        assert row.avg_logprob == avg


def _sf(spark, name):
    from oraaud_kafka_spark.tables import load
    from .conftest import SF_DIR

    return load(spark, SF_DIR, name)


def test_pr_auc_matches_python_threshold_sweep(spark):
    """AP must equal the step-form threshold sweep replayed exactly in
    Python (12-dp half-up term rounding, exact decimal sum, one final
    division) over the same (cents, label) rows."""
    from collections import Counter

    from oraaud_kafka_spark.queries.aggregates import _AUC_POS
    from .conftest import SF_DIR

    from oraaud_kafka_spark import registry

    r = registry.QUERIES["q_eval_pr_auc"](spark, SF_DIR).collect()[0]
    rows = _sf(spark, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("v"),
        F.col("o_orderpriority").isin(*_AUC_POS).cast("int").alias("pos"),
    ).collect()
    f = Counter()
    fa = Counter()
    for g in rows:
        f[g.v] += 1
        fa[g.v] += g.pos
    n_pos = sum(fa.values())
    n_neg = sum(f.values()) - n_pos
    assert (r.n_pos, r.n_neg, r.n_thresholds) == (n_pos, n_neg, len(f))
    tp = pp = 0
    s = Decimal(0)
    for v in sorted(f, reverse=True):
        tp += fa[v]
        pp += f[v]
        term = Decimal(fa[v] * (tp / pp)).quantize(
            Decimal("1e-12"), rounding=ROUND_HALF_UP
        )
        s += term
    expect = round(float(s) / n_pos, 6)
    assert r.average_precision == expect
    # AP of a useful score must beat the random-classifier baseline
    # floor only if the score is informative — just pin internal
    # consistency of the baseline itself
    assert r.prevalence == round(n_pos / (n_pos + n_neg), 6)
    assert 0.0 <= r.average_precision <= 1.0


def test_mrr_consistent_with_ndcg_over_same_ranking(spark):
    """MRR and NDCG read the identical top-10: per qid, n_rel must
    match, rr > 0 iff n_rel > 0, and rr == round(1/first_rel_rank, 6)
    with first_rel_rank in [1, 10]."""
    from .conftest import SF_DIR

    from oraaud_kafka_spark import registry

    mrr = {
        r.qid: r
        for r in registry.QUERIES["q_eval_mrr_retrieval"](
            spark, SF_DIR
        ).collect()
    }
    ndcg = {
        r.qid: r
        for r in registry.QUERIES["q_eval_ndcg_retrieval"](
            spark, SF_DIR
        ).collect()
    }
    assert set(mrr) == set(ndcg)
    for qid, m in mrr.items():
        assert m.n_rel == ndcg[qid].n_rel
        if m.n_rel == 0:
            assert m.first_rel_rank is None
            assert m.reciprocal_rank == 0.0
        else:
            assert 1 <= m.first_rel_rank <= 10
            assert m.reciprocal_rank == round(1.0 / m.first_rel_rank, 6)


def test_winsorized_mean_matches_python_clamp(spark):
    """Winsorized mean must equal the literal clamp-and-average in
    Python: sort each group's cents, replace the k smallest with the
    (k+1)-th and k largest with the (n-k)-th, average."""
    from collections import defaultdict

    from .conftest import SF_DIR

    from oraaud_kafka_spark import registry

    rows = registry.QUERIES["q_agg_winsorized_mean"](spark, SF_DIR).collect()
    assert rows
    by_prio = defaultdict(list)
    for g in _sf(spark, "orders").select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    ).collect():
        by_prio[g.o_orderpriority].append(g.cents)
    for r in rows:
        vals = sorted(by_prio[r.o_orderpriority])
        n = len(vals)
        k = n // 10
        assert (r.n, r.k) == (n, k)
        lo, hi = vals[k], vals[n - k - 1]
        assert (r.lo_cents, r.hi_cents) == (lo, hi)
        clamped = [min(max(v, lo), hi) for v in vals]
        assert r.winsorized_mean == round(sum(clamped) / n / 100, 6)
        # clamping never moves the mean past the trimmed/raw envelope
        assert vals[0] <= lo <= hi <= vals[-1]


def test_max_drawdown_matches_python_fold(spark):
    """Drawdown must equal the sequential running-max fold over the
    (o_orderdate, o_orderkey) order — and therefore the max over pairs
    i <= j of (v_i - v_j)."""
    from collections import defaultdict

    from .conftest import SF_DIR

    from oraaud_kafka_spark import registry

    rows = registry.QUERIES["q_window_max_drawdown"](spark, SF_DIR).collect()
    assert rows
    series = defaultdict(list)
    for g in _sf(spark, "orders").select(
        "o_orderpriority",
        "o_orderdate",
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    ).collect():
        series[g.o_orderpriority].append(
            (g.o_orderdate, g.o_orderkey, g.cents)
        )
    for r in rows:
        seq = [c for _, _, c in sorted(series[r.o_orderpriority])]
        assert r.n_rows == len(seq)
        # seed peak from the FIRST value like the query/monitor fold —
        # a peak=0 seed diverges on all-negative series (round-9
        # ADVICE) — and only assert dd_share when peak != 0 (the
        # query emits NULL there)
        peak = None
        dd = 0
        for c in seq:
            peak = c if peak is None else max(peak, c)
            dd = max(dd, peak - c)
        assert r.peak_dollars == round(peak / 100, 6)
        assert r.max_drawdown_dollars == round(dd / 100, 6)
        if peak != 0:
            assert r.dd_share == round(dd / peak, 6)
        else:
            assert r.dd_share is None
        assert 0 <= dd


def test_burst_detection_matches_python_baseline(spark):
    """The top-5 burst rows must agree with a Python replay of the
    hourly bucketing + trailing-24-observed-buckets baseline, and the
    flag must be the exact integer rule n*24 >= 2*base_sum."""
    from collections import Counter, defaultdict

    from .conftest import SF_DIR

    from oraaud_kafka_spark import registry

    rows = registry.QUERIES["q_time_burst_detection"](spark, SF_DIR).collect()
    assert rows
    hourly = defaultdict(Counter)
    for g in _sf(spark, "events").select("event_type", "ts").collect():
        hourly[g.event_type][g.ts.replace(minute=0, second=0, microsecond=0)] += 1
    expect = {}
    for etype, cnt in hourly.items():
        hours = sorted(cnt)
        cand = []
        for i, h in enumerate(hours):
            window = hours[max(0, i - 24) : i]
            if len(window) != 24:
                continue
            base = sum(cnt[x] for x in window)
            ratio = round(cnt[h] * 24 / base, 6)
            cand.append((-ratio, h, cnt[h], base, int(cnt[h] * 24 >= 2 * base)))
        cand.sort()
        expect[etype] = cand[:5]
    for r in rows:
        neg_ratio, h, n, base, flag = expect[r.event_type][r.rnk - 1]
        assert (r.bar_hour, r.n_events, r.base_sum) == (h, n, base)
        assert r.ratio == -neg_ratio
        assert r.is_burst == flag


def test_pr_auc_and_drawdown_survive_degenerate_orders(spark, tmp_path):
    """ANSI-mode hazard pin (the adversarial sweep fabricates only
    documents/events/embeddings, so orders-based ops need their own):
    an orders table with zero positives and all-zero prices must
    return NULL metrics on both engines, not raise DIVIDE_BY_ZERO."""
    from oraaud_kafka_spark.testing import compare_frames

    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [(i, 1, "F", 0.0, "2024-01-0%d 00:00:00" % (i + 1), "3-MEDIUM")
         for i in range(3)],
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string",
    ).selectExpr(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "CAST(o_orderdate AS TIMESTAMP) AS o_orderdate", "o_orderpriority",
    ).write.parquet(os.path.join(sf_dir, "orders.parquet"))

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"'{sf_dir}/orders.parquet/*.parquet'"
    )

    ap = registry.QUERIES["q_eval_pr_auc"].__wrapped__(spark, sf_dir)
    got = ap.toPandas()
    assert got.average_precision.isna().all()  # no positives -> NULL
    assert got.prevalence.iloc[0] == 0.0
    want = con.execute(registry.ORACLES["q_eval_pr_auc"]).fetchdf()
    assert not compare_frames(got, want)

    dd = registry.QUERIES["q_window_max_drawdown"].__wrapped__(spark, sf_dir)
    got = dd.toPandas()
    assert (got.peak_dollars == 0.0).all()
    assert got.dd_share.isna().all()  # zero peak -> NULL share
    want = con.execute(registry.ORACLES["q_window_max_drawdown"]).fetchdf()
    assert not compare_frames(got, want)


def test_burst_detection_parity_with_null_ts_rows(spark, tmp_path):
    """Review pin: a NULL-ts event must not create a NULL hour bucket —
    Spark's window sorts NULLS FIRST while DuckDB's sorts NULLS LAST,
    so an unfiltered NULL bucket silently diverges the baselines. Both
    engines must agree bit-for-bit with a NULL-ts row present."""
    from oraaud_kafka_spark.testing import compare_frames

    sf_dir = str(tmp_path)
    rows = []
    eid = 0
    for h in range(30):
        for _ in range((h % 3) + 1):
            eid += 1
            rows.append(
                (eid, "2026-01-0%dT%02d:00:00" % (1 + h // 24, h % 24),
                 1, "click", 1.0, "{}")
            )
    rows.append((999, None, 2, "click", 1.0, "{}"))
    spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id",
        "event_type", "value", "props",
    ).coalesce(1).write.parquet(os.path.join(sf_dir, "events.parquet"))

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{sf_dir}/events.parquet/*.parquet'"
    )
    got = registry.QUERIES["q_time_burst_detection"].__wrapped__(
        spark, sf_dir
    ).toPandas()
    want = con.execute(
        registry.ORACLES["q_time_burst_detection"]
    ).fetchdf()
    assert len(got) == 5
    assert not compare_frames(got, want)
