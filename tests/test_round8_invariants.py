"""Internal-consistency invariants of the round-8 operators — relations
between output columns that must hold regardless of fixture content,
complementing the DuckDB value parity in test_parity.py."""

from __future__ import annotations

import math
import os

from pyspark.sql import functions as F

from oraaud_kafka_spark import registry

from .conftest import SF_DIR

registry.load_all()


def test_ols_matches_python_fit(spark):
    """Slope/intercept/R² must equal the textbook least-squares fit
    computed in Python over the same rows (tolerance covers only the
    decimal-narrowing of the power sums, ~1e-4 relative)."""
    from oraaud_kafka_spark.tables import load

    rows = registry.QUERIES["q_agg_ols_regression"](spark, SF_DIR).collect()
    assert rows
    li = load(spark, SF_DIR, "lineitem").select(
        "l_linestatus", "l_quantity", "l_extendedprice"
    ).collect()
    for r in rows:
        xs = [g.l_quantity for g in li if g.l_linestatus == r.l_linestatus]
        ys = [
            g.l_extendedprice / 100.0
            for g in li
            if g.l_linestatus == r.l_linestatus
        ]
        n = len(xs)
        assert n == r.n
        mx, my = sum(xs) / n, sum(ys) / n
        sxy = sum((a - mx) * (b - my) for a, b in zip(xs, ys))
        sxx = sum((a - mx) ** 2 for a in xs)
        syy = sum((b - my) ** 2 for b in ys)
        slope = sxy / sxx
        assert abs(r.slope - slope) < 1e-3
        assert abs(r.intercept - (my - slope * mx)) < 1e-3
        assert abs(r.r2 - (sxy * sxy) / (sxx * syy)) < 1e-3
        assert 0.0 <= r.r2 <= 1.0 + 1e-9


def test_ols_recovers_exact_linear_relation(spark, tmp_path):
    """On a synthetic table where y = 200 + 300·x exactly (in raw price
    units), the fit must return slope 3, intercept 2, r2 1 (hundreds
    denomination) bit-exactly after rounding."""
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [("A", float(q), 200.0 + 300.0 * q) for q in range(1, 21)],
        "l_linestatus string, l_quantity double, l_extendedprice double",
    ).write.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    fn = registry.QUERIES["q_agg_ols_regression"].__wrapped__
    row = fn(spark, sf_dir).collect()[0]
    assert row.slope == 3.0
    assert row.intercept == 2.0
    assert row.r2 == 1.0


def test_theil_nonnegative_and_zero_on_constant(spark, tmp_path):
    """Theil T >= 0 always (Jensen), and exactly 0 for a group whose
    values are all equal."""
    rows = registry.QUERIES["q_agg_theil_index"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.theil_t >= 0.0, r
        assert r.mean_price > 0
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [("1-URGENT", 42.0)] * 10,
        "o_orderpriority string, o_totalprice double",
    ).write.parquet(os.path.join(sf_dir, "orders.parquet"))
    fn = registry.QUERIES["q_agg_theil_index"].__wrapped__
    row = fn(spark, sf_dir).collect()[0]
    assert row.theil_t == 0.0
    assert row.mean_price == 42.0


def test_k_anonymity_partitions_every_row(spark):
    """Class sizes must tile the customer table exactly: Σ n_rows =
    |customer|, row shares sum to 1 (±rounding), and the k_anonymous
    flag is k >= 5 everywhere."""
    from oraaud_kafka_spark.tables import load

    rows = registry.QUERIES["q_privacy_k_anonymity"](spark, SF_DIR).collect()
    assert rows
    n_total = load(spark, SF_DIR, "customer").count()
    assert sum(r.n_rows for r in rows) == n_total
    assert sum(r.n_rows for r in rows) == sum(r.k * r.n_classes for r in rows)
    assert abs(sum(r.row_share for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert r.k_anonymous == (r.k >= 5)


def test_char_entropy_information_bounds(spark):
    """0 <= H <= ln(n_distinct) for every document (entropy is maximal
    for the uniform char distribution); single-char docs give H = 0."""
    rows = registry.QUERIES["q_text_char_entropy"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_chars_doc > 0
        assert 1 <= r.n_distinct_chars <= r.n_chars_doc
        assert -1e-9 <= r.entropy_nats <= math.log(r.n_distinct_chars) + 1e-6
        if r.n_distinct_chars == 1:
            assert r.entropy_nats == 0.0
        assert r.natural_band == (2.0 <= r.entropy_nats <= 4.5)


def test_multiband_containment_is_superset_of_single_band(spark):
    """Band 1 of the multiband operator IS the single-band blocking, so
    every q_dedup_containment pair must reappear (with via_band1) and
    the extra pairs must all be band-2-only catches — the recall lift
    the second band exists to buy."""
    single = {
        (r.doc_a, r.doc_b): r
        for r in registry.QUERIES["q_dedup_containment"](spark, SF_DIR).collect()
    }
    multi = {
        (r.doc_a, r.doc_b): r
        for r in registry.QUERIES["q_dedup_containment_multiband"](
            spark, SF_DIR
        ).collect()
    }
    assert set(single) <= set(multi)
    for pair, m in multi.items():
        assert m.via_band1 or m.via_band2
        if pair in single:
            s = single[pair]
            assert m.via_band1
            assert (m.n_a, m.n_b, m.n_inter, m.containment) == (
                s.n_a, s.n_b, s.n_inter, s.containment
            )
        else:
            assert not m.via_band1 and m.via_band2


def test_lm_mean_rounds_half_away_at_constructed_midpoint(spark, tmp_path):
    """Regression pin for the sf0.1 midpoint split: a corpus built so a
    doc's summed token logprob divided by its token count lands near a
    6-dp boundary must round identically to the integer half-away rule
    — and bit-identically to the DuckDB oracle on the same corpus."""
    import os

    from oraaud_kafka_spark import registry
    from oraaud_kafka_spark.testing import compare_frames
    import duckdb

    sf_dir = str(tmp_path)
    # 2 docs over a 3-token vocab: every (cnt, total) pair is tiny, so
    # each lp term is a 12-dp decimal and the per-doc mean exercises
    # the integer division path including negative half-away rounding
    docs = [
        (0, "a a b", "en", "s", 5),
        (1, "b c c c", "en", "s", 7),
    ]
    spark.createDataFrame(
        docs, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(os.path.join(sf_dir, "documents.parquet"))
    fn = registry.QUERIES["q_text_unigram_logprob"].__wrapped__
    got = fn(spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet/*.parquet'"
    )
    want = con.execute(
        registry.ORACLES["q_text_unigram_logprob"]
    ).fetchdf()
    assert not compare_frames(got, want)
    # half-away arithmetic check against a pure-Python picounit fold
    import math
    from decimal import ROUND_HALF_UP, Decimal

    toks = ["a", "a", "b", "b", "c", "c", "c"]
    cnt = {"a": 2, "b": 2, "c": 3}
    for _, row in got.iterrows():
        doc_toks = docs[int(row.doc_id)][1].split(" ")
        s = sum(
            int(
                (
                    Decimal(math.log(cnt[t] / len(toks))).quantize(
                        Decimal("1e-12"), rounding=ROUND_HALF_UP
                    )
                )
                * 10**12
            )
            for t in doc_toks
        )
        n = len(doc_toks)
        q = (2 * abs(s) + n * 10**6) // (2 * n * 10**6)
        expect = (-q if s < 0 else q) / 10**6
        assert row.avg_logprob == expect


def test_auc_matches_brute_force_pair_count(spark):
    """The rank-sum AUC must equal the O(n_pos*n_neg) definition —
    P(pos scores above neg, ties half credit) — counted directly."""
    from oraaud_kafka_spark.queries.aggregates import _AUC_POS
    from oraaud_kafka_spark.tables import load

    r = registry.QUERIES["q_eval_auc_roc"](spark, SF_DIR).collect()[0]
    rows = load(spark, SF_DIR, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("v"),
        F.col("o_orderpriority").isin(*_AUC_POS).alias("pos"),
    ).collect()
    pos = sorted(g.v for g in rows if g.pos)
    neg = sorted(g.v for g in rows if not g.pos)
    assert (r.n_pos, r.n_neg) == (len(pos), len(neg))
    import bisect

    # for each positive: #neg strictly below + half the ties
    wins = sum(
        bisect.bisect_left(neg, v) + 0.5 * (
            bisect.bisect_right(neg, v) - bisect.bisect_left(neg, v)
        )
        for v in pos
    )
    auc = wins / (len(pos) * len(neg))
    assert abs(r.auc - auc) < 1e-6
    assert abs(r.gini_rank - (2 * auc - 1)) < 1e-6
    assert 0.0 <= r.auc <= 1.0


def test_calibration_bins_partition_and_exact_brier(spark):
    """Bins must partition every lineitem row, and the integer-scaled
    Brier contributions must match the definition sum((p-y)^2)."""
    from oraaud_kafka_spark.tables import load

    rows = registry.QUERIES["q_eval_calibration_bins"](
        spark, SF_DIR
    ).collect()
    li = load(spark, SF_DIR, "lineitem")
    assert sum(r.n for r in rows) == li.count()
    for r in rows:
        assert 0 <= r.pb <= 10
        assert 0 <= r.events <= r.n
        assert 0.0 <= r.event_rate <= 1.0
        # sum((p - y)^2) * 100 with p = pb/10 over n rows, e of them y=1:
        # e*(10-pb)^2/100*100... = n*pb^2 - 20*pb*e + 100*e
        expect = r.n * r.pb * r.pb - 20 * r.pb * r.events + 100 * r.events
        assert r.brier_sum_x100 == expect
        assert r.brier_sum_x100 >= 0


def test_kaplan_meier_curve_shape_and_censoring(spark):
    """S must start <= 1, be strictly positive before any extinction
    step, never increase; the risk set must strictly shrink; and with
    censoring the curve must sit ABOVE the naive drop-everyone-censored
    empirical CDF complement at every step (censoring can only raise
    survival estimates)."""
    rows = registry.QUERIES["q_events_kaplan_meier"](
        spark, SF_DIR
    ).collect()
    assert rows
    prev_s, prev_n = 1.0 + 1e-12, None
    for r in rows:
        assert r.d_ev > 0
        assert r.n_risk >= r.d_ev
        assert 0.0 <= r.survival <= prev_s + 1e-9
        if prev_n is not None:
            assert r.n_risk < prev_n
        prev_s, prev_n = r.survival, r.n_risk


def test_kaplan_meier_no_censoring_equals_empirical(spark, tmp_path):
    """With every user converting (no censoring), KM must reduce to the
    plain empirical survival 1 - F(t) — the textbook degenerate case."""
    import os as _os

    sf_dir = str(tmp_path)
    rows = []
    eid = 0
    # 10 users: signup at t0, purchase at hour u (u = 1..10)
    for u in range(1, 11):
        eid += 1
        rows.append((eid, "2026-01-01 00:00:00", u, "signup", 1.0, "{}"))
        eid += 1
        rows.append(
            (eid, f"2026-01-01 {u:02d}:00:01", u, "purchase", 1.0, "{}")
        )
    spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.parquet(
        _os.path.join(sf_dir, "events.parquet")
    )
    fn = registry.QUERIES["q_events_kaplan_meier"].__wrapped__
    out = {r.dur_h: r for r in fn(spark, sf_dir).collect()}
    assert set(out) == set(range(1, 11))
    for t in range(1, 11):
        # empirical: 10-t of 10 users survive past hour t
        assert abs(out[t].survival - (10 - t) / 10) < 1e-6
        assert out[t].n_risk == 10 - t + 1
        assert out[t].d_ev == 1
    assert out[10].survival == 0.0  # extinction guard: exact zero


def test_l_diversity_consistent_with_k_anonymity_classes(spark):
    """l-diversity groups the same QI classes the k-anonymity audit
    counts: class and row totals must agree, and every class holds at
    least one sensitive band (l >= 1) with l <= class size."""
    ld = registry.QUERIES["q_privacy_l_diversity"](spark, SF_DIR).collect()
    ka = registry.QUERIES["q_privacy_k_anonymity"](spark, SF_DIR).collect()
    assert sum(r.n_classes for r in ld) == sum(r.n_classes for r in ka)
    assert sum(r.n_rows for r in ld) == sum(r.n_rows for r in ka)
    assert all(r.l >= 1 for r in ld)
    assert abs(sum(r.row_share for r in ld) - 1.0) < 1e-5


def test_confusion_matrix_identities(spark):
    """Counts must partition the table; precision/recall/F1 must obey
    their defining identities (F1 = harmonic mean when both defined)."""
    from oraaud_kafka_spark.tables import load

    r = registry.QUERIES["q_eval_confusion_threshold"](
        spark, SF_DIR
    ).collect()[0]
    li = load(spark, SF_DIR, "lineitem")
    assert r.tp + r.fp + r.fn + r.tn == li.count()
    assert min(r.tp, r.fp, r.fn, r.tn) >= 0
    if r.precision_ is not None and r.recall_ is not None and (
        r.precision_ + r.recall_
    ) > 0:
        h = 2 * r.precision_ * r.recall_ / (r.precision_ + r.recall_)
        assert abs(r.f1 - h) < 1e-5
    assert abs(
        r.accuracy - (r.tp + r.tn) / (r.tp + r.fp + r.fn + r.tn)
    ) < 1e-6


def test_ndcg_bounds_and_perfect_ranking(spark, tmp_path):
    """NDCG must sit in (0, 1]; and on a constructed space where every
    query's same-label vectors are exactly its nearest neighbors the
    score must be exactly 1."""
    import os as _os

    rows = registry.QUERIES["q_eval_ndcg_retrieval"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        if r.ndcg is not None:
            assert 0.0 < r.ndcg <= 1.0
            assert r.n_rel >= 1
    # constructed: 2 queries (ids 0,1) + 20 corpus vectors in 2 exact
    # clusters along axes; same-label corpus vectors have cosine 1
    sf_dir = str(tmp_path)
    vecs = []
    for vid in range(2):
        v = [0.0, 0.0]
        v[vid] = 1.0
        vecs.append((vid, v, vid))
    for i in range(20):
        lab = i % 2
        v = [0.0, 0.0]
        v[lab] = 2.0 + i  # same direction as query `lab`
        vecs.append((10 + i, v, lab))
    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    )
    spark.createDataFrame(vecs, schema).write.parquet(
        _os.path.join(sf_dir, "embeddings.parquet")
    )
    fn = registry.QUERIES["q_eval_ndcg_retrieval"].__wrapped__
    out = fn(spark, sf_dir).collect()
    assert len(out) == 2
    for r in out:
        assert r.ndcg == 1.0


def test_t_closeness_bounds_and_uniform_zero(spark, tmp_path):
    """TVD must lie in [0, 1] and classes must cover every customer;
    on a constructed table where every class has the identical band
    distribution, every TVD must be exactly 0."""
    import os as _os

    from oraaud_kafka_spark.tables import load

    rows = registry.QUERIES["q_privacy_t_closeness"](spark, SF_DIR).collect()
    assert rows
    assert sum(r.n for r in rows) == load(spark, SF_DIR, "customer").count()
    for r in rows:
        assert 0.0 <= r.tvd <= 1.0
    # constructed: 4 classes x identical band mix {0: 2 rows, 1: 1 row}
    sf_dir = str(tmp_path)
    data = []
    cid = 0
    for nk in (1, 2):
        for seg in ("A", "B"):
            for bal, reps in ((500.0, 2), (1500.0, 1)):
                for _ in range(reps):
                    cid += 1
                    data.append((cid, f"c{cid}", nk, bal, seg))
    spark.createDataFrame(
        data,
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string",
    ).write.parquet(_os.path.join(sf_dir, "customer.parquet"))
    fn = registry.QUERIES["q_privacy_t_closeness"].__wrapped__
    out = fn(spark, sf_dir).collect()
    assert len(out) == 4
    for r in out:
        assert r.tvd == 0.0
        assert bool(r.t_close) is True
