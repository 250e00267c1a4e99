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
