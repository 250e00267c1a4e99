"""Internal-consistency invariants of the round-9 fixes and operators —
relations that must hold regardless of fixture content, complementing
the DuckDB value parity in test_parity.py."""

from __future__ import annotations

import math
import os
from decimal import ROUND_HALF_UP, Decimal

import duckdb

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
