"""Internal-consistency invariants of the round-7 operators — relations
between output columns that must hold regardless of fixture content,
complementing the DuckDB value parity in test_parity.py."""

from __future__ import annotations

import math

from oraaud_kafka_spark import registry

from .conftest import SF_DIR

registry.load_all()


def test_containment_eval_recall_sane(spark):
    """caught <= true pairs per language; recall = caught/true exactly
    when pairs exist, NULL otherwise; doc counts positive; the slice is
    strictly smaller than the corpus."""
    rows = registry.QUERIES["q_dedup_containment_eval"](spark, SF_DIR).collect()
    assert rows
    from oraaud_kafka_spark.tables import load

    n_total = load(spark, SF_DIR, "documents").count()
    assert sum(r.n_docs for r in rows) < n_total
    for r in rows:
        assert r.n_docs > 0
        assert 0 <= r.n_caught <= r.n_true_pairs
        if r.n_true_pairs:
            assert r.recall == r.n_caught / r.n_true_pairs
        else:
            assert r.recall is None


def test_whiten_apply_standardizes(spark):
    """Whitened components of each live dimension must have mean ~0 and
    sample std ~1 (that IS the whitening contract); dead dims are all
    NULL."""
    import collections

    rows = registry.QUERIES["q_emb_whiten_apply"](spark, SF_DIR).collect()
    by_dim = collections.defaultdict(list)
    for r in rows:
        by_dim[r.dim].append(r.whitened)
    assert by_dim
    for dim, vals in by_dim.items():
        nn = [v for v in vals if v is not None]
        assert nn == vals or not nn, f"dim {dim} mixes NULL and values"
        if not nn:
            continue
        n = len(nn)
        mean = sum(nn) / n
        var = sum((v - mean) ** 2 for v in nn) / (n - 1)
        assert abs(mean) < 1e-6, dim
        assert abs(math.sqrt(var) - 1.0) < 1e-6, dim  # stats from DECIMAL(18,8) moments: ~1e-8 quantization


def test_holt_trend_reduces_to_python_fold(spark):
    """The (level, trend) pair per user must equal the pure-Python
    zero-seeded Holt fold over that user's (ts, event_id)-ordered
    non-NULL-ts values, and forecast_next = level + trend."""
    from pyspark.sql import functions as F

    from oraaud_kafka_spark.queries.event_time import _HW_ALPHA, _HW_BETA
    from oraaud_kafka_spark.tables import load

    ev = (
        load(spark, SF_DIR, "events")
        .where(F.col("ts").isNotNull())
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    seqs: dict = {}
    for r in sorted(ev, key=lambda r: (r.ts, r.event_id)):
        seqs.setdefault(r.user_id, []).append(r.value)
    rows = registry.QUERIES["q_time_holt_trend"](spark, SF_DIR).collect()
    assert set(r.user_id for r in rows) == set(seqs)
    for r in rows:
        level = trend = 0.0
        for v in seqs[r.user_id]:
            new_level = _HW_ALPHA * v + (1 - _HW_ALPHA) * (level + trend)
            trend = _HW_BETA * (new_level - level) + (1 - _HW_BETA) * trend
            level = new_level
        assert r.n_events == len(seqs[r.user_id])
        assert abs(r.level - round(level, 6)) < 1e-9
        assert abs(r.trend - round(trend, 6)) < 1e-9
        assert abs(r.forecast_next - round(level + trend, 6)) < 1e-9


def test_reservoir_exact_k_and_partition_invariant(spark):
    """Exactly k rows per language (or the whole stratum when smaller),
    ranks 1..k dense, and the SAMPLE is identical under a different
    input partitioning — the reproducibility contract."""
    from pyspark.sql import functions as F

    from oraaud_kafka_spark.llm.packing import _RESERVOIR_K
    from oraaud_kafka_spark.tables import load

    rows = registry.QUERIES["q_sample_reservoir"](spark, SF_DIR).collect()
    strata = (
        load(spark, SF_DIR, "documents")
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    sizes = {r.lang: r.n for r in strata}
    got: dict = {}
    for r in rows:
        got.setdefault(r.lang, []).append((r.rk, r.doc_id))
    assert set(got) == {l for l, n in sizes.items() if n > 0}
    for lang, pairs in got.items():
        assert len(pairs) == min(_RESERVOIR_K, sizes[lang])
        assert sorted(rk for rk, _ in pairs) == list(range(1, len(pairs) + 1))
    # partition-invariance: rebuild from a repartitioned source
    d = load(spark, SF_DIR, "documents").repartition(13)
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    again = (
        d.select("lang", "doc_id", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= _RESERVOIR_K)
        .collect()
    )
    assert {(r.lang, r.doc_id, r.rk) for r in again} == {
        (r.lang, r.doc_id, r.rk) for r in rows
    }


def test_source_kl_nonnegative_and_entropy_consistent(spark):
    """KL(P_s || P_c) >= 0 (Gibbs), zero only if the source matches the
    corpus mix; token/vocab counts agree with the entropy report (same
    tokenization, same grouping)."""
    kl = registry.QUERIES["q_text_source_kl"](spark, SF_DIR).collect()
    ent = {
        r.source: r
        for r in registry.QUERIES["q_text_source_entropy"](
            spark, SF_DIR
        ).collect()
    }
    assert kl and set(r.source for r in kl) == set(ent)
    for r in kl:
        assert r.kl_nats >= -1e-6, r.source
        assert r.n_tokens == ent[r.source].n_tokens
        assert r.vocab == ent[r.source].vocab


def test_dim_stats_degenerate_shapes_null_not_crash(spark, tmp_path):
    """A single-vector table (n=1 per dim: sample variance undefined,
    ANSI division by zero) and a constant dimension (DECIMAL-quantized
    moments can go epsilon-negative: DuckDB sqrt crash / Spark NaN)
    must both yield std/whitened = NULL on BOTH engines — the review
    crash class behind the min<max + greatest(,0) guards."""
    import os

    import duckdb

    from oraaud_kafka_spark import registry

    for rows, tag in (
        ([(0, [0.5, 0.9], 0)], "single"),
        ([(i, [0.9000000051, float(i)], 0) for i in range(4)], "constdim"),
    ):
        d = tmp_path / tag
        d.mkdir()
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).coalesce(1).write.parquet(os.path.join(str(d), "embeddings.parquet"))
        got = registry.QUERIES["q_emb_whiten_apply"].__wrapped__(
            spark, str(d)
        ).collect()
        dead = [r.whitened for r in got if r.dim == 0]
        assert dead and all(v is None for v in dead), (tag, dead)
        stats = registry.QUERIES["q_emb_dim_stats"].__wrapped__(
            spark, str(d)
        ).collect()
        assert stats[0].std_val is None, tag
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM "
            f"'{d}/embeddings.parquet/*.parquet'"
        )
        orc = con.execute(registry.ORACLES["q_emb_whiten_apply"]).fetchall()
        assert all(r[2] is None for r in orc if r[1] == 0), tag


def test_zipf_fit_matches_python_ols(spark):
    """The Zipf OLS must reproduce a pure-Python fit over the same
    (rounded-term) rank/frequency pairs: slope negative on the fixture
    corpus, r2 in [0, 1], counts consistent."""
    import collections

    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_DIR}/documents.parquet").to_pylist()
    counts = collections.Counter()
    for row in t:
        counts.update(row["text"].split(" "))
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    xs, ys = [], []
    for r, (_, c) in enumerate(ranked, start=1):
        xs.append(round(math.log(r), 12))
        ys.append(round(math.log(c), 12))
    n = float(len(xs))
    sx, sy = sum(xs), sum(ys)
    sxy = sum(round(x * y, 12) for x, y in zip(xs, ys))
    sx2 = sum(round(x * x, 12) for x in xs)
    sy2 = sum(round(y * y, 12) for y in ys)
    slope = (n * sxy - sx * sy) / (n * sx2 - sx * sx)
    r2 = (n * sxy - sx * sy) ** 2 / ((n * sx2 - sx * sx) * (n * sy2 - sy * sy))
    row = registry.QUERIES["q_text_zipf_fit"](spark, SF_DIR).first()
    assert row.n_vocab == len(ranked)
    assert row.n_tokens == sum(counts.values())
    assert abs(row.zipf_slope - round(slope, 6)) < 1e-6
    assert abs(row.r2 - round(r2, 6)) < 1e-6
    assert row.zipf_slope < 0
    assert 0.0 <= row.r2 <= 1.0


def test_skew_kurtosis_matches_python_moments(spark):
    """Exact-int64 moment algebra reproduces a straight pandas
    computation of population skewness / excess kurtosis."""
    rows = registry.QUERIES["q_agg_skew_kurtosis"](spark, SF_DIR).collect()
    import pandas as pd

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")[
        ["l_returnflag", "l_linestatus", "l_quantity"]
    ]
    for r in rows:
        q = li[
            (li.l_returnflag == r.l_returnflag)
            & (li.l_linestatus == r.l_linestatus)
        ].l_quantity.astype(int)
        assert r.n == len(q)
        m = q.mean()
        m2 = ((q - m) ** 2).mean()
        m3 = ((q - m) ** 3).mean()
        m4 = ((q - m) ** 4).mean()
        assert math.isclose(r.mean_qty, m, abs_tol=1e-5)
        assert math.isclose(r.var_pop, m2, abs_tol=1e-4)
        assert math.isclose(r.skewness, m3 / m2**1.5, abs_tol=1e-5)
        assert math.isclose(r.kurtosis_excess, m4 / m2**2 - 3, abs_tol=1e-5)


def test_mode_is_argmax_of_counts(spark):
    rows = registry.QUERIES["q_agg_mode_deterministic"](
        spark, SF_DIR
    ).collect()
    import pandas as pd

    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    for r in rows:
        seg = cust[cust.c_mktsegment == r.c_mktsegment]
        counts = seg.groupby("c_nationkey").size()
        top = counts.max()
        assert r.mode_count == top
        # pinned tie-break: smallest key among argmax nations
        assert r.mode_nationkey == min(
            k for k, v in counts.items() if v == top
        )
        assert r.seg_customers == len(seg)


def test_attribution_credit_conserved(spark):
    """Every converting user with >= 1 preceding touch hands out exactly
    one first-touch and one last-touch credit."""
    rows = registry.QUERIES["q_events_attribution"](spark, SF_DIR).collect()
    first_total = sum(r.first_touch_users for r in rows)
    last_total = sum(r.last_touch_users for r in rows)
    assert first_total == last_total
    assert first_total > 0
    assert all(r.event_type != "purchase" for r in rows)


def test_cusum_final_deviation_is_zero(spark):
    """CUSUM of deviations from the own-series mean telescopes to ~0 at
    the last hour, so the reported peak must dominate it."""
    from pyspark.sql import functions as F  # noqa: F401

    rows = registry.QUERIES["q_time_cusum_changepoint"](
        spark, SF_DIR
    ).collect()
    assert rows
    for r in rows:
        assert r.n_hours >= 1
        # peak |CUSUM| is >= the terminal value |~0| by construction
        assert abs(r.peak_cusum_dollars) >= -1e-9


def test_pagerank_matches_python_power_iteration(spark):
    """The DataFrame loop reproduces a pure-Python replay of the same
    rounded update, and ranks form a probability-like vector."""
    rows = registry.QUERIES["q_events_pagerank"](spark, SF_DIR).collect()
    import collections

    import pandas as pd

    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev = ev[ev.ts.notna()].sort_values(["user_id", "ts", "event_id"])
    edges = collections.Counter()
    for _, g in ev.groupby("user_id"):
        types = g.event_type.tolist()
        for a, b in zip(types, types[1:]):
            edges[(a, b)] += 1
    verts = sorted({a for a, _ in edges} | {b for _, b in edges})
    nv = len(verts)
    out_w = collections.Counter()
    for (a, _), w in edges.items():
        out_w[a] += w
    shares = {(a, b): w / out_w[a] for (a, b), w in edges.items()}
    from decimal import Decimal

    rank = {t: round(1.0 / nv, 9) for t in verts}
    for _ in range(12):
        contrib = collections.defaultdict(Decimal)
        for (a, b), s in shares.items():
            contrib[b] += Decimal(str(round(s * rank[a], 12)))
        rank = {
            t: round(0.15 / nv + 0.85 * float(contrib[t]), 9) for t in verts
        }
    got = {r.event_type: r.pagerank for r in rows}
    assert set(got) == set(verts)
    for t in verts:
        assert math.isclose(got[t], round(rank[t], 6), abs_tol=2e-6), t
    # every vertex keeps at least the teleport share
    assert all(v >= 0.15 / nv - 1e-9 for v in got.values())


def test_degree_profile_flow_conservation(spark):
    """Total weighted out-degree == total weighted in-degree == number
    of transitions."""
    rows = registry.QUERIES["q_graph_degree_profile"](
        spark, SF_DIR
    ).collect()
    assert sum(r.out_w for r in rows) == sum(r.in_w for r in rows) > 0


def test_mips_reduction_exact_vs_python(spark):
    """Augmented-space ranking must equal brute-force raw inner product,
    and every augmented corpus norm must equal M (dev == 0)."""
    rows = registry.QUERIES["q_sim_mips_augmented"](spark, SF_DIR).collect()
    assert rows and all(r.aug_norm_dev == 0.0 for r in rows)
    import numpy as np
    import pandas as pd

    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    vecs = {int(r.vec_id): np.array(r.embedding, dtype=float)
            for r in emb.itertuples()}
    vecs = {k: v for k, v in vecs.items() if np.linalg.norm(v) > 0}
    by_q = {}
    for r in rows:
        by_q.setdefault(r.qid, []).append(r)
    for qid, got in by_q.items():
        got.sort(key=lambda r: r.rnk)
        dots = sorted(
            ((float(vecs[qid] @ v), nid) for nid, v in vecs.items()
             if nid != qid),
            key=lambda t: (-t[0], t[1]),
        )
        assert [r.nid for r in got] == [nid for _, nid in dots[:5]]


def test_gini_matches_python_sorted_formula(spark):
    rows = registry.QUERIES["q_agg_gini"](spark, SF_DIR).collect()
    import pandas as pd

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    for r in rows:
        x = sorted(
            int(round(v * 100))
            for v in o[o.o_orderpriority == r.o_orderpriority].o_totalprice
        )
        n = len(x)
        six = sum((i + 1) * v for i, v in enumerate(x))
        g = 2 * six / (n * sum(x)) - (n + 1) / n
        assert r.n == n
        assert math.isclose(r.gini, g, abs_tol=1e-5)
        assert 0 <= r.gini < 1


def test_basket_rules_counts_match_python(spark):
    rows = registry.QUERIES["q_basket_association_rules"](
        spark, SF_DIR
    ).collect()
    assert rows
    import collections

    import pandas as pd

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    baskets = li.groupby("l_orderkey").l_partkey.apply(set)
    n_baskets = len(baskets)
    item = collections.Counter()
    for b in baskets:
        item.update(b)
    pair = collections.Counter()
    for b in baskets:
        keep = sorted(p for p in b if item[p] >= 3)
        for i, a in enumerate(keep):
            for c in keep[i + 1:]:
                pair[(a, c)] += 1
    for r in rows:
        assert r.pair_n == pair[(r.p_a, r.p_b)]
        assert r.n_a == item[r.p_a] and r.n_b == item[r.p_b]
        assert math.isclose(
            r.lift, r.pair_n * n_baskets / (r.n_a * r.n_b), abs_tol=1e-5
        )
    # output is the lift-descending head
    lifts = [r.lift for r in rows]
    assert lifts == sorted(lifts, reverse=True)


def test_readability_formula_and_band_consistent(spark):
    rows = registry.QUERIES["q_text_readability"](spark, SF_DIR).collect()
    import re

    import pandas as pd

    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet").set_index("doc_id")
    for r in rows[:50]:
        text = docs.loc[r.doc_id].text
        assert r.n_words == len(text.split(" "))
        assert r.n_syllables == len(re.findall(r"[aeiou]+", text))
        assert r.n_sentences == max(1, len(re.findall(r"[.!?]+", text)))
        f = (206.835 - 1.015 * r.n_words / r.n_sentences
             - 84.6 * r.n_syllables / r.n_words)
        assert math.isclose(r.flesch, f, abs_tol=1e-5)
        expect = ("easy" if f >= 60 else
                  "standard" if f >= 30 else "difficult")
        assert r.band == expect


def test_ngram_novelty_bounds_and_python_spotcheck(spark):
    rows = registry.QUERIES["q_text_ngram_novelty"](spark, SF_DIR).collect()
    assert rows
    import collections

    import pandas as pd

    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    sh = {}
    for r in docs.itertuples():
        toks = r.text.split(" ")
        sh[r.doc_id] = {
            " ".join(toks[i:i + 3]) for i in range(len(toks) - 2)
        } if len(toks) >= 3 else set()
    df = collections.Counter()
    for s in sh.values():
        df.update(s)
    for r in rows[:40]:
        mine = sh[r.doc_id]
        assert r.n_ngrams == len(mine)
        assert r.n_novel == sum(1 for g in mine if df[g] == 1)
        assert 0.0 <= r.novelty <= 1.0


def test_seasonal_naive_skill_definition(spark):
    rows = registry.QUERIES["q_time_seasonal_naive_eval"](
        spark, SF_DIR
    ).collect()
    for r in rows:
        assert r.n_eval > 0
        assert r.mae_naive >= 0 and r.mae_seasonal >= 0
        if r.skill is not None:
            assert math.isclose(
                r.skill, 1 - r.mae_seasonal / r.mae_naive, abs_tol=1e-4
            )


def test_distribution_ranks_consistency(spark):
    rows = registry.QUERIES["q_window_distribution_ranks"](
        spark, SF_DIR
    ).collect()
    import collections

    by_seg = collections.defaultdict(list)
    for r in rows:
        by_seg[r.c_mktsegment].append(r)
    for seg, rs in by_seg.items():
        n = len(rs)
        # rows arrive in the pinned order; check the closed forms
        for i, r in enumerate(rs):
            if n > 1:
                assert math.isclose(
                    r.pct_rank, i / (n - 1), abs_tol=1e-5
                ), (seg, i)
            assert math.isclose(r.cume, (i + 1) / n, abs_tol=1e-5)
        quartiles = [r.quartile for r in rs]
        assert quartiles == sorted(quartiles)
        assert set(quartiles) <= {1, 2, 3, 4}


def test_weighted_reservoir_exact_k_and_matches_python(spark):
    """A-ES sample: exactly K per language (or the whole language if
    smaller), and the selected set equals a pure-Python replay of the
    md5-derived keys."""
    import hashlib

    import pandas as pd

    rows = registry.QUERIES["q_sample_weighted_reservoir"](
        spark, SF_DIR
    ).collect()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")

    def key(doc_id, n_chars):
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:12], 16)
        u = (h + 1) / 281474976710656.0
        return -math.log(u) / max(1, n_chars)

    import collections

    got = collections.defaultdict(list)
    for r in rows:
        got[r.lang].append(r.doc_id)
    for lang, grp in docs.groupby("lang"):
        expect = sorted(
            ((key(r.doc_id, r.n_chars), r.doc_id) for r in grp.itertuples()),
        )[:8]
        assert got[lang] == [d for _, d in expect], lang


def test_acf_bounds_and_lag1_sanity(spark):
    rows = registry.QUERIES["q_time_autocorrelation"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n > 0
        if r.acf is not None:
            assert -1.0 - 1e-9 <= r.acf <= 1.0 + 1e-9
    lags = {(r.event_type, r.lag_h) for r in rows}
    assert any(l == 1 for _, l in lags) and any(l == 24 for _, l in lags)


def test_trimmed_mean_matches_python(spark):
    rows = registry.QUERIES["q_agg_trimmed_mean"](spark, SF_DIR).collect()
    import pandas as pd

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    for r in rows:
        x = sorted(
            int(round(v * 100))
            for v in o[o.o_orderpriority == r.o_orderpriority].o_totalprice
        )
        n = len(x)
        k = n // 10
        kept = x[k:n - k]
        assert r.n == n and r.k == k and r.n_kept == len(kept)
        if kept:
            assert math.isclose(
                r.trimmed_mean, sum(kept) / len(kept) / 100, abs_tol=1e-4
            )


def test_psi_matches_python_and_zero_on_identical(spark):
    rows = registry.QUERIES["q_quality_psi_drift"](spark, SF_DIR).collect()
    import collections

    import pandas as pd

    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    for r in rows:
        g = docs[docs.lang == r.lang]
        ca, cb = collections.Counter(), collections.Counter()
        for t in g.itertuples():
            b = min(9, t.n_chars // 60)
            (ca if t.doc_id % 2 == 0 else cb)[b] += 1
        na, nb = sum(ca.values()), sum(cb.values())
        psi = 0.0
        for b in set(ca) | set(cb):
            p = (ca[b] + 1) / (na + 10)
            q = (cb[b] + 1) / (nb + 10)
            psi += (p - q) * math.log(p / q)
        assert r.n_half_a == na and r.n_half_b == nb
        assert math.isclose(r.psi, psi, abs_tol=1e-5)
        assert r.psi >= -1e-12  # PSI is a sum of (p-q)ln(p/q) >= 0 terms


def test_kfold_partitions_and_balance(spark):
    rows = registry.QUERIES["q_split_kfold"](spark, SF_DIR).collect()
    import pandas as pd

    total = len(pd.read_parquet(f"{SF_DIR}/documents.parquet"))
    assert sum(r.n_docs for r in rows) == total  # disjoint + exhaustive
    assert {r.fold for r in rows} <= set(range(5))
    for r in rows:
        assert math.isclose(r.share, r.n_docs / total, abs_tol=1e-5)


def test_silence_profile_consistent(spark):
    rows = registry.QUERIES["q_multimodal_silence_ratio"](
        spark, SF_DIR
    ).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_silent <= r.n_frames
        assert math.isclose(r.silence_ratio, r.n_silent / r.n_frames,
                            abs_tol=1e-6)
        if r.n_silent == r.n_frames:
            assert r.lead_trim_frames == r.trail_trim_frames == r.n_frames
        else:
            assert r.lead_trim_frames + r.trail_trim_frames <= r.n_frames - 1


def test_concurrency_matches_python_sweep(spark):
    """Segmented two-level prefix sum equals a straight Python sweep
    with the same tie policy (ends before starts, then user)."""
    row = registry.QUERIES["q_events_concurrency"](spark, SF_DIR).collect()[0]
    import pandas as pd

    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev = ev[ev.ts.notna()].sort_values(["user_id", "ts", "event_id"])
    bounds = []
    for uid, g in ev.groupby("user_id"):
        start = prev = None
        for t in g.ts:
            if prev is None or (t - prev).total_seconds() >= 1800:
                if start is not None:
                    bounds.append((uid, start, prev))
                start = t
            prev = t
        bounds.append((uid, start, prev))
    pts = [(s, 1, u) for u, s, _ in bounds] + [(e, -1, u) for u, _, e in bounds]
    pts.sort(key=lambda p: (p[0], p[1], p[2]))
    conc = peak = 0
    peak_ts = None
    for t, d, _ in pts:
        conc += d
        if conc > peak:
            peak, peak_ts = conc, t
    assert row.n_sessions == len(bounds)
    assert row.peak_concurrency == peak
    assert row.peak_ts == peak_ts


def test_jsd_bounds_and_symmetric_identity(spark):
    """JSD is symmetric, bounded by ln 2, and zero iff identical
    distributions — spot-check vs a pure-Python computation."""
    rows = registry.QUERIES["q_text_source_jsd"](spark, SF_DIR).collect()
    assert rows
    import collections

    import pandas as pd

    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    dist = {}
    for src, g in docs.groupby("source"):
        c = collections.Counter()
        for t in g.text:
            c.update(t.split(" "))
        n = sum(c.values())
        dist[src] = {w: v / n for w, v in c.items()}
    for r in rows:
        assert 0 <= r.jsd_nats <= math.log(2) + 1e-9
        p, q = dist[r.source_a], dist[r.source_b]
        jsd = 0.0
        for w in set(p) | set(q):
            pw, qw = p.get(w, 0.0), q.get(w, 0.0)
            m = (pw + qw) / 2
            if pw:
                jsd += 0.5 * pw * math.log(pw / m)
            if qw:
                jsd += 0.5 * qw * math.log(qw / m)
        assert math.isclose(r.jsd_nats, jsd, abs_tol=1e-4), (r, jsd)


def test_pmi_matches_python(spark):
    rows = registry.QUERIES["q_text_pmi_collocations"](spark, SF_DIR).collect()
    assert rows
    import collections

    import pandas as pd

    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    bi, uni = collections.Counter(), collections.Counter()
    for t in docs.text:
        ws = t.split(" ")
        uni.update(ws)
        bi.update(zip(ws, ws[1:]))
    n_bi, n_uni = sum(bi.values()), sum(uni.values())
    for r in rows:
        expect = math.log(
            (bi[(r.w_a, r.w_b)] / n_bi)
            / ((uni[r.w_a] / n_uni) * (uni[r.w_b] / n_uni))
        )
        assert r.c_ab == bi[(r.w_a, r.w_b)] and r.c_ab >= 3
        assert math.isclose(r.pmi, expect, abs_tol=1e-5)
    pmis = [r.pmi for r in rows]
    assert pmis == sorted(pmis, reverse=True)


def test_jsd_disjoint_sources_report_ln2(spark, tmp_path):
    """A source pair with zero shared vocabulary must still appear,
    at maximal divergence ln 2."""
    import os
    import shutil

    from .conftest import SF_DIR as _SF

    base = tmp_path / "disjoint"
    base.mkdir()
    for name in os.listdir(_SF):
        if name.endswith(".parquet") and name != "documents.parquet":
            src = os.path.join(_SF, name)
            dst = str(base / name)
            if os.path.isdir(src):
                shutil.copytree(src, dst)
            else:
                shutil.copy(src, dst)
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma", "en", "src_a", 16),
            (2, "delta epsilon zeta", "en", "src_b", 18),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.coalesce(1).write.parquet(str(base / "documents.parquet"))
    rows = registry.QUERIES["q_text_source_jsd"].__wrapped__(
        spark, str(base)
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.source_a, r.source_b) == ("src_a", "src_b")
    assert r.shared_vocab == 0
    assert math.isclose(r.jsd_nats, math.log(2), abs_tol=1e-6)


def test_bootstrap_ci_matches_python_replay(spark):
    """The 32 deterministic Poisson resample means, their rank-2/31
    bounds, and the full mean all reproduce in pure Python."""
    import hashlib

    import pandas as pd

    row = registry.QUERIES["q_agg_bootstrap_ci"](spark, SF_DIR).collect()[0]
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    cents = {
        int(r.o_orderkey): int(
            __import__("decimal").Decimal(r.o_totalprice * 100).quantize(
                __import__("decimal").Decimal(1),
                rounding=__import__("decimal").ROUND_HALF_UP,
            )
        )
        for r in o.itertuples()
    }
    cum = [0.3678794412, 0.7357588823, 0.9196986029, 0.9810118431,
           0.9963401532]
    means = []
    for b in range(32):
        sw = swc = 0
        for k, c in cents.items():
            # digest b//8, 16-bit hex slice (b%8)*4 .. +4 (the round-14
            # one-digest-seeds-eight-resamples recipe)
            digest = hashlib.md5(f"{k}:{b // 8}".encode()).hexdigest()
            h = int(digest[(b % 8) * 4 : (b % 8) * 4 + 4], 16)
            u = (h + 1) / 65537.0
            w = next((i for i, p in enumerate(cum) if u < p), 5)
            sw += w
            swc += w * c
        if sw:
            means.append((swc / sw / 100, b))
    means.sort()
    assert row.n_resamples == len(means) == 32
    assert math.isclose(row.ci_lo, round(means[1][0], 6), abs_tol=1e-6)
    assert math.isclose(row.ci_hi, round(means[-2][0], 6), abs_tol=1e-6)
    assert math.isclose(
        row.mean_price, round(sum(cents.values()) / len(cents) / 100, 6),
        abs_tol=1e-6,
    )
    assert row.ci_lo <= row.mean_price <= row.ci_hi


def test_benford_terms_and_freqs(spark):
    rows = registry.QUERIES["q_agg_benford_digits"](spark, SF_DIR).collect()
    assert {r.d for r in rows} <= set(range(1, 10))
    assert math.isclose(sum(r.observed_freq for r in rows), 1.0, abs_tol=1e-4)
    import pandas as pd

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    import collections
    import decimal

    c = collections.Counter(
        int(str(int(decimal.Decimal(v * 100).quantize(
            decimal.Decimal(1), rounding=decimal.ROUND_HALF_UP)))[0])
        for v in o.o_totalprice if v > 0
    )
    for r in rows:
        assert r.n_d == c[r.d]
        assert r.chi2_term >= 0


def test_seasonality_eta2_bounds_and_python(spark):
    rows = registry.QUERIES["q_time_seasonality_strength"](
        spark, SF_DIR
    ).collect()
    assert rows
    import collections
    import decimal

    import pandas as pd

    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev = ev[ev.ts.notna() & ev.value.notna()]
    for r in rows:
        if r.seasonal_eta2 is not None:
            assert -1e-9 <= r.seasonal_eta2 <= 1 + 1e-9
        g = ev[ev.event_type == r.event_type]
        hourly = collections.Counter()
        for t in g.itertuples():
            cents = int(decimal.Decimal(t.value * 100).quantize(
                decimal.Decimal(1), rounding=decimal.ROUND_HALF_UP))
            hourly[t.ts.floor("h")] += cents
        vals = list(hourly.values())
        n = len(vals)
        assert r.n == n
        by_hod = collections.defaultdict(list)
        for h, v in hourly.items():
            by_hod[h.hour].append(v)
        s = sum(vals)
        ssb = sum(sum(v) ** 2 / len(v) for v in by_hod.values()) - s * s / n
        sst = sum(v * v for v in vals) - s * s / n
        if sst > 0:
            assert math.isclose(r.seasonal_eta2, ssb / sst, abs_tol=1e-4)


def test_ks_two_sample_matches_scipy_style_python(spark):
    row = registry.QUERIES["q_agg_ks_two_sample"](spark, SF_DIR).collect()[0]
    import decimal

    import pandas as pd

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")

    def cents(v):
        return int(decimal.Decimal(v * 100).quantize(
            decimal.Decimal(1), rounding=decimal.ROUND_HALF_UP))

    a = sorted(cents(v) for v in o[o.o_orderpriority == "1-URGENT"].o_totalprice)
    b = sorted(cents(v) for v in o[o.o_orderpriority == "5-LOW"].o_totalprice)
    assert row.na == len(a) and row.nb == len(b)
    grid = sorted(set(a) | set(b))
    import bisect

    d = max(
        abs(bisect.bisect_right(a, x) / len(a)
            - bisect.bisect_right(b, x) / len(b))
        for x in grid
    )
    assert math.isclose(row.ks_d, d, abs_tol=1e-6)
    assert 0 <= row.ks_d <= 1
    assert row.reject_95 == (row.ks_d > row.crit_95)


def test_spearman_matches_python_avg_ranks(spark):
    row = registry.QUERIES["q_agg_spearman"](spark, SF_DIR).collect()[0]
    import collections
    import decimal

    import pandas as pd

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    n_items = li.groupby("l_orderkey").size()
    pairs = []
    for r in o.itertuples():
        if r.o_orderkey in n_items.index:
            cents = int(decimal.Decimal(r.o_totalprice * 100).quantize(
                decimal.Decimal(1), rounding=decimal.ROUND_HALF_UP))
            pairs.append((cents, int(n_items[r.o_orderkey])))

    def avg_ranks(vals):
        c = collections.Counter(vals)
        out, cum = {}, 0
        for v in sorted(c):
            out[v] = cum + (c[v] + 1) / 2
            cum += c[v]
        return out

    rx = avg_ranks([x for x, _ in pairs])
    ry = avg_ranks([y for _, y in pairs])
    xs = [rx[x] for x, _ in pairs]
    ys = [ry[y] for _, y in pairs]
    n = len(pairs)
    mx, my = sum(xs) / n, sum(ys) / n
    num = sum((a - mx) * (b - my) for a, b in zip(xs, ys))
    den = math.sqrt(sum((a - mx) ** 2 for a in xs)
                    * sum((b - my) ** 2 for b in ys))
    assert row.n == n
    assert math.isclose(row.spearman_rho, num / den, abs_tol=1e-5)
    assert -1 <= row.spearman_rho <= 1


def test_chi2_matches_python(spark):
    row = registry.QUERIES["q_agg_chi2_independence"](
        spark, SF_DIR
    ).collect()[0]
    import collections

    import pandas as pd

    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    cells = collections.Counter(
        zip(cust.c_mktsegment, cust.c_nationkey)
    )
    rows = collections.Counter()
    cols = collections.Counter()
    for (s, c), v in cells.items():
        rows[s] += v
        cols[c] += v
    n = sum(cells.values())
    chi2 = sum(
        (v - rows[s] * cols[c] / n) ** 2 / (rows[s] * cols[c] / n)
        for (s, c), v in cells.items()
    )
    assert row.n == n and row.n_cells == len(cells)
    assert math.isclose(row.chi2, chi2, abs_tol=1e-4)
    v = math.sqrt(chi2 / (n * (min(len(rows), len(cols)) - 1)))
    assert math.isclose(row.cramers_v, v, abs_tol=1e-5)
    assert 0 <= row.cramers_v <= 1


def test_mann_whitney_matches_python(spark):
    row = registry.QUERIES["q_agg_mann_whitney_u"](spark, SF_DIR).collect()[0]
    import collections
    import decimal

    import pandas as pd

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")

    def cents(v):
        return int(decimal.Decimal(v * 100).quantize(
            decimal.Decimal(1), rounding=decimal.ROUND_HALF_UP))

    a = [cents(v) for v in o[o.o_orderpriority == "1-URGENT"].o_totalprice]
    b = [cents(v) for v in o[o.o_orderpriority == "5-LOW"].o_totalprice]
    comb = collections.Counter(a + b)
    ranks, cum = {}, 0
    for v in sorted(comb):
        ranks[v] = cum + (comb[v] + 1) / 2
        cum += comb[v]
    ra = sum(ranks[v] for v in a)
    na, nb = len(a), len(b)
    u_a = ra - na * (na + 1) / 2
    ties = sum(f ** 3 - f for f in comb.values())
    n = na + nb
    var = na * nb / 12 * ((n + 1) - ties / (n * (n - 1)))
    z = (u_a - na * nb / 2) / math.sqrt(var)
    assert row.na == na and row.nb == nb
    assert math.isclose(row.u_a, u_a, abs_tol=1e-6)
    assert math.isclose(row.z, z, abs_tol=1e-5)
