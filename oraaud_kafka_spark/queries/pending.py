"""Forward registration queues: operators built and locally
parity-tested ahead of time but deliberately NOT registered yet.

The driver-window throttle (round-9 rule, re-affirmed by every verdict
since) admits ~3 new registered operators per round so the
never-driver-checked backlog stays at zero; round 11 shipped interval
latency / KLL rollup / MinHash banding eval, round 12 promoted the R12
trio (theta overlap, dynamic-gap sessions, conversion rate) into
queries/aggregates.py and queries/event_time.py. PENDING_R13 is the
round-13 batch and PENDING_R14 the round-14 batch — each fully
implemented with DuckDB oracles and swept by tests/test_pending_r13.py
/ test_pending_r14.py at sf0.001 AND the driver's sf0.01, so
registration in its round is a @query decorator + _FRONT placement,
nothing else.

Keeping them out of the registry (this module is NOT in
registry._MODULES) means: no COVERAGE.md count drift, no "never" ledger
rows, no bench extras churn — but the code, oracle, and parity evidence
all exist and age with the codebase instead of landing cold next round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load

# ---------------------------------------------------------------------------
# SRP banding-recall calibration for cosine RANGE SEARCH (round-13
# queue): the threshold-retrieval complement of the top-k evals. On the
# deterministic vec_id % 2 slice, bucket EVERY vector pair by its exact
# cosine tier and report, per tier, how many pairs the B x r
# signed-random-projection banding would catch — overall and per band.
# This is the empirical S-curve P(caught | cosine tier) that sizes
# (B, r) for a production "all pairs with cosine >= tau" sweep, exactly
# as q_dedup_minhash_multiband_eval sizes the Jaccard banding: tier 0
# (cosine < 0) measures the false-positive floor, the top tier the
# recall on genuinely close pairs; the analytic curve per bit is
# P(sign agree) = 1 - theta/pi (Charikar, STOC'02). Anchors are the
# lowest B*r vec_ids (asserted ALL directional at both SFs by
# test_pending_r13, so a zero-norm id can never silently shrink the
# bits string and flatten the curve) — data-derived, so both engines
# reconstruct the identical hyperplanes with no RNG. The exhaustive
# pair join is the CALIBRATION harness, deliberately slice-bounded and
# width-bounded through triangle_self_join; a production range search
# runs only the banded equality join this query measures. Sign bits and
# cosine tiers compare sequential-fold doubles that are bit-identical
# across engines (see llm/similarity docstring), so every count is
# deterministic and integer-exact.
# ---------------------------------------------------------------------------

_RS_MOD = 2  # calibration slice = every 2nd vector
# (B=6, r=4) measured monotone on the fixture at both SFs
# (tier0 FP floor ~0.25 -> tier3 recall ~0.76); r=6 was too strict
# (tier-3 recall collapsed to 0), r=3 too loose (FP floor ~0.5)
_RS_BANDS = 6
_RS_BITS = 4  # sign bits per band -> B*r = 24 anchor vectors
_RS_N_ANCHORS = _RS_BANDS * _RS_BITS
# tier edges chosen for the fixture's cosine range (max ~0.51): the
# production tau for this corpus would sit in tier 3 (>= 0.4)
_RS_TIER_SQL = (
    "CASE WHEN {c} >= 0.4 THEN 3 WHEN {c} >= 0.2 THEN 2 "
    "WHEN {c} >= 0.0 THEN 1 ELSE 0 END"
)


def _rs_oracle() -> str:
    from ..llm.similarity import (
        _sql_directional_cte,
        _sql_dot,
        _sql_norm,
    )

    band_cols = ", ".join(
        f"substring(bits, {1 + b * _RS_BITS}, {_RS_BITS}) AS band{b}"
        for b in range(_RS_BANDS)
    )
    band_eq = ", ".join(
        f"CAST(a.band{b} = b.band{b} AS INT) AS c{b}"
        for b in range(_RS_BANDS)
    )
    caught = "greatest(" + ", ".join(
        f"c{b}" for b in range(_RS_BANDS)
    ) + ")"
    return f"""
WITH {_sql_directional_cte()},
anch AS (SELECT vec_id AS aid, embedding AS av FROM embeddings
         WHERE vec_id < {_RS_N_ANCHORS}),
sliced AS (SELECT vec_id, embedding FROM embeddings
           WHERE vec_id % {_RS_MOD} = 0),
bucketed AS (
  SELECT e.vec_id, e.embedding,
         string_agg(CASE WHEN {_sql_dot('e.embedding', 'a.av')} >= 0
                    THEN '1' ELSE '0' END, '' ORDER BY a.aid) AS bits
  FROM sliced e, anch a
  GROUP BY e.vec_id, e.embedding
),
banded AS (
  SELECT vec_id, embedding, {_sql_norm('embedding')} AS nrm, {band_cols}
  FROM bucketed
),
pairs AS (
  SELECT {_RS_TIER_SQL.format(c='cosine')} AS cos_tier,
         {", ".join(f"c{b}" for b in range(_RS_BANDS))}
  FROM (
    SELECT {_sql_dot('a.embedding', 'b.embedding')} / (a.nrm * b.nrm)
             AS cosine,
           {band_eq}
    FROM banded a JOIN banded b ON a.vec_id < b.vec_id
  )
)
SELECT cos_tier,
       count(*) AS n_pairs,
       CAST(sum({caught}) AS BIGINT) AS n_caught,
       CAST(sum({caught}) AS DOUBLE) / count(*) AS catch_rate,
       {", ".join(f"CAST(sum(c{b}) AS BIGINT) AS n_caught_b{b}" for b in range(_RS_BANDS))}
FROM pairs
GROUP BY cos_tier
ORDER BY cos_tier
"""


RANGE_SEARCH_EVAL_ORACLE = _rs_oracle()


def q_sim_range_search_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.similarity import _directional, _dot, _norm
    from ..operators.triangle import triangle_self_join
    from ..tables import spread

    e = _directional(load(spark, sf_dir, "embeddings"))
    anchors = e.filter(F.col("vec_id") < _RS_N_ANCHORS).select(
        F.col("vec_id").alias("aid"), F.col("embedding").alias("av")
    )
    sliced = e.filter(F.col("vec_id") % _RS_MOD == 0).select(
        "vec_id", "embedding"
    )
    # sign bits against the broadcast anchors, assembled in aid order
    # (the q_sim_lsh_bucketed_topk bucket construction, widened to B*r)
    bucketed = (
        F.broadcast(anchors)
        .crossJoin(spread(sliced))
        .withColumn(
            "bit",
            F.struct(
                F.col("aid"),
                F.when(_dot(F.col("embedding"), F.col("av")) >= 0, "1")
                .otherwise("0")
                .alias("bit"),
            ),
        )
        .groupBy("vec_id", "embedding")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("bit")), lambda x: x.bit
                ),
                "",
            ).alias("bits")
        )
    )
    banded = bucketed.select(
        "vec_id",
        "embedding",
        _norm(F.col("embedding")).alias("nrm"),
        *[
            F.substring("bits", 1 + b * _RS_BITS, _RS_BITS).alias(f"band{b}")
            for b in range(_RS_BANDS)
        ],
    )
    pairs = triangle_self_join(
        banded, block_cols=[], id_col="vec_id", n_sub=4
    )
    cosine = _dot(F.col("embedding_a"), F.col("embedding_b")) / (
        F.col("nrm_a") * F.col("nrm_b")
    )
    scored = pairs.select(
        cosine.alias("cosine"),
        *[
            (F.col(f"band{b}_a") == F.col(f"band{b}_b"))
            .cast("int")
            .alias(f"c{b}")
            for b in range(_RS_BANDS)
        ],
    ).select(
        F.expr(_RS_TIER_SQL.format(c="cosine")).alias("cos_tier"),
        *[f"c{b}" for b in range(_RS_BANDS)],
    )
    return (
        scored.groupBy("cos_tier")
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum(
                F.greatest(*[F.col(f"c{b}") for b in range(_RS_BANDS)])
            ).alias("n_caught"),
            *[
                F.sum(f"c{b}").alias(f"n_caught_b{b}")
                for b in range(_RS_BANDS)
            ],
        )
        .select(
            "cos_tier",
            "n_pairs",
            "n_caught",
            (F.col("n_caught").cast("double") / F.col("n_pairs")).alias(
                "catch_rate"
            ),
            *[f"n_caught_b{b}" for b in range(_RS_BANDS)],
        )
        .orderBy("cos_tier")
    )


# ---------------------------------------------------------------------------
# Additive Holt-Winters (triple exponential smoothing; Hyndman &
# Athanasopoulos ch. 8.3) per event type over the HOURLY revenue series
# — the seasonal rung above q_time_holt_trend on the forecasting ladder
# (naive -> seasonal-naive -> EWMA -> Holt -> Holt-Winters), for the
# series q_time_seasonality_strength already showed carries an
# hour-of-day signal. Level + trend + a 24-slot hour-of-day seasonal
# vector fold together, zero-seeded like the EWMA/Holt twins; the
# one-step forecast is level + trend + season[(last_hour + 1) % 24].
# Scale shape: raw events collapse to the bounded (type x hour) grain
# in ONE map+partial-agg pass; the sequential fold then runs over
# hourly buckets only, with O(m)=O(24) state per key — never
# event-cardinality work or state. Both engines run the IDENTICAL
# fixed-shape IEEE op sequence (Spark folds a struct(l, b, s[24])
# accumulator with F.aggregate; the oracle replays the same recurrence
# with a recursive CTE carrying 24 seasonal columns), so the 6-dp round
# only swallows cross-libm noise, never reordering.
# ---------------------------------------------------------------------------

_HWS_ALPHA, _HWS_BETA, _HWS_GAMMA = 0.3, 0.1, 0.2
_HWS_M = 24  # season length: hour of day


def _hws_oracle() -> str:
    a, b, g = _HWS_ALPHA, _HWS_BETA, _HWS_GAMMA
    s_prev = (
        "(CASE e.hod "
        + " ".join(f"WHEN {k} THEN f.s{k}" for k in range(_HWS_M))
        + " END)"
    )
    new_l = f"{a} * (e.y - {s_prev}) + {1 - a} * (f.l + f.b)"
    seed_s = ", ".join(f"CAST(0 AS DOUBLE) AS s{k}" for k in range(_HWS_M))
    step_s = ", ".join(
        f"CASE WHEN e.hod = {k} THEN {g} * (e.y - (f.l + f.b)) "
        f"+ {1 - g} * f.s{k} ELSE f.s{k} END"
        for k in range(_HWS_M)
    )
    s_next = (
        "(CASE (f.hod + 1) % 24 "
        + " ".join(f"WHEN {k} THEN f.s{k}" for k in range(_HWS_M))
        + " END)"
    )
    return f"""
WITH RECURSIVE hourly AS (
  SELECT event_type,
         CAST(extract(hour FROM date_trunc('hour', ts)) AS INT) AS hod,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) AS y,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY date_trunc('hour', ts)) AS rn
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
  GROUP BY event_type, date_trunc('hour', ts)
),
fold AS (
  SELECT event_type, 0 AS rn, 0 AS hod,
         CAST(0 AS DOUBLE) AS l, CAST(0 AS DOUBLE) AS b, {seed_s}
  FROM (SELECT DISTINCT event_type FROM hourly)
  UNION ALL
  SELECT e.event_type, e.rn, e.hod,
         {new_l},
         {b} * (({new_l}) - f.l) + {1 - b} * f.b,
         {step_s}
  FROM fold f JOIN hourly e
    ON e.event_type = f.event_type AND e.rn = f.rn + 1
),
last AS (SELECT event_type AS le, max(rn) AS mx FROM fold
         GROUP BY event_type)
SELECT f.event_type, CAST(f.rn AS BIGINT) AS n_hours,
       round(f.l, 6) AS level, round(f.b, 6) AS trend,
       round({s_next}, 6) AS season_next,
       round(f.l + f.b + {s_next}, 6) AS forecast_next
FROM fold f JOIN last ON last.le = f.event_type AND f.rn = last.mx
ORDER BY f.event_type
"""


HOLT_WINTERS_ORACLE = _hws_oracle()


def q_time_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("double")
        .alias("y")
    )
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("h", "y"))),
        lambda x: F.struct(
            F.hour(x.h).cast("int").alias("hod"), x.y.alias("y")
        ),
    )
    a, b_, g = F.lit(_HWS_ALPHA), F.lit(_HWS_BETA), F.lit(_HWS_GAMMA)
    one_a = F.lit(1 - _HWS_ALPHA)
    one_b = F.lit(1 - _HWS_BETA)
    one_g = F.lit(1 - _HWS_GAMMA)

    def step(acc, x):
        s_prev = F.element_at(acc.s, x.hod + 1)
        new_l = a * (x.y - s_prev) + one_a * (acc.l + acc.b)
        new_s = g * (x.y - (acc.l + acc.b)) + one_g * s_prev
        return F.struct(
            new_l.alias("l"),
            (b_ * (new_l - acc.l) + one_b * acc.b).alias("b"),
            F.transform(
                acc.s,
                lambda v, i: F.when(i == x.hod, new_s).otherwise(v),
            ).alias("s"),
            x.hod.alias("hod"),
        )

    folded = F.aggregate(
        ordered,
        F.struct(
            F.lit(0.0).alias("l"),
            F.lit(0.0).alias("b"),
            F.array_repeat(F.lit(0.0), _HWS_M).alias("s"),
            F.lit(0).cast("int").alias("hod"),
        ),
        step,
    )
    season_next = F.element_at(
        F.col("hw.s"), (F.col("hw.hod") + 1) % _HWS_M + 1
    )
    return (
        hourly.groupBy("event_type")
        .agg(F.count("*").cast("long").alias("n_hours"), folded.alias("hw"))
        .select(
            "event_type",
            "n_hours",
            F.round(F.col("hw.l"), 6).alias("level"),
            F.round(F.col("hw.b"), 6).alias("trend"),
            F.round(season_next, 6).alias("season_next"),
            F.round(
                F.col("hw.l") + F.col("hw.b") + season_next, 6
            ).alias("forecast_next"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Content-defined chunking (CDC) sub-file dedup: the shift-robust
# storage question byte-level dedup cannot answer — "how much would
# chunk-level dedup save when copies are EMBEDDED in otherwise
# different payloads?" (rsync/LBFS/FastCDC lineage; Muthitacharoen et
# al., SOSP'01). A chunk boundary falls wherever the rolling content
# window hashes below a mask (here: md5 of the trailing 16 bytes
# starting '00'..'03' -> boundary probability 1/64, ~64-byte average
# chunks), so an insertion only re-chunks its local neighborhood and
# shared runs between documents yield IDENTICAL interior chunks — the
# property the shift-robustness test pins. Scale shape: boundary
# detection and chunk hashing are MAP-ONLY JVM md5 expressions per
# row (no Python, no shuffle); only 16-byte chunk hashes + lengths
# shuffle to the chunk-hash aggregate (payload bytes never move), and
# the report is top-15 shared chunks + corpus dedup totals. The text
# column stands in for the binary payload exactly as in
# q_multimodal_dedup.
# ---------------------------------------------------------------------------

_CDC_W = 16  # rolling window bytes
_CDC_MASK = "04"  # md5 hex prefix < '04' -> P(boundary) = 4/256 = 1/64
_CDC_TOP = 15


def _cdc_bounds(text, n):
    """Boundary positions (window-END offsets) plus the [0, n] frame —
    a pure JVM expression; shared by the query and the robustness
    test."""
    inner = F.when(
        n - 1 >= _CDC_W,
        F.filter(
            F.sequence(F.lit(_CDC_W), n - 1),
            lambda i: F.md5(
                F.encode(text.substr(i - (_CDC_W - 1), F.lit(_CDC_W)), "UTF-8")
            ).substr(1, 2)
            < _CDC_MASK,
        ),
    ).otherwise(F.expr("array()").cast("array<int>"))
    return F.concat(F.array(F.lit(0)), inner, F.array(n))


def _cdc_chunks(text, bounds):
    """array<struct<h, len>> of content-defined chunks of ``text``
    given its materialized ``bounds`` column. The caller MUST
    single-eval the bounds expression behind a Generate barrier (the
    q_dedup_containment_eval explode trick) — referenced naked, the
    O(n)-md5 bounds subtree would be re-inlined by CollapseProject
    into every one of this lambda's five references and re-evaluated
    per chunk, turning the linear scan quadratic."""
    return F.transform(
        F.sequence(F.lit(0), F.size(bounds) - 2),
        lambda j: F.struct(
            F.md5(
                F.encode(
                    text.substr(
                        F.element_at(bounds, j + 1) + 1,
                        F.element_at(bounds, j + 2)
                        - F.element_at(bounds, j + 1),
                    ),
                    "UTF-8",
                )
            ).alias("h"),
            (
                F.element_at(bounds, j + 2) - F.element_at(bounds, j + 1)
            ).alias("len"),
        ),
    )


CDC_CHUNKS_ORACLE = f"""
WITH bnds AS (
  SELECT doc_id, text,
         list_concat(list_concat(
           [CAST(0 AS BIGINT)],
           CASE WHEN len(text) - 1 >= {_CDC_W}
                THEN list_filter(range({_CDC_W}, len(text)),
                     i -> substring(md5(substring(text, CAST(i AS INT) - {_CDC_W - 1}, {_CDC_W})), 1, 2)
                          < '{_CDC_MASK}')
                ELSE CAST([] AS BIGINT[]) END),
           [CAST(len(text) AS BIGINT)]) AS bounds
  FROM documents
  WHERE text IS NOT NULL AND len(text) > 0
),
chunks AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(bounds)),
           j -> {{'h': md5(substring(text, CAST(bounds[CAST(j AS INT)] + 1 AS INT),
                                     CAST(bounds[CAST(j AS INT) + 1] - bounds[CAST(j AS INT)] AS INT))),
                 'len': bounds[CAST(j AS INT) + 1] - bounds[CAST(j AS INT)]}}),
                recursive := true)
  FROM bnds
),
agg AS (
  SELECT h AS chunk_md5, min(len) AS chunk_len,
         count(*) AS n_occ, count(DISTINCT doc_id) AS n_docs
  FROM chunks GROUP BY h
),
tot AS (
  SELECT CAST(sum(n_occ) AS BIGINT) AS total_chunks,
         CAST(count(*) AS BIGINT) AS distinct_chunks,
         CAST(sum(n_occ * chunk_len) AS BIGINT) AS total_bytes,
         CAST(sum(chunk_len) AS BIGINT) AS unique_bytes
  FROM agg
)
SELECT chunk_md5, CAST(chunk_len AS BIGINT) AS chunk_len,
       CAST(n_occ AS BIGINT) AS n_occ, CAST(n_docs AS BIGINT) AS n_docs,
       CAST((n_occ - 1) * chunk_len AS BIGINT) AS saved_bytes,
       total_chunks, distinct_chunks, total_bytes, unique_bytes,
       CAST(unique_bytes AS DOUBLE) / total_bytes AS dedup_ratio
FROM agg CROSS JOIN tot
WHERE n_docs > 1
ORDER BY saved_bytes DESC, chunk_md5
LIMIT {_CDC_TOP}
"""


def q_multimodal_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    # empty/NULL payloads carry no chunkable content: _cdc_bounds on ''
    # would yield the degenerate [0, 0] frame and a zero-length chunk
    # whose ''-hash pollutes the dedup aggregate on both engines —
    # filter identically here and in the oracle's bnds CTE
    d = load(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.length("text") > 0)
    )
    # single-eval barrier: bounds (one md5 per byte position) must be
    # computed exactly once per row — see _cdc_chunks docstring
    bounded = d.select(
        "doc_id",
        "text",
        F.explode(
            F.array(_cdc_bounds(F.col("text"), F.length("text")))
        ).alias("bounds"),
    )
    chunks = bounded.select(
        "doc_id",
        F.explode(
            _cdc_chunks(F.col("text"), F.col("bounds"))
        ).alias("c"),
    ).select("doc_id", F.col("c.h").alias("h"), F.col("c.len").alias("len"))
    agg = chunks.groupBy(F.col("h").alias("chunk_md5")).agg(
        F.min("len").cast("long").alias("chunk_len"),
        F.count("*").alias("n_occ"),
        F.count_distinct("doc_id").alias("n_docs"),
    )
    tot = agg.agg(
        F.sum("n_occ").cast("long").alias("total_chunks"),
        F.count("*").cast("long").alias("distinct_chunks"),
        F.sum(F.col("n_occ") * F.col("chunk_len"))
        .cast("long")
        .alias("total_bytes"),
        F.sum("chunk_len").cast("long").alias("unique_bytes"),
    )
    return (
        agg.filter(F.col("n_docs") > 1)
        .crossJoin(F.broadcast(tot))
        .select(
            "chunk_md5",
            "chunk_len",
            F.col("n_occ").cast("long").alias("n_occ"),
            F.col("n_docs").cast("long").alias("n_docs"),
            ((F.col("n_occ") - 1) * F.col("chunk_len"))
            .cast("long")
            .alias("saved_bytes"),
            "total_chunks",
            "distinct_chunks",
            "total_bytes",
            "unique_bytes",
            (
                F.col("unique_bytes").cast("double") / F.col("total_bytes")
            ).alias("dedup_ratio"),
        )
        .orderBy(F.desc("saved_bytes"), "chunk_md5")
        .limit(_CDC_TOP)
    )


PENDING_R13 = {
    "q_sim_range_search_eval": (
        q_sim_range_search_eval,
        RANGE_SEARCH_EVAL_ORACLE,
    ),
    "q_time_holt_winters": (
        q_time_holt_winters,
        HOLT_WINTERS_ORACLE,
    ),
    "q_multimodal_cdc_chunks": (
        q_multimodal_cdc_chunks,
        CDC_CHUNKS_ORACLE,
    ),
}
