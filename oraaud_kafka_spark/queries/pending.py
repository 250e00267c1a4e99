"""Forward registration queues: operators built and locally
parity-tested ahead of time but deliberately NOT registered yet.

The driver-window throttle (round-9 rule, re-affirmed by every verdict
since) admits ~3 new registered operators per round so the
never-driver-checked backlog stays at zero; round 12 promoted the R12
trio (theta overlap, dynamic-gap sessions, conversion rate), round 13
the R13 trio (Holt-Winters, range-search S-curve eval, CDC chunking),
round 14 the R14 trio (triangle count -> queries/graphs.py, CMS heavy
hitters -> queries/aggregates.py, Bloom prune eval -> queries/joins.py).
PENDING_R15 / PENDING_R16 / PENDING_R17 / PENDING_R18 / PENDING_R19 are
the round-15..19 batches — each fully implemented with DuckDB oracles
and swept by tests/test_pending_r1*.py at sf0.001 AND the driver's
sf0.01, so registration in its round is a @query decorator + _FRONT
placement, nothing else.

Keeping them out of the registry (this module is NOT in
registry._MODULES) means: no COVERAGE.md count drift, no "never" ledger
rows, no bench extras churn — but the code, oracle, and parity evidence
all exist and age with the codebase instead of landing cold next round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load
from .graphs import (
    _COPURCHASE_CTE_SQL,
    _TRI_SUPPORT,
    _copurchase_edges,
    _copurchase_degrees,
)

# ---------------------------------------------------------------------------
# BM25 top-k retrieval (round-15 queue) — the ranking rung above the
# TF-IDF kit: Robertson/Sparck-Jones BM25 with the Lucene idf form
# ln(1 + (N - df + 0.5)/(df + 0.5)), k1 = 1.2, b = 0.75 — what a RAG
# lexical-retrieval leg actually runs. Query terms are DATA-DERIVED
# (the 5 tokens ranked 10th-14th by document frequency under a
# (df DESC, tok ASC) total order — mid-frequency, so scores
# discriminate), making both engines reconstruct identical queries
# with no literals to drift. Scale shape: ONE tokenize pass feeds both
# the (doc, term) tf table (semi-joined to the 5 broadcast query
# terms BEFORE any shuffle — the posting-list prune) and the per-doc
# length table; df and avgdl are scalar aggregates; the final score is
# a fixed-shape double expression rounded to 6 dp (the
# q_sim_pandas_udf_cosine discipline, swallowing cross-libm ln noise)
# and top-3 docs per query rank by (score DESC, doc_id) — a
# WindowGroupLimit over the pruned postings, never the corpus.
# ---------------------------------------------------------------------------

_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_Q_LO = 10  # query terms = df ranks 10..14
_BM25_Q_N = 5
_BM25_TOP = 3

BM25_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, t.tok
  FROM documents,
       LATERAL (SELECT unnest(string_split(text, ' ')) AS tok) t
  WHERE t.tok != ''
),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT CAST(sum(dl) AS DOUBLE) / count(*) FROM dl) AS avgdl
),
df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
qterms AS (
  SELECT tok, df, rnk FROM (
    SELECT tok, df, row_number() OVER (ORDER BY df DESC, tok) AS rnk
    FROM df
  ) WHERE rnk >= {_BM25_Q_LO} AND rnk < {_BM25_Q_LO + _BM25_Q_N}
),
tf AS (
  SELECT t.doc_id, t.tok, count(*) AS tf
  FROM toks t JOIN qterms q ON q.tok = t.tok
  GROUP BY 1, 2
),
scored AS (
  SELECT q.tok AS query_term, f.doc_id,
         round(
           ln(1 + (s.n_docs - q.df + 0.5) / (q.df + 0.5))
           * (f.tf * ({_BM25_K1} + 1))
           / (f.tf + {_BM25_K1} * (1 - {_BM25_B}
              + {_BM25_B} * d.dl / s.avgdl)),
           6
         ) AS score
  FROM tf f
  JOIN qterms q ON q.tok = f.tok
  JOIN dl d ON d.doc_id = f.doc_id
  CROSS JOIN stats s
)
SELECT query_term, CAST(rank AS BIGINT) AS rank,
       CAST(doc_id AS BIGINT) AS doc_id, score
FROM (
  SELECT query_term, doc_id, score,
         row_number() OVER (PARTITION BY query_term
                            ORDER BY score DESC, doc_id) AS rank
  FROM scored
) WHERE rank <= {_BM25_TOP}
ORDER BY query_term, rank
"""


def q_text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..tables import spread

    d = load(spark, sf_dir, "documents")
    toks = spread(
        d.select("doc_id", F.split("text", " ").alias("ts"))
    ).select(
        "doc_id", F.explode(F.filter("ts", lambda x: x != "")).alias("tok")
    )
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    n_docs = d.agg(F.count("*").alias("n_docs"))
    avgdl = dl.agg(
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl")
    )
    df_t = toks.groupBy("tok").agg(F.count_distinct("doc_id").alias("df"))
    qterms = (
        df_t.select(
            "tok",
            "df",
            F.row_number().over(Window.orderBy(F.desc("df"), "tok")).alias(
                "rnk"
            ),
        )
        .filter(
            (F.col("rnk") >= _BM25_Q_LO)
            & (F.col("rnk") < _BM25_Q_LO + _BM25_Q_N)
        )
        .select("tok", "df")
    )
    tf = (
        # no forced broadcast: qterms is 5 rows but derives from a
        # grouped-agg the hint audit cannot prove bounded — AQE
        # broadcasts it from the measured size at runtime
        toks.join(qterms.select("tok"), "tok")
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    idf = F.log(
        1
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    norm = F.col("tf") + _BM25_K1 * (
        1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl")
    )
    scored = (
        tf.join(qterms, "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(n_docs))
        .crossJoin(F.broadcast(avgdl))
        .select(
            F.col("tok").alias("query_term"),
            "doc_id",
            F.round(
                idf * (F.col("tf") * (_BM25_K1 + 1)) / norm, 6
            ).alias("score"),
        )
    )
    return (
        scored.select(
            "query_term",
            "doc_id",
            "score",
            F.row_number()
            .over(
                Window.partitionBy("query_term").orderBy(
                    F.desc("score"), "doc_id"
                )
            )
            .cast("long")
            .alias("rank"),
        )
        .filter(F.col("rank") <= _BM25_TOP)
        .select("query_term", "rank", F.col("doc_id").cast("long").alias("doc_id"), "score")
        .orderBy("query_term", "rank")
    )


# ---------------------------------------------------------------------------
# Jaccard link prediction on the co-purchase graph (round-15 queue) —
# the recommender question the triangle structure sets up: for part
# pairs at DISTANCE 2 (a common co-purchase neighbor but no edge),
# score the missing edge by neighbor-set Jaccard |N(x)∩N(z)| /
# |N(x)∪N(z)| (Liben-Nowell & Kleinberg 2003) and emit the top-10
# predicted links. Scale shape: candidate pairs come from the wedge
# join on the SAME bounded support-floored edge set as the triangle
# count (shared _COPURCHASE_CTE_SQL / _copurchase_edges definition —
# never an all-pairs scan of the part domain), common-neighbor counts
# are the wedge groupBy, existing edges are removed with one anti
# join on the canonical pair, and the union size is the inclusion-
# exclusion dx + dz - common (degrees joined, no second neighbor
# expansion). Counts exact integers; the Jaccard is one IEEE division
# computed identically on both engines; ranking is total-ordered by
# (score DESC, x, z).
# ---------------------------------------------------------------------------

_LP_TOP = 10

LINK_PRED_ORACLE = f"""
WITH {_COPURCHASE_CTE_SQL},
nbr AS (
  SELECT u AS node, v AS nb FROM e
  UNION ALL SELECT v AS node, u AS nb FROM e
),
cand AS (
  SELECT least(a.node, b.node) AS x, greatest(a.node, b.node) AS z,
         count(*) AS common
  FROM nbr a JOIN nbr b
    ON a.nb = b.nb AND a.node < b.node
  GROUP BY 1, 2
),
new_pairs AS (
  SELECT c.x, c.z, c.common
  FROM cand c LEFT JOIN e ON e.u = c.x AND e.v = c.z
  WHERE e.u IS NULL
),
scored AS (
  SELECT p.x, p.z,
         CAST(p.common AS BIGINT) AS common,
         CAST(dx.d + dz.d - p.common AS BIGINT) AS unions,
         CAST(p.common AS DOUBLE) / (dx.d + dz.d - p.common) AS jaccard
  FROM new_pairs p
  JOIN deg dx ON dx.node = p.x
  JOIN deg dz ON dz.node = p.z
)
SELECT CAST(rank AS BIGINT) AS rank, CAST(x AS BIGINT) AS part_a,
       CAST(z AS BIGINT) AS part_b, common, unions, jaccard
FROM (
  SELECT x, z, common, unions, jaccard,
         row_number() OVER (ORDER BY jaccard DESC, x, z) AS rank
  FROM scored
) WHERE rank <= {_LP_TOP}
ORDER BY rank
"""


def q_graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _copurchase_edges(spark, sf_dir)
    deg = _copurchase_degrees(e)
    nbr = e.select(F.col("u").alias("node"), F.col("v").alias("nb")).unionAll(
        e.select(F.col("v").alias("node"), F.col("u").alias("nb"))
    )
    na = nbr.select(F.col("node").alias("xa"), "nb")
    nb_ = nbr.select(F.col("node").alias("xb"), "nb")
    cand = (
        na.join(nb_, "nb")
        .filter(F.col("xa") < F.col("xb"))
        .groupBy(
            F.least("xa", "xb").alias("x"), F.greatest("xa", "xb").alias("z")
        )
        .agg(F.count("*").alias("common"))
    )
    new_pairs = cand.join(
        e.select(F.col("u").alias("x"), F.col("v").alias("z")),
        ["x", "z"],
        "left_anti",
    )
    dx = deg.select(F.col("node").alias("x"), F.col("d").alias("dx"))
    dz = deg.select(F.col("node").alias("z"), F.col("d").alias("dz"))
    scored = (
        new_pairs.join(dx, "x")
        .join(dz, "z")
        .select(
            "x",
            "z",
            F.col("common").cast("long").alias("common"),
            (F.col("dx") + F.col("dz") - F.col("common"))
            .cast("long")
            .alias("unions"),
            (
                F.col("common").cast("double")
                / (F.col("dx") + F.col("dz") - F.col("common"))
            ).alias("jaccard"),
        )
    )
    return (
        scored.select(
            F.row_number()
            .over(Window.orderBy(F.desc("jaccard"), "x", "z"))
            .cast("long")
            .alias("rank"),
            F.col("x").cast("long").alias("part_a"),
            F.col("z").cast("long").alias("part_b"),
            "common",
            "unions",
            "jaccard",
        )
        .filter(F.col("rank") <= _LP_TOP)
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# Neyman-optimal stratified sample allocation (round-15 queue) — the
# sampling-design question the stratified/weighted samplers above
# execute but never answer: given a budget of n rows across the
# event-type strata, the variance-minimizing allocation is
# n_h ∝ N_h·σ_h (Neyman 1934), not proportional n_h ∝ N_h. One
# partial-agg'd pass collapses any event volume to exact per-stratum
# (count, Σcents, Σcents²) — integer cents in DECIMAL(38,0) so no
# scale overflows — then the σ_h, shares, and BOTH allocations
# (Neyman and proportional, for the delta the report exists to show)
# are fixed-shape double algebra over the bounded strata table.
# Integer allocations use the largest-remainder method: floors, then
# +1 to the top (frac DESC, stratum ASC) remainders — total-ordered,
# so both engines land the identical integer split and the budget is
# hit exactly (structural test).
# ---------------------------------------------------------------------------

_NEYMAN_BUDGET = 1000


def _neyman_oracle() -> str:
    return f"""
WITH m AS (
  SELECT event_type,
         count(*) AS big_n,
         sum(CAST(CAST(round(value * 100) AS BIGINT) AS DECIMAL(38,0)))
           AS s1,
         sum(CAST(CAST(round(value * 100) AS BIGINT)
                  * CAST(round(value * 100) AS BIGINT) AS DECIMAL(38,0)))
           AS s2
  FROM events WHERE value IS NOT NULL
  GROUP BY 1
),
sd AS (
  SELECT event_type, big_n,
         sqrt(CAST(s2 AS DOUBLE) / big_n
              - (CAST(s1 AS DOUBLE) / big_n) * (CAST(s1 AS DOUBLE) / big_n))
           AS sd_cents
  FROM m
),
w AS (
  SELECT event_type, big_n, sd_cents,
         big_n * sd_cents AS wn,
         CAST(big_n AS DOUBLE) AS wp
  FROM sd
),
tot AS (SELECT sum(wn) AS twn, sum(wp) AS twp FROM w),
raw AS (
  SELECT event_type, big_n, sd_cents,
         wn / twn AS neyman_share,
         {_NEYMAN_BUDGET} * wn / twn AS raw_n,
         {_NEYMAN_BUDGET} * wp / twp AS raw_p
  FROM w CROSS JOIN tot
),
alloc AS (
  SELECT event_type, big_n, sd_cents, neyman_share,
         CAST(floor(raw_n) AS BIGINT) AS base_n,
         row_number() OVER (ORDER BY raw_n - floor(raw_n) DESC, event_type)
           AS rn_n,
         CAST(floor(raw_p) AS BIGINT) AS base_p,
         row_number() OVER (ORDER BY raw_p - floor(raw_p) DESC, event_type)
           AS rn_p,
         {_NEYMAN_BUDGET} - sum(CAST(floor(raw_n) AS BIGINT)) OVER ()
           AS rem_n,
         {_NEYMAN_BUDGET} - sum(CAST(floor(raw_p) AS BIGINT)) OVER ()
           AS rem_p
  FROM raw
)
SELECT event_type, CAST(big_n AS BIGINT) AS big_n,
       round(sd_cents, 6) AS sd_cents,
       round(neyman_share, 6) AS neyman_share,
       CAST(base_n + CASE WHEN rn_n <= rem_n THEN 1 ELSE 0 END AS BIGINT)
         AS n_neyman,
       CAST(base_p + CASE WHEN rn_p <= rem_p THEN 1 ELSE 0 END AS BIGINT)
         AS n_proportional
FROM alloc
ORDER BY event_type
"""


NEYMAN_ORACLE = _neyman_oracle()


def q_sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    cents = F.round(F.col("value") * 100).cast("long")
    m = e.groupBy("event_type").agg(
        F.count("*").alias("big_n"),
        F.sum(cents.cast("decimal(38,0)")).alias("s1"),
        F.sum((cents * cents).cast("decimal(38,0)")).alias("s2"),
    )
    nd = F.col("big_n")
    s1d = F.col("s1").cast("double")
    s2d = F.col("s2").cast("double")
    sd = m.select(
        "event_type",
        "big_n",
        F.sqrt(s2d / nd - (s1d / nd) * (s1d / nd)).alias("sd_cents"),
    )
    w = sd.select(
        "event_type",
        "big_n",
        "sd_cents",
        (F.col("big_n") * F.col("sd_cents")).alias("wn"),
        F.col("big_n").cast("double").alias("wp"),
    )
    tot = w.agg(F.sum("wn").alias("twn"), F.sum("wp").alias("twp"))
    raw = w.crossJoin(F.broadcast(tot)).select(
        "event_type",
        "big_n",
        "sd_cents",
        (F.col("wn") / F.col("twn")).alias("neyman_share"),
        (_NEYMAN_BUDGET * F.col("wn") / F.col("twn")).alias("raw_n"),
        (_NEYMAN_BUDGET * F.col("wp") / F.col("twp")).alias("raw_p"),
    )
    whole = Window.partitionBy()
    alloc = raw.select(
        "event_type",
        "big_n",
        "sd_cents",
        "neyman_share",
        F.floor("raw_n").cast("long").alias("base_n"),
        F.row_number()
        .over(Window.orderBy(F.desc(F.col("raw_n") - F.floor("raw_n")), "event_type"))
        .alias("rn_n"),
        F.floor("raw_p").cast("long").alias("base_p"),
        F.row_number()
        .over(Window.orderBy(F.desc(F.col("raw_p") - F.floor("raw_p")), "event_type"))
        .alias("rn_p"),
        (_NEYMAN_BUDGET - F.sum(F.floor("raw_n").cast("long")).over(whole)).alias(
            "rem_n"
        ),
        (_NEYMAN_BUDGET - F.sum(F.floor("raw_p").cast("long")).over(whole)).alias(
            "rem_p"
        ),
    )
    return alloc.select(
        "event_type",
        F.col("big_n").cast("long").alias("big_n"),
        F.round("sd_cents", 6).alias("sd_cents"),
        F.round("neyman_share", 6).alias("neyman_share"),
        (
            F.col("base_n")
            + F.when(F.col("rn_n") <= F.col("rem_n"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_neyman"),
        (
            F.col("base_p")
            + F.when(F.col("rn_p") <= F.col("rem_p"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_proportional"),
    ).orderBy("event_type")


PENDING_R15 = {
    "q_text_bm25_topk": (q_text_bm25_topk, BM25_ORACLE),
    "q_graph_link_prediction": (q_graph_link_prediction, LINK_PRED_ORACLE),
    "q_sample_neyman_allocation": (
        q_sample_neyman_allocation,
        NEYMAN_ORACLE,
    ),
}


# ---------------------------------------------------------------------------
# Connected-component dedup clusters (round-16 queue): the missing rung
# between pairwise near-dup detection and the production keep/drop list
# — near-dup similarity is not transitive, so cluster-level curation
# (keep ONE canonical doc per component, MinHashLSH -> CC, the
# BigQuery/SlimPajama dedup shape) needs the transitive closure of the
# verified pair set. Edges are the MinHash band-collision pairs
# verified at est-Jaccard >= 0.5 (the q_dedup_incremental rule:
# >= INCR_EQ_MIN of 16 signature components equal); components come
# from hash-min label propagation WITH pointer jumping — each round
# lowers every label to the min over neighbors, then shortcuts
# lbl(v) := lbl(lbl(v)), so reach doubles per round and _CC_ROUNDS=6
# covers component diameters far beyond anything a near-dup graph
# produces (production alternative at extreme diameters:
# large-star/small-star, same O(log n) round bound). Scale shape: the
# pair space is LSH-band-bounded (never O(N²)), labels/edges carry two
# longs per row, each round is hash equi-joins + a min-combine on
# node id — no text, no signatures past edge construction. The oracle
# computes EXACT components via a recursive min-reachability closure,
# so the driver hash check certifies both the edge set and the
# propagation's convergence (an unconverged label would change a
# cluster id, size, and member list).
# ---------------------------------------------------------------------------

_CC_ROUNDS = 6


def _cc_oracle() -> str:
    from ..llm.dedup import (
        _BAND_COLS_SQL,
        _BAND_UNNEST_SQL,
        _BASE_HASH_SQL,
        _EQ_SUM_SQL,
        _SHINGLES_SQL,
        _SIG_COLS_SQL,
        INCR_EQ_MIN,
    )

    return f"""
WITH RECURSIVE shingled AS ({_SHINGLES_SQL}),
hashed AS (
  SELECT doc_id, {_BASE_HASH_SQL} AS bh
  FROM (SELECT doc_id, unnest(shingles) AS shingle FROM shingled)
),
sigs AS (SELECT doc_id, {_SIG_COLS_SQL} FROM hashed GROUP BY doc_id),
bands AS (SELECT doc_id, {_BAND_COLS_SQL} FROM sigs),
band_rows AS ({_BAND_UNNEST_SQL}),
cand AS (
  SELECT a.doc_id AS u, b.doc_id AS v
  FROM band_rows a JOIN band_rows b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
),
edges AS (
  SELECT c.u, c.v FROM cand c
  JOIN sigs sa ON sa.doc_id = c.u
  JOIN sigs sb ON sb.doc_id = c.v
  WHERE {_EQ_SUM_SQL} >= {INCR_EQ_MIN}
),
dir_edges AS (SELECT u, v FROM edges UNION ALL SELECT v AS u, u AS v FROM edges),
verts AS (SELECT DISTINCT u AS node FROM dir_edges),
reach(node, r) AS (
  SELECT node, node AS r FROM verts
  UNION
  SELECT e.v AS node, reach.r FROM reach JOIN dir_edges e ON e.u = reach.node
),
lbl AS (SELECT node, min(r) AS cluster_id FROM reach GROUP BY node)
SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) - 1 AS BIGINT) AS n_dropped,
       list(node ORDER BY node) AS doc_ids
FROM lbl GROUP BY cluster_id
ORDER BY n_docs DESC, cluster_id
"""


CLUSTER_CC_ORACLE = _cc_oracle()


def q_dedup_cluster_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.dedup import (
        INCR_EQ_MIN,
        N_HASHES,
        _sig_band_rows,
        mh_signature_table,
    )

    sigs = mh_signature_table(load(spark, sf_dir, "documents"))
    a = _sig_band_rows(sigs, "a")
    b = _sig_band_rows(sigs, "b")
    eq_sum = sum(
        F.when(F.col(f"ha{i}") == F.col(f"hb{i}"), 1).otherwise(0)
        for i in range(N_HASHES)
    )
    pairs = (
        a.join(b, ["band_idx", "band_key"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", eq_sum.alias("eq_sum"))
        .groupBy("a_id", "b_id")
        .agg(F.max("eq_sum").alias("eq_sum"))
        .filter(F.col("eq_sum") >= INCR_EQ_MIN)
    )
    # Build-time materialization (the q_events_pagerank discipline,
    # distributed instead of collected): each round references `edges`
    # once and `labels` three times, so a LAZY 6-round chain would
    # re-inline the md5-per-shingle signature lineage ~4^6 times —
    # plan construction alone explodes. localCheckpoint truncates the
    # lineage to the materialized (two-longs-per-row) tables; at scale
    # that is the standard iterate-checkpoint loop every Pregel-style
    # computation runs.
    from ..tables import note_data_computed

    note_data_computed()  # iterative build computes data: no memo
    edges = pairs.select(
        F.col("a_id").alias("u"), F.col("b_id").alias("v")
    ).unionByName(
        pairs.select(F.col("b_id").alias("u"), F.col("a_id").alias("v"))
    ).localCheckpoint(eager=True)
    labels = edges.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("lbl")
    )
    for _ in range(_CC_ROUNDS):
        # hash-min: every node's label drops to the min over itself and
        # its neighbors' labels (one equi-join + one min-combine)
        contrib = edges.join(
            labels, edges["u"] == labels["node"]
        ).select(F.col("v").alias("node"), "lbl")
        labels = (
            labels.unionByName(contrib)
            .groupBy("node")
            .agg(F.min("lbl").alias("lbl"))
        )
        # pointer jump: lbl(v) := lbl(lbl(v)) — every label is itself a
        # vertex (labels are min node ids), so the inner join is total
        hop = labels.select(
            F.col("node").alias("p_node"), F.col("lbl").alias("p_lbl")
        )
        labels = labels.join(
            hop, labels["lbl"] == hop["p_node"]
        ).select("node", F.col("p_lbl").alias("lbl")).localCheckpoint(
            eager=True
        )
    return (
        labels.groupBy(F.col("lbl").alias("cluster_id"))
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            (F.count("*") - F.lit(1)).cast("long").alias("n_dropped"),
            F.sort_array(F.collect_list("node")).alias("doc_ids"),
        )
        .orderBy(F.desc("n_docs"), "cluster_id")
    )


# ---------------------------------------------------------------------------
# Weighted PageRank on the part CO-PURCHASE graph (round-16 queue; the
# round-12 verdict's named candidate): centrality on the SAME graph the
# triangle count and link prediction read — canonical u < v edges under
# the _TRI_SUPPORT floor — but keeping the co-purchase multiplicity
# n_common as the edge weight and symmetrizing, so rank flows along
# often-bundled parts (every vertex has out-edges; no dangling term).
# Unlike q_events_pagerank's |types|²-bounded graph (driver-literal
# unrolling), the part graph grows with the catalog, so the 8 power
# iterations run DISTRIBUTED: each is one hash equi-join of the rank
# vector with the shares table plus one partial-agg'd decimal sum on
# dst — two longs + a double per shuffled row, never order/lineitem
# data (the raw table is touched once, building edges). Identical
# Exchange subtrees (shares, verts) are physically reused by Spark's
# ReuseExchange across iterations. Determinism is the events-PageRank
# contract verbatim: shares are single IEEE divisions of exact ints,
# per-iteration contributions round to 12 dp and sum as DECIMAL(20,12)
# (exact, order-free — safe under any shuffle schedule), each new rank
# is one fixed-shape double expression rounded to 9 dp; the oracle
# unrolls the identical update as an 8-level CTE chain, hash-checking
# every arithmetic decision of the loop.
# ---------------------------------------------------------------------------

_WPR_ITERS = 8


def _wpr_oracle() -> str:
    head = f"""
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
ew AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v, count(*) AS w
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= {_TRI_SUPPORT}
),
dir_edges AS (SELECT u, v, w FROM ew UNION ALL SELECT v AS u, u AS v, w FROM ew),
outs AS (SELECT u, sum(w) AS ow FROM dir_edges GROUP BY u),
shares AS (
  SELECT e.u AS src, e.v AS dst,
         CAST(e.w AS DOUBLE) / CAST(o.ow AS DOUBLE) AS share
  FROM dir_edges e JOIN outs o ON e.u = o.u
),
vbase AS (SELECT DISTINCT u AS t FROM dir_edges),
verts AS (
  SELECT t, (SELECT CAST(count(*) AS BIGINT) FROM vbase) AS nv FROM vbase
),
r0 AS (SELECT t, nv, round(1.0 / nv, 9) AS r FROM verts)"""
    iters = []
    for k in range(1, _WPR_ITERS + 1):
        iters.append(f""",
r{k} AS (
  SELECT v.t, v.nv,
         round(0.15 / v.nv
               + 0.85 * CAST(coalesce(c.s, CAST(0 AS DECIMAL(20,12)))
                             AS DOUBLE), 9) AS r
  FROM verts v LEFT JOIN (
    SELECT e.dst AS t,
           sum(CAST(round(e.share * p.r, 12) AS DECIMAL(20,12))) AS s
    FROM shares e JOIN r{k - 1} p ON e.src = p.t
    GROUP BY e.dst
  ) c ON v.t = c.t
)"""
        )
    tail = f"""
SELECT CAST(t AS BIGINT) AS part_key, nv AS n_vertices,
       round(r, 6) AS pagerank
FROM r{_WPR_ITERS}
ORDER BY round(r, 6) DESC, t
LIMIT 15
"""
    return head + "".join(iters) + tail


PAGERANK_COPURCHASE_ORACLE = _wpr_oracle()


def q_graph_pagerank_copurchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    a = op.select("l_orderkey", F.col("l_partkey").alias("u"))
    b = op.select("l_orderkey", F.col("l_partkey").alias("v"))
    ew = (
        a.join(b, "l_orderkey")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("w"))
        .filter(F.col("w") >= _TRI_SUPPORT)
    )
    dir_edges = ew.unionByName(
        ew.select(F.col("v").alias("u"), F.col("u").alias("v"), "w")
    )
    outs = dir_edges.groupBy("u").agg(F.sum("w").alias("ow"))
    shares = dir_edges.join(outs, "u").select(
        F.col("u").alias("src"),
        F.col("v").alias("dst"),
        (F.col("w").cast("double") / F.col("ow").cast("double")).alias(
            "share"
        ),
    )
    # Materialize the graph once (localCheckpoint): a lazy 8-iteration
    # chain would embed the lineitem self-join lineage at every level;
    # checkpointing truncates it to the (src, dst, share) edge table —
    # raw data is read exactly once, at build, and each iteration
    # shuffles two longs + a double per edge.
    from ..tables import note_data_computed

    note_data_computed()  # iterative build computes data: no memo
    shares = shares.localCheckpoint(eager=True)
    vbase = shares.select(F.col("src").alias("t")).distinct()
    nv_df = vbase.agg(F.count("*").cast("long").alias("nv"))
    verts = vbase.crossJoin(F.broadcast(nv_df)).localCheckpoint(eager=True)
    ranks = verts.select(
        "t", "nv", F.round(F.lit(1.0) / F.col("nv"), 9).alias("r")
    )
    zero_dec = F.lit(0).cast("decimal(20,12)")
    for _ in range(_WPR_ITERS):
        contrib = (
            shares.join(ranks.select(F.col("t").alias("src"), "r"), "src")
            .groupBy(F.col("dst").alias("t"))
            .agg(
                F.sum(
                    F.round(F.col("share") * F.col("r"), 12).cast(
                        "decimal(20,12)"
                    )
                ).alias("s")
            )
        )
        ranks = (
            verts.join(contrib, "t", "left")
            .select(
                "t",
                "nv",
                F.round(
                    F.lit(0.15) / F.col("nv")
                    + F.lit(0.85)
                    * F.coalesce(F.col("s"), zero_dec).cast("double"),
                    9,
                ).alias("r"),
            )
        )
    return (
        ranks.select(
            F.col("t").cast("long").alias("part_key"),
            F.col("nv").alias("n_vertices"),
            F.round("r", 6).alias("pagerank"),
        )
        .orderBy(F.desc("pagerank"), "part_key")
        .limit(15)
    )


# ---------------------------------------------------------------------------
# Product quantization codes + distortion report (round-16 queue): the
# memory-compression rung of the ANN ladder above int8 quantization
# (llm/corpus) and beside IVF (llm/similarity) — PQ (Jégou et al.,
# TPAMI'11) splits each 64-dim embedding into 4 sub-blocks of 16 dims
# and replaces every sub-vector with the id of its nearest codeword,
# so a vector stores in 4 bytes instead of 256 and ANN distance
# becomes a table lookup. Codebooks here are DATA-DERIVED (the
# sub-vectors of the 8 lowest vec_ids — the SRP-anchor discipline), so
# both engines reconstruct identical codebooks with no RNG and the
# assignment is SQL-replayable end-to-end (a k-means-trained codebook
# drops in unchanged; the IVF twin shows that seam). Scale shape: the
# 32-row codebook broadcasts, the block explode and L2² folds are
# MAP-ONLY fixed-shape IEEE expressions (identical fold order both
# engines — bit-equal distances, so the two-step argmin with min-code
# tie-break is deterministic), and the report aggregates to the
# bounded blocks x codewords grid with 12-dp-round + DECIMAL(20,12)
# order-free distortion sums. Unused codewords appear as zero rows via
# the grid left join, so codebook collapse is visible, not silent.
# ---------------------------------------------------------------------------

_PQ_BLOCKS = 4
_PQ_SUB = 16
_PQ_K = 8  # codewords per block = the 8 lowest vec_ids

_PQ_DIST_SQL = (
    "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
    "list_transform(list_zip({a}, {b}), "
    "z -> (CAST(z[1] AS DOUBLE) - CAST(z[2] AS DOUBLE)) "
    "* (CAST(z[1] AS DOUBLE) - CAST(z[2] AS DOUBLE)))), "
    "(acc, x) -> acc + x)"
)


def _pq_oracle() -> str:
    block_slices = " UNION ALL ".join(
        f"SELECT vec_id, {s} AS block, "
        f"embedding[{s * _PQ_SUB + 1}:{(s + 1) * _PQ_SUB}] AS bvec "
        "FROM base"
        for s in range(_PQ_BLOCKS)
    )
    dist = _PQ_DIST_SQL.format(a="vb.bvec", b="cb.cvec")
    return f"""
WITH base AS (
  SELECT vec_id, embedding FROM embeddings WHERE embedding IS NOT NULL
),
blocks AS ({block_slices}),
codebook AS (
  SELECT block, vec_id AS code, bvec AS cvec FROM blocks
  WHERE vec_id < {_PQ_K}
),
dists AS (
  SELECT vb.vec_id, vb.block, cb.code, {dist} AS dist
  FROM blocks vb JOIN codebook cb ON vb.block = cb.block
),
md AS (SELECT vec_id, block, min(dist) AS md FROM dists GROUP BY 1, 2),
best AS (
  SELECT d.vec_id, d.block, min(d.code) AS code, min(d.dist) AS dist
  FROM dists d JOIN md ON md.vec_id = d.vec_id AND md.block = d.block
  WHERE d.dist = md.md
  GROUP BY 1, 2
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_vecs FROM base),
stats AS (
  SELECT block, code, CAST(count(*) AS BIGINT) AS n_assigned,
         sum(CAST(round(dist, 12) AS DECIMAL(20,12))) AS sd
  FROM best GROUP BY 1, 2
)
SELECT g.block, g.code,
       coalesce(n_assigned, CAST(0 AS BIGINT)) AS n_assigned,
       CASE WHEN n_assigned > 0
            THEN round(CAST(sd AS DOUBLE) / n_assigned, 6) END
         AS avg_sqdist,
       round(CAST(coalesce(n_assigned, CAST(0 AS BIGINT)) AS DOUBLE)
             / t.n_vecs, 6) AS usage_share
FROM (SELECT DISTINCT block, code FROM codebook) g
LEFT JOIN stats USING (block, code)
CROSS JOIN tot t
ORDER BY g.block, g.code
"""


PQ_CODES_ORACLE = _pq_oracle()


def _pq_sqdist(a, b):
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _pq_block_rows(base: DataFrame) -> DataFrame:
    """One row per (vec_id, block, 16-dim sub-vector) — the shared PQ
    block explode (q_emb_pq_codes + the ADC retrieval eval)."""
    return base.select(
        "vec_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(s).alias("block"),
                    F.slice("embedding", s * _PQ_SUB + 1, _PQ_SUB).alias(
                        "bvec"
                    ),
                )
                for s in range(_PQ_BLOCKS)
            ])
        ).alias("sb"),
    ).select("vec_id", "sb.block", "sb.bvec")


def _pq_codebook(blocks: DataFrame) -> DataFrame:
    return blocks.filter(F.col("vec_id") < _PQ_K).select(
        "block", F.col("vec_id").alias("code"), F.col("bvec").alias("cvec")
    )


def _pq_assignments(blocks: DataFrame, codebook: DataFrame) -> DataFrame:
    """Nearest codeword per (vec_id, block) with the deterministic
    two-step argmin (bit-equal distances, min-code tie-break)."""
    from ..tables import spread

    dists = spread(blocks).join(F.broadcast(codebook), "block").select(
        "vec_id",
        "block",
        "code",
        _pq_sqdist(F.col("bvec"), F.col("cvec")).alias("dist"),
    )
    md = dists.groupBy("vec_id", "block").agg(F.min("dist").alias("md"))
    return (
        dists.join(md, ["vec_id", "block"])
        .filter(F.col("dist") == F.col("md"))
        .groupBy("vec_id", "block")
        .agg(F.min("code").alias("code"), F.min("dist").alias("dist"))
    )


def q_emb_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = load(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    blocks = _pq_block_rows(base)
    codebook = _pq_codebook(blocks)
    best = _pq_assignments(blocks, codebook)
    tot = base.agg(F.count("*").cast("long").alias("n_vecs"))
    stats = best.groupBy("block", "code").agg(
        F.count("*").cast("long").alias("n_assigned"),
        F.sum(F.round("dist", 12).cast("decimal(20,12)")).alias("sd"),
    )
    grid = codebook.select("block", "code").distinct()
    return (
        grid.join(stats, ["block", "code"], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "block",
            "code",
            F.coalesce(F.col("n_assigned"), F.lit(0).cast("long")).alias(
                "n_assigned"
            ),
            F.when(
                F.col("n_assigned") > 0,
                F.round(
                    F.col("sd").cast("double") / F.col("n_assigned"), 6
                ),
            ).alias("avg_sqdist"),
            F.round(
                F.coalesce(F.col("n_assigned"), F.lit(0).cast("long")).cast(
                    "double"
                )
                / F.col("n_vecs"),
                6,
            ).alias("usage_share"),
        )
        .orderBy("block", "code")
    )


def q_sql_cte_chain_inline(spark, sf_dir):
    """Thin single-text CTE-chain twin (queued per the r14 verdict item
    on q_sql_cte_chain): the ONE-text WITH pipeline submitted verbatim,
    covering the inlined-CTE surface the registered materialized-CTE
    idiom deliberately no longer exercises. Same text as its oracle."""
    from ..queries.pricing import _CTE_SQL
    from ..tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_CTE_SQL)


def _cte_inline_oracle() -> str:
    from ..queries.pricing import _CTE_SQL

    return _CTE_SQL


PENDING_R16 = {
    "q_sql_cte_chain_inline": (q_sql_cte_chain_inline, _cte_inline_oracle()),
    "q_dedup_cluster_cc": (q_dedup_cluster_cc, CLUSTER_CC_ORACLE),
    "q_graph_pagerank_copurchase": (
        q_graph_pagerank_copurchase,
        PAGERANK_COPURCHASE_ORACLE,
    ),
    "q_emb_pq_codes": (q_emb_pq_codes, PQ_CODES_ORACLE),
}


# ---------------------------------------------------------------------------
# Moments-sketch quantile bounds (round-17 queue): the power-sum
# mergeable-sketch rung of the quantile ladder (exact rank kit ->
# approx_percentile -> KLL rollup -> this), after Gan et al., VLDB'18:
# a "sketch" of five EXACT integer power sums (n, Σv, Σv², Σv³, Σv⁴
# over integer cents) is trivially mergeable by ADDITION — the
# q_time_rollup_merge algebra applied to higher moments. The Spark
# side computes the sums over two disjoint event_id-parity slices and
# MERGES them; the oracle computes the one-shot sums — the driver hash
# match is the mergeability certificate. From the merged sums: mean /
# std / skewness / kurtosis (fixed-shape IEEE from exact ints), plus
# distribution-free Cantelli envelopes for the median and p95 that the
# EXACT interpolated quantiles are certified to sit inside (the
# boolean is computed, not hardcoded, on both engines). Scale shape:
# any event volume collapses to 5 decimals x |types| in ONE
# partial-agg'd pass; v⁴ rides DECIMAL(19,0)x(19,0)->DECIMAL(38,0)
# products (exact — cents are <= 6 digits, so every product fits well
# inside 38 digits; 18-digit operands would keep DuckDB's product at
# 18 digits and overflow) so no bigint overflow at any volume; the final
# decimal→double casts drift <= 1 ulp between engines and every
# derived output rounds to 6 dp (the source-entropy discipline).
# ---------------------------------------------------------------------------


def _moments_oracle() -> str:
    return """
WITH cents AS (
  SELECT event_type, event_id,
         CAST(round(value * 100) AS BIGINT) AS v
  FROM events WHERE value IS NOT NULL
),
p AS (
  SELECT event_type, event_id,
         CAST(v AS DECIMAL(19,0)) AS vd,
         CAST(v * v AS DECIMAL(19,0)) AS v2d
  FROM cents
),
sums AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         sum(vd) AS s1, sum(v2d) AS s2,
         sum(v2d * vd) AS s3, sum(v2d * v2d) AS s4
  FROM p GROUP BY event_type
),
q AS (
  SELECT event_type,
         quantile_cont(v, 0.5) AS q50,
         quantile_cont(v, 0.95) AS q95
  FROM cents GROUP BY event_type
),
d AS (
  SELECT s.event_type, s.n,
         CAST(s.s1 AS DOUBLE) / s.n AS m,
         greatest(CAST(s.s2 AS DOUBLE) / s.n
                  - (CAST(s.s1 AS DOUBLE) / s.n)
                    * (CAST(s.s1 AS DOUBLE) / s.n),
                  CAST(0 AS DOUBLE)) AS var,
         CAST(s.s2 AS DOUBLE) / s.n AS m2r,
         CAST(s.s3 AS DOUBLE) / s.n AS m3r,
         CAST(s.s4 AS DOUBLE) / s.n AS m4r,
         q.q50, q.q95
  FROM sums s JOIN q ON q.event_type = s.event_type
),
e AS (
  SELECT event_type, n, m, sqrt(var) AS sd, m2r, m3r, m4r, q50, q95
  FROM d
)
SELECT event_type, n,
       round(m, 6) AS mean_cents,
       round(sd, 6) AS std_cents,
       CASE WHEN sd > 0
            THEN round((m3r - 3 * m * m2r + 2 * m * m * m)
                       / (sd * sd * sd), 6) END AS skewness,
       CASE WHEN sd > 0
            THEN round((m4r - 4 * m * m3r + 6 * m * m * m2r
                        - 3 * m * m * m * m)
                       / (sd * sd * sd * sd) - 3, 6) END AS ex_kurtosis,
       q50 AS q50_exact, q95 AS q95_exact,
       round(m - sd * sqrt(CAST(1 AS DOUBLE) / 19), 6) AS q95_lo,
       round(m + sd * sqrt(CAST(19 AS DOUBLE)), 6) AS q95_hi,
       (q95 >= round(m - sd * sqrt(CAST(1 AS DOUBLE) / 19), 6)
        AND q95 <= round(m + sd * sqrt(CAST(19 AS DOUBLE)), 6))
         AS q95_within
FROM e
ORDER BY event_type
"""


MOMENTS_ORACLE = _moments_oracle()


def q_agg_moments_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    cents = ev.select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("v"),
    )

    def partial(df: DataFrame) -> DataFrame:
        vd = F.col("v").cast("decimal(19,0)")
        v2d = (F.col("v") * F.col("v")).cast("decimal(19,0)")
        return df.groupBy("event_type").agg(
            F.count("*").cast("long").alias("n"),
            F.sum(vd).alias("s1"),
            F.sum(v2d).alias("s2"),
            F.sum(v2d * vd).alias("s3"),
            F.sum(v2d * v2d).alias("s4"),
        )

    # the mergeability certificate: two disjoint slices, merged by
    # ADDITION — hash-equal to the oracle's one-shot sums
    even = partial(cents.filter(F.pmod("event_id", F.lit(2)) == 0))
    odd = partial(cents.filter(F.pmod("event_id", F.lit(2)) == 1))
    sums = (
        even.unionByName(odd)
        .groupBy("event_type")
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("s1").alias("s1"),
            F.sum("s2").alias("s2"),
            F.sum("s3").alias("s3"),
            F.sum("s4").alias("s4"),
        )
    )
    q = cents.groupBy("event_type").agg(
        F.percentile("v", F.lit(0.5)).alias("q50"),
        F.percentile("v", F.lit(0.95)).alias("q95"),
    )
    m = F.col("s1").cast("double") / F.col("n")
    m2r = F.col("s2").cast("double") / F.col("n")
    m3r = F.col("s3").cast("double") / F.col("n")
    m4r = F.col("s4").cast("double") / F.col("n")
    var = F.greatest(m2r - m * m, F.lit(0.0))
    d = sums.join(q, "event_type").select(
        "event_type", "n", "q50", "q95",
        m.alias("m"), F.sqrt(var).alias("sd"),
        m2r.alias("m2r"), m3r.alias("m3r"), m4r.alias("m4r"),
    )
    sd = F.col("sd")
    mm = F.col("m")
    lo = F.round(mm - sd * F.sqrt(F.lit(1.0) / 19), 6)
    hi = F.round(mm + sd * F.sqrt(F.lit(19.0)), 6)
    return d.select(
        "event_type",
        "n",
        F.round(mm, 6).alias("mean_cents"),
        F.round(sd, 6).alias("std_cents"),
        F.when(
            sd > 0,
            F.round(
                (F.col("m3r") - 3 * mm * F.col("m2r") + 2 * mm * mm * mm)
                / (sd * sd * sd),
                6,
            ),
        ).alias("skewness"),
        F.when(
            sd > 0,
            F.round(
                (
                    F.col("m4r")
                    - 4 * mm * F.col("m3r")
                    + 6 * mm * mm * F.col("m2r")
                    - 3 * mm * mm * mm * mm
                )
                / (sd * sd * sd * sd)
                - 3,
                6,
            ),
        ).alias("ex_kurtosis"),
        F.col("q50").alias("q50_exact"),
        F.col("q95").alias("q95_exact"),
        lo.alias("q95_lo"),
        hi.alias("q95_hi"),
        ((F.col("q95") >= lo) & (F.col("q95") <= hi)).alias("q95_within"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Heaps'-law vocabulary growth (round-17 queue): V(n) = K·n^β over the
# doc_id-ordered corpus prefix — the vocabulary-saturation diagnostic
# that tells a data-mixture designer whether more of a source still
# buys new types (β near the 0.4-0.6 natural-text band) or only
# repeats itself (β → 0); the growth complement of the static Zipf
# fit. Checkpoints are the ten doc_id VALUE deciles (pure integer
# arithmetic off one broadcast max — no global row window ever touches
# doc rows); a token's contribution to every checkpoint is determined
# by its FIRST decile (min over docs), so the corpus is tokenized
# ONCE, per-doc-deduped in-array before the explode, and the only
# shuffles carry (token, decile) and per-decile integer sums. The
# log-log OLS fit runs over the ten checkpoint rows with the KL
# discipline (ln terms rounded to 12 dp, DECIMAL(20,12) sums,
# fixed-shape final expressions rounded to 6 dp).
# ---------------------------------------------------------------------------

_HEAPS_D = 10


def _heaps_oracle() -> str:
    return f"""
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS toks
  FROM documents WHERE text IS NOT NULL
),
mx AS (SELECT max(doc_id) + 1 AS m1 FROM base),
docs AS (
  SELECT CAST((doc_id * {_HEAPS_D}) // m1 AS INT) + 1 AS dec_id,
         len(toks) AS n_tok, toks
  FROM base CROSS JOIN mx
),
firsts AS (
  SELECT token, min(dec_id) AS first_dec
  FROM (SELECT dec_id, unnest(list_distinct(toks)) AS token FROM docs)
  GROUP BY token
),
spine AS (SELECT CAST(unnest(range(1, {_HEAPS_D} + 1)) AS INT) AS decile),
per_dec AS (
  SELECT s.decile,
         coalesce(d.n_docs, 0) AS n_docs,
         coalesce(d.n_toks, 0) AS n_toks,
         coalesce(f.n_new, 0) AS n_new
  FROM spine s
  LEFT JOIN (SELECT dec_id, count(*) AS n_docs,
                    sum(n_tok) AS n_toks
             FROM docs GROUP BY dec_id) d ON d.dec_id = s.decile
  LEFT JOIN (SELECT first_dec, count(*) AS n_new
             FROM firsts GROUP BY first_dec) f ON f.first_dec = s.decile
),
cum AS (
  SELECT decile,
         CAST(sum(n_docs) OVER w AS BIGINT) AS n_docs_cum,
         CAST(sum(n_toks) OVER w AS BIGINT) AS n_tokens_cum,
         CAST(sum(n_new) OVER w AS BIGINT) AS vocab_cum,
         CAST(n_new AS BIGINT) AS new_vocab
  FROM per_dec
  WINDOW w AS (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)
),
pts AS (
  SELECT round(ln(CAST(n_tokens_cum AS DOUBLE)), 12) AS x,
         round(ln(CAST(vocab_cum AS DOUBLE)), 12) AS y
  FROM cum WHERE n_tokens_cum > 0 AND vocab_cum > 0
),
fit AS (
  SELECT CAST(count(*) AS DOUBLE) AS np,
         CAST(sum(CAST(round(x, 12) AS DECIMAL(20,12))) AS DOUBLE) AS sx,
         CAST(sum(CAST(round(y, 12) AS DECIMAL(20,12))) AS DOUBLE) AS sy,
         CAST(sum(CAST(round(x * y, 12) AS DECIMAL(20,12))) AS DOUBLE)
           AS sxy,
         CAST(sum(CAST(round(x * x, 12) AS DECIMAL(20,12))) AS DOUBLE)
           AS sxx
  FROM pts
),
coef AS (
  SELECT round((np * sxy - sx * sy) / (np * sxx - sx * sx), 6) AS beta,
         round(exp(sy / np - (np * sxy - sx * sy) / (np * sxx - sx * sx)
                   * sx / np), 6) AS k
  FROM fit
)
SELECT c.decile, c.n_docs_cum, c.n_tokens_cum, c.vocab_cum, c.new_vocab,
       coef.beta AS heaps_beta, coef.k AS heaps_k
FROM cum c CROSS JOIN coef
ORDER BY c.decile
"""


HEAPS_ORACLE = _heaps_oracle()


def q_text_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = (
        load(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", F.split("text", " ").alias("toks"))
    )
    mx = base.agg((F.max("doc_id") + 1).alias("m1"))
    docs = base.crossJoin(F.broadcast(mx)).select(
        (
            F.floor(
                (F.col("doc_id") * _HEAPS_D).cast("long") / F.col("m1")
            ).cast("int")
            + 1
        ).alias("dec_id"),
        F.size("toks").alias("n_tok"),
        "toks",
    )
    firsts = (
        docs.select("dec_id", F.explode(F.array_distinct("toks")).alias("token"))
        .groupBy("token")
        .agg(F.min("dec_id").alias("first_dec"))
    )
    spine = spark.range(1, _HEAPS_D + 1).select(
        F.col("id").cast("int").alias("decile")
    )
    per_doc = docs.groupBy("dec_id").agg(
        F.count("*").alias("n_docs"), F.sum("n_tok").alias("n_toks")
    )
    per_first = firsts.groupBy("first_dec").agg(F.count("*").alias("n_new"))
    per_dec = (
        spine.join(per_doc, spine["decile"] == per_doc["dec_id"], "left")
        .join(per_first, spine["decile"] == per_first["first_dec"], "left")
        .select(
            "decile",
            F.coalesce("n_docs", F.lit(0)).alias("n_docs"),
            F.coalesce("n_toks", F.lit(0)).alias("n_toks"),
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
        )
    )
    w = (
        Window.orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = per_dec.select(
        "decile",
        F.sum("n_docs").over(w).cast("long").alias("n_docs_cum"),
        F.sum("n_toks").over(w).cast("long").alias("n_tokens_cum"),
        F.sum("n_new").over(w).cast("long").alias("vocab_cum"),
        F.col("n_new").cast("long").alias("new_vocab"),
    )
    pts = cum.filter(
        (F.col("n_tokens_cum") > 0) & (F.col("vocab_cum") > 0)
    ).select(
        F.round(F.log(F.col("n_tokens_cum").cast("double")), 12).alias("x"),
        F.round(F.log(F.col("vocab_cum").cast("double")), 12).alias("y"),
    )

    def dsum12(c):
        return F.sum(F.round(c, 12).cast("decimal(20,12)")).cast("double")

    fit = pts.agg(
        F.count("*").cast("double").alias("np"),
        dsum12(F.col("x")).alias("sx"),
        dsum12(F.col("y")).alias("sy"),
        dsum12(F.col("x") * F.col("y")).alias("sxy"),
        dsum12(F.col("x") * F.col("x")).alias("sxx"),
    )
    beta_raw = (
        F.col("np") * F.col("sxy") - F.col("sx") * F.col("sy")
    ) / (F.col("np") * F.col("sxx") - F.col("sx") * F.col("sx"))
    coef = fit.select(
        F.round(beta_raw, 6).alias("heaps_beta"),
        F.round(
            F.exp(
                F.col("sy") / F.col("np")
                - beta_raw * F.col("sx") / F.col("np")
            ),
            6,
        ).alias("heaps_k"),
    )
    return (
        cum.crossJoin(F.broadcast(coef))
        .select(
            "decile", "n_docs_cum", "n_tokens_cum", "vocab_cum",
            "new_vocab", "heaps_beta", "heaps_k",
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# HDBSCAN-style core-distance density profile (round-17 queue; the
# round-12 verdict's named density-dedup candidate): core_dist(v) =
# cosine distance to v's k-th nearest neighbor (k=4, Campello et al.'s
# core distance — the quantity HDBSCAN's mutual-reachability metric is
# built from). Low core distance = the vector sits in a dense clump =
# a near-dup/template cluster SemDeDup-style quantizer blocking can
# miss; the report ranks the ten densest vectors and normalizes by the
# corpus mean so the dedup operator has a data-derived density
# threshold. Ground truth is exhaustive on the deterministic vec_id
# slice and width-bounded through triangle_self_join (the
# knn_eval/range-search calibration-harness discipline); a production
# sweep computes the same k-NN distance inside LSH buckets — the
# bucketed top-k machinery this repo already ships — so the harness
# calibrates exactly what the scale path executes. Distances are the
# shared sequential-fold cosine (bit-identical both engines); the
# k-th-neighbor pick orders by (distance, neighbor id) so ties are
# deterministic; mean core distance is a 12-dp-round + DECIMAL(20,12)
# order-free sum.
# ---------------------------------------------------------------------------

_DC_MOD = 2  # density slice = every 2nd vector
_DC_K = 4  # core distance = distance to the 4th nearest neighbor
_DC_TOP = 10


def _density_oracle() -> str:
    from ..llm.similarity import _sql_directional_cte, _sql_dot

    return f"""
WITH {_sql_directional_cte()},
sliced AS (
  SELECT vec_id, embedding, nrm FROM (
    SELECT vec_id, embedding,
           sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
                (acc, x) -> acc + x)) AS nrm
    FROM embeddings
  ) WHERE vec_id % {_DC_MOD} = 0
),
pair AS (
  SELECT a.vec_id AS vid, b.vec_id AS nid,
         1 - {_sql_dot('a.embedding', 'b.embedding')} / (a.nrm * b.nrm)
           AS dist
  FROM sliced a JOIN sliced b ON a.vec_id != b.vec_id
),
core AS (
  SELECT vid, dist AS core_dist FROM (
    SELECT vid, nid, dist,
           row_number() OVER (PARTITION BY vid ORDER BY dist, nid) AS rn
    FROM pair
  ) WHERE rn = {_DC_K}
),
g AS (
  SELECT CAST(count(*) AS BIGINT) AS n_vectors,
         CAST(sum(CAST(round(core_dist, 12) AS DECIMAL(20,12)))
              AS DOUBLE) / count(*) AS mean_core
  FROM core
)
SELECT CAST(rank AS BIGINT) AS rank, vec_id,
       round(core_dist, 6) AS core_dist,
       n_vectors, round(mean_core, 6) AS mean_core_dist,
       round(core_dist / mean_core, 6) AS density_ratio
FROM (
  SELECT vid AS vec_id, core_dist,
         row_number() OVER (ORDER BY core_dist, vid) AS rank
  FROM core
) CROSS JOIN g
WHERE rank <= {_DC_TOP}
ORDER BY rank
"""


DENSITY_CORE_ORACLE = _density_oracle()


def q_dedup_density_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.similarity import _directional, _dot, _norm
    from ..operators.triangle import triangle_self_join
    from ..tables import spread

    e = _directional(load(spark, sf_dir, "embeddings")).filter(
        F.col("vec_id") % _DC_MOD == 0
    ).select("vec_id", "embedding", _norm(F.col("embedding")).alias("nrm"))
    pairs = triangle_self_join(
        spread(e), block_cols=[], id_col="vec_id", n_sub=4
    )
    dist = 1 - _dot(F.col("embedding_a"), F.col("embedding_b")) / (
        F.col("nrm_a") * F.col("nrm_b")
    )
    directed = pairs.select(
        F.col("vec_id_a").alias("vid"),
        F.col("vec_id_b").alias("nid"),
        dist.alias("dist"),
    )
    both = directed.unionByName(
        directed.select(
            F.col("nid").alias("vid"),
            F.col("vid").alias("nid"),
            "dist",
        )
    )
    wk = Window.partitionBy("vid").orderBy("dist", "nid")
    core = (
        both.withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") == _DC_K)
        .select("vid", F.col("dist").alias("core_dist"))
    )
    g = core.agg(
        F.count("*").cast("long").alias("n_vectors"),
        (
            F.sum(F.round("core_dist", 12).cast("decimal(20,12)")).cast(
                "double"
            )
            / F.count("*")
        ).alias("mean_core"),
    )
    wr = Window.orderBy("core_dist", "vid")
    return (
        core.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= _DC_TOP)
        .crossJoin(F.broadcast(g))
        .select(
            F.col("rank").cast("long").alias("rank"),
            F.col("vid").alias("vec_id"),
            F.round("core_dist", 6).alias("core_dist"),
            "n_vectors",
            F.round("mean_core", 6).alias("mean_core_dist"),
            F.round(F.col("core_dist") / F.col("mean_core"), 6).alias(
                "density_ratio"
            ),
        )
        .orderBy("rank")
    )


PENDING_R17 = {
    "q_agg_moments_rollup": (q_agg_moments_rollup, MOMENTS_ORACLE),
    "q_text_heaps_law": (q_text_heaps_law, HEAPS_ORACLE),
    "q_dedup_density_core": (q_dedup_density_core, DENSITY_CORE_ORACLE),
}


# ---------------------------------------------------------------------------
# STL-lite additive decomposition (round-18 queue): the decomposition
# rung of the forecasting ladder — where Holt-Winters FORECASTS with a
# seasonal state, this EXPLAINS the observed hourly revenue series as
# trend + hour-of-day seasonal + remainder (Cleveland's STL, reduced to
# its closed-form core: centered 25-observed-hour moving-average trend,
# by-hour-of-day means of the detrended series as the seasonal, and
# Hyndman's seasonal-strength statistic F_s = max(0, 1 - Var(R)/Var(S+R))
# saying how much of the detrended variance the seasonal term absorbs —
# the number that justifies q_time_holt_winters' 24-slot state). Scale
# shape: raw events collapse to the bounded (type x hour) grain in ONE
# map+partial-agg pass; the trend window runs over OBSERVED hour
# buckets per type (the burst-monitor discipline — never raw events,
# never calendar gaps materialized), the seasonal/variance aggregates
# run on the bounded detrended buckets with 12-dp-round +
# DECIMAL(20,12) order-free sums, and the report is the bounded
# (type x 24) grid. Trend exists only where the full ±12 window does
# (integer count check), identically on both engines.
# ---------------------------------------------------------------------------

_STL_HALF = 12  # centered moving-average half-width (25 observed hours)


def _stl_oracle() -> str:
    w = (
        "OVER (PARTITION BY event_type ORDER BY h "
        f"ROWS BETWEEN {_STL_HALF} PRECEDING AND {_STL_HALF} FOLLOWING)"
    )
    return f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         CAST(extract(hour FROM date_trunc('hour', ts)) AS INT) AS hod,
         sum(CAST(round(value * 100) AS BIGINT)) AS cents
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2, 3
),
trended AS (
  SELECT event_type, hod, cents,
         CAST(sum(cents) {w} AS DOUBLE) / {2 * _STL_HALF + 1} AS trend,
         count(*) {w} AS n_win
  FROM hourly
),
detr AS (
  SELECT event_type, hod,
         CAST(cents AS DOUBLE) - trend AS d
  FROM trended WHERE n_win = {2 * _STL_HALF + 1}
),
seas AS (
  SELECT event_type, hod,
         CAST(count(*) AS BIGINT) AS n_obs,
         CAST(sum(CAST(round(d, 12) AS DECIMAL(20,12))) AS DOUBLE)
           / count(*) AS s
  FROM detr GROUP BY 1, 2
),
rem AS (
  SELECT d.event_type, d.d, d.d - seas.s AS r
  FROM detr d JOIN seas
    ON seas.event_type = d.event_type AND seas.hod = d.hod
),
v AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_trended,
         CAST(sum(CAST(round(d * d, 12) AS DECIMAL(30,12))) AS DOUBLE)
           / count(*)
         - (CAST(sum(CAST(round(d, 12) AS DECIMAL(20,12))) AS DOUBLE)
            / count(*))
           * (CAST(sum(CAST(round(d, 12) AS DECIMAL(20,12))) AS DOUBLE)
              / count(*)) AS var_d,
         CAST(sum(CAST(round(r * r, 12) AS DECIMAL(30,12))) AS DOUBLE)
           / count(*)
         - (CAST(sum(CAST(round(r, 12) AS DECIMAL(20,12))) AS DOUBLE)
            / count(*))
           * (CAST(sum(CAST(round(r, 12) AS DECIMAL(20,12))) AS DOUBLE)
              / count(*)) AS var_r
  FROM rem GROUP BY event_type
)
SELECT seas.event_type, seas.hod, seas.n_obs,
       round(seas.s, 6) AS seasonal_cents,
       v.n_trended,
       round(greatest(CAST(0 AS DOUBLE), 1 - v.var_r / v.var_d), 6)
         AS seasonal_strength
FROM seas JOIN v ON v.event_type = seas.event_type
ORDER BY seas.event_type, seas.hod
"""


STL_ORACLE = _stl_oracle()


def q_time_stl_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    hourly = ev.groupBy(
        "event_type",
        F.date_trunc("hour", "ts").alias("h"),
        F.hour("ts").cast("int").alias("hod"),
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(-_STL_HALF, _STL_HALF)
    )
    full = 2 * _STL_HALF + 1
    trended = hourly.select(
        "event_type",
        "hod",
        "cents",
        (F.sum("cents").over(w).cast("double") / full).alias("trend"),
        F.count("*").over(w).alias("n_win"),
    )
    detr = trended.filter(F.col("n_win") == full).select(
        "event_type",
        "hod",
        (F.col("cents").cast("double") - F.col("trend")).alias("d"),
    )

    def dsum(c, prec="decimal(20,12)"):
        return F.sum(F.round(c, 12).cast(prec)).cast("double")

    seas = detr.groupBy("event_type", "hod").agg(
        F.count("*").cast("long").alias("n_obs"),
        (dsum(F.col("d")) / F.count("*")).alias("s"),
    )
    rem = detr.join(seas.select("event_type", "hod", "s"),
                    ["event_type", "hod"]).select(
        "event_type", "d", (F.col("d") - F.col("s")).alias("r")
    )
    n = F.count("*")
    var_d = (
        dsum(F.col("d") * F.col("d"), "decimal(30,12)") / n
        - (dsum(F.col("d")) / n) * (dsum(F.col("d")) / n)
    )
    var_r = (
        dsum(F.col("r") * F.col("r"), "decimal(30,12)") / n
        - (dsum(F.col("r")) / n) * (dsum(F.col("r")) / n)
    )
    v = rem.groupBy("event_type").agg(
        n.cast("long").alias("n_trended"),
        var_d.alias("var_d"),
        var_r.alias("var_r"),
    )
    return (
        seas.join(v, "event_type")
        .select(
            "event_type",
            "hod",
            "n_obs",
            F.round("s", 6).alias("seasonal_cents"),
            "n_trended",
            F.round(
                F.greatest(
                    F.lit(0.0), 1 - F.col("var_r") / F.col("var_d")
                ),
                6,
            ).alias("seasonal_strength"),
        )
        .orderBy("event_type", "hod")
    )


# ---------------------------------------------------------------------------
# RAKE keyword extraction (round-18 queue): Rapid Automatic Keyword
# Extraction (Rose et al. 2010) — candidate phrases are the maximal
# stopword-free token runs, each word scores degree/frequency over the
# phrase co-occurrence graph (degree counts every co-member INCLUDING
# itself, i.e. adds the phrase length per occurrence), and a phrase
# scores the sum of its members' word scores. The corpus-level top-20
# is the keyword/topic surfacing report a curation pass runs next to
# TF-IDF (document-local) and PMI (pair-local) — RAKE is phrase-local
# and needs no IDF table. The stopword list is THE one
# llm/text._STOPWORDS the quality-score gate already uses. Scale shape:
# ONE doc-partitioned prefix-sum window assigns tokens to phrases (per
# doc, bounded by doc length — never a global window), word stats are
# vocab-bounded, the phrase-score join is on the word key, and the
# report is a corpus top-20 (TakeOrderedAndProject). Determinism: word
# scores are single IEEE divisions of exact integers, rounded to 12 dp
# and decimal-summed per phrase (order-free), final score rounded to
# 6 dp with the phrase text as tie-break.
# ---------------------------------------------------------------------------

_RAKE_TOP = 20


def _rake_oracle() -> str:
    from ..llm.text import _SW_SQL

    return f"""
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS toks
  FROM documents WHERE text IS NOT NULL
),
tok0 AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks) + 1),
                i -> {{'pos': i, 'tok': toks[CAST(i AS INT)]}}),
                recursive := true)
  FROM base
),
tok AS (
  SELECT doc_id, pos, tok,
         CAST(list_contains({_SW_SQL}, tok) AS INT) AS is_stop
  FROM tok0
),
grp AS (
  SELECT doc_id, pos, tok, is_stop,
         sum(is_stop) OVER (PARTITION BY doc_id ORDER BY pos) AS g
  FROM tok
),
member AS (SELECT doc_id, g, pos, tok FROM grp WHERE is_stop = 0),
phrase AS (
  SELECT doc_id, g,
         string_agg(tok, ' ' ORDER BY pos) AS phrase,
         CAST(count(*) AS BIGINT) AS plen
  FROM member GROUP BY doc_id, g
),
wstat AS (
  SELECT m.tok,
         CAST(count(*) AS BIGINT) AS freq,
         CAST(sum(p.plen) AS BIGINT) AS deg
  FROM member m JOIN phrase p ON p.doc_id = m.doc_id AND p.g = m.g
  GROUP BY m.tok
),
pscore AS (
  SELECT p.doc_id, p.g, p.phrase, p.plen,
         CAST(sum(CAST(round(CAST(w.deg AS DOUBLE) / w.freq, 12)
                       AS DECIMAL(20,12))) AS DOUBLE) AS score
  FROM member m
  JOIN phrase p ON p.doc_id = m.doc_id AND p.g = m.g
  JOIN wstat w ON w.tok = m.tok
  GROUP BY p.doc_id, p.g, p.phrase, p.plen
),
dedup AS (
  SELECT phrase, min(plen) AS n_words,
         CAST(count(*) AS BIGINT) AS n_occurrences,
         round(min(score), 6) AS score
  FROM pscore GROUP BY phrase
)
SELECT CAST(row_number() OVER (ORDER BY score DESC, phrase) AS BIGINT)
         AS rank,
       phrase, n_words, n_occurrences, score
FROM dedup
ORDER BY score DESC, phrase
LIMIT {_RAKE_TOP}
"""


RAKE_ORACLE = _rake_oracle()


def q_text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.text import _STOPWORDS

    base = (
        load(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", F.split("text", " ").alias("toks"))
    )
    stop_arr = F.array(*[F.lit(w) for w in _STOPWORDS])
    tok = base.select(
        "doc_id",
        F.posexplode("toks").alias("pos0", "tok"),
    ).select(
        "doc_id",
        (F.col("pos0") + 1).alias("pos"),
        "tok",
        F.array_contains(stop_arr, F.col("tok")).cast("int").alias(
            "is_stop"
        ),
    )
    wg = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    grp = tok.withColumn("g", F.sum("is_stop").over(wg))
    member = grp.filter(F.col("is_stop") == 0).select(
        "doc_id", "g", "pos", "tok"
    )
    phrase = member.groupBy("doc_id", "g").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda x: x.tok,
            ),
            " ",
        ).alias("phrase"),
        F.count("*").cast("long").alias("plen"),
    )
    wstat = (
        member.join(phrase.select("doc_id", "g", "plen"), ["doc_id", "g"])
        .groupBy("tok")
        .agg(
            F.count("*").cast("long").alias("freq"),
            F.sum("plen").cast("long").alias("deg"),
        )
    )
    wscore = F.round(
        F.col("deg").cast("double") / F.col("freq"), 12
    ).cast("decimal(20,12)")
    pscore = (
        member.join(phrase, ["doc_id", "g"])
        .join(wstat, "tok")
        .groupBy("doc_id", "g", "phrase", "plen")
        .agg(F.sum(wscore).cast("double").alias("score"))
    )
    dedup = pscore.groupBy("phrase").agg(
        F.min("plen").alias("n_words"),
        F.count("*").cast("long").alias("n_occurrences"),
        F.round(F.min("score"), 6).alias("score"),
    )
    wr = Window.orderBy(F.desc("score"), "phrase")
    return (
        dedup.withColumn("rank", F.row_number().over(wr).cast("long"))
        .filter(F.col("rank") <= _RAKE_TOP)
        .select("rank", "phrase", "n_words", "n_occurrences", "score")
        .orderBy(F.desc("score"), "phrase")
    )


# ---------------------------------------------------------------------------
# PQ asymmetric-distance retrieval eval (round-18 queue): the capstone
# of the PQ rung — does ranking by ADC (query-to-codeword lookup sums,
# Jégou et al. TPAMI'11 §IV) actually retrieve what exact L2² retrieval
# would? For each of the 10 held-out queries, every corpus vector's
# approximate distance is Σ_blocks lut[q, block, code(x, block)] — a
# 10 x blocks x codewords lookup table (320 rows, broadcast) joined to
# the corpus CODES (4 small ints per vector; the payload embeddings are
# never touched after code assignment — the memory-compression claim
# made operational) — and the report certifies recall@10 of the ADC
# top-10 against the exact top-10 plus the top-1 match. Codebooks are
# the R16 data-derived ones (vec_id < 8, disjoint from the evaluated
# corpus vec_id >= 10), so both engines replay byte-identically: block
# distances are the shared fixed-shape L2² folds, ADC sums are
# 12-dp-round + DECIMAL(20,12) (order-free), ranks tie-break on the
# corpus id. Scale shape: code assignment and exact ground truth are
# ONE broadcast-join map stage each; the ADC scoring path shuffles only
# (qid, cid, decimal) rows; per-query top-10s ride bounded rank
# windows. At 100 TB the exact leg is the calibration harness — the
# production path is the code table + lut join being measured.
# ---------------------------------------------------------------------------

_ADC_K = 10  # recall@k


def _adc_oracle() -> str:
    from ..llm.similarity import N_QUERIES

    block_slices = " UNION ALL ".join(
        f"SELECT vec_id, {s} AS block, "
        f"embedding[{s * _PQ_SUB + 1}:{(s + 1) * _PQ_SUB}] AS bvec "
        "FROM base"
        for s in range(_PQ_BLOCKS)
    )
    bdist = _PQ_DIST_SQL.format(a="vb.bvec", b="cb.cvec")
    ldist = _PQ_DIST_SQL.format(a="qb.bvec", b="cb.cvec")
    edist = _PQ_DIST_SQL.format(a="q.embedding", b="c.embedding")
    return f"""
WITH base AS (
  SELECT vec_id, embedding FROM embeddings WHERE embedding IS NOT NULL
),
blocks AS ({block_slices}),
codebook AS (
  SELECT block, vec_id AS code, bvec AS cvec FROM blocks
  WHERE vec_id < {_PQ_K}
),
cdists AS (
  SELECT vb.vec_id, vb.block, cb.code, {bdist} AS dist
  FROM blocks vb JOIN codebook cb ON vb.block = cb.block
  WHERE vb.vec_id >= {N_QUERIES}
),
md AS (SELECT vec_id, block, min(dist) AS md FROM cdists GROUP BY 1, 2),
codes AS (
  SELECT d.vec_id, d.block, min(d.code) AS code
  FROM cdists d JOIN md ON md.vec_id = d.vec_id AND md.block = d.block
  WHERE d.dist = md.md
  GROUP BY 1, 2
),
lut AS (
  SELECT qb.vec_id AS qid, qb.block, cb.code, {ldist} AS d
  FROM blocks qb JOIN codebook cb ON qb.block = cb.block
  WHERE qb.vec_id < {N_QUERIES}
),
approx AS (
  SELECT l.qid, c.vec_id AS cid,
         CAST(sum(CAST(round(l.d, 12) AS DECIMAL(20,12))) AS DOUBLE)
           AS adist
  FROM codes c JOIN lut l ON l.block = c.block AND l.code = c.code
  GROUP BY l.qid, c.vec_id
),
adc_top AS (
  SELECT qid, cid, rn FROM (
    SELECT qid, cid,
           row_number() OVER (PARTITION BY qid ORDER BY adist, cid) AS rn
    FROM approx
  ) WHERE rn <= {_ADC_K}
),
exact AS (
  SELECT q.vec_id AS qid, c.vec_id AS cid, {edist} AS edist
  FROM base q JOIN base c ON c.vec_id >= {N_QUERIES}
  WHERE q.vec_id < {N_QUERIES}
),
exact_top AS (
  SELECT qid, cid, rn FROM (
    SELECT qid, cid,
           row_number() OVER (PARTITION BY qid ORDER BY edist, cid) AS rn
    FROM exact
  ) WHERE rn <= {_ADC_K}
),
nc AS (SELECT CAST(count(*) AS BIGINT) AS n_corpus FROM base
       WHERE vec_id >= {N_QUERIES}),
hits AS (
  SELECT a.qid, CAST(count(*) AS BIGINT) AS n_hits
  FROM adc_top a JOIN exact_top e ON e.qid = a.qid AND e.cid = a.cid
  GROUP BY a.qid
)
SELECT q.qid, nc.n_corpus,
       CAST(coalesce(h.n_hits, 0) AS DOUBLE) / {_ADC_K} AS recall_at_10,
       a1.cid AS adc_top1, e1.cid AS exact_top1,
       a1.cid = e1.cid AS top1_match
FROM (SELECT DISTINCT qid FROM exact_top) q
LEFT JOIN hits h ON h.qid = q.qid
JOIN (SELECT qid, cid FROM adc_top WHERE rn = 1) a1 ON a1.qid = q.qid
JOIN (SELECT qid, cid FROM exact_top WHERE rn = 1) e1 ON e1.qid = q.qid
CROSS JOIN nc
ORDER BY q.qid
"""


PQ_ADC_ORACLE = _adc_oracle()


def q_sim_pq_adc_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.similarity import N_QUERIES
    from ..tables import spread

    base = load(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    blocks = _pq_block_rows(base)
    codebook = _pq_codebook(blocks)
    codes = _pq_assignments(
        blocks.filter(F.col("vec_id") >= N_QUERIES), codebook
    ).select("vec_id", "block", "code")
    lut = (
        blocks.filter(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("qid"), "block", "bvec")
        .join(F.broadcast(codebook), "block")
        .select(
            "qid",
            "block",
            "code",
            _pq_sqdist(F.col("bvec"), F.col("cvec")).alias("d"),
        )
    )
    approx = (
        codes.join(F.broadcast(lut), ["block", "code"])
        .groupBy("qid", F.col("vec_id").alias("cid"))
        .agg(
            F.sum(F.round("d", 12).cast("decimal(20,12)"))
            .cast("double")
            .alias("adist")
        )
    )
    wa = Window.partitionBy("qid").orderBy("adist", "cid")
    adc_top = approx.withColumn("rn", F.row_number().over(wa)).filter(
        F.col("rn") <= _ADC_K
    )
    q = base.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    corpus = base.filter(F.col("vec_id") >= N_QUERIES)
    exact = F.broadcast(q).crossJoin(spread(corpus)).select(
        "qid",
        F.col("vec_id").alias("cid"),
        _pq_sqdist(F.col("qv"), F.col("embedding")).alias("edist"),
    )
    we = Window.partitionBy("qid").orderBy("edist", "cid")
    exact_top = exact.withColumn("rn", F.row_number().over(we)).filter(
        F.col("rn") <= _ADC_K
    )
    nc = corpus.agg(F.count("*").cast("long").alias("n_corpus"))
    hits = (
        adc_top.select("qid", "cid")
        .join(exact_top.select("qid", "cid"), ["qid", "cid"])
        .groupBy("qid")
        .agg(F.count("*").cast("long").alias("n_hits"))
    )
    a1 = adc_top.filter(F.col("rn") == 1).select(
        "qid", F.col("cid").alias("adc_top1")
    )
    e1 = exact_top.filter(F.col("rn") == 1).select(
        "qid", F.col("cid").alias("exact_top1")
    )
    return (
        exact_top.select("qid")
        .distinct()
        .join(hits, "qid", "left")
        .join(a1, "qid")
        .join(e1, "qid")
        .crossJoin(F.broadcast(nc))
        .select(
            "qid",
            "n_corpus",
            (
                F.coalesce(F.col("n_hits"), F.lit(0)).cast("double")
                / _ADC_K
            ).alias("recall_at_10"),
            "adc_top1",
            "exact_top1",
            (F.col("adc_top1") == F.col("exact_top1")).alias("top1_match"),
        )
        .orderBy("qid")
    )


PENDING_R18 = {
    "q_time_stl_decompose": (q_time_stl_decompose, STL_ORACLE),
    "q_text_rake_keywords": (q_text_rake_keywords, RAKE_ORACLE),
    "q_sim_pq_adc_eval": (q_sim_pq_adc_eval, PQ_ADC_ORACLE),
}


# ---------------------------------------------------------------------------
# Poisson PPS sampling with Horvitz-Thompson certification (round-19
# queue): probability-proportional-to-size inclusion — the companion of
# PENDING_R15's Neyman allocation on the sampling ladder (uniform
# reservoir -> weighted reservoir -> stratified Neyman -> πps). Every
# order enters the sample independently with p_i = min(1, n·size_i/T)
# (size = exact cents of o_totalprice), decided by the corpus-wide
# md5-fraction coin this repo's deterministic samplers share, so both
# engines draw the IDENTICAL sample with no RNG; the report certifies
# the Horvitz-Thompson estimator Σ size_i/p_i against the exact
# per-priority totals. Scale shape: MAP-ONLY after one broadcast global
# total — no sort, no prefix scan (the systematic-PPS cumulative walk
# is deliberately traded for the Poisson form precisely because the
# latter needs no order-cardinality prefix state at 100 TB); HT terms
# are 12-dp-rounded into DECIMAL(24,12) order-free sums.
# ---------------------------------------------------------------------------

_PPS_N = 200  # target expected sample size
_PPS_SCALE = float(1 << 24)


def _pps_oracle() -> str:
    return f"""
WITH o AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(round(o_totalprice * 100) AS BIGINT) AS size
  FROM orders WHERE o_totalprice IS NOT NULL
),
t AS (SELECT nullif(CAST(sum(size) AS BIGINT), 0) AS total FROM o),
probed AS (
  SELECT o.o_orderpriority, o.size,
         least(CAST(1 AS DOUBLE),
               {_PPS_N} * CAST(o.size AS DOUBLE) / t.total) AS p,
         CAST('0x' || substring(md5('pps:' || CAST(o.o_orderkey AS VARCHAR)),
                                1, 6) AS BIGINT) / {_PPS_SCALE} AS coin
  FROM o CROSS JOIN t
),
sampled AS (SELECT * FROM probed WHERE coin < p)
SELECT p.o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_pop,
       CAST(sum(p.size) AS BIGINT) AS true_total_cents,
       CAST((SELECT count(*) FROM sampled s
             WHERE s.o_orderpriority = p.o_orderpriority) AS BIGINT)
         AS n_sampled,
       round(CAST((SELECT coalesce(sum(CAST(round(
                     CAST(s.size AS DOUBLE) / s.p, 12)
                     AS DECIMAL(24,12))), 0) FROM sampled s
                   WHERE s.o_orderpriority = p.o_orderpriority)
                  AS DOUBLE), 2) AS ht_total_cents,
       round((CAST((SELECT coalesce(sum(CAST(round(
                      CAST(s.size AS DOUBLE) / s.p, 12)
                      AS DECIMAL(24,12))), 0) FROM sampled s
                    WHERE s.o_orderpriority = p.o_orderpriority)
                   AS DOUBLE)
              - CAST(sum(p.size) AS DOUBLE))
             / nullif(CAST(sum(p.size) AS DOUBLE), 0), 6) AS rel_error
FROM probed p
GROUP BY p.o_orderpriority
ORDER BY p.o_orderpriority
"""


PPS_ORACLE = _pps_oracle()


def q_sample_pps_poisson(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_totalprice").isNotNull()
    ).select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("size"),
    )
    # NULLIF guards (round-9 NULL discipline): an adversarial corpus can
    # net the global size total — or a priority's true total — to zero;
    # both ratios must go NULL, never DIVIDE_BY_ZERO (Spark ANSI) or
    # +-inf (DuckDB), in BOTH engines identically.
    t = o.agg(
        F.nullif(F.sum("size").cast("long"), F.lit(0).cast("long")).alias(
            "total"
        )
    )
    probed = o.crossJoin(F.broadcast(t)).select(
        "o_orderpriority",
        "size",
        F.least(
            F.lit(1.0),
            _PPS_N * F.col("size").cast("double") / F.col("total"),
        ).alias("p"),
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("pps:"),
                            F.col("o_orderkey").cast("string"),
                        )
                    ),
                    1,
                    6,
                ),
                16,
                10,
            ).cast("bigint")
            / _PPS_SCALE
        ).alias("coin"),
    )
    ht_term = F.when(
        F.col("coin") < F.col("p"),
        F.round(F.col("size").cast("double") / F.col("p"), 12).cast(
            "decimal(24,12)"
        ),
    )
    return (
        probed.groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("long").alias("n_pop"),
            F.sum("size").cast("long").alias("true_total_cents"),
            F.count(F.when(F.col("coin") < F.col("p"), 1))
            .cast("long")
            .alias("n_sampled"),
            F.coalesce(F.sum(ht_term), F.lit(0).cast("decimal(24,12)"))
            .cast("double")
            .alias("ht_raw"),
        )
        .select(
            "o_orderpriority",
            "n_pop",
            "true_total_cents",
            "n_sampled",
            F.round("ht_raw", 2).alias("ht_total_cents"),
            F.round(
                (F.col("ht_raw") - F.col("true_total_cents").cast("double"))
                / F.nullif(
                    F.col("true_total_cents").cast("double"), F.lit(0.0)
                ),
                6,
            ).alias("rel_error"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Reciprocal-rank fusion retrieval (round-19 queue): RRF (Cormack et
# al., SIGIR'09) — the standard way production search fuses
# heterogeneous retrieval signals without score calibration: each
# ranking contributes 1/(60 + rank), summed per candidate. The two
# signals are the EXACT full-precision cosine and the TRUNCATED cosine
# over the first 32 of 64 dimensions — the coarse-ranker + exact-ranker
# pair every two-stage retrieval stack fuses (the fixture's embeddings
# are unit-norm, so cosine-vs-inner-product would be the SAME ranking;
# truncation genuinely reorders). The report shows each fused winner's
# per-list rank (NULL when outside that list's depth-20 shortlist).
# Scale shape: both shortlists are the bounded-broadcast query x corpus
# linear scans the top-k family already runs (production swaps in
# LSH/IVF/PQ shortlists unchanged — RRF only consumes (candidate, rank)
# pairs); everything downstream is Q x 40 rows. Determinism: ranks come
# from (metric DESC NULLS LAST, cid) windows over bit-identical folds
# (the truncated cosine goes NULL on zero-norm halves in both engines);
# RRF terms are exact rationals rounded to 12 dp and decimal-summed;
# the fused order ties break on cid.
# ---------------------------------------------------------------------------

_RRF_K = 60
_RRF_DEPTH = 20
_RRF_TOP = 5
_RRF_HALF = 32  # truncated coarse-ranker dims (of 64)


def _rrf_oracle() -> str:
    from ..llm.similarity import (
        N_QUERIES,
        _sql_directional_cte,
        _sql_dot,
        _sql_norm,
    )

    return f"""
WITH {_sql_directional_cte()},
q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
      WHERE vec_id < {N_QUERIES}),
c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings
      WHERE vec_id >= {N_QUERIES}),
scored AS (
  SELECT q.qid, c.cid,
         {_sql_dot('q.qv', 'c.cv')}
           / ({_sql_norm('q.qv')} * {_sql_norm('c.cv')}) AS cos_full,
         {_sql_dot(f'q.qv[1:{_RRF_HALF}]', f'c.cv[1:{_RRF_HALF}]')}
           / nullif({_sql_norm(f'q.qv[1:{_RRF_HALF}]')}
                    * {_sql_norm(f'c.cv[1:{_RRF_HALF}]')}, 0) AS cos_half
  FROM q CROSS JOIN c
),
rank_full AS (
  SELECT qid, cid, rn FROM (
    SELECT qid, cid,
           row_number() OVER (PARTITION BY qid
                              ORDER BY cos_full DESC NULLS LAST, cid) AS rn
    FROM scored
  ) WHERE rn <= {_RRF_DEPTH}
),
rank_half AS (
  SELECT qid, cid, rn FROM (
    SELECT qid, cid,
           row_number() OVER (PARTITION BY qid
                              ORDER BY cos_half DESC NULLS LAST, cid) AS rn
    FROM scored
  ) WHERE rn <= {_RRF_DEPTH}
),
fused AS (
  SELECT coalesce(a.qid, b.qid) AS qid,
         coalesce(a.cid, b.cid) AS cid,
         a.rn AS rank_full, b.rn AS rank_half,
         CAST(
           CAST(CASE WHEN a.rn IS NOT NULL
                THEN round(CAST(1 AS DOUBLE) / ({_RRF_K} + a.rn), 12)
                ELSE 0 END AS DECIMAL(20,12))
           + CAST(CASE WHEN b.rn IS NOT NULL
                  THEN round(CAST(1 AS DOUBLE) / ({_RRF_K} + b.rn), 12)
                  ELSE 0 END AS DECIMAL(20,12))
           AS DOUBLE) AS rrf
  FROM rank_full a FULL JOIN rank_half b
    ON a.qid = b.qid AND a.cid = b.cid
)
SELECT qid, CAST(rank AS BIGINT) AS fused_rank, cid,
       round(rrf, 6) AS rrf_score, rank_full, rank_half
FROM (
  SELECT qid, cid, rrf, rank_full, rank_half,
         row_number() OVER (PARTITION BY qid
                            ORDER BY rrf DESC, cid) AS rank
  FROM fused
)
WHERE rank <= {_RRF_TOP}
ORDER BY qid, fused_rank
"""


RRF_ORACLE = _rrf_oracle()


def q_sim_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.similarity import N_QUERIES, _directional, _dot, _norm
    from ..tables import spread

    e = _directional(load(spark, sf_dir, "embeddings"))
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    c = e.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    qh, ch = F.slice("qv", 1, _RRF_HALF), F.slice("cv", 1, _RRF_HALF)
    scored = F.broadcast(q).crossJoin(spread(c)).select(
        "qid",
        "cid",
        (
            _dot(F.col("qv"), F.col("cv"))
            / (_norm(F.col("qv")) * _norm(F.col("cv")))
        ).alias("cos_full"),
        (
            _dot(qh, ch) / F.nullif(_norm(qh) * _norm(ch), F.lit(0.0))
        ).alias("cos_half"),
    )

    def shortlist(metric: str) -> DataFrame:
        w = Window.partitionBy("qid").orderBy(
            F.desc_nulls_last(metric), "cid"
        )
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= _RRF_DEPTH)
            .select("qid", "cid", F.col("rn").alias(f"rank_{metric[4:]}"))
        )

    both = shortlist("cos_full").join(
        shortlist("cos_half"), ["qid", "cid"], "full"
    )
    term = lambda r: F.when(  # noqa: E731 - tiny local expression
        r.isNotNull(),
        F.round(F.lit(1.0) / (_RRF_K + r), 12).cast("decimal(20,12)"),
    ).otherwise(F.lit(0).cast("decimal(20,12)"))
    fused = both.select(
        "qid",
        "cid",
        "rank_full",
        "rank_half",
        (term(F.col("rank_full")) + term(F.col("rank_half")))
        .cast("double")
        .alias("rrf"),
    )
    wr = Window.partitionBy("qid").orderBy(F.desc("rrf"), "cid")
    return (
        fused.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= _RRF_TOP)
        .select(
            "qid",
            F.col("rank").cast("long").alias("fused_rank"),
            "cid",
            F.round("rrf", 6).alias("rrf_score"),
            "rank_full",
            "rank_half",
        )
        .orderBy("qid", "fused_rank")
    )


# ---------------------------------------------------------------------------
# Centroid label-noise audit (round-19 queue): the confident-learning
# question every labeled training set needs answered before training —
# which labels disagree with the geometry? Each label's centroid is the
# per-dimension mean of its vectors; a vector whose NEAREST centroid is
# a different label is flagged, and the report is the label x nearest
# confusion grid with per-label noise rates (the q_sim_knn_eval
# complement: kNN votes score retrieval quality, centroid disagreement
# scores LABEL quality). Scale shape: centroids form in ONE
# posexplode + partial-agg pass over (label, dim) — bounded by
# labels x 64 — broadcast back as rebuilt arrays, the nearest-centroid
# argmin is the deterministic two-step min over a MAP-ONLY L2² fold,
# and the report is the bounded labels² grid. Centroid means are
# 12-dp-round + DECIMAL(24,12) order-free sums; distances are the
# shared fixed-shape folds, tie-broken on label id.
# ---------------------------------------------------------------------------


def _label_noise_oracle() -> str:
    return """
WITH base AS (
  SELECT vec_id, label, embedding FROM embeddings
  WHERE embedding IS NOT NULL AND label IS NOT NULL
),
dims AS (
  SELECT label,
         unnest(list_transform(range(1, len(embedding) + 1),
                i -> {'dim': i,
                      'val': CAST(embedding[CAST(i AS INT)] AS DOUBLE)}),
                recursive := true)
  FROM base
),
cstats AS (
  SELECT label, dim,
         CAST(sum(CAST(round(val, 12) AS DECIMAL(24,12))) AS DOUBLE)
           / count(*) AS c
  FROM dims GROUP BY label, dim
),
cents AS (
  SELECT label AS clabel, list(c ORDER BY dim) AS cv
  FROM cstats GROUP BY label
),
dists AS (
  SELECT b.vec_id, b.label, c.clabel,
         list_reduce(list_prepend(CAST(0 AS DOUBLE),
           list_transform(list_zip(b.embedding, c.cv),
             z -> (CAST(z[1] AS DOUBLE) - CAST(z[2] AS DOUBLE))
                  * (CAST(z[1] AS DOUBLE) - CAST(z[2] AS DOUBLE)))),
           (acc, x) -> acc + x) AS dist
  FROM base b CROSS JOIN cents c
),
md AS (SELECT vec_id, min(dist) AS md FROM dists GROUP BY vec_id),
nearest AS (
  SELECT d.vec_id, d.label, min(d.clabel) AS nearest_label
  FROM dists d JOIN md ON md.vec_id = d.vec_id
  WHERE d.dist = md.md
  GROUP BY d.vec_id, d.label
),
tot AS (SELECT label, count(*) AS n_label FROM nearest GROUP BY label)
SELECT n.label, n.nearest_label,
       CAST(count(*) AS BIGINT) AS n,
       CAST(t.n_label AS BIGINT) AS n_label,
       round(CAST(sum(CASE WHEN n.nearest_label != n.label
                      THEN 1 ELSE 0 END) AS DOUBLE)
             / t.n_label, 6) AS cell_noise_share
FROM nearest n JOIN tot t ON t.label = n.label
GROUP BY n.label, n.nearest_label, t.n_label
ORDER BY n.label, n.nearest_label
"""


LABEL_NOISE_ORACLE = _label_noise_oracle()


def q_emb_label_noise(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..tables import spread

    base = load(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull() & F.col("label").isNotNull()
    )
    dims = base.select(
        "label", F.posexplode("embedding").alias("dim0", "val0")
    ).select(
        "label",
        (F.col("dim0") + 1).alias("dim"),
        F.col("val0").cast("double").alias("val"),
    )
    cstats = dims.groupBy("label", "dim").agg(
        (
            F.sum(F.round("val", 12).cast("decimal(24,12)")).cast("double")
            / F.count("*")
        ).alias("c")
    )
    cents = cstats.groupBy(F.col("label").alias("clabel")).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "c"))),
            lambda x: x.c,
        ).alias("cv")
    )
    dists = spread(base).crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "label",
        "clabel",
        _pq_sqdist(F.col("embedding"), F.col("cv")).alias("dist"),
    )
    md = dists.groupBy("vec_id").agg(F.min("dist").alias("md"))
    nearest = (
        dists.join(md, "vec_id")
        .filter(F.col("dist") == F.col("md"))
        .groupBy("vec_id", "label")
        .agg(F.min("clabel").alias("nearest_label"))
    )
    tot = nearest.groupBy("label").agg(F.count("*").alias("n_label"))
    return (
        nearest.join(tot, "label")
        .groupBy("label", "nearest_label", "n_label")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(
                F.when(F.col("nearest_label") != F.col("label"), 1)
                .otherwise(0)
            ).alias("n_noise"),
        )
        .select(
            "label",
            "nearest_label",
            "n",
            F.col("n_label").cast("long").alias("n_label"),
            F.round(
                F.col("n_noise").cast("double") / F.col("n_label"), 6
            ).alias("cell_noise_share"),
        )
        .orderBy("label", "nearest_label")
    )


PENDING_R19 = {
    "q_sample_pps_poisson": (q_sample_pps_poisson, PPS_ORACLE),
    "q_sim_rrf_fusion": (q_sim_rrf_fusion, RRF_ORACLE),
    "q_emb_label_noise": (q_emb_label_noise, LABEL_NOISE_ORACLE),
}


# ---------------------------------------------------------------------------
# Round-15 registration (verdict r14 item 10): promote the PENDING_R15
# trio into the registry. Registration is exactly the @query wiring —
# the operators and their parity tests (tests/test_pending_r15.py, both
# SFs) predate this round; later queues stay pending.
# ---------------------------------------------------------------------------
from ..registry import query as _query  # noqa: E402

for _name, (_fn, _oracle) in PENDING_R15.items():
    _query(_name, oracle=_oracle)(_fn)
