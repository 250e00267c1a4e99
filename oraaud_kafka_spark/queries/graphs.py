"""Graph analytics over the event-type transition graph.

The graph is derived once from the raw event stream — consecutive
events per user (ordered by the (ts, event_id) total order, NULL-ts
rows excluded as everywhere in the event kit) become weighted directed
edges between event types. That derivation is the only part that
touches row-cardinality data: one window pass + one aggregate shuffle.
Everything downstream (degree profile, PageRank power iteration) runs
on the aggregated type graph, whose size is bounded by |event_types|²
— a dimension-table-sized frame at any corpus scale, so the iterative
loop is broadcast-joined and costs nothing against 100 TB of events.

PageRank determinism contract (both engines, identical expressions):
edge shares are single IEEE divisions of exact integers; per-iteration
contributions are rounded to 12 dp and summed as DECIMAL(20,12) (exact,
order-independent); each new rank is one fixed-shape double expression
rounded to 9 dp. Dangling vertices (no out-edges) keep receiving the
teleport term but redistribute no mass — rank totals are therefore not
renormalized; the contract is the fixed-point of this explicit update,
not of any particular textbook normalization.

Reference parity: the reference (oraaud-kafka, ingest-only) has no graph
surface; this extends SURVEY.md §2.2's analytic families with the
iterative-graph archetype alongside PCA / k-means (operators/pca.py,
operators/kmeans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load

_PR_ITERS = 12

_GRAPH_CTES = """
ev AS (SELECT * FROM events WHERE ts IS NOT NULL),
seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM ev
),
edges AS (
  SELECT prev AS src, event_type AS dst, count(*) AS w
  FROM seq WHERE prev IS NOT NULL
  GROUP BY prev, event_type
)"""


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    seq = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("prev"),
    )
    return (
        seq.filter(F.col("prev").isNotNull())
        .groupBy(F.col("prev").alias("src"), F.col("event_type").alias("dst"))
        .agg(F.count("*").alias("w"))
    )


_DEGREE_ORACLE = f"""
WITH {_GRAPH_CTES},
outs AS (SELECT src AS t, CAST(sum(w) AS BIGINT) AS out_w,
                count(*) AS out_deg
         FROM edges GROUP BY src),
ins AS (SELECT dst AS t, CAST(sum(w) AS BIGINT) AS in_w,
               count(*) AS in_deg
        FROM edges GROUP BY dst),
verts AS (SELECT t FROM outs UNION SELECT t FROM ins)
SELECT v.t AS event_type,
       coalesce(out_deg, CAST(0 AS BIGINT)) AS out_deg,
       coalesce(out_w, CAST(0 AS BIGINT)) AS out_w,
       coalesce(in_deg, CAST(0 AS BIGINT)) AS in_deg,
       coalesce(in_w, CAST(0 AS BIGINT)) AS in_w,
       CASE WHEN coalesce(out_w, CAST(0 AS BIGINT)) > 0
            THEN round(CAST(coalesce(in_w, CAST(0 AS BIGINT)) AS DOUBLE)
                       / CAST(out_w AS DOUBLE), 6) END AS in_out_ratio
FROM verts v
LEFT JOIN outs USING (t) LEFT JOIN ins USING (t)
ORDER BY event_type
"""


@query("q_graph_degree_profile", oracle=_DEGREE_ORACLE)
def q_graph_degree_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted in/out degree per vertex of the type-transition graph."""
    e = _edges(spark, sf_dir)
    outs = e.groupBy(F.col("src").alias("t")).agg(
        F.sum("w").cast("bigint").alias("out_w"),
        F.count("*").alias("out_deg"),
    )
    ins = e.groupBy(F.col("dst").alias("t")).agg(
        F.sum("w").cast("bigint").alias("in_w"),
        F.count("*").alias("in_deg"),
    )
    verts = outs.select("t").union(ins.select("t")).distinct()
    zero = F.lit(0).cast("bigint")
    j = (
        verts.join(F.broadcast(outs), "t", "left")
        .join(F.broadcast(ins), "t", "left")
        .select(
            F.col("t").alias("event_type"),
            F.coalesce("out_deg", zero).alias("out_deg"),
            F.coalesce("out_w", zero).alias("out_w"),
            F.coalesce("in_deg", zero).alias("in_deg"),
            F.coalesce("in_w", zero).alias("in_w"),
        )
    )
    return j.select(
        "event_type",
        "out_deg",
        "out_w",
        "in_deg",
        "in_w",
        F.when(
            F.col("out_w") > 0,
            F.round(
                F.col("in_w").cast("double") / F.col("out_w").cast("double"), 6
            ),
        ).alias("in_out_ratio"),
    ).orderBy("event_type")


def _pr_oracle() -> str:
    head = f"""
WITH {_GRAPH_CTES},
vbase AS (SELECT src AS t FROM edges UNION SELECT dst FROM edges),
outs AS (SELECT src, sum(w) AS ow FROM edges GROUP BY src),
shares AS (
  SELECT e.src, e.dst, CAST(e.w AS DOUBLE) / CAST(o.ow AS DOUBLE) AS share
  FROM edges e JOIN outs o ON e.src = o.src
),
verts AS (
  SELECT t, (SELECT CAST(count(*) AS BIGINT) FROM vbase) AS nv FROM vbase
),
r0 AS (SELECT t, nv, round(1.0 / nv, 9) AS r FROM verts)"""
    iters = []
    for k in range(1, _PR_ITERS + 1):
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
)""")
    tail = f"""
SELECT t AS event_type, nv AS n_vertices, round(r, 6) AS pagerank
FROM r{_PR_ITERS}
ORDER BY pagerank DESC, event_type
"""
    return head + "".join(iters) + tail


_PAGERANK_ORACLE = _pr_oracle()


@query("q_events_pagerank", oracle=_PAGERANK_ORACLE)
def q_events_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (d=0.85, 12 power iterations) over the type-transition
    graph. The oracle unrolls the identical update as a 12-level CTE
    chain, so the driver hash-checks every arithmetic decision of the
    loop, not just its shape."""
    e = _edges(spark, sf_dir)
    outs = e.groupBy("src").agg(F.sum("w").alias("ow"))
    shares = e.join(F.broadcast(outs), "src").select(
        "src",
        "dst",
        (F.col("w").cast("double") / F.col("ow").cast("double")).alias(
            "share"
        ),
    )
    vbase = e.select(F.col("src").alias("t")).union(
        e.select(F.col("dst").alias("t"))
    ).distinct()
    verts = vbase.crossJoin(
        F.broadcast(vbase.agg(F.count("*").cast("bigint").alias("nv")))
    )
    ranks = verts.select(
        "t", "nv", F.round(F.lit(1.0) / F.col("nv"), 9).alias("r")
    )
    zero_dec = F.lit(0).cast("decimal(20,12)")
    for _ in range(_PR_ITERS):
        contrib = (
            shares.join(
                F.broadcast(ranks.select(F.col("t").alias("src"), "r")), "src"
            )
            .groupBy(F.col("dst").alias("t"))
            .agg(
                F.sum(
                    F.round(F.col("share") * F.col("r"), 12).cast(
                        "decimal(20,12)"
                    )
                ).alias("s")
            )
        )
        ranks = verts.join(F.broadcast(contrib), "t", "left").select(
            "t",
            "nv",
            F.round(
                F.lit(0.15) / F.col("nv")
                + F.lit(0.85)
                * F.coalesce(F.col("s"), zero_dec).cast("double"),
                9,
            ).alias("r"),
        )
    return ranks.select(
        F.col("t").alias("event_type"),
        F.col("nv").alias("n_vertices"),
        F.round("r", 6).alias("pagerank"),
    ).orderBy(F.col("pagerank").desc(), "event_type")
