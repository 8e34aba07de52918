"""Graph operators over the order network (SURVEY.md §2.3 extension
surface; the reference has no graph machinery — its nearest primitive is
the key-partitioned shuffle, mapreduce.c:234-241, which is exactly what an
iterative rank exchange is built from).

The graph: an undirected supplier<->customer network induced by lineitem
x orders (edge weight = number of lineitems between the pair), expressed
as a directed edge list with both orientations so every node has
out-degree >= 1 (no dangling-mass special case).

Cross-engine exactness: ranks are INTEGERS (scale 1e12 of total mass),
every division is integer `div` (truncation — identical in Spark `div`
and DuckDB `//` for the all-positive values here), and damping 0.85 is
the exact rational 85/100 applied in integer arithmetic. Both engines
therefore compute bit-identical ranks at every iteration — no float
accumulation anywhere. Overflow headroom: rank <= 1e12, weights <= 1e6,
products <= 1e18 < 2^63.

Scale notes (100 TB story): each PageRank iteration is the canonical
co-partitioned join-agg pair — ranks and out-weights live on the same
hash partitioning of the node id, edges are shuffled ONCE and reused by
every iteration (the per-iteration exchanges move only (node, rank)
pairs), and the per-destination partial sums combine map-side. Fixed
iteration count keeps lineage bounded; a convergence-driven variant
would localCheckpoint per round exactly like dedup_clusters and the
multi-round Lloyd trainer already do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multithreaded_mapreduce_library_spark.registry import register
from multithreaded_mapreduce_library_spark.sources import load_table

PR_ITERS = 3
PR_SCALE = 1_000_000_000_000  # total rank mass (integer)
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100


def _duck_pagerank_oracle() -> str:
    base = f"""
WITH e0 AS (
  SELECT 's' || CAST(l.l_suppkey AS VARCHAR) AS src,
         'c' || CAST(o.o_custkey AS VARCHAR) AS dst,
         count(*) AS w
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
),
edges AS (
  SELECT src, dst, w FROM e0
  UNION ALL
  SELECT dst AS src, src AS dst, w FROM e0
),
wout AS (SELECT src, CAST(sum(w) AS BIGINT) AS wt FROM edges GROUP BY src),
nodes AS (SELECT src AS node FROM wout),
nn AS (SELECT count(*) AS n FROM nodes),
r0 AS (SELECT node, ({PR_SCALE} // (SELECT n FROM nn)) AS r FROM nodes)"""
    body = ""
    for i in range(PR_ITERS):
        body += f""",
s{i} AS (
  SELECT e.dst AS node, CAST(sum((r.r * e.w) // w2.wt) AS BIGINT) AS m
  FROM edges e
  JOIN r{i} r ON r.node = e.src
  JOIN wout w2 ON w2.src = e.src
  GROUP BY e.dst
),
r{i + 1} AS (
  SELECT n.node,
         ({PR_DAMP_DEN - PR_DAMP_NUM} * ({PR_SCALE} // (SELECT n FROM nn))) // {PR_DAMP_DEN}
         + ({PR_DAMP_NUM} * coalesce(s.m, 0)) // {PR_DAMP_DEN} AS r
  FROM nodes n LEFT JOIN s{i} s ON s.node = n.node
)"""
    return (
        base
        + body
        + f"""
SELECT node, r AS rank_scaled FROM r{PR_ITERS}
"""
    )


@register(
    "graph_pagerank",
    oracle=_duck_pagerank_oracle(),
    tags=("graph", "iterative", "pagerank"),
    doc=(
        f"{PR_ITERS}-iteration PageRank (damping 0.85) over the "
        "supplier<->customer order network in EXACT integer arithmetic: "
        "rank mass is an integer (scale 1e12), per-edge contributions "
        "are integer-divided by the source's out-weight, and the "
        "damping step is the rational 85/100 in integer form — both "
        "engines produce bit-identical ranks every iteration (the "
        "oracle unrolls the same recurrence as CTEs). Shuffle story: "
        "edges shuffle ONCE onto the src hash partitioning; each "
        "iteration exchanges only (node, rank) pairs into the "
        "co-partitioned join and partial-aggregates contributions "
        "map-side before the dst exchange — the classic scale shape "
        "for iterative graph dataflow. Fully declarative: the node "
        "count is a 1-row broadcast (no driver action, no second job "
        "rebuilding the edge frame), and no per-round join back to the "
        "node frame (every node of the bidirectional graph has an "
        "in-edge — its own reverse edge), so one job runs end-to-end "
        "with reused edge exchanges."
    ),
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # r21 (guide §2.3 "narrower types"): node ids travel as BIGINTs
    # through every edge-scale pass — suppliers even (2*suppkey),
    # customers odd (2*custkey+1), a bijection onto the old
    # 's<k>'/'c<k>' strings — and the display string is formatted ONCE
    # at the node-scale output (|nodes| rows, not |edges|). The ~1.2M
    # bidirectional edge rows at sf0.1 are grouped/joined/aggregated
    # three-plus times per run; hashing and comparing longs instead of
    # UTF8 strings cuts every one of those passes (measured at sf0.1:
    # ~7.1s -> 4.4s best-of-3 builder+noop), and at 100 TB it also halves the
    # edge exchange's key bytes. Ranks are unchanged integers — the
    # bijection makes every group identical, so the output is
    # bit-identical (oracle-proven at both SFs).
    e0 = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(
            (F.col("l_suppkey") * 2).alias("src"),
            (F.col("o_custkey") * 2 + 1).alias("dst"),
        )
        .agg(F.count("*").alias("w"))
    )
    edges = e0.unionByName(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    )
    wout = edges.groupBy("src").agg(F.sum("w").cast("long").alias("wt"))
    nodes = wout.select(F.col("src").alias("node"))
    ew = edges.join(wout, "src").select("src", "dst", "w", "wt")
    # fully declarative: the node count is a 1-row broadcast, NOT a driver
    # action — no separate job ever rebuilds the edge frame, and the
    # whole computation is one Spark job whose edge exchanges are reused
    # across iterations
    nn = nodes.agg(F.count("*").alias("n"))
    base = F.expr(f"({PR_DAMP_DEN - PR_DAMP_NUM} * ({PR_SCALE} div n)) div {PR_DAMP_DEN}")
    r = nodes.crossJoin(F.broadcast(nn)).select(
        "node", F.expr(f"{PR_SCALE} div n").alias("r")
    )
    for _ in range(PR_ITERS):
        # every node of the bidirectional graph has an in-edge (its own
        # reverse edge), so the contribution agg covers ALL nodes — no
        # per-round left join back to the node frame is needed
        contrib = (
            ew.join(r, ew["src"] == r["node"])
            .select(
                F.col("dst").alias("node"),
                F.expr("(r * w) div wt").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").cast("long").alias("m"))
        )
        r = contrib.crossJoin(F.broadcast(nn)).select(
            "node",
            (base + F.expr(f"({PR_DAMP_NUM} * m) div {PR_DAMP_DEN}")).alias("r"),
        )
    return r.select(
        F.expr(
            "CASE WHEN node % 2 = 0 THEN concat('s', CAST(node div 2 AS STRING)) "
            "ELSE concat('c', CAST((node - 1) div 2 AS STRING)) END"
        ).alias("node"),
        F.col("r").alias("rank_scaled"),
    )
