"""Graph query corpus: iterative algorithms over a graph derived
from the relational fixtures.

The reference has no graph operators (SURVEY.md §2.12 — its only
iteration is the state-machine retry loop); these are green-field
engine capabilities for the 100 TB curation stack, where link-style
analyses (domain ranking for crawl prioritization, co-occurrence
graphs for dedup clustering) run over billions of edges.

Scale shape shared by every query here: the graph is built ONCE
(distinct projection + self equi-join on the containing key, so
pairs are generated key-locally), the per-node state table is tiny
relative to the edge table, and each iteration is one edge→state
equi-join + one aggregate — the classic Pregel-as-DataFrame loop
with O(iterations) shuffles of the edge table, never a driver-side
adjacency structure.

Exactness: node state is BIGINT (scaled 1e9) and every update uses
integer floor-division, so ranks are bit-identical across engines,
partitionings, and summation orders — verifiable against a DuckDB
oracle running the same unrolled iterations (a float PageRank can
only ever be compared approximately).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sfs3_kinesis_spark.plans.core import register, t

#: shared constants — one source of truth for the Spark callable AND
#: the oracle SQL (ADVICE r1: never let the two sides drift).
PR_TOP_N = 60
PR_ITERATIONS = 2
PR_INIT = 1_000_000_000  # per-node starting mass (scaled)
PR_BASE = 150_000_000  # (1 - 0.85) * PR_INIT — the teleport term
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100


def _pagerank_oracle() -> str:
    blocks = [
        f"""
    li AS (SELECT DISTINCT l_orderkey AS okey, l_partkey AS pk FROM lineitem),
    nodes AS (
      SELECT pk FROM (SELECT pk, count(*) AS n FROM li GROUP BY pk)
      ORDER BY n DESC, pk LIMIT {PR_TOP_N}),
    e AS (
      SELECT DISTINCT a.pk AS src, b.pk AS dst
      FROM li a JOIN li b ON a.okey = b.okey AND a.pk <> b.pk
      WHERE a.pk IN (SELECT pk FROM nodes)
        AND b.pk IN (SELECT pk FROM nodes)),
    deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
    r0 AS (SELECT pk, CAST({PR_INIT} AS BIGINT) AS r FROM nodes)"""
    ]
    for i in range(1, PR_ITERATIONS + 1):
        blocks.append(
            f"""
    c{i} AS (
      SELECT e.dst AS pk, sum(r{i - 1}.r // deg.d) AS inc
      FROM e JOIN r{i - 1} ON e.src = r{i - 1}.pk
             JOIN deg ON e.src = deg.src
      GROUP BY e.dst),
    r{i} AS (
      SELECT n.pk,
             CAST({PR_BASE} + {PR_DAMP_NUM} * COALESCE(c{i}.inc, 0)
                  // {PR_DAMP_DEN} AS BIGINT) AS r
      FROM nodes n LEFT JOIN c{i} ON n.pk = c{i}.pk)"""
        )
    return (
        "WITH "
        + ",".join(blocks)
        + f"""
    SELECT pk AS part_id, r AS rank_scaled FROM r{PR_ITERATIONS}
    """
    )


@register(
    "graph_pagerank_parts",
    _pagerank_oracle(),
    tags=("graph", "pagerank", "iterative", "join"),
    description=(
        "integer-exact PageRank over the part co-purchase graph (the "
        "domain-ranking / crawl-prioritization shape): nodes = top-60 "
        "parts by order reach (total (count, pk) tie-break), edges = "
        "distinct co-occurrence pairs generated order-locally by a "
        "self equi-join, then 2 Pregel-style iterations — each ONE "
        "edge⋈rank equi-join (rank table broadcast: |nodes| rows) + "
        "ONE map-side-combined aggregate; rank mass in scaled BIGINT "
        "with floor-div damping, so the fixpoint is bit-identical to "
        "the oracle's unrolled iterations at any partitioning"
    ),
)
def graph_pagerank_parts(spark: SparkSession, sf_dir: str):
    li = (
        t(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("pk"))
        .distinct()
        .persist()
    )
    nodes = (
        li.groupBy("pk")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("pk"))
        .limit(PR_TOP_N)
        .select("pk")
    )
    member = li.join(F.broadcast(nodes), "pk").select("okey", "pk")
    edges = (
        member.alias("a")
        .join(member.alias("b"), (F.col("a.okey") == F.col("b.okey")) & (F.col("a.pk") != F.col("b.pk")))
        .select(F.col("a.pk").alias("src"), F.col("b.pk").alias("dst"))
        .distinct()
        .persist()
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    ranks = nodes.select("pk", F.lit(PR_INIT).cast("long").alias("r"))
    for _ in range(PR_ITERATIONS):
        inc = (
            edges.join(F.broadcast(ranks), edges.src == ranks.pk)
            .join(F.broadcast(deg), "src")
            .select("dst", F.expr("r div d").alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("inc"))
        )
        ranks = (
            nodes.join(inc, nodes.pk == inc.dst, "left")
            .select(
                "pk",
                F.expr(
                    f"CAST({PR_BASE} + {PR_DAMP_NUM} * COALESCE(inc, 0L)"
                    f" div {PR_DAMP_DEN} AS BIGINT)"
                ).alias("r"),
            )
        )
    return ranks.select(F.col("pk").alias("part_id"), F.col("r").alias("rank_scaled"))
