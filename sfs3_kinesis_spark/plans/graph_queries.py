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

from sfs3_kinesis_spark.operators.scale import lineage_pin, pin_shared
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
    )
    li = pin_shared(li, tag="pagerank_li")
    # the 60-row node table feeds the member build, the initial rank
    # vector AND every iteration's left join — pin it so the top-N
    # aggregation over lineitem runs once, not once per consumer
    nodes = (
        li.groupBy("pk")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("pk"))
        .limit(PR_TOP_N)
        .select("pk")
    )
    # bounded=True: the node table is top-N-bounded (60 rows) BY THE
    # ALGORITHM — the leaf-sum guard sees its lineitem leaf (1.4-5.8
    # GB at sf1-10) and would wrongly unpin it at scale (r09 verdict
    # What's-wrong #3)
    nodes = pin_shared(nodes, tag="pagerank_nodes", bounded=True)
    member = li.join(F.broadcast(nodes), "pk").select("okey", "pk")
    edges = (
        member.alias("a")
        .join(member.alias("b"), (F.col("a.okey") == F.col("b.okey")) & (F.col("a.pk") != F.col("b.pk")))
        .select(F.col("a.pk").alias("src"), F.col("b.pk").alias("dst"))
        .distinct()
    )
    # bounded=True: at most N*(N-1) = 3540 rows regardless of corpus
    edges = pin_shared(edges, tag="pagerank_edges", bounded=True)
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


@register(
    "graph_khop_reach",
    """
    WITH lp AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    prs AS (
        SELECT a.p AS u, b.p AS v
        FROM lp a JOIN lp b ON a.o = b.o AND a.p < b.p),
    e AS (SELECT u, v FROM prs GROUP BY u, v HAVING count(*) >= 2),
    und AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
    two AS (
        SELECT e1.u, e2.v
        FROM und e1 JOIN und e2 ON e1.v = e2.u AND e1.u <> e2.v),
    reach AS (
        SELECT DISTINCT u, v FROM (SELECT u, v FROM und UNION ALL SELECT u, v FROM two)),
    deg AS (SELECT u, count(*) AS d FROM und GROUP BY u)
    SELECT reach.u AS part_id,
           CAST(max(deg.d) AS BIGINT) AS degree,
           CAST(count(*) AS BIGINT) AS reach2
    FROM reach JOIN deg ON reach.u = deg.u
    GROUP BY reach.u
    ORDER BY reach2 DESC, part_id LIMIT 30
    """,
    tags=("graph", "khop", "reachability", "join"),
    description=(
        "2-hop reachability (the neighborhood-size signal behind "
        "crawl frontier scoring and graph feature engineering): over "
        "the support>=2 co-purchase graph, each node's exact count of "
        "distinct nodes within 2 hops (self excluded) next to its "
        "1-hop degree — frontier expansion as ONE equi-join per hop "
        "on the frontier key, with a distinct collapsing duplicate "
        "paths BEFORE the count (the dedup that keeps k-hop "
        "tractable: path multiplicity grows geometrically, the "
        "reachable SET does not); top-30 with a total (reach2, id) "
        "order.  Deeper k iterates the same join-distinct step"
    ),
)
def graph_khop_reach(spark: SparkSession, sf_dir: str):
    li = (
        t(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    pairs = (
        li.alias("a")
        .join(li.alias("b"), (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .select(F.col("a.p").alias("u"), F.col("b.p").alias("v"))
    )
    e = pairs.groupBy("u", "v").agg(F.count("*").alias("w")).filter("w >= 2").select("u", "v")
    und = pin_shared(
        e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v"))), tag="reach_und"
    )
    two = (
        und.alias("e1")
        .join(und.alias("e2"), (F.col("e1.v") == F.col("e2.u")) & (F.col("e1.u") != F.col("e2.v")))
        .select(F.col("e1.u").alias("u"), F.col("e2.v").alias("v"))
    )
    reach = und.unionAll(two).distinct()
    deg = und.groupBy("u").agg(F.count("*").alias("d"))
    return (
        reach.join(deg, "u")
        .groupBy(F.col("u").alias("part_id"))
        .agg(
            F.max("d").cast("long").alias("degree"),
            F.count(F.lit(1)).cast("long").alias("reach2"),
        )
        .orderBy(F.desc("reach2"), "part_id")
        .limit(30)
    )


#: k-core threshold and fixed peeling depth
KCORE_K = 3
KCORE_ROUNDS = 6


def _kcore_oracle() -> str:
    """Chained-CTE unroll of KCORE_ROUNDS peeling rounds — the same
    fixed recursion the Spark loop runs, so the two engines agree at
    ANY round count, converged or not.  Every CTE is MATERIALIZED:
    each round references its predecessor three times, so inlining
    would expand the base scan 3^rounds times (DuckDB ran out of
    file handles before it ran out of patience)."""
    parts = [
        "WITH lp AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o,"
        " l_partkey AS p FROM lineitem),",
        "prs AS (SELECT a.p AS u, b.p AS v FROM lp a JOIN lp b"
        " ON a.o = b.o AND a.p < b.p),",
        "e0 AS MATERIALIZED"
        " (SELECT u, v FROM prs GROUP BY u, v HAVING count(*) >= 2)",
    ]
    for r in range(1, KCORE_ROUNDS + 1):
        prev = f"e{r - 1}"
        parts.append(
            f", d{r} AS MATERIALIZED (SELECT node, count(*) AS c FROM"
            f" (SELECT u AS node FROM {prev}"
            f" UNION ALL SELECT v AS node FROM {prev}) GROUP BY node)"
        )
        parts.append(f", k{r} AS (SELECT node FROM d{r} WHERE c >= {KCORE_K})")
        parts.append(
            f", e{r} AS MATERIALIZED"
            f" (SELECT {prev}.u AS u, {prev}.v AS v FROM {prev}"
            f" JOIN k{r} ka ON {prev}.u = ka.node"
            f" JOIN k{r} kb ON {prev}.v = kb.node)"
        )
    last = f"e{KCORE_ROUNDS}"
    parts.append(
        f" SELECT CAST(node AS BIGINT) AS part_id,"
        f" CAST(count(*) AS BIGINT) AS core_degree"
        f" FROM (SELECT u AS node FROM {last}"
        f" UNION ALL SELECT v AS node FROM {last}) GROUP BY node"
    )
    return "\n".join(parts)


@register(
    "graph_kcore_peel",
    _kcore_oracle(),
    tags=("graph", "kcore", "iterative", "join"),
    description=(
        "k-core peeling (k=3, 6 fixed rounds) on the co-purchase "
        "graph (the triangle-count edge set: support >= 2): each "
        "round recomputes degrees over the surviving edges and drops "
        "nodes below k — the density-tier decomposition that "
        "separates a graph's cohesive core from its periphery "
        "(spam/quality tiering for web-crawl link graphs).  A FIXED "
        "round count is the cross-engine-exact form: Spark and the "
        "oracle run the identical 6 rounds, so results match whether "
        "or not the fixture has converged (sf0.001 converges in 0 "
        "rounds, sf0.1's sparse support>=2 graph empties by round 2, "
        "sf0.01 is still shrinking at round 10 — measured); a "
        "production run iterates the same loop driver-side to "
        "fixpoint with a convergence check, the connected_components "
        "discipline (operators/dedup.py).  Each round is one "
        "map-side-combined degree aggregate + two semi-joins on the "
        "shrinking edge set — shuffle-bounded, no all-pairs anywhere"
    ),
)
def graph_kcore_peel(spark: SparkSession, sf_dir: str):
    li = (
        t(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    pairs = (
        li.alias("a")
        .join(li.alias("b"), (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .select(F.col("a.p").alias("u"), F.col("b.p").alias("v"))
    )
    edges = (
        pairs.groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2)
        .select("u", "v")
        # every round re-reads the previous round's edge set twice
        # (degree build + the filter join) — pin each round's frame so
        # the whole prefix is not recomputed 2^rounds times; reliable
        # checkpoint (recomputable on executor loss) when a checkpoint
        # dir is configured, which the session factory guarantees
        .transform(lambda d: lineage_pin(d, eager=False))
    )
    for _ in range(KCORE_ROUNDS):
        deg = (
            edges.select(F.col("u").alias("node"))
            .unionAll(edges.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        keep = deg.filter(F.col("c") >= KCORE_K).select("node")
        edges = (
            edges.join(keep.withColumnRenamed("node", "u"), "u", "left_semi")
            .join(keep.withColumnRenamed("node", "v"), "v", "left_semi")
            .select("u", "v")
            .transform(lambda d: lineage_pin(d, eager=False))
        )
    return (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy(F.col("node").cast("long").alias("part_id"))
        .agg(F.count(F.lit(1)).cast("long").alias("core_degree"))
    )


@register(
    "graph_modularity_brand",
    """
    WITH lp AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    prs AS (
        SELECT a.p AS u, b.p AS v
        FROM lp a JOIN lp b ON a.o = b.o AND a.p < b.p),
    e AS (SELECT u, v FROM prs GROUP BY u, v HAVING count(*) >= 2),
    lab AS (SELECT p_partkey AS p, p_brand AS c FROM part),
    el AS (
        SELECT cu.c AS cu, cv.c AS cv
        FROM e JOIN lab cu ON e.u = cu.p JOIN lab cv ON e.v = cv.p),
    m AS (SELECT CAST(count(*) AS BIGINT) AS m,
                 CAST(count(*) FILTER (WHERE cu = cv) AS BIGINT) AS intra
          FROM el),
    deg AS (
        SELECT c, CAST(sum(d) AS BIGINT) AS dc FROM (
            SELECT cu AS c, count(*) AS d FROM el GROUP BY cu
            UNION ALL
            SELECT cv AS c, count(*) AS d FROM el GROUP BY cv
        ) GROUP BY c),
    s AS (SELECT CAST(sum(dc * dc) AS BIGINT) AS sum_deg_sq,
                 CAST(count(*) AS BIGINT) AS n_comms
          FROM deg)
    SELECT m AS n_edges,
           intra AS n_intra_edges,
           n_comms AS n_communities,
           sum_deg_sq,
           CAST(4 * m * intra - sum_deg_sq AS BIGINT) AS q_num,
           CAST(4 * m * m AS BIGINT) AS q_den
    FROM m, s
    """,
    tags=("graph", "modularity", "community", "exact_arithmetic"),
    description=(
        "Newman modularity of the BRAND partition over the support>=2 "
        "co-purchase graph — does an existing attribute explain the "
        "graph's community structure?  (The attribute-partition form "
        "needs no iterative community detection, so the oracle is "
        "closed-form.)  Q = sum_c (e_c/m - (d_c/2m)^2) emitted as the "
        "EXACT integer ratio q_num/q_den = (4m*intra - sum_c d_c^2) / "
        "(4m^2): Q is signed, and negative floor vs truncating "
        "division is not cross-engine stable, so the split readout is "
        "the whole answer (the Cohen's-kappa convention).  Safe in "
        "BIGINT to m ~ 1.5e9 edges (4m^2 < 9.2e18); everything "
        "reduces to the edge-label join, one 2-counter total and a "
        "|communities|-row degree rollup"
    ),
)
def graph_modularity_brand(spark: SparkSession, sf_dir: str):
    li = (
        t(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    prs = (
        li.alias("a")
        .join(li.alias("b"), (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .select(F.col("a.p").alias("u"), F.col("b.p").alias("v"))
    )
    e = prs.groupBy("u", "v").agg(F.count(F.lit(1)).alias("w")).filter("w >= 2").select("u", "v")
    lab = t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("p"), F.col("p_brand").alias("c")
    )
    el = (
        e.join(lab.select(F.col("p").alias("u"), F.col("c").alias("cu")), "u")
        .join(lab.select(F.col("p").alias("v"), F.col("c").alias("cv")), "v")
        .select("cu", "cv")
    )
    # feeds the edge totals AND both degree rollups
    el = pin_shared(el, tag="modularity_el")
    m = el.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.count(F.when(F.col("cu") == F.col("cv"), 1)).cast("long").alias("intra"),
    )
    deg = (
        el.groupBy(F.col("cu").alias("c")).agg(F.count(F.lit(1)).alias("d"))
        .unionByName(
            el.groupBy(F.col("cv").alias("c")).agg(F.count(F.lit(1)).alias("d"))
        )
        .groupBy("c")
        .agg(F.sum("d").alias("dc"))
    )
    s = deg.agg(
        F.sum(F.expr("dc * dc")).cast("long").alias("sum_deg_sq"),
        F.count(F.lit(1)).cast("long").alias("n_comms"),
    )
    return m.crossJoin(F.broadcast(s)).select(
        F.col("m").alias("n_edges"),
        F.col("intra").alias("n_intra_edges"),
        F.col("n_comms").alias("n_communities"),
        "sum_deg_sq",
        F.expr("CAST(4 * m * intra - sum_deg_sq AS BIGINT)").alias("q_num"),
        F.expr("CAST(4 * m * m AS BIGINT)").alias("q_den"),
    )
