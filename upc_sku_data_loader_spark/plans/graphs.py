"""Graph analytics over the supplier co-supply graph: triangle counting
with clustering coefficients, and common-neighbor link prediction.

Web-corpus curation pipelines compute link-graph statistics as quality
priors (k43 pagerank is the global one); triangle density and local
clustering are the standard *local* cohesion signals (Watts-Strogatz
clustering coefficient), and resource-allocation link prediction (Zhou,
Lu, Zhang 2009, "Predicting missing links via local information") is
the classic "which near-miss edges are real" score used to densify
noisy similarity graphs.  Reference file:line n/a — the reference tree
is empty (SURVEY §0.1); the contract is SURVEY §2.K's graph family.

Graph construction (shared by both operators, mirrored verbatim in the
oracles): nodes are suppliers; the candidate edge weight between two
suppliers is the number of distinct parts both supply (from the
distinct ``(l_partkey, l_suppkey)`` pairs of lineitem); the graph keeps
the TOP-``_N_EDGES`` candidate pairs by ``(weight DESC, u, v)`` — a
deterministic, scale-free sparsification (the fixture co-supply graph
saturates toward a clique as sf grows; production similarity graphs are
thresholded the same way).

Integer discipline: every emitted metric is integer (counts, degrees,
micro-unit ratios via integer division), so the cross-engine hash is
exact by construction — no float leaves either engine.

Scale notes (100 TB):
- The per-part pair fan-out is keyed by part; its width is bounded by
  each part's supplier multiplicity (salt hot parts if a single key
  explodes — same remedy as c13).
- Edge selection is a global top-k: Spark plans it as
  TakeOrderedAndProject (partial top-k per partition, no full sort).
- Triangle enumeration joins the oriented edge list on node keys only
  (two hash joins); orientation ``u < v < w`` enumerates each triangle
  exactly once.  At web scale you'd orient low-degree → high-degree
  (compact-forward) so the join fan-out is bounded by arboricity, not
  max degree; with a top-k-sparsified graph the id orientation is
  already bounded, so we keep the simpler, oracle-mirrorable form.
- Link prediction joins the adjacency list with itself on the shared
  neighbor (one keyed shuffle) and anti-joins the existing edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query

_N_EDGES = 500  # top-k sparsification: keeps avg degree ~10 on the 100-node fixture
_N_LINKS = 100  # link-prediction report size

# Shared SQL for the sparsified co-supply edge list (u < v, both ends
# supplier keys).  Mirrors _edges() below line-for-line.
_EDGES_SQL = f"""
  ps AS (
    SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk FROM lineitem
  ),
  cand AS (
    SELECT a.sk AS u, b.sk AS v, COUNT(*) AS common_parts
    FROM ps a JOIN ps b ON a.pk = b.pk AND a.sk < b.sk
    GROUP BY a.sk, b.sk
  ),
  edges AS (
    SELECT u, v FROM cand
    ORDER BY common_parts DESC, u, v
    LIMIT {_N_EDGES}
  )
"""


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k sparsified co-supply edge list: columns (u, v), u < v."""
    ps = (
        load(spark, sf_dir, "lineitem")
        .select(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk"))
        .distinct()
    )
    a = ps.alias("a")
    b = ps.alias("b")
    cand = (
        a.join(b, (F.col("a.pk") == F.col("b.pk")) & (F.col("a.sk") < F.col("b.sk")))
        .groupBy(F.col("a.sk").alias("u"), F.col("b.sk").alias("v"))
        .agg(F.count(F.lit(1)).alias("common_parts"))
    )
    # orderBy+limit → TakeOrderedAndProject: per-partition partial top-k,
    # never a full global sort.
    return cand.orderBy(
        F.col("common_parts").desc(), "u", "v"
    ).limit(_N_EDGES).select("u", "v")


# --- K71: triangle counting + local clustering coefficient --------------------


@query(
    "k71_triangle_count",
    oracle=f"""
    WITH {_EDGES_SQL},
    nodes AS (
      SELECT u AS node FROM edges UNION SELECT v FROM edges
    ),
    deg AS (
      SELECT node, COUNT(*) AS degree
      FROM (SELECT u AS node FROM edges UNION ALL SELECT v FROM edges)
      GROUP BY node
    ),
    tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM edges e1
      JOIN edges e2 ON e2.u = e1.v
      JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    per_node AS (
      SELECT node, COUNT(*) AS n_triangles
      FROM (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
      )
      GROUP BY node
    )
    SELECT d.node AS s_suppkey,
           d.degree,
           COALESCE(p.n_triangles, 0) AS n_triangles,
           CASE WHEN d.degree >= 2
                THEN (2000000 * COALESCE(p.n_triangles, 0))
                     // (d.degree * (d.degree - 1))
                ELSE 0 END AS clustering_micro
    FROM deg d LEFT JOIN per_node p ON p.node = d.node
    """,
)
def k71_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle count and local clustering coefficient over the
    sparsified co-supply graph.

    Triangles are enumerated once each via the ``u < v < w`` orientation
    (two hash joins on node keys); per-node counts come from exploding
    each triangle to its three corners and aggregating.  The clustering
    coefficient 2T/(d(d-1)) is emitted in integer micro-units (both
    engines truncate identically), so the whole output is integer-exact.
    """
    e = _edges(spark, sf_dir)
    e1 = e.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = e.select(F.col("u").alias("b2"), F.col("v").alias("c"))
    e3 = e.select(F.col("u").alias("a3"), F.col("v").alias("c3"))
    tri = (
        e1.join(e2, F.col("b") == F.col("b2"))
        .join(e3, (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")))
        .select("a", "b", "c")
    )
    per_node = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    clustering = F.when(
        F.col("degree") >= 2,
        F.expr("(2000000 * n_triangles) div (degree * (degree - 1))"),
    ).otherwise(F.lit(0).cast("long"))
    return (
        deg.join(per_node, "node", "left")
        .withColumn("n_triangles", F.coalesce("n_triangles", F.lit(0).cast("long")))
        .select(
            F.col("node").alias("s_suppkey"),
            "degree",
            "n_triangles",
            clustering.alias("clustering_micro"),
        )
    )


# --- K72: common-neighbor / resource-allocation link prediction ---------------


@query(
    "k72_link_prediction",
    oracle=f"""
    WITH {_EDGES_SQL},
    adj AS (
      SELECT u AS node, v AS nbr FROM edges
      UNION ALL
      SELECT v, u FROM edges
    ),
    deg AS (
      SELECT node, COUNT(*) AS degree FROM adj GROUP BY node
    ),
    cn_cand AS (
      SELECT a.node AS u, b.node AS v, a.nbr AS z
      FROM adj a JOIN adj b ON a.nbr = b.nbr AND a.node < b.node
    ),
    scored AS (
      SELECT c.u, c.v,
             COUNT(*) AS common_neighbors,
             CAST(SUM(1000000 // d.degree) AS BIGINT) AS ra_micro
      FROM cn_cand c JOIN deg d ON d.node = c.z
      GROUP BY c.u, c.v
    ),
    non_edges AS (
      SELECT s.* FROM scored s
      LEFT JOIN edges e ON e.u = s.u AND e.v = s.v
      WHERE e.u IS NULL
    )
    SELECT u, v, common_neighbors, ra_micro
    FROM non_edges
    ORDER BY ra_micro DESC, common_neighbors DESC, u, v
    LIMIT {_N_LINKS}
    """,
)
def k72_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top predicted missing links by the resource-allocation index
    RA(u,v) = Σ_{{z ∈ N(u)∩N(v)}} 1/deg(z), emitted in integer
    micro-units (per-neighbor ``1000000 div deg`` summed — integer on
    both engines, so exact).

    Shape: adjacency self-join keyed on the shared neighbor z (ONE
    shuffle), degree side broadcast, existing edges removed with a
    broadcast anti-join, deterministic global top-k via
    TakeOrderedAndProject.  At 100 TB the z-join fan-out is bounded by
    the sparsified max degree (top-k graph), the classic remedy when a
    hub would explode being degree-capped adjacency.
    """
    e = _edges(spark, sf_dir)
    adj = e.select(F.col("u").alias("node"), F.col("v").alias("nbr")).unionAll(
        e.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
    )
    deg = adj.groupBy(F.col("node")).agg(F.count(F.lit(1)).alias("degree"))
    a = adj.select(F.col("node").alias("u"), F.col("nbr").alias("z"))
    b = adj.select(F.col("node").alias("v"), F.col("nbr").alias("z2"))
    cand = a.join(b, (F.col("z") == F.col("z2")) & (F.col("u") < F.col("v")))
    scored = (
        cand.join(
            F.broadcast(deg.select(F.col("node").alias("z"), "degree")), "z"
        )
        .groupBy("u", "v")
        .agg(
            F.count(F.lit(1)).alias("common_neighbors"),
            F.sum(F.expr("1000000 div degree")).alias("ra_micro"),
        )
    )
    non_edges = scored.join(F.broadcast(e), ["u", "v"], "left_anti")
    return non_edges.orderBy(
        F.col("ra_micro").desc(), F.col("common_neighbors").desc(), "u", "v"
    ).limit(_N_LINKS)


# --- K84: degree distribution (count-of-counts) --------------------------------


@query(
    "k84_degree_distribution",
    oracle=f"""
    WITH {_EDGES_SQL},
    deg AS (
      SELECT node, COUNT(*) AS degree
      FROM (SELECT u AS node FROM edges
            UNION ALL SELECT v AS node FROM edges)
      GROUP BY node
    )
    SELECT degree,
           COUNT(*) AS n_nodes,
           CAST(SUM(COUNT(*)) OVER (ORDER BY degree DESC
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS n_nodes_at_least
    FROM deg
    GROUP BY degree
    """,
)
def k84_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the co-supply graph: for each degree
    value, how many nodes have it, plus the complementary cumulative
    count (nodes with degree ≥ d) — the count-of-COUNTS double
    aggregation behind power-law/hub diagnostics on link graphs (web
    curation reads this curve to spot spam farms: organic link graphs
    are heavy-tailed, farms are spike-shaped).

    Plan: shared sparsified edge build (graphs.py module doc), then
    endpoint explode → per-node degree agg → per-degree count agg —
    two keyed shuffles of ever-shrinking tables, and the CCDF window
    runs over the DISTINCT-DEGREE-sized result.  Integer-only output.
    """
    from pyspark.sql import Window

    edges = _edges(spark, sf_dir)
    nodes = edges.select(F.col("u").alias("node")).unionAll(
        edges.select(F.col("v").alias("node"))
    )
    deg = nodes.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
    dist = deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_nodes"))
    w = Window.orderBy(F.col("degree").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return dist.select(
        "degree",
        "n_nodes",
        F.sum("n_nodes").over(w).cast("bigint").alias("n_nodes_at_least"),
    )
