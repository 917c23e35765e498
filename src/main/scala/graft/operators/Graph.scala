package graft.operators

import graft.QueryDef
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over the interaction graph (beyond-ref:
  * the standard companion to the CF family — the reference scores
  * items by co-occurrence (dags/daily_pipeline.py:361-533); PageRank
  * is the global-importance variant of the same bipartite graph).
  *
  * Cross-engine determinism: float PageRank never hash-matches across
  * engines (summation order), so the whole iteration runs in exact
  * integer arithmetic — ranks are 10^12-scaled BIGINTs, per-edge
  * contributions use integer division (`div` / `//`), and the damping
  * update is `base + (85 * mass) div 100`. Both engines execute the
  * identical recurrence on identical integers, so every iteration is
  * bit-equal (verified by the DuckDB oracle's unrolled CTE ladder).
  * Rounding mass lost to integer division is bounded by deg(v) units
  * (10^-12 each) per node per round — immaterial for ranking.
  *
  * Scale shape (100 TB): each iteration is one equi-join of the rank
  * vector (|V| rows) with the edge list (|E| rows) on the source key
  * followed by a map-side-combined sum on the destination key — the
  * textbook distributed PageRank step. Edges and degrees are
  * lazily checkpointed once and reused by all iterations; the rank
  * lineage stays 2·iters joins deep (bounded, no driver loop state).
  * Skew: a viral node's in-edges all land in one reduce group, which
  * Spark handles via AQE skew-split because the per-edge contribution
  * rows are already materialized before the final sum.
  */
object Graph {

  /** 1e12 integer rank units — total graph mass. */
  val Scale = 1000000000000L
  val DampPct = 85L
  val Iters = 5

  /** Bipartite node encoding: users even, items odd. */
  private def bipartiteEdges(inter: DataFrame): DataFrame = {
    val fwd = inter.select((col("user_id") * 2).as("src"),
      (col("item_id") * 2 + 1).as("dst"))
    fwd.unionByName(fwd.select(col("dst").as("src"), col("src").as("dst")))
  }

  /** Integer-arithmetic PageRank over a (user_id, item_id) interaction
    * edge set. Returns (node_type, id, rank) with rank in 1e-12 units.
    */
  def pagerankFrom(inter: DataFrame, iters: Int = Iters): DataFrame = {
    val edges = bipartiteEdges(inter).localCheckpoint(false)
    val deg = edges.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg")).localCheckpoint(false)
    val nNodes = deg.agg(count(lit(1)).as("n_nodes"))
    // Decorate each edge with its DESTINATION's degree once, so the
    // rank vector can carry (pr, deg) and each iteration costs exactly
    // one equi-join + one aggregate — no per-round join against deg.
    val edgesD = edges
      .join(deg.select(col("node").as("dst"), col("deg").as("dst_deg")), "dst")
      .localCheckpoint(false)
    var r = deg.crossJoin(nNodes) // 1-row build side: broadcast-nl, not a real cross
      .select(col("node"), expr(s"$Scale div n_nodes").as("pr"),
        col("deg"), col("n_nodes"))
    for (_ <- 1 to iters) {
      val contrib = r.select(col("node"),
        expr("pr div deg").as("c"), col("n_nodes"))
      // Deliberately NOT broadcast-hinted: the rank vector is |V| rows
      // and AQE converts the join to broadcast at runtime when that
      // measured size fits, while a hard hint would force a driver
      // collect of the full rank vector every round — a regression the
      // moment |V| outgrows driver memory. (A/B on this box: the hint
      // is a wash inside run-to-run noise.)
      r = edgesD.join(contrib, edgesD("src") === contrib("node"))
        .groupBy(col("dst"))
        .agg(sum(col("c")).as("in_mass"), max(col("dst_deg")).as("deg"),
          max(col("n_nodes")).as("n_nodes"))
        .select(col("dst").as("node"),
          expr(s"(15 * $Scale) div (100 * n_nodes) + ($DampPct * in_mass) div 100")
            .as("pr"),
          col("deg"), col("n_nodes"))
    }
    r.select(
      when(col("node") % 2 === 0, lit("user")).otherwise(lit("item"))
        .as("node_type"),
      expr("node div 2").as("id"),
      col("pr").as("rank"))
  }

  def pagerank(s: SparkSession, d: String): DataFrame =
    pagerankFrom(Recommend.interactions(s, d))

  /** One unrolled oracle iteration; `prev` names the previous level's
    * CTE. MATERIALIZED is load-bearing: DuckDB inlines CTEs, so an
    * un-materialized ladder re-scans the base 3^iters times.
    */
  private def iterCte(name: String, prev: String): String =
    s"""$name AS MATERIALIZED (SELECT e.dst AS node,
       |  (15 * $Scale) // (100 * nn.n_nodes)
       |    + ($DampPct * SUM($prev.rank // dg.deg)) // 100 AS rank
       |  FROM e JOIN $prev ON e.src = $prev.node
       |  JOIN dg ON e.src = dg.node, nn
       |  GROUP BY e.dst, nn.n_nodes)""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("graph_pagerank",
      (s, d) => pagerank(s, d),
      Some {
        val ladder = (1 to Iters)
          .map(i => iterCte(s"r$i", if (i == 1) "r0" else s"r${i - 1}"))
          .mkString(",\n")
        s"""WITH i AS MATERIALIZED (SELECT DISTINCT o_custkey AS u, l_partkey AS it
           |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
           |e AS MATERIALIZED (SELECT u*2 AS src, it*2+1 AS dst FROM i
           |  UNION ALL SELECT it*2+1 AS src, u*2 AS dst FROM i),
           |dg AS MATERIALIZED (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg
           |  FROM e GROUP BY 1),
           |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes FROM dg),
           |r0 AS MATERIALIZED (SELECT node, $Scale // n_nodes AS rank FROM dg, nn),
           |$ladder
           |SELECT CASE WHEN node % 2 = 0 THEN 'user' ELSE 'item' END AS node_type,
           |node // 2 AS id, CAST(rank AS BIGINT) AS rank FROM r$Iters""".stripMargin
      })
  )
}
