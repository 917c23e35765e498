package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, GraftDatasetBridge}
import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, SortOrder}
import org.apache.spark.sql.functions._

/** Public API over the native per-key top-k operator
  * (`graft.plans.TopKPerKeyPlan` — see that file for the two-phase
  * physical design and why it beats the rank-window idiom at scale).
  */
object TopK {

  /** Exact top `k` rows per `keyCols` group under `orderSpec`
    * ((column, descending) pairs — append a unique tiebreaker for a
    * total order, same contract as a rank window). Output rows are
    * the input rows verbatim, no guaranteed order.
    */
  def perKey(df: DataFrame, keyCols: Seq[String],
             orderSpec: Seq[(String, Boolean)], k: Int): DataFrame = {
    val analyzed = df.queryExecution.analyzed
    def attr(n: String) = analyzed.output.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(
        s"column $n not in ${analyzed.output.map(_.name)}"))
    val keys = keyCols.map(attr)
    val order = orderSpec.map { case (n, desc) =>
      val dir = if (desc) Descending else Ascending
      SortOrder(attr(n), dir, dir.defaultNullOrdering, Seq.empty)
    }
    GraftDatasetBridge.ofRows(df.sparkSession,
      graft.plans.TopKPerKeyPlan(keys, order, k, analyzed))
  }

  // ---- driver-contract registry ----

  val defs: Seq[QueryDef] = Seq(
    // O6: top-3 events by value per event type through the native
    // operator — same result set as the rank-window idiom (the
    // oracle), via heap partials instead of WindowGroupLimit's
    // sorted partials (see TopKPerKey.scala for the trade).
    QueryDef("o6_topk_perkey",
      (s, d) => perKey(
        Tables.events(s, d)
          .select(col("event_id"), col("event_type"), col("value")),
        Seq("event_type"),
        Seq(("value", true), ("event_id", false)), 3),
      Some("""SELECT event_id, event_type, value FROM (
             |  SELECT event_id, event_type, value,
             |    ROW_NUMBER() OVER (PARTITION BY event_type
             |      ORDER BY value DESC, event_id) AS rn
             |  FROM events) WHERE rn <= 3""".stripMargin)))
}
