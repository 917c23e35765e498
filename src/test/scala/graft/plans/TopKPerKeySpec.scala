package graft.plans

import graft.SparkSpec
import graft.operators.TopK
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The native per-key top-k operator: result-identical to the rank
  * window idiom on real data (any partitioning), exact under ties
  * via the total-order contract, total on empty/small groups, and
  * planned as partial → exchange → final with no WindowExec.
  */
class TopKPerKeySpec extends SparkSpec {

  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value").desc, col("event_id"))
    df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).drop("rn")
  }

  test("matches the rank-window idiom on events, any input partitioning") {
    val ev = graft.Tables.events(spark, d)
      .select(col("event_id"), col("event_type"), col("value"))
    for (reparted <- Seq(ev, ev.repartition(13))) {
      val native = TopK.perKey(reparted, Seq("event_type"),
        Seq(("value", true), ("event_id", false)), 5)
      val oracle = windowTopK(ev, 5)
      assert(native.count() === oracle.count())
      assert(native.except(oracle).isEmpty && oracle.except(native).isEmpty)
    }
  }

  test("exact under ties and short groups; total on empty input") {
    // key a: 4 rows, two tied on v — tiebreaker id decides; key b:
    // fewer rows than k — all kept
    val df = Seq(
      ("a", 9L, 1L), ("a", 9L, 2L), ("a", 7L, 3L), ("a", 5L, 4L),
      ("b", 3L, 5L), ("b", 1L, 6L))
      .toDF("k", "v", "id").repartition(4)
    val top = TopK.perKey(df, Seq("k"), Seq(("v", true), ("id", false)), 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(top === Set(("a", 9L, 1L), ("a", 9L, 2L), ("a", 7L, 3L),
      ("b", 3L, 5L), ("b", 1L, 6L)))
    // ascending order picks the other end
    val bottom = TopK.perKey(df, Seq("k"), Seq(("v", false), ("id", false)), 1)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(bottom === Set(("a", 5L), ("b", 1L)))
    val empty = df.filter(col("k") === "zzz")
    assert(TopK.perKey(empty, Seq("k"), Seq(("v", true)), 3).count() === 0)
  }

  test("plans as partial -> exchange -> final, no window, pruned scan") {
    val ev = graft.Tables.events(spark, d)
      .select(col("event_id"), col("event_type"), col("value"))
    val p = TopK.perKey(ev, Seq("event_type"),
      Seq(("value", true), ("event_id", false)), 3)
      .queryExecution.executedPlan.toString()
    assert(p.contains("TopKPerKeyPartial"), p.take(500))
    assert(p.contains("TopKPerKeyFinal"), p.take(500))
    assert(p.contains("Exchange hashpartitioning(event_type"),
      "no key exchange between the phases")
    assert(!p.contains("WindowExec") && !p.contains("Window "),
      "fell back to the window idiom")
    // the partial phase must bound what reaches the exchange:
    // k rows per key per input partition
    val ev4 = ev.repartition(4)
    val partialRows = TopK.perKey(ev4, Seq("event_type"),
      Seq(("value", true), ("event_id", false)), 3)
      .queryExecution.executedPlan.execute().count()
    assert(partialRows <= 3L * graft.operators.Events
      .eventTypeWatchlist(graft.Tables.events(spark, d)).size,
      s"final output exceeded k per key: $partialRows")
  }
}
