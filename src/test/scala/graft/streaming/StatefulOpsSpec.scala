package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** flatMapGroupsWithState semantics: state carries ACROSS
  * micro-batches, alerts are edge-triggered per tier.
  */
class StatefulOpsSpec extends SparkSpec {

  import spark.implicits._

  test("spend tiers: running state across two micro-batches") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[OrderEvent]
    val q = StatefulOps.spendTiers(in.toDS())
      .writeStream.format("memory").queryName("tiers_out")
      .outputMode("append").start()

    // batch 1: C1 reaches SILVER (12k); C2 stays below (4k)
    in.addData(OrderEvent("C1", 8000.0), OrderEvent("C1", 4000.0),
      OrderEvent("C2", 4000.0))
    q.processAllAvailable()
    // batch 2: C1 crosses GOLD with accumulated state; C2 crosses SILVER
    in.addData(OrderEvent("C1", 45000.0), OrderEvent("C2", 7000.0))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("tiers_out")
      .as[TierAlert].collect().sortBy(a => (a.customer_id, a.n_orders))
    assert(got.map(a => (a.customer_id, a.tier, a.n_orders)).toSeq === Seq(
      ("C1", "SILVER", 2L), ("C1", "GOLD", 3L), ("C2", "SILVER", 2L)))
    // state accumulated across batches, not per batch
    assert(got.find(a => a.customer_id == "C1" && a.tier == "GOLD")
      .get.total_spent === 57000.0)
  }

  test("tier function boundaries") {
    assert(StatefulOps.tierOf(9999.99).isEmpty)
    assert(StatefulOps.tierOf(10000.0).contains("SILVER"))
    assert(StatefulOps.tierOf(100000.0).contains("PLATINUM"))
  }
}
