package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Quantile-store contract: range-merged sketch percentiles honor the
  * KLL (ε, δ) rank-error bound against exact rank positions, row
  * counts stay exact, and sub-ranges read only their days. (KLL
  * compaction is randomized, so — unlike the HLL store — the contract
  * is the rank bound, not bit equality.)
  */
class QuantileStoreSpec extends SparkSpec {

  import spark.implicits._

  test("range merge: rank-bounded percentiles, exact counts, pruned days") {
    val dir = java.nio.file.Files.createTempDirectory("kll").toString + "/q"
    // 3 days × 60 values each: day d holds d*1000 + (0 until 60).
    // 180 total stays under the k=200 level-0 capacity, so the
    // sketch (and the 3-way merge) never compacts — exact mode —
    // and the percentile asserts can be literal order statistics.
    val events = (1 to 3).flatMap { d =>
      (0 until 60).map(i =>
        (s"2025-03-0$d 10:00:00", "order", d * 1000.0 + i))
    }.toDF("t", "event_type", "value")
      .select(col("t").cast("timestamp").as("ts"), col("event_type"),
        col("value"))
    QuantileStore.buildDaily(events, dir)

    val got = QuantileStore.quantileRange(spark, dir,
      "2025-03-01", "2025-03-03")
      .as[(String, Long, Seq[Double])].collect()
    assert(got.length === 1)
    val (tpe, n, qs) = got.head
    assert(tpe === "order" && n === 180L)
    // inclusive rank: item at position ceil(p*n), 1-based
    assert(qs(0) === 2029.0) // p50 -> 90th  = day-2 #30
    assert(qs(1) === 3050.0) // p95 -> 171st = day-3 #51
    assert(qs(2) === 3058.0) // p99 -> 179th = day-3 #59

    // sub-range percentiles come from that range's days only
    val d1 = QuantileStore.quantileRange(spark, dir,
      "2025-03-01", "2025-03-01")
      .as[(String, Long, Seq[Double])].collect().head
    assert(d1._2 === 60L)
    assert(d1._3(0) === 1029.0) // p50 of day 1 alone
    assert(d1._3.forall(v => v >= 1000.0 && v <= 1059.0))

    // partitioning invariance of counts; percentiles honor the KLL
    // normalized rank-error bound (±1.65%·n ≈ 3 ranks at n=180 —
    // exact-mode here, but asserted as the bound the store PROMISES)
    val dir2 = java.nio.file.Files.createTempDirectory("kll").toString + "/q2"
    QuantileStore.buildDaily(events.repartition(7), dir2)
    val again = QuantileStore.quantileRange(spark, dir2,
      "2025-03-01", "2025-03-03")
      .as[(String, Long, Seq[Double])].collect().head
    assert(again._2 === 180L)
    val sortedVals = (1 to 3).flatMap(d =>
      (0 until 60).map(i => d * 1000.0 + i)).sorted
    Seq(0.5, 0.95, 0.99).zip(again._3).foreach { case (p, est) =>
      val estRank = sortedVals.count(_ <= est)
      val trueRank = math.ceil(p * 180).toInt
      assert(math.abs(estRank - trueRank) <= 4,
        s"p=$p est=$est rank=$estRank want~$trueRank")
    }
  }
}
