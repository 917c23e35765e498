package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sketch-store contract: the merged range estimate equals the
  * direct sketch over the same rows (mergeability, bit-exact), range
  * reads respect the date bounds, and the whole path is partitioning-
  * invariant.
  */
class SketchStoreSpec extends SparkSpec {

  import spark.implicits._

  test("daily sketches union-merge to the direct range sketch exactly") {
    val dir = java.nio.file.Files.createTempDirectory("hll").toString + "/s"
    // 3 days, overlapping users: exact per-day counts cannot be
    // summed (u1 active every day), which is why the store holds
    // sketches and not counts
    val events = Seq(
      (1L, "2025-03-01 10:00:00", "view"), (2L, "2025-03-01 11:00:00", "view"),
      (1L, "2025-03-02 10:00:00", "view"), (3L, "2025-03-02 11:00:00", "view"),
      (1L, "2025-03-03 10:00:00", "view"), (4L, "2025-03-03 11:00:00", "view"),
      (9L, "2025-03-02 09:00:00", "purchase"))
      .toDF("user_id", "t", "event_type")
      .select(col("user_id"), col("t").cast("timestamp").as("ts"),
        col("event_type"))
    SketchStore.buildDaily(events, dir)

    val merged = SketchStore.estimateRange(spark, dir,
      "2025-03-01", "2025-03-03")
      .as[(String, Double, Long)].collect().map(r => r._1 -> r).toMap
    // direct sketch over the same raw rows — must match bit-exactly
    val direct = events.groupBy(col("event_type"))
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id))").as("e"))
      .as[(String, Double)].collect().toMap
    assert(merged.keySet === Set("view", "purchase"))
    assert(merged("view")._2 === direct("view"))
    assert(merged("purchase")._2 === direct("purchase"))
    assert(merged("view")._3 === 6L) // raw row count rides along
    // at this cardinality HLL is exact: 4 distinct viewers, not 2+2+2
    assert(merged("view")._2 === 4.0)

    // a sub-range reads only its days (partition pruning on date=)
    val day1 = SketchStore.estimateRange(spark, dir,
      "2025-03-01", "2025-03-01")
      .as[(String, Double, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(day1 === Map("view" -> 2.0))

    // partitioning invariance of the build
    val dir2 = java.nio.file.Files.createTempDirectory("hll").toString + "/s2"
    SketchStore.buildDaily(events.repartition(7), dir2)
    val again = SketchStore.estimateRange(spark, dir2,
      "2025-03-01", "2025-03-03")
      .as[(String, Double, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(again === merged.map { case (k, v) => k -> v._2 })
  }
}
