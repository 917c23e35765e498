package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Retention contract: the dry-run report names exactly the expired
  * partitions, vacuum deletes those whole directories and nothing
  * else, survivors stay byte-readable, and the reaper is idempotent.
  */
class RetentionSpec extends SparkSpec {

  import spark.implicits._

  test("report, vacuum, survivors intact, idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("ret").toString + "/t"
    val days = Seq("2025-01-01", "2025-01-02", "2025-01-03", "2025-01-04")
    days.zipWithIndex.flatMap { case (d, i) =>
      (1 to (i + 1) * 10).map(v => (v.toLong, d))
    }.toDF("v", "date")
      .write.partitionBy("date").parquet(dir)

    // dry run: exactly the two pre-cutoff partitions, correct counts
    val report = Retention.expired(spark, dir, "2025-01-03")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(report.keySet === Set("2025-01-01", "2025-01-02"))
    assert(report.values.forall(_ >= 1L))

    // vacuum: victims gone, survivors byte-identical and readable
    val before = spark.read.parquet(dir)
      .filter(col("date") >= "2025-01-03").orderBy("date", "v").collect()
    val deleted = Retention.vacuum(spark, dir, "2025-01-03")
    assert(deleted.sorted === Seq("2025-01-01", "2025-01-02"))
    val after = spark.read.parquet(dir)
    assert(after.select("date").distinct().as[String].collect().sorted
      === Array("2025-01-03", "2025-01-04"))
    assert(after.orderBy("date", "v").collect() === before)

    // idempotent; and a future cutoff reports nothing left behind
    assert(Retention.vacuum(spark, dir, "2025-01-03").isEmpty)
    assert(Retention.expired(spark, dir, "2025-01-03").isEmpty)

    // guard: an empty cutoff must refuse, not empty the table
    intercept[IllegalArgumentException](Retention.vacuum(spark, dir, ""))
  }
}
