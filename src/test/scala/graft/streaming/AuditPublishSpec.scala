package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** WAP gate: a clean producer batch publishes, a corrupted one is
  * quarantined whole, the audit log records every (batch, check)
  * verdict, and the published table never contains a poisoned row.
  */
class AuditPublishSpec extends SparkSpec {

  test("clean batch publishes; corrupted batch quarantines whole") {
    val work = java.nio.file.Files.createTempDirectory("wap").toString
    val orders = graft.Tables.orders(spark, "/root/testdata/sf0.001")
    val clean = orders.limit(200).localCheckpoint()
    // corrupt ONE row: a null custkey poisons the whole producer batch
    val minKey = clean.agg(min("o_orderkey")).head.getLong(0)
    val bad = clean
      .withColumn("o_custkey",
        when(col("o_orderkey") === minKey, lit(null: java.lang.Long))
          .otherwise(col("o_custkey")))
      .localCheckpoint()

    def drainOne(): Unit = {
      val q = AuditPublish.run(
        spark.readStream.schema(clean.schema).parquet(s"$work/feed"),
        s"$work/pub", s"$work/quar", s"$work/audit", s"$work/ckpt")
      q.processAllAvailable(); q.stop()
    }

    clean.write.mode("append").parquet(s"$work/feed")
    drainOne()
    bad.write.mode("append").parquet(s"$work/feed")
    drainOne()

    // published table: exactly the clean batch, no poisoned row
    val pub = spark.read.parquet(s"$work/pub")
    assert(pub.count() === clean.count())
    assert(pub.filter(col("o_custkey").isNull).count() === 0)
    // quarantine: the corrupted batch, whole
    val quar = spark.read.parquet(s"$work/quar")
    assert(quar.count() === bad.count())
    assert(quar.filter(col("o_custkey").isNull).count() === 1)
    // audit log: 6 checks x 2 batches, verdicts per batch
    val audit = spark.read.parquet(s"$work/audit")
    assert(audit.count() === 12)
    val verdicts = audit.groupBy("batch_id")
      .agg(min("published").as("p"), count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(verdicts.values.map(_._2).forall(_ === 6L))
    assert(verdicts.values.map(_._1).toSeq.sorted === Seq(0L, 1L))
    // the failing batch's audit names the broken constraint
    val failed = audit.filter(col("published") === 0 && col("pass") === 0)
      .select("check_name").collect().map(_.getString(0)).toSet
    assert(failed === Set("completeness_custkey"))
  }

  test("empty batch is a no-op pass") {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      graft.Tables.orders(spark, "/root/testdata/sf0.001").schema)
    val work = java.nio.file.Files.createTempDirectory("wap0").toString
    assert(AuditPublish.processBatch(empty, 0L,
      s"$work/pub", s"$work/quar", s"$work/audit"))
    assert(!new java.io.File(s"$work/audit").exists())
  }
}
