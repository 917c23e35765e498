package graft.streaming

import graft.SparkSpec
import graft.operators.StreamingBatch
import org.apache.spark.sql.functions._

/** End-to-end file-source streaming: the alert pipeline consuming a
  * parquet directory as an unbounded source (the lake-tail analog of
  * the Kafka feed) into a parquet sink with checkpointing, asserted
  * equal to the batch run of the SAME transform — the one-codepath
  * property under a second source type.
  */
class FileStreamSpec extends SparkSpec {

  test("ST1 over a file source equals the batch run, exactly-once") {
    val d = "/root/testdata/sf0.001"
    val work = java.nio.file.Files.createTempDirectory("fs").toString
    // stage the order-shaped feed as a plain parquet dir (the events
    // table needs the nanos→micros normalization from Tables.events,
    // so streaming reads the staged form, as a lake consumer would)
    val staged = StreamingBatch.eventsAsOrders(spark, d)
    staged.write.mode("overwrite").parquet(s"$work/feed")

    val stream = spark.readStream
      .schema(staged.schema)
      .option("maxFilesPerTrigger", "2") // several micro-batches
      .parquet(s"$work/feed")
    val q = Alerts.detectAlerts(stream)
      .writeStream.format("parquet")
      .option("path", s"$work/alerts")
      .option("checkpointLocation", s"$work/ckpt")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.read.parquet(s"$work/alerts")
    val batch = Alerts.detectAlerts(staged)
    assert(streamed.count() === batch.count())
    assert(streamed.select("order_id", "alert_type").except(
      batch.select("order_id", "alert_type")).isEmpty)
    // restarting from the same checkpoint reprocesses nothing
    val q2 = Alerts.detectAlerts(
      spark.readStream.schema(staged.schema).parquet(s"$work/feed"))
      .writeStream.format("parquet")
      .option("path", s"$work/alerts")
      .option("checkpointLocation", s"$work/ckpt")
      .outputMode("append").start()
    q2.processAllAvailable()
    q2.stop()
    assert(spark.read.parquet(s"$work/alerts").count() === batch.count())
  }

  test("AvailableNow backfill drains in bounded batches, then only the delta") {
    import org.apache.spark.sql.streaming.Trigger
    val d = "/root/testdata/sf0.001"
    val work = java.nio.file.Files.createTempDirectory("an").toString
    val staged = StreamingBatch.eventsAsOrders(spark, d)
    val Array(first, rest) = staged.randomSplit(Array(0.7, 0.3), seed = 42)
    first.repartition(6).write.mode("overwrite").parquet(s"$work/feed")

    def drain(): Long = {
      val q = Alerts.detectAlerts(
        spark.readStream.schema(staged.schema)
          .option("maxFilesPerTrigger", "2") // catch-up stays bounded
          .parquet(s"$work/feed"))
        .writeStream.format("parquet")
        .option("path", s"$work/alerts")
        .option("checkpointLocation", s"$work/ckpt")
        .outputMode("append")
        .trigger(Trigger.AvailableNow()) // terminates once drained
        .start()
      assert(q.awaitTermination(180000), "AvailableNow did not terminate")
      q.recentProgress.map(_.numInputRows).sum
    }

    val in1 = drain() // backfill: 6 staged files -> >=3 bounded batches
    assert(in1 === first.count(), "backfill missed rows")
    val alerts1 = spark.read.parquet(s"$work/alerts").count()
    assert(alerts1 === Alerts.detectAlerts(first).count())

    // late files land; the next catch-up run reads ONLY the delta
    rest.repartition(2).write.mode("append").parquet(s"$work/feed")
    val in2 = drain()
    assert(in2 === rest.count(), s"delta run reread history: $in2")
    assert(spark.read.parquet(s"$work/alerts").count() ===
      Alerts.detectAlerts(staged).count())
  }
}
