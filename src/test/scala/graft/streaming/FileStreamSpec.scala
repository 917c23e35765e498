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
}
