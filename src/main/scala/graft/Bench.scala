package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deterministic synthetic order for the streaming micro-bench: the
  * shape detectAlerts consumes plus an event-time column for the
  * session window. */
case class BenchOrder(order_id: Long, ts: java.sql.Timestamp,
                      customer_id: Long, total: Double, quantity: Int,
                      price: Double, product_name: String)

/** Perf surface: every registered query executed to completion through
  * the `noop` sink (computes every output row/column — `count()` would
  * let Catalyst prune the very expressions being measured), timed
  * per-query, one JSON line for the driver; plus one measured
  * streaming line (see benchStreaming).
  */
object Bench {

  /** Streaming-tier regression guard: one MemoryStream feeds TWO
    * concurrent micro-batch queries — the stateless detectAlerts
    * pipeline and a watermarked session_window aggregate (the
    * stateful tier) — both through the noop sink, `batches`
    * micro-batches of `rowsPerBatch` deterministic rows. Returns
    * (wall seconds, total input rows). rows/s covers both consumers,
    * so a regression in either the stateless codegen path or the
    * state-store path moves the metric.
    */
  def benchStreaming(spark: SparkSession, batches: Int = 12,
                     rowsPerBatch: Int = 50000): (Double, Long) = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlc = spark.sqlContext
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-bench-stream").toString
    val in = MemoryStream[BenchOrder]
    val det = graft.streaming.Alerts.detectAlerts(in.toDF())
      .writeStream.format("noop")
      .option("checkpointLocation", s"$ckpt/det")
      .outputMode("append").start()
    val sess = in.toDF()
      .withWatermark("ts", "1 minute")
      .groupBy(col("customer_id"),
        session_window(col("ts"), "5 minutes").as("sw"))
      .agg(count(lit(1)).as("n_orders"), sum(col("total")).as("session_total"))
      .writeStream.format("noop")
      .option("checkpointLocation", s"$ckpt/sess")
      // session windows stream in append mode only: finalized
      // sessions emit once their watermark passes
      .outputMode("append").start()
    val t0 = System.nanoTime()
    (1 to batches).foreach { b =>
      val data = (0 until rowsPerBatch).map { k =>
        val id = (b.toLong << 24) + k
        // event time advances batch over batch so the watermark keeps
        // closing sessions — state size stays bounded like production
        BenchOrder(id,
          new java.sql.Timestamp(1700000000000L + b * 60000L + (k % 60000)),
          id % 5000L, (id % 200L) * 100.0, (id % 70L).toInt, 99.0,
          s"p${id % 100L}")
      }
      in.addData(data: _*)
      det.processAllAvailable()
      sess.processAllAvailable()
    }
    val secs = (System.nanoTime() - t0) / 1e9
    det.stop(); sess.stop()
    (secs, batches.toLong * rowsPerBatch)
  }
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JIT/codegen/parquet-reader init, so query 1
    // doesn't carry ~5s of JVM cold start (fixed cheap query — Map
    // .head would pick an arbitrary, possibly expensive one)
    try SparkEntry.queries("a1_daily_summary")(spark, sfDir)
      .write.mode("overwrite").format("noop").save()
    catch { case _: Throwable => }
    // Optional comma-separated name filter for local iteration; the
    // driver leaves it unset and benches everything.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    // A failed query is recorded as a NEGATIVE duration and listed in
    // "failed", so the perf artifact can't pass off a crash as speed.
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
        }
      val secs = (System.nanoTime() - t0) / 1e9
      (name, if (ok) secs else -secs, ok)
    }
    // millisecond precision keeps the per-query map compact (the
    // driver captures a bounded tail of stdout)
    def r3(v: Double): Double = math.rint(v * 1000) / 1000
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => s"\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = r3(results.collect { case (_, v, true) => v }.sum)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    // Streaming tier (skipped under a local-iteration filter unless
    // asked for by name). Emitted before the final compact line so
    // both land inside the driver's bounded stdout tail.
    if (only.forall(_.contains("streaming"))) {
      val (ssecs, srows) =
        try benchStreaming(spark)
        catch { case e: Throwable =>
          System.err.println(s"[bench] streaming failed: ${e.getMessage}")
          (-1.0, 0L)
        }
      val rps = if (ssecs > 0) math.rint(srows / ssecs) else -1
      println(s"""{"metric":"streaming","value":$rps,"unit":"rows_per_sec","rows":$srows,"secs":${r3(ssecs)}}""")
    }
    // The driver keeps only the LAST ~2k chars of stdout; with 90+
    // queries the full line's head (metric/value) falls outside that
    // window (BENCH_r02 lost the total). A compact totals-only line
    // emitted LAST is always inside the window and always parseable.
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
