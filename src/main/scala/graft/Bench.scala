package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Perf surface: every registered query executed to completion through
  * the `noop` sink (computes every output row/column — `count()` would
  * let Catalyst prune the very expressions being measured), timed
  * per-query, one JSON line for the driver; plus one measured
  * streaming line (see benchStreaming).
  */
object Bench {

  /** Streaming-tier regression guard: a parquet FILE source (one
    * staged file per micro-batch, written before the clock starts,
    * so the bench measures the engine — not the driver serializing
    * 600 k rows into task binaries, which is what a MemoryStream
    * feed measured) drives TWO concurrent micro-batch queries — the
    * stateless detectAlerts pipeline and a watermarked
    * session_window aggregate (the stateful tier) — both through the
    * noop sink. Returns (staging seconds, stream seconds, total input
    * rows) — staged-feed writing is timed SEPARATELY from the stream
    * so the artifact distinguishes a slow box (both inflate) from a
    * streaming-engine regression (only stream_secs moves); rows/s is
    * computed over stream seconds only. The rate covers both
    * consumers, so a regression in either the stateless codegen path
    * or the state-store path moves the metric.
    */
  def benchStreaming(spark: SparkSession, batches: Int = 12,
                     rowsPerBatch: Int = 50000): (Double, Double, Long) = {
    val tStage0 = System.nanoTime()
    val work = java.nio.file.Files
      .createTempDirectory("graft-bench-stream").toString
    (1 to batches).foreach { b =>
      // generated ON the executors (spark.range + column exprs — a
      // local Seq would ship the rows inside the task binary, the
      // exact overhead this file feed exists to avoid); event time
      // advances batch over batch so the watermark keeps closing
      // sessions — state size stays bounded like production
      val oid = lit(b.toLong << 24) + col("id")
      spark.range(rowsPerBatch.toLong).select(
          oid.as("order_id"),
          timestamp_millis(lit(1700000000000L + b * 60000L)
            + pmod(col("id"), lit(60000L))).as("ts"),
          pmod(oid, lit(5000L)).as("customer_id"),
          (pmod(oid, lit(200L)) * 100.0).as("total"),
          pmod(oid, lit(70L)).cast("int").as("quantity"),
          lit(99.0).as("price"),
          concat(lit("p"), pmod(oid, lit(100L))).as("product_name"))
        // one file per staged batch → one micro-batch per file below
        .coalesce(1).write.mode("append").parquet(s"$work/feed")
    }
    val schema = spark.read.parquet(s"$work/feed").schema
    def in = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$work/feed")
    val t0 = System.nanoTime()
    val stageSecs = (t0 - tStage0) / 1e9
    val det = graft.streaming.Alerts.detectAlerts(in)
      .writeStream.format("noop")
      .option("checkpointLocation", s"$work/det")
      .outputMode("append").start()
    val sess = in
      .withWatermark("ts", "1 minute")
      .groupBy(col("customer_id"),
        session_window(col("ts"), "5 minutes").as("sw"))
      .agg(count(lit(1)).as("n_orders"), sum(col("total")).as("session_total"))
      .writeStream.format("noop")
      .option("checkpointLocation", s"$work/sess")
      // session windows stream in append mode only: finalized
      // sessions emit once their watermark passes
      .outputMode("append").start()
    det.processAllAvailable()
    sess.processAllAvailable()
    val secs = (System.nanoTime() - t0) / 1e9
    det.stop(); sess.stop()
    (stageSecs, secs, batches.toLong * rowsPerBatch)
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
      // snapshot FIRST: only RDDs the query itself registered get
      // released — blanket unpersist would also destroy any future
      // cross-query cached state (an unpersisted shared
      // localCheckpoint is unrecoverable: "checkpoint block not
      // found"); today's cross-query stores are parquet paths, but
      // the loop must not depend on that staying true
      val before = spark.sparkContext.getPersistentRDDs.keySet
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
        }
      val secs = (System.nanoTime() - t0) / 1e9
      // Release the query's localCheckpoint blocks: they are
      // intra-query state, but the RDDs stay registered until the
      // ContextCleaner happens to GC them — across ~250 queries the
      // debris squeezes execution memory and inflates the
      // shuffle-heavy tail 3-6x (measured: ml_recommendations_
      // user_based 31s in-run vs 9s isolated before this).
      spark.sparkContext.getPersistentRDDs
        .foreach { case (id, rdd) =>
          if (!before.contains(id)) rdd.unpersist(blocking = false) }
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
    val streamLine = if (only.forall(_.contains("streaming"))) {
      val (stsecs, ssecs, srows) =
        try benchStreaming(spark)
        catch { case e: Throwable =>
          System.err.println(s"[bench] streaming failed: ${e.getMessage}")
          (-1.0, -1.0, 0L)
        }
      val rps = if (ssecs > 0) math.rint(srows / ssecs) else -1
      val line = s"""{"metric":"streaming","value":$rps,"unit":"rows_per_sec","rows":$srows,"secs":${r3(ssecs)},"stage_secs":${r3(stsecs)}}"""
      println(line)
      Some(line)
    } else None
    // The driver keeps only the LAST ~2k chars of stdout; with 90+
    // queries the full line's head (metric/value) falls outside that
    // window (BENCH_r02 lost the total). A compact totals-only line
    // emitted LAST is always inside the window and always parseable.
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"failed":$failed,"sf":"$sfDir"}""")
    // The bounded tail also swallows the per-query map, so the FULL
    // result set is persisted to the repo as an artifact — hot-tail
    // attribution next round needs the artifact, not the stdout.
    // Skipped under a local-iteration filter (partial runs would
    // clobber the round's full map).
    if (only.isEmpty) {
      val detail = new StringBuilder
      detail ++= s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","n_queries":${results.size},"""
      streamLine.foreach(l => detail ++= s""""streaming":$l,""")
      detail ++= s""""failed":$failed,"queries":$qs}"""
      // scale smokes get their own artifact — they must not clobber
      // the round's sf0.1 map; the name derives from the basename so
      // a future sf10 run lands in BENCH_sf10.json, not sf1's
      val base = new java.io.File(sfDir).getName
      val detailPath =
        if (base == "sf0.1" || base.startsWith("sf0.0")) "BENCH_detail.json"
        else s"BENCH_$base.json"
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(detailPath), detail.toString)
    }
    spark.stop()
  }
}
