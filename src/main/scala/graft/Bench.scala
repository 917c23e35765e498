package graft
import org.apache.spark.sql.SparkSession
/** Perf surface: every registered query executed to completion through
  * the `noop` sink (computes every output row/column — `count()` would
  * let Catalyst prune the very expressions being measured), timed
  * per-query, one JSON line for the driver.
  */
object Bench {
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
    // The driver keeps only the LAST ~2k chars of stdout; with 90+
    // queries the full line's head (metric/value) falls outside that
    // window (BENCH_r02 lost the total). A compact totals-only line
    // emitted LAST is always inside the window and always parseable.
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
