package graft

import org.apache.spark.sql.functions._

/** OPS: single-pass pipeline metrics via Dataset.observe — the
  * production device for "how many rows did the gate keep" WITHOUT a
  * second scan: the observation rides the same physical plan as the
  * action, accumulated on executors during the one pass. At 100 TB a
  * metrics pass that re-scans the input doubles the job; observe
  * makes the audit free.
  */
class ObserveSpec extends SparkSpec {

  import spark.implicits._

  test("gate metrics ride the action's single pass") {
    val src = (0 until 1000).map(i => (i.toLong, i % 4 != 0))
      .toDF("id", "keep")
    val observed = src.observe("gate",
      count(lit(1)).as("n_in"),
      sum(col("keep").cast("long")).as("n_kept"),
      max(col("id")).as("max_id"))
    val out = observed.filter(col("keep"))
    // ONE action on the dataset's own execution (count() would build
    // a separate aggregate execution whose metrics live elsewhere);
    // metrics reflect the full input though the action only saw the
    // kept rows
    assert(out.collect().length === 750)
    val m = out.queryExecution.observedMetrics("gate")
    assert(m.getAs[Long]("n_in") === 1000L)
    assert(m.getAs[Long]("n_kept") === 750L)
    assert(m.getAs[Long]("max_id") === 999L)
  }

  test("streaming observe: per-batch metrics in the progress feed") {
    implicit val sc = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Long]
    val q = in.toDS().toDF("v")
      .observe("ingest", count(lit(1)).as("n"),
        sum(col("v")).as("total"))
      .writeStream.format("memory").queryName("obs_out")
      .outputMode("append").start()
    in.addData(1L, 2L, 3L); q.processAllAvailable()
    in.addData(10L); q.processAllAvailable()
    val metrics = q.recentProgress.toSeq
      .flatMap(p => Option(p.observedMetrics.get("ingest")))
      .map(r => (r.getAs[Long]("n"), r.getAs[Long]("total")))
    q.stop()
    assert(metrics.contains((3L, 6L)))
    assert(metrics.contains((1L, 10L)))
  }
}
