package graft

import org.apache.spark.sql.functions._

/** Error-bound assertions for the rows-only sketch entries — the
  * CMS bound lives in EventsSpec; these cover the other two. A
  * sketch without a measured bound is a number you can't act on:
  * each test pins the estimate against the exact answer computed on
  * the same data, at the accuracy the query's parameters promise.
  */
class SketchSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("a10 HLL estimate stays within the configured rsd of exact") {
    val approx = SparkEntry.queries("a10_approx_count_distinct")(spark, d)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = SparkEntry.queries("a10_count_distinct")(spark, d)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (k, ex) =>
      val rel = math.abs(approx(k) - ex).toDouble / ex
      // rsd 0.01 => ~1% standard error; 5% is a >4-sigma envelope
      assert(rel <= 0.05, s"$k: approx=${approx(k)} exact=$ex rel=$rel")
    }
  }

  test("approx quality gate keeps within 2% of the exact percentile gate") {
    val approx = SparkEntry.queries("txt_quality_filter_approx")(spark, d)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val exact = SparkEntry.queries("txt_quality_filter")(spark, d)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // same corpus, same 10th-percentile cut: the sketch may move the
    // threshold by at most a neighborhood of ties
    val diff = (approx -- exact).size + (exact -- approx).size
    assert(diff.toDouble / exact.size <= 0.02,
      s"gates diverge on $diff of ${exact.size} docs")
  }
}
