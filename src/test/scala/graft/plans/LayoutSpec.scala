package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Range layout: files carry disjoint key ranges (the property data
  * skipping rests on), and the full dataset round-trips.
  */
class LayoutSpec extends SparkSpec {

  import spark.implicits._

  test("range layout produces disjoint per-file key ranges") {
    val dir = java.nio.file.Files.createTempDirectory("layout").toString + "/t"
    val df = (1L to 10000L).map(i => (i * 37 % 10007, s"v$i"))
      .toDF("k", "v")
    Layout.writeRangeLayout(df, dir, "k", nFiles = 8)

    val ranges = Layout.fileRanges(spark, dir, "k")
      .select("k_min", "k_max", "n_rows")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(ranges.length === 8)
    assert(ranges.map(_._3).sum === 10000L)
    // disjoint and ordered: every file's min exceeds the previous max
    ranges.sliding(2).foreach { case Array(a, b) =>
      assert(b._1 > a._2, s"overlapping file ranges: $a vs $b")
    }
    // content survives the rewrite
    assert(spark.read.parquet(dir).agg(sum("k")).as[Long].head() ===
      df.agg(sum("k")).as[Long].head())
  }
}
