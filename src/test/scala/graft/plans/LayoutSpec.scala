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

  test("z-order layout: a y-selective box query skips most files; " +
    "the 1-D x layout cannot") {
    val base = java.nio.file.Files.createTempDirectory("zorder").toString
    val grid = (for { x <- 0 until 128; y <- 0 until 128 }
      yield (x.toLong, y.toLong)).toDF("x", "y")
    Layout.writeRangeLayout(grid, s"$base/rx", "x", nFiles = 16)
    Layout.writeZOrderLayout(grid, s"$base/z", "x", "y", nFiles = 16)

    def boxes(dir: String) = spark.read.parquet(dir)
      .select(input_file_name().as("f"), col("x"), col("y"))
      .groupBy("f")
      .agg(min("x").as("x0"), max("x").as("x1"),
        min("y").as("y0"), max("y").as("y1"), count(lit(1)).as("n"))
      .as[(String, Long, Long, Long, Long, Long)].collect()

    val rx = boxes(s"$base/rx")
    val z = boxes(s"$base/z")
    assert(rx.map(_._6).sum === 128L * 128 && z.map(_._6).sum === 128L * 128)
    // box query: all x, y in [0, 15] — an eighth of the y axis
    def touched(bs: Array[(String, Long, Long, Long, Long, Long)]) =
      bs.count(b => b._4 <= 15 && b._5 >= 0)
    // the x-only layout stores every y in every file → zero skipping
    assert(touched(rx) === rx.length)
    // z-order boxes are 2-D-compact → most files skip
    assert(touched(z) <= z.length / 2,
      s"z-order touched ${touched(z)} of ${z.length} files")
    // content survives
    assert(spark.read.parquet(s"$base/z").agg(sum("x"), sum("y"))
      .as[(Long, Long)].head() ===
      grid.agg(sum("x"), sum("y")).as[(Long, Long)].head())
  }

  test("compaction: many small files → sized output, content identical") {
    val dir = java.nio.file.Files.createTempDirectory("compact").toString + "/t"
    val df = (1L to 5000L).toDF("k")
    df.repartition(64).write.parquet(dir) // the streaming-sink anti-pattern
    val before = spark.read.parquet(dir)
      .select(input_file_name()).distinct().count()
    assert(before === 64)
    val (nBefore, nAfter) = Layout.compact(spark, dir, targetBytes = 64 * 1024)
    assert(nBefore === 64 && nAfter < 64 && nAfter >= 1)
    val back = spark.read.parquet(dir)
    assert(back.select(input_file_name()).distinct().count() === nAfter)
    assert(back.agg(sum("k")).as[Long].head() === 5000L * 5001 / 2)
    assert(back.count() === 5000)
  }

  test("schema drift: widened day merges under mergeSchema, nulls backfill") {
    // day 1 writes (id, price); day 2 adds a discount column — the
    // normal life of a 100 TB lake. mergeSchema must union the
    // schemas and old rows must read as null, not fail the scan.
    val root = java.nio.file.Files.createTempDirectory("drift").toString
    Seq((1L, 10.0), (2L, 20.0)).toDF("id", "price")
      .write.parquet(s"$root/day=2024-01-01")
    Seq((3L, 30.0, 0.1)).toDF("id", "price", "discount")
      .write.parquet(s"$root/day=2024-01-02")
    val merged = spark.read.option("mergeSchema", "true").parquet(root)
    assert(merged.columns.sorted.toSeq === Seq("day", "discount", "id", "price"))
    val rows = merged.select("id", "discount")
      .as[(Long, Option[Double])].collect().sortBy(_._1)
    assert(rows.toSeq === Seq((1L, None), (2L, None), (3L, Some(0.1))))
    // and the un-merged default still reads (first-file schema) — the
    // cheap path stays available when the reader doesn't need drift
    assert(spark.read.parquet(root).count() === 3)
  }

  test("layout report: small files counted, compaction heals the report") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("lh").toString + "/t"
    (0 until 2000).map(i => (i.toLong, s"row-$i"))
      .toDF("id", "s").repartition(16).write.parquet(dir)
    val target = 64L * 1024
    val before = Layout.layoutReport(spark, dir, target)
    assert(before.n_files === 16L)
    assert(before.total_bytes ===
      before.n_files * before.avg_bytes +
        before.total_bytes % before.n_files)
    assert(before.min_bytes <= before.max_bytes)
    // 16 tiny files against a 64 KiB target: all small, report says so
    assert(before.n_small === 16L)
    assert(before.small_share_ppm === 1000000L)
    assert(before.target_files < 16L)
    // compaction to the same target heals the small-file pressure
    Layout.compact(spark, dir, target)
    val after = Layout.layoutReport(spark, dir, target)
    assert(after.n_files === before.target_files)
    assert(after.total_bytes > 0)
    assert(spark.read.parquet(dir).count() === 2000L)
    // empty dir: all-zero report, no crash
    val empty = java.nio.file.Files.createTempDirectory("lh0").toString
    assert(Layout.layoutReport(spark, empty, target)
      === Layout.LayoutHealth(0, 0, 0, 0, 0, 0, 0, 0))
  }
}
