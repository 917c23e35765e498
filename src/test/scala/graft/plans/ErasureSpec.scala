package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Erasure contract: only partitions holding the subject are
  * rewritten (others stay byte-identical on disk), the subject's rows
  * are gone everywhere, a partition emptied by the erasure disappears
  * as a directory, the tombstone audit counts are exact, and the
  * operation is idempotent.
  */
class ErasureSpec extends SparkSpec {

  import spark.implicits._

  private def fileSet(dir: String): Set[String] = {
    val p = new java.io.File(dir)
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(p).filter(_.getName.endsWith(".parquet"))
      .map(f => f.getPath + ":" + f.length + ":" + f.lastModified).toSet
  }

  test("erase: targeted rewrite, emptied partition dropped, audit exact") {
    val dir = java.nio.file.Files.createTempDirectory("era").toString + "/t"
    // user 7 in 01-01 (with others) and alone in 01-02; absent from 01-03
    Seq(
      (7L, "a", "2025-01-01"), (8L, "b", "2025-01-01"),
      (9L, "c", "2025-01-01"),
      (7L, "d", "2025-01-02"), (7L, "e", "2025-01-02"),
      (5L, "f", "2025-01-03"), (6L, "g", "2025-01-03"))
      .toDF("user_id", "payload", "date")
      .write.partitionBy("date").parquet(dir)
    val untouchedBefore = fileSet(s"$dir/date=2025-01-03")

    val ts = Erasure.erase(spark, dir, "user_id", Seq(7L))
    assert(ts === Seq(
      Erasure.Tombstone("2025-01-01", 1L, 2L),
      Erasure.Tombstone("2025-01-02", 2L, 0L)))

    val after = spark.read.parquet(dir)
    assert(after.filter($"user_id" === 7L).count() === 0L)
    // non-subject rows all survive
    assert(after.select("user_id").as[Long].collect().sorted
      === Array(5L, 6L, 8L, 9L))
    // the all-subject partition is gone as a directory
    assert(!new java.io.File(s"$dir/date=2025-01-02").exists())
    // the partition the subject never touched was not rewritten
    assert(fileSet(s"$dir/date=2025-01-03") === untouchedBefore)

    // idempotent: second run finds nothing, audits nothing
    assert(Erasure.erase(spark, dir, "user_id", Seq(7L)).isEmpty)
    // guard: refuse an empty key list
    intercept[IllegalArgumentException](
      Erasure.erase(spark, dir, "user_id", Seq.empty))
  }
}
