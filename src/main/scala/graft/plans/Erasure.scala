package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** S24: subject-key erasure (GDPR art. 17 / CCPA delete) over a
  * date-partitioned parquet lake — the targeted, key-grain complement
  * to Retention's whole-partition reaper. Copy-on-write like
  * Medallion.upsertPartitioned: a column-pruned locate pass finds the
  * partitions that actually hold the subject's rows, ONLY those are
  * rewritten with the keys anti-filtered out, and a partition left
  * empty by the erasure is dropped as a directory (dynamic overwrite
  * cannot rewrite a partition it has no rows for). Untouched
  * partitions are never read or written — on a 100 TB table the cost
  * is (one two-column scan) + (rewrite of the partitions one subject
  * appears in), not a table rewrite.
  *
  * Every run returns a tombstone audit (partition, rows removed, rows
  * kept) — the record a DPO files as proof of erasure. Idempotent: a
  * second run for the same keys finds zero rows and rewrites nothing.
  * Refuses an empty key list rather than silently auditing nothing.
  */
object Erasure {

  final case class Tombstone(date: String, n_removed: Long, n_kept: Long)

  def erase(spark: SparkSession, dir: String, keyCol: String,
            keys: Seq[Long]): Seq[Tombstone] = {
    require(keys.nonEmpty, "refusing to erase with an empty key list")
    import spark.implicits._

    // Locate pass: column-pruned to (key, date); partition pruning is
    // not possible (the subject may appear anywhere), but only two
    // columns are read and the aggregate is partition-grain.
    val touched = spark.read.parquet(dir)
      .filter(col(keyCol).isin(keys: _*))
      .groupBy(col("date")).agg(count(lit(1)).as("n_removed"))
      .as[(String, Long)].collect().toSeq.sortBy(_._1)
    if (touched.isEmpty) return Seq.empty

    val days = touched.map(_._1)
    val remaining = spark.read.parquet(dir)
      .filter(col("date").isin(days: _*))
      .filter(!col(keyCol).isin(keys: _*))
      .localCheckpoint() // materialize off the files being replaced
    val kept = remaining.groupBy(col("date"))
      .agg(count(lit(1)).as("n_kept"))
      .as[(String, Long)].collect().toMap

    remaining.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("date").parquet(dir)

    // A partition whose every row belonged to the subject has no
    // remaining rows, so dynamic overwrite left its old files in
    // place — drop the whole directory (the Retention device).
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    days.filterNot(kept.contains).foreach { d =>
      fs.delete(new Path(dir, s"date=$d"), true)
    }

    touched.map { case (d, rm) => Tombstone(d, rm, kept.getOrElse(d, 0L)) }
  }
}
