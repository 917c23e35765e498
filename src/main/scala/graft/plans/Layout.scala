package graft.plans

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Physical file layout for data skipping — the lakehouse write-side
  * optimization the read-side pruning assertions (PlanSpec) depend
  * on: range-repartition + sort-within-partitions on the filter key
  * gives every output file a DISJOINT min/max range, so a point or
  * range predicate touches one file's row groups instead of all of
  * them. On a 100 TB table this is the difference between a scan and
  * a seek; the same write shape is what Delta OPTIMIZE ZORDER does
  * for one dimension.
  */
object Layout {

  /** Write `df` with `nFiles` disjoint ranges of `key` (global range
    * partitioning, then a within-file sort so row groups are ordered
    * too).
    */
  def writeRangeLayout(df: DataFrame, dir: String, key: String,
                       nFiles: Int): Unit =
    df.repartitionByRange(nFiles, col(key))
      .sortWithinPartitions(col(key))
      .write.mode(SaveMode.Overwrite).parquet(dir)

  /** Per-file min/max of `key` — the skipping metadata a reader (or a
    * spec) inspects to prove the layout holds.
    */
  def fileRanges(spark: SparkSession, dir: String, key: String): DataFrame =
    spark.read.parquet(dir)
      .select(input_file_name().as("file"), col(key).as("k"))
      .groupBy(col("file"))
      .agg(min(col("k")).as("k_min"), max(col("k")).as("k_max"),
        count(lit(1)).as("n_rows"))

  /** Small-file compaction — the maintenance pass every streaming or
    * micro-batch sink needs: thousands of KB-sized files per day ruin
    * scan throughput (one task + one open per file) and overwhelm the
    * driver's file index at 100 TB. Rewrites `dir` into
    * ceil(bytes / targetBytes) files via coalesce (no shuffle — file
    * stitching, not repartitioning) and swaps directories only after
    * the rewrite succeeds (crash-safe: the original survives any
    * failure before the final rename).
    *
    * Returns (filesBefore, filesAfter).
    */
  def compact(spark: SparkSession, dir: String,
              targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(path)
      .filter(f => f.getPath.getName.endsWith(".parquet"))
    val totalBytes = parts.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val tmp = new org.apache.hadoop.fs.Path(dir + ".compact-tmp")
    spark.read.parquet(dir).coalesce(nOut)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val bak = new org.apache.hadoop.fs.Path(dir + ".compact-old")
    fs.rename(path, bak)
    fs.rename(tmp, path)
    fs.delete(bak, true)
    (parts.length, nOut)
  }
}
