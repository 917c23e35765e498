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
}
