package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared mechanics for batch-partitioned persisted stores (the span
  * fp index, the LSH dedup index): the as-of partition cut and the
  * staged whole-table swap. These are SEMANTICS-BEARING devices —
  * crash-replay safety of every ingest loop rests on exactly this
  * definition of "seed + strictly-earlier batches" and exactly this
  * swap ordering — so they live in one place instead of per-store
  * copies that could drift.
  */
object StoreOps {

  /** Keep a `batch=<v>` partition iff it is the seed/compacted (any
    * non-numeric name: try_cast → NULL → coalesce true) or a numeric
    * id STRICTLY earlier than `batchId` — what makes replaying a
    * crashed batch read exactly what the first attempt read (no
    * self-matching, no time travel).
    */
  def asOfBatch(batchId: Long): Column =
    coalesce(expr("try_cast(batch AS BIGINT)") < lit(batchId), lit(true))

  /** Staged whole-table swap: write `df` to `<dst>._tmp`, delete the
    * live table, rename the stage in. Any previous attempt's stage is
    * deleted first, so the stage is complete whenever it exists
    * beside a missing `dst`. Crash states and their recovery:
    *  - before the live delete: `dst` still serves; replay restages.
    *  - between delete and rename: `dst` missing but the COMPLETE
    *    stage exists — readers must fall back to `<dst>._tmp` (the
    *    lshStoreTable labels read does), and the replayed swap
    *    finishes the rename.
    * The caller must materialize `df` BEFORE calling (an eager
    * checkpoint) if its plan reads `dst` — the delete races the read
    * otherwise.
    */
  def stagedSwap(s: SparkSession, dst: String, df: DataFrame): Unit = {
    val dp = new org.apache.hadoop.fs.Path(dst)
    val fs = dp.getFileSystem(s.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(dst + "._tmp")
    fs.delete(tmp, true)
    df.write.parquet(tmp.toString)
    fs.delete(dp, true)
    require(fs.rename(tmp, dp),
      s"staged swap rename failed: $tmp -> $dp (completed staging dir " +
        "left in place; readers fall back to it, and a re-run " +
        "finishes the swap)")
  }
}
