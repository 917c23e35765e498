package graft.plans

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** S25: re-aggregatable sketch store — the pre-aggregation tier that
  * makes "distinct users over an arbitrary date range" an
  * O(partitions) read instead of an O(events) scan. Each day's
  * activity collapses to one Datasketches HLL sketch per
  * (date, event_type) (a few KB of binary, SPARK-16484 surface);
  * later, ANY date range's distinct-user estimate is the union-merge
  * of the covered sketches — mergeability is the whole point of the
  * sketch (exact distinct counts cannot pre-aggregate: the union of
  * per-day counts over-counts returning users).
  *
  * Determinism: the HLL register array is a pure function of the
  * hashed value set and the union is register-wise max, so build +
  * merge-estimate reproduce bit-identical estimates on any
  * partitioning or merge order (spec-asserted, including
  * merge == direct-sketch on the same rows).
  *
  * Scale: the store is (days × types) rows; a year of a 10⁹-user
  * service is ~365·|types| sketches of ~4 KB at lgK 12 — a dashboard
  * reads megabytes, not the 100 TB event log. The same shape serves
  * any hll_union_agg-able rollup (weekly, per-source, sliding).
  */
object SketchStore {

  /** One sketch per (date, event_type) of distinct user_ids, plus the
    * raw row count; date-partitioned so range reads prune.
    */
  def buildDaily(events: DataFrame, dir: String): Unit =
    events.select(to_date(col("ts")).cast("string").as("date"),
        col("event_type"), col("user_id"))
      .groupBy(col("date"), col("event_type"))
      .agg(expr("hll_sketch_agg(user_id)").as("sketch"),
        count(lit(1)).as("n_rows"))
      .write.mode(SaveMode.Overwrite).partitionBy("date").parquet(dir)

  /** Distinct-user estimate per event_type over [from, to] — reads
    * only the store (partition-pruned), never the event log.
    */
  def estimateRange(spark: SparkSession, dir: String,
                    from: String, to: String): DataFrame =
    spark.read.parquet(dir)
      .filter(col("date") >= from && col("date") <= to)
      .groupBy(col("event_type"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sketch))")
        .as("approx_users"),
        sum(col("n_rows")).as("n_rows"))
}
