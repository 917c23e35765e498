package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The value-grain exact-percentile cut device (first built for
  * p20_winsorize, now shared): cutpoints come from a cumulative
  * count over the DISTINCT-value relation, so the window input is
  * |distinct values| — never |rows| — and the tie rule (min value
  * whose cumulative count reaches ceil(p·n)) is engine-exact
  * integer arithmetic. Every consumer mirrors the same CTE shape in
  * its DuckDB oracle; keeping the Spark side in one place keeps the
  * frame choice and ceil-rank rule from drifting between copies.
  */
object Stats {

  /** One row of exact discrete percentile cutpoints of column `v`:
    * for each (p, name), `name` = min v with cum-count ≥ ceil(p·n).
    *
    * PRECONDITION — bounded distinct cardinality of `v` (a rounded
    * score, a day, whole currency units, ...): the cumulative window
    * below is UNPARTITIONED, so the post-groupBy sort runs on one
    * task over |distinct v| rows. That is the designed shape — the
    * groupBy collapses the data-sized input first — but a caller
    * passing a row-grain column (raw doubles, ids) would funnel the
    * whole relation through one partition. Pre-bucket such columns
    * first, as bi_rfm_segments does with its mon_b monetary bucket
    * (Commerce.rfm) and bi_abc_analysis with whole-unit revenue.
    * Spark cannot assert cardinality at plan time, so this contract
    * is documentation + the consuming queries' construction.
    */
  def valueCuts(df: DataFrame, v: String,
                ps: Seq[(Double, String)]): DataFrame = {
    val vals = df.groupBy(col(v)).agg(count(lit(1)).as("cnt"))
    val wcum = Window.orderBy(col(v))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = vals
      .withColumn("cum", sum(col("cnt")).over(wcum))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(lit(1))))
    val aggs = ps.map { case (p, name) =>
      min(when(col("cum") >= expr(s"CAST(ceil($p * n) AS BIGINT)"),
        col(v))).as(name)
    }
    cum.agg(aggs.head, aggs.tail: _*)
  }

  /** Quartile cutpoints named `<v>_q1/_q2/_q3`. */
  def quartileCuts(df: DataFrame, v: String): DataFrame =
    valueCuts(df, v,
      Seq(0.25 -> s"${v}_q1", 0.50 -> s"${v}_q2", 0.75 -> s"${v}_q3"))

  /** Two-phase dense index: (key, idx) with idx = 0-based global rank
    * of `key` over the (assumed distinct) input — the SAME numbering
    * `row_number().over(Window.orderBy(key)) - 1` produces, WITHOUT
    * funneling the whole relation through one task. Phase 1 range-
    * partitions by key (ordered, non-overlapping ranges) and counts
    * rows per partition; phase 2 cumulates those counts into prefix
    * offsets over the PID grain — bounded by the partition count, a
    * cluster config constant, never by data — and adds the broadcast
    * offset to the within-partition rank. Range boundaries come from
    * sampling, but any boundary choice yields the identical global
    * rank, so the output is deterministic even though the partition
    * sizes are not. localCheckpoint pins one pid assignment for the
    * two consumers (counts + rank) of the partitioned relation.
    */
  def denseIndex(distinctKeys: DataFrame, key: String): DataFrame = {
    val parts = distinctKeys.repartitionByRange(col(key))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint(false)
    val wOff = Window.orderBy(col("pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = parts.groupBy(col("pid")).agg(count(lit(1)).as("cnt"))
      .withColumn("off", coalesce(sum(col("cnt")).over(wOff), lit(0L)))
      .select(col("pid"), col("off"))
    val wIn = Window.partitionBy(col("pid")).orderBy(col(key))
    parts.join(broadcast(offs), Seq("pid"))
      .withColumn("idx", col("off") + row_number().over(wIn) - lit(1L))
      .select(col(key), col("idx"))
  }
}
