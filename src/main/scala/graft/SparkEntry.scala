package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All operators live in graft.operators.* / graft.streaming.* as
  * composable transforms; this object is the flat registry the
  * driver's Verify/Bench harness consumes.
  */
object SparkEntry {

  /** Every implemented operator (SURVEY §2 inventory + the LLM-data
    * pipeline extensions). Order: relational core, ML/CF, text,
    * dedup, similarity, streaming-as-batch, multimodal.
    */
  val all: Seq[QueryDef] =
    operators.Relational.defs ++
      operators.Recommend.defs ++
      operators.TextAnalysis.defs ++
      operators.Dedup.defs ++
      operators.Similarity.defs ++
      operators.StreamingBatch.defs ++
      operators.Multimodal.defs ++
      operators.Temporal.defs ++
      operators.Events.defs ++
      operators.Graph.defs ++
      operators.Commerce.defs ++
      operators.Quality.defs ++
      operators.TopK.defs ++
      plans.MvRewrite.defs

  /** Flagship: the reference's daily medallion slice
    * (extract S1 → clean P2–P6 → daily summary A1) on sf0.001;
    * driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val fact = Tables.lineitem(spark, d).select(
      col("l_orderkey").as("order_id"),
      col("l_extendedprice").as("price"),
      col("l_quantity").as("quantity"),
      col("l_returnflag").as("status"),
      to_date(col("l_shipdate")).as("order_date"))
    operators.Cleaning.cleanOrders(fact)
      .groupBy(col("order_date"))
      .agg(count(lit(1)).as("n"),
        functions.Functions.dsum(col("total")).as("revenue"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (driver records a weaker rows-only check).
    */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
