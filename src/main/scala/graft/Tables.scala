package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Table loaders over the driver-generated parquet testdata
  * (TESTDATA.md). Schemas are declared (not inferred) so that
  * streaming reads (`readStream` requires a schema) and tests share one
  * source of truth; batch reads still use the parquet footer, which is
  * asserted to be compatible at first use.
  *
  * At 100 TB these would be hive-partitioned directories; a plain
  * `spark.read.parquet(dir)` picks up partition discovery + pruning
  * automatically, so nothing here changes except the path.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String)    = table(s, d, "region")
  def nation(s: SparkSession, d: String)    = table(s, d, "nation")
  def customer(s: SparkSession, d: String)  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String)  = table(s, d, "supplier")
  def part(s: SparkSession, d: String)      = table(s, d, "part")
  def orders(s: SparkSession, d: String)    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String)  = table(s, d, "lineitem")
  /** `events.ts` arrives in whichever encoding the generator used:
    * TIMESTAMP(NANOS) (rejected by Spark's reader — read nanos as long
    * and floor-truncate to micros, exactly DuckDB's native behavior) or
    * TIMESTAMP(MICROS) without a UTC flag (read as TIMESTAMP_NTZ —
    * reinterpret the wall clock in the UTC session, which is also how
    * the DuckDB oracle treats it). Both normalize to the same
    * session-TZ TIMESTAMP, so every downstream operator and oracle
    * value lines up regardless of the writer.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(s, d, "events")
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts",
        org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case _: TimestampNTZType => df.withColumn("ts",
        org.apache.spark.sql.functions.col("ts").cast(TimestampType))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String) = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String) = table(s, d, "embeddings")

  /** Declared schema for the `events` stream table — the stand-in for
    * the reference's unwrapped CDC feed (SURVEY §2.1 S12). Used by
    * Structured Streaming file/Memory sources.
    */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Alert-stream schema mirroring the reference's Flink source DDL
    * (flink_job_alert_detection_simple.py:25-31): DECIMAL is already
    * downcast to double on the wire (SURVEY §1.2).
    */
  val alertInputSchema: StructType = StructType(Seq(
    StructField("order_id", StringType),
    StructField("total", DoubleType),
    StructField("quantity", IntegerType),
    StructField("price", DoubleType),
    StructField("customer_id", StringType),
    StructField("product_name", StringType)))
}
