package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC source/sink (SURVEY §2.1 S16, §2.1 S1/S2's native form).
  *
  * The reference seeds its Postgres source with 1000-row chunked
  * pandas `to_sql` (reference scripts/setup_source_db.py:263-270) and
  * reads it back with filtered SQL pushed to the database (reference
  * dags/daily_pipeline.py:54-66). The Spark-native shape of both:
  *
  *  - write: `df.write.jdbc` — every PARTITION streams its rows over
  *    its own connection in `batchsize`-row INSERT batches, so the
  *    reference's single-process chunk loop becomes N parallel
  *    writers; at cluster scale write throughput is the partition
  *    count × per-connection batch rate, driver does no row work;
  *  - read: `spark.read.jdbc` with a partition column + bounds —
  *    N executors each issue a bounded-range query (the pushed-down
  *    WHERE), so ingest parallelism matches the cluster, not one
  *    cursor.
  *
  * Proven against embedded Derby (in the Spark distribution — no new
  * dependency) in JdbcSpec; the container has no network database, so
  * Derby's in-memory engine stands in for Postgres exactly as
  * MemoryStream stands in for Kafka.
  */
object Jdbc {

  /** S16: chunked parallel insert. `numPartitions` concurrent
    * connections, `batchSize` rows per JDBC executeBatch — the knobs
    * that replace the reference's `chunksize=1000`.
    */
  /** `columnTypes` = Spark's createTableColumnTypes DDL fragment
    * (e.g. "status VARCHAR(10)") for dialects whose default string
    * mapping is non-comparable (Derby uses CLOB, which rejects
    * predicates — the same knob a Postgres deployment uses to pick
    * TEXT vs VARCHAR).
    */
  def writeTable(df: DataFrame, url: String, table: String,
                 numPartitions: Int = 4, batchSize: Int = 1000,
                 mode: String = "error",
                 columnTypes: Option[String] = None): Unit = {
    val w = df.repartition(numPartitions)
      .write.mode(mode)
      .option("batchsize", batchSize.toString)
    columnTypes.foreach(t => w.option("createTableColumnTypes", t))
    w.jdbc(url, table, new Properties())
  }

  /** Partitioned parallel scan: `numPartitions` range-bounded queries
    * over `partitionCol` (each executor gets `WHERE col BETWEEN …`
    * pushed to the database).
    */
  def readTable(spark: SparkSession, url: String, table: String,
                partitionCol: String, lower: Long, upper: Long,
                numPartitions: Int = 4): DataFrame =
    spark.read
      .option("partitionColumn", partitionCol)
      .option("lowerBound", lower.toString)
      .option("upperBound", upper.toString)
      .option("numPartitions", numPartitions.toString)
      .jdbc(url, table, new Properties())
}
