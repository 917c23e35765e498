package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** S16 exercised for real: chunked parallel `df.write.jdbc` into an
  * embedded Derby database (in the Spark distribution — the sandbox
  * has no network DB) and the partitioned parallel `spark.read.jdbc`
  * back. Round-trip equality is the write-path oracle.
  */
class JdbcSpec extends SparkSpec {

  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"

  test("S16: chunked jdbc write round-trips through partitioned read") {
    val src = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice").cast("double").as("total"),
        col("o_orderstatus").as("status"))
    Jdbc.writeTable(src, url, "orders_rt", numPartitions = 4,
      batchSize = 250, mode = "overwrite")

    val back = Jdbc.readTable(spark, url, "orders_rt",
      partitionCol = "o_orderkey",
      lower = 1L,
      upper = src.agg(max("o_orderkey")).as[Long].head(),
      numPartitions = 4)
    // parallel scan: one range-bounded query per partition
    assert(back.rdd.getNumPartitions === 4)

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("o_orderkey", "o_custkey", "total", "status")
        .as[(Long, Long, Double, String)].collect().sortBy(_._1).toSeq
    assert(canon(back) === canon(src))
  }

  test("S16: filters and projection push into the JDBC scan") {
    val src = Seq((1L, 10.0, "F"), (2L, 2000.0, "O"), (3L, 3000.0, "F"))
      .toDF("id", "total", "status")
    Jdbc.writeTable(src, url, "push_probe", mode = "overwrite",
      columnTypes = Some("status VARCHAR(10)"))
    val df = Jdbc.readTable(spark, url, "push_probe", "id", 1L, 3L, 2)
      .filter(col("total") > 1000.0 && col("status") === "F")
      .select("id", "total")
    // the WHERE must reach the database as pushed predicates on the
    // JDBCRelation — the closest the sandbox gets to asserting the
    // Postgres-dialect pushdown SQL (Derby stands in; the pushdown
    // machinery and plan surface are dialect-independent)
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("PushedFilters"), plan.take(600))
    assert(plan.contains("GreaterThan(total,1000.0)"),
      s"total predicate not pushed:\n${plan.take(600)}")
    assert(plan.contains("EqualTo(status,F)"),
      s"status predicate not pushed:\n${plan.take(600)}")
    // column pruning: the unselected, unfiltered columns never travel
    assert(plan.contains("ReadSchema: struct<id:bigint,total:double"),
      s"projection not pruned:\n${plan.take(600)}")
    assert(df.as[(Long, Double)].collect().toSeq === Seq((3L, 3000.0)))
  }

  test("S16: append mode accumulates batches like the chunk loop") {
    val a = Seq((1L, "x"), (2L, "y")).toDF("id", "v")
    val b = Seq((3L, "z")).toDF("id", "v")
    Jdbc.writeTable(a, url, "chunks", mode = "overwrite")
    Jdbc.writeTable(b, url, "chunks", mode = "append")
    val got = Jdbc.readTable(spark, url, "chunks", "id", 1L, 3L, 2)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, "x"), (2L, "y"), (3L, "z")))
  }
}
