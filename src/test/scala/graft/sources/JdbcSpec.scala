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

  test("S16: Postgres-dialect pushdown SQL generation (no server needed)") {
    // the sandbox has no Postgres server (zero egress), but the
    // dialect layer that GENERATES the pushed-down SQL is pure
    // library code: resolve the Postgres dialect from a postgres URL
    // and assert the exact SQL text Spark would send — identifier
    // quoting, compiled predicates, LIMIT — closing what remains of
    // the reference's trino/postgres federation surface
    // (trino/catalog/postgres_source.properties:1-4) testably.
    import org.apache.spark.sql.connector.expressions.Expressions
    import org.apache.spark.sql.connector.expressions.filter.Predicate
    import org.apache.spark.sql.execution.datasources.jdbc.{JDBCOptions, JDBCPartition}
    import org.apache.spark.sql.jdbc.JdbcDialects
    import org.apache.spark.unsafe.types.UTF8String

    val pgUrl = "jdbc:postgresql://db:5432/warehouse"
    val dialect = JdbcDialects.get(pgUrl)
    assert(dialect.getClass.getName.contains("Postgres"),
      s"dialect registry must route postgresql URLs: ${dialect.getClass}")
    // Postgres quoting and paging dialect
    assert(dialect.quoteIdentifier("total") === "\"total\"")
    assert(dialect.getLimitClause(10) === "LIMIT 10")
    assert(dialect.supportsLimit)
    // the full scan SQL Spark would issue for
    //   SELECT id, total WHERE total > 1000.0 AND status = 'F' LIMIT 10
    val gt = new Predicate(">", Array(
      Expressions.column("total"),
      Expressions.literal(java.lang.Double.valueOf(1000.0))))
    val eq = new Predicate("=", Array(
      Expressions.column("status"),
      Expressions.literal(UTF8String.fromString("F"))))
    // JDBCOptions insists on a loadable driver class; no postgres
    // driver ships in the sandbox, so name Derby's (any loadable
    // class satisfies the check — the DIALECT is still chosen by the
    // postgresql URL, which is what this test asserts)
    val opts = new JDBCOptions(Map(
      "url" -> pgUrl, "dbtable" -> "orders",
      "driver" -> "org.apache.derby.iapi.jdbc.AutoloadedDriver"))
    val sql = dialect.getJdbcSQLQueryBuilder(opts)
      .withColumns(Array("\"id\"", "\"total\""))
      .withPredicates(Array(gt, eq), JDBCPartition(null, 0))
      .withLimit(10)
      .build()
    assert(sql.contains("SELECT \"id\",\"total\" FROM orders"), sql)
    assert(sql.contains("\"total\" > 1000.0"), sql)
    assert(sql.contains("\"status\" = 'F'"), sql)
    assert(sql.contains("LIMIT 10"), sql)
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
