package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink format breadth beyond parquet: the lake's edges are
  * rarely parquet — seeds arrive as CSV, event taps as JSON lines,
  * some warehouses hand over ORC. Each format must round-trip with a
  * declared schema (inference is banned at 100 TB: one bad row
  * re-types a column for the whole scan) and keep filter pushdown
  * where the format supports it.
  */
class FormatsSpec extends SparkSpec {

  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType),
    StructField("price", DoubleType),
    StructField("day", DateType)))

  private def fixture = Seq(
    (1L, "alpha", 10.5, java.sql.Date.valueOf("2024-01-01")),
    (2L, "beta,with,commas", 20.25, java.sql.Date.valueOf("2024-01-02")),
    (3L, null, 0.0, java.sql.Date.valueOf("2024-01-03")))
    .toDF("id", "name", "price", "day")

  private def roundTrip(fmt: String,
                        writeOpts: Map[String, String] = Map.empty,
                        readOpts: Map[String, String] = Map.empty): Unit = {
    val dir = java.nio.file.Files.createTempDirectory(s"fmt-$fmt").toString + "/t"
    fixture.write.options(writeOpts).format(fmt).save(dir)
    val back = spark.read.options(readOpts).schema(schema).format(fmt).load(dir)
    val a = fixture.orderBy("id").collect().map(_.toSeq).toSeq
    val b = back.orderBy("id").collect().map(_.toSeq).toSeq
    assert(a == b, s"$fmt round-trip mismatch: $b")
  }

  test("csv round-trips with declared schema, quoting and nulls intact") {
    roundTrip("csv",
      writeOpts = Map("header" -> "true"),
      readOpts = Map("header" -> "true"))
  }

  test("json lines round-trip with declared schema") {
    roundTrip("json")
  }

  test("orc round-trips and pushes filters like parquet") {
    val dir = java.nio.file.Files.createTempDirectory("fmt-orc").toString + "/t"
    fixture.write.format("orc").save(dir)
    val back = spark.read.schema(schema).format("orc").load(dir)
      .filter(col("id") > 1L)
    val plan = back.queryExecution.executedPlan.toString()
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(id"),
      s"orc filter not pushed:\n${plan.take(400)}")
    assert(back.count() === 2)
  }

  test("csv tolerates malformed rows under PERMISSIVE, counts them") {
    val dir = java.nio.file.Files.createTempDirectory("fmt-bad").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/part.csv"),
      "1,ok,1.5,2024-01-01\nnot-a-long,bad,xx,2024-01-99\n2,ok2,2.5,2024-01-02\n")
    val back = spark.read.schema(schema).csv(s"$dir/part.csv")
    // PERMISSIVE (default): malformed cells null out, scan survives —
    // the 100 TB posture where one bad row must not kill the job
    assert(back.count() === 3)
    assert(back.filter(col("id").isNull).count() === 1)
  }
}
