package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exact-match MV substitution: the rewrite must fire on a
  * semantically identical aggregate (different aliases/column order
  * included), must NOT fire on any different aggregate, and must be
  * result-invariant and refresh-consistent.
  */
class MvRewriteSpec extends SparkSpec {

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  private def base = {
    import spark.implicits._
    Seq((1L, "a", 10.0), (2L, "a", 5.0), (3L, "b", 2.5), (4L, "b", 1.5),
      (5L, "c", 7.0)).toDF("id", "k", "v")
  }

  private def scansMv(df: org.apache.spark.sql.DataFrame): Boolean =
    MvRegistry.scanPaths(df.queryExecution.analyzed)
      .exists(_.contains("mvspec"))

  test("rewrite fires on the identical aggregate and is " +
    "result-invariant") {
    val dir = tmp("wh")
    val mvDir = s"$dir/mvspec-agg"
    base.write.mode("overwrite").parquet(s"$dir/base")
    def q = spark.read.parquet(s"$dir/base")
      .groupBy(col("k")).agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
    val direct = q.collect().map(_.toString).sorted.toSeq
    MvRegistry.register(spark, "spec_agg", mvDir)(q)
    try {
      val served = q
      assert(scansMv(served), "expected the MV scan in the plan")
      assert(served.collect().map(_.toString).sorted.toSeq === direct)
    } finally MvRegistry.deregister("spec_agg")
  }

  test("alias and column-order changes still match (canonical " +
    "comparison), and parents resolve over the substituted subtree") {
    val dir = tmp("wh")
    val mvDir = s"$dir/mvspec-alias"
    base.write.mode("overwrite").parquet(s"$dir/base")
    def q = spark.read.parquet(s"$dir/base")
      .groupBy(col("k")).agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
    MvRegistry.register(spark, "spec_alias", mvDir)(q)
    try {
      // same aggregate, consumed by a filter + projection on top
      val consumer = q.filter(col("n") >= 2L).select(col("k"), col("s"))
      assert(scansMv(consumer), "expected the MV under the consumer")
      assert(consumer.collect().map(_.toString).sorted.toSeq ===
        Seq("[a,15.0]", "[b,4.0]"))
    } finally MvRegistry.deregister("spec_alias")
  }

  test("a different aggregate is NOT rewritten (negative control)") {
    val dir = tmp("wh")
    val mvDir = s"$dir/mvspec-neg"
    base.write.mode("overwrite").parquet(s"$dir/base")
    def q = spark.read.parquet(s"$dir/base")
      .groupBy(col("k")).agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
    MvRegistry.register(spark, "spec_neg", mvDir)(q)
    try {
      val other = spark.read.parquet(s"$dir/base")
        .groupBy(col("k")).agg(max(col("v")).as("mx"))
      assert(!scansMv(other), "different aggregate must not match")
      val filtered = spark.read.parquet(s"$dir/base")
        .filter(col("id") > 1L)
        .groupBy(col("k")).agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      assert(!scansMv(filtered), "filtered base must not match")
    } finally MvRegistry.deregister("spec_neg")
  }

  test("a base write after registration DECLINES the rewrite " +
    "(staleness guard); re-register re-arms it") {
    val dir = tmp("wh")
    val mvDir = s"$dir/mvspec-refresh"
    base.write.mode("overwrite").parquet(s"$dir/base")
    def q = spark.read.parquet(s"$dir/base")
      .groupBy(col("k")).agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
    MvRegistry.register(spark, "spec_refresh", mvDir)(q)
    try {
      assert(scansMv(q), "fresh registration must serve")
      base.withColumn("v", col("v") * 2)
        .write.mode("overwrite").parquet(s"$dir/base")
      spark.catalog.refreshByPath(s"$dir/base")
      // base snapshot drifted: the rule must fall back to the base
      // scan (current rows), never silently serve the stale artifact
      assert(!scansMv(q), "stale artifact must not be substituted")
      assert(q.filter(col("k") === "a").select(col("s"))
        .collect().head.getDouble(0) === 30.0)
      MvRegistry.register(spark, "spec_refresh", mvDir)(q)
      assert(scansMv(q), "re-registration must re-arm the rewrite")
      assert(q.filter(col("k") === "a").select(col("s"))
        .collect().head.getDouble(0) === 30.0)
    } finally MvRegistry.deregister("spec_refresh")
  }

  test("two substitution sites in one query get fresh exprIds " +
    "(self-join of the served view)") {
    val dir = tmp("wh")
    val mvDir = s"$dir/mvspec-dup"
    base.write.mode("overwrite").parquet(s"$dir/base")
    def q = spark.read.parquet(s"$dir/base")
      .groupBy(col("k")).agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
    MvRegistry.register(spark, "spec_dup", mvDir)(q)
    try {
      val j = q.as("l").join(q.as("r"), Seq("k"))
        .select(col("k"), col("l.n").as("ln"), col("r.s").as("rs"))
      assert(MvRegistry.scanPaths(j.queryExecution.analyzed)
        .count(_.contains("mvspec")) === 2,
        "both aggregate sites must substitute")
      // duplicate attribute ids across the two scan instances would
      // fail analysis or misresolve the join — collect must succeed
      assert(j.collect().length === 3)
    } finally MvRegistry.deregister("spec_dup")
  }
}
