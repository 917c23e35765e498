package graft

import org.apache.spark.sql.functions._

/** The co-located join pattern for the 100 TB fact-fact case
  * (SURVEY §2.4 A8 note: "at 100 TB both sides would be bucketed by
  * orderkey"): writing both fact tables bucketed on the join key
  * removes the per-query shuffle entirely — the join planner reads
  * bucket i against bucket i. This spec proves the property on the
  * physical plan, not by assertion of folklore.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join plans with zero shuffle exchanges") {
    val d = "/root/testdata/sf0.001"
    val li = Tables.lineitem(spark, d)
    val ord = Tables.orders(spark, d)
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bucketed")
    ord.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("ord_bucketed")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString()
      // the join itself must not exchange either side
      val joinSection = plan.substring(0, plan.length)
      assert(joinSection.contains("SortMergeJoin"), plan.take(500))
      // only the final groupBy may shuffle: exactly one Exchange
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(exchanges === 1,
        s"expected 1 exchange (final agg), got $exchanges:\n${plan.take(1200)}")

      // and the result matches the unbucketed join
      val expected = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
