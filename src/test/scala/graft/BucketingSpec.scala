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

  test("CF self-join over bucketed interactions shuffles nothing") {
    // the hottest shuffle in the engine is the co-occurrence
    // self-join on user_id (Recommend.itemSimilarity). Persist the
    // interaction table bucketed on that key — the nightly-CF layout
    // at 100 TB — and the pair-generation join needs ZERO exchanges.
    val d = "/root/testdata/sf0.001"
    graft.operators.Recommend.interactions(spark, d)
      .write.mode("overwrite").bucketBy(8, "user_id")
      .sortBy("user_id").saveAsTable("inter_bucketed")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val inter = spark.table("inter_bucketed")
      val pairs = inter.as("a")
        .join(inter.as("b"),
          col("a.user_id") === col("b.user_id") &&
            col("a.item_id") < col("b.item_id"))
        .groupBy(col("a.item_id").as("i"), col("b.item_id").as("j"))
        .agg(count(lit(1)).as("co"))
      val plan = pairs.queryExecution.executedPlan.toString()
      assert(plan.contains("SortMergeJoin"), plan.take(500))
      // the self-join reads bucket-aligned sides; only the (i, j)
      // aggregation exchanges
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(exchanges === 1,
        s"self-join shuffled: $exchanges exchanges\n${plan.take(1200)}")
      // co-occurrence counts equal the unbucketed operator's
      val expected = graft.operators.Recommend
        .itemSimilarity(graft.operators.Recommend.interactions(spark, d),
          minCo = 1, minCos = 0.0)
        .select("i", "j", "co")
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val got = pairs.collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS inter_bucketed")
    }
  }

  test("AQE splits a planted skewed join partition at runtime") {
    // the runtime complement to j7's manual salting: when one key
    // carries the bulk of a shuffle, AQE's OptimizeSkewedJoin must
    // split that partition instead of letting one task grind — the
    // difference between a 100 TB join finishing and one straggler
    // pinning the stage. Thresholds are lowered so a local fixture
    // exhibits "skew" by the same relative rules production uses.
    import spark.implicits._
    val keep = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = keep.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      keep.foreach { case (k, v) => spark.conf.set(k, v) }
      // left: 200k rows on ONE hot key + a thin tail; right: the keys.
      // No keyed aggregate downstream: AQE declines to split when the
      // join's output partitioning is required by a parent (splitting
      // would force a re-shuffle) — which is itself the documented
      // trade; the free-standing join is the splittable case.
      val left = (Seq.fill(200000)(0L) ++ (1L to 50L))
        .toDF("k").withColumn("pad", lit("x" * 64))
      val right = (0L to 50L).toDF("k").withColumn("v", col("k") * 2)
      val joined = left.join(right, "k")
      // execute THIS dataframe's own query (count() would plan a
      // separate one); the AQE final plan exists only after execution
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString()
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n${plan.take(1500)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
