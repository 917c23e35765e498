package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic assertions for the data-quality / ops family beyond the
  * DuckDB oracle match: the expectation suite must actually CATCH
  * injected corruption, KS must be 0 on identical halves and bounded
  * in [0, 1e6], MAD must equal the hand-computed values on a known
  * sample, and the deterministic shuffle must be a permutation with
  * contiguous per-shard positions.
  */
class QualitySpec extends SparkSpec {

  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("dq_expectations catches injected nulls, dupes and domain breaks") {
    val good = graft.Tables.orders(spark, d)
    // corrupt: null custkey on one row, duplicate an orderkey,
    // negative price on one row, bogus status on one row
    val bad = good
      .withColumn("o_custkey",
        when(col("o_orderkey") === good.select(min("o_orderkey"))
          .as[Long].head, lit(null:java.lang.Long))
          .otherwise(col("o_custkey")))
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 97 === 0, -col("o_totalprice"))
          .otherwise(col("o_totalprice")))
      .withColumn("o_orderstatus",
        when(col("o_orderkey") % 101 === 0, lit("X"))
          .otherwise(col("o_orderstatus")))
    val dup = bad.unionAll(bad.limit(5))
    val res = Quality.dqExpectations(dup)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(res("completeness_custkey")._2 == 0, "null custkey not caught")
    assert(res("uniqueness_orderkey")._2 == 0, "dup orderkey not caught")
    assert(res("nonneg_totalprice")._2 == 0, "negative price not caught")
    assert(res("domain_orderstatus")._2 == 0, "bogus status not caught")
    assert(res("pattern_orderpriority")._2 == 1, "priority should pass")
    assert(res("bounds_orderdate")._2 == 1, "dates should pass")
    // and on the clean table, every check passes at exactly 1e6 ppm
    val clean = Quality.dqExpectations(good).collect()
    assert(clean.forall(_.getLong(2) == 1L), "clean table failed a check")
    assert(clean.forall(_.getLong(1) == 1000000L))
  }

  test("ks drift is 0 on identical distributions, bounded by 1e6") {
    // same totalprice multiset in both date halves -> D = 0
    val sym = Seq(
      ("1995-01-01", 100.0), ("1995-01-02", 250.0), ("1995-01-03", 400.0),
      ("1999-01-01", 100.0), ("1999-01-02", 250.0), ("1999-01-03", 400.0))
      .toDF("o_orderdate", "o_totalprice")
      .withColumn("o_orderdate", to_timestamp(col("o_orderdate")))
    val r = Quality.ksDrift(sym).collect().head
    assert(r.getAs[Long]("ks_ppm") == 0L, r.toString)
    // on the real table: a valid ppm probability bound
    val real = Quality.ksDrift(graft.Tables.orders(spark, d)).collect().head
    val ks = real.getAs[Long]("ks_ppm")
    assert(ks >= 0L && ks <= 1000000L, s"ks_ppm out of range: $ks")
    // fully disjoint supports -> D = 1e6
    val disj = Seq(
      ("1995-01-01", 10.0), ("1995-01-02", 20.0),
      ("1999-01-01", 900.0), ("1999-01-02", 950.0))
      .toDF("o_orderdate", "o_totalprice")
      .withColumn("o_orderdate", to_timestamp(col("o_orderdate")))
    assert(Quality.ksDrift(disj).collect().head
      .getAs[Long]("ks_ppm") == 1000000L)
  }

  test("mad outliers match hand-computed median/MAD on a known sample") {
    // values 1..9 and one far outlier 100: lower median = 5 (n=10 ->
    // (n+1) div 2 = 5th of sorted), deviations |v-5| sorted =
    // 0,1,1,2,2,3,3,4,4,95 -> lower MAD = 2; outliers: |v-5| > 6
    // -> only 100.
    val df = (1 to 9).map(v => ("t", v.toDouble)).toDF("event_type", "value")
      .unionAll(Seq(("t", 100.0)).toDF("event_type", "value"))
    val r = Quality.madOutliers(df).collect().head
    assert(r.getAs[Long]("median_centi") == 500L, r.toString)
    assert(r.getAs[Long]("mad_centi") == 200L, r.toString)
    assert(r.getAs[Long]("n_outliers") == 1L, r.toString)
  }

  test("det shuffle is a permutation with contiguous shard positions") {
    val docs = graft.Tables.documents(spark, d)
    val out = Quality.detShuffle(docs)
    val n = docs.count()
    assert(out.count() == n)
    // permutation: every doc appears exactly once
    assert(out.select("doc_id").distinct().count() == n)
    // per-shard positions are exactly 1..shard_size
    val shards = out.groupBy("shard")
      .agg(count(lit(1)).as("sz"), min("pos").as("lo"), max("pos").as("hi"))
      .collect()
    shards.foreach { r =>
      assert(r.getAs[Long]("lo") == 1L && r.getAs[Long]("hi") ==
        r.getAs[Long]("sz"), r.toString)
    }
    assert(shards.length == Quality.NShards, "empty shard at this n")
    // rough balance under the mixing hash: no shard over 2x the mean
    val mean = n.toDouble / Quality.NShards
    shards.foreach(r =>
      assert(r.getAs[Long]("sz") < 2 * mean, s"skewed shard: $r"))
  }

  test("k-anonymity flags exactly the under-k quasi-identifier groups") {
    // group A: 12 members (safe at k=10); group B: 3 members (violates)
    val rows = (1 to 12).map(i =>
      (i.toLong, "AUTOMOBILE", 1, 500.0)) ++
      (13 to 15).map(i => (i.toLong, "FURNITURE", 2, -50.0))
    val cust = rows.toDF("c_custkey", "c_mktsegment", "c_nationkey",
      "c_acctbal")
    val r = Quality.kAnonymity(cust).collect().head
    assert(r.getAs[Long]("n_groups") == 2L, r.toString)
    assert(r.getAs[Long]("n_violating") == 1L, r.toString)
    assert(r.getAs[Long]("rows_at_risk") == 3L, r.toString)
    assert(r.getAs[Long]("min_group_size") == 3L, r.toString)
  }

  test("ivm merge of base+delta partials equals the full rebuild") {
    val orders = graft.Tables.orders(spark, d)
    val full = orders
      .select(to_date(col("o_orderdate")).as("od"),
        col("o_totalprice")
          .cast(org.apache.spark.sql.types.DecimalType(18, 2)).as("p"))
      .groupBy("od")
      .agg(count(lit(1)).as("n"),
        round(sum(col("p")).cast("double"), 2).as("revenue"))
    val ivm = Quality.ivmDailySummary(orders)
    assert(ivm.unionAll(full).distinct().count() == full.count(),
      "merged partials differ from the full rebuild")
  }

  test("ref integrity: planted orphans on every FK edge are counted") {
    val orders = Seq((1L, 10L), (2L, 99L)) // order 2 -> missing customer
      .toDF("o_orderkey", "o_custkey")
    val li = Seq(1L, 1L, 9L) // 9 -> missing order; order 2 childless
      .toDF("l_orderkey")
    val cust = Seq(10L).toDF("c_custkey")
    val got = Quality.refIntegrity(orders, li, cust)
      .as[(String, Long)].collect().toMap
    assert(got === Map(
      "lineitem_without_order" -> 1L,
      "order_without_lineitem" -> 1L,
      "order_without_customer" -> 1L))
    // a referentially clean lake reports zeros, not missing rows
    val clean = Quality.refIntegrity(orders.filter($"o_orderkey" === 1L),
      li.filter($"l_orderkey" === 1L), cust)
      .as[(String, Long)].collect().toMap
    assert(clean.values.toSeq === Seq(0L, 0L, 0L))
  }

  test("profile: per-column null/distinct/minmax on a planted frame") {
    val df = Seq(
      (Option(1L), Option("x")),
      (Option.empty[Long], Option("y")),
      (Option(1L), Option.empty[String]))
      .toDF("a", "b")
    val got = Quality.profile(df)
      .as[(Long, String, Long, Long, Option[String], Option[String])]
      .collect().map(r => r._2 -> r).toMap
    assert(got("a") === ((3L, "a", 2L, 1L, Some("1"), Some("1"))))
    assert(got("b") === ((3L, "b", 2L, 2L, Some("x"), Some("y"))))
    // empty input: one profile row per column, zero counts, null minmax
    val zero = Quality.profile(df.limit(0))
      .as[(Long, String, Long, Long, Option[String], Option[String])]
      .collect().map(r => r._2 -> r).toMap
    assert(zero("a") === ((0L, "a", 0L, 0L, None, None)))
    assert(zero("b") === ((0L, "b", 0L, 0L, None, None)))
  }

  test("join explosion: exact pair prediction, hot key, amplification") {
    val left = Seq(1L, 1L, 1L, 2L).toDF("k")
    val right = Seq(1L, 1L, 3L).toDF("k")
    val got = Quality.joinExplosion(left, right)
      .as[(Long, Long, Long, Long, Long, Long)].head()
    // shared key 1: 3×2 = 6 predicted rows; amplification 6000/4 = 1500
    assert(got === ((4L, 3L, 1L, 6L, 6L, 1500L)))
    // the prediction IS the join's cardinality
    assert(left.join(right, "k").count() === got._4)
    // disjoint keys: a zero-row prediction, not a missing monitor row
    val none = Quality.joinExplosion(Seq(5L).toDF("k"), Seq(7L).toDF("k"))
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(none === ((1L, 1L, 0L, 0L, 0L, 0L)))
  }
}
