package graft.operators

import graft.SparkSpec

class RelationalSpec extends SparkSpec {

  import spark.implicits._

  test("weighted sample: dominant weight always kept, k caps, layout-stable") {
    // 49 rows at weight 0.001 and one row (id 7) at 1e9: the ES key
    // -ln(u)/w of the heavy row is ≤ ~1.4e-8 (u is bounded away from
    // 0 and 1 by the hash modulus) while every light row's key is
    // ≥ ~1e-3 — the heavy row is sampled with certainty, which is the
    // P ∝ weight property at its extreme
    val df = ((1 to 50).filter(_ != 7).map(i => (i.toLong, 0.001)) :+
      (7L, 1.0e9)).toDF("k", "w")
    val got = Relational.weightedSample(df, "k", "w", k = 10)
      .as[(Long, Double)].collect()
    assert(got.length === 10)
    assert(got.exists(_._1 === 7L))
    // deterministic under a different input layout
    val again = Relational.weightedSample(df.repartition(7), "k", "w", k = 10)
      .as[(Long, Double)].collect()
    assert(got.map(_._1).toSet === again.map(_._1).toSet)
    // without-replacement: no duplicates
    assert(got.map(_._1).distinct.length === got.length)
  }

  test("bloom prefilter join: exact vs direct join; empty key set is total") {
    val orders = Seq(
      (1L, "1-URGENT"), (2L, "3-MEDIUM"), (3L, "1-URGENT"), (4L, "5-LOW"))
      .toDF("o_orderkey", "o_orderpriority")
    val li = Seq(
      (1L, "A", 2.0, 10.0), (1L, "R", 1.0, 5.0), (2L, "A", 4.0, 20.0),
      (3L, "A", 3.0, 30.0), (9L, "R", 7.0, 70.0)) // 9 matches no order
      .toDF("l_orderkey", "l_returnflag", "l_quantity", "l_extendedprice")
    val got = Relational.bloomPrefilterJoin(orders, li)
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // urgent orders 1,3 -> lineitems (1,A),(1,R),(3,A); order 2 and
    // the orphan 9 excluded even if the bloom passes them
    assert(got("A") === (("A", 2L, 5.0, 40.0)))
    assert(got("R") === (("R", 1L, 1.0, 5.0)))
    // no urgent keys: empty result, no NPE from stat.bloomFilter
    val none = orders.filter($"o_orderpriority" === "never")
    assert(Relational.bloomPrefilterJoin(none, li).count() === 0L)
  }

  test("snapshot diff: insert/update/delete classified, unchanged silent") {
    val oldS = Seq((1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("k", "payload")
    val newS = Seq((1L, "a"), (2L, "B"), (4L, "d"))
      .toDF("k", "payload")
    val got = Relational.snapshotDiff(oldS, newS)
      .as[(Long, String)].collect().toMap
    assert(got === Map(2L -> "update", 3L -> "delete", 4L -> "insert"))
    // identical snapshots: an empty feed, not a table-sized one
    assert(Relational.snapshotDiff(oldS, oldS).count() === 0L)
  }
}
