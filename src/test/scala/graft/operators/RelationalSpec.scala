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
}
