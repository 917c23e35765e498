package graft.functions

import graft.SparkSpec
import graft.operators.Recommend
import org.apache.spark.sql.functions._

class PrecisionAtKSpec extends SparkSpec {

  import spark.implicits._

  test("typed Aggregator matches the hand computation") {
    val data = Seq(
      RecEval(Seq(1L, 2L, 3L), Seq(2L, 9L)),   // 1/3
      RecEval(Seq(4L, 5L), Seq(4L, 5L)),        // 2/2
      RecEval(Seq.empty, Seq(1L)))              // skipped (no recs)
    val got = data.toDS()
      .select(new PrecisionAtK(10).toColumn.name("p"))
      .as[Double].head()
    assert(math.abs(got - (1.0 / 3 + 1.0) / 2) < 1e-15)
  }

  test("k truncates the rec list before scoring") {
    val got = Seq(RecEval(Seq(1L, 2L, 3L, 4L), Seq(4L))).toDS()
      .select(new PrecisionAtK(2).toColumn.name("p"))
      .as[Double].head()
    assert(got === 0.0) // item 4 is beyond k=2
  }

  test("agrees with the join-based production path on real recs") {
    val d = "/root/testdata/sf0.001"
    val inter = Recommend.interactions(spark, d)
    val train = Recommend.trainSet(inter)
    val eval_ = Recommend.evalSet(inter)
    val recs = Recommend.recommend(train, Recommend.itemSimilarity(train))
    val joined = Recommend.precisionAtK(recs, eval_)
      .select("avg_precision").as[Double].head()
    val perUser = recs.orderBy(col("user_id"), col("rank"))
      .groupBy(col("user_id"))
      .agg(collect_list(col("item_id")).as("recs"))
      .join(eval_.groupBy(col("user_id"))
        .agg(collect_list(col("item_id")).as("truth")), Seq("user_id"), "left")
      .select(col("recs"), coalesce(col("truth"),
        array().cast("array<bigint>")).as("truth"))
      .as[RecEval]
    val agg = perUser.select(new PrecisionAtK(10).toColumn.name("p"))
      .as[Double].head()
    assert(math.abs(agg - joined) < 1e-6) // joined path rounds to 6
  }
}
