package graft.operators

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {

  import spark.implicits._

  // deterministic 64-dim integer vectors, varied enough to spread
  // across several hyperplane buckets
  private def emb(n: Int) =
    (0 until n).map { i =>
      (i.toLong, (0 until Similarity.Dim)
        .map(d => ((i * 31 + d * 17) % 13 - 6).toFloat).toArray, 0)
    }.toDF("vec_id", "embedding", "label")

  test("multiprobe: strict superset of the single-bucket LSH result space") {
    val e = emb(40)
    val lsh = Similarity.knnLsh(e)
      .select("query_id", "rank", "nbr_id", "cos")
      .as[(Long, Long, Long, Double)].collect()
    val multi = Similarity.knnLshMultiprobe(e)
      .select("query_id", "rank", "nbr_id", "cos")
      .as[(Long, Long, Long, Double)].collect()
    // every query answered by LSH is answered by multiprobe, and its
    // best neighbor is at least as good (candidates are a superset)
    val lshBest = lsh.filter(_._2 == 1L).map(r => r._1 -> r._4).toMap
    val multiBest = multi.filter(_._2 == 1L).map(r => r._1 -> r._4).toMap
    assert(lshBest.keySet.subsetOf(multiBest.keySet))
    lshBest.foreach { case (q, c) => assert(multiBest(q) >= c) }
    // multiprobe reaches at least as many (query, nbr) pairs
    assert(multi.length >= lsh.length)
  }

  test("multiprobe: no duplicate (query, nbr) pairs from the probe fan-out") {
    val got = Similarity.knnLshMultiprobe(emb(40))
      .select("query_id", "nbr_id").as[(Long, Long)].collect()
    assert(got.length === got.distinct.length)
  }
}
