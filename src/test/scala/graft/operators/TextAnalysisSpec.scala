package graft.operators

import graft.SparkSpec

case class TDoc(doc_id: Long, text: String, lang: String)

class TextAnalysisSpec extends SparkSpec {

  import spark.implicits._

  val docs = Seq(
    TDoc(1, "the cat and the dog", "en"),
    TDoc(2, "der hund und die katze ist", "de"),
    TDoc(3, "zzz yyy xxx", "xx")).toDF()

  test("token stats: counts and average length") {
    val out = TextAnalysis.tokenStats(docs)
      .select("doc_id", "n_tokens", "n_token_chars", "avg_token_len")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(out(0) === ((1L, 5L, 15L, 3.0)))
    assert(out(2) === ((3L, 3L, 9L, 3.0)))
  }

  test("lang id: stopword vote with priority tie-break") {
    val out = TextAnalysis.langId(docs)
      .select("doc_id", "pred_lang").as[(Long, String)].collect().toMap
    assert(out(1L) === "en") // 'the' x2, 'and'
    assert(out(2L) === "de") // der/und/die/ist
    assert(out(3L) === "und") // no hits anywhere
  }

  test("quality: ttr and stopword ratio are exact divisions") {
    val q = TextAnalysis.qualityScore(docs)
      .select("doc_id", "ttr", "stop_ratio").as[(Long, Double, Double)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap.apply(1L)
    assert(q === ((0.8, 0.6))) // 4 distinct / 5; the,and,the = 3/5
  }

  test("fingerprint: identical after normalization") {
    val two = Seq(TDoc(1, "A  b\tc", "x"), TDoc(2, "a b c", "x")).toDF()
    val fp = TextAnalysis.fingerprint(two).select("fp").as[String].collect()
    assert(fp(0) === fp(1))
  }

  test("unigram logprob: rare-token docs score as more surprising") {
    val corpus = Seq(
      TDoc(1, "common common common common", "en"),
      TDoc(2, "common common common rare", "en")).toDF()
    val out = TextAnalysis.unigramLogprob(corpus)
      .select("doc_id", "avg_nll").as[(Long, Double)].collect().toMap
    assert(out(2L) > out(1L)) // 'rare' (p=1/8) beats 'common' (p=7/8)
    assert(out(1L) > 0.0)
  }

  test("bm25: zero without query terms, tf-monotone at equal length") {
    val corpus = Seq(
      TDoc(1, "spark spark spark aaa", "en"),
      TDoc(2, "spark bbb ccc ddd", "en"),
      TDoc(3, "eee fff ggg hhh", "en")).toDF()
    val out = TextAnalysis.bm25(corpus)
      .select("doc_id", "bm25").as[(Long, Double)].collect().toMap
    assert(out(3L) === 0.0)          // no query term at all
    assert(out(1L) > out(2L))        // tf=3 beats tf=1 at the same dl
    assert(out(2L) > 0.0)
  }
}
