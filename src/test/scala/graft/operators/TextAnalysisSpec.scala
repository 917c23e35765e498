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

  test("bigram logprob: surprising bigrams score higher; 1-token docs drop") {
    val corpus = Seq(
      TDoc(1, "x y x y x y", "en"),
      TDoc(2, "x y x q", "en"),   // 'x q' appears once in the corpus
      TDoc(3, "solo", "en")).toDF()
    val out = TextAnalysis.bigramLogprob(corpus)
      .select("doc_id", "n_bigrams", "avg_nll")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(!out.contains(3L))          // no bigrams → drops out
    assert(out(1L)._2 === 5L && out(2L)._2 === 3L)
    assert(out(2L)._3 > out(1L)._3)    // rare 'x q' is surprising
  }

  test("repetition: degenerate doc gated out, diverse doc kept") {
    val corpus = Seq(
      TDoc(1, "spam spam spam spam spam spam", "en"),
      TDoc(2, "every token here is fully distinct wording", "en")).toDF()
    val out = TextAnalysis.repetition(corpus)
      .select("doc_id", "top_ratio", "dup_bg_ratio", "keep")
      .as[(Long, Double, Double, Int)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 === 1.0 && out(1L)._4 === 0)
    assert(out(1L)._3 === 0.8)         // 5 bigrams, 1 distinct
    assert(out(2L)._2 < 0.2 && out(2L)._4 === 1)
  }

  test("mix_domains: deterministic, rate-ordered, partition-independent") {
    val docs = (1L to 400L).map(i => (i, s"src${i % 4}", "w"))
      .toDF("doc_id", "source", "text")
    val once = TextAnalysis.mixDomains(docs)
      .select("doc_id").as[Long].collect().toSet
    val again = TextAnalysis.mixDomains(docs.repartition(7))
      .select("doc_id").as[Long].collect().toSet
    assert(once === again)
    val bySrc = TextAnalysis.mixDomains(docs).groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(bySrc("src0") === 100L)                   // rate 1.0 keeps all
    assert(bySrc("src0") > bySrc.getOrElse("src1", 0L))
    assert(bySrc.getOrElse("src1", 0L) > bySrc.getOrElse("src3", 0L))
  }

  test("pack_sequences: offset binning packs per source shard") {
    val docs = Seq(
      (1L, "s", "a b c"), (2L, "s", "a b c"), (3L, "s", "a b c"),
      (10L, "t", "a b c d e f")).toDF("doc_id", "source", "text")
    val out = TextAnalysis.packSequences(docs, seqLen = 5L)
      .select("doc_id", "cum_tokens", "seq_id")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // source s: cum 3/6/9, start offsets 0/3/6 → seqs 0,0,1
    assert(out(1L) === ((1L, 3L, 0L)))
    assert(out(2L) === ((2L, 6L, 0L)))
    assert(out(3L) === ((3L, 9L, 1L)))
    assert(out(10L) === ((10L, 6L, 0L))) // t shard packs independently
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
