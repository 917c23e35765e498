package graft.streaming

import graft.SparkSpec
import graft.operators.TextAnalysis
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Property layer for the STREAMING kernels (round 13) — the batch
  * kernels carry 16 PropertySpec law families; the streaming twins
  * rested on example-based specs. These laws run the real streaming
  * machinery (MemoryStream + foreachBatch / stateful window) on
  * GENERATED inputs with a fixed seed, so the suite stays
  * deterministic while the inputs stop being hand-planted:
  *
  *  - stream ≡ batch for runSpanDedup: for any generated corpus and
  *    ANY micro-batch split of the incoming docs, the appended span
  *    table equals the registered batch operator on the union —
  *    the one-codepath contract on inputs nobody chose.
  *  - watermark safety for rapidOrders: events delivered with
  *    disorder bounded UNDER the watermark lose no alert under any
  *    batch split — the guarantee the 1-minute watermark is sized
  *    to give, checked against the batch form on the same events.
  *  - replay idempotence for CorpusIngest.processBatch: the same
  *    micro-batch re-processed under its batchId (the foreachBatch
  *    crash-replay case) leaves the clean and quarantine tables
  *    byte-identical — the exactly-once claim of the batchId-keyed
  *    overwrite device.
  *
  * Streaming queries cost seconds each, so each law runs a small
  * fixed number of seeded random cases rather than scalacheck's 20+
  * — the point is generated (not planted) inputs, with the seed
  * printed into the assertion message for replay.
  */
class StreamPropertySpec extends SparkSpec {

  import spark.implicits._

  /** Seeded corpus generator: texts over a SMALL vocabulary so
    * cross-doc shared runs arise naturally (the span family's
    * subject matter), doc ids laid out on the %10 split the
    * incremental operators use — corpus ids end 0..7, batch ids 8/9.
    */
  private def genDocs(rng: scala.util.Random, n: Int, batch: Boolean)
  : Seq[(Long, String)] = {
    val vocab = Vector("alpha", "bravo", "carol", "delta", "echo",
      "fox", "golf", "hotel")
    (0 until n).map { i =>
      val id = i.toLong * 10 + (if (batch) 8 + rng.nextInt(2)
                                else rng.nextInt(8))
      val len = 4 + rng.nextInt(9)
      val text = Seq.fill(len)(vocab(rng.nextInt(vocab.size))).mkString(" ")
      (id, text)
    }
  }

  /** Random scatter split — order-free; right for the span law,
    * where micro-batch membership is the only thing that matters.
    */
  private def splitBatches[A](rng: scala.util.Random, xs: Seq[A])
  : Seq[Seq[A]] = {
    val k = 1 + rng.nextInt(3) // 1..3 micro-batches
    val marked = xs.map(x => (x, rng.nextInt(k)))
    (0 until k).map(b => marked.filter(_._2 == b).map(_._1))
      .filter(_.nonEmpty)
  }

  /** Contiguous split at random cut points — order-PRESERVING; the
    * watermark law's disorder bound is a property of the delivery
    * sequence, so batch boundaries must not reorder it (a scatter
    * split would deliver a 10:01 event after the watermark advanced
    * to 10:18 — a LATE event outside the bound, which the watermark
    * is entitled to drop).
    */
  private def splitContiguous[A](rng: scala.util.Random, xs: Seq[A])
  : Seq[Seq[A]] = {
    val k = 1 + rng.nextInt(3)
    val cuts = (Seq(0, xs.size) ++ Seq.fill(k - 1)(rng.nextInt(xs.size + 1)))
      .sorted
    cuts.zip(cuts.tail).map { case (a, b) => xs.slice(a, b) }
      .filter(_.nonEmpty)
  }

  test("law: runSpanDedup stream ≡ batch operator on generated " +
    "corpora under any micro-batch split") {
    implicit val sc = spark.sqlContext
    for (seed <- Seq(11L, 12L, 13L, 14L)) {
      val rng = new scala.util.Random(seed)
      val corpus = genDocs(rng, 6 + rng.nextInt(5), batch = false)
        .toDF("doc_id", "text")
      val batchDocs = genDocs(rng, 4 + rng.nextInt(4), batch = true)
      val root = java.nio.file.Files
        .createTempDirectory(s"spanlaw$seed").toString
      val fps = CorpusIngest.corpusWindowFps(corpus, w = 3)
        .localCheckpoint()
      val in = MemoryStream[StreamDoc]
      val q = CorpusIngest.runSpanDedup(
        in.toDF().select($"doc_id", $"text"),
        fps, s"$root/spans", s"$root/ckpt", w = 3)
      for (b <- splitBatches(rng, batchDocs)) {
        in.addData(b.map { case (id, tx) => StreamDoc(id, tx, "en", "w") })
        q.processAllAvailable()
      }
      q.stop()
      val streamed =
        if (!new java.io.File(s"$root/spans").exists()) Set.empty
        else spark.read.parquet(s"$root/spans")
          .select("doc_id", "span_start", "span_end")
          .as[(Long, Long, Long)].collect().toSet
      // the registered batch operator on corpus ∪ batch is the oracle
      val union = corpus.unionByName(batchDocs.toDF("doc_id", "text"))
      val batch = TextAnalysis.spanMergeIncremental(union, w = 3)
        .select("doc_id", "span_start", "span_end")
        .as[(Long, Long, Long)].collect().toSet
      assert(streamed === batch, s"seed=$seed")
    }
  }

  test("law: runLshDedup micro-batch folds ≡ the one-shot full " +
    "recompute on generated corpora under any micro-batch split") {
    // the sequential-fold algebra (quotient theorem per cycle) says
    // the store's labels after ANY sequence of micro-batch appends
    // equal CC over everything — scatter splits are fine because only
    // membership matters (each fold sees the index as of its batch)
    implicit val sc = spark.sqlContext
    for (seed <- Seq(71L, 72L, 73L)) {
      val rng = new scala.util.Random(seed)
      val corpus = genDocs(rng, 5 + rng.nextInt(4), batch = false)
        .toDF("doc_id", "text")
      val batchDocs = genDocs(rng, 4 + rng.nextInt(4), batch = true)
      val root = java.nio.file.Files
        .createTempDirectory(s"lshlaw$seed").toString
      graft.operators.Dedup.lshIndexBuild(spark, s"$root/idx", corpus)
      val in = MemoryStream[StreamDoc]
      val q = CorpusIngest.runLshDedup(
        in.toDF().select($"doc_id", $"text"), s"$root/idx", s"$root/ckpt")
      try {
        for (b <- splitBatches(rng, batchDocs)) {
          in.addData(b.map { case (id, tx) => StreamDoc(id, tx, "en", "w") })
          q.processAllAvailable()
        }
      } finally q.stop() // a drain failure must not leak the query
      // into the suite-shared session
      val got = spark.read.parquet(s"$root/idx/labels")
        .as[(Long, Long)].collect().toSet
      val want = graft.operators.Dedup.dedupClustersLsh(
        corpus.unionByName(batchDocs.toDF("doc_id", "text")))
        .select("doc_id", "canonical_id").as[(Long, Long)].collect().toSet
      assert(got === want, s"seed=$seed")
    }
  }

  test("law: runSpanCut live-index loop ≡ the sequential batch verbs " +
    "on generated corpora under any contiguous micro-batch split") {
    implicit val sc = spark.sqlContext
    for (seed <- Seq(41L, 42L, 43L)) {
      val rng = new scala.util.Random(seed)
      val corpus = genDocs(rng, 5 + rng.nextInt(4), batch = false)
        .toDF("doc_id", "text")
      val batchDocs = genDocs(rng, 5 + rng.nextInt(4), batch = true)
      val splits = splitContiguous(rng, batchDocs)
      val root = java.nio.file.Files
        .createTempDirectory(s"cutlaw$seed").toString
      CorpusIngest.seedSpanIndex(corpus, s"$root/fps", w = 3)
      val in = MemoryStream[StreamDoc]
      val q = CorpusIngest.runSpanCut(in.toDF().select($"doc_id", $"text"),
        s"$root/fps", s"$root/clean", s"$root/ckpt", w = 3)
      for (b <- splits) {
        in.addData(b.map { case (id, tx) => StreamDoc(id, tx, "en", "w") })
        q.processAllAvailable()
      }
      q.stop()
      val streamed = spark.read.parquet(s"$root/clean")
        .select("doc_id", "cut_tokens", "kept_fp")
        .as[(Long, Long, Long)].collect().toSet
      // the sequential batch loop: cut against the index-so-far,
      // then augment the index with the batch's windows
      var idx = CorpusIngest.corpusWindowFps(corpus, w = 3)
        .localCheckpoint()
      val expected = scala.collection.mutable.Set[(Long, Long, Long)]()
      for (b <- splits) {
        val bdf = b.toDF("doc_id", "text")
        expected ++= TextAnalysis.spanCutAgainstIndex(bdf, idx, w = 3)
          .select("doc_id", "cut_tokens", "kept_fp")
          .as[(Long, Long, Long)].collect()
        idx = idx.unionByName(
          TextAnalysis.spanWindows(bdf, 3).select("fp").distinct())
          .distinct().localCheckpoint()
      }
      assert(streamed === expected.toSet, s"seed=$seed")
    }
  }

  test("law: rapidOrders loses no alert when delivery disorder stays " +
    "under the watermark, for any batch split") {
    implicit val sc = spark.sqlContext
    val base = Timestamp.valueOf("2024-01-01 10:00:00").getTime
    for (seed <- Seq(21L, 22L, 23L, 24L)) {
      val rng = new scala.util.Random(seed)
      // events over ~20 min for 3 customers, heavy enough that some
      // (customer, 5-min window) pairs cross the n=3 threshold
      val evs = (0 until (24 + rng.nextInt(12))).map { _ =>
        Ev(s"C${rng.nextInt(3)}",
          new Timestamp(base + rng.nextInt(20 * 60) * 1000L))
      }
      // delivery order: sorted by ts + jitter < watermark/2, so any
      // event's disorder against the running max stays under the
      // 1-minute watermark — the regime the guarantee covers
      val delivery = evs.sortBy(e => e.ts.getTime + rng.nextInt(25000))
      val in = MemoryStream[Ev]
      val q = Alerts.rapidOrders(in.toDF(), "ts", n = 3)
        .writeStream.format("memory").queryName(s"rapid_law_$seed")
        .outputMode("update").start()
      for (b <- splitContiguous(rng, delivery)) {
        in.addData(b)
        q.processAllAvailable()
      }
      q.stop()
      // update mode re-emits a key per refinement: the final state of
      // a (customer, window) is its max count
      val streamed = spark.table(s"rapid_law_$seed")
        .groupBy("customer_id", "window_start")
        .agg(max("order_count").as("c"))
        .as[(String, Timestamp, Long)].collect()
        .map(r => (r._1, r._2, r._3)).toSet
      val batch = Alerts.rapidOrders(evs.toDF(), "ts", n = 3)
        .select("customer_id", "window_start", "order_count")
        .as[(String, Timestamp, Long)].collect().toSet
      assert(streamed === batch, s"seed=$seed")
    }
  }

  test("law: processBatch replay (same batchId) leaves the clean and " +
    "quarantine tables identical") {
    val good = "the quick brown fox jumps over the lazy dog and then " +
      "it ran away to find some other interesting things in a forest"
    for (seed <- Seq(31L, 32L)) {
      val rng = new scala.util.Random(seed)
      val root = java.nio.file.Files
        .createTempDirectory(s"replay$seed").toString
      val (clean, quar) = (s"$root/clean", s"$root/quar")
      def mkBatch(ids: Seq[Long]) = ids.map { i =>
        val txt =
          if (rng.nextBoolean()) good + s" variant $i"
          else "spam spam spam spam spam spam the of and to"
        (i, txt, "en", "web")
      }.toDF("doc_id", "text", "lang", "source")
      val b0 = mkBatch(1L to (3 + rng.nextInt(3)).toLong)
      val b1 = mkBatch(10L to (12 + rng.nextInt(3)).toLong)
      CorpusIngest.processBatch(b0, clean, quar, batchId = 0L)
      CorpusIngest.processBatch(b1, clean, quar, batchId = 1L)
      def snap(dir: String) = spark.read.parquet(dir)
        .collect().map(_.toString).sorted.toSeq
      val (c1, q1) = (snap(clean), snap(quar))
      // the crash-replay case: batch 0 re-runs after batch 1 committed
      CorpusIngest.processBatch(b0, clean, quar, batchId = 0L)
      assert(snap(clean) === c1, s"seed=$seed clean")
      assert(snap(quar) === q1, s"seed=$seed quarantine")
    }
  }
}
