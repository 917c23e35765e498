package graft.streaming

import graft.operators.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming corpus ingest — the curation gate run as a continuous
  * ETL: documents stream in, every micro-batch passes through the
  * SAME batch `TextAnalysis.corpusGate` (one codepath, the
  * Alerts/Dashboard pattern), keepers append to the clean corpus and
  * rejects to a quarantine table that KEEPS the per-component flags —
  * at 100 TB the quarantine audit is how a curation regression is
  * diagnosed without re-running the gate.
  *
  * Scale notes: foreachBatch gives exactly-once appends under the
  * checkpoint (batch id dedup on replay); the gate itself is
  * scan-shaped per batch (see corpusGate), so the stream's throughput
  * is the scan bandwidth of each micro-batch. The canonical-dup
  * component is per-batch here — cross-batch exact dedup at ingest is
  * `dropDuplicatesWithinWatermark` on the fingerprint (ST11), the
  * bounded-state form.
  */
object CorpusIngest {

  /** One micro-batch: gate, split, append. Public so the spec can
    * drive it directly and the stream wiring stays 3 lines.
    */
  def processBatch(batch: DataFrame, cleanDir: String,
                   quarantineDir: String): Unit = {
    if (!batch.isEmpty) {
      // gate once per batch; both sinks consume the same result
      val gated = TextAnalysis.corpusGate(batch).localCheckpoint()
      gated.filter(col("keep") === 1)
        .join(batch.select(col("doc_id"), col("text"), col("source")),
          Seq("doc_id"))
        .select(col("doc_id"), col("source"), col("text"), col("quality"))
        .write.mode("append").parquet(cleanDir)
      gated.filter(col("keep") === 0)
        .select(col("doc_id"), col("quality"), col("q_keep"),
          col("r_keep"), col("l_keep"), col("is_canonical"))
        .write.mode("append").parquet(quarantineDir)
    }
  }

  def run(docs: DataFrame, cleanDir: String, quarantineDir: String,
          checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch, cleanDir, quarantineDir)
      }
      .start()

  // ---- stream-static near-dup filter (Dedup.incrementalDedup's
  // streaming twin) ----

  /** The two static index tables previous ingests persist to the
    * lake: MinHash band signatures (the candidate join key) and the
    * shingle-hash table (the exact-verify side). Built by the SAME
    * signature pass the batch dedup family runs — at 100 TB these
    * are parquet tables appended per ingest, and the stream below
    * only ever reads them.
    */
  def corpusBands(corpus: DataFrame): DataFrame =
    graft.operators.Dedup.bandSignaturesFrom(
      graft.operators.Dedup.minhashSignaturesFrom(
        graft.operators.Dedup.docShingleHashes(corpus)))

  def corpusShingles(corpus: DataFrame): DataFrame =
    graft.operators.Dedup.docShingleHashes(corpus)

  /** One micro-batch of the streaming near-dup gate: sign the batch,
    * band-join the static corpus index for candidates, exact-verify
    * candidates against the static shingle table, drop batch docs
    * with a verified corpus near-dup (Jaccard ≥ t). Identical
    * semantics to `Dedup.incrementalDedup` restricted to this batch —
    * CorpusIngestSpec asserts exactly that equivalence. Per batch the
    * cost is batch-sized: the corpus is touched only through the
    * band join (index-keyed) and the candidate verify (pair-keyed);
    * neither corpus² nor batch×corpus scans exist.
    */
  def nearDupFilterBatch(batch: DataFrame, bands: DataFrame,
                         corpusSh: DataFrame,
                         t: Double = graft.operators.Dedup.JaccardT)
  : DataFrame = {
    val D = graft.operators.Dedup
    val bsh = D.docShingleHashes(batch).localCheckpoint(false)
    val bBands = D.bandSignaturesFrom(D.minhashSignaturesFrom(bsh))
    val cand = bands.as("x")
      .join(bBands.as("y"),
        col("x.band") === col("y.band") && col("x.bsig") === col("y.bsig"))
      .select(col("x.doc_id").as("i"), col("y.doc_id").as("j"))
      .distinct()
    val nC = corpusSh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val nB = bsh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val dropIds = cand
      .join(corpusSh.as("a"), col("i") === col("a.doc_id"))
      .join(bsh.as("b"),
        col("j") === col("b.doc_id") && col("a.sh") === col("b.sh"))
      .groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("common"))
      .join(nC.as("na"), col("i") === col("na.doc_id"))
      .join(nB.as("nb"), col("j") === col("nb.doc_id"))
      .filter(round(col("common").cast("double") /
        (col("na.n") + col("nb.n") - col("common")), 6) >= t)
      .select(col("j").as("doc_id")).distinct()
    batch.join(dropIds, Seq("doc_id"), "left_anti")
  }

  /** The wired stream: each micro-batch passes the near-dup gate
    * against the static index, survivors append to the clean corpus.
    */
  def runNearDup(docs: DataFrame, bands: DataFrame, corpusSh: DataFrame,
                 cleanDir: String, checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val kept = nearDupFilterBatch(batch, bands, corpusSh)
        if (!kept.isEmpty) kept.write.mode("append").parquet(cleanDir)
      }
      .start()

  // ---- stream-static exact-substring span dedup
  //      (TextAnalysis.spanMergeIncremental's streaming twin) ----

  /** The static window-fingerprint index previous ingests persist to
    * the lake — the corpus side of exact-substring span dedup.
    * Distinct fps only (membership is all the batch test needs;
    * positions stay with their documents), built by the SAME window
    * pass the batch family runs.
    */
  def corpusWindowFps(corpus: DataFrame,
                      w: Int = TextAnalysis.ChunkW): DataFrame =
    TextAnalysis.spanWindows(corpus, w).select(col("fp")).distinct()

  /** The wired stream: per micro-batch, detect duplicated spans of
    * the incoming docs against the static fp index through the ONE
    * shared batch kernel (TextAnalysis.spanAgainstIndex — the same
    * semi-join + interval merge the registered incremental query
    * runs) and append the span table; a downstream cut consumes it.
    * foreachBatch is the right shape because the interval merge is a
    * per-doc rank window, which streaming append mode cannot host —
    * same reasoning as serveStoreStream.
    */
  def runSpanDedup(docs: DataFrame, corpusFps: DataFrame,
                   spansDir: String, checkpointDir: String,
                   w: Int = TextAnalysis.ChunkW): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          TextAnalysis.spanAgainstIndex(batch, corpusFps, w)
            .write.mode("append").parquet(spansDir)
      }
      .start()
}
