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
}
