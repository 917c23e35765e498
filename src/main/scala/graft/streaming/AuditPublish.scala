package graft.streaming

import graft.operators.Quality
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Write–audit–publish over the streaming order feed: every
  * micro-batch is staged, the table-level expectation suite
  * (Quality.dqExpectations — the Deequ-style constraint pass) runs
  * against the staged batch, and only a batch that passes EVERY
  * check is appended to the published table; a failing batch is
  * diverted whole to quarantine. One audit row per (batch, check)
  * lands in the audit log either way — the WAP discipline that keeps
  * a bad producer from ever contaminating the serving table, with
  * the audit trail to show which constraint broke and when.
  *
  * Scale notes: the expectation suite is one aggregate pass over the
  * staged batch (constant output), so the gate adds one scan of each
  * micro-batch; foreachBatch + the checkpoint give exactly-once
  * appends on replay. Batch-level accept/reject complements
  * CorpusIngest's per-ROW gate — a schema-level breach (nulls, dup
  * keys, domain drift) poisons a whole producer batch, which is the
  * grain to reject it at.
  */
object AuditPublish {

  /** One micro-batch: stage, audit, publish-or-quarantine. Returns
    * the verdict. Public so the spec drives it directly — the stream
    * wiring below stays three lines (the one-codepath pattern).
    */
  def processBatch(batch: DataFrame, batchId: Long, publishDir: String,
                   quarantineDir: String, auditDir: String): Boolean = {
    if (batch.isEmpty) return true
    val staged = batch.localCheckpoint() // audited + written: read twice
    val checks = Quality.dqExpectations(staged).localCheckpoint()
    val ok = checks.agg(min(col("pass")).as("ok"))
      .head.getLong(0) == 1L
    checks
      .withColumn("batch_id", lit(batchId))
      .withColumn("published", lit(if (ok) 1L else 0L))
      .write.mode("append").parquet(auditDir)
    if (ok) staged.write.mode("append").parquet(publishDir)
    else staged.write.mode("append").parquet(quarantineDir)
    ok
  }

  def run(orders: DataFrame, publishDir: String, quarantineDir: String,
          auditDir: String, checkpointDir: String): StreamingQuery =
    orders.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        processBatch(batch, id, publishDir, quarantineDir, auditDir): Unit
      }
      .start()
}
