package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Per-user evaluation row: the user's recommended items and their
  * held-out truth set (SURVEY §2.9 — the one reference "UDF" kept as
  * a typed Aggregator for fidelity: the per-user precision loop of
  * reference dags/daily_pipeline.py:501-533).
  */
case class RecEval(recs: Seq[Long], truth: Seq[Long])

/** Running (Σ per-user precision, user count). */
case class PrecBuf(sumPrec: Double, n: Long)

/** precision@k as a typed Aggregator[RecEval, PrecBuf, Double]:
  * per user |recs ∩ truth| / |recs| (the reference divides by the
  * recommendation count, daily_pipeline.py:528), averaged over users.
  *
  * The join-based Recommend.precisionAtK is the oracle-checked
  * production path (set intersection as a join scales; per-row Sets
  * do not once |truth| explodes) — this Aggregator exists for the
  * per-user-loop shape: it runs as a single partial+final typed
  * aggregate with no shuffle beyond the merge, the right tool when
  * recs/truth are already collected per user (e.g. serving-side
  * evaluation of a batch of sessions).
  */
class PrecisionAtK(k: Int) extends Aggregator[RecEval, PrecBuf, Double] {

  override def zero: PrecBuf = PrecBuf(0.0, 0L)

  override def reduce(b: PrecBuf, r: RecEval): PrecBuf = {
    val top = r.recs.take(k)
    if (top.isEmpty) b
    else {
      val truth = r.truth.toSet
      val hits = top.count(truth.contains)
      PrecBuf(b.sumPrec + hits.toDouble / top.size, b.n + 1)
    }
  }

  override def merge(a: PrecBuf, b: PrecBuf): PrecBuf =
    PrecBuf(a.sumPrec + b.sumPrec, a.n + b.n)

  override def finish(b: PrecBuf): Double =
    if (b.n == 0) 0.0 else b.sumPrec / b.n

  override def bufferEncoder: Encoder[PrecBuf] = Encoders.product[PrecBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
