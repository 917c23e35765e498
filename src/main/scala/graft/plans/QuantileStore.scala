package graft.plans

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** S28: re-aggregatable QUANTILE sketch store — the percentile
  * sibling of the S25 HLL store: "p95 order value over an arbitrary
  * date range" as an O(partitions) store read instead of an
  * O(events) scan. Each day's values collapse to one Datasketches
  * KLL sketch per (date, event_type); any range's percentiles come
  * from the union-merge of the covered sketches. Exact percentiles
  * cannot pre-aggregate (a day's p95 tells you nothing about the
  * month's); mergeability is the whole point of KLL.
  *
  * Contract honesty: unlike HLL (register-max, order-free,
  * bit-reproducible), KLL compaction is randomized — merge results
  * are NOT bit-identical across runs. The production contract is the
  * (ε, δ) normalized-rank-error bound instead (ε ≈ 1.65% at the
  * default k=200, the same style of guarantee e6_heavy_hitters_cms
  * ships), which the spec asserts against exact rank positions; the
  * exact row counts stored beside the sketches ARE deterministic.
  *
  * Scale: build is one mapPartitions pass (per-partition sketches —
  * the map-side combine) + one (date, type)-grain merge shuffle of
  * ~KB payloads; the store is (days × types) rows, and a year of a
  * 10⁹-row/day service reads megabytes, not the event log.
  */
object QuantileStore {

  import org.apache.datasketches.kll.KllDoublesSketch
  import org.apache.datasketches.memory.Memory

  final case class SkRow(date: String, event_type: String,
                         sketch: Array[Byte], n_rows: Long)

  val SketchK = 200 // default KLL accuracy knob: ~1.65% rank error

  /** One KLL sketch of `value` per (date, event_type), plus the exact
    * row count; date-partitioned so range reads prune.
    */
  def buildDaily(events: DataFrame, dir: String): Unit = {
    val s = events.sparkSession
    import s.implicits._
    val rows = events
      .select(to_date(col("ts")).cast("string").as("date"),
        col("event_type"), col("value").cast("double").as("v"))
      .as[(String, String, Double)]
    rows.mapPartitions { it =>
        val acc = scala.collection.mutable.HashMap
          .empty[(String, String), (KllDoublesSketch, Long)]
        it.foreach { case (d, t, v) =>
          val cur = acc.getOrElseUpdate((d, t),
            (KllDoublesSketch.newHeapInstance(SketchK), 0L))
          cur._1.update(v)
          acc((d, t)) = (cur._1, cur._2 + 1L)
        }
        acc.iterator.map { case ((d, t), (sk, n)) =>
          SkRow(d, t, sk.toByteArray, n)
        }
      }
      .groupByKey(r => (r.date, r.event_type))
      .reduceGroups { (a, b) =>
        val sk = KllDoublesSketch.heapify(Memory.wrap(a.sketch))
        sk.merge(KllDoublesSketch.heapify(Memory.wrap(b.sketch)))
        SkRow(a.date, a.event_type, sk.toByteArray, a.n_rows + b.n_rows)
      }
      .map(_._2)
      .write.mode(SaveMode.Overwrite).partitionBy("date").parquet(dir)
  }

  /** Percentiles per event_type over [from, to] — reads only the
    * store (partition-pruned), never the event log. `ps` are rank
    * fractions in [0, 1]; inclusive-rank semantics.
    */
  def quantileRange(spark: SparkSession, dir: String,
                    from: String, to: String,
                    ps: Seq[Double] = Seq(0.5, 0.95, 0.99)): DataFrame = {
    import spark.implicits._
    import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
    val pts = ps
    spark.read.parquet(dir)
      .select(col("date"), col("event_type"), col("sketch"), col("n_rows"))
      .filter(col("date") >= from && col("date") <= to)
      .as[(String, String, Array[Byte], Long)]
      .groupByKey(_._2)
      .mapGroups { (tpe, it) =>
        var union: KllDoublesSketch = null
        var n = 0L
        it.foreach { case (_, _, bytes, nr) =>
          val sk = KllDoublesSketch.heapify(Memory.wrap(bytes))
          if (union == null) union = sk else union.merge(sk)
          n += nr
        }
        val qs = pts.map(p =>
          union.getQuantile(p, QuantileSearchCriteria.INCLUSIVE))
        (tpe, n, qs)
      }
      .select(col("_1").as("event_type"), col("_2").as("n_rows"),
        col("_3").as("quantiles"))
  }
}
