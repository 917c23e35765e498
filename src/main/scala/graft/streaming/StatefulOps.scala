package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues,
  ValueState}

/** Order event for the stateful tracker (double on the wire — the CDC
  * stream downcasts DECIMAL, SURVEY §1.2).
  */
case class OrderEvent(customer_id: String, total: Double)

/** Custom per-customer state carried across micro-batches. */
case class SpendState(n_orders: Long, total_spent: Double)

/** Emitted when a customer's lifetime spend crosses a tier boundary. */
case class TierAlert(customer_id: String, n_orders: Long,
                     total_spent: Double, tier: String)

/** Event row for the streaming transition counter (top-level: test
  * Encoders require it).
  */
case class TypedEvent(event_id: Long, user_id: Long, ts_us: Long,
                      event_type: String)

/** Running (prev→next) transition count for one user. */
case class TransitionCount(user_id: Long, prev_type: String,
                           next_type: String, n: Long)

/** The open SCD2 run carried across micro-batches for one key. */
case class Scd2Run(event_type: String, valid_from_us: Long,
                   version: Long, n_obs: Long)

/** Event row with a value — input to the streaming attributor. */
case class ValuedEvent(event_id: Long, user_id: Long, ts_us: Long,
                       event_type: String, value: Double)

/** The carried attribution state for one user: the last-touch channel
  * ("" before any channel event) plus the (ts, event_id) of the last
  * APPLIED event of any type — purchases advance the watermark too,
  * so a straggler older than anything already emitted is dropped
  * instead of silently rewriting the channel history.
  */
case class ChannelAt(channel: String, ts_us: Long, event_id: Long)

/** One purchase credited to its last-touch channel (append-final). */
case class AttributedPurchase(event_id: Long, user_id: Long, ts_us: Long,
                              channel: String, value: Double)

/** Input row for the streaming anomaly detector. */
case class BucketEvent(event_type: String, ts_us: Long)

/** One item interaction for the streaming trending counter. */
case class ItemHit(item_id: Long)

/** One shard's current top-k row after a micro-batch. */
case class TrendingItem(bucket: Long, item_id: Long, n_total: Long,
                        rank: Int)

/** Trailing-window state for one event_type: the open (latest)
  * bucket with its running count, plus the last ≤w CLOSED buckets as
  * two parallel primitive Seqs, oldest first (flat state blob — a
  * Seq of case classes would nest the encoder).
  */
case class AnomalyState(open: Long, openN: Long,
                        tb: Seq[Long], tn: Seq[Long])

/** One scored closed bucket (append-final) — same fields and same
  * arithmetic as the batch `Temporal.rollingAnomaly` row.
  */
case class AnomalyFlag(event_type: String, bucket_start_us: Long,
                       n: Long, z: Option[Double], is_anomaly: Long)

/** CUSUM carry for one event_type: the open bucket + its running
  * count, and the two closed-form accumulators (running Σy and its
  * running floor min(0, min prefix)) — O(1) state per key, the whole
  * point of the prefix-sum − running-min identity.
  */
case class CusumState(open: Long, openN: Long, cs: Long, lo: Long)

/** One scored closed bucket — same fields and arithmetic as the
  * batch `Temporal.cusumShift` row.
  */
case class CusumFlag(event_type: String, bucket_start_us: Long,
                     n: Long, cusum: Long, is_alarm: Long)

/** A closed [valid_from, valid_to) SCD2 interval (append-mode-final). */
case class Scd2Interval(user_id: Long, version: Long, event_type: String,
                        valid_from_us: Long, valid_to_us: Long, n_obs: Long)

/** Custom streaming state (SURVEY §2.8 note; builder brief:
  * `KeyValueGroupedDataset.mapGroupsWithState/flatMapGroupsWithState`
  * for custom state): a running per-customer spend accumulator that
  * emits an alert only when a spend tier is crossed — state the
  * built-in windowed aggregates can't express (unbounded lifetime
  * accumulation + edge-triggered output).
  *
  * Scale notes: state is one 16-byte struct per customer, sharded by
  * key hash across the state store; processing-time timeout evicts
  * idle customers so the store is bounded by *active* customers, not
  * all-time cardinality.
  */
object StatefulOps {

  val Tiers: Seq[(Double, String)] =
    Seq(100000.0 -> "PLATINUM", 50000.0 -> "GOLD", 10000.0 -> "SILVER")

  def tierOf(spent: Double): Option[String] =
    Tiers.collectFirst { case (min, name) if spent >= min => name }

  /** The flatMapGroupsWithState transition function: fold the batch's
    * orders into the running state, emit one alert per tier crossed.
    * `evictIdle` arms a processing-time timeout so long-idle customers
    * leave the state store.
    */
  def trackSpend(evictIdle: Boolean)(
      customerId: String, orders: Iterator[OrderEvent],
      state: GroupState[SpendState]): Iterator[TierAlert] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    val prev = state.getOption.getOrElse(SpendState(0L, 0.0))
    var n = prev.n_orders
    var spent = prev.total_spent
    val alerts = Seq.newBuilder[TierAlert]
    var lastTier = tierOf(prev.total_spent)
    orders.foreach { o =>
      n += 1
      spent += o.total
      val t = tierOf(spent)
      if (t != lastTier && t.isDefined) {
        alerts += TierAlert(customerId, n, spent, t.get)
        lastTier = t
      }
    }
    state.update(SpendState(n, spent))
    if (evictIdle) state.setTimeoutDuration("1 hour")
    alerts.result().iterator
  }

  /** Wire the tracker over a stream (or batch frame in tests) of
    * order events. Eviction defaults OFF because a processing-time
    * timeout makes the incremental planner schedule timeout-check
    * batches continuously even with no input — right for a 24/7
    * production stream (that IS the eviction mechanism), wrong for
    * bounded tests, where processAllAvailable would never observe
    * quiescence.
    */
  def spendTiers(orders: Dataset[OrderEvent],
                 evictIdle: Boolean = false): Dataset[TierAlert] = {
    implicit val se = Encoders.product[SpendState]
    implicit val ae = Encoders.product[TierAlert]
    implicit val ke = Encoders.STRING
    orders.groupByKey(_.customer_id)
      .flatMapGroupsWithState(OutputMode.Append,
        if (evictIdle) GroupStateTimeout.ProcessingTimeTimeout
        else GroupStateTimeout.NoTimeout)(trackSpend(evictIdle))
  }

  /** The same tracker on Spark 4's transformWithState API — typed
    * named state handles (ValueState/ListState/MapState per key,
    * vs flatMapGroupsWithState's single opaque blob), optional TTL
    * per state variable, and RocksDB-only execution (the production
    * backend). Kept alongside the classic API: same transition
    * semantics, same fixtures, both spec-proven.
    */
  class SpendTierProcessor
      extends StatefulProcessor[String, OrderEvent, TierAlert] {
    @transient private var spend: ValueState[SpendState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      spend = getHandle.getValueState[SpendState]("spend",
        Encoders.product[SpendState], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[OrderEvent],
        timerValues: TimerValues): Iterator[TierAlert] = {
      val prev = if (spend.exists()) spend.get() else SpendState(0L, 0.0)
      var n = prev.n_orders
      var spent = prev.total_spent
      val alerts = Seq.newBuilder[TierAlert]
      var lastTier = tierOf(prev.total_spent)
      rows.foreach { o =>
        n += 1
        spent += o.total
        val t = tierOf(spent)
        if (t != lastTier && t.isDefined) {
          alerts += TierAlert(key, n, spent, t.get)
          lastTier = t
        }
      }
      spend.update(SpendState(n, spent))
      alerts.result().iterator
    }
  }

  /** transformWithState wiring (requires the RocksDB state store
    * provider — enforced by Spark, not a choice here).
    */
  def spendTiersTws(orders: Dataset[OrderEvent]): Dataset[TierAlert] = {
    implicit val ae = Encoders.product[TierAlert]
    implicit val ke = Encoders.STRING
    orders.groupByKey(_.customer_id)
      .transformWithState(new SpendTierProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  /** Incremental Markov transition counts — the streaming form of the
    * batch `e3_transitions` matrix. Needs TWO typed state handles per
    * user (exactly what transformWithState adds over the classic
    * single-blob API): a ValueState carrying the user's last event
    * type so sequences CHAIN ACROSS micro-batches (the last event of
    * batch N pairs with the first of batch N+1 — a per-batch window
    * would silently drop those edges), and a MapState holding the
    * running (prev→next) counters, updated in place instead of
    * rewriting one big blob per event. Emits the updated running
    * total for each pair touched in the batch.
    *
    * Scale: state is O(active users × observed type-pairs per user)
    * in RocksDB; in-batch rows are sorted by (ts, event_id) so
    * replayed/reordered micro-batch contents produce identical
    * transitions.
    */
  class TransitionProcessor
      extends StatefulProcessor[Long, TypedEvent, TransitionCount] {
    @transient private var last: ValueState[String] = _
    @transient private var counts: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      last = getHandle.getValueState[String]("last",
        Encoders.STRING, TTLConfig.NONE)
      counts = getHandle.getMapState[String, Long]("counts",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[TypedEvent],
        timerValues: TimerValues): Iterator[TransitionCount] = {
      val sorted = rows.toIndexedSeq.sortBy(e => (e.ts_us, e.event_id))
      var prev = if (last.exists()) Option(last.get()) else None
      val touched = scala.collection.mutable.LinkedHashSet.empty[String]
      sorted.foreach { e =>
        prev.foreach { p =>
          val k = p + ">" + e.event_type
          val n = if (counts.containsKey(k)) counts.getValue(k) else 0L
          counts.updateValue(k, n + 1L)
          touched += k
        }
        prev = Some(e.event_type)
      }
      prev.foreach(last.update)
      touched.iterator.map { k =>
        val Array(p, nx) = k.split(">", 2)
        TransitionCount(key, p, nx, counts.getValue(k))
      }
    }
  }

  def transitionCounts(events: Dataset[TypedEvent]): Dataset[TransitionCount] = {
    implicit val te = Encoders.product[TransitionCount]
    implicit val ke = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .transformWithState(new TransitionProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  /** ST19: streaming trending top-k — the continuous twin of the
    * native TopKPerKey batch operator (and of A4's grouped top-k):
    * "what's hot right now" without re-aggregating history each
    * refresh. Item counts shard by item_id mod nBuckets, each shard
    * holds its counters in a MapState (RocksDB; one point-update per
    * hit, never a rewritten blob) and emits its CURRENT top-k after
    * every batch it appears in. The exact global top-k is the k best
    * of the ≤ k·nBuckets shard rows — valid because each item's total
    * lives in exactly one shard, so a global top-k member is
    * necessarily in its shard's top-k (the TopKPerKeyExec partial
    * argument, with shards as the partitions).
    *
    * Scale: nBuckets is the parallelism knob; state is the item
    * catalog spread over shards; per-batch emission is k·(shards
    * touched), independent of hit volume.
    */
  class TrendingTopKProcessor(k: Int)
      extends StatefulProcessor[Long, ItemHit, TrendingItem] {
    @transient private var counts: MapState[Long, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[Long, Long]("counts",
        Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[ItemHit],
        timerValues: TimerValues): Iterator[TrendingItem] = {
      rows.foreach { h =>
        val n = if (counts.containsKey(h.item_id))
          counts.getValue(h.item_id) else 0L
        counts.updateValue(h.item_id, n + 1L)
      }
      val top = counts.iterator().map(p => (p._1, p._2)).toIndexedSeq
        .sortBy { case (item, n) => (-n, item) }.take(k)
      top.iterator.zipWithIndex.map { case ((item, n), i) =>
        TrendingItem(key, item, n, i + 1)
      }
    }
  }

  def trendingTopK(hits: Dataset[ItemHit], k: Int = 5,
                   nBuckets: Int = 8): Dataset[TrendingItem] = {
    implicit val te = Encoders.product[TrendingItem]
    implicit val ke = Encoders.scalaLong
    hits.groupByKey(_.item_id % nBuckets)
      .transformWithState(new TrendingTopKProcessor(k),
        TimeMode.None(), OutputMode.Append())
  }

  /** Streaming SCD2 — the stream twin of `Temporal.scd2Build`: the
    * open run rides in a ValueState so it CHAINS ACROSS micro-batches
    * (same-type runs spanning a batch boundary stay one interval;
    * type changes at the boundary close cleanly), and a closed
    * [valid_from, valid_to) row is emitted the moment its successor
    * arrives — append-mode-final, exactly like the batch operator's
    * historical rows. The open (is_current) interval is deliberately
    * NOT emitted: it isn't final until its close arrives; readers
    * get it from the state store or the batch view.
    * Scale: one small struct per key in RocksDB; in-batch rows sort
    * by (ts_us, event_id) so replayed micro-batches emit identical
    * intervals.
    */
  class Scd2Processor
      extends StatefulProcessor[Long, TypedEvent, Scd2Interval] {
    @transient private var run: ValueState[Scd2Run] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      run = getHandle.getValueState[Scd2Run]("run",
        Encoders.product[Scd2Run], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[TypedEvent],
        timerValues: TimerValues): Iterator[Scd2Interval] = {
      val sorted = rows.toIndexedSeq.sortBy(e => (e.ts_us, e.event_id))
      var cur = if (run.exists()) Option(run.get()) else None
      val closed = Seq.newBuilder[Scd2Interval]
      sorted.foreach { e =>
        cur match {
          // append-mode SCD2 assumes per-key event-time order (the
          // CDC-feed contract); a cross-batch straggler older than
          // the open run cannot be applied without rewriting emitted
          // history, so it is DROPPED — never an inverted interval.
          // Full out-of-order repair is the batch scd2Build's job.
          case Some(r) if e.ts_us < r.valid_from_us => ()
          case Some(r) if r.event_type == e.event_type =>
            cur = Some(r.copy(n_obs = r.n_obs + 1))
          case Some(r) =>
            closed += Scd2Interval(key, r.version, r.event_type,
              r.valid_from_us, e.ts_us, r.n_obs)
            cur = Some(Scd2Run(e.event_type, e.ts_us, r.version + 1, 1L))
          case None =>
            cur = Some(Scd2Run(e.event_type, e.ts_us, 1L, 1L))
        }
      }
      cur.foreach(run.update)
      closed.result().iterator
    }
  }

  def scd2Stream(events: Dataset[TypedEvent]): Dataset[Scd2Interval] = {
    implicit val ie = Encoders.product[Scd2Interval]
    implicit val ke = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .transformWithState(new Scd2Processor,
        TimeMode.None(), OutputMode.Append())
  }

  /** Streaming last-touch attribution — the stream twin of
    * `Events.attribution`: the user's most recent non-purchase
    * channel rides in a ValueState so attribution CHAINS ACROSS
    * micro-batches (a view in batch 1 credits a purchase in batch
    * 9); each purchase emits exactly one attributed row the moment
    * it arrives (append-mode-final). Same per-key event-time-order
    * contract as Scd2Processor: in-batch rows sort by (ts_us,
    * event_id); a cross-batch straggler older than the last applied
    * event never enters the channel history — attributing against a
    * channel from its future would be wrong, and the emitted history
    * is immutable. A straggler PURCHASE is still revenue, though:
    * it emits under the 'late' sentinel channel rather than silently
    * undercounting the stream vs the batch twin (the true channel is
    * unknowable once newer state has been applied; the sentinel marks
    * the row for downstream reconciliation).
    * Scale: one (channel, ts) struct per user in RocksDB.
    */
  class AttributionProcessor
      extends StatefulProcessor[Long, ValuedEvent, AttributedPurchase] {
    @transient private var last: ValueState[ChannelAt] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      last = getHandle.getValueState[ChannelAt]("last",
        Encoders.product[ChannelAt], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[ValuedEvent],
        timerValues: TimerValues): Iterator[AttributedPurchase] = {
      val sorted = rows.toIndexedSeq.sortBy(e => (e.ts_us, e.event_id))
      var cur = if (last.exists()) Option(last.get()) else None
      val out = Seq.newBuilder[AttributedPurchase]
      sorted.foreach { e =>
        // straggler guard on the full (ts, event_id) order — the same
        // tuple the batch window sorts by, so an equal-ts event from
        // a later batch can't jump BEHIND one already applied
        val isStale = cur.exists(c =>
          e.ts_us < c.ts_us || (e.ts_us == c.ts_us && e.event_id < c.event_id))
        if (!isStale) {
          if (e.event_type == "purchase") {
            out += AttributedPurchase(e.event_id, key, e.ts_us,
              cur.map(_.channel).filter(_.nonEmpty).getOrElse("direct"),
              e.value)
            cur = Some(ChannelAt(cur.map(_.channel).getOrElse(""),
              e.ts_us, e.event_id))
          } else cur = Some(ChannelAt(e.event_type, e.ts_us, e.event_id))
        } else if (e.event_type == "purchase") {
          // late purchase: emit the revenue fact under the sentinel;
          // state is NOT touched (the channel history stays immutable)
          out += AttributedPurchase(e.event_id, key, e.ts_us, "late",
            e.value)
        }
      }
      cur.foreach(last.update)
      out.result().iterator
    }
  }

  def attributionStream(
      events: Dataset[ValuedEvent]): Dataset[AttributedPurchase] = {
    implicit val ae = Encoders.product[AttributedPurchase]
    implicit val ke = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .transformWithState(new AttributionProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  /** Streaming twin of `Temporal.rollingAnomaly` (ts_rolling_z): per
    * event_type, keyed state carries the open bucket plus the last w
    * closed bucket counts; a bucket is scored the moment a later
    * bucket's first row closes it, with the SAME exact-integer
    * (w·x−s)² ≥ 9·(w·ssq−s²) decision and round-6 z as the batch
    * operator (BigInt stands in for the batch DECIMAL(38)). The open
    * bucket is never emitted — it cannot be scored until it stops
    * growing — so on in-order input the stream output equals the
    * batch output minus each series' final bucket (spec-proven). A
    * straggler row for an already-closed bucket is dropped: scored
    * history is immutable, same stance as the attribution twin.
    * Scale: state is 2w+2 longs per event_type in RocksDB.
    */
  class AnomalyProcessor(bucketUs: Long, w: Int)
      extends StatefulProcessor[String, BucketEvent, AnomalyFlag] {
    @transient private var st: ValueState[AnomalyState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[AnomalyState]("trail",
        Encoders.product[AnomalyState], TTLConfig.NONE)

    private def score(key: String, tn: Seq[Long], b: Long,
                      n: Long): Option[AnomalyFlag] =
      if (tn.length < w) None
      else {
        val s = tn.sum
        val ssq = tn.map(x => BigInt(x) * x).sum
        val num = BigInt(n) * w - s
        val varw = ssq * w - BigInt(s) * s
        val anom = if (varw > 0) num * num >= varw * 9 else num != 0
        val z = if (varw > 0)
          Some(BigDecimal(num.toDouble / math.sqrt(varw.toDouble))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        else None
        Some(AnomalyFlag(key, b * bucketUs, n, z, if (anom) 1L else 0L))
      }

    override def handleInputRows(key: String, rows: Iterator[BucketEvent],
        timerValues: TimerValues): Iterator[AnomalyFlag] = {
      val counts = rows.map(_.ts_us / bucketUs).toSeq
        .groupBy(identity).view.mapValues(_.size.toLong)
        .toSeq.sortBy(_._1)
      var state = if (st.exists()) st.get() else null
      val out = Seq.newBuilder[AnomalyFlag]
      counts.foreach { case (b, c) =>
        if (state == null) state = AnomalyState(b, c, Seq.empty, Seq.empty)
        else if (b < state.open) () // straggler: closed history is immutable
        else if (b == state.open) state = state.copy(openN = state.openN + c)
        else {
          score(key, state.tn, state.open, state.openN).foreach(out += _)
          state = AnomalyState(b, c,
            (state.tb :+ state.open).takeRight(w),
            (state.tn :+ state.openN).takeRight(w))
        }
      }
      if (state != null) st.update(state)
      out.result().iterator
    }
  }

  def anomalyStream(events: Dataset[BucketEvent],
                    bucketUs: Long = graft.operators.Temporal.HourUs,
                    w: Int = graft.operators.Temporal.ZWin)
      : Dataset[AnomalyFlag] = {
    implicit val fe = Encoders.product[AnomalyFlag]
    implicit val ke = Encoders.STRING
    events.groupByKey(_.event_type)
      .transformWithState(new AnomalyProcessor(bucketUs, w),
        TimeMode.None(), OutputMode.Append())
  }

  /** ST20: streaming CUSUM — `Temporal.cusumShift`'s twin, and the
    * payoff of its closed form: S_t = cs_t − min(0, min prefix cs)
    * needs only TWO longs of keyed state (running Σy and its running
    * floor), so the detector runs forever at O(1) memory per series —
    * no trailing window to carry, unlike the z-score's w buckets.
    * The reference stats (refn, refs) arrive as parameters (the
    * production contract: a drift baseline is trained offline from a
    * reference period, not re-derived from the unbounded stream —
    * the batch operator's midpoint split is exactly that trainer).
    * Open-bucket semantics mirror AnomalyProcessor: a bucket scores
    * when a LATER bucket first arrives; stragglers behind the open
    * bucket are dropped (closed history is immutable, append mode).
    */
  class CusumProcessor(bucketUs: Long, refn: Long, refs: Long)
      extends StatefulProcessor[String, BucketEvent, CusumFlag] {
    @transient private var st: ValueState[CusumState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[CusumState]("carry",
        Encoders.product[CusumState], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[BucketEvent],
        timerValues: TimerValues): Iterator[CusumFlag] = {
      val counts = rows.map(_.ts_us / bucketUs).toSeq
        .groupBy(identity).view.mapValues(_.size.toLong)
        .toSeq.sortBy(_._1)
      var state = if (st.exists()) st.get() else null
      val out = Seq.newBuilder[CusumFlag]
      def close(s: CusumState): CusumState = {
        val y = s.openN * refn - refs - refs / 2
        val cs = s.cs + y
        val lo = math.min(s.lo, cs)
        val cusum = cs - lo
        out += CusumFlag(key, s.open * bucketUs, s.openN, cusum,
          if (cusum > refs * 5) 1L else 0L)
        CusumState(s.open, 0L, cs, lo)
      }
      counts.foreach { case (b, c) =>
        if (state == null) state = CusumState(b, c, 0L, 0L)
        else if (b < state.open) () // straggler: closed history is immutable
        else if (b == state.open) state = state.copy(openN = state.openN + c)
        else state = close(state).copy(open = b, openN = c)
      }
      if (state != null) st.update(state)
      out.result().iterator
    }
  }

  def cusumStream(events: Dataset[BucketEvent], refn: Long, refs: Long,
                  bucketUs: Long = graft.operators.Temporal.HourUs)
      : Dataset[CusumFlag] = {
    implicit val fe = Encoders.product[CusumFlag]
    implicit val ke = Encoders.STRING
    events.groupByKey(_.event_type)
      .transformWithState(new CusumProcessor(bucketUs, refn, refs),
        TimeMode.None(), OutputMode.Append())
  }
}
